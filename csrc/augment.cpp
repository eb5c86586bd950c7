// Native host-side augmentation kernels (round-4: the remaining Python
// worker hot spots in the training data path — speed perturb's polyphase
// resample and the biquad frequency-response variation).
//
// ps_resample_poly_f32 mirrors scipy.signal.resample_poly's exact
// pipeline (kaiser-5.0 firwin lowpass at 1/max_rate, taps cast to f32
// then scaled by `up`, zero pre-pad to centre the output, polyphase
// upfirdn, n_pre_remove slice) so the Python fallback and the native
// path agree to float32 rounding. Taps are cached per (up, down) —
// scipy rebuilds the (often 200k-tap) filter on every call, which is a
// large share of the Python speed-perturb cost.
//
// Reference behavior being accelerated: puresound/src/audio.py
// sox_speed_perturbed (torchaudio sox "speed") and
// add_variaion_response (biquad lfilter), used by the task datasets'
// wave_process augmentation chains.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <utility>
#include <vector>

namespace {

int64_t floordiv(int64_t a, int64_t b) {
  int64_t q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

int64_t gcd64(int64_t a, int64_t b) {
  while (b) {
    int64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// modified Bessel I0 (series; matches numpy.kaiser's i0 to ~1e-16 rel)
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 200; ++k) {
    term *= x2 / (double(k) * double(k));
    sum += term;
    if (term < sum * 1e-18) break;
  }
  return sum;
}

double sinc(double x) {
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return std::sin(px) / px;
}

// firwin(numtaps, f_c, window=("kaiser", 5.0)), scale=True (DC gain 1):
// lowpass h[k] = f_c * sinc(f_c * m) * w[k], normalized by sum(h)
std::vector<double> firwin_kaiser(int64_t numtaps, double f_c, double beta) {
  std::vector<double> h(numtaps);
  const double centre = 0.5 * double(numtaps - 1);
  const double i0b = bessel_i0(beta);
  double s = 0.0;
  for (int64_t k = 0; k < numtaps; ++k) {
    double m = double(k) - centre;
    double ratio = (numtaps == 1) ? 0.0 : (2.0 * double(k) / double(numtaps - 1) - 1.0);
    double arg = 1.0 - ratio * ratio;
    arg = arg > 0.0 ? std::sqrt(arg) : 0.0;
    double w = bessel_i0(beta * arg) / i0b;
    h[k] = f_c * sinc(f_c * m) * w;
    s += h[k];
  }
  for (auto& v : h) v /= s;
  return h;
}

struct TapsKey {
  int64_t up, down;
  bool operator<(const TapsKey& o) const {
    return up != o.up ? up < o.up : down < o.down;
  }
};

struct Taps {
  std::vector<float> h;  // f32 taps, scaled by up, zero pre/post padded
  int64_t half_len = 0;
  int64_t n_pre_remove = 0;
};

std::mutex g_taps_mu;
std::map<TapsKey, Taps> g_taps;

int64_t output_len(int64_t nh, int64_t nx, int64_t up, int64_t down) {
  return floordiv((nx - 1) * up + nh + down - 1, down);
}

// Build (or fetch cached) scipy-equivalent polyphase taps for up/down.
//
// CACHE INVARIANT: the cache key is (up, down) only, but n_post_pad is
// computed from the FIRST call's nx/n_out. That is sound because the
// post-pad taps are all ZERO — the convolution loop bounds skip them, so
// the produced samples are nx-independent; a later call with larger nx
// only relies on output_len covering its n_out, which the loop in
// resample_poly guards by never reading past t.h. If the bounds logic
// ever changes to touch post-pad taps, key the cache by nx too.
const Taps& get_taps(int64_t up, int64_t down, int64_t nx, int64_t n_out) {
  TapsKey key{up, down};
  std::lock_guard<std::mutex> lk(g_taps_mu);
  auto it = g_taps.find(key);
  if (it != g_taps.end()) return it->second;

  const int64_t max_rate = up > down ? up : down;
  const double f_c = 1.0 / double(max_rate);
  const int64_t half_len = 10 * max_rate;
  std::vector<double> hd = firwin_kaiser(2 * half_len + 1, f_c, 5.0);
  // scipy: h = asarray(h, x.dtype); h *= up  (both in float32 for f32 x)
  std::vector<float> hf(hd.size());
  for (size_t i = 0; i < hd.size(); ++i)
    hf[i] = float(hd[i]) * float(up);
  const int64_t n_pre_pad = down - (half_len % down);
  int64_t n_post_pad = 0;
  const int64_t n_pre_remove = (half_len + n_pre_pad) / down;
  while (output_len(int64_t(hf.size()) + n_pre_pad + n_post_pad, nx, up,
                    down) < n_out + n_pre_remove)
    ++n_post_pad;
  Taps t;
  t.h.assign(n_pre_pad, 0.0f);
  t.h.insert(t.h.end(), hf.begin(), hf.end());
  t.h.insert(t.h.end(), n_post_pad, 0.0f);
  t.half_len = half_len;
  t.n_pre_remove = n_pre_remove;
  return g_taps.emplace(key, std::move(t)).first->second;
}

}  // namespace

extern "C" {

// Output length of ps_resample_poly_f32 for (nx, up, down) — call first
// to size the output buffer. Mirrors scipy.signal.resample_poly.
int64_t ps_resample_len(int64_t nx, int64_t up, int64_t down) {
  int64_t g = gcd64(up, down);
  up /= g;
  down /= g;
  if (up == down) return nx;
  int64_t n_out = nx * up;
  return floordiv(n_out, down) + (n_out % down != 0 ? 1 : 0);
}

// Polyphase resample x (f32, length nx) by up/down into y (length must be
// ps_resample_len). Returns 0 on success.
int ps_resample_poly_f32(const float* x, int64_t nx, int64_t up,
                         int64_t down, float* y) {
  int64_t g = gcd64(up, down);
  up /= g;
  down /= g;
  if (up == down) {
    std::memcpy(y, x, size_t(nx) * sizeof(float));
    return 0;
  }
  int64_t n_out = nx * up;
  n_out = floordiv(n_out, down) + (n_out % down != 0 ? 1 : 0);
  const Taps& taps = get_taps(up, down, nx, n_out);
  const float* h = taps.h.data();
  const int64_t nh = int64_t(taps.h.size());
  const int64_t m0 = taps.n_pre_remove;
  for (int64_t m = 0; m < n_out; ++m) {
    const int64_t t = (m + m0) * down;
    int64_t lo = floordiv(t - nh, up) + 1;
    if (lo < 0) lo = 0;
    int64_t hi = floordiv(t, up);
    if (hi >= nx) hi = nx - 1;
    float acc = 0.0f;
    for (int64_t i = lo; i <= hi; ++i) acc += x[i] * h[t - i * up];
    y[m] = acc;
  }
  return 0;
}

// Order-2 IIR (biquad) in direct form II transposed, float32 — the
// lfilter(b, a, x) call of the frequency-response variation. a must be
// normalized (a[0] == 1).
void ps_biquad_f32(const float* b, const float* a, const float* x,
                   int64_t n, float* y) {
  const float b0 = b[0], b1 = b[1], b2 = b[2], a1 = a[1], a2 = a[2];
  float z1 = 0.0f, z2 = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    const float xi = x[i];
    const float yi = b0 * xi + z1;
    z1 = b1 * xi + z2 - a1 * yi;
    z2 = b2 * xi - a2 * yi;
    y[i] = yi;
  }
}

}  // extern "C"

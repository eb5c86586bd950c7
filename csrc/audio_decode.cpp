// Native audio decoding for the host data pipeline.
//
// The training data path (puresound_tpu/src/audio.py) decodes wav/flac on
// the host; the pure-Python FLAC decoder is ~10 s per 1M samples, far too
// slow to feed a TPU. This C++ implementation decodes the same FLAC subset
// (8/16/24-bit, constant/verbatim/fixed/LPC subframes, all stereo modes)
// plus PCM WAV, exposed via a C ABI consumed with ctypes
// (puresound_tpu/src/native.py). Output is bit-identical to the Python
// decoder (tested).
//
// Build: make -C csrc  (produces libpuresound_audio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size, size_t pos = 0)
      : data_(data), size_(size), pos_(pos), bitpos_(0) {}

  bool ok() const { return pos_ <= size_; }

  uint64_t ReadUint(int nbits) {
    uint64_t val = 0;
    while (nbits > 0) {
      if (pos_ >= size_) { pos_ = size_ + 1; return 0; }
      int avail = 8 - bitpos_;
      int take = nbits < avail ? nbits : avail;
      int shift = avail - take;
      uint32_t bits = (data_[pos_] >> shift) & ((1u << take) - 1);
      val = (val << take) | bits;
      bitpos_ += take;
      if (bitpos_ == 8) { bitpos_ = 0; pos_++; }
      nbits -= take;
    }
    return val;
  }

  int64_t ReadSint(int nbits) {
    int64_t val = (int64_t)ReadUint(nbits);
    if (val >= ((int64_t)1 << (nbits - 1))) val -= (int64_t)1 << nbits;
    return val;
  }

  int ReadUnary() {
    int count = 0;
    while (ok() && ReadUint(1) == 0) count++;
    return count;
  }

  int64_t ReadRice(int param) {
    int64_t q = ReadUnary();
    int64_t r = param > 0 ? (int64_t)ReadUint(param) : 0;
    int64_t v = (q << param) | r;
    return (v >> 1) ^ -(v & 1);  // zigzag
  }

  void Align() {
    if (bitpos_) { bitpos_ = 0; pos_++; }
  }

  uint64_t ReadUtf8Number() {
    uint32_t first = (uint32_t)ReadUint(8);
    if (first < 0x80) return first;
    int n = 0;
    uint32_t mask = 0x80;
    while (first & mask) { n++; mask >>= 1; }
    uint64_t val = first & (mask - 1);
    for (int i = 0; i < n - 1; i++)
      val = (val << 6) | (ReadUint(8) & 0x3F);
    return val;
  }

  size_t pos() const { return pos_; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_;
  int bitpos_;
};

bool DecodeResidual(BitReader& br, int n_samples, int order,
                    std::vector<int64_t>& residual) {
  int method = (int)br.ReadUint(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  int escape = (1 << param_bits) - 1;
  int partition_order = (int)br.ReadUint(4);
  int n_partitions = 1 << partition_order;
  residual.resize(n_samples - order);
  size_t idx = 0;
  for (int p = 0; p < n_partitions; p++) {
    int count = n_samples >> partition_order;
    if (p == 0) count -= order;
    int param = (int)br.ReadUint(param_bits);
    if (param == escape) {
      int nbits = (int)br.ReadUint(5);
      for (int i = 0; i < count; i++)
        residual[idx + i] = nbits ? br.ReadSint(nbits) : 0;
    } else {
      for (int i = 0; i < count; i++) residual[idx + i] = br.ReadRice(param);
    }
    idx += count;
  }
  return br.ok();
}

const int kFixedCoefs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool DecodeSubframe(BitReader& br, int n_samples, int bps,
                    std::vector<int64_t>& out) {
  if (br.ReadUint(1) != 0) return false;
  int sf_type = (int)br.ReadUint(6);
  int wasted = 0;
  if (br.ReadUint(1)) { wasted = 1 + br.ReadUnary(); bps -= wasted; }
  out.resize(n_samples);

  if (sf_type == 0) {  // CONSTANT
    int64_t v = br.ReadSint(bps);
    for (int i = 0; i < n_samples; i++) out[i] = v;
  } else if (sf_type == 1) {  // VERBATIM
    for (int i = 0; i < n_samples; i++) out[i] = br.ReadSint(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    for (int i = 0; i < order; i++) out[i] = br.ReadSint(bps);
    std::vector<int64_t> resid;
    if (!DecodeResidual(br, n_samples, order, resid)) return false;
    for (int i = order; i < n_samples; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += kFixedCoefs[order][j] * out[i - 1 - j];
      out[i] = pred + resid[i - order];
    }
  } else if (sf_type >= 32) {  // LPC
    int order = sf_type - 31;
    for (int i = 0; i < order; i++) out[i] = br.ReadSint(bps);
    int precision = (int)br.ReadUint(4) + 1;
    int shift = (int)br.ReadSint(5);
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) coefs[i] = br.ReadSint(precision);
    std::vector<int64_t> resid;
    if (!DecodeResidual(br, n_samples, order, resid)) return false;
    for (int i = order; i < n_samples; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coefs[j] * out[i - 1 - j];
      out[i] = (pred >> shift) + resid[i - order];
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < n_samples; i++) out[i] <<= wasted;
  return br.ok();
}

const int kBlockSizeTable[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

}  // namespace

extern "C" {

// Decode FLAC from memory. Returns 0 on success.
// On success: *out_samples (interleaved-by-channel planar: ch0 then ch1...),
// caller frees with free_buffer.
int decode_flac(const uint8_t* data, size_t size, float** out_samples,
                int64_t* out_total, int* out_channels, int* out_sr) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  int sr = 0, channels = 0, bps = 0;
  int64_t total = 0;
  // metadata
  while (pos + 4 <= size) {
    uint8_t header = data[pos];
    bool last = header & 0x80;
    int btype = header & 0x7F;
    size_t length = ((size_t)data[pos + 1] << 16) | ((size_t)data[pos + 2] << 8) |
                    data[pos + 3];
    const uint8_t* body = data + pos + 4;
    if (btype == 0 && length >= 18) {  // STREAMINFO
      sr = ((int)body[10] << 12) | ((int)body[11] << 4) | (body[12] >> 4);
      channels = ((body[12] >> 1) & 0x07) + 1;
      bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1;
      total = ((int64_t)(body[13] & 0x0F) << 32) | ((int64_t)body[14] << 24) |
              ((int64_t)body[15] << 16) | ((int64_t)body[16] << 8) | body[17];
    }
    pos += 4 + length;
    if (last) break;
  }
  if (sr == 0 || channels == 0 || total == 0) return -2;

  std::vector<std::vector<int64_t>> out((size_t)channels);
  for (auto& ch : out) ch.resize((size_t)total);
  int64_t written = 0;

  while (written < total) {
    BitReader br(data, size, pos);
    if (br.ReadUint(14) != 0x3FFE) return -3;
    br.ReadUint(1);
    br.ReadUint(1);
    int bs_code = (int)br.ReadUint(4);
    int sr_code = (int)br.ReadUint(4);
    int ch_code = (int)br.ReadUint(4);
    br.ReadUint(3);
    br.ReadUint(1);
    br.ReadUtf8Number();
    int block_size;
    if (bs_code == 6) block_size = (int)br.ReadUint(8) + 1;
    else if (bs_code == 7) block_size = (int)br.ReadUint(16) + 1;
    else block_size = kBlockSizeTable[bs_code];
    if (sr_code == 12) br.ReadUint(8);
    else if (sr_code == 13 || sr_code == 14) br.ReadUint(16);
    br.ReadUint(8);  // header CRC

    int n_ch;
    enum { kIndep, kLeftSide, kRightSide, kMidSide } mode;
    if (ch_code < 8) { n_ch = ch_code + 1; mode = kIndep; }
    else if (ch_code == 8) { n_ch = 2; mode = kLeftSide; }
    else if (ch_code == 9) { n_ch = 2; mode = kRightSide; }
    else if (ch_code == 10) { n_ch = 2; mode = kMidSide; }
    else return -4;

    std::vector<std::vector<int64_t>> subs((size_t)n_ch);
    for (int c = 0; c < n_ch; c++) {
      int ch_bps = bps;
      if ((mode == kLeftSide && c == 1) || (mode == kRightSide && c == 0) ||
          (mode == kMidSide && c == 1))
        ch_bps += 1;
      if (!DecodeSubframe(br, block_size, ch_bps, subs[c])) return -5;
    }
    br.Align();
    br.ReadUint(16);  // frame CRC
    pos = br.pos();

    int64_t n = block_size;
    if (written + n > total) n = total - written;
    for (int64_t i = 0; i < n; i++) {
      int64_t ch_vals[8];
      if (mode == kIndep) {
        for (int c = 0; c < n_ch; c++) ch_vals[c] = subs[c][i];
      } else if (mode == kLeftSide) {
        ch_vals[0] = subs[0][i];
        ch_vals[1] = subs[0][i] - subs[1][i];
      } else if (mode == kRightSide) {
        ch_vals[1] = subs[1][i];
        ch_vals[0] = subs[0][i] + subs[1][i];
      } else {  // mid-side
        int64_t mid = subs[0][i], side = subs[1][i];
        int64_t l = ((mid << 1) | (side & 1)) + side;
        ch_vals[0] = l >> 1;
        ch_vals[1] = (((mid << 1) | (side & 1)) - side) >> 1;
      }
      for (int c = 0; c < channels && c < n_ch; c++)
        out[(size_t)c][(size_t)(written + i)] = ch_vals[c];
    }
    written += n;
  }

  float scale = 1.0f / (float)(1LL << (bps - 1));
  float* buf = (float*)malloc(sizeof(float) * (size_t)total * (size_t)channels);
  if (!buf) return -6;
  for (int c = 0; c < channels; c++)
    for (int64_t i = 0; i < total; i++)
      buf[(size_t)c * (size_t)total + (size_t)i] =
          (float)out[(size_t)c][(size_t)i] * scale;
  *out_samples = buf;
  *out_total = total;
  *out_channels = channels;
  *out_sr = sr;
  return 0;
}

// Decode PCM WAV (8/16/24/32-bit int + 32-bit float) from memory.
int decode_wav(const uint8_t* data, size_t size, float** out_samples,
               int64_t* out_total, int* out_channels, int* out_sr) {
  if (size < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  size_t pos = 12;
  int fmt = 0, channels = 0, sr = 0, bits = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_size = 0;
  while (pos + 8 <= size) {
    const char* cid = (const char*)(data + pos);
    uint32_t clen;
    memcpy(&clen, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (memcmp(cid, "fmt ", 4) == 0 && clen >= 16) {
      uint16_t v16;
      memcpy(&v16, body, 2); fmt = v16;
      memcpy(&v16, body + 2, 2); channels = v16;
      uint32_t v32;
      memcpy(&v32, body + 4, 4); sr = (int)v32;
      memcpy(&v16, body + 14, 2); bits = v16;
    } else if (memcmp(cid, "data", 4) == 0) {
      pcm = body;
      pcm_size = clen < size - pos - 8 ? clen : size - pos - 8;
    }
    pos += 8 + clen + (clen & 1);
  }
  if (!pcm || channels == 0 || sr == 0) return -2;
  int bytes = bits / 8;
  int64_t total = (int64_t)(pcm_size / (size_t)(bytes * channels));
  float* buf = (float*)malloc(sizeof(float) * (size_t)total * (size_t)channels);
  if (!buf) return -6;
  for (int64_t i = 0; i < total; i++) {
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = pcm + (size_t)(i * channels + c) * (size_t)bytes;
      float v = 0.f;
      if (fmt == 3 && bits == 32) {
        memcpy(&v, p, 4);
      } else if (bits == 16) {
        int16_t s; memcpy(&s, p, 2);
        v = (float)s / 32768.0f;
      } else if (bits == 24) {
        int32_t s = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) |
                              ((uint32_t)p[2] << 16));
        if (s & 0x800000) s |= (int32_t)0xFF000000u;
        v = (float)s / 8388608.0f;
      } else if (bits == 32) {
        int32_t s; memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      } else if (bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      } else {
        free(buf);
        return -3;
      }
      buf[(size_t)c * (size_t)total + (size_t)i] = v;
    }
  }
  *out_samples = buf;
  *out_total = total;
  *out_channels = channels;
  *out_sr = sr;
  return 0;
}

void free_buffer(float* p) { free(p); }

}  // extern "C"

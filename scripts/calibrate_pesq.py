"""Recalibrate pesq_native's disturbance->raw-MOS constants on a
multi-family anchor set (VERDICT r2 item 7).

Anchor targets are literature-informed approximations of P.862.1/.2
MOS-LQO for classic degradation families (white noise at SNR, MNRU,
band-limitation, time-muting). No ITU conformance material exists in this
environment; the goal is a jointly-consistent calibration across families
(the round-2 calibration was fitted on white noise alone, which pushed all
the weight onto the asymmetric channel and left subtractive degradations
— band-limitation, muting — almost unpenalized).

Run: python scripts/calibrate_pesq.py  -> prints fitted _CAL constants and
per-anchor residuals.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile
from scipy.optimize import minimize
from scipy.signal import butter, lfilter, resample_poly

import puresound_tpu.src.pesq_native as pn

WAV = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"


def load_speech():
    sr, wav = wavfile.read(WAV)
    x = wav.astype(np.float64) / 32768.0
    x = x[: sr * 6]
    return x / np.abs(x).max()


def disturbances(cfg, ref, deg):
    r = pn._fix_power_level(ref, cfg.fs)
    d = pn._fix_power_level(deg, cfg.fs)
    if cfg.wideband:
        r = lfilter(pn._WB_IIR_B, pn._WB_IIR_A, r)
        d = lfilter(pn._WB_IIR_B, pn._WB_IIR_A, d)
    else:
        r = pn._apply_db_curve(r, cfg.fs, pn._IRS_DB)
        d = pn._apply_db_curve(d, cfg.fs, pn._IRS_DB)
    r, d = pn._align(r, d, cfg.fs)
    d = pn._utterance_align(r, d, cfg.fs)
    return pn._perceptual_model(r, d, cfg)


def make_anchors(x, fs, mode):
    rng = np.random.default_rng(0)

    def noisy(snr):
        n = rng.standard_normal(len(x))
        n *= np.sqrt(np.sum(x**2) / (np.sum(n**2) * 10 ** (snr / 10)))
        return x + n

    def mnru(Q):
        n = rng.standard_normal(len(x))
        return x * (1 + 10 ** (-Q / 20) * n)

    def lowpass(c):
        b, a = butter(6, c / (fs / 2))
        return lfilter(b, a, x)

    def mute(frac):
        m = np.where((np.arange(len(x)) % fs) < (1 - frac) * fs, 1.0, 0.0)
        return x * m

    def reverb(t60):
        # synthetic exponential-decay RIR, unit direct path, tail scaled
        # to a realistic direct-to-reverberant ratio for a ~1.5 m source
        # (DRR shrinks as T60 grows) — published PESQ-vs-T60 curves are
        # measured in such rooms, so the DRR must match or the condition
        # is far harsher than its target
        L = int(t60 * fs)
        env = np.exp(-3.0 * np.log(10) * np.arange(L) / L)
        tail = rng.standard_normal(L) * env
        drr_db = 10.0 - 11.0 * t60  # 0.3->6.7, 0.6->3.4, 1.0->-1 dB
        g = np.sqrt(10 ** (-drr_db / 10.0) / np.sum(env ** 2))
        h = np.concatenate([[1.0], g * tail])
        y = np.convolve(x, h)[: len(x)]
        return y / (np.abs(y).max() + 1e-12) * np.abs(x).max()

    def ulaw(bits=8, mu=255.0):
        # mu-law compand/expand (G.711-style companding distortion)
        c = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        q = np.round(c * (2 ** (bits - 1) - 1)) / (2 ** (bits - 1) - 1)
        return np.sign(q) * (np.expm1(np.abs(q) * np.log1p(mu))) / mu

    def bitcrush(bits):
        s = 2 ** (bits - 1) - 1
        return np.round(x * s) / s

    if mode == "wb":
        # targets: white noise per round-2 anchors; MNRU per P.862 design
        # behaviour; band-limitation per published WB-PESQ bandwidth
        # studies (NB speech in WB mode ~= 3.1); muting by audibility
        return [
            ("noise50", noisy(50), 4.2), ("noise40", noisy(40), 3.8),
            ("noise30", noisy(30), 3.1),
            ("noise20", noisy(20), 2.3), ("noise10", noisy(10), 1.7),
            ("noise0", noisy(0), 1.3),
            ("mnru35", mnru(35), 3.8), ("mnru25", mnru(25), 3.1),
            ("mnru15", mnru(15), 2.2),
            ("lp3400", lowpass(3400), 3.1), ("lp2000", lowpass(2000), 2.7),
            ("lp1000", lowpass(1000), 2.5),
            ("mute20", mute(0.2), 1.7),
            # reverberation: published PESQ-vs-T60 curves for reverberant
            # speech (direct path present) — mild/medium/strong
            ("rev300", reverb(0.3), 3.2), ("rev600", reverb(0.6), 2.6),
            ("rev1000", reverb(1.0), 2.1),
            # codec-like: mu-law companding noise is MULTIPLICATIVE
            # (proportional to |x| by construction), i.e. MNRU-equivalent
            # at Q ~= 38 dB for 8-bit — interpolating this set's own MNRU
            # ladder (Q35 -> 3.8) gives ~3.9 (round-5 re-derivation; the
            # round-2 target 3.6 treated it as additive noise, which
            # contradicts the MNRU anchors under any monotone mapping).
            # 6-bit LINEAR quantization is NOT multiplicative (uniform
            # step; much worse SNR in quiet passages) — kept at the
            # additive-like 2.8.
            ("ulaw8", ulaw(8), 3.9), ("crush6", bitcrush(6), 2.8),
        ]
    return [
        ("noise50", noisy(50), 4.3), ("noise40", noisy(40), 4.0),
        ("noise30", noisy(30), 3.4),
        ("noise20", noisy(20), 2.7), ("noise10", noisy(10), 2.0),
        ("noise0", noisy(0), 1.5),
        ("mnru35", mnru(35), 3.9), ("mnru25", mnru(25), 3.2),
        ("mnru15", mnru(15), 2.3),
        ("lp1700", lowpass(1700), 3.2), ("lp1000", lowpass(1000), 2.9),
        ("mute20", mute(0.2), 1.8),
        ("rev300", reverb(0.3), 3.0), ("rev600", reverb(0.6), 2.4),
        ("rev1000", reverb(1.0), 1.9),
        ("ulaw8", ulaw(8), 4.0), ("crush6", bitcrush(6), 2.9),
    ]


def mos_of(raw, wideband):
    raw = np.clip(raw, -0.5, 4.5)
    if wideband:
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))


def fit(mode_name):
    x = load_speech()
    if mode_name == "nb":
        x = resample_poly(x, 1, 2)
        cfg = pn._NB
    else:
        cfg = pn._WB
    anchors = make_anchors(x, cfg.fs, mode_name)
    ds = np.array([disturbances(cfg, x, deg) for _, deg, _ in anchors])
    tgt = np.array([t for _, _, t in anchors])
    names = [n for n, _, _ in anchors]

    def model(p):
        # 6-param per-channel power laws with model-noise floors (round 5):
        # D' = k_d*max(D-d0,0)^p_d, A' = k_a*max(A-a0,0)^p_a. The floors
        # absorb the small constant disturbance the formula-derived band
        # structure produces even for near-transparent pairs.
        k_d, p_d, k_a, p_a, d0, a0 = np.exp(p)  # positivity
        p_a = min(p_a, 3.0)  # bound: steeper fits knee sharply around one
        # family's disturbance scale and generalize badly out-of-family
        De = np.maximum(ds[:, 0] - d0, 0.0)
        Ae = np.maximum(ds[:, 1] - a0, 0.0)
        raw = (4.5 - pn._D_WEIGHT * k_d * De ** p_d
               - pn._A_WEIGHT * k_a * np.where(Ae > 0, Ae ** p_a, 0.0))
        return mos_of(raw, cfg.wideband)

    def loss(p):
        return np.sum((model(p) - tgt) ** 2)

    k0 = list(pn._CAL[mode_name])
    best = None
    p0s = [np.log(np.maximum(k0, 1e-4))]
    # floor parameters have many local minima — grid the starts
    for d0 in (0.005, 0.01, 0.02, 0.03, 0.05):
        for a0 in (0.01, 0.05, 0.15, 0.4, 2.5):
            for kd in (15.0, 30.0, 60.0):
                p0s.append(np.log([kd, 0.3, 1.0, 1.5, d0, a0]))
    for p0 in p0s:
        r = minimize(loss, p0, method="Nelder-Mead",
                     options={"maxiter": 8000, "xatol": 1e-7,
                              "fatol": 1e-10})
        if best is None or r.fun < best.fun:
            best = r
    k = np.exp(best.x)
    got = model(best.x)
    print(f"{mode_name}: _CAL = ({k[0]:.4f}, {k[1]:.4f}, {k[2]:.4f}, "
          f"{min(k[3], 3.0):.4f}, {k[4]:.4f}, {k[5]:.4f})")
    for n, g, t in zip(names, got, tgt):
        flag = "  <-- off" if abs(g - t) > 0.25 else ""
        print(f"  {n:8s} got {g:.2f} target {t:.2f}  ({g-t:+.2f}){flag}")
    print(f"  rms residual: {np.sqrt(best.fun/len(tgt)):.3f}")
    return k


if __name__ == "__main__":
    fit("wb")
    fit("nb")

"""Grid-search the post-masking knobs (_POSTMASK_RHO, _POSTMASK_K) against
the anchor families (round 5, VERDICT item 4).

Caches the aligned (ref, deg) pair per anchor once (filter+align dominate),
then re-runs only the perceptual model per knob combo and reports the
4-param-calibrated rms per mode — plus the per-family residuals of the
winning combo.

Run: python scripts/exp_pesq_postmask.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.signal import lfilter, resample_poly

import puresound_tpu.src.pesq_native as pn
from calibrate_pesq import load_speech, make_anchors
from exp_pesq_model import fit4


def aligned_pairs(mode_name):
    x = load_speech()
    if mode_name == "nb":
        x = resample_poly(x, 1, 2)
        cfg = pn._NB
    else:
        cfg = pn._WB
    anchors = make_anchors(x, cfg.fs, mode_name)
    pairs, names, tgts = [], [], []
    for name, deg, tgt in anchors:
        r = pn._fix_power_level(x, cfg.fs)
        d = pn._fix_power_level(deg, cfg.fs)
        if cfg.wideband:
            r = lfilter(pn._WB_IIR_B, pn._WB_IIR_A, r)
            d = lfilter(pn._WB_IIR_B, pn._WB_IIR_A, d)
        else:
            r = pn._apply_db_curve(r, cfg.fs, pn._IRS_DB)
            d = pn._apply_db_curve(d, cfg.fs, pn._IRS_DB)
        r, d = pn._align(r, d, cfg.fs)
        d = pn._utterance_align(r, d, cfg.fs)
        pairs.append((r, d))
        names.append(name)
        tgts.append(tgt)
    return cfg, pairs, names, np.asarray(tgts)


def main():
    data = {m: aligned_pairs(m) for m in ("wb", "nb")}
    results = []
    for rho in (0.3, 0.5, 0.7):
        for k in (0.0, 0.15, 0.3, 0.5):
            pn._POSTMASK_RHO, pn._POSTMASK_K = rho, k
            rms = {}
            per = {}
            for m, (cfg, pairs, names, tgt) in data.items():
                ds = np.array([pn._perceptual_model(r, d, cfg)
                               for r, d in pairs])
                best, got = fit4(cfg, ds, tgt, m)
                rms[m] = float(np.sqrt(best.fun / len(tgt)))
                per[m] = (names, got, tgt)
            results.append((rho, k, rms, per))
            print(f"rho={rho} k={k}: wb {rms['wb']:.3f} nb {rms['nb']:.3f}",
                  flush=True)
    best = min(results, key=lambda r: r[2]["wb"] + r[2]["nb"])
    rho, k, rms, per = best
    print(f"\nBEST rho={rho} k={k}: wb {rms['wb']:.3f} nb {rms['nb']:.3f}")
    for m in ("wb", "nb"):
        names, got, tgt = per[m]
        print(f"-- {m} --")
        for n, g, t in zip(names, got, tgt):
            flag = " <-- off" if abs(g - t) > 0.15 else ""
            print(f"  {n:9s} got {g:.2f} tgt {t:.2f} ({g - t:+.2f}){flag}")


if __name__ == "__main__":
    main()

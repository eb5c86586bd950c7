"""PESQ model-detail iteration harness (round 5, VERDICT item 4).

Computes per-anchor (d_symm, d_asym) under the CURRENT pesq_native model
for both modes, prints them alongside targets, and reports the best
achievable rms for the standard 4-param calibration — separating "the
model can't order the families" (model work needed) from "the mapping
can't bend" (calibration-form work needed).

Run: python scripts/exp_pesq_model.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.optimize import minimize
from scipy.signal import resample_poly

import puresound_tpu.src.pesq_native as pn
from calibrate_pesq import disturbances, load_speech, make_anchors, mos_of


def channels(mode_name):
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
    return cfg, names, ds, tgt


def fit4(cfg, ds, tgt, mode_name):
    def model(p):
        k_d, p_d, k_a, p_a = np.exp(p)
        p_a = min(p_a, 3.0)
        raw = (4.5 - pn._D_WEIGHT * k_d * ds[:, 0] ** p_d
               - pn._A_WEIGHT * k_a * np.where(ds[:, 1] > 0,
                                               ds[:, 1] ** p_a, 0.0))
        return mos_of(raw, cfg.wideband)

    def loss(p):
        return np.sum((model(p) - tgt) ** 2)

    k0 = pn._CAL[mode_name]
    best = None
    for sd in (0.25, 1.0, 4.0, 16.0, 64.0):
        p0 = np.log([k0[0] * sd, k0[1], k0[2], k0[3]])
        r = minimize(loss, p0, method="Nelder-Mead",
                     options={"maxiter": 4000, "xatol": 1e-6, "fatol": 1e-9})
        if best is None or r.fun < best.fun:
            best = r
    return best, model(best.x)


def main():
    for mode_name in ("wb", "nb"):
        cfg, names, ds, tgt = channels(mode_name)
        best, got = fit4(cfg, ds, tgt, mode_name)
        print(f"\n== {mode_name} ==  (4-param fit rms "
              f"{np.sqrt(best.fun / len(tgt)):.3f})")
        print(f"{'anchor':9s} {'D':>8s} {'A':>9s} {'got':>5s} {'tgt':>5s} "
              f"{'err':>6s}")
        for n, (d, a), g, t in zip(names, ds, got, tgt):
            print(f"{n:9s} {d:8.4f} {a:9.4f} {g:5.2f} {t:5.2f} {g - t:+6.2f}")
        np.save(f"/tmp/pesq_ds_{mode_name}.npy", ds)


if __name__ == "__main__":
    main()

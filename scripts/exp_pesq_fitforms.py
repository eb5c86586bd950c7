"""Offline calibration-form experiments on the dumped (D, A) channel grid
(/tmp/pesq_grid.npz from exp_pesq_dump_ds.py).

Forms:
  p4: raw = 4.5 - 0.1*k_d*D^p_d - 0.0309*k_a*A^p_a          (round-4 form)
  p6: floors — k_d*max(D-d0,0)^p_d, k_a*max(A-a0,0)^p_a
  p6r: two-regime D exponent — k_d*D^p1/(1+(D/c)^(p1-p2)) with p2 fixed

Run: python scripts/exp_pesq_fitforms.py
"""
import numpy as np
from scipy.optimize import minimize

Z = np.load("/tmp/pesq_grid.npz", allow_pickle=True)


def mos_of(raw, wb):
    raw = np.clip(raw, -0.5, 4.5)
    if wb:
        return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))


def fit(ds, tgt, wb, form):
    D, A = ds[:, 0], ds[:, 1]

    if form == "p4":
        def model(p):
            k_d, p_d, k_a, p_a = np.exp(p)
            p_a = min(p_a, 3.0)
            raw = 4.5 - 0.1 * k_d * D ** p_d - 0.0309 * k_a * np.where(
                A > 0, A ** p_a, 0.0)
            return mos_of(raw, wb)
        p0s = [np.log([27.5, 0.29, 0.28, 2.5]), np.log([23.5, 0.36, 0.69, 1.9]),
               np.log([100.0, 0.5, 0.1, 1.5])]
    elif form == "p6":
        def model(p):
            k_d, p_d, k_a, p_a, d0, a0 = np.exp(p)
            p_a = min(p_a, 3.0)
            De = np.maximum(D - d0, 0.0)
            Ae = np.maximum(A - a0, 0.0)
            raw = 4.5 - 0.1 * k_d * De ** p_d - 0.0309 * k_a * np.where(
                Ae > 0, Ae ** p_a, 0.0)
            return mos_of(raw, wb)
        p0s = [np.log([27.5, 0.29, 0.28, 2.5, 0.01, 0.05]),
               np.log([23.5, 0.36, 0.69, 1.9, 0.02, 0.1]),
               np.log([60.0, 0.5, 0.3, 1.5, 0.005, 0.02])]
        # d0/a0 grid multi-start: the floor parameters have many local
        # minima (hand analysis finds a consistent d0~0.02 p~0.27 solution
        # the single-start search misses)
        for d0 in (0.005, 0.01, 0.02, 0.03, 0.05):
            for a0 in (0.01, 0.05, 0.15, 0.4):
                for kd in (15.0, 30.0, 60.0, 120.0):
                    p0s.append(np.log([kd, 0.27, 0.4, 2.0, d0, a0]))
    elif form == "p6r":
        def model(p):
            k_d, p1, c, k_a, p_a, p2 = np.exp(p)
            p_a = min(p_a, 3.0)
            p2 = min(p2, p1)
            Dr = k_d * D ** p1 / (1.0 + (D / c) ** (p1 - p2))
            raw = 4.5 - 0.1 * Dr - 0.0309 * k_a * np.where(
                A > 0, A ** p_a, 0.0)
            return mos_of(raw, wb)
        p0s = [np.log([60.0, 1.0, 0.3, 0.28, 2.5, 0.3]),
               np.log([30.0, 0.8, 0.5, 0.69, 1.9, 0.4])]

    def loss(p):
        return np.sum((model(p) - tgt) ** 2)

    best = None
    for p0 in p0s:
        r = minimize(loss, p0, method="Nelder-Mead",
                     options={"maxiter": 8000, "xatol": 1e-7, "fatol": 1e-10})
        if best is None or r.fun < best.fun:
            best = r
    return best, model(best.x)


for m in ("wb", "nb"):
    tgt = Z[f"{m}_tgt"]
    names = Z[f"{m}_names"]
    print(f"\n===== {m} =====")
    rows = []
    for rho in (0.5, 0.7):
        for k in (0.0, 0.15, 0.3, 0.5):
            ds = Z[f"{m}_ds_r{rho}_k{k}"]
            line = f"rho={rho} k={k}: "
            for form in ("p4", "p6", "p6r"):
                best, got = fit(ds, tgt, m == "wb", form)
                rms = np.sqrt(best.fun / len(tgt))
                line += f"{form} {rms:.3f}  "
                rows.append((rms, rho, k, form, got, best))
            print(line)
    rms, rho, k, form, got, best = min(rows, key=lambda r: r[0])
    print(f"BEST {m}: rho={rho} k={k} form={form} rms={rms:.3f} "
          f"params={np.exp(best.x).round(4)}")
    for n, g, t in zip(names, got, tgt):
        flag = " <-- off" if abs(g - t) > 0.12 else ""
        print(f"  {n:9s} got {g:.2f} tgt {t:.2f} ({g - t:+.2f}){flag}")

"""Dump per-anchor (D, A) channels for a knob grid to /tmp/pesq_grid2.npz
so calibration-form experiments can iterate offline.

Knobs: _COMP_FLOOR (partial-compensation depth floor) x postmask (rho, k).

Run: python scripts/exp_pesq_dump_ds.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import puresound_tpu.src.pesq_native as pn
from exp_pesq_postmask import aligned_pairs

out = {}
data = {m: aligned_pairs(m) for m in ("wb", "nb")}
for m, (cfg, pairs, names, tgt) in data.items():
    out[f"{m}_tgt"] = tgt
    out[f"{m}_names"] = np.array(names)
    for floor in (0.01, 0.02, 0.04):
        for k in (0.0, 0.15, 0.3, 0.5):
            pn._COMP_FLOOR = floor
            pn._POSTMASK_RHO, pn._POSTMASK_K = 0.7, k
            ds = np.array([pn._perceptual_model(r, d, cfg)
                           for r, d in pairs])
            out[f"{m}_ds_f{floor}_k{k}"] = ds
            print(m, floor, k, "done", flush=True)
np.savez("/tmp/pesq_grid2.npz", **out)
print("saved /tmp/pesq_grid2.npz")

"""Roofline accounting: FLOPs / HBM bytes per step vs chip peaks.

The round-1 verdict asked for MFU and bandwidth-utilization numbers next
to every latency claim so the next optimization lever (compute vs HBM vs
launch) is identifiable from the bench JSON alone.

FLOP/byte counts come from XLA's compiled cost analysis where available
(`Compiled.cost_analysis()`), which is exact for the XLA-lowered graph but
counts custom calls (Pallas kernels) as zero — those are added analytically
(`fused_skim_kernel_cost`, `lstm_scan_cost`).
"""
from __future__ import annotations

from typing import Dict, Optional

# TPU v5e (v5 lite) public per-chip peaks: 197 TFLOP/s bf16 matmul,
# 819 GB/s HBM bandwidth, 16 GiB HBM. f32 matmuls run at roughly half the
# bf16 rate on the MXU; MFU below is reported against the bf16 peak (the
# serving dtype), so f32 runs understate their MXU occupancy by ~2x.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


def xla_cost(lowered_compiled) -> Dict[str, float]:
    """Extract (flops, bytes_accessed) from a jax Compiled object.

    Returns zeros when the backend provides no analysis (CPU interpret)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return {"flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


def cost_of(fn, *args) -> Dict[str, float]:
    """Lower+compile a jitted fn and return its XLA cost analysis."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    return xla_cost(jitted.lower(*args).compile())


def fused_skim_kernel_cost(B: int, F: int, C: int, H: int, n_blocks: int,
                           fusion_modes, gate_hidden: int = 128,
                           dtype_bytes: int = 2) -> Dict[str, float]:
    """Analytic FLOPs + HBM bytes of ops/skim_stream_kernel.py (XLA sees it
    as a custom call with zero cost).

    Per frame per block: LSTM matmuls x@w_ih [B,C]x[C,4H] + h@w_hh
    [B,H]x[H,4H], proj [B,H]x[H,C]; FiLM adds 2x [B,C]x[C,C]; Gate adds
    in/left/right/out 1x1 convs. HBM traffic: x, y, se/be/ge, h/c states,
    and one read of the weights per stream tile.
    """
    flops = 0.0
    for i in range(n_blocks):
        flops += 2.0 * B * F * (C * 4 * H + H * 4 * H + H * C)
        if fusion_modes[i] == "film":
            flops += 2.0 * B * F * 2 * C * C
        elif fusion_modes[i] == "gate":
            Hd = gate_hidden
            flops += 2.0 * B * F * (C * Hd + 2 * Hd * Hd + Hd * C)
    # weights per block (+ conditioning weights), read once per stream tile;
    # approximate with one full read (tiles share via VMEM residency)
    w_elems = n_blocks * (C * 4 * H + H * 4 * H + 4 * H + H * C + C + 2 * C)
    for i in range(n_blocks):
        if fusion_modes[i] == "film":
            w_elems += 2 * C * C + 2 * C
        elif fusion_modes[i] == "gate":
            Hd = gate_hidden
            w_elems += C * Hd + 2 * Hd * Hd + Hd * C + 4 * Hd + 2
    io_elems = (2 * B * F * C          # x in, y out
                + 2 * n_blocks * B * C  # se/be
                + 4 * n_blocks * B * H)  # h/c in+out
    return {"flops": flops, "bytes": dtype_bytes * (io_elems + w_elems)}


def lstm_scan_cost(rows: int, T: int, H: int,
                   dtype_bytes: int = 2) -> Dict[str, float]:
    """Analytic cost of ops/lstm_scan_kernel.py: the recurrent half of an
    LSTM ([rows,H]x[H,4H] per step; the input projection is XLA-side and
    already counted by cost_analysis)."""
    flops = 2.0 * rows * T * H * 4 * H
    io_elems = rows * T * 4 * H + rows * T * H + 4 * rows * H + H * 4 * H
    return {"flops": flops, "bytes": dtype_bytes * io_elems}


def summarize(step_ms: float, flops: float, bytes_hbm: float,
              peak_flops: float = V5E_BF16_FLOPS,
              peak_bw: float = V5E_HBM_BYTES_S) -> Dict[str, float]:
    """MFU + bandwidth utilization for one measured step."""
    t = step_ms / 1000.0
    achieved_flops = flops / t if t > 0 else 0.0
    achieved_bw = bytes_hbm / t if t > 0 else 0.0
    return {
        "tflops": round(achieved_flops / 1e12, 2),
        "mfu_pct_bf16peak": round(100.0 * achieved_flops / peak_flops, 2),
        "hbm_gbps": round(achieved_bw / 1e9, 1),
        "hbm_util_pct": round(100.0 * achieved_bw / peak_bw, 2),
        "gflops_per_step": round(flops / 1e9, 2),
        "mbytes_per_step": round(bytes_hbm / 1e6, 1),
    }

"""Sequence parallelism: one long recording spread over the device mesh.

Offline enhancement of a long recording (meeting, broadcast) is latency
bound on a single chip. Here the TIME axis is sharded over the mesh: each
device runs the model's offline forward on its own chunk, extended by a
left/right halo so the chunk-local result matches the full-sequence
result on the kept interior (overlap-discard at the mesh level).

Exactness:
- finite receptive field (pure conv/TCN/FSMN models): exact once
  halo_left >= receptive field and halo_right >= lookahead — both are
  measurable with `utils.model_info.probe_lookahead_receptive`.
- recurrent models (LSTM/attention bottlenecks): the left halo acts as a
  state burn-in; the error decays with halo length (the recurrence
  forgets). `seq_parallel_infer(..., halo_left=...)` lets callers buy
  accuracy with overlap; tests measure the SNR-vs-halo curve.
- GLOBAL signal edges (first/last ~receptive-field samples of the whole
  recording) can differ slightly from the unchunked run: the first
  chunk's zero left-halo creates analysis frames the full-signal run
  never forms (its VALID framing has no frames before sample 0), and
  biases/ReLU make those frames contribute. Chunk-to-chunk interior
  boundaries are exact.

The reference framework has no equivalent (single-GPU inference only,
e.g. /root/reference/puresound/task/tse.py eval loops); this is a
TPU-mesh capability on top of the same model zoo.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _round_up(v: int, align: int) -> int:
    return int(math.ceil(v / align) * align) if align > 1 else int(v)


def overlapped_chunks(x: jnp.ndarray, n: int, halo_left: int,
                      halo_right: int, align: int = 1):
    """Split x [B, T] into n overlapped chunks [n, B, halo_l + Lc + halo_r].

    Chunk starts land on multiples of `align` (the model's frame hop /
    encoder stride) so every chunk sees the same framing grid as the full
    signal. Returns (chunks, Lc, T) — callers keep y[..., halo_l:halo_l+Lc]
    per chunk and trim the concatenation back to T.
    """
    B, T = x.shape
    halo_left = _round_up(halo_left, align)
    Lc = _round_up(int(math.ceil(T / n)), align)
    total = n * Lc
    # zeros left of chunk 0 / right of the last chunk mirror the model's
    # own edge behavior closely enough: those regions are either the true
    # signal edge (chunk 0's left) or trimmed away (tail padding)
    xp = jnp.pad(x, ((0, 0), (halo_left, total - T + halo_right)))
    starts = [i * Lc for i in range(n)]
    win = halo_left + Lc + halo_right
    chunks = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, s, win, axis=1)
                        for s in starts], axis=0)
    return chunks, Lc, T


def seq_parallel_infer(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    mesh: Mesh,
    halo_left: int,
    halo_right: int = 0,
    align: int = 1,
    axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run offline inference `fn` ([B, Tc] -> [B, Tc]) time-sharded.

    x: [T] or [B, T] waveform. The time axis is split over every device
    of `mesh` (all axes flattened unless `axis` names one); each device
    applies `fn` to its halo-extended chunk, halos are discarded, and the
    interiors are re-concatenated.

    halo_left / halo_right: samples of context each chunk borrows from
    its neighbors. For exact equality with `fn(x)` use the model's
    receptive field / lookahead (probe_lookahead_receptive); for
    recurrent models a longer halo_left buys accuracy.
    align: chunk starts snap to this grid (encoder hop) so framing
    matches the full-signal run.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    axes = (axis,) if axis else tuple(mesh.axis_names)
    n = int(np.prod([mesh.shape[a] for a in axes]))
    if n == 1:
        y = fn(x)
        return y[0] if squeeze else y

    chunks, Lc, T = overlapped_chunks(x, n, halo_left, halo_right, align)
    halo_l = chunks.shape[-1] - Lc - halo_right

    def per_device(c):
        # c: [1, B, win] — this device's chunk
        y = fn(c[0])
        y = y[..., halo_l:halo_l + Lc]
        return y[None]

    spec = P(axes if len(axes) > 1 else axes[0])
    # check_vma off: fn's internals (scan carries initialized from
    # replicated zeros) mix unvarying and device-varying values; the map
    # is collective-free so replication checking has nothing to protect
    shard_fn = jax.shard_map(per_device, mesh=mesh, in_specs=(spec,),
                             out_specs=spec, check_vma=False)
    y = shard_fn(chunks)                      # [n, B, Lc]
    y = jnp.moveaxis(y, 0, 1).reshape(x.shape[0], n * Lc)[:, :T]
    y = jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P()))
    return y[0] if squeeze else y

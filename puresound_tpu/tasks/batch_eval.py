"""Shape-bucketed, padded, jitted batch inference for evaluation loops.

TPU-native eval design. The reference scores its dev sets one utterance at
a time at native length (reference: egs/tse/main.py:154-216) — under XLA
every distinct input shape is a fresh trace+compile (minutes each over the
tunneled TPU) and batch-1 work leaves the MXU idle. This module replaces
that loop shape-for-shape:

- lengths are quantized UP onto a coarse bucket grid (default 1 s of
  audio), so the number of compiled shapes is small and bounded;
- mixture inputs are zero-padded to the bucket; outputs are sliced back to
  the true length. For causal models only the trailing analysis window can
  differ from the batch-1 result: measured on a causal DPCRN (n_fft=512),
  the interior agrees >150 dB while the final 512 samples diverge O(1) —
  the native-length iSTFT divides by the tapering window-sum there while
  the padded path sees full window coverage plus boundary frames. Both are
  exact inverses of their respective framings; neither tail is "wrong",
  but dev scores on very short utterances can shift by a few tenths of a
  dB vs the per-utterance path;
- enrollment inputs are tile-padded (cyclic repeat): zero-padding would
  shift global-norm statistics and ASP pooling inside the speaker net,
  while repeating the same speaker's audio preserves them;
- every device batch is padded to a fixed ``batch_size`` (repeating the
  first row), so each bucket shape compiles exactly once.

Results come back in submission order regardless of bucket grouping.
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["BucketedBatchRunner", "quantize_length"]


def quantize_length(n: int, quantum: int) -> int:
    """Round a length UP to the bucket grid (at least one quantum)."""
    if quantum <= 0:
        raise ValueError(f"quantum must be positive, got {quantum}")
    return max(quantum, int(math.ceil(n / quantum)) * quantum)


def _pad_last(x: np.ndarray, target: int, mode: str) -> np.ndarray:
    """Pad [..., L] to [..., target] with zeros or by cyclic tiling."""
    L = x.shape[-1]
    if L == target:
        return x
    if L > target:
        raise ValueError(f"length {L} exceeds bucket {target}")
    if mode == "zero":
        pad = [(0, 0)] * (x.ndim - 1) + [(0, target - L)]
        return np.pad(x, pad)
    if mode == "tile":
        reps = int(math.ceil(target / L))
        return np.concatenate([x] * reps, axis=-1)[..., :target]
    raise ValueError(f"unknown pad mode {mode!r} (use 'zero' or 'tile')")


class BucketedBatchRunner:
    """Run a jitted array function over variable-length items in shape
    buckets.

    Args:
        fn: callable taking ``arity`` arrays, each ``[B, L_k]``, returning an
            array ``[B, ...]`` (extra axes allowed, e.g. ``[B, M, T]`` for
            multi-output separation). It is jitted once; XLA caches one
            executable per bucket shape.
        batch_size: fixed device batch; short groups are padded up to it.
        quantum: bucket grid in samples (e.g. ``sample_rate`` for 1 s);
            either one int for all inputs or a per-input sequence. Use a
            coarser grid for secondary inputs (enrollments): bucket keys
            are the cross product over inputs, and continuously-varying
            enrollment lengths would otherwise give every utterance its
            own compile.
        pad_modes: per-input padding, ``"zero"`` (mixtures) or ``"tile"``
            (enrollments). Arity is inferred from this tuple.
        out_slice_axis: axis of the output to slice back to input 0's true
            length (``None`` = no slicing, e.g. embedding outputs).
    """

    def __init__(self, fn: Callable, batch_size: int = 8,
                 quantum=16000,
                 pad_modes: Sequence[str] = ("zero",),
                 out_slice_axis: Optional[int] = -1,
                 use_jit: bool = True):
        import jax

        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.fn = jax.jit(fn) if use_jit else fn
        self.batch_size = int(batch_size)
        self.pad_modes = tuple(pad_modes)
        if isinstance(quantum, (int, float)):
            self.quanta = (int(quantum),) * len(self.pad_modes)
        else:
            self.quanta = tuple(int(q) for q in quantum)
            if len(self.quanta) != len(self.pad_modes):
                raise ValueError(
                    f"quantum has {len(self.quanta)} entries, pad_modes "
                    f"has {len(self.pad_modes)}")
        self.out_slice_axis = out_slice_axis
        self.bucket_keys: List[Tuple[int, ...]] = []  # in first-seen order

    # ------------------------------------------------------------------
    def run(self, items: Sequence[Sequence[np.ndarray]],
            progress: Optional[Callable[[int, int], None]] = None
            ) -> List[np.ndarray]:
        """items: each a tuple of ``arity`` arrays shaped ``[1, L]`` (or
        ``[L]``). Returns one np output per item, in submission order."""
        arity = len(self.pad_modes)
        norm: List[Tuple[np.ndarray, ...]] = []
        for it in items:
            arrs = tuple(np.atleast_2d(np.asarray(a)) for a in it)
            if len(arrs) != arity:
                raise ValueError(
                    f"item has {len(arrs)} inputs, pad_modes has {arity}")
            norm.append(arrs)

        groups = {}
        for i, arrs in enumerate(norm):
            key = tuple(quantize_length(a.shape[-1], q)
                        for a, q in zip(arrs, self.quanta))
            groups.setdefault(key, []).append(i)

        results: List[Optional[np.ndarray]] = [None] * len(norm)
        done = 0
        for key, idxs in groups.items():
            if key not in self.bucket_keys:
                self.bucket_keys.append(key)
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                rows = chunk + [chunk[0]] * (self.batch_size - len(chunk))
                inputs = []
                for k in range(arity):
                    inputs.append(np.concatenate(
                        [_pad_last(norm[r][k], key[k], self.pad_modes[k])
                         for r in rows], axis=0))
                out = np.asarray(self.fn(*inputs))
                for j, idx in enumerate(chunk):
                    o = out[j]
                    if self.out_slice_axis is not None:
                        sl = [slice(None)] * o.ndim
                        sl[self.out_slice_axis] = \
                            slice(0, norm[idx][0].shape[-1])
                        o = o[tuple(sl)]
                    # copy: a view would pin the whole padded [B, L_bucket]
                    # batch buffer alive for each result's lifetime
                    results[idx] = np.ascontiguousarray(o)
                done += len(chunk)
                if progress is not None:
                    progress(done, len(norm))
        return results  # type: ignore[return-value]

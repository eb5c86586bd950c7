"""Model introspection: parameter counts and the empirical lookahead /
receptive-field probe (inf-injection, mirroring base_nn.py:740-777)."""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def probe_lookahead_receptive(
    inference_fn: Callable[[jnp.ndarray], jnp.ndarray],
    length: int = 160000,
    inject_at: Optional[int] = None,
    seed: int = 0,
) -> Tuple[Optional[int], Optional[int]]:
    """Measure (lookahead, receptive_field) in samples by inf injection.

    lookahead: inject inf at t >= inject_at; the first NaN in the output
    appears `lookahead` samples BEFORE inject_at. None means infinite
    (non-causal) lookahead.
    receptive field: inject inf at t < inject_at; the last NaN appears
    `receptive` samples after the inf region ends. None means infinite.
    """
    if inject_at is None:
        inject_at = length // 2
    rng = np.random.default_rng(seed)
    x = rng.random((1, length)).astype(np.float32)

    x_look = x.copy()
    x_look[:, inject_at:] = np.inf
    y = np.asarray(inference_fn(jnp.asarray(x_look)))
    nan_idx = np.where(np.isnan(y))[-1]
    if len(nan_idx) == 0 or nan_idx[0] == 0:
        lookahead = None  # infinite
    else:
        lookahead = int(inject_at - nan_idx[0])

    x_rf = x.copy()
    x_rf[:, :inject_at] = np.inf
    y = np.asarray(inference_fn(jnp.asarray(x_rf)))
    nan_idx = np.where(np.isnan(y))[-1]
    if len(nan_idx) == 0:
        receptive = 0
    else:
        receptive = int(nan_idx[-1] - (inject_at - 1))
        if receptive >= y.shape[-1] - inject_at:
            receptive = None  # infinite
    return lookahead, receptive

"""Speaker/embedding losses: GE2E, Triplet, soft-F1.

Parity: puresound/nnet/loss/metrics.py (GE2ELoss :9, TripletLoss :158,
F1_loss :217).

TPU-first: GE2E's per-(speaker, utterance) Python loops become one
vectorized leave-one-out centroid/cosine computation.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class GE2ELoss(nn.Module):
    """Generalized end-to-end speaker verification loss.

    Input dvecs [nspks * putts, D] (grouped by speaker). Learnable scale w
    and bias b on the cosine-similarity matrix.
    """

    nspks: int
    putts: int
    init_w: float = 10.0
    init_b: float = -5.0
    loss_method: str = "softmax"
    add_norm: bool = True

    @nn.compact
    def __call__(self, dvecs: jnp.ndarray,
                 label: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        w = self.param("w", lambda _: jnp.asarray(self.init_w))
        b = self.param("b", lambda _: jnp.asarray(self.init_b))
        if self.add_norm:
            dvecs = dvecs / jnp.linalg.norm(dvecs, axis=1, keepdims=True).clip(1e-12)
        N, M = self.nspks, self.putts
        dvecs = dvecs.reshape(N, M, -1)

        # leave-one-out centroids: for the own speaker, exclude the utterance
        sums = jnp.sum(dvecs, axis=1)  # [N, D]
        centroids = sums / M  # [N, D]
        excl = (sums[:, None, :] - dvecs) / (M - 1)  # [N, M, D]

        # cosine similarity of each (j, i) vs all centroids k, with the
        # k == j column replaced by the leave-one-out centroid
        def cos(u, v):
            return jnp.sum(u * v, -1) / (jnp.linalg.norm(u, axis=-1)
                                         * jnp.linalg.norm(v, axis=-1))

        sim_all = cos(dvecs[:, :, None, :], centroids[None, None, :, :])  # [N, M, N]
        sim_own = cos(dvecs, excl)  # [N, M]
        eye = jnp.eye(N, dtype=bool)[:, None, :]  # [N, 1, N]
        cos_sim = jnp.where(eye, sim_own[:, :, None], sim_all)
        cos_sim = jnp.clip(cos_sim, min=1e-6)
        cos_sim = cos_sim * w + b

        if self.loss_method == "softmax":
            logp = jax.nn.log_softmax(cos_sim, axis=-1)  # [N, M, N]
            L = -jnp.take_along_axis(
                logp, jnp.arange(N)[:, None, None].repeat(M, 1), axis=-1)[..., 0]
        elif self.loss_method == "contrast":
            sig = jax.nn.sigmoid(cos_sim)
            own = jnp.take_along_axis(
                sig, jnp.arange(N)[:, None, None].repeat(M, 1), axis=-1)[..., 0]
            others = jnp.where(eye, -jnp.inf, sig)
            L = 1.0 - own + jnp.max(others, axis=-1)
        else:
            raise NameError(self.loss_method)
        return jnp.sum(L)


class TripletLoss:
    """Margin triplet loss on [N, 3, C] = (anchor, positive, negative)."""

    def __init__(self, margin: float = 0.0, add_norm: bool = True,
                 distance: str = "Euclidean"):
        self.margin = margin
        self.add_norm = add_norm
        self.distance = distance

    def __call__(self, x: jnp.ndarray, reduction: bool = True) -> jnp.ndarray:
        assert x.shape[1] == 3
        if self.add_norm:
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
        anchor, pos, neg = x[:, 0], x[:, 1], x[:, 2]
        if self.distance.lower() == "euclidean":
            d_pos = jnp.sqrt(jnp.sum((anchor - pos) ** 2, -1) + 1e-8)
            d_neg = jnp.sqrt(jnp.sum((anchor - neg) ** 2, -1) + 1e-8)
        elif self.distance.lower() in ("cosine", "consine"):
            def cos(a, b):
                return jnp.sum(a * b, -1) / jnp.sqrt(
                    jnp.sum(a * a, -1) * jnp.sum(b * b, -1))
            d_pos = cos(anchor, pos)
            d_neg = cos(anchor, neg)
        else:
            raise NameError(self.distance)
        loss = jnp.maximum(0.0, d_pos - d_neg + self.margin)
        return jnp.mean(loss) if reduction else loss


class F1Loss:
    """Soft F1 loss (1 - F1) for PVAD sigmoid outputs."""

    def __init__(self, eps: float = 1e-10):
        self.eps = eps

    def __call__(self, estimates: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        tp = jnp.sum(targets * estimates)
        fp = jnp.sum((1 - targets) * estimates)
        fn = jnp.sum(targets * (1 - estimates))
        precision = tp / (tp + fp + self.eps)
        recall = tp / (tp + fn + self.eps)
        f1 = 2 * precision * recall / (precision + recall + self.eps)
        return 1 - f1


# alias matching the reference's class name
F1_loss = F1Loss

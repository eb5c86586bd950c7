"""Device-mesh parallelism: data-parallel training + stream-sharded serving.

The reference's only parallelism is single-host torch DataParallel
(puresound/task/base.py:226-229, loss-mean across replicas). The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`:

- training: params replicated, batch sharded on the "dp" axis; XLA inserts
  the gradient all-reduce (psum) over ICI automatically from shardings.
- serving: the stream-batch axis of the streaming engine shards the same
  way; the step contains no collectives at all.

The mesh is ("dp", "mp"): "mp" (model axis) is 1 for every current model
(all <= 16M params) but the API keeps larger models additive, not a rewrite.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_mp: int = 1,
              devices=None) -> Mesh:
    """Build a ("dp", "mp") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_mp
    devs = np.asarray(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(devs, ("dp", "mp"))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with its leading axis sharded over dp.

    Under a multi-process runtime each process passes its LOCAL rows (see
    DataLoader(shard=...)) and the global batch is their concatenation in
    process order (parallel/multihost.py)."""
    if jax.process_count() > 1:
        from .multihost import global_put

        return global_put(mesh, batch,
                          lambda x: P("dp") if x.ndim else P())
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def tp_spec(shape, n_mp: int, min_size: int = 64) -> P:
    """Tensor-parallel PartitionSpec for one param leaf, by shape alone.

    Rule: shard the LARGEST eligible axis (divisible by n_mp and at least
    `min_size`; ties prefer the later axis) over "mp" — that catches both
    this repo's torch-layout conv kernels ([C_out, C_in, k]: channel axes
    lead) and dense/LSTM kernels ([in, out]: features trail); biases, norm
    scales, and tiny kernels stay replicated. Whatever axis is picked,
    GSPMD derives a correct program (a reduction-axis shard just becomes a
    psum of partial products). Shape-based on purpose: the optimizer state
    (adam mu/nu) mirrors param shapes, so the same rule places params and
    their optimizer moments identically.
    """
    if n_mp <= 1 or len(shape) < 2:
        return P()
    best = -1
    for ax, n in enumerate(shape):
        if n % n_mp == 0 and n >= min_size and (best < 0
                                                or n >= shape[best]):
            best = ax
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = "mp"
    return P(*spec)


def shard_state_to_mesh(mesh: Mesh, state, tp: bool = False,
                        tp_min_size: int = 64):
    """Place a TrainState on the mesh: replicated, or tensor-parallel.

    tp=True shards eligible param (and optimizer-moment) leaves over the
    "mp" mesh axis per `tp_spec`; GSPMD then derives the activation
    shardings and collectives inside the jitted step from the leaf
    placements alone — the XLA-native form of torch tensor parallelism,
    which the reference never had (its only parallelism is DataParallel,
    puresound/task/base.py:226-229).
    """
    n_mp = mesh.shape.get("mp", 1)
    if jax.process_count() > 1:
        if tp:
            raise NotImplementedError(
                "tensor parallelism across processes is not supported; "
                "use TRAIN.mp_devices only within one host")
        from .multihost import global_put

        return global_put(mesh, state, lambda x: P())

    def put(x):
        if not hasattr(x, "shape"):
            return x
        spec = tp_spec(x.shape, n_mp, tp_min_size) if tp else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + opt + mutable collections)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats or {}, opt_state=tx.init(params),
                   tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_train_step(model, loss_kwargs: Optional[Dict] = None,
                    grad_clip: Optional[float] = None,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    remat: bool = False,
                    compute_dtype=None,
                    accum_steps: int = 1,
                    skip_nonfinite: bool = False,
                    augment_fn: Optional[Callable] = None,
                    tp: bool = False, tp_min_size: int = 64) -> Callable:
    """Build the jitted (optionally mesh-sharded) train step.

    The returned step(state, batch, rng) -> (state, metrics) where batch is
    a dict of model call kwargs (noisy/enroll/ref_clean/...). When a mesh is
    given, the batch is expected sharded on "dp" and params replicated; XLA
    derives the gradient all-reduce from the shardings.

    remat=True rematerializes the whole forward pass during backprop
    (jax.checkpoint); remat="dots" saves only dot/conv outputs and
    recomputes elementwise/norm chains. Both trade FLOPs for HBM so large
    batches / long inputs FIT on-chip; measured on the flagship model
    (B=64 x 2 s, bf16) neither is a latency win (70 ms plain vs 90 ms
    dots vs ~92 ms full remat) — the recurrent scans are latency-bound,
    so recompute adds serial work. Use remat for memory, not speed.

    compute_dtype=jnp.bfloat16 enables mixed precision: the forward/backward
    run with bf16 params and activations (bf16 MXU rate, half the
    activation HBM) while the master params, gradients, and optimizer state
    stay float32 (the cast is differentiated through, so grads come out
    f32; batch_stats updates are cast back to f32).

    skip_nonfinite=True guards production runs: a batch producing a
    NaN/Inf loss or gradient applies a ZERO update (params/opt-moments
    advance as a zero-gradient step, batch_stats keep their previous
    value) and metrics["skipped"]=1 flags it. Jittable (jnp.where), so it
    composes with the dp/tp mesh and grad accumulation. YAML:
    TRAIN.skip_nan_steps.

    accum_steps=k runs gradient accumulation: the batch's leading axis is
    split into k micro-batches scanned sequentially (activation memory is
    that of ONE micro-batch), the averaged gradient is applied once — how
    effective B=256 trains inside 16 GB HBM when the full batch OOMs.
    Batch B must be divisible by k. batch_stats chain through the scan
    (last micro-batch wins, like k sequential steps would).

    tp=True switches from replicated params to tensor-parallel ones: place
    the state with shard_state_to_mesh(mesh, state, tp=True) first (eligible
    kernel leaves sharded on "mp" per tp_spec) and dp-shard the batch as
    usual; the step is jitted without explicit in/out shardings so GSPMD
    derives the 2D (dp x mp) layout, collectives included, from the
    argument placements.
    """
    loss_kwargs = loss_kwargs or {}
    # augment_fn(rng, batch) -> batch runs INSIDE the jitted step (on
    # device, before the forward): with a mesh it executes sharded over
    # "dp" like the rest of the step — the on-device augmentation path
    # (src/augment_jax.DeviceAugmentor.make_augment_fn).

    def _cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def step_fn(state: TrainState, batch: Dict, rng) -> tuple:
        if augment_fn is not None:
            rng, arng = jax.random.split(rng)
            batch = augment_fn(arng, batch)

        def forward(params, stats, batch, rng):
            if compute_dtype is not None:
                params = _cast(params, compute_dtype)
                batch = _cast(batch, compute_dtype)
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = (
                    stats if compute_dtype is None
                    else _cast(stats, compute_dtype))
            out = model.apply(
                variables, **batch, train=True, **loss_kwargs,
                mutable=["batch_stats"], rngs={"dropout": rng})
            if compute_dtype is not None:
                out = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32)
                    if hasattr(a, "dtype") and a.dtype == compute_dtype
                    else a, out)
            return out

        if remat == "dots":
            # save only matmul/conv outputs; recompute elementwise/norm
            # chains in backward (their f32 intermediates are the biggest
            # residuals). A memory lever — measured slightly slower than
            # no-remat on-chip (see docstring).
            forward = jax.checkpoint(
                forward, policy=jax.checkpoint_policies.checkpoint_dots)
        elif remat:
            forward = jax.checkpoint(forward)

        def grad_micro(params, stats, b, r):
            def loss_fn(p):
                out, updates = forward(p, stats, b, r)
                loss = out[0] if isinstance(out, tuple) else out
                detail = out[1] if isinstance(out, tuple) else None
                return loss, (updates.get("batch_stats", {}), detail)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        if accum_steps > 1:
            def split(x):
                if x is None or not hasattr(x, "shape") or x.ndim == 0:
                    return x
                assert x.shape[0] % accum_steps == 0, (
                    f"batch {x.shape[0]} must divide accum_steps {accum_steps}")
                return x.reshape((accum_steps, x.shape[0] // accum_steps)
                                 + x.shape[1:])

            micro = {k: split(v) for k, v in batch.items()}
            rngs = jax.random.split(rng, accum_steps)

            # stats chain through the carry only when the state carries
            # them (a model whose first apply CREATES collections would
            # otherwise change the carry structure mid-scan)
            has_stats = bool(state.batch_stats)

            def body(carry, xs):
                grads_acc, loss_acc, stats = carry
                b, r = xs
                (mloss, (mstats, mdetail)), mgrads = grad_micro(
                    state.params, stats, b, r)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, mgrads)
                return (grads_acc, loss_acc + mloss,
                        mstats if has_stats and mstats else stats), mdetail

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss, new_stats), details = jax.lax.scan(
                body, (zeros, jnp.zeros(()), state.batch_stats),
                (micro, rngs))
            k = float(accum_steps)
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            loss = loss / k
            detail = (None if details is None else
                      jax.tree_util.tree_map(lambda d: d.mean(0), details))
        else:
            (loss, (new_stats, detail)), grads = grad_micro(
                state.params, state.batch_stats, batch, rng)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        else:
            gnorm = optax.global_norm(grads)
        if skip_nonfinite:
            # production guard: one batch with a NaN/Inf loss or gradient
            # (bad sample, fp overflow) must not poison the params — apply
            # a ZERO update instead (Adam moments and the step counter
            # still advance, matching a zero-gradient step; jittable, so
            # it composes with the dp/tp mesh and grad accumulation).
            # metrics["skipped"] reports it; the reference trainer
            # (puresound/task/base.py:255-276) has no such guard.
            ok = jnp.isfinite(gnorm) & jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        state = state.apply_gradients(grads)
        if new_stats:
            if skip_nonfinite and (jax.tree_util.tree_structure(new_stats)
                                   == jax.tree_util.tree_structure(
                                       state.batch_stats)):
                # keep the previous stats on a skipped step (only possible
                # when the state already carries them — on the very first
                # apply that CREATES the collections there is no previous)
                new_stats = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new_stats,
                    state.batch_stats)
            state = state.replace(batch_stats=new_stats)
        if tp and mesh is not None:
            # anchor the output layout to the tp rule — without this GSPMD
            # may re-decide small updated params as replicated and the
            # sharded layout (the memory scaling tp buys) erodes step over
            # step
            n_mp = mesh.shape.get("mp", 1)

            def constrain(x):
                if not hasattr(x, "shape"):
                    return x
                spec = tp_spec(x.shape, n_mp, tp_min_size)
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))

            state = state.replace(
                params=jax.tree_util.tree_map(constrain, state.params),
                opt_state=jax.tree_util.tree_map(constrain, state.opt_state))
        metrics = {"loss": loss, "grad_norm": gnorm}
        if skip_nonfinite:
            metrics["skipped"] = (~ok).astype(jnp.float32)
        if detail is not None:
            for i, d in enumerate(detail):
                metrics[f"loss_{i}"] = d
        return state, metrics

    if mesh is not None and not tp:
        replicated = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("dp"))
        step_fn = jax.jit(
            step_fn,
            in_shardings=(replicated, dp, replicated),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,) if donate else (),
        )
    else:
        # tp: the state arrives committed with per-leaf shardings
        # (shard_state_to_mesh(tp=True)) and the batch dp-sharded; jit
        # honors the argument placements and GSPMD propagates them through
        # the step, inserting the mp all-gathers/reduce-scatters and the dp
        # gradient all-reduce itself.
        step_fn = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return step_fn


def replicate_to_mesh(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh. Multi-process: every
    process must pass the identical host value (e.g. seeded rng keys)."""
    if jax.process_count() > 1:
        from .multihost import global_put

        return global_put(mesh, tree, lambda x: P())
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_by_slots(mesh: Mesh, tree, n_slots: int, axis: str = "dp",
                   slot_axes=None):
    """Device-put a serving pytree with each leaf's stream/slot axis sharded.

    Per leaf, the FIRST axis whose size equals `n_slots` shards over the
    mesh axis (engine state leaves are [B, ...]; recurrent carries carry B
    in a later position, e.g. [D, B, H] / [F, B, H] / [1, B, F, H]);
    leaves with no such axis — shared clocks like SkiM's scalar
    frame_count — replicate. Same slot-axis heuristic as the
    SessionServer masked reset (streaming/server._masked_state_reset):
    if a non-slot axis coincidentally equals `n_slots`, pass
    slot_axes=streaming.server.infer_slot_axes(init_state) for exact
    per-leaf axes (-1 = replicate). The streaming step is embarrassingly
    parallel along slots, so GSPMD compiles a collective-free per-device
    program from these placements alone."""
    def put(x, ax=None):
        x = jnp.asarray(x)
        spec = [None] * x.ndim
        if ax is None:  # heuristic: first axis whose size == n_slots
            ax = next((i for i, s in enumerate(x.shape) if s == n_slots),
                      -1)
        if ax >= 0:
            spec[ax] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    if slot_axes is not None:
        return jax.tree_util.tree_map(lambda a, x: put(x, a),
                                      slot_axes, tree)
    return jax.tree_util.tree_map(put, tree)

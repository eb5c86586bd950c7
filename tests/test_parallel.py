"""Device-mesh tests on the 8-device virtual CPU mesh: DP training step,
stream-sharded serving step, jax.export round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from puresound_tpu.parallel import TrainState, make_mesh, make_train_step, shard_batch
from puresound_tpu.parallel.mesh import replicate_to_mesh

KEY = jax.random.PRNGKey(0)


def _tiny_tse():
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.nnet.skim import SkiM

    return SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=24,
                           output_active=True),
        masker=SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                    seg_size=10, causal=True, embed_dim=8, embed_norm=True,
                    embed_fusion="FiLM", block_with_embed=(1, 1)),
        speaker_net=(TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
                         dconv_norm="gGN"),
                     AttentiveStatisticsPooling(24, 16),
                     Conv1d(48, 8, 1, use_bias=False)),
        loss_func_wav=SDRLoss.init_mode("sisnr"), mask_constraint="ReLU")


def test_mesh_has_8_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.shape["dp"] == 8 and mesh.shape["mp"] == 1


def test_dp_train_step_matches_single_device(rng):
    """One dp-sharded step must equal the unsharded step bit-for-bit-ish."""
    model = _tiny_tse()
    B, L = 8, 800
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    tx = optax.adam(1e-3)

    def run(mesh):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model, grad_clip=10.0, mesh=mesh, donate=False)
        rngk = jax.random.PRNGKey(1)
        if mesh is not None:
            state = replicate_to_mesh(mesh, state)
            b = shard_batch(mesh, batch)
            rngk = replicate_to_mesh(mesh, rngk)
        else:
            b = batch
        state, metrics = step(state, b, rngk)
        return float(metrics["loss"]), state

    loss_single, state_single = run(None)
    loss_mesh, state_mesh = run(make_mesh())
    np.testing.assert_allclose(loss_mesh, loss_single, rtol=1e-5)
    # params after ONE adam step: g/sqrt(g^2) amplifies cross-device
    # reduction-order noise to O(lr) on near-zero grads, so compare with an
    # lr-scale tolerance (loss/grad_norm above are the tight checks)
    for a, b in zip(jax.tree_util.tree_leaves(state_single.params),
                    jax.tree_util.tree_leaves(state_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_tp_train_step_matches_single_device(rng):
    """One (dp=2, mp=4) tensor-parallel step must match the unsharded step:
    eligible kernels sharded on their output axis, GSPMD inserting the mp
    collectives + dp grad all-reduce from the leaf placements alone."""
    from jax.sharding import PartitionSpec as P

    from puresound_tpu.parallel import shard_state_to_mesh, tp_spec

    model = _tiny_tse()
    B, L = 8, 800
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    tx = optax.adam(1e-3)

    def run(mesh, tp):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model, grad_clip=10.0, mesh=mesh,
                               donate=False, tp=tp, tp_min_size=8)
        rngk = jax.random.PRNGKey(1)
        if mesh is not None:
            state = shard_state_to_mesh(mesh, state, tp=tp, tp_min_size=8)
            b = shard_batch(mesh, batch)
            rngk = replicate_to_mesh(mesh, rngk)
        else:
            b = batch
        state, metrics = step(state, b, rngk)
        return float(metrics["loss"]), state

    loss_single, state_single = run(None, False)
    mesh = make_mesh(n_dp=2, n_mp=4)
    # the rule must actually shard something at this width (tiny model dims
    # are multiples of 4 and >= 8)
    n_sharded = sum(
        tp_spec(p.shape, 4, min_size=8) != P()
        for p in jax.tree_util.tree_leaves(variables["params"]))
    assert n_sharded >= 4, n_sharded
    loss_tp, state_tp = run(mesh, True)
    np.testing.assert_allclose(loss_tp, loss_single, rtol=1e-5)
    # params stay sharded through the optimizer update (no silent
    # degeneration to replicated)
    mp_leaves = [p for p in jax.tree_util.tree_leaves(state_tp.params)
                 if hasattr(p, "sharding")
                 and "mp" in (p.sharding.spec or ())]
    assert len(mp_leaves) >= 4, len(mp_leaves)
    for a, b in zip(jax.tree_util.tree_leaves(state_single.params),
                    jax.tree_util.tree_leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_streaming_step_shards_over_streams(rng):
    """The serving step runs with the stream-batch axis sharded over dp
    (no collectives needed) and matches the unsharded result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.skim import SkiM
    from puresound_tpu.streaming.engine import StreamingTSE

    engine = StreamingTSE(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=24,
                           output_active=True),
        masker=SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                    seg_size=10, causal=True, embed_dim=8, embed_norm=True,
                    embed_fusion="FiLM", block_with_embed=(1, 1)),
        speaker_net=(TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
                         dconv_norm="gGN"),
                     AttentiveStatisticsPooling(24, 16),
                     Conv1d(48, 8, 1, use_bias=False)),
        mask_constraint="ReLU")
    B, S = 16, 80  # 16 streams over 8 devices
    chunk = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    enroll = jnp.asarray(rng.standard_normal((B, 400)).astype(np.float32) * 0.1)
    variables = engine.init(KEY, chunk, enroll, method=StreamingTSE.init_all)
    dvec = engine.apply(variables, enroll, method=StreamingTSE.embed)
    state = engine.apply(variables, B, method=StreamingTSE.init_state)

    def step(c, d, s):
        return engine.apply(variables, c, d, s, method=StreamingTSE.step)

    y_ref, _ = jax.jit(step)(chunk, dvec, state)

    mesh = make_mesh()

    def put(x):
        # shard whichever axis carries the stream batch (B); some state
        # leaves are [D, B, H], the frame counter is a scalar (replicated)
        axes = getattr(x, "shape", ())
        for i, n in enumerate(axes):
            if n == B:
                spec = P(*([None] * i + ["dp"]))
                return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    y_sh, new_state = jax.jit(step)(
        put(chunk), put(dvec), jax.tree_util.tree_map(put, state))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    # sharding survives into the carried state
    assert any(d.sharding.spec == P("dp")
               for d in jax.tree_util.tree_leaves(new_state)
               if hasattr(d, "sharding"))


def test_jax_export_roundtrip(rng):
    """export -> serialize -> deserialize -> call (the export_model path)."""
    from jax import export as jexport

    from puresound_tpu.nnet.encoder import FreeEncDec

    model = FreeEncDec(win_length=16, hop_length=8, laten_length=24)
    x = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    variables = model.init(KEY, x)

    def fn(x):
        return model.apply(variables, x)

    exp = jexport.export(jax.jit(fn))(x)
    data = exp.serialize()
    restored = jexport.deserialize(data)
    y1 = np.asarray(fn(x))
    y2 = np.asarray(restored.call(x))
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_remat_train_step_matches(rng):
    """remat=True (jax.checkpoint) must give identical grads/updates."""
    model = _tiny_tse()
    B, L = 4, 400
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    tx = optax.adam(1e-3)

    def run(remat):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model, grad_clip=10.0, donate=False, remat=remat)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["loss"]), float(metrics["grad_norm"])

    l0, g0 = run(False)
    l1, g1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    np.testing.assert_allclose(g1, g0, rtol=1e-5)


def test_streaming_ns_step_shards_over_streams(rng):
    """The STFT-domain serving step (StreamingNS/DSS family) also shards
    over the stream axis — including the DPRNN carries whose stream axis is
    fused with the frequency axis ([1, B*Fb, H])."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from puresound_tpu.nnet.dpcrn import DPCRN
    from puresound_tpu.nnet.encoder import ConvEncDec
    from puresound_tpu.streaming.ns_engine import StreamingNS

    n_fft, hop = 64, 16
    masker = DPCRN(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8), transpose_t_size=2,
                   transpose_delay=False, kernel_t=(2, 2), stride_t=(1, 1),
                   dilation_t=(1, 1), kernel_f=(5, 3), stride_f=(2, 2),
                   dilation_f=(1, 1), delay=(0, 0), rnn_hidden=8)
    engine = StreamingNS(
        encoder=ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                           trainable=True, output_format="Complex"),
        masker=masker, mask_constraint="linear", drop_first_bin=True)
    B, S = 16, hop * 4
    Fb = 8  # 32 freqs -> /2 -> /2
    chunk = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    variables = engine.init(KEY, chunk, method=StreamingNS.init_all)
    state = engine.apply(variables, B, method=StreamingNS.init_state)

    def step(c, s):
        return engine.apply(variables, c, s, method=StreamingNS.step)

    y_ref, _ = jax.jit(step)(chunk, state)

    mesh = make_mesh()

    def put(x):
        axes = getattr(x, "shape", ())
        for i, n in enumerate(axes):
            if n == B or n == B * Fb:  # plain or freq-fused stream axis
                spec = P(*([None] * i + ["dp"]))
                return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    y_sh, new_state = jax.jit(step)(put(chunk),
                                    jax.tree_util.tree_map(put, state))
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
    assert any(getattr(d, "sharding", None) is not None
               and d.sharding.spec in (P("dp"), P(None, "dp"))
               for d in jax.tree_util.tree_leaves(new_state))


def test_mixed_precision_train_step(rng):
    """compute_dtype=bf16: loss decreases, master params/grad state stay
    f32, metrics come out f32."""
    import optax

    from puresound_tpu.nnet.conv_tasnet import ConvTasNet
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.parallel.mesh import TrainState, make_train_step

    model = SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=16,
                           output_active=True),
        masker=ConvTasNet(input_dim=16, embed_dim=0, tcn_layer="normal",
                          tcn_kernel=3, tcn_dim=8, tcn_dilated_basic=2,
                          per_tcn_stack=2, repeat_tcn=1,
                          tcn_with_embed=(0, 0), tcn_norm="gLN",
                          dconv_norm="gGN", causal=False),
        loss_func_wav=SDRLoss.init_mode("sisnr"), mask_constraint="ReLU")
    B, L = 2, 256
    noisy = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    clean = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    variables = model.init({"params": KEY}, noisy=noisy, enroll=None,
                           ref_clean=clean, train=False)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats"),
                              optax.adam(1e-3))
    step = jax.jit(make_train_step(model, compute_dtype=jnp.bfloat16))
    batch = {"noisy": noisy, "enroll": None, "ref_clean": clean}
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert metrics["loss"].dtype == jnp.float32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))


def test_jax_export_streaming_step_roundtrip(rng):
    """The whole streaming step (state pytree in/out) exports, serializes,
    and restores — the serving-artifact path of export_model."""
    from jax import export as jexport

    from puresound_tpu.nnet.conv_tasnet import ConvTasNet
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.streaming.engine import StreamingTSE

    engine = StreamingTSE(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=16,
                           output_active=True),
        masker=ConvTasNet(input_dim=16, embed_dim=4, tcn_layer="normal",
                          tcn_kernel=3, tcn_dim=8, tcn_dilated_basic=2,
                          per_tcn_stack=2, repeat_tcn=1,
                          tcn_with_embed=(1, 0), tcn_norm="bN1d",
                          dconv_norm="bN1d", causal=True),
        speaker_net=(AttentiveStatisticsPooling(16, 8),
                     Conv1d(32, 4, 1, use_bias=False)),
        mask_constraint="ReLU")

    chunk = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32))
    enroll = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    variables = engine.init(KEY, chunk, enroll, method=StreamingTSE.init_all)
    dvec = engine.apply(variables, enroll, method=StreamingTSE.embed)
    state = engine.apply(variables, 1, method=StreamingTSE.init_state)

    def step(chunk, dvec, state):
        return engine.apply(variables, chunk, dvec, state,
                            method=StreamingTSE.step)

    exp = jexport.export(jax.jit(step))(chunk, dvec, state)
    restored = jexport.deserialize(exp.serialize())
    y1, s1 = jax.jit(step)(chunk, dvec, state)
    y2, s2 = restored.call(chunk, dvec, state)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_accum_matches_full_batch(rng):
    """accum_steps=k (scan over k micro-batches, averaged grads, one
    optimizer apply) must reproduce the full-batch step."""
    model = _tiny_tse()
    B, L = 8, 800
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    tx = optax.adam(1e-3)

    def run(accum):
        state = TrainState.create(variables["params"], {}, tx)
        step = make_train_step(model, grad_clip=10.0, donate=False,
                               accum_steps=accum)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return (float(metrics["loss"]), float(metrics["grad_norm"]), state)

    l1, g1, s1 = run(1)
    l4, g4, s4 = run(4)
    # micro vs full batch changes XLA's reduction tiling; f32 LSTM scans
    # amplify the reordering to ~1e-4 relative
    np.testing.assert_allclose(l4, l1, rtol=1e-3)
    np.testing.assert_allclose(g4, g1, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_grad_accum_with_mesh_and_mixed_precision(rng):
    """accum composes with the dp mesh and bf16 compute (the B=256-effective
    recipe: shard over dp, accumulate over micro-batches)."""
    model = _tiny_tse()
    B, L = 16, 400
    batch = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    variables = model.init(KEY, **batch, train=False)
    mesh = make_mesh()
    state = TrainState.create(variables["params"], {}, optax.adam(1e-3))
    state = replicate_to_mesh(mesh, state)
    step = make_train_step(model, grad_clip=10.0, mesh=mesh, donate=False,
                           compute_dtype=jnp.bfloat16, accum_steps=2)
    b = shard_batch(mesh, batch)
    rngk = replicate_to_mesh(mesh, jax.random.PRNGKey(1))
    losses = []
    for i in range(3):
        state, metrics = step(state, b, rngk)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() if hasattr(np.isfinite(losses), 'all') else all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_skip_nonfinite_guard(rng):
    """skip_nonfinite=True: a batch with NaN input leaves the params at the
    zero-update trajectory (flagged in metrics), a clean batch trains; the
    unguarded step poisons the params. YAML: TRAIN.skip_nan_steps."""
    model = _tiny_tse()
    B, L = 4, 400
    clean = {
        "noisy": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "enroll": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
        "ref_clean": jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1),
    }
    bad = dict(clean)
    bad["noisy"] = bad["noisy"].at[0, 7].set(np.nan)
    variables = model.init(KEY, **clean, train=False)
    rngk = jax.random.PRNGKey(1)

    guarded = make_train_step(model, grad_clip=10.0, donate=False,
                              skip_nonfinite=True)
    state = TrainState.create(variables["params"], {}, optax.adam(1e-3))
    # zero-update reference: what params look like after one zero-grad step
    zstate = state.apply_gradients(
        jax.tree_util.tree_map(jnp.zeros_like, state.params))

    s1, m1 = guarded(state, bad, rngk)
    assert float(m1["skipped"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(zstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s1.step) == 1

    s2, m2 = guarded(s1, clean, rngk)
    assert float(m2["skipped"]) == 0.0 and np.isfinite(float(m2["loss"]))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                               jax.tree_util.tree_leaves(s1.params)))

    unguarded = make_train_step(model, grad_clip=10.0, donate=False)
    s3, m3 = unguarded(state, bad, rngk)
    assert not np.isfinite(float(m3["loss"]))
    assert any(not np.all(np.isfinite(np.asarray(a)))
               for a in jax.tree_util.tree_leaves(s3.params))

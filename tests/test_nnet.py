"""Wrapper-level integration tests: zoo configs end-to-end, param-count
parity vs the torch reference, lookahead probes, loss+grad."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.base_nn import (
    SiMoTaskWrapModule,
    SoTaskWrapModule,
    apply_tf_masks,
    get_mask,
)
from puresound_tpu.nnet.loss.sdr import SDRLoss
from puresound_tpu.utils import count_params, probe_lookahead_receptive
from puresound_tpu.zoo import init_ns_model, init_tse_model

KEY = jax.random.PRNGKey(0)


def _torch_param_count(kind, name):
    import sys

    sys.path.insert(0, "/root/reference/egs/tse" if kind == "tse"
                    else "/root/reference/egs/ns")
    try:
        if kind == "tse":
            from model import init_model as torch_init  # noqa
        else:
            from model import init_model as torch_init  # noqa
        tm = torch_init(name, None, verbose=False) if kind == "ns" else \
            torch_init(name, None, None, verbose=False)
        return sum(p.numel() for p in tm.parameters())
    finally:
        sys.path.pop(0)
        import importlib, sys as _s
        _s.modules.pop("model", None)


@pytest.mark.parametrize("name,expect_io", [
    ("td_tse_conv_tasnet_v0", True),
    ("td_tse_conv_tasnet_v0_causal", True),
    ("tse_unet_tcn_v0", True),
    ("tse_unet_tcn_v0_causal", True),
    ("tse_unet_tcn_v1", True),
    ("tse_skim_v0", True),
    ("tse_skim_v0_causal", True),
    ("tse_skim_v1_causal", True),
    ("tse_skim_v2_causal", True),
    ("tse_skim_v0_causal_vad", True),
    ("veve_dprnn_v0_causal", True),
])
def test_tse_zoo_param_parity(torch_oracle, name, expect_io):
    """Param counts must match the reference models exactly."""
    model = init_tse_model(name)
    x = jnp.zeros((1, 3200))
    e = jnp.zeros((1, 1600))
    params = model.init(KEY, x, e, method=SoTaskWrapModule.inference)
    j_count = count_params(params.get("params", {}))
    t_count = _torch_param_count("tse", name)
    assert j_count == t_count, f"{name}: {j_count} vs torch {t_count}"


@pytest.mark.parametrize("name", ["ns_dpcrn_v0_causal", "ns_dpcrn_v0",
                                  "ns_dparn_v0_causal", "ns_dparn_v0"])
def test_ns_zoo_param_parity(torch_oracle, name):
    model = init_ns_model(name)
    x = jnp.zeros((1, 3200))
    params = model.init(KEY, x, method=SoTaskWrapModule.inference)
    j_count = count_params(params.get("params", {}))
    t_count = _torch_param_count("ns", name)
    assert j_count == t_count, f"{name}: {j_count} vs torch {t_count}"


def test_tse_skim_inference_and_loss(rng):
    """Flagship config: inference shape, loss value, gradient flow."""
    model = init_tse_model("tse_skim_v0_causal_vad",
                           sig_loss=SDRLoss.init_mode("sisnr"))
    x = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32) * 0.1)
    ref = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, e, method=SoTaskWrapModule.inference)
    out = model.apply(variables, x, e, method=SoTaskWrapModule.inference)
    assert out.shape == (2, 3200)
    assert bool(jnp.all(out >= 0) & jnp.all(out <= 1))  # sigmoid output

    def loss_fn(params):
        return model.apply({**variables, "params": params}, noisy=x, enroll=e,
                           ref_clean=ref, train=False)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_ns_dpcrn_inference(rng):
    model = init_ns_model("ns_dpcrn_v0_causal")
    x = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, method=SoTaskWrapModule.inference)
    out = model.apply(variables, x, method=SoTaskWrapModule.inference)
    assert out.ndim == 2 and out.shape[0] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_lookahead_probe_skim_causal():
    """tse_skim_v0_causal documented lookahead: 16 samples."""
    model = init_tse_model("tse_skim_v0_causal")
    L = 16000
    x0 = jnp.zeros((1, L))
    e0 = jnp.zeros((1, 8000))
    variables = model.init(KEY, x0, e0, method=SoTaskWrapModule.inference)
    enroll = jnp.asarray(np.random.default_rng(0).random((1, 8000), np.float32))

    def infer(x):
        return model.apply(variables, x, enroll, method=SoTaskWrapModule.inference)

    lookahead, receptive = probe_lookahead_receptive(infer, length=L,
                                                     inject_at=L // 2)
    assert lookahead == 16
    assert receptive is None  # infinite (LSTM memory)


def test_lookahead_probe_dpcrn_causal():
    """ns_dpcrn_v0_causal documented lookahead: 384 samples."""
    model = init_ns_model("ns_dpcrn_v0_causal")
    L = 16000
    x0 = jnp.zeros((1, L))
    variables = model.init(KEY, x0, method=SoTaskWrapModule.inference)

    def infer(x):
        return model.apply(variables, x, method=SoTaskWrapModule.inference)

    # inject at a hop multiple: the reference's documented 384 is measured at
    # sample 80000 = 625*128; misaligned injection reads 384 + (I mod 128)
    lookahead, _ = probe_lookahead_receptive(infer, length=L, inject_at=8192)
    assert lookahead == 384


def test_simo_wrapper(rng):
    """SIMO separation wrapper with a multi-output DPARN masker."""
    from puresound_tpu.nnet.dparn import DPARN_Mout
    from puresound_tpu.nnet.encoder import ConvEncDec

    model = SiMoTaskWrapModule(
        encoder=ConvEncDec(fft_length=256, win_length=256, hop_length=64,
                           trainable=True, output_format="Complex"),
        masker=DPARN_Mout(input_type="RI", input_dim=256, norm_type="bN2d",
                          dropout=0.0, channels=(1, 8, 8, 8, 16, 32),
                          transpose_t_size=2, kernel_t=(2, 2, 2, 2, 2),
                          stride_t=(1, 1, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
                          kernel_f=(5, 3, 3, 3, 3), stride_f=(2, 2, 1, 1, 1),
                          dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0),
                          multi_output=2, rnn_hidden=32, nhead=4),
        loss_func_wav=SDRLoss.init_mode("sisnr"),
        f_type="Complex", mask_type="Complex", drop_first_bin=True)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    ref = jnp.asarray(rng.standard_normal((2, 2, 4000)).astype(np.float32) * 0.1)
    inact = jnp.zeros((2, 2), bool)
    variables = model.init(KEY, x, method=SiMoTaskWrapModule.inference)
    out = model.apply(variables, x, method=SiMoTaskWrapModule.inference)
    assert out.shape[0] == 2 and out.shape[1] == 2
    loss = model.apply(variables, x, ref, inact, train=False)
    assert np.isfinite(float(loss))


def test_contrastive_and_joint_tasks(rng):
    """Task-2 (contrastive GE2E) and task-3 (triplet loop) forward paths."""
    from puresound_tpu.nnet.loss.metrics import GE2ELoss, TripletLoss
    from puresound_tpu.nnet.loss.aamsoftmax import AAMsoftmax

    x = jnp.asarray(rng.standard_normal((4, 3200)).astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((4, 3200)).astype(np.float32) * 0.1)
    ref = jnp.asarray(rng.standard_normal((4, 3200)).astype(np.float32) * 0.1)
    labels = jnp.asarray([0, 0, 1, 1])

    # task 2: contrastive-only
    m2 = init_tse_model("tse_skim_v0_causal_vad",
                        cls_loss=GE2ELoss(nspks=2, putts=2))
    assert m2.task == 2
    v2 = m2.init({"params": KEY}, noisy=x, enroll=e, spk_class=labels, train=False)
    loss2 = m2.apply(v2, noisy=x, enroll=e, spk_class=labels, train=False)
    assert np.isfinite(float(loss2))

    # task 3: wav + AAM + triplet loop
    m3 = init_tse_model("tse_skim_v0_causal_vad",
                        sig_loss=SDRLoss.init_mode("sisnr"),
                        cls_loss=AAMsoftmax(input_dim=192, n_class=4),
                        other_loss=TripletLoss(margin=0.3, distance="consine"))
    assert m3.task == 3
    v3 = m3.init({"params": KEY}, noisy=x, enroll=e, ref_clean=ref,
                 spk_class=labels, train=False)
    loss3, detail = m3.apply(v3, noisy=x, enroll=e, ref_clean=ref,
                             spk_class=labels, return_loss_detail=True,
                             train=False)
    assert np.isfinite(float(loss3)) and len(detail) == 3


def test_mask_algebra_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.base_nn import EncDecMaskerBaseModel

    tm = EncDecMaskerBaseModel()
    tf = rng.standard_normal((2, 8, 10)).astype(np.float32)
    mask = rng.standard_normal((2, 8, 10)).astype(np.float32)
    for mt, ft in (("complex", "complex"), ("real", "real")):
        with torch.no_grad():
            t_out = tm.apply_tf_masks(torch.from_numpy(tf),
                                      torch.from_numpy(mask), mt, ft)
        j_out = apply_tf_masks(jnp.asarray(tf), jnp.asarray(mask),
                               mask_type=mt, f_type=ft)
        if mt == "complex":
            # reference returns [N, C/2, T, 2]; ours returns RI-concat
            t_np = t_out.numpy()
            t_cat = np.concatenate([t_np[..., 0], t_np[..., 1]], axis=1)
            np.testing.assert_allclose(np.asarray(j_out), t_cat, atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                       atol=1e-5)


def test_polar_mask_formula(rng):
    """The reference's polar path is unrunnable (stacks the mask on dim=1
    against a dim=-1 feature, base_nn.py:75) — verify against the intended
    formula of _apply_complex_mask_on_polar (base_nn.py:161-190) instead."""
    tf = rng.standard_normal((2, 8, 10)).astype(np.float32)
    mask = rng.standard_normal((2, 8, 10)).astype(np.float32)
    re, im = np.split(tf, 2, axis=1)
    mre, mim = np.split(mask, 2, axis=1)
    tf_mag = np.sqrt(re**2 + im**2 + 1e-8)
    tf_phase = np.arctan2(im, re)
    mask_mag = np.sqrt(mre**2 + mim**2 + 1e-8)
    mask_phase = np.arctan2(mim / (mask_mag + 1e-8), mre / (mask_mag + 1e-8))
    est_mag = tf_mag * np.tanh(mask_mag)
    est_phase = tf_phase + mask_phase
    expect = np.concatenate([est_mag * np.cos(est_phase),
                             est_mag * np.sin(est_phase)], axis=1)
    j_out = apply_tf_masks(jnp.asarray(tf), jnp.asarray(mask),
                           mask_type="polar", f_type="polar")
    np.testing.assert_allclose(np.asarray(j_out), expect, atol=1e-5)

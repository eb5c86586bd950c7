"""Gradient parity vs the torch reference (VERDICT r2 item 5).

Forward/waveform parity is proven in test_waveform_parity.py; these tests
prove TRAINING semantics match: d loss / d params agree per-leaf between
`SoTaskWrapModule` here and the reference wrapper
(/root/reference/puresound/nnet/base_nn.py:479-534), on mapped weights in
float64.

Technique: after `loss.backward()` on the torch side, each parameter's
`.data` is swapped for its `.grad` and the SAME weight-mapping functions
(tests/torch_mapping.py) are re-applied — every mapping is a pure
transpose/reshape/concat of tensors, which transforms gradients exactly
like parameters, so the result is the torch gradient tree in the flax
layout, leaf-for-leaf comparable with `jax.grad`'s output.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_mapping as tmap
from puresound_tpu.src.audio import AudioIO

WAV = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"
FLAC = "/root/reference/test/test_case/1272-141231-0008.flac"


def _load_audio(n_mix=16000, n_enroll=16000):
    mix, sr = AudioIO.open(WAV)
    enroll, sr2 = AudioIO.open(FLAC)
    assert sr == sr2 == 16000
    return mix[:, :n_mix], enroll[:, :n_enroll]


def _swap_grads_into_data(torch, module):
    with torch.no_grad():
        for p in module.parameters():
            p.data = (p.grad.clone() if p.grad is not None
                      else torch.zeros_like(p))


def _leaf_snrs(ref_tree, got_tree):
    """Per-leaf grad SNR (dB) between two identically-structured pytrees."""
    refs = jax.tree_util.tree_leaves_with_path(ref_tree)
    gots = jax.tree_util.tree_leaves(got_tree)
    assert len(refs) == len(gots)
    global2 = sum(float(np.sum(np.asarray(r, np.float64) ** 2))
                  for _, r in refs)
    out = {}
    for (path, r), g in zip(refs, gots):
        r = np.asarray(r, np.float64)
        g = np.asarray(g, np.float64)
        assert r.shape == g.shape, (path, r.shape, g.shape)
        p2 = np.sum(r**2)
        if max(p2, np.sum(g**2)) < 1e-18 * global2:
            # analytically-null direction (e.g. a pre-softmax bias: softmax
            # over time is shift-invariant, so its true grad is exactly 0)
            # — both sides hold only float residue; nothing to compare
            continue
        snr = 10 * np.log10(p2 / np.maximum(np.sum((g - r) ** 2), 1e-300))
        out[jax.tree_util.keystr(path)] = snr
    return out


def test_tse_skim_joint_loss_grad_parity(torch_oracle):
    """Flagship TSE, task 1 (wav SDR + alpha * AAM speaker loss): loss value
    and every parameter gradient (encoder, 4-block SkiM, TCN speaker net,
    AAM weight) agree with the reference at f64."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    from puresound.nnet.loss.aamsoftmax import AAMsoftmax as TorchAAM
    from puresound.nnet.loss.sdr import SDRLoss as TorchSDRLoss

    from puresound_tpu.nnet.loss.aamsoftmax import AAMsoftmax
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.zoo import init_tse_model

    # batch of ONE: the reference MemLSTM leaks state across batch items
    # (its causal roll crosses the batch axis — documented at
    # nnet/skim.py:14-17, deliberately fixed here), so N>1 SkiM batches
    # genuinely differ from the reference on items >= 1; at N=1 the two
    # semantics coincide and gradients are comparable
    mix, enroll = _load_audio()
    noisy = mix
    ref = enroll[:, : mix.shape[-1]]
    enr = enroll
    spk = np.array([1])
    N_CLASS, ALPHA = 6, 10.0

    torch.manual_seed(5)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("tse_skim_v0_causal",
                        TorchSDRLoss.init_mode("sisnr"),
                        TorchAAM(input_dim=192, n_class=N_CLASS),
                        verbose=False).double()
        tm.eval()  # dropout off on both sides; grads still flow
        t_loss = tm(noisy=torch.from_numpy(noisy.astype(np.float64)),
                    enroll=torch.from_numpy(enr.astype(np.float64)),
                    ref_clean=torch.from_numpy(ref.astype(np.float64)),
                    spk_class=torch.from_numpy(spk),
                    alpha=ALPHA, return_loss_detail=False)
        t_loss.backward()
        t_loss_val = float(t_loss.detach())

        def tree_of(m):
            var = tmap.variables(tmap.so_wrapper_tse_skim(m))
            var["params"]["loss_func_spk"] = {
                "weight": tmap._a(m.loss_func_spk.weight)}
            return var

        variables = tree_of(tm)
        _swap_grads_into_data(torch, tm)
        t_grads = tree_of(tm)["params"]
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("tse_skim_v0_causal",
                            sig_loss=SDRLoss.init_mode("sisnr"),
                            cls_loss=AAMsoftmax(input_dim=192,
                                                n_class=N_CLASS))

        def loss_fn(params):
            v = {"params": params}
            if variables.get("batch_stats"):
                v["batch_stats"] = variables["batch_stats"]
            return jm.apply(
                v,
                jnp.asarray(noisy.astype(np.float64)),
                jnp.asarray(enr.astype(np.float64)),
                jnp.asarray(ref.astype(np.float64)),
                jnp.asarray(spk), train=False, alpha=ALPHA,
                return_loss_detail=False)

        j_loss, j_grads = jax.value_and_grad(loss_fn)(variables["params"])

    np.testing.assert_allclose(float(j_loss), t_loss_val, rtol=1e-6)
    snrs = _leaf_snrs(t_grads, j_grads)
    worst = min(snrs, key=snrs.get)
    assert snrs[worst] > 60.0, (
        f"worst grad leaf {worst}: {snrs[worst]:.1f} dB "
        f"(median {np.median(list(snrs.values())):.1f})")


def test_ns_dpcrn_grad_parity(torch_oracle):
    """NS config (trainable ConvSTFT + DPCRN + complex mask, task 0,
    SI-SNR): loss and all gradients — including the trainable STFT kernels'
    — agree with the reference at f64."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/ns")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    from puresound.nnet.loss.sdr import SDRLoss as TorchSDRLoss

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.zoo import init_ns_model

    mix2, clean2 = _load_audio(32000, 32000)
    noisy = np.stack([mix2[0, :16000], mix2[0, 16000:]], 0)
    ref = np.stack([clean2[0, :16000], clean2[0, 16000:]], 0)

    torch.manual_seed(9)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("ns_dpcrn_v0_causal",
                        TorchSDRLoss.init_mode("sisnr"), verbose=False).double()
        tm.eval()
        t_loss = tm(noisy=torch.from_numpy(noisy.astype(np.float64)),
                    enroll=None,
                    ref_clean=torch.from_numpy(ref.astype(np.float64)))
        t_loss.backward()
        t_loss_val = float(t_loss.detach())

        def enc_tree(jm_init, m):
            enc = dict(jm_init["params"]["encoder"]["encoder"])
            enc["wsin"] = jnp.asarray(
                m.encoder.encoder.wsin.detach().numpy().reshape(
                    enc["wsin"].shape))
            enc["wcos"] = jnp.asarray(
                m.encoder.encoder.wcos.detach().numpy().reshape(
                    enc["wcos"].shape))
            return {"encoder": enc}

        with jax.enable_x64(True):
            jm = init_ns_model("ns_dpcrn_v0_causal",
                               sig_loss=SDRLoss.init_mode("sisnr"))
            init_v = jm.init(jax.random.PRNGKey(0),
                             jnp.asarray(noisy.astype(np.float64)),
                             method=SoTaskWrapModule.inference)

            variables = tmap.variables(tmap.merge(
                {"masker": tmap.dpcrn(tm.masker)}))
            variables["params"]["encoder"] = enc_tree(init_v, tm)

            # swap grads into data, re-map -> torch grad tree in flax layout
            _swap_grads_into_data(torch, tm)
            t_grads = tmap.variables(tmap.merge(
                {"masker": tmap.dpcrn(tm.masker)}))["params"]
            t_grads["encoder"] = enc_tree(init_v, tm)

            def loss_fn(params):
                variables2 = {"params": params}
                if variables.get("batch_stats"):
                    variables2["batch_stats"] = variables["batch_stats"]
                return jm.apply(
                    variables2,
                    jnp.asarray(noisy.astype(np.float64)), None,
                    jnp.asarray(ref.astype(np.float64)),
                    train=False, return_loss_detail=False)

            j_loss, j_grads = jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        torch.set_default_dtype(torch.float32)

    np.testing.assert_allclose(float(j_loss), t_loss_val, rtol=1e-6)
    snrs = _leaf_snrs(t_grads, j_grads)
    worst = min(snrs, key=snrs.get)
    assert snrs[worst] > 60.0, (
        f"worst grad leaf {worst}: {snrs[worst]:.1f} dB "
        f"(median {np.median(list(snrs.values())):.1f})")


def test_ns_dparn_grad_parity(torch_oracle):
    """DPARN NS config (trainable ConvSTFT + attention dual-path + complex
    mask, task 0, SI-SNR): loss and all gradients — through the MHA intra
    blocks and the inter LSTM — agree with the reference at f64."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/ns")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    from puresound.nnet.loss.sdr import SDRLoss as TorchSDRLoss

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.zoo import init_ns_model

    mix2, clean2 = _load_audio(24000, 24000)
    noisy = np.stack([mix2[0, :12000], mix2[0, 12000:]], 0)
    ref = np.stack([clean2[0, :12000], clean2[0, 12000:]], 0)

    torch.manual_seed(11)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("ns_dparn_v0_causal",
                        TorchSDRLoss.init_mode("sisnr"), verbose=False).double()
        tm.eval()
        t_loss = tm(noisy=torch.from_numpy(noisy.astype(np.float64)),
                    enroll=None,
                    ref_clean=torch.from_numpy(ref.astype(np.float64)))
        t_loss.backward()
        t_loss_val = float(t_loss.detach())

        def enc_tree(jm_init, m):
            enc = dict(jm_init["params"]["encoder"]["encoder"])
            enc["wsin"] = jnp.asarray(
                m.encoder.encoder.wsin.detach().numpy().reshape(
                    enc["wsin"].shape))
            enc["wcos"] = jnp.asarray(
                m.encoder.encoder.wcos.detach().numpy().reshape(
                    enc["wcos"].shape))
            return {"encoder": enc}

        with jax.enable_x64(True):
            jm = init_ns_model("ns_dparn_v0_causal",
                               sig_loss=SDRLoss.init_mode("sisnr"))
            init_v = jm.init(jax.random.PRNGKey(0),
                             jnp.asarray(noisy.astype(np.float64)),
                             method=SoTaskWrapModule.inference)

            variables = tmap.variables(tmap.merge(
                {"masker": tmap.dparn(tm.masker)}))
            variables["params"]["encoder"] = enc_tree(init_v, tm)

            _swap_grads_into_data(torch, tm)
            t_grads = tmap.variables(tmap.merge(
                {"masker": tmap.dparn(tm.masker)}))["params"]
            t_grads["encoder"] = enc_tree(init_v, tm)

            def loss_fn(params):
                variables2 = {"params": params}
                if variables.get("batch_stats"):
                    variables2["batch_stats"] = variables["batch_stats"]
                return jm.apply(
                    variables2,
                    jnp.asarray(noisy.astype(np.float64)), None,
                    jnp.asarray(ref.astype(np.float64)),
                    train=False, return_loss_detail=False)

            j_loss, j_grads = jax.value_and_grad(loss_fn)(variables["params"])
    finally:
        torch.set_default_dtype(torch.float32)

    np.testing.assert_allclose(float(j_loss), t_loss_val, rtol=1e-6)
    snrs = _leaf_snrs(t_grads, j_grads)
    worst = min(snrs, key=snrs.get)
    assert snrs[worst] > 60.0, (
        f"worst grad leaf {worst}: {snrs[worst]:.1f} dB "
        f"(median {np.median(list(snrs.values())):.1f})")

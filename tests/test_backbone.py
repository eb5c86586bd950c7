"""Backbone tests: torch-oracle parity (weights copied) + shape contracts
+ causality probes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_mapping as tmap
from puresound_tpu.nnet.conv_tasnet import ConvTasNet, GatedTCN, TCN
from puresound_tpu.nnet.dparn import DPARN, DPARN_Mout
from puresound_tpu.nnet.dpcrn import DPCRN
from puresound_tpu.nnet.dprnn import DPRNN
from puresound_tpu.nnet.skim import SkiM
from puresound_tpu.nnet.unet import Unet, UnetFsmn, UnetTcn

KEY = jax.random.PRNGKey(0)


def test_tcn_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.conv_tasnet import TCN as TorchTCN

    x = rng.standard_normal((2, 16, 40)).astype(np.float32)
    e = rng.standard_normal((2, 8)).astype(np.float32)
    tm = TorchTCN(16, 24, kernel=3, dilation=2, emb_dim=8, causal=True,
                  tcn_norm="cLN", dconv_norm="cLN")
    tm.eval()
    jm = TCN(16, 24, kernel=3, dilation=2, emb_dim=8, causal=True,
             tcn_norm="cLN", dconv_norm="cLN")
    p = tmap.variables(tmap.tcn(tm))
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(e)).numpy()
    j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4)


def test_gated_tcn_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.conv_tasnet import GatedTCN as TorchGatedTCN

    x = rng.standard_normal((2, 16, 40)).astype(np.float32)
    e = rng.standard_normal((2, 8)).astype(np.float32)
    for causal, film in ((True, False), (False, True)):
        tm = TorchGatedTCN(16, 24, kernel=3, dilation=2, emb_dim=8,
                           causal=causal, tcn_norm="cLN", use_film=film)
        tm.eval()
        jm = GatedTCN(16, 24, kernel=3, dilation=2, emb_dim=8,
                      causal=causal, tcn_norm="cLN", use_film=film)
        p = tmap.variables(tmap.gated_tcn(tm))
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x), torch.from_numpy(e)).numpy()
        j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(e)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4,
                                   err_msg=f"causal={causal} film={film}")


def test_conv_tasnet_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.conv_tasnet import ConvTasNet as TorchConvTasNet

    x = rng.standard_normal((1, 16, 60)).astype(np.float32)
    e = rng.standard_normal((1, 8)).astype(np.float32)
    kw = dict(input_dim=16, embed_dim=8, embed_norm=True, tcn_kernel=3,
              tcn_dim=24, tcn_dilated_basic=2, per_tcn_stack=3, repeat_tcn=2,
              tcn_with_embed=[1, 0, 0], tcn_norm="cLN", dconv_norm="cLN",
              causal=True, tcn_layer="normal")
    tm = TorchConvTasNet(**kw)
    tm.eval()
    jm = ConvTasNet(**{**kw, "tcn_with_embed": (1, 0, 0)})
    p = tmap.variables(tmap.conv_tasnet(tm))
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(e)).numpy()
    j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_skim_matches_torch(torch_oracle, rng, causal):
    """Full SkiM parity with FiLM fusion, batch 1 (float64)."""
    torch = torch_oracle
    from puresound.nnet.skim import SkiM as TorchSkiM

    x = rng.standard_normal((1, 12, 57))
    e = rng.standard_normal((1, 10))
    kw = dict(input_size=12, hidden_size=16, output_size=12, n_blocks=3,
              seg_size=10, seg_overlap=False, causal=causal, embed_dim=10,
              embed_norm=True, embed_fusion="FiLM",
              block_with_embed=[1, 0, 1])
    torch.set_default_dtype(torch.float64)
    try:
        tm = TorchSkiM(**kw).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x), torch.from_numpy(e)).numpy()
    finally:
        torch.set_default_dtype(torch.float32)
    with jax.enable_x64(True):
        jm = SkiM(**{**kw, "block_with_embed": (1, 0, 1)})
        p = tmap.variables(tmap.skim(tm))
        j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-9, rtol=1e-7)


def test_skim_gate_fusion_shapes(rng):
    jm = SkiM(input_size=12, hidden_size=16, output_size=12, n_blocks=2,
              seg_size=10, causal=True, embed_dim=10, embed_fusion="Gate",
              block_with_embed=(1, 1))
    x = jnp.asarray(rng.standard_normal((2, 12, 45)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    p = jm.init(KEY, x, e)
    assert jm.apply(p, x, e).shape == (2, 12, 45)


def test_skim_seg_overlap_shapes(rng):
    jm = SkiM(input_size=12, hidden_size=16, output_size=12, n_blocks=2,
              seg_size=10, seg_overlap=True, causal=False)
    x = jnp.asarray(rng.standard_normal((2, 12, 45)).astype(np.float32))
    p = jm.init(KEY, x)
    assert jm.apply(p, x).shape == (2, 12, 45)


def test_dprnn_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.dprnn import DPRNN as TorchDPRNN

    x = rng.standard_normal((1, 12, 57))
    e = rng.standard_normal((1, 10))
    kw = dict(input_size=12, hidden_size=16, output_size=12, n_blocks=2,
              seg_size=10, seg_overlap=False, causal=True, embed_dim=10,
              embed_norm=True, block_with_embed=[1, 0])
    tm = TorchDPRNN(**kw).double()
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(e)).numpy()
    with jax.enable_x64(True):
        jm = DPRNN(**{**kw, "block_with_embed": (1, 0)})
        p = tmap.variables(tmap.dprnn(tm))
        j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(e)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-9, rtol=1e-7)


def test_dprnn_embedding_free(rng):
    jm = DPRNN(input_size=12, hidden_size=16, output_size=12, n_blocks=2,
               seg_size=10, causal=True, embed_dim=0,
               block_with_embed=(0, 0), embedding_free_tse=True)
    x = jnp.asarray(rng.standard_normal((2, 12, 45)).astype(np.float32))
    enroll = jnp.asarray(rng.standard_normal((2, 12, 30)).astype(np.float32))
    p = jm.init(KEY, x, enroll)
    assert jm.apply(p, x, enroll).shape == (2, 12, 45)


def test_unet_shapes_and_causality(rng):
    """Causal DPCRN-style Unet: frame-level inf probe must show 0 lookahead."""
    kw = dict(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
              channels=(1, 8, 8, 8, 16, 32), transpose_t_size=2,
              kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
              dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
              stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
              delay=(0, 0, 0, 0, 0))
    jm = Unet(**kw)
    x = rng.standard_normal((1, 64, 30)).astype(np.float32)
    variables = jm.init(KEY, jnp.asarray(x))
    out = jm.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 64, 30)

    x_inf = x.copy()
    x_inf[:, :, 15:] = np.inf
    out = np.asarray(jm.apply(variables, jnp.asarray(x_inf)))
    nan_cols = np.where(np.isnan(out).any(axis=(0, 1)))[0]
    assert nan_cols.min() == 15  # no frame lookahead


def test_unet_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.unet import Unet as TorchUnet

    kw = dict(input_type="RI", input_dim=64, activation_type="PReLU",
              norm_type="bN2d", dropout=0.0, channels=(1, 4, 8),
              transpose_t_size=2, skip_conv=False, kernel_t=(2, 2),
              stride_t=(1, 1), dilation_t=(1, 1), kernel_f=(5, 3),
              stride_f=(2, 2), dilation_f=(1, 1), delay=(0, 1))
    tm = TorchUnet(**kw)
    tm.eval()
    jm = Unet(**kw)
    x = rng.standard_normal((2, 64, 20)).astype(np.float32)

    children = {}
    for i, seq in enumerate(tm.cnn_down):
        children[f"cnn_down_{i}"] = tmap.conv2d(seq[1])
        children[f"down_norm_{i}"] = tmap.norm_any(seq[2])
        children[f"down_act_{i}"] = tmap.prelu(seq[3])
    for i, seq in enumerate(tm.cnn_up):
        children[f"cnn_up_{i}"] = tmap.conv_transpose2d(seq[0])
        if len(seq) > 1:
            children[f"up_norm_{i}"] = tmap.norm_any(seq[1])
            children[f"up_act_{i}"] = tmap.prelu(seq[2])
    p = tmap.merge(children)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()
    j_out = np.asarray(jm.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4)


def test_dpcrn_shapes(rng):
    jm = DPCRN(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
               channels=(1, 8, 8, 8, 16, 32), transpose_t_size=2,
               kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
               dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
               stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
               delay=(0, 0, 0, 0, 0), rnn_hidden=16)
    x = jnp.asarray(rng.standard_normal((2, 64, 25)).astype(np.float32))
    p = jm.init(KEY, x)
    assert jm.apply(p, x).shape == (2, 64, 25)


def test_dparn_shapes(rng):
    jm = DPARN(input_type="RI", input_dim=64, norm_type="bN2d", dropout=0.0,
               channels=(1, 8, 8, 8, 16, 32), transpose_t_size=2,
               kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
               dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
               stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
               delay=(0, 0, 0, 0, 0), rnn_hidden=16, nhead=4)
    x = jnp.asarray(rng.standard_normal((2, 64, 25)).astype(np.float32))
    p = jm.init(KEY, x)
    assert jm.apply(p, x).shape == (2, 64, 25)


def test_dparn_mout_shapes(rng):
    jm = DPARN_Mout(input_type="RI", input_dim=64, norm_type="bN2d",
                    dropout=0.0, channels=(1, 8, 8, 8, 16, 32),
                    transpose_t_size=2, kernel_t=(2, 2, 2, 2, 2),
                    stride_t=(1, 1, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
                    kernel_f=(5, 3, 3, 3, 3), stride_f=(2, 2, 1, 1, 1),
                    dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0),
                    multi_output=2, rnn_hidden=16, nhead=4)
    x = jnp.asarray(rng.standard_normal((2, 64, 25)).astype(np.float32))
    p = jm.init(KEY, x)
    assert jm.apply(p, x).shape == (2, 2, 64, 25)


def test_unet_tcn_shapes(rng):
    jm = UnetTcn(embed_dim=16, embed_norm=True, input_type="RI", input_dim=64,
                 norm_type="bN2d", dropout=0.0, channels=(1, 8, 16),
                 transpose_t_size=2, transpose_delay=True,
                 kernel_t=(2, 2), stride_t=(1, 1), dilation_t=(1, 1),
                 kernel_f=(5, 5), stride_f=(2, 2), dilation_f=(1, 1),
                 delay=(0, 0), tcn_layer="gated", tcn_kernel=3, tcn_dim=24,
                 tcn_dilated_basic=2, per_tcn_stack=2, repeat_tcn=2,
                 tcn_with_embed=(1, 0), tcn_norm="bN1d", causal=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 20)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    p = jm.init(KEY, x, e)
    assert jm.apply(p, x, e).shape == (2, 64, 20)


def test_unet_fsmn_shapes(rng):
    jm = UnetFsmn(embed_dim=16, input_type="RI", input_dim=64,
                  norm_type="bN2d", dropout=0.0, channels=(1, 8, 16),
                  transpose_t_size=2, kernel_t=(2, 2), stride_t=(1, 1),
                  dilation_t=(1, 1), kernel_f=(5, 5), stride_f=(2, 2),
                  dilation_f=(1, 1), delay=(0, 0), fsmn_l_context=3,
                  fsmn_r_context=0, fsmn_dim=24, num_fsmn=2,
                  fsmn_with_embed=(1, 0), fsmn_norm="bN1d", use_film=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 20)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    p = jm.init(KEY, x, e)
    assert jm.apply(p, x, e).shape == (2, 64, 20)


def test_dprnn_embedding_free_matches_torch(torch_oracle, rng):
    """Embedding-free (veve) DPRNN: enrollment features condition the inter
    initial hidden states — oracle parity in f64. Reference dprnn.py:120-126."""
    torch = torch_oracle
    from puresound.nnet.dprnn import DPRNN as TorchDPRNN

    x = rng.standard_normal((2, 12, 40))
    enroll = rng.standard_normal((2, 12, 30))
    # NB reference quirk: embedding-free mode crashes unless
    # block_with_embed is passed explicitly (dprnn.py:157 indexes None)
    kw = dict(input_size=12, hidden_size=16, output_size=12, n_blocks=2,
              seg_size=10, seg_overlap=False, causal=True, embed_dim=0,
              embedding_free_tse=True)
    tm = TorchDPRNN(block_with_embed=[0, 0], **kw).double()
    tm.eval()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(enroll)).numpy()
    with jax.enable_x64(True):
        jm = DPRNN(block_with_embed=(0, 0), **kw)
        p = tmap.variables(tmap.dprnn(tm))
        j_out = np.asarray(jm.apply(p, jnp.asarray(x), jnp.asarray(enroll)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-9, rtol=1e-7)


def test_skim_tm_blocks_equals_batch_major():
    """PURESOUND_TM_BLOCKS (time-major offline block stack) is bit-equal
    to the batch-major path — causal AND bidirectional. A measured
    NEGATIVE perf result (round 5: bytes/step UP on the TPU toolchain),
    kept as a flagged A/B; this test keeps the flag correct."""
    import numpy as np

    import puresound_tpu.nnet.skim as skim_mod
    from puresound_tpu.nnet.skim import SkiM

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 24, 95)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
    m = SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=3,
             seg_size=10, seg_overlap=False, causal=True, embed_dim=8,
             embed_norm=True, embed_fusion="FiLM", block_with_embed=(1, 0, 1))
    v = m.init(jax.random.PRNGKey(0), x, e)
    m2 = SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
              seg_size=10, seg_overlap=False, causal=False)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    prev = skim_mod.TM_BLOCKS
    try:
        skim_mod.TM_BLOCKS = True
        y_tm = m.apply(v, x, e)
        z_tm = m2.apply(v2, x)
        skim_mod.TM_BLOCKS = False
        y_bm = m.apply(v, x, e)
        z_bm = m2.apply(v2, x)
    finally:
        skim_mod.TM_BLOCKS = prev
    np.testing.assert_allclose(np.asarray(y_tm), np.asarray(y_bm),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_tm), np.asarray(z_bm),
                               atol=2e-5)

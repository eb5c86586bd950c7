"""Sequence parallelism (parallel/seqpar.py) on the 8-device CPU mesh:
one long recording's time axis sharded over the mesh with halo overlap.

- chunking round-trips exactly under an identity model;
- a finite-receptive-field model (causal cLN ConvTasNet) is EXACT once
  the halo covers the probed receptive field / lookahead;
- a recurrent model (SkiM TSE) converges to the full-sequence result as
  halo_left grows (burn-in), measured as an SNR curve.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from puresound_tpu.parallel.seqpar import overlapped_chunks, seq_parallel_infer

KEY = jax.random.PRNGKey(0)


def _mesh():
    return Mesh(np.array(jax.devices()), ("sp",))


def _snr_db(ref, got):
    ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    err = np.sum((ref - got) ** 2)
    return 10 * np.log10(np.sum(ref ** 2) / max(err, 1e-30))


def test_overlapped_chunks_identity_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 777)).astype(np.float32))
    for halo_l, halo_r, align in ((0, 0, 1), (13, 5, 1), (16, 8, 8)):
        chunks, Lc, T = overlapped_chunks(x, 8, halo_l, halo_r, align)
        assert T == 777 and chunks.shape[0] == 8
        halo_l_eff = chunks.shape[-1] - Lc - halo_r
        kept = chunks[:, :, halo_l_eff:halo_l_eff + Lc]   # [n, B, Lc]
        y = jnp.moveaxis(kept, 0, 1).reshape(2, -1)[:, :T]
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_seq_parallel_identity_fn(rng):
    x = jnp.asarray(rng.standard_normal((1, 1000)).astype(np.float32))
    y = seq_parallel_infer(lambda c: c, x, _mesh(), halo_left=32,
                           halo_right=32, align=8)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # 1-D in, 1-D out
    y1 = seq_parallel_infer(lambda c: c, x[0], _mesh(), halo_left=0)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(x[0]))


def _causal_conv_ns():
    """Finite-receptive-field NS model: causal ConvTasNet masker, cLN
    norms everywhere (gLN would make the receptive field the whole
    signal)."""
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import ConvTasNet
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.loss.sdr import SDRLoss

    return SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=16,
                           output_active=True),
        masker=ConvTasNet(input_dim=16, embed_dim=0, tcn_layer="normal",
                          tcn_kernel=3, tcn_dim=8, tcn_dilated_basic=2,
                          per_tcn_stack=2, repeat_tcn=2,
                          tcn_with_embed=(0, 0), tcn_norm="cLN",
                          dconv_norm="cLN", causal=True),
        loss_func_wav=SDRLoss.init_mode("sisnr"), mask_constraint="ReLU")


def test_seq_parallel_exact_for_finite_receptive_field(rng):
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.utils.model_info import probe_lookahead_receptive

    model = _causal_conv_ns()
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, method=SoTaskWrapModule.inference)
    fn = jax.jit(lambda c: model.apply(variables, c,
                                       method=SoTaskWrapModule.inference))
    look, recep = probe_lookahead_receptive(fn, length=2048)
    assert recep is not None and look is not None

    ref = np.asarray(fn(x))
    got = np.asarray(seq_parallel_infer(fn, x, _mesh(), halo_left=recep,
                                        halo_right=look, align=8))
    assert got.shape == ref.shape
    # exact away from the GLOBAL signal edges (the first chunk's zero
    # halo forms frames the unchunked VALID framing never has — see the
    # seqpar module docstring); every chunk-to-chunk boundary is interior
    # here and must match to float-reassociation level
    edge = recep + look + 16
    assert _snr_db(ref[:, edge:-edge], got[:, edge:-edge]) > 80.0, \
        _snr_db(ref[:, edge:-edge], got[:, edge:-edge])
    # and the global edges are still close in absolute terms
    assert float(np.max(np.abs(ref - got))) < 0.05


def test_seq_parallel_recurrent_halo_burnin(rng):
    """SkiM (LSTM bottleneck) has unbounded memory; the left halo acts as
    state burn-in and the mesh result converges to the full run as the
    halo grows."""
    from tests.test_parallel import _tiny_tse

    model = _tiny_tse()
    x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32) * 0.1)
    e = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32) * 0.1)
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    variables = model.init(KEY, x, e, method=SoTaskWrapModule.inference)
    fn = jax.jit(lambda c: model.apply(variables, c, e,
                                       method=SoTaskWrapModule.inference))
    ref = np.asarray(fn(x))
    # align = hop * seg_size: SkiM segments its frame sequence every 10
    # frames from ITS OWN frame 0 — chunk starts must land on the full
    # run's segment grid or every segment disagrees regardless of halo.
    # halo_right = one segment + win: each chunk's LAST segment is pad-
    # tainted (partial segment normalization); keep it out of the output.
    align = 8 * 10
    snrs = [
        _snr_db(ref, seq_parallel_infer(fn, x, _mesh(), halo_left=h,
                                        halo_right=96, align=align))
        for h in (0, 400, 2400)
    ]
    assert snrs[1] > snrs[0] and snrs[2] > snrs[1], snrs
    assert snrs[2] > 25.0, snrs

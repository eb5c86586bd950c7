"""Shared StableHLO export helper (utils/export.py) across all three task
families: artifact set per wrapper type, and deserialize->call round trips.

The reference only exports TSE models (torch.jit traces,
/root/reference/egs/tse/main.py:406-443); here NS and DSS export too, and
each export additionally carries FullModel + the streaming StreamStep.
"""
import jax
import jax.numpy as jnp
import numpy as np

from puresound_tpu.utils.export import export_stablehlo

KEY = jax.random.PRNGKey(0)
SR = 2000  # tiny dummy wavs (export uses 5 s at this rate)


def _names(paths):
    return {p.rsplit(".", 2)[-2] for p in paths}


def test_export_ns_siso(rng, tmp_path):
    """Plain SE (no speaker net): Encoder/Mask/decoder/Full/Stream, and the
    deserialized FullModel matches the live inference."""
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.encoder import ConvEncDec
    from tests.test_streaming_ns import _small_dpcrn

    encoder = ConvEncDec(fft_length=128, win_length=128, hop_length=32,
                         trainable=True, output_format="Complex")
    model = SoTaskWrapModule(encoder=encoder, masker=_small_dpcrn(128),
                             drop_first_bin=True, mask_constraint="linear",
                             f_type="Complex", mask_type="Complex")
    x = jnp.asarray(rng.standard_normal((1, SR)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, method=SoTaskWrapModule.inference)

    paths = export_stablehlo(model, variables, SR, str(tmp_path), "m")
    assert _names(paths) == {"EncoderNet", "MaskNet", "decoderNet",
                             "FullModel", "StreamStep"}

    from jax import export as jexport

    full = [p for p in paths if "FullModel" in p][0]
    with open(full, "rb") as f:
        restored = jexport.deserialize(f.read())
    wav = jnp.asarray(rng.standard_normal((1, SR * 5)).astype(np.float32)
                      * 0.1)
    y_live = np.asarray(model.apply(variables, wav,
                                    method=SoTaskWrapModule.inference))
    y_exp = np.asarray(restored.call(wav))
    np.testing.assert_allclose(y_exp, y_live, atol=1e-5, rtol=1e-4)


def test_export_tse_with_speaker_net(rng, tmp_path):
    """TSE: SpeakerNet artifact included; StreamStep round-trips against
    the live streaming engine step (state pytree in/out)."""
    from tests.test_parallel import _tiny_tse

    model = _tiny_tse()
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule

    x = jnp.asarray(rng.standard_normal((1, SR)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, x, method=SoTaskWrapModule.inference)

    paths = export_stablehlo(model, variables, SR, str(tmp_path), "m")
    assert _names(paths) == {"SpeakerNet", "EncoderNet", "MaskNet",
                             "decoderNet", "FullModel", "StreamStep"}

    from jax import export as jexport

    from puresound_tpu.streaming.engine import StreamingTSE
    from puresound_tpu.streaming.file_eval import build_engine

    stream = [p for p in paths if "StreamStep" in p][0]
    with open(stream, "rb") as f:
        restored = jexport.deserialize(f.read())

    engine = build_engine(model)
    hop = model.encoder.hop_length
    chunk = jnp.asarray(rng.standard_normal((1, 4 * hop)).astype(np.float32)
                        * 0.1)
    state0 = engine.apply(variables, 1, method=StreamingTSE.init_state)
    dvec = engine.apply(variables, x, method=StreamingTSE.embed)
    y_live, st_live = engine.apply(variables, chunk, dvec, state0,
                                   method=StreamingTSE.step)
    y_exp, st_exp = restored.call(chunk, dvec, state0)
    np.testing.assert_allclose(np.asarray(y_exp), np.asarray(y_live),
                               atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(st_live),
                    jax.tree_util.tree_leaves(st_exp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-4)


def test_export_dss_simo(rng, tmp_path):
    """SIMO separation exports (the reference has no DSS export at all)."""
    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from tests.test_streaming_dss import _build

    model, _ = _build()
    x = jnp.asarray(rng.standard_normal((1, SR)).astype(np.float32) * 0.1)
    variables = model.init(KEY, x, method=SiMoTaskWrapModule.inference)

    paths = export_stablehlo(model, variables, SR, str(tmp_path), "m")
    assert _names(paths) == {"EncoderNet", "MaskNet", "decoderNet",
                             "FullModel", "StreamStep"}

    from jax import export as jexport

    full = [p for p in paths if "FullModel" in p][0]
    with open(full, "rb") as f:
        restored = jexport.deserialize(f.read())
    wav = jnp.asarray(rng.standard_normal((1, SR * 5)).astype(np.float32)
                      * 0.1)
    y_live = np.asarray(model.apply(variables, wav,
                                    method=SiMoTaskWrapModule.inference))
    y_exp = np.asarray(restored.call(wav))
    assert y_exp.shape == y_live.shape and y_exp.shape[1] == 2
    np.testing.assert_allclose(y_exp, y_live, atol=1e-5, rtol=1e-4)

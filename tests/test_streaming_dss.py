"""Streaming SIMO separation (DSS) equivalence tests."""
import jax
import jax.numpy as jnp
import numpy as np

from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
from puresound_tpu.nnet.dparn import DPARN_Mout
from puresound_tpu.nnet.encoder import ConvEncDec
from puresound_tpu.streaming.simo_engine import StreamingDSS

KEY = jax.random.PRNGKey(0)


def _build(n_fft=128, hop=32):
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPARN_Mout(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                        dropout=0.0, channels=(1, 8, 8), transpose_t_size=2,
                        transpose_delay=False, kernel_t=(2, 2),
                        stride_t=(1, 1), dilation_t=(1, 1), kernel_f=(5, 3),
                        stride_f=(2, 2), dilation_f=(1, 1), delay=(0, 0),
                        multi_output=2, rnn_hidden=8, nhead=2)
    offline = SiMoTaskWrapModule(encoder=encoder, masker=masker,
                                 f_type="Complex", mask_type="Complex",
                                 drop_first_bin=True, mask_constraint="linear")
    engine = StreamingDSS(encoder=encoder, masker=masker,
                          mask_constraint="linear", drop_first_bin=True)
    return offline, engine


def test_streaming_dss_engine_equals_offline(rng):
    """Streamed chunks == offline SiMo inference on the zero-primed input
    (interior samples), per source."""
    n_fft, hop = 128, 32
    offline, engine = _build(n_fft, hop)
    L = hop * 40
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = offline.init(KEY, x, method=SiMoTaskWrapModule.inference)

    pad = n_fft - hop
    y_off = np.asarray(offline.apply(variables, jnp.pad(x, ((0, 0), (pad, 0))),
                                     method=SiMoTaskWrapModule.inference))

    state = engine.apply(variables, 2, method=StreamingDSS.init_state)
    outs = []
    for i in range(0, L, hop * 4):
        y, state = engine.apply(variables, x[:, i:i + hop * 4], state,
                                method=StreamingDSS.step)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs, axis=-1)
    assert y_stream.shape == (2, 2, L)

    lo, hi = n_fft, y_stream.shape[-1]
    np.testing.assert_allclose(y_stream[..., lo:hi], y_off[..., lo:hi],
                               atol=3e-5, rtol=1e-3)


def test_file_eval_simo(rng):
    """stream_signal handles SIMO engines: per-source aligned output."""
    from puresound_tpu.streaming.file_eval import stream_signal

    offline, engine = _build()
    L = 2000
    x = rng.standard_normal(L).astype(np.float32) * 0.1
    variables = offline.init(KEY, jnp.asarray(x[None, :512]),
                             method=SiMoTaskWrapModule.inference)
    out, rtf = stream_signal(engine, variables, x, sr=16000, chunk_ms=8.0)
    assert out.shape == (2, L) and rtf > 0


def test_streaming_dss_mk_kernel_equals_stock(rng):
    """StreamingDSS with the center-fused masker kernel (DPARN_Mout) ==
    the stock streamed path."""
    import jax.numpy as jnp

    from puresound_tpu.nnet.dparn import DPARN_Mout
    from puresound_tpu.nnet.encoder import ConvEncDec
    from puresound_tpu.streaming.simo_engine import StreamingDSS

    n_fft, hop = 128, 32
    encoder = ConvEncDec(fft_length=n_fft, win_length=n_fft, hop_length=hop,
                         trainable=True, output_format="Complex")
    masker = DPARN_Mout(input_type="RI", input_dim=n_fft, norm_type="bN2d",
                        dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                        transpose_t_size=2, transpose_delay=False,
                        kernel_t=(2,) * 5, stride_t=(1,) * 5,
                        dilation_t=(1,) * 5, kernel_f=(5, 3, 3, 3, 3),
                        stride_f=(2, 2, 1, 1, 1), dilation_f=(1,) * 5,
                        delay=(0,) * 5, rnn_hidden=16, nhead=4,
                        multi_output=2)
    engine = StreamingDSS(encoder=encoder, masker=masker,
                          mask_constraint="linear", drop_first_bin=True)
    L = 32 * 12
    x = jnp.asarray(rng.standard_normal((2, L)).astype(np.float32) * 0.1)
    variables = engine.init(jax.random.PRNGKey(0), x,
                            method=StreamingDSS.init_all)

    def run(mk):
        state = engine.apply(variables, 2, jnp.float32, mk,
                             method=StreamingDSS.init_state)
        outs = []
        for i in range(0, L, hop * 2):
            y, state = engine.apply(variables, x[:, i:i + hop * 2], state,
                                    mk_kernel=mk, method=StreamingDSS.step)
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    y0, y1 = run(False), run(True)
    np.testing.assert_allclose(y1, y0, atol=3e-5, rtol=1e-4)

"""Lobe primitive tests: shape contracts, causality probes, torch parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.nnet.lobe.attention import MHA, MhaSelfAttenLayer
from puresound_tpu.nnet.lobe.cnn import Conv1d, ConvTranspose2d, DepthwiseSeparableConv1d
from puresound_tpu.nnet.lobe.norm import BatchNorm, ChanLN, GlobLN
from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
from puresound_tpu.nnet.lobe.rnn import FSMN, LSTM, ConditionFSMN, SingleRNN
from puresound_tpu.nnet.lobe.trivial import FiLM, Gate, SplitMerge

KEY = jax.random.PRNGKey(0)


def test_lstm_matches_torch(torch_oracle, rng):
    """float64 parity vs torch nn.LSTM (f32 recurrences amplify ULP chaos)."""
    torch = torch_oracle
    

    B, T, C, H = 3, 17, 8, 12
    x = rng.standard_normal((B, T, C))
    tl = torch.nn.LSTM(C, H, num_layers=1, batch_first=True, bidirectional=True).double()
    tl.eval()

    def cvt(pref):
        sd = tl.state_dict()
        return {
            "w_ih": sd[f"weight_ih_l0{pref}"].numpy().T,
            "w_hh": sd[f"weight_hh_l0{pref}"].numpy().T,
            "b_ih": sd[f"bias_ih_l0{pref}"].numpy(),
            "b_hh": sd[f"bias_hh_l0{pref}"].numpy(),
        }

    with torch.no_grad():
        ty, (th, tc) = tl(torch.from_numpy(x))

    with jax.enable_x64(True):
        jl = LSTM(C, H, bidirectional=True)
        p = {"params": {"fwd": jax.tree_util.tree_map(jnp.asarray, cvt("")),
                        "bwd": jax.tree_util.tree_map(jnp.asarray, cvt("_reverse"))}}
        jy, (jh, jc) = jl.apply(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-10)


def test_lstm_step_equals_scan(rng):
    B, T, C, H = 2, 9, 6, 5
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    model = LSTM(C, H)
    params = model.init(KEY, x)
    y_scan, (hT, cT) = model.apply(params, x)
    h = jnp.zeros((1, B, H))
    c = jnp.zeros((1, B, H))
    outs = []
    for t in range(T):
        out, (h, c) = model.apply(params, x[:, t, :], h, c, method=LSTM.step)
        outs.append(out)
    y_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_step), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h), atol=1e-6)


def test_fsmn_causality_inf_probe(rng):
    """A causal FSMN must propagate inf only from the injection point on."""
    lctx, rctx = 3, 0
    model = FSMN(input_dim=8, output_dim=8, project_dim=16,
                 l_context=lctx, r_context=rctx)
    x = rng.standard_normal((1, 8, 50)).astype(np.float32)
    x[:, :, 25:] = np.inf
    params = model.init(KEY, jnp.asarray(np.nan_to_num(x, posinf=1.0)))
    out, _ = model.apply(params, jnp.asarray(x))
    nan_cols = np.where(np.isnan(np.asarray(out)).any(axis=(0, 1)))[0]
    assert nan_cols.min() == 25  # no lookahead


def test_fsmn_lookahead_inf_probe(rng):
    """r_context=2 means frames >= inject-2 see the future inf."""
    model = FSMN(input_dim=8, output_dim=8, project_dim=16, l_context=3, r_context=2)
    x = rng.standard_normal((1, 8, 50)).astype(np.float32)
    x[:, :, 25:] = np.inf
    params = model.init(KEY, jnp.asarray(np.nan_to_num(x, posinf=1.0)))
    out, _ = model.apply(params, jnp.asarray(x))
    nan_cols = np.where(np.isnan(np.asarray(out)).any(axis=(0, 1)))[0]
    assert nan_cols.min() == 23


def test_condition_fsmn_shapes(rng):
    model = ConditionFSMN(input_dim=8, output_dim=8, project_dim=16,
                          l_context=3, r_context=0, embed_dim=10, use_film=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 30)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 10)).astype(np.float32))
    params = model.init(KEY, x, e)
    out, mem = model.apply(params, x, e)
    assert out.shape == (2, 8, 30) and mem.shape == (2, 16, 30)


def test_split_merge_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 101)).astype(np.float32))
    seg, rest = SplitMerge.split(x, 20)
    out = SplitMerge.merge(seg, rest)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_split_merge_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.trivial import SplitMerge as TorchSplitMerge

    x = rng.standard_normal((2, 8, 77)).astype(np.float32)
    tseg, trest = TorchSplitMerge.split(torch.from_numpy(x), 20)
    jseg, jrest = SplitMerge.split(jnp.asarray(x), 20)
    assert trest == jrest
    np.testing.assert_allclose(np.asarray(jseg), tseg.numpy(), atol=1e-6)


def test_dsconv_causal_inf_probe(rng):
    model = DepthwiseSeparableConv1d(16, 16, kernel=3, dilation=2,
                                     causal=True, norm_cls="cLN")
    x = rng.standard_normal((1, 16, 40)).astype(np.float32)
    x[:, :, 20:] = np.inf
    params = model.init(KEY, jnp.asarray(np.nan_to_num(x, posinf=1.0)))
    out = model.apply(params, jnp.asarray(x))
    # cLN normalizes across channels only, so NaN stays within its frame
    nan_cols = np.where(np.isnan(np.asarray(out)).any(axis=(0, 1)))[0]
    assert nan_cols.min() == 20


def test_norms_match_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.norm import ChanLN as TorchChanLN
    from puresound.nnet.lobe.norm import GlobLN as TorchGlobLN

    x = rng.standard_normal((2, 6, 13)).astype(np.float32)
    for jcls, tcls in ((GlobLN, TorchGlobLN), (ChanLN, TorchChanLN)):
        tm = tcls(6)
        tm.eval()
        jm = jcls(6)
        params = jm.init(KEY, jnp.asarray(x))
        p = {"params": {"gamma": jnp.asarray(tm.gamma.detach().numpy().reshape(-1)),
                        "beta": jnp.asarray(tm.beta.detach().numpy().reshape(-1))}}
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x)).numpy()
        j_out = np.asarray(jm.apply(p, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-5)


def test_batchnorm_train_eval(rng):
    x = jnp.asarray(rng.standard_normal((4, 6, 13)).astype(np.float32))
    model = BatchNorm(6)
    variables = model.init(KEY, x, train=True)
    out, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(updates["batch_stats"]["mean"]), 0.0)
    out_eval = model.apply(variables, x, train=False)
    assert out_eval.shape == x.shape


def test_mha_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.attention import MHA as TorchMHA

    N, T, C, H = 2, 11, 16, 4
    x = rng.standard_normal((N, T, C)).astype(np.float32)
    tm = TorchMHA(C, heads=H)
    tm.eval()
    jm = MHA(C, heads=H)
    params = jm.init(KEY, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    p = {"params": {
        "in_proj": jnp.asarray(tm.atten.in_proj_weight.detach().numpy()),
        "out_proj": jnp.asarray(tm.atten.out_proj.weight.detach().numpy()),
    }}
    for causal, ctx in ((True, None), (False, None), (True, 4), (False, 4)):
        with torch.no_grad():
            t_out, _ = tm(torch.from_numpy(x), torch.from_numpy(x),
                          torch.from_numpy(x), causal=causal, context_range=ctx)
        j_out, _ = jm.apply(p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                            causal=causal, context_range=ctx)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-5,
                                   err_msg=f"causal={causal} ctx={ctx}")


def test_asp_pooling_shape(rng):
    model = AttentiveStatisticsPooling(32, 16)
    x = jnp.asarray(rng.standard_normal((2, 32, 50)).astype(np.float32))
    params = model.init(KEY, x)
    out = model.apply(params, x)
    assert out.shape == (2, 64, 1)


def test_film_gate_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 30)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    film = FiLM(16, 8)
    p = film.init(KEY, x, e)
    assert film.apply(p, x, e).shape == x.shape
    gate = Gate(16, 32, 8)
    p = gate.init(KEY, x, e)
    assert gate.apply(p, x, e).shape == x.shape


def test_single_rnn_matches_torch(torch_oracle, rng):
    torch = torch_oracle
    from puresound.nnet.lobe.rnn import SingleRNN as TorchSingleRNN

    

    x = rng.standard_normal((2, 8, 21))
    tm = TorchSingleRNN("LSTM", 8, 12, bidirectional=False).double()
    tm.eval()
    sd = tm.state_dict()
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()
    with jax.enable_x64(True):
        jm = SingleRNN("LSTM", 8, 12, bidirectional=False)
        p = {"params": {
            "rnn": {"fwd": {
                "w_ih": jnp.asarray(sd["rnn.weight_ih_l0"].numpy().T),
                "w_hh": jnp.asarray(sd["rnn.weight_hh_l0"].numpy().T),
                "b_ih": jnp.asarray(sd["rnn.bias_ih_l0"].numpy()),
                "b_hh": jnp.asarray(sd["rnn.bias_hh_l0"].numpy()),
            }},
            "proj": {"kernel": jnp.asarray(sd["proj.weight"].numpy().T),
                     "bias": jnp.asarray(sd["proj.bias"].numpy())},
        }}
        j_out = np.asarray(jm.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-10)

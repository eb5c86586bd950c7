"""Migrate trained PureSound (PyTorch) weights into puresound_tpu.

A user switching from the reference framework (mcw519/PureSound) loads
their torch model as usual and converts its weights into a flax variables
dict that this framework's zoo models accept directly:

    # torch side: build the reference model and load the checkpoint
    tm = reference_init_model("tse_skim_v0_causal", None, None)
    tm.load_state_dict(torch.load("epoch_99.ckpt")["model_state_dict"])

    # convert + run here
    from puresound_tpu.utils.torch_import import convert_reference_model
    from puresound_tpu.zoo import init_tse_model
    jm = init_tse_model("tse_skim_v0_causal")
    init_v = jm.init(key, noisy, enroll, method=SoTaskWrapModule.inference)
    variables = convert_reference_model(tm, init_v)
    enhanced = jm.apply(variables, noisy, enroll,
                        method=SoTaskWrapModule.inference)

`convert_reference_model` dispatches on the torch model's encoder/masker
class names (reference puresound/nnet/base_nn.py wrappers); the
lower-level per-module converters are public too. Every converter is
exercised by the parity suite (tests/test_waveform_parity.py etc.):
converted weights reproduce the reference's waveforms to >60 dB at f64
across all five model families. Each converter returns {"params": ...,
possibly "batch_stats": ...} subtrees; `merge` combines children under
names. torch itself is never imported here — converters take live torch
modules and only touch `.detach().numpy()`.
"""
import jax.numpy as jnp
import numpy as np


def _a(t):
    return jnp.asarray(t.detach().numpy())


def merge(children: dict) -> dict:
    """children: name -> {"params": ..., "batch_stats": ...} -> merged."""
    out = {"params": {}, "batch_stats": {}}
    for name, sub in children.items():
        if sub is None:
            continue
        for coll in ("params", "batch_stats"):
            if sub.get(coll):
                out[coll][name] = sub[coll]
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def variables(tree: dict) -> dict:
    """Top-level: ensure a 'params' key exists (flax variables dict)."""
    return tree


# ---------------------------------------------------------------- primitives

def conv1d(m) -> dict:
    p = {"w": _a(m.weight)}
    if m.bias is not None:
        p["b"] = _a(m.bias)
    return {"params": p}


def conv2d(m) -> dict:
    p = {"w": _a(m.weight)}
    if m.bias is not None:
        p["b"] = _a(m.bias)
    return {"params": p}


def conv_transpose2d(m) -> dict:
    p = {"w": _a(m.weight)}
    if m.bias is not None:
        p["b"] = _a(m.bias)
    return {"params": p}


def linear(m) -> dict:
    p = {"kernel": _a(m.weight).T}
    if m.bias is not None:
        p["bias"] = _a(m.bias)
    return {"params": p}


def prelu(m) -> dict:
    return {"params": {"alpha": _a(m.weight).reshape(-1)}}


def gain_bias_ln(m) -> dict:
    """GlobLN / ChanLN / InstantLN (gamma, beta)."""
    return {"params": {"gamma": _a(m.gamma).reshape(-1),
                       "beta": _a(m.beta).reshape(-1)}}


def layer_norm_last(m) -> dict:
    """torch nn.LayerNorm -> LayerNormLast."""
    return {"params": {"scale": _a(m.weight), "bias": _a(m.bias)}}


def flax_layer_norm(m) -> dict:
    """torch nn.LayerNorm -> flax nn.LayerNorm."""
    return {"params": {"scale": _a(m.weight), "bias": _a(m.bias)}}


def batchnorm(m) -> dict:
    return {"params": {"scale": _a(m.weight), "bias": _a(m.bias)},
            "batch_stats": {"mean": _a(m.running_mean), "var": _a(m.running_var)}}


def groupnorm1(m) -> dict:
    """torch nn.GroupNorm(1, C) -> GroupNorm1 (gamma, beta)."""
    return {"params": {"gamma": _a(m.weight), "beta": _a(m.bias)}}


def norm_any(m) -> dict:
    import torch.nn as tnn

    if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
        return batchnorm(m)
    if isinstance(m, tnn.GroupNorm):
        return groupnorm1(m)
    if isinstance(m, tnn.LayerNorm):
        return layer_norm_last(m)
    return gain_bias_ln(m)


def lstm_cell(sd, prefix, suffix="") -> dict:
    return {
        "w_ih": jnp.asarray(sd[f"{prefix}.weight_ih_l0{suffix}"].numpy().T),
        "w_hh": jnp.asarray(sd[f"{prefix}.weight_hh_l0{suffix}"].numpy().T),
        "b_ih": jnp.asarray(sd[f"{prefix}.bias_ih_l0{suffix}"].numpy()),
        "b_hh": jnp.asarray(sd[f"{prefix}.bias_hh_l0{suffix}"].numpy()),
    }


def lstm(m) -> dict:
    """torch nn.LSTM (1 layer) -> LSTM module params."""
    sd = {k: v for k, v in m.state_dict().items()}
    out = {"fwd": {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
        "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
    }}
    if m.bidirectional:
        out["bwd"] = {
            "w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy().T),
            "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy().T),
            "b_ih": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
            "b_hh": jnp.asarray(sd["bias_hh_l0_reverse"].numpy()),
        }
    return {"params": out}


# --------------------------------------------------------------- composites

def dsconv(m) -> dict:
    """reference DepthwiseSeparableConv1d -> DepthwiseSeparableConv1d."""
    children = {}
    if m.transform:
        children["in_conv"] = conv1d(m.in_conv[0])
        children["in_norm"] = norm_any(m.in_conv[1])
        children["in_act"] = prelu(m.in_conv[2])
    children["dw_conv"] = conv1d(m.depthwise[0])
    children["dw_norm"] = norm_any(m.depthwise[1])
    children["dw_act"] = prelu(m.depthwise[2])
    children["pw_conv"] = conv1d(m.pointwise[0])
    children["pw_norm"] = norm_any(m.pointwise[1])
    children["pw_act"] = prelu(m.pointwise[2])
    if m.skip:
        children["skip_conv"] = conv1d(m.skip_conv)
    return merge(children)


def tcn(m) -> dict:
    """reference TCN -> TCN."""
    return merge({
        "in_conv": conv1d(m.in_conv[0]),
        "in_norm": norm_any(m.in_conv[1]),
        "in_act": prelu(m.in_conv[2]),
        "dconv": dsconv(m.dconv[0]),
        "out_conv": conv1d(m.out_conv),
    })


def gated_tcn(m) -> dict:
    children = {
        "in_conv": conv1d(m.in_conv),
        "left_conv": conv1d(m.left_conv[0]),
        "left_norm": norm_any(m.left_conv[1]),
        "left_act": prelu(m.left_conv[2]),
        "right_conv": conv1d(m.right_conv[0]),
        "right_norm": norm_any(m.right_conv[1]),
        "right_act": prelu(m.right_conv[2]),
        "out_conv": conv1d(m.out_conv),
    }
    if m.use_film:
        children["cond_scale"] = conv1d(m.cond_scale)
        children["cond_bias"] = conv1d(m.cond_bias)
    return merge(children)


def conv_tasnet(m) -> dict:
    children = {}
    for r, stack in enumerate(m.tcn_list):
        for i, layer in enumerate(stack):
            name = f"tcn_list_{r}_{i}"
            cls = type(layer).__name__
            children[name] = tcn(layer) if cls == "TCN" else gated_tcn(layer)
    return merge(children)


def film(m) -> dict:
    children = {"cond_scale": conv1d(m.cond_scale),
                "cond_bias": conv1d(m.cond_bias)}
    if m.inp_norm:
        children["norm"] = layer_norm_last(m.norm)
    return merge(children)


def gate(m) -> dict:
    return merge({
        "in_conv": conv1d(m.in_conv),
        "left_conv": conv1d(m.left_conv[0]),
        "left_norm": gain_bias_ln(m.left_conv[1]),
        "left_act": prelu(m.left_conv[2]),
        "right_conv": conv1d(m.right_conv[0]),
        "right_norm": gain_bias_ln(m.right_conv[1]),
        "right_act": prelu(m.right_conv[2]),
        "out_conv": conv1d(m.out_conv),
    })


def seg_lstm(m) -> dict:
    return merge({
        "lstm": lstm(m.lstm),
        "proj": linear(m.proj),
        "norm": layer_norm_last(m.norm),
    })


def mem_lstm(m) -> dict:
    return merge({
        "h_net": lstm(m.h_net),
        "h_proj": linear(m.h_proj),
        "h_norm": layer_norm_last(m.h_norm),
        "c_net": lstm(m.c_net),
        "c_proj": linear(m.c_proj),
        "c_norm": layer_norm_last(m.c_norm),
    })


def skim(m) -> dict:
    children = {}
    for i, seg in enumerate(m.seg_lstm):
        children[f"seg_lstm_{i}"] = seg_lstm(seg)
    for i, mem in enumerate(m.mem_lstm):
        children[f"mem_lstm_{i}"] = mem_lstm(mem)
    if m.embed_dim:
        for i, fus in enumerate(m.seg_input_fusion):
            if fus is None:
                continue
            cls = type(fus).__name__
            children[f"seg_input_fusion_{i}"] = film(fus) if cls == "FiLM" else gate(fus)
    children["out_act"] = prelu(m.output_fc[0])
    children["out_conv"] = conv1d(m.output_fc[1])
    return merge(children)


def single_rnn(m) -> dict:
    return merge({"rnn": lstm(m.rnn), "proj": linear(m.proj)})


def dprnn(m) -> dict:
    children = {}
    for i in range(m.n_blocks):
        if m.input_film[i] is not None:
            children[f"input_film_{i}"] = film(m.input_film[i])
        children[f"intra_rnn_{i}"] = lstm(m.intra_rnn[i])
        children[f"intra_proj_{i}"] = linear(m.intra_proj[i])
        children[f"intra_norm_{i}"] = layer_norm_last(m.intra_norm[i])
        children[f"inter_rnn_{i}"] = lstm(m.inter_rnn[i])
        children[f"inter_proj_{i}"] = linear(m.inter_proj[i])
        children[f"inter_norm_{i}"] = layer_norm_last(m.inter_norm[i])
    children["out_act"] = prelu(m.output_fc[0])
    children["out_conv"] = conv1d(m.output_fc[1])
    return merge(children)


def asp(m) -> dict:
    """reference AttentiveStatisticsPooling -> AttentiveStatisticsPooling."""
    return merge({
        "tdnn_conv": conv1d(m.tdnn[0]),
        "tdnn_bn": batchnorm(m.tdnn[2]),
        "conv": conv1d(m.conv),
    })


def free_encdec(m) -> dict:
    return {"params": {"enc_w": _a(m.encoder.weight),
                       "dec_w": _a(m.decoder.weight)}}


def speaker_net_layer(layer) -> dict:
    import torch.nn as tnn

    cls = type(layer).__name__
    if cls == "TCN":
        return tcn(layer)
    if cls == "GatedTCN":
        return gated_tcn(layer)
    if cls == "AttentiveStatisticsPooling":
        return asp(layer)
    if cls == "SingleRNN":
        return single_rnn(layer)
    if isinstance(layer, tnn.Conv1d):
        return conv1d(layer)
    if cls in ("Magnitude", "SpecAugment"):
        return None
    raise NotImplementedError(cls)


def so_wrapper_tse_skim(m) -> dict:
    """Full SoTaskWrapModule (FreeEncDec + SkiM + speaker_net) mapping."""
    children = {"encoder": free_encdec(m.encoder), "masker": skim(m.masker)}
    # my wrapper names speaker-net children speaker_net_<i> by list position,
    # skipping parameter-free layers still consumes an index
    for i, layer in enumerate(m.speaker_net):
        sub = speaker_net_layer(layer)
        if sub is not None:
            children[f"speaker_net_{i}"] = sub
    return merge(children)


def unet_updown(m) -> dict:
    """Unet down/up conv stacks (reference unet.py Sequential layout:
    [ZeroPad2d, Conv2d, norm, act, Dropout] / [ConvTranspose2d, norm?, act?])."""
    children = {}
    for i, seq in enumerate(m.cnn_down):
        children[f"cnn_down_{i}"] = conv2d(seq[1])
        children[f"down_norm_{i}"] = norm_any(seq[2])
        children[f"down_act_{i}"] = prelu(seq[3])
    for j, seq in enumerate(m.cnn_up):
        children[f"cnn_up_{j}"] = conv_transpose2d(seq[0])
        if len(seq) > 1:
            children[f"up_norm_{j}"] = norm_any(seq[1])
            children[f"up_act_{j}"] = prelu(seq[2])
    return children


def dprnn_block2d(m) -> dict:
    return merge({"intra_rnn": single_rnn(m.intra_rnn),
                  "intra_norm": layer_norm_last(m.intra_norm),
                  "inter_rnn": single_rnn(m.inter_rnn),
                  "inter_norm": layer_norm_last(m.inter_norm)})


def dpcrn(m) -> dict:
    children = unet_updown(m)
    children["dprnn_block1"] = dprnn_block2d(m.dprnn_block1)
    children["dprnn_block2"] = dprnn_block2d(m.dprnn_block2)
    return merge(children)


def mha(m) -> dict:
    return {"params": {"in_proj": _a(m.atten.in_proj_weight),
                       "out_proj": _a(m.atten.out_proj.weight)}}


def mha_self_atten_layer(m) -> dict:
    children = {"self_atten": mha(m.self_atten),
                "norm1": flax_layer_norm(m.norm1),
                "norm2": flax_layer_norm(m.norm2)}
    if not m.improved:
        children["ff1"] = linear(m.feedforward[0])
        children["ff2"] = linear(m.feedforward[3])
    else:
        children["recurrent"] = lstm(m.recurrent)
        children["ff2"] = linear(m.feedforward[2])
    return merge(children)


def dparn_block2d(m) -> dict:
    return merge({"intra_atten1": mha_self_atten_layer(m.intra_atten1),
                  "intra_atten2": mha_self_atten_layer(m.intra_atten2),
                  "intra_fc": linear(m.intra_fc),
                  "intra_norm": layer_norm_last(m.intra_norm),
                  "inter_rnn": single_rnn(m.inter_rnn),
                  "inter_norm": layer_norm_last(m.inter_norm)})


def dparn(m) -> dict:
    children = unet_updown(m)
    children["dprnn_block1"] = dparn_block2d(m.dprnn_block1)
    children["dprnn_block2"] = dparn_block2d(m.dprnn_block2)
    return merge(children)


def so_wrapper_speaker_net(m) -> dict:
    """speaker_net children by list position (param-free layers skipped
    but still consume an index)."""
    children = {}
    for i, layer in enumerate(m.speaker_net):
        sub = speaker_net_layer(layer)
        if sub is not None:
            children[f"speaker_net_{i}"] = sub
    return children


def so_wrapper_td_conv_tasnet(m) -> dict:
    """Full SoTaskWrapModule (FreeEncDec + ConvTasNet + speaker_net)."""
    children = {"encoder": free_encdec(m.encoder),
                "masker": conv_tasnet(m.masker)}
    children.update(so_wrapper_speaker_net(m))
    return merge(children)


def unet_tcn(m) -> dict:
    """UnetTcn masker: Unet stacks + nested (repeat x stack) TCN lists."""
    import torch.nn as tnn

    children = unet_updown(m)
    for r, stack in enumerate(m.tcn_list):
        for i, layer in enumerate(stack):
            conv = (gated_tcn(layer) if type(layer).__name__ == "GatedTCN"
                    else tcn(layer))
            children[f"tcn_list_{r}_{i}"] = conv
    return merge(children)


# ------------------------------------------------------------- migration API

#: reference masker class name -> converter (reference puresound/nnet/*)
MASKER_CONVERTERS = {
    "SkiM": skim,
    "ConvTasNet": conv_tasnet,
    "DPCRN": dpcrn,
    "DPARN": dparn,
    "DPARN_Mout": dparn,
    "DPRNN": dprnn,
    "UnetTcn": unet_tcn,
}


def conv_stft_graft(torch_encoder, init_encoder_params) -> dict:
    """Graft a reference ConvEncDec/ConvSTFT encoder's trainable fourier
    kernels (wsin/wcos) onto this framework's init'd encoder subtree —
    the derived buffers (windows, OLA masks) keep their init values,
    which are definitionally identical."""
    out = dict(init_encoder_params)
    enc = dict(out["encoder"])
    enc["wsin"] = jnp.asarray(
        torch_encoder.encoder.wsin.detach().numpy().reshape(
            enc["wsin"].shape))
    enc["wcos"] = jnp.asarray(
        torch_encoder.encoder.wcos.detach().numpy().reshape(
            enc["wcos"].shape))
    out["encoder"] = enc
    return out


def structure_mismatches(ref, got, path="") -> list:
    """Walk two variables trees; report missing/extra keys and leaf shape
    mismatches of `got` relative to `ref` (the jax model's init)."""
    probs = []
    ref_d, got_d = hasattr(ref, "items"), hasattr(got, "items")
    if ref_d or got_d:
        rk = set(ref.keys()) if ref_d else set()
        gk = set(got.keys()) if got_d else set()
        probs += [f"missing {path}/{k}" for k in sorted(rk - gk)]
        probs += [f"extra {path}/{k}" for k in sorted(gk - rk)]
        for k in sorted(rk & gk):
            probs += structure_mismatches(ref[k], got[k], f"{path}/{k}")
    else:
        rs = getattr(ref, "shape", None)
        gs = getattr(got, "shape", None)
        if tuple(rs or ()) != tuple(gs or ()):
            probs.append(f"shape {path}: {gs} vs init {rs}")
    return probs


def convert_reference_model(torch_model, init_variables) -> dict:
    """Convert a trained reference wrapper (torch SoTaskWrapModule /
    SiMoTaskWrapModule instance, weights loaded) into a variables dict
    for the SAME zoo config built here.

    init_variables: this framework's `model.init(...)` output for the
    matching config — provides derived/auxiliary leaves the torch side
    does not carry (e.g. ConvSTFT window buffers) and the structure the
    result is validated against. Raises ValueError with a per-leaf report
    on any mismatch."""
    mname = type(torch_model.masker).__name__
    if mname not in MASKER_CONVERTERS:
        raise KeyError(
            f"no converter for reference masker {mname!r}; known: "
            f"{sorted(MASKER_CONVERTERS)}")
    children = {"masker": MASKER_CONVERTERS[mname](torch_model.masker)}

    ename = type(torch_model.encoder).__name__
    if ename == "FreeEncDec":
        children["encoder"] = free_encdec(torch_model.encoder)

    spk = getattr(torch_model, "speaker_net", None)
    if spk is not None:
        for i, layer in enumerate(spk):
            sub = speaker_net_layer(layer)
            if sub is not None:
                children[f"speaker_net_{i}"] = sub
    tree = merge(children)

    out = {coll: dict(init_variables[coll]) for coll in init_variables}
    for coll in ("params", "batch_stats"):
        if tree.get(coll):
            out.setdefault(coll, {})
            out[coll] = {**out[coll], **tree[coll]}
    if ename != "FreeEncDec" and hasattr(torch_model.encoder, "encoder"):
        out["params"]["encoder"] = conv_stft_graft(
            torch_model.encoder, init_variables["params"]["encoder"])

    probs = structure_mismatches(init_variables, out)
    if probs:
        raise ValueError(
            "converted tree does not match the jax model's init "
            f"({len(probs)} mismatches):\n  " + "\n  ".join(probs[:40]))
    return out

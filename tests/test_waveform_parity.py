"""Full-model waveform parity on the bundled test_case audio.

The BASELINE contract: SI-SNRi within 0.1 dB of the PyTorch reference on
the test_case wavs. Here the reference model's weights are transferred into
the TPU framework and both run the SAME audio; the outputs must agree to
>60 dB SI-SNR (far inside the 0.1 dB budget). float64 on both sides removes
recurrence-chaos ambiguity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_mapping as tmap
from puresound_tpu.nnet.base_nn import SoTaskWrapModule
from puresound_tpu.src.audio import AudioIO
from puresound_tpu.zoo import init_tse_model

WAV = "/root/reference/test/test_case/1272-128104-0000_2035-147961-0014.wav"
FLAC = "/root/reference/test/test_case/1272-141231-0008.flac"


def _load_audio():
    mix, sr = AudioIO.open(WAV)
    enroll, sr2 = AudioIO.open(FLAC)
    assert sr == sr2 == 16000
    return mix[:, : 16000 * 3], enroll[:, : 16000 * 2]


def test_tse_skim_waveform_parity(torch_oracle):
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, enroll = _load_audio()

    torch.manual_seed(7)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("tse_skim_v0_causal", None, None, verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)),
                                 torch.from_numpy(enroll.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("tse_skim_v0_causal")
        variables = tmap.variables(tmap.so_wrapper_tse_skim(tm))
        j_out = np.asarray(jm.apply(variables, jnp.asarray(mix.astype(np.float64)),
                                    jnp.asarray(enroll.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    assert j_out.shape == t_out.shape
    err = j_out - t_out
    snr = 10 * np.log10(np.sum(t_out**2) / np.maximum(np.sum(err**2), 1e-300))
    print(f"waveform agreement SNR: {snr:.1f} dB")
    assert snr > 60.0, f"waveform agreement only {snr:.1f} dB"


def test_ns_dpcrn_waveform_parity(torch_oracle):
    """Full NS pipeline (ConvSTFT + DPCRN + complex mask + iSTFT) with
    reference weights transferred: outputs agree far inside the 0.1 dB
    SI-SNRi budget on the bundled test_case audio."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/ns")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, _ = _load_audio()
    mix = mix[:, : 16000 * 2]

    torch.manual_seed(11)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("ns_dpcrn_v0_causal", None, verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        from puresound_tpu.zoo import init_ns_model

        jm = init_ns_model("ns_dpcrn_v0_causal")
        variables = tmap.variables(tmap.merge(
            {"masker": tmap.dpcrn(tm.masker)}))
        # ConvSTFT weights: copy trainable wsin/wcos into the jax shapes
        init_v = jm.init(jax.random.PRNGKey(0),
                         jnp.asarray(mix.astype(np.float64)),
                         method=SoTaskWrapModule.inference)
        enc = dict(init_v["params"]["encoder"]["encoder"])
        enc["wsin"] = jnp.asarray(
            tm.encoder.encoder.wsin.detach().numpy().reshape(enc["wsin"].shape))
        enc["wcos"] = jnp.asarray(
            tm.encoder.encoder.wcos.detach().numpy().reshape(enc["wcos"].shape))
        variables["params"]["encoder"] = {"encoder": enc}
        j_out = np.asarray(jm.apply(variables,
                                    jnp.asarray(mix.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    n = min(t_out.shape[-1], j_out.shape[-1])
    t, j = t_out[..., :n], j_out[..., :n]
    err = j - t
    snr = 10 * np.log10((t ** 2).sum() / np.maximum((err ** 2).sum(), 1e-300))
    assert snr > 60.0, f"NS waveform parity SNR {snr:.1f} dB"


def test_ns_dparn_waveform_parity(torch_oracle):
    """Full NS pipeline with the attention masker (DPARN): reference
    weights transferred, outputs agree on the bundled test_case audio."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/ns")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, _ = _load_audio()
    mix = mix[:, : 16000]

    torch.manual_seed(13)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("ns_dparn_v0_causal", None, verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        from puresound_tpu.zoo import init_ns_model

        jm = init_ns_model("ns_dparn_v0_causal")
        variables = tmap.variables(tmap.merge(
            {"masker": tmap.dparn(tm.masker)}))
        init_v = jm.init(jax.random.PRNGKey(0),
                         jnp.asarray(mix.astype(np.float64)),
                         method=SoTaskWrapModule.inference)
        enc = dict(init_v["params"]["encoder"]["encoder"])
        enc["wsin"] = jnp.asarray(
            tm.encoder.encoder.wsin.detach().numpy().reshape(enc["wsin"].shape))
        enc["wcos"] = jnp.asarray(
            tm.encoder.encoder.wcos.detach().numpy().reshape(enc["wcos"].shape))
        variables["params"]["encoder"] = {"encoder": enc}
        j_out = np.asarray(jm.apply(variables,
                                    jnp.asarray(mix.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    n = min(t_out.shape[-1], j_out.shape[-1])
    t, j = t_out[..., :n], j_out[..., :n]
    snr = 10 * np.log10((t ** 2).sum()
                        / np.maximum(((j - t) ** 2).sum(), 1e-300))
    assert snr > 60.0, f"DPARN waveform parity SNR {snr:.1f} dB"


def test_tse_conv_tasnet_waveform_parity(torch_oracle):
    """Full TD ConvTasNet TSE (free filterbank + gated masker + TCN speaker
    net): reference weights transferred, outputs agree on test_case audio."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, enroll = _load_audio()
    mix, enroll = mix[:, : 16000], enroll[:, : 16000]

    torch.manual_seed(17)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("td_tse_conv_tasnet_v0", None, None,
                        verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)),
                                 torch.from_numpy(enroll.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("td_tse_conv_tasnet_v0")
        variables = tmap.variables(tmap.so_wrapper_td_conv_tasnet(tm))
        j_out = np.asarray(jm.apply(variables,
                                    jnp.asarray(mix.astype(np.float64)),
                                    jnp.asarray(enroll.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    n = min(t_out.shape[-1], j_out.shape[-1])
    t, j = t_out[..., :n], j_out[..., :n]
    snr = 10 * np.log10((t ** 2).sum()
                        / np.maximum(((j - t) ** 2).sum(), 1e-300))
    assert snr > 60.0, f"ConvTasNet TSE waveform parity SNR {snr:.1f} dB"


def test_tse_unet_tcn_waveform_parity(torch_oracle):
    """Full STFT-domain TSE (ConvSTFT + UnetTcn + GatedTCN speaker net):
    reference weights transferred, outputs agree on test_case audio."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, enroll = _load_audio()
    mix, enroll = mix[:, : 16000], enroll[:, : 16000]

    torch.manual_seed(19)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("tse_unet_tcn_v0", None, None, verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)),
                                 torch.from_numpy(enroll.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("tse_unet_tcn_v0")
        children = {"masker": tmap.unet_tcn(tm.masker)}
        children.update(tmap.so_wrapper_speaker_net(tm))
        variables = tmap.variables(tmap.merge(children))
        init_v = jm.init(jax.random.PRNGKey(0),
                         jnp.asarray(mix.astype(np.float64)),
                         jnp.asarray(enroll.astype(np.float64)),
                         method=SoTaskWrapModule.inference)
        enc = dict(init_v["params"]["encoder"]["encoder"])
        enc["wsin"] = jnp.asarray(
            tm.encoder.encoder.wsin.detach().numpy().reshape(enc["wsin"].shape))
        enc["wcos"] = jnp.asarray(
            tm.encoder.encoder.wcos.detach().numpy().reshape(enc["wcos"].shape))
        variables["params"]["encoder"] = {"encoder": enc}
        j_out = np.asarray(jm.apply(variables,
                                    jnp.asarray(mix.astype(np.float64)),
                                    jnp.asarray(enroll.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    n = min(t_out.shape[-1], j_out.shape[-1])
    t, j = t_out[..., :n], j_out[..., :n]
    snr = 10 * np.log10((t ** 2).sum()
                        / np.maximum(((j - t) ** 2).sum(), 1e-300))
    assert snr > 60.0, f"UnetTcn TSE waveform parity SNR {snr:.1f} dB"


def test_tse_veve_dprnn_waveform_parity(torch_oracle):
    """Full embedding-free TSE (free filterbank + DPRNN conditioned through
    inter initial states): reference weights transferred, outputs agree."""
    torch = torch_oracle
    import sys

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, enroll = _load_audio()
    mix, enroll = mix[:, : 16000], enroll[:, : 16000]

    torch.manual_seed(23)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("veve_dprnn_v0_causal", None, None,
                        verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)),
                                 torch.from_numpy(enroll.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("veve_dprnn_v0_causal")
        variables = tmap.variables(tmap.merge(
            {"encoder": tmap.free_encdec(tm.encoder),
             "masker": tmap.dprnn(tm.masker)}))
        j_out = np.asarray(jm.apply(variables,
                                    jnp.asarray(mix.astype(np.float64)),
                                    jnp.asarray(enroll.astype(np.float64)),
                                    method=SoTaskWrapModule.inference))

    n = min(t_out.shape[-1], j_out.shape[-1])
    t, j = t_out[..., :n], j_out[..., :n]
    snr = 10 * np.log10((t ** 2).sum()
                        / np.maximum(((j - t) ** 2).sum(), 1e-300))
    assert snr > 60.0, f"veve DPRNN waveform parity SNR {snr:.1f} dB"


def test_convert_reference_model_migration(torch_oracle):
    """The user-facing migration API (utils/torch_import.py
    convert_reference_model): a trained reference TSE model converts into
    a validated variables dict that reproduces the reference waveform."""
    torch = torch_oracle
    import sys

    from puresound_tpu.utils.torch_import import (convert_reference_model,
                                                  structure_mismatches)

    sys.path.insert(0, "/root/reference/egs/tse")
    try:
        from model import init_model as torch_init
    finally:
        sys.path.pop(0)
        sys.modules.pop("model", None)

    mix, enroll = _load_audio()
    torch.manual_seed(11)
    torch.set_default_dtype(torch.float64)
    try:
        tm = torch_init("tse_skim_v0_causal", None, None,
                        verbose=False).double()
        tm.eval()
        with torch.no_grad():
            t_out = tm.inference(torch.from_numpy(mix.astype(np.float64)),
                                 torch.from_numpy(enroll.astype(np.float64)))
        t_out = t_out.numpy()
    finally:
        torch.set_default_dtype(torch.float32)

    with jax.enable_x64(True):
        jm = init_tse_model("tse_skim_v0_causal")
        init_v = jm.init(jax.random.PRNGKey(0),
                         jnp.asarray(mix.astype(np.float64)),
                         jnp.asarray(enroll.astype(np.float64)),
                         method=SoTaskWrapModule.inference)
        variables = convert_reference_model(tm, init_v)
        assert structure_mismatches(init_v, variables) == []
        j_out = np.asarray(jm.apply(
            variables, jnp.asarray(mix.astype(np.float64)),
            jnp.asarray(enroll.astype(np.float64)),
            method=SoTaskWrapModule.inference))

    err = j_out - t_out
    snr = 10 * np.log10(np.sum(t_out**2) / np.maximum(np.sum(err**2), 1e-300))
    assert snr > 60.0, f"migrated-model agreement only {snr:.1f} dB"

    # unknown masker -> clear error
    class Fake:
        masker = object()
        encoder = object()

    with pytest.raises(KeyError):
        convert_reference_model(Fake(), init_v)

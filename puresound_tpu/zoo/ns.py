"""NS model zoo — named configs of egs/ns/model.py on the TPU-native stack.

Parity: egs/ns/model.py:14-221 (ns_dpcrn_v0{,_causal}, ns_dparn_v0{,_causal}).
"""
from __future__ import annotations

from ..nnet.base_nn import SoTaskWrapModule
from ..nnet.dparn import DPARN
from ..nnet.dpcrn import DPCRN
from ..nnet.encoder import ConvEncDec
from ..nnet.loss.sdr import SDRLoss
from ..nnet.loss.stft_loss import MultiResolutionSTFTLoss, over_suppression_loss


def init_loss(hparam):
    """Parity: egs/ns/model.py:14-35."""
    sig_loss = hparam["LOSS"]["sig_loss"]
    sig_threshold = hparam["LOSS"].get("sig_threshold")
    if sig_loss and sig_loss.lower() in ("sisnr", "sdsdr", "sdr", "tsdr"):
        return SDRLoss.init_mode(sig_loss.lower(), threshold=sig_threshold)
    if sig_loss and sig_loss.lower() == "stft":
        loss = MultiResolutionSTFTLoss()
        return lambda enh, ref, dummy: loss(enh, ref)
    if sig_loss and sig_loss.lower() == "stft_ov":
        loss = MultiResolutionSTFTLoss()
        return lambda enh, ref, dummy: loss(enh, ref) + over_suppression_loss(enh, ref)
    return None


_UNET_KW = dict(
    input_type="RI", input_dim=512, activation_type="PReLU",
    norm_type="bN2d", dropout=0.1, channels=(1, 32, 32, 32, 64, 128),
    transpose_t_size=2, skip_conv=False, kernel_t=(2, 2, 2, 2, 2),
    kernel_f=(5, 3, 3, 3, 3), stride_t=(1, 1, 1, 1, 1),
    stride_f=(2, 2, 1, 1, 1), dilation_t=(1, 1, 1, 1, 1),
    dilation_f=(1, 1, 1, 1, 1), delay=(0, 0, 0, 0, 0), rnn_hidden=128,
)


def init_model(name: str, sig_loss=None, **kwargs) -> SoTaskWrapModule:
    encoder = ConvEncDec(fft_length=512, win_type="hann", win_length=512,
                         hop_length=128, trainable=True,
                         output_format="Complex")
    if name in ("ns_dpcrn_v0_causal", "ns_dpcrn_v0"):
        # reference: 1,380,043 params; causal lookahead 384; semi-causal 1024
        masker = DPCRN(transpose_delay=(name == "ns_dpcrn_v0"), **_UNET_KW)
    elif name in ("ns_dparn_v0_causal", "ns_dparn_v0"):
        # reference: 1,215,179 params; causal lookahead 384; semi-causal 1024
        masker = DPARN(transpose_delay=(name == "ns_dparn_v0"), nhead=8,
                       **_UNET_KW)
    else:
        raise NameError(name)
    return SoTaskWrapModule(
        encoder=encoder, masker=masker, speaker_net=None,
        loss_func_wav=sig_loss, loss_func_spk=None, drop_first_bin=True,
        mask_constraint="linear", f_type="Complex", mask_type="Complex",
        **kwargs)

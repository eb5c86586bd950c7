"""TSE model zoo — the named configs of egs/tse/model.py re-expressed on the
TPU-native stack. Names, hyper-parameters, and docstring param counts mirror
the reference (egs/tse/model.py:89-642).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..nnet.base_nn import SoTaskWrapModule
from ..nnet.conv_tasnet import ConvTasNet, GatedTCN, TCN
from ..nnet.dprnn import DPRNN
from ..nnet.encoder import ConvEncDec, FbankEnc, FreeEncDec
from ..nnet.lobe.cnn import Conv1d
from ..nnet.lobe.pooling import AttentiveStatisticsPooling
from ..nnet.lobe.rnn import SingleRNN
from ..nnet.lobe.trivial import Magnitude, SpecAugment
from ..nnet.loss.aamsoftmax import AAMsoftmax
from ..nnet.loss.metrics import F1Loss, GE2ELoss, TripletLoss
from ..nnet.loss.sdr import SDRLoss
from ..nnet.loss.stft_loss import MultiResolutionSTFTLoss, over_suppression_loss
from ..nnet.skim import SkiM
from ..nnet.unet import UnetTcn


def cross_entropy(logits, labels):
    import jax

    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def init_loss(hparam):
    """Build (sig_loss, cls_loss[, cls_loss_other]) from the LOSS config.

    Parity: egs/tse/model.py:23-85.
    """
    sig_loss = hparam["LOSS"]["sig_loss"]
    cls_loss = hparam["LOSS"]["cls_loss"]
    sig_threshold = hparam["LOSS"].get("sig_threshold")

    if sig_loss and sig_loss.lower() in ("sisnr", "sdsdr", "sdr", "tsdr"):
        sig_loss = SDRLoss.init_mode(sig_loss.lower(), threshold=sig_threshold)
    elif sig_loss and sig_loss.lower() == "sisnr_stft":
        sdr_loss = SDRLoss.init_mode("sisnr", threshold=sig_threshold)
        stft_loss = MultiResolutionSTFTLoss()
        base = sdr_loss
        sig_loss = lambda enh, ref, others: stft_loss(enh, ref) + base(enh, ref, others)
    elif sig_loss and sig_loss.lower() == "sisnr_ov":
        sdr_loss = SDRLoss.init_mode("sisnr", threshold=sig_threshold)
        sig_loss = lambda enh, ref, others: sdr_loss(enh, ref, others) + over_suppression_loss(enh, ref)
    elif sig_loss and sig_loss.lower() == "f1":
        f1 = F1Loss()
        sig_loss = lambda enh, ref, others: f1(enh, ref)
    else:
        sig_loss = None

    if cls_loss and cls_loss.lower() == "cross_entropy":
        cls_loss = cross_entropy
    elif cls_loss and cls_loss.lower() == "aamsoftmax":
        cls_loss = AAMsoftmax(input_dim=hparam["LOSS"]["embed_dim"],
                              n_class=hparam["LOSS"]["n_class"],
                              margin=hparam["LOSS"]["margin"],
                              scale=hparam["LOSS"]["scale"])
    elif cls_loss and cls_loss.lower() == "ge2e":
        assert hparam["TRAIN"]["contrastive_learning"]
        cls_loss = GE2ELoss(nspks=hparam["TRAIN"]["p_spks"],
                            putts=hparam["TRAIN"]["p_utts"], add_norm=True)
    else:
        cls_loss = None

    other = hparam["LOSS"].get("cls_loss_other")
    if other is None:
        return sig_loss, cls_loss
    if other.lower() == "triplet":
        return sig_loss, cls_loss, TripletLoss(margin=0.3, add_norm=True,
                                               distance="consine")
    raise NotImplementedError(other)


def _tcn_speaker_net(feat_dim: int, embed_dim: int = 192, tcn_dim: int = 256):
    """5x TCN + ASP pooling + 1x1 conv (the standard TSE speaker net)."""
    return tuple(
        [TCN(feat_dim, tcn_dim, kernel=3, dilation=2**i, causal=False,
             tcn_norm="gLN", dconv_norm="gGN") for i in range(5)]
        + [AttentiveStatisticsPooling(feat_dim, 128),
           Conv1d(feat_dim * 2, embed_dim, 1, use_bias=False)]
    )


def init_model(name: str, sig_loss=None, cls_loss=None, other_loss=None,
               **kwargs) -> SoTaskWrapModule:
    """Build a named TSE model (egs/tse/model.py:89)."""
    if name == "td_tse_conv_tasnet_v0":
        # reference: Total params 10,156,311; lookahead/receptive inf
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=512),
            masker=ConvTasNet(512, 192, True, tcn_kernel=3, tcn_dim=256,
                              repeat_tcn=3, tcn_dilated_basic=2,
                              per_tcn_stack=8,
                              tcn_with_embed=(1, 0, 0, 0, 0, 0, 0, 0),
                              tcn_norm="gLN", dconv_norm="gGN", causal=False,
                              tcn_layer="normal"),
            speaker_net=_tcn_speaker_net(512),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", **kwargs)

    if name == "td_tse_conv_tasnet_v0_causal":
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=512),
            masker=ConvTasNet(512, 192, True, tcn_kernel=3, tcn_dim=256,
                              repeat_tcn=3, tcn_dilated_basic=2,
                              per_tcn_stack=8,
                              tcn_with_embed=(1, 0, 0, 0, 0, 0, 0, 0),
                              tcn_norm="bN1d", dconv_norm="bN1d", causal=True,
                              tcn_layer="normal"),
            speaker_net=_tcn_speaker_net(512),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", **kwargs)

    if name in ("tse_unet_tcn_v0", "tse_unet_tcn_v0_causal", "tse_unet_tcn_v1"):
        causal = name.endswith("causal")
        film = name.endswith("v1")
        # reference: v0 13,372,725 params; v0_causal lookahead 1152,
        # receptive field 24960; v1 14,404,917 params
        return SoTaskWrapModule(
            encoder=ConvEncDec(fft_length=512, win_type="hann", win_length=512,
                               hop_length=128, trainable=True,
                               output_format="Complex"),
            masker=UnetTcn(
                embed_dim=192, embed_norm=True, input_type="RI", input_dim=512,
                activation_type="PReLU",
                norm_type="bN2d" if causal else "gLN",
                channels=(1, 32, 64, 128, 128, 128, 128), transpose_t_size=2,
                transpose_delay=True, skip_conv=False,
                kernel_t=(2, 2, 2, 2, 2, 2), kernel_f=(5, 5, 5, 5, 5, 5),
                stride_t=(1, 1, 1, 1, 1, 1), stride_f=(2, 2, 2, 2, 2, 2),
                dilation_t=(1, 1, 1, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1, 1),
                delay=(0, 0, 0, 0, 0, 0), tcn_layer="gated", tcn_kernel=3,
                tcn_dim=256, tcn_dilated_basic=2, per_tcn_stack=5,
                repeat_tcn=3, tcn_with_embed=(1, 0, 0, 0, 0),
                tcn_norm="bN1d" if causal else "gLN",
                dconv_norm="bN1d" if causal else "gGN", causal=causal,
                tcn_use_film=film),
            speaker_net=tuple(
                [Magnitude(drop_first=False)]
                + [GatedTCN(256, 128, 3, dilation=2**i, causal=False,
                            tcn_norm="gLN") for i in range(5)]
                + [AttentiveStatisticsPooling(256, 128),
                   Conv1d(256 * 2, 192, 1, use_bias=False)]),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="linear", drop_first_bin=True, **kwargs)

    if name in ("tse_skim_v0", "tse_skim_v0_causal"):
        causal = name.endswith("causal")
        # reference: v0 15,575,570 params; v0_causal 6,375,442, lookahead 16
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                               output_active=True),
            masker=SkiM(input_size=128, hidden_size=256, output_size=128,
                        n_blocks=4, seg_size=150, seg_overlap=False,
                        causal=causal, embed_dim=192, embed_norm=True,
                        block_with_embed=(1, 1, 1, 1), embed_fusion="FiLM"),
            speaker_net=_tcn_speaker_net(128),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", **kwargs)

    if name == "tse_skim_v1_causal":
        # reference: 6,249,219 params, lookahead 16
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                               output_active=True),
            masker=SkiM(input_size=128, hidden_size=256, output_size=128,
                        n_blocks=4, seg_size=150, seg_overlap=False,
                        causal=True, embed_dim=192, embed_norm=True,
                        block_with_embed=(1, 1, 1, 1), embed_fusion="FiLM"),
            speaker_net=tuple(
                [SingleRNN(rnn_type="LSTM", input_size=128, hidden_size=192,
                           bidirectional=True, dropout=0.05)]
                + [AttentiveStatisticsPooling(128, 128),
                   Conv1d(128 * 2, 192, 1, use_bias=False)]),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", **kwargs)

    if name == "tse_skim_v2_causal":
        # reference: 6,221,554 params, lookahead 16
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                               output_active=True),
            encoder_spk=FbankEnc(trainable=False, output_format="Magnitude",
                                 n_banks=80),
            masker=SkiM(input_size=128, hidden_size=256, output_size=128,
                        n_blocks=4, seg_size=150, seg_overlap=False,
                        causal=True, embed_dim=192, embed_norm=True,
                        block_with_embed=(1, 1, 1, 1), embed_fusion="FiLM"),
            speaker_net=tuple(
                [SpecAugment(freq_mask_length=10, time_mask_length=0,
                             fill_value=0.0)]
                + [TCN(80, 256, 3, dilation=2**i, causal=False,
                       tcn_norm="gLN", dconv_norm="gGN") for i in range(5)]
                + [AttentiveStatisticsPooling(80, 128),
                   Conv1d(80 * 2, 192, 1, use_bias=False)]),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", **kwargs)

    if name == "tse_skim_v0_causal_vad":
        # reference: 1,181,392 params, lookahead 16 (PVAD, sigmoid output)
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                               output_active=True),
            masker=SkiM(input_size=128, hidden_size=64, output_size=128,
                        n_blocks=2, seg_size=150, seg_overlap=False,
                        causal=True, embed_dim=192, embed_norm=True,
                        block_with_embed=(1, 1), embed_fusion="FiLM"),
            speaker_net=_tcn_speaker_net(128),
            loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", output_constraint="Sigmoid", **kwargs)

    if name == "veve_dprnn_v0_causal":
        # reference: 723,585 params, lookahead 16 (embedding-free TSE)
        return SoTaskWrapModule(
            encoder=FreeEncDec(win_length=32, hop_length=16, laten_length=128,
                               output_active=True),
            masker=DPRNN(input_size=128, hidden_size=64, output_size=128,
                         n_blocks=6, seg_size=20, seg_overlap=False,
                         causal=True, embed_dim=0, embed_norm=False,
                         block_with_embed=(0, 0, 0, 0, 0, 0),
                         embedding_free_tse=True),
            speaker_net=None, loss_func_wav=sig_loss, loss_func_spk=cls_loss,
            loss_func_others=other_loss,
            mask_constraint="ReLU", embedding_free_tse=True, **kwargs)

    raise NameError(name)

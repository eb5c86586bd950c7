"""Calibrate the end-to-end trained-quality gate (round-4 verdict item 4).

Overfit small NS (DPCRN) and TSE (SkiM) models on mixtures built from the
reference's real test audio (/root/reference/test/test_case/*) through the
REAL trainer (NsTask/TseTask + DataLoader + manifests), and report how the
quality metrics (SI-SNRi, STOI, native PESQ) move with training steps.
The thresholds frozen in tests/test_trained_quality.py come from here.

Run: python scripts/exp_trained_quality.py [ns|tse] [epochs]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from puresound_tpu.src.audio import AudioIO
from puresound_tpu.src.filter import Filter
from puresound_tpu.src.metrics import Metrics
from puresound_tpu.src.utils import fftconvolve

SR = 16000
CLEAN_FLAC = "/root/reference/test/test_case/1272-141231-0008.flac"
MIX_WAV = ("/root/reference/test/test_case/"
           "1272-128104-0000_2035-147961-0014.wav")


def load_real_audio():
    clean, sr = AudioIO.open(CLEAN_FLAC)
    assert sr == SR
    interf, sr = AudioIO.open(MIX_WAV)
    assert sr == SR
    return clean[0], interf[0]


def make_ns_corpus(tmp, n=4, clip_s=1.1, snr_db=2.0):
    """Real speech + lowpass-filtered white noise at a fixed SNR."""
    clean, _ = load_real_audio()
    L = int(clip_s * SR)
    rng = np.random.default_rng(7)
    taps = Filter.lowpass_filter(3000.0)
    man = os.path.join(tmp, "manifest")
    wavd = os.path.join(tmp, "wavs")
    os.makedirs(man, exist_ok=True)
    os.makedirs(wavd, exist_ok=True)
    scp, ref = [], []
    pairs = []
    for i in range(n):
        seg = clean[i * L:(i + 1) * L].astype(np.float32)
        noise = rng.standard_normal(L + len(taps)).astype(np.float32)
        noise = fftconvolve(noise, taps)[:L].astype(np.float32)
        g = np.sqrt((seg ** 2).mean()
                    / ((noise ** 2).mean() * 10 ** (snr_db / 10)))
        noisy = seg + g * noise
        cp = os.path.join(wavd, f"c{i}.wav")
        npth = os.path.join(wavd, f"n{i}.wav")
        AudioIO.save(seg.reshape(1, -1), cp, SR)
        AudioIO.save(noisy.reshape(1, -1), npth, SR)
        scp.append(f"utt{i} {npth}")
        ref.append(f"utt{i} {cp}")
        pairs.append((noisy, seg))
    open(os.path.join(man, "wav2scp.txt"), "w").write("\n".join(scp) + "\n")
    open(os.path.join(man, "wav2ref.txt"), "w").write("\n".join(ref) + "\n")
    return man, pairs


def make_tse_corpus(tmp, n=3, clip_s=0.9, sir_db=0.0):
    """Real target speech + REAL interfering speech at a fixed SIR; enroll
    is a different segment of the target speaker (no overlap with targets)."""
    clean, interf = load_real_audio()
    L = int(clip_s * SR)
    assert (n + 2) * L <= len(clean), "targets+enroll won't fit the clip"
    enroll_full = clean[-2 * L:]  # tail segments reserved for enrollment
    man = os.path.join(tmp, "manifest")
    wavd = os.path.join(tmp, "wavs")
    os.makedirs(man, exist_ok=True)
    os.makedirs(wavd, exist_ok=True)
    scp, ref, r2l, r2s, w2s = [], [], [], [], []
    pairs = []
    for i in range(n):
        seg = clean[i * L:(i + 1) * L].astype(np.float32)
        other = interf[i * L:(i + 1) * L].astype(np.float32)
        g = np.sqrt((seg ** 2).mean()
                    / ((other ** 2).mean() * 10 ** (sir_db / 10)))
        mix = seg + g * other
        enr = enroll_full[(i % 2) * L:((i % 2) + 1) * L].astype(np.float32)
        paths = {}
        for name, sig in (("mix", mix), ("clean", seg), ("enr", enr)):
            p = os.path.join(wavd, f"{name}_{i}.wav")
            AudioIO.save(sig.reshape(1, -1), p, SR)
            paths[name] = p
        key = f"mix_{i}_s1"
        scp.append(f"{key} {paths['mix']}")
        ref.append(f"{key} {paths['clean']}")
        r2l.append(f"{key} {paths['enr']}")
        r2s.append(f"{key} spkA")
        w2s.append(f"{key} spkA-spkB")
        pairs.append((mix, seg, enr))
    for fname, lines in (("wav2scp.txt", scp), ("wav2ref.txt", ref),
                         ("ref2list.txt", r2l), ("ref2spk.txt", r2s),
                         ("wav2spk.txt", w2s)):
        open(os.path.join(man, fname), "w").write("\n".join(lines) + "\n")
    return man, pairs


def small_ns_model():
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.dpcrn import DPCRN
    from puresound_tpu.nnet.encoder import ConvEncDec
    from puresound_tpu.nnet.loss.sdr import SDRLoss

    encoder = ConvEncDec(fft_length=256, win_length=256, hop_length=64,
                         trainable=True, output_format="Complex")
    masker = DPCRN(input_type="RI", input_dim=256, norm_type="bN2d",
                   dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                   transpose_t_size=2, transpose_delay=False,
                   kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                   dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                   stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                   delay=(0, 0, 0, 0, 0), rnn_hidden=16)
    return SoTaskWrapModule(encoder=encoder, masker=masker,
                            loss_func_wav=SDRLoss.init_mode("sisnr"),
                            drop_first_bin=True, mask_constraint="linear",
                            f_type="Complex", mask_type="Complex")


def small_tse_model():
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.nnet.skim import SkiM

    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=64,
                         output_active=True)
    masker = SkiM(input_size=64, hidden_size=48, output_size=64, n_blocks=2,
                  seg_size=50, seg_overlap=False, causal=True, embed_dim=32,
                  embed_norm=True, embed_fusion="FiLM",
                  block_with_embed=(1, 1))
    speaker_net = tuple(
        [TCN(64, 48, 3, dilation=2 ** i, causal=False, tcn_norm="gLN",
             dconv_norm="gGN") for i in range(3)]
        + [AttentiveStatisticsPooling(64, 64),
           Conv1d(128, 32, 1, use_bias=False)])
    return SoTaskWrapModule(encoder=encoder, masker=masker,
                            speaker_net=speaker_net,
                            loss_func_wav=SDRLoss.init_mode("sisnr"),
                            mask_constraint="ReLU")


def run_ns(epochs=60, tmp=None, verbose=True):
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.ns import NsCollateFunc, NsDataset, NsTask

    tmp = tmp or tempfile.mkdtemp(prefix="tq_ns_")
    man, pairs = make_ns_corpus(tmp)
    ds = NsDataset(man, resample_to=SR, max_length=None)
    loader = DataLoader(ds, batch_size=2, shuffle=True,
                        collate_fn=NsCollateFunc(), seed=0)
    model = small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    hp = {
        "DATASET": {"sample_rate": SR},
        "OPTIMIZER": {"lr": 3e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "lr_scheduler": "stepLR",
                      "gamma": 0.9, "patience": 20, "mode": "min",
                      "gradiend_clip": 10.0, "multi_rate": False},
        "TRAIN": {"num_epochs": epochs, "resume_epoch": None,
                  "multi_gpu": True, "use_tensorboard": False,
                  "model_save_dir": os.path.join(tmp, "ckpt"),
                  "log_dir": os.path.join(tmp, "log"),
                  "contrastive_learning": False, "seed": 0},
        "LOSS": {"alpha": 10.0},
    }
    task = NsTask(hp, model, init_fn, "cpu", loader, loader)
    met = Metrics()

    def evaluate():
        si, sti, psq = [], [], []
        base_si, base_sti, base_psq = [], [], []
        for noisy, seg in pairs:
            out = np.asarray(task.inference(jnp.asarray(noisy)[None]))[0]
            L = min(len(out), len(seg))
            si.append(met.sisnr(seg[:L], out[:L]))
            sti.append(met.stoi(seg[:L], out[:L], SR))
            psq.append(met.pesq_wb(seg[:L], out[:L]))
            base_si.append(met.sisnr(seg[:L], noisy[:L]))
            base_sti.append(met.stoi(seg[:L], noisy[:L], SR))
            base_psq.append(met.pesq_wb(seg[:L], noisy[:L]))
        return (np.mean(si), np.mean(sti), np.mean(psq),
                np.mean(base_si), np.mean(base_sti), np.mean(base_psq))

    t0 = time.time()
    for ep in range(epochs):
        logs = task.train_one_epoch(ep)
        if verbose and ((ep + 1) % 10 == 0 or ep == 0):
            si, sti, psq, bsi, bsti, bpsq = evaluate()
            print(f"ep {ep+1:3d} loss={logs['total_loss']:.3f} "
                  f"SI-SNR {si:.2f} (noisy {bsi:.2f}, i={si-bsi:+.2f}) "
                  f"STOI {sti:.3f} (noisy {bsti:.3f}) "
                  f"PESQ {psq:.2f} (noisy {bpsq:.2f}) "
                  f"[{time.time()-t0:.0f}s]", flush=True)
    si, sti, psq, bsi, bsti, bpsq = evaluate()
    return {"sisnr": si, "stoi": sti, "pesq": psq, "base_sisnr": bsi,
            "base_stoi": bsti, "base_pesq": bpsq,
            "loss": logs["total_loss"]}


def run_tse(epochs=60, tmp=None, verbose=True):
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset, TseTask

    tmp = tmp or tempfile.mkdtemp(prefix="tq_tse_")
    man, pairs = make_tse_corpus(tmp)
    ds = TseDataset(man, resample_to=SR, max_length=None, enroll_rule="full")
    loader = DataLoader(ds, batch_size=2, shuffle=True,
                        collate_fn=TseCollateFunc(), seed=0)
    model = small_tse_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=x,
                          ref_clean=x, train=False)

    hp = {
        "DATASET": {"sample_rate": SR},
        "OPTIMIZER": {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "lr_scheduler": "stepLR",
                      "gamma": 0.9, "patience": 20, "mode": "min",
                      "gradiend_clip": 10.0, "multi_rate": False},
        "TRAIN": {"num_epochs": epochs, "resume_epoch": None,
                  "multi_gpu": True, "use_tensorboard": False,
                  "model_save_dir": os.path.join(tmp, "ckpt"),
                  "log_dir": os.path.join(tmp, "log"),
                  "contrastive_learning": False, "seed": 0},
        "LOSS": {"alpha": 10.0},
    }
    task = TseTask(hp, model, init_fn, "cpu", loader, loader)
    met = Metrics()

    def evaluate():
        si, bsi = [], []
        for mix, seg, enr in pairs:
            out = np.asarray(task.inference(jnp.asarray(mix)[None],
                                            jnp.asarray(enr)[None]))[0]
            L = min(len(out), len(seg))
            si.append(met.sisnr(seg[:L], out[:L]))
            bsi.append(met.sisnr(seg[:L], mix[:L]))
        return np.mean(si), np.mean(bsi)

    t0 = time.time()
    for ep in range(epochs):
        logs = task.train_one_epoch(ep)
        if verbose and ((ep + 1) % 10 == 0 or ep == 0):
            si, bsi = evaluate()
            print(f"ep {ep+1:3d} loss={logs['total_loss']:.3f} "
                  f"SI-SNR {si:.2f} (mix {bsi:.2f}, i={si-bsi:+.2f}) "
                  f"[{time.time()-t0:.0f}s]", flush=True)
    si, bsi = evaluate()
    return {"sisnr": si, "base_sisnr": bsi, "loss": logs["total_loss"]}


def make_dss_corpus(tmp, n=3, clip_s=0.9, sir_db=0.0):
    """Near (real target speech) + far (real interfering speech) at a fixed
    SIR; DSS manifests (wav2scp/ref2near/ref2far)."""
    clean, interf = load_real_audio()
    L = int(clip_s * SR)
    man = os.path.join(tmp, "manifest")
    wavd = os.path.join(tmp, "wavs")
    os.makedirs(man, exist_ok=True)
    os.makedirs(wavd, exist_ok=True)
    scp, near_l, far_l = [], [], []
    pairs = []
    for i in range(n):
        near = clean[i * L:(i + 1) * L].astype(np.float32)
        far = interf[i * L:(i + 1) * L].astype(np.float32)
        g = np.sqrt((near ** 2).mean()
                    / ((far ** 2).mean() * 10 ** (sir_db / 10)))
        far = (g * far).astype(np.float32)
        mix = near + far
        paths = {}
        for name, sig in (("mix", mix), ("near", near), ("far", far)):
            p = os.path.join(wavd, f"{name}_{i}.wav")
            AudioIO.save(sig.reshape(1, -1), p, SR)
            paths[name] = p
        key = f"utt{i}"
        scp.append(f"{key} {paths['mix']}")
        near_l.append(f"{key} {paths['near']}")
        far_l.append(f"{key} {paths['far']}")
        pairs.append((mix, near, far))
    for fname, lines in (("wav2scp.txt", scp), ("ref2near.txt", near_l),
                         ("ref2far.txt", far_l)):
        open(os.path.join(man, fname), "w").write("\n".join(lines) + "\n")
    return man, pairs


def small_dss_model(sig_loss=None):
    from puresound_tpu.nnet.base_nn import SiMoTaskWrapModule
    from puresound_tpu.nnet.dparn import DPARN_Mout
    from puresound_tpu.nnet.encoder import ConvEncDec

    return SiMoTaskWrapModule(
        encoder=ConvEncDec(fft_length=256, win_length=256, hop_length=64,
                           trainable=True, output_format="Complex"),
        masker=DPARN_Mout(input_type="RI", input_dim=256, norm_type="bN2d",
                          dropout=0.0, channels=(1, 8, 8, 16, 16, 32),
                          transpose_t_size=2, transpose_delay=False,
                          kernel_t=(2, 2, 2, 2, 2), stride_t=(1, 1, 1, 1, 1),
                          dilation_t=(1, 1, 1, 1, 1), kernel_f=(5, 3, 3, 3, 3),
                          stride_f=(2, 2, 1, 1, 1), dilation_f=(1, 1, 1, 1, 1),
                          delay=(0, 0, 0, 0, 0), multi_output=2,
                          rnn_hidden=16, nhead=4),
        loss_func_wav=sig_loss, f_type="Complex", mask_type="Complex",
        drop_first_bin=True)


def run_dss(epochs=60, tmp=None, verbose=True):
    """Overfit near/far SIMO separation through DssTask; gate on the
    source-aggregated SDR loss improvement + per-source SI-SNRi (ref
    puresound/task/dss.py:241-342 trains this runtime; the reference ships
    no DSS recipe/results, so the gate is the overfit evidence)."""
    from puresound_tpu.nnet.loss.sdr import SDRLoss, si_snr
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.dss import DssCollateFunc, DssDataset, DssTask

    tmp = tmp or tempfile.mkdtemp(prefix="tq_dss_")
    man, pairs = make_dss_corpus(tmp)
    ds = DssDataset(man, resample_to=SR, max_length=None)
    loader = DataLoader(ds, batch_size=2, shuffle=True,
                        collate_fn=DssCollateFunc(), seed=0)
    model = small_dss_model(SDRLoss.init_mode("sasisnr"))

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x,
                          ref_clean=jnp.zeros((1, 2, SR)),
                          inactive_labels=jnp.zeros((1, 2), bool),
                          train=False)

    hp = {
        "DATASET": {"sample_rate": SR},
        "OPTIMIZER": {"lr": 3e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "lr_scheduler": "stepLR",
                      "gamma": 0.9, "patience": 20, "mode": "min",
                      "gradiend_clip": 10.0, "multi_rate": False},
        "TRAIN": {"num_epochs": epochs, "resume_epoch": None,
                  "multi_gpu": True, "use_tensorboard": False,
                  "model_save_dir": os.path.join(tmp, "ckpt"),
                  "log_dir": os.path.join(tmp, "log"),
                  "contrastive_learning": False, "seed": 0},
        "LOSS": {"alpha": 10.0},
    }
    task = DssTask(hp, model, init_fn, "cpu", loader, loader)

    def evaluate():
        near_si, far_si, base_near, base_far = [], [], [], []
        for mix, near, far in pairs:
            out = np.asarray(task.inference(jnp.asarray(mix)[None]))[0]
            L = min(out.shape[-1], len(near))
            near_si.append(float(si_snr(out[0, :L], near[:L])))
            far_si.append(float(si_snr(out[1, :L], far[:L])))
            base_near.append(float(si_snr(mix[:L], near[:L])))
            base_far.append(float(si_snr(mix[:L], far[:L])))
        return (np.mean(near_si), np.mean(far_si),
                np.mean(base_near), np.mean(base_far))

    t0 = time.time()
    first_loss = None
    for ep in range(epochs):
        logs = task.train_one_epoch(ep)
        if first_loss is None:
            first_loss = logs["total_loss"]
        if verbose and ((ep + 1) % 10 == 0 or ep == 0):
            nsi, fsi, bn, bf = evaluate()
            print(f"ep {ep+1:3d} loss={logs['total_loss']:.3f} "
                  f"near SI-SNR {nsi:.2f} (mix {bn:.2f}, i={nsi-bn:+.2f}) "
                  f"far SI-SNR {fsi:.2f} (mix {bf:.2f}, i={fsi-bf:+.2f}) "
                  f"[{time.time()-t0:.0f}s]", flush=True)
    nsi, fsi, bn, bf = evaluate()
    return {"near_sisnr": nsi, "far_sisnr": fsi, "base_near_sisnr": bn,
            "base_far_sisnr": bf, "first_loss": first_loss,
            "loss": logs["total_loss"]}


def make_pvad_corpus(tmp, n=2, clip_s=1.8, sir_db=0.0):
    """Two-speaker mixtures with sample-level target-speaker VAD labels
    (frame energy of the clean target, 32 ms frames, -35 dB of peak),
    TseDataset PVAD manifests (ref2vad points at a 0/1 waveform).

    Clips are 1.8 s (the clean test flac is only 4.6 s) with a 0.6 s
    silenced-target gap: the Binarize post-processor smooths at 0.2 s,
    so the activity structure must be comfortably longer than the
    smoothing kernel or the binarized F1 saturates at the boundary smear
    (observed with 0.9 s clips / 0.3 s gaps: raw F1 0.96, binarized
    stuck at 0.72)."""
    clean, interf = load_real_audio()
    L = int(clip_s * SR)
    enroll_full = clean[-2 * L:]
    man = os.path.join(tmp, "manifest")
    wavd = os.path.join(tmp, "wavs")
    os.makedirs(man, exist_ok=True)
    os.makedirs(wavd, exist_ok=True)
    frame = int(0.032 * SR)
    scp, ref, r2v, r2l, r2s, w2s = [], [], [], [], [], []
    pairs = []
    for i in range(n):
        seg = clean[i * L:(i + 1) * L].astype(np.float32)
        other = interf[i * L:(i + 1) * L].astype(np.float32)
        # silence half the target so the labels have both classes
        seg = seg.copy()
        gap0 = (i % 2) * (L // 2)
        seg[gap0:gap0 + L // 3] = 0.0
        g = np.sqrt(max((seg ** 2).mean(), 1e-9)
                    / ((other ** 2).mean() * 10 ** (sir_db / 10)))
        mix = seg + g * other
        nf = L // frame
        fe = (seg[:nf * frame].reshape(nf, frame) ** 2).mean(axis=1)
        thr = fe.max() * 10 ** (-35 / 10)
        vad = np.repeat((fe > thr).astype(np.float32), frame)
        vad = np.pad(vad, (0, L - len(vad)), mode="edge")
        enr = enroll_full[(i % 2) * L:((i % 2) + 1) * L].astype(np.float32)
        paths = {}
        for name, sig in (("mix", mix), ("clean", seg), ("vad", vad),
                          ("enr", enr)):
            p = os.path.join(wavd, f"{name}_{i}.wav")
            AudioIO.save(sig.reshape(1, -1), p, SR)
            paths[name] = p
        key = f"mix_{i}_s1"
        scp.append(f"{key} {paths['mix']}")
        ref.append(f"{key} {paths['clean']}")
        r2v.append(f"{key} {paths['vad']}")
        r2l.append(f"{key} {paths['enr']}")
        r2s.append(f"{key} spkA")
        w2s.append(f"{key} spkA-spkB")
        pairs.append((mix, vad, enr))
    for fname, lines in (("wav2scp.txt", scp), ("wav2ref.txt", ref),
                         ("ref2vad.txt", r2v), ("ref2list.txt", r2l),
                         ("ref2spk.txt", r2s), ("wav2spk.txt", w2s)):
        open(os.path.join(man, fname), "w").write("\n".join(lines) + "\n")
    return man, pairs


def small_pvad_model():
    """small_tse_model with the PVAD head: Sigmoid output + soft-F1 loss
    (zoo: tse_skim_v0_causal_vad / LOSS.sig_loss: f1)."""
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.loss.metrics import F1Loss
    from puresound_tpu.nnet.skim import SkiM

    encoder = FreeEncDec(win_length=32, hop_length=16, laten_length=64,
                         output_active=True)
    masker = SkiM(input_size=64, hidden_size=48, output_size=64, n_blocks=2,
                  seg_size=50, seg_overlap=False, causal=True, embed_dim=32,
                  embed_norm=True, embed_fusion="FiLM",
                  block_with_embed=(1, 1))
    speaker_net = tuple(
        [TCN(64, 48, 3, dilation=2 ** i, causal=False, tcn_norm="gLN",
             dconv_norm="gGN") for i in range(3)]
        + [AttentiveStatisticsPooling(64, 64),
           Conv1d(128, 32, 1, use_bias=False)])
    f1 = F1Loss()
    return SoTaskWrapModule(encoder=encoder, masker=masker,
                            speaker_net=speaker_net,
                            loss_func_wav=lambda enh, ref, others: f1(enh, ref),
                            mask_constraint="ReLU",
                            output_constraint="Sigmoid")


def run_pvad(epochs=60, tmp=None, verbose=True):
    """Overfit personal-VAD through TseTask (is_vad_dataset manifests);
    gate on F1 after Binarize post-processing (ref egs/tse/main.py:190-223
    scores exactly this way)."""
    import importlib.util

    from puresound_tpu.src.metrics import Metrics
    from puresound_tpu.tasks.base import DataLoader
    from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset, TseTask

    spec = importlib.util.spec_from_file_location(
        "binarize", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "egs", "tse", "local",
            "binarize.py"))
    binarize_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(binarize_mod)

    tmp = tmp or tempfile.mkdtemp(prefix="tq_pvad_")
    man, pairs = make_pvad_corpus(tmp)
    ds = TseDataset(man, resample_to=SR, max_length=None,
                    enroll_rule="full", is_vad_dataset=True)
    loader = DataLoader(ds, batch_size=2, shuffle=True,
                        collate_fn=TseCollateFunc(), seed=0)
    model = small_pvad_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=x,
                          ref_clean=x, train=False)

    hp = {
        "DATASET": {"sample_rate": SR},
        "OPTIMIZER": {"lr": 3e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "lr_scheduler": "stepLR",
                      "gamma": 0.9, "patience": 20, "mode": "min",
                      "gradiend_clip": 10.0, "multi_rate": False},
        "TRAIN": {"num_epochs": epochs, "resume_epoch": None,
                  "multi_gpu": True, "use_tensorboard": False,
                  "model_save_dir": os.path.join(tmp, "ckpt"),
                  "log_dir": os.path.join(tmp, "log"),
                  "contrastive_learning": False, "seed": 0},
        "LOSS": {"alpha": 0.0},
    }
    task = TseTask(hp, model, init_fn, "cpu", loader, loader)
    binarizer = binarize_mod.Binarize(threshold=0.5, stability=0.05,
                                      sample_rate=SR, mode="moving_average")

    def evaluate():
        f1s, accs, raw_f1s = [], [], []
        for mix, vad, enr in pairs:
            out = np.asarray(task.inference(jnp.asarray(mix)[None],
                                            jnp.asarray(enr)[None]))
            L = min(out.shape[-1], len(vad))
            binarized = binarizer(out[:, :L])
            s = Metrics.f1_score(vad[None, :L], binarized.astype(np.float32))
            f1s.append(s["f1_score"])
            accs.append(s["accuracy"])
            raw = Metrics.f1_score(vad[None, :L],
                                   (out[:, :L] > 0.5).astype(np.float32))
            raw_f1s.append(raw["f1_score"])
        return np.mean(f1s), np.mean(accs), np.mean(raw_f1s)

    t0 = time.time()
    base_f1, base_acc, _ = evaluate()  # untrained, same scorer
    for ep in range(epochs):
        logs = task.train_one_epoch(ep)
        if verbose and ((ep + 1) % 10 == 0 or ep == 0):
            f1, acc, rf1 = evaluate()
            print(f"ep {ep+1:3d} loss={logs['total_loss']:.3f} "
                  f"F1(binarized) {f1:.3f} acc {acc:.3f} F1(raw) {rf1:.3f} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
    f1, acc, rf1 = evaluate()
    return {"f1": f1, "accuracy": acc, "raw_f1": rf1, "base_f1": base_f1,
            "base_accuracy": base_acc, "loss": logs["total_loss"]}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ns"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    {"ns": run_ns, "tse": run_tse, "dss": run_dss,
     "pvad": run_pvad}[which](epochs)

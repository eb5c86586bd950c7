"""Target-speech-extraction task: dataset (inactive-speaker training,
enrollment selection policies), collate, trainer with multi-rate optim.

Parity: puresound/task/tse.py (TseCollateFunc :16, TseDataset :58,
TseTask :529).
"""
from __future__ import annotations

import random
from typing import Any, Dict, Optional

import numpy as np

from ..src.audio import AudioIO
from ..src.utils import load_text_as_dict
from .base import pad_stack
from .ns import NsTask, _AugmentedDataset


class TseCollateFunc:
    def __call__(self, batch: Any) -> Dict:
        return {
            "uttid": [b["uttid"] for b in batch],
            "clean_wav": pad_stack([b["clean_wav"] for b in batch]),
            "process_wav": pad_stack([b["process_wav"] for b in batch]),
            "enroll_wav": pad_stack([b["enroll_wav"] for b in batch]),
            "spk_label": np.asarray([b["spk_label"] for b in batch], np.int32),
            "inactive_utts": np.asarray([b["inactive"] for b in batch], bool),
        }


class TseDataset(_AugmentedDataset):
    """TSE / PVAD dataset with single-speaker and inactive-speaker cases,
    enrollment rules (None/longest/shortest/fixed_length/full), enrollment
    level randomization (-28 dBFS + sqrt(10)-std) and augmentation."""

    def __init__(self, folder: str, resample_to: int,
                 max_length: Optional[int] = None,
                 enroll_rule: Optional[str] = None,
                 enroll_augment: bool = False,
                 noise_folder: Optional[str] = None,
                 rir_folder: Optional[str] = None, rir_mode: str = "image",
                 vol_perturbed: Optional[tuple] = None,
                 speed_perturbed: bool = False,
                 perturb_frequency_response: bool = False,
                 single_spk_pb: float = 0.0, inactive_training: float = 0.0,
                 is_vad_dataset: bool = False):
        self.max_length = max_length
        self.noise_folder = noise_folder
        self.rir_folder = rir_folder
        self.rir_mode = rir_mode
        self.speed_perturbed = speed_perturbed
        self.perturb_frequency_response = perturb_frequency_response
        self.vol_perturbed = vol_perturbed
        self.single_spk_pb = single_spk_pb
        self.inactive_training = inactive_training
        self.enroll_rule = enroll_rule
        self.enroll_augment = enroll_augment
        self.is_vad_dataset = is_vad_dataset
        super().__init__(folder, resample_to=resample_to)
        if (noise_folder or rir_folder or speed_perturbed
                or vol_perturbed is not None or perturb_frequency_response):
            self.create_augmentor()
        else:
            self.augmentor = None
        self.create_df2spk()

    @property
    def folder_content(self):
        content = {
            "wav2scp": "wav2scp.txt",   # noisy wav path
            "wav2ref": "wav2ref.txt",   # clean (target) wav path
            "ref2list": "ref2list.txt",  # enrollment candidates
            "ref2spk": "ref2spk.txt",   # target speaker id
            "wav2spk": "wav2spk.txt",   # speakers in the mixture
        }
        if self.is_vad_dataset:
            content["ref2vad"] = "ref2vad.txt"
        return content

    def __getitem__(self, index: int) -> Dict:
        key = self.idx_df[index]
        feats = self.get_feature(key)
        return {"uttid": key,
                "process_wav": feats["process_wav"].reshape(1, -1),
                "clean_wav": feats["clean_wav"].reshape(1, -1),
                "enroll_wav": feats["enroll_wav"].reshape(1, -1),
                "spk_label": feats["spk_label"],
                "inactive": feats["inactive"]}

    def get_feature(self, key: str) -> Dict:
        spk_label = self.ref2spk[self.df[key]["ref2spk"]]
        wav = self._open_resampled(self.df[key]["wav2scp"])
        clean_path = (self.df[key]["wav2ref"] if not self.is_vad_dataset
                      else self.df[key]["ref2vad"])
        clean_wav = self._open_resampled(clean_path)

        # single-target-speaker cases
        if np.random.rand() < self.single_spk_pb:
            if not self.is_vad_dataset:
                wav = clean_wav.copy()
            else:
                wav = self._open_resampled(self.df[key]["wav2ref"])

        # inactive-speaker training: replace the mixture with audio from
        # speakers disjoint from the current mixture; target := mixture
        # (TSE) or zeros (PVAD)
        inactive = False
        if np.random.rand() < self.inactive_training:
            current_spks = self.df[key]["wav2spk"].split("-")
            keys = list(self.df.keys())
            for _ in range(1000):
                pick_key = random.choice(keys)
                pick_sid = int(pick_key.strip().split("_")[-1][-1]) - 1
                pick_spk = self.df[pick_key]["wav2spk"].split("-")[pick_sid]
                if pick_spk not in current_spks:
                    break
            enroll_wav = self.load_enroll(key, mode=self.enroll_rule)
            if np.random.rand() > 0.5:
                wav = self._open_resampled(self.df[pick_key]["wav2scp"])
            else:
                wav = self._open_resampled(self.df[pick_key]["wav2ref"])
            clean_wav = (wav.copy() if not self.is_vad_dataset
                         else np.zeros_like(wav))
            inactive = True
        else:
            enroll_wav = self.load_enroll(key, mode=self.enroll_rule)

        if self.max_length is not None:
            wav, clean_wav = self._random_crop_pair(
                wav, clean_wav, avoid_zero_target=not self.is_vad_dataset)

        if self.augmentor:
            process_wav, (speed, _, rir_id, rir_ch, a, b) = self.wave_process(
                wav, noise_snr_range=(5, 15))
            clean_wav = self._match_target(
                clean_wav, speed, rir_id, rir_ch, a, b, self.rir_mode,
                skip_signal_warp=self.is_vad_dataset)
            if self.vol_perturbed is not None:
                if not self.is_vad_dataset:
                    clean_wav, process_wav, enroll_wav = self._vol_perturb(
                        clean_wav, process_wav, enroll_wav)
                else:
                    process_wav, enroll_wav = self._vol_perturb(
                        process_wav, enroll_wav)
        else:
            process_wav = wav

        if inactive:
            clean_wav = (process_wav.copy() if not self.is_vad_dataset
                         else np.zeros_like(process_wav))

        return {"clean_wav": clean_wav.astype(np.float32),
                "process_wav": process_wav.astype(np.float32),
                "enroll_wav": enroll_wav.astype(np.float32),
                "spk_label": spk_label, "inactive": inactive}

    # ---------------------------------------------------------- enrollment
    def load_enroll(self, key, mode: Optional[str] = None) -> np.ndarray:
        min_length = self.resample_to * 1
        max_length = self.resample_to * 15
        enroll_list = self.df[key]["ref2list"]
        if not isinstance(enroll_list, list):
            enroll_list = [enroll_list]
        enroll_list = list(enroll_list)
        target_lvl = round(float(np.random.normal(-28, np.sqrt(10))), 1)

        def _open(path):
            wav, sr = AudioIO.open(f_path=path, target_lvl=target_lvl)
            if self.resample_to and sr != self.resample_to:
                wav = AudioIO.resample(wav, sr, self.resample_to)
            return wav

        if mode is None:
            pick = random.randrange(len(enroll_list))
            enroll_wav = _open(enroll_list[pick])
            while enroll_wav.shape[-1] < min_length:
                del enroll_list[pick]
                if not enroll_list:
                    break
                pick = random.randrange(len(enroll_list))
                enroll_wav = np.concatenate(
                    [enroll_wav, _open(enroll_list[pick])], axis=-1)
        elif mode in ("longest", "shortest"):
            lengths = [AudioIO.audio_info(p)[1] for p in enroll_list]
            pick = int(np.argmax(lengths) if mode == "longest" else np.argmin(lengths))
            enroll_wav = _open(enroll_list[pick])
        elif mode == "fixed_length":
            enroll_len = self.resample_to * 5
            pick = random.randrange(len(enroll_list))
            enroll_wav = _open(enroll_list[pick])
            if enroll_wav.shape[-1] > enroll_len:
                offset = random.randint(0, enroll_wav.shape[-1] - enroll_len)
                enroll_wav = enroll_wav[:, offset : offset + enroll_len]
        elif mode == "full":
            enroll_wav = np.concatenate([_open(p) for p in enroll_list], axis=-1)
        else:
            raise NameError(mode)

        if self.augmentor and self.enroll_augment:
            backup = enroll_wav.copy()
            if self.rir_folder is not None and np.random.rand() < 0.5:
                enroll_wav, _, _ = self.augmentor.apply_rir(enroll_wav)
            if self.noise_folder is not None and np.random.rand() < 0.5:
                snr = float(np.random.uniform(5, 15))
                enroll_wav = self.augmentor.add_bg_noise(enroll_wav, [snr])[0]
            if self.perturb_frequency_response and np.random.rand() < 0.8:
                enroll_wav, _, _ = self.augmentor.add_variaion_response(enroll_wav)
            if np.isnan(enroll_wav).any():
                print("Enroll augmentation warning: nan, rolled back")
                enroll_wav = backup
        return enroll_wav[:, :max_length]

    # ---------------------------------------------------------------- meta
    def create_df2spk(self):
        spk_ids = sorted(set(self.df[k]["ref2spk"] for k in self.df))
        self.ref2spk = {s: i for i, s in enumerate(spk_ids)}

    def sampler_meta(self) -> Dict[str, list]:
        spk2utt: Dict[str, list] = {}
        for idx in range(len(self.df)):
            spk = self.df[self.idx_df[idx]]["ref2spk"]
            spk2utt.setdefault(spk, []).append(idx)
        return spk2utt


class TseTask(NsTask):
    """TSE trainer: joint wav+speaker loss, multi-rate param groups
    (encoder/speaker_net/encoder_spk/GE2E at 0.1x; masker at 1.0x),
    contrastive dev switch."""

    def lr_factors(self) -> Optional[Dict[str, float]]:
        return {"encoder_spk": 0.1, "encoder": 0.1, "masker": 1.0,
                "speaker_net": 0.1, "loss_func_spk": 0.1}

    def _batch_kwargs(self, batch) -> Dict:
        import jax.numpy as jnp

        return {
            "noisy": jnp.asarray(batch["process_wav"]),
            "enroll": jnp.asarray(batch["enroll_wav"]),
            "ref_clean": jnp.asarray(batch["clean_wav"]),
            "spk_class": jnp.asarray(batch["spk_label"]),
            "inactive_labels": jnp.asarray(batch["inactive_utts"]),
        }

    def _build_steps(self):
        import jax

        from ..parallel.mesh import make_train_step

        import jax.numpy as jnp

        if self.hparam["TRAIN"].get("fused_scan"):
            from ..nnet import conv_tasnet as _ct
            from ..nnet.lobe import rnn as _rnn

            _rnn.FUSED_TRAIN_SCAN = True
            _ct.FUSED_TCN = True
        mp = self.hparam["TRAIN"].get("mixed_precision")
        augment_fn = None
        if self.hparam["DATASET"].get("augment_on_device"):
            # as in NsTask: RIR/noise/volume batched inside the jitted
            # step (src/augment_jax). TSE specifics mirrored: noise SNR
            # drawn from (5, 15) (get_feature above), the volume ratio
            # also scales the enrollment (_vol_perturb couples them), and
            # inactive utterances take target := the AUGMENTED mixture.
            # Enrollment-side augmentation (enroll_augment) stays host.
            from ..src.augment_jax import DeviceAugmentor

            ds = self.hparam["DATASET"]
            if str(ds.get("type", "")).lower() == "pvad":
                raise ValueError("augment_on_device does not support PVAD "
                                 "(VAD-label targets must not be warped)")
            vol = ds.get("vol_perturbed")
            if vol and not isinstance(vol, (tuple, list)):
                vol = tuple(float(v) for v in str(vol).strip().split(","))
            self.device_augmentor = DeviceAugmentor(
                sample_rate=ds["sample_rate"],
                noise_folder=ds.get("noise_folder"),
                rir_folder=ds.get("rir_folder"),
                rir_mode=ds.get("rir_mode") or "image",
                noise_snr_range=(5.0, 15.0),
                vol_range=vol)
            augment_fn = self.device_augmentor.make_augment_fn(
                inactive_key="inactive_labels", vol_keys=("enroll",))
        self._train_step = make_train_step(
            self.model,
            loss_kwargs={"alpha": self.hparam["LOSS"].get("alpha", 10.0),
                         "return_loss_detail": True},
            grad_clip=self.hparam["OPTIMIZER"].get("gradiend_clip"),
            mesh=self._mesh, donate=False,
            compute_dtype=jnp.bfloat16 if mp else None,
            remat=self.hparam["TRAIN"].get("remat", False),
            accum_steps=int(self.hparam["TRAIN"].get("grad_accum") or 1),
            skip_nonfinite=bool(self.hparam["TRAIN"].get("skip_nan_steps")),
            augment_fn=augment_fn, tp=self._tp,
            tp_min_size=int(self.hparam["TRAIN"].get("tp_min_size") or 64))

        def eval_step(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            contrastive = self.hparam["TRAIN"].get("contrastive_learning")
            kwargs = dict(batch)
            if not contrastive and self.model.task != 2:
                kwargs["spk_class"] = None
            out = self.model.apply(
                variables, **kwargs, train=False,
                alpha=self.hparam["LOSS"].get("alpha", 10.0))
            return out[0] if isinstance(out, tuple) else out

        self._eval_step = jax.jit(eval_step)
        self._rng = jax.random.PRNGKey(self.hparam["TRAIN"].get("seed", 0))

    def _consume_metrics(self, current_epoch, ctx, metrics) -> float:
        """NsTask's logging plus the TSE per-loss detail (signal/class);
        the dispatch loop itself is inherited from NsTask."""
        import jax

        batch_idx, overall = ctx
        metrics = jax.device_get(metrics)  # one transfer for all leaves
        loss = float(metrics["loss"])
        detail = {k: float(v) for k, v in metrics.items()
                  if k.startswith("loss_")}
        msg = ", ".join(f"{k}: {v:.4f}" for k, v in detail.items())
        print(f"epoch: {current_epoch}, iter: {batch_idx + 1}, "
              f"batch_loss: {loss:.4f}{', ' + msg if msg else ''}")
        if self.tf_writer:
            self.tf_writer.update_step_loss("train/batch_loss", loss,
                                            overall)
            if "loss_0" in detail:
                self.tf_writer.update_step_loss(
                    "train/batch_signal_loss", detail["loss_0"], overall)
            if "loss_1" in detail:
                self.tf_writer.update_step_loss(
                    "train/batch_class_loss", detail["loss_1"], overall)
        return loss

    # train_one_epoch: inherited from NsTask (shared dispatch loop +
    # DeferredMetricSink; only the metric logging above differs)

    # compute_dev_loss: inherited from NsTask (incl. multi-process lockstep)

    def gen_logging(self, epoch: int, prefix: str):
        import jax.numpy as jnp

        import os

        eval_dir = self.hparam["DATASET"].get("eval")
        if not eval_dir or not os.path.isfile(f"{eval_dir}/wav2scp.txt"):
            return
        test_audio = load_text_as_dict(f"{eval_dir}/wav2scp.txt")
        test_enroll = load_text_as_dict(f"{eval_dir}/ref2list.txt")
        sr = self.hparam["DATASET"]["sample_rate"]
        for key in test_audio.keys():
            print(f"Running inference: {key}")
            wav, file_sr = AudioIO.open(f_path=test_audio[key][0])
            if file_sr != sr:
                wav = AudioIO.resample(wav, file_sr, sr)
            enroll, file_sr = AudioIO.open(f_path=test_enroll[key][0],
                                           target_lvl=-28)
            if file_sr != sr:
                enroll = AudioIO.resample(enroll, file_sr, sr)
            enh = self.inference(jnp.asarray(wav), jnp.asarray(enroll))
            if self.tf_writer:
                self.tf_writer.add_ep_audio(f"{prefix}{key}.wav",
                                            np.asarray(enh), epoch, sr)

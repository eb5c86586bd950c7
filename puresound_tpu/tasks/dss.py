"""Distance-based (near/far) speech separation task.

Parity: puresound/task/dss.py (DssCollateFunc :14, DssDataset :57,
DssTask :241). Inactive flags come from all-zero reference signals; the
trainer stacks [near, far] into the SIMO wrapper.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .base import pad_stack
from .ns import NsTask, _AugmentedDataset


class DssCollateFunc:
    def __call__(self, batch: Any) -> Dict:
        return {
            "uttid": [b["uttid"] for b in batch],
            "near_wav": pad_stack([b["near_wav"] for b in batch]),
            "far_wav": pad_stack([b["far_wav"] for b in batch]),
            "process_wav": pad_stack([b["process_wav"] for b in batch]),
            "inactive_nearend": np.asarray(
                [b["inactive_nearend"] for b in batch], bool),
            "inactive_farfield": np.asarray(
                [b["inactive_farfield"] for b in batch], bool),
        }


class DssDataset(_AugmentedDataset):
    def __init__(self, folder: str, resample_to: int,
                 max_length: Optional[int] = None,
                 noise_folder: Optional[str] = None,
                 vol_perturbed: Optional[tuple] = None,
                 speed_perturbed: bool = False):
        self.max_length = max_length
        self.noise_folder = noise_folder
        self.rir_folder = None
        self.speed_perturbed = speed_perturbed
        self.vol_perturbed = vol_perturbed
        self.perturb_frequency_response = False
        super().__init__(folder, resample_to=resample_to)
        if noise_folder or speed_perturbed or vol_perturbed is not None:
            self.create_augmentor()
        else:
            self.augmentor = None

    @property
    def folder_content(self):
        return {"wav2scp": "wav2scp.txt", "ref2near": "ref2near.txt",
                "ref2far": "ref2far.txt"}

    def __getitem__(self, index: int) -> Dict:
        key = self.idx_df[index]
        feats = self.get_feature(key)
        return {"uttid": key,
                "process_wav": feats["process_wav"].reshape(1, -1),
                "near_wav": feats["near_wav"].reshape(1, -1),
                "far_wav": feats["far_wav"].reshape(1, -1),
                "inactive_nearend": feats["inactive_nearend"],
                "inactive_farfield": feats["inactive_farfield"]}

    def get_feature(self, key: str) -> Dict:
        import random

        wav = self._open_resampled(self.df[key]["wav2scp"])
        near = self._open_resampled(self.df[key]["ref2near"])
        far = self._open_resampled(self.df[key]["ref2far"])

        if self.max_length is not None:
            target_len = self.resample_to * self.max_length
            if wav.shape[-1] > target_len:
                offset = random.randint(0, wav.shape[-1] - target_len)
                wav = wav[:, offset : offset + target_len]
                near = near[:, offset : offset + target_len]
                far = far[:, offset : offset + target_len]
            else:
                pad = target_len - wav.shape[-1]
                wav = np.pad(wav, ((0, 0), (0, pad)))
                near = np.pad(near, ((0, 0), (0, target_len - near.shape[-1])))
                far = np.pad(far, ((0, 0), (0, target_len - far.shape[-1])))

        # inactive flags: an all-zero reference means that side is silent,
        # and its training target becomes the mixture (dss.py:195-201)
        inactive_near = bool(np.sum(np.abs(near)) == 0)
        inactive_far = bool(np.sum(np.abs(far)) == 0)

        if self.augmentor:
            process_wav, (speed, _, _, _, a, b) = self.wave_process(wav)
            if speed is not None:
                near, _ = self.augmentor.sox_speed_perturbed(near, speed)
                far, _ = self.augmentor.sox_speed_perturbed(far, speed)
            if self.vol_perturbed is not None:
                near, far, process_wav = self._vol_perturb(near, far, process_wav)
        else:
            process_wav = wav

        if inactive_near:
            near = process_wav.copy()
        if inactive_far:
            far = process_wav.copy()

        return {"process_wav": process_wav.astype(np.float32),
                "near_wav": near.astype(np.float32),
                "far_wav": far.astype(np.float32),
                "inactive_nearend": inactive_near,
                "inactive_farfield": inactive_far}


class DssTask(NsTask):
    """Separation trainer: [near, far] stacked targets into the SIMO
    wrapper with per-source inactive labels."""

    def _batch_kwargs(self, batch) -> Dict:
        import jax.numpy as jnp

        ref = np.stack([batch["near_wav"], batch["far_wav"]], axis=1)  # [N,2,L]
        inact = np.stack([batch["inactive_nearend"],
                          batch["inactive_farfield"]], axis=1)  # [N,2]
        return {"noisy": jnp.asarray(batch["process_wav"]),
                "ref_clean": jnp.asarray(ref),
                "inactive_labels": jnp.asarray(inact)}

    def inference(self, noisy, enroll=None):
        from ..nnet.base_nn import SiMoTaskWrapModule

        return self.model.apply(self._host_variables(), noisy,
                                method=SiMoTaskWrapModule.inference)

    def gen_logging(self, epoch: int, prefix: str):
        """Log near/far outputs separately (dss.py:331-342)."""
        import jax.numpy as jnp

        from ..src.audio import AudioIO
        from ..src.utils import load_text_as_dict

        eval_dir = self.hparam["DATASET"].get("eval")
        if not eval_dir or not __import__("os").path.isfile(
                f"{eval_dir}/wav2scp.txt"):
            return
        test_audio = load_text_as_dict(f"{eval_dir}/wav2scp.txt")
        sr = self.hparam["DATASET"]["sample_rate"]
        for key in test_audio.keys():
            wav, file_sr = AudioIO.open(f_path=test_audio[key][0])
            if file_sr != sr:
                wav = AudioIO.resample(wav, file_sr, sr)
            out = self.inference(jnp.asarray(wav))
            if self.tf_writer:
                import numpy as np

                self.tf_writer.add_ep_audio(f"{prefix}{key}_near.wav",
                                            np.asarray(out[:, 0]), epoch, sr)
                self.tf_writer.add_ep_audio(f"{prefix}{key}_far.wav",
                                            np.asarray(out[:, 1]), epoch, sr)

"""Noise-suppression task: dataset, collate, trainer.

Parity: puresound/task/ns.py (NsCollateFunc :14, NsDataset :44, NsTask :248).
"""
from __future__ import annotations

import random
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..src.audio import AudioAugmentor, AudioIO
from ..src.utils import load_text_as_dict
from .base import BaseTrainer, TaskDataset, pad_stack


class NsCollateFunc:
    def __call__(self, batch: Any) -> Dict:
        return {
            "uttid": [b["uttid"] for b in batch],
            "clean_wav": pad_stack([b["clean_wav"] for b in batch]),
            "process_wav": pad_stack([b["process_wav"] for b in batch]),
        }


class _AugmentedDataset(TaskDataset):
    """Shared augmentation chain: speed -> RIR -> noise -> freq-response,
    with matched target warping and NaN rollback."""

    def create_augmentor(self) -> None:
        self.augmentor = AudioAugmentor(sample_rate=self.resample_to,
                                        convolve_mode="fft")
        print("Created audio augmentor")
        if getattr(self, "noise_folder", None):
            self.augmentor.load_bg_noise_from_folder(self.noise_folder)
            print(f"Finished load {len(self.augmentor.bg_noise)} noises")
        if getattr(self, "rir_folder", None):
            self.augmentor.load_rir_from_folder(self.rir_folder)
            print(f"Finished load {len(self.augmentor.rir)} rirs")

    def _open_resampled(self, path: str) -> np.ndarray:
        wav, sr = AudioIO.open(f_path=path)
        if self.resample_to and sr != self.resample_to:
            wav = AudioIO.resample(wav, sr, self.resample_to)
        if wav.shape[0] != 1:
            wav = wav[0:1]
        return wav

    def wave_process(self, x: np.ndarray,
                     noise_snr_range=(-5, 15)) -> Tuple[np.ndarray, Tuple]:
        speed = snr = rir_id = rir_ch = a_coeffs = b_coeffs = None
        backup = x.copy()
        if getattr(self, "speed_perturbed", False) and np.random.rand() < 0.5:
            speed = float(np.random.uniform(0.9, 1.1))
            x, _ = self.augmentor.sox_speed_perturbed(x, speed)
        if getattr(self, "rir_folder", None) is not None and np.random.rand() < 0.8:
            x, rir_id, rir_ch = self.augmentor.apply_rir(x)
        if getattr(self, "noise_folder", None) is not None and np.random.rand() < 0.8:
            snr = float(np.random.uniform(*noise_snr_range))
            x = self.augmentor.add_bg_noise(x, [snr])[0]
        if getattr(self, "perturb_frequency_response", False) and np.random.rand() < 0.8:
            x, a_coeffs, b_coeffs = self.augmentor.add_variaion_response(x)
        if np.isnan(x).any():
            print(f"warning this augment has nan, snr={snr}, speed={speed}, rir_id={rir_id}")
            x, speed, rir_id, a_coeffs, b_coeffs = backup, None, None, None, None
        return x, (speed, snr, rir_id, rir_ch, a_coeffs, b_coeffs)

    def _random_crop_pair(self, wav, clean_wav, avoid_zero_target=True):
        """Random fixed-length crop avoiding all-zero targets; zero-pad when
        too short (ns.py:123-139)."""
        sr = self.resample_to
        target_len = int(sr * self.max_length)  # max_length may be fractional
        if wav.shape[-1] > target_len:
            offset = random.randint(0, wav.shape[-1] - target_len)
            if avoid_zero_target:
                tries = 0
                while clean_wav[:, offset : offset + target_len].sum() == 0 and tries < 100:
                    offset = random.randint(0, wav.shape[-1] - target_len)
                    tries += 1
            wav = wav[:, offset : offset + target_len]
            clean_wav = clean_wav[:, offset : offset + target_len]
        else:
            wav = np.pad(wav, ((0, 0), (0, target_len - wav.shape[-1])))
            clean_wav = np.pad(clean_wav, ((0, 0), (0, target_len - clean_wav.shape[-1])))
        return wav, clean_wav

    def _match_target(self, clean_wav, speed, rir_id, rir_ch, a_coeffs, b_coeffs,
                      rir_mode: str, skip_signal_warp: bool = False):
        """Warp the target with the same augmentation parameters."""
        if speed is not None and not skip_signal_warp:
            clean_wav, _ = self.augmentor.sox_speed_perturbed(clean_wav, speed)
        if rir_id is not None and rir_mode != "anechoic" and not skip_signal_warp:
            clean_wav = self.augmentor.apply_rir_by_key(
                clean_wav, rir_id, choose_ch=rir_ch, rir_mode=rir_mode)
        if a_coeffs is not None and b_coeffs is not None:
            clean_wav, _, _ = self.augmentor.add_variaion_response(
                clean_wav, a_coeffs, b_coeffs)
        return clean_wav

    def _vol_perturb(self, *wavs):
        if not isinstance(self.vol_perturbed, tuple):
            lo, hi = (float(v) for v in str(self.vol_perturbed).strip().split(","))
        else:
            lo, hi = self.vol_perturbed
        ratio = float(np.random.uniform(lo, hi))
        return [np.clip(w * ratio, -1, 1) for w in wavs]


class NsDataset(_AugmentedDataset):
    """Parallel noisy/clean NS dataset with on-the-fly augmentation."""

    def __init__(self, folder: str, resample_to: int,
                 max_length: Optional[int] = None,
                 noise_folder: Optional[str] = None,
                 rir_folder: Optional[str] = None, rir_mode: str = "image",
                 vol_perturbed: Optional[tuple] = None,
                 speed_perturbed: bool = False,
                 perturb_frequency_response: bool = False):
        self.max_length = max_length
        self.noise_folder = noise_folder
        self.rir_folder = rir_folder
        self.rir_mode = rir_mode
        self.speed_perturbed = speed_perturbed
        self.vol_perturbed = vol_perturbed
        self.perturb_frequency_response = perturb_frequency_response
        super().__init__(folder, resample_to=resample_to)
        if (noise_folder or rir_folder or speed_perturbed
                or vol_perturbed is not None or perturb_frequency_response):
            self.create_augmentor()
        else:
            self.augmentor = None

    @property
    def folder_content(self):
        return {"wav2scp": "wav2scp.txt", "wav2ref": "wav2ref.txt"}

    def __getitem__(self, index: int) -> Dict:
        key = self.idx_df[index]
        feats = self.get_feature(key)
        return {"uttid": key,
                "process_wav": feats["process_wav"].reshape(1, -1),
                "clean_wav": feats["clean_wav"].reshape(1, -1)}

    def get_feature(self, key: str) -> Dict:
        wav = self._open_resampled(self.df[key]["wav2scp"])
        clean_wav = self._open_resampled(self.df[key]["wav2ref"])
        if self.max_length is not None:
            wav, clean_wav = self._random_crop_pair(wav, clean_wav)
        if self.augmentor:
            process_wav, (speed, _, rir_id, rir_ch, a, b) = self.wave_process(wav)
            clean_wav = self._match_target(clean_wav, speed, rir_id, rir_ch,
                                           a, b, self.rir_mode)
            if self.vol_perturbed is not None:
                clean_wav, process_wav = self._vol_perturb(clean_wav, process_wav)
        else:
            process_wav = wav
        return {"clean_wav": clean_wav.astype(np.float32),
                "process_wav": process_wav.astype(np.float32)}


class NsTask(BaseTrainer):
    """NS trainer: SE forward (loss-returning wrapper) + adam + clip.

    `TRAIN.multi_gpu: true` (reference: torch DataParallel at
    puresound/task/base.py:226-229) builds a ("dp", "mp") device mesh over
    every visible chip and shards the training batch's leading axis over
    "dp"; XLA derives the gradient all-reduce from the shardings. An
    explicit `mesh=` argument overrides the config knob.
    """

    def __init__(self, hparam, model, init_fn, device_backend,
                 train_dataloader, dev_dataloader, mesh=None):
        self.model = model
        self._init_fn = init_fn
        self._mesh = mesh
        super().__init__(hparam, device_backend)
        import jax as _jax

        if _jax.process_count() > 1 and self._mesh is None \
                and not hparam["TRAIN"].get("multi_gpu"):
            raise ValueError("multi-process training requires "
                             "TRAIN.multi_gpu: true (the global mesh)")
        if self._mesh is None and hparam["TRAIN"].get("multi_gpu"):
            from ..parallel.mesh import make_mesh

            # TRAIN.mp_devices: k > 1 adds tensor parallelism: the mesh
            # becomes (devices/k dp, k mp) and eligible kernels shard their
            # output axis over "mp" (parallel/mesh.tp_spec)
            self._mesh = make_mesh(
                n_mp=int(hparam["TRAIN"].get("mp_devices") or 1))
        self._tp = (self._mesh is not None
                    and self._mesh.shape.get("mp", 1) > 1)
        if self._mesh is not None:
            from ..parallel.mesh import shard_state_to_mesh

            self.state = shard_state_to_mesh(
                self._mesh, self.state, tp=self._tp,
                tp_min_size=int(hparam["TRAIN"].get("tp_min_size") or 64))
            print(f"{'Tensor+data' if self._tp else 'Data'}-parallel "
                  f"training over "
                  f"{self._mesh.shape['dp']}x{self._mesh.shape['mp']} "
                  f"device mesh")
        self.train_dataloader = train_dataloader
        self.dev_dataloader = dev_dataloader
        self._build_steps()

    def _shard_train_batch(self, kwargs: Dict) -> Dict:
        """Pad the batch leading axis up to dp divisibility (wraparound
        repeat — only ragged final batches are slightly re-weighted) and
        shard it over the mesh."""
        if self._mesh is None:
            return kwargs
        import jax
        import jax.numpy as jnp

        from ..parallel.mesh import shard_batch

        if jax.process_count() > 1:
            # every process holds its own rows of the global batch and the
            # sharded DataLoader guarantees equal, dp-divisible row counts
            # (lockstep wraparound padding) — no local pad here
            return shard_batch(self._mesh, kwargs)
        n = self._mesh.shape["dp"]

        def pad(x):
            if x is None or not hasattr(x, "shape") or x.ndim == 0:
                return x
            B = x.shape[0]
            r = (-B) % n
            if r:
                x = jnp.take(x, jnp.arange(B + r) % B, axis=0)
            return x

        return shard_batch(self._mesh, {k: pad(v) for k, v in kwargs.items()})

    def _place_rng(self, rng):
        if self._mesh is None:
            return rng
        from ..parallel.mesh import replicate_to_mesh

        return replicate_to_mesh(self._mesh, rng)

    def build_model(self):
        pass  # model is provided pre-built (zoo factory)

    def init_variables(self):
        return self._init_fn()

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
            # host workers only decode + crop; RIR/noise/volume run
            # batched inside the jitted step (src/augment_jax) — the
            # sustained-training bench measured the host chain as the
            # bottleneck on few-core hosts
            from ..src.augment_jax import DeviceAugmentor

            ds = self.hparam["DATASET"]
            vol = ds.get("vol_perturbed")
            if vol and not isinstance(vol, (tuple, list)):
                vol = tuple(float(v) for v in str(vol).strip().split(","))
            self.device_augmentor = DeviceAugmentor(
                sample_rate=ds["sample_rate"],
                noise_folder=ds.get("noise_folder"),
                rir_folder=ds.get("rir_folder"),
                rir_mode=ds.get("rir_mode") or "image",
                vol_range=vol)
            augment_fn = self.device_augmentor.make_augment_fn()
        self._train_step = make_train_step(
            self.model, grad_clip=self.hparam["OPTIMIZER"].get("gradiend_clip"),
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
            return self.model.apply(variables, **batch, train=False)

        self._eval_step = jax.jit(eval_step)
        self._rng = jax.random.PRNGKey(self.hparam["TRAIN"].get("seed", 0))

    def _batch_kwargs(self, batch) -> Dict:
        import jax.numpy as jnp

        return {"noisy": jnp.asarray(batch["process_wav"]),
                "enroll": None,
                "ref_clean": jnp.asarray(batch["clean_wav"])}

    def _consume_metrics(self, current_epoch, ctx, metrics) -> float:
        """Log one (already-finished) step's metrics; returns the loss.
        TseTask overrides this to add the per-loss detail — the dispatch
        loop in train_one_epoch is shared."""
        import jax

        batch_idx, overall = ctx
        # one transfer for the whole metrics pytree (per-leaf float() would
        # pay the tunneled backend's readback RTT once per leaf)
        metrics = jax.device_get(metrics)
        loss = float(metrics["loss"])
        print(f"epoch: {current_epoch}, iter: {batch_idx + 1}, "
              f"batch_loss: {loss:.4f}")
        if self.tf_writer:
            self.tf_writer.update_step_loss("train/batch_loss", loss,
                                            overall)
        return loss

    def train_one_epoch(self, current_epoch):
        import jax

        from .base import DeferredMetricSink

        step = 0
        total_loss = [0.0]

        def consume(ctx, metrics):
            total_loss[0] += self._consume_metrics(current_epoch, ctx,
                                                   metrics)

        sink = DeferredMetricSink(consume)
        for batch_idx, batch in enumerate(self.train_dataloader):
            self.overall_step += 1
            step += 1
            self._rng, sub = jax.random.split(self._rng)
            self.state, metrics = self._train_step(
                self.state, self._shard_train_batch(self._batch_kwargs(batch)),
                self._place_rng(sub))
            sink.push((batch_idx, self.overall_step), metrics)
        sink.flush()
        return {"total_loss": total_loss[0] / max(step, 1)}

    def compute_dev_loss(self, current_epoch):
        import jax

        multi = jax.process_count() > 1
        step = 0
        total = None
        for batch in self.dev_dataloader:
            step += 1
            kwargs = self._batch_kwargs(batch)
            if multi:
                # lockstep global batches (sharded dev loader): every
                # process computes the identical global dev loss, so the
                # Plateau scheduler stays in sync across processes
                kwargs = self._shard_train_batch(kwargs)
            # accumulate ON DEVICE: one host readback per epoch instead of
            # one blocking round-trip per dev batch
            loss = self._eval_step(self.state.params, self.state.batch_stats,
                                   kwargs)
            total = loss if total is None else total + loss
        avg = float(total) / max(step, 1) if step else 0.0
        print(f"dev average loss: {avg}")
        return {"total_loss": avg}

    def _host_variables(self):
        """Variables usable by single-process eager paths (eval-audio
        logging): under a multi-process runtime the replicated global
        params are read back to host numpy first."""
        import jax

        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        if jax.process_count() > 1:
            from ..parallel.multihost import host_local

            variables = host_local(variables)
        return variables

    def inference(self, noisy, enroll=None):
        from ..nnet.base_nn import SoTaskWrapModule

        return self.model.apply(self._host_variables(), noisy, enroll,
                                method=SoTaskWrapModule.inference)

    def gen_logging(self, epoch: int, prefix: str):
        import jax.numpy as jnp

        import os

        eval_dir = self.hparam["DATASET"].get("eval")
        if not eval_dir or not os.path.isfile(f"{eval_dir}/wav2scp.txt"):
            return
        test_audio = load_text_as_dict(f"{eval_dir}/wav2scp.txt")
        sr = self.hparam["DATASET"]["sample_rate"]
        for key in test_audio.keys():
            print(f"Running inference: {key}")
            wav, file_sr = AudioIO.open(f_path=test_audio[key][0])
            if file_sr != sr:
                wav = AudioIO.resample(wav, file_sr, sr)
            enh = self.inference(jnp.asarray(wav))
            if self.tf_writer:
                self.tf_writer.add_ep_audio(f"{prefix}{key}.wav",
                                            np.asarray(enh), epoch, sr)

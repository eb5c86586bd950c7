"""Training-runtime integration tests on synthetic manifests (the trainer
paths the reference never tested — SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puresound_tpu.src.audio import AudioIO
from puresound_tpu.tasks.base import DataLoader, LearningRateScheduler
from puresound_tpu.tasks.ns import NsCollateFunc, NsDataset, NsTask
from puresound_tpu.tasks.tse import TseCollateFunc, TseDataset, TseTask

SR = 8000


def _make_ns_data(tmp_path, n=6):
    """Synthetic noisy/clean pairs + manifests."""
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir, exist_ok=True)
    lines_scp, lines_ref = [], []
    for i in range(n):
        clean = (0.2 * np.sin(2 * np.pi * 220 * (i + 1) / SR
                              * np.arange(SR))).astype(np.float32)
        noisy = clean + 0.05 * rng.standard_normal(SR).astype(np.float32)
        cpath = str(wav_dir / f"clean_{i}.wav")
        npath = str(wav_dir / f"noisy_{i}.wav")
        AudioIO.save(clean.reshape(1, -1), cpath, SR)
        AudioIO.save(noisy.reshape(1, -1), npath, SR)
        lines_scp.append(f"utt{i} {npath}")
        lines_ref.append(f"utt{i} {cpath}")
    man = tmp_path / "manifest"
    os.makedirs(man, exist_ok=True)
    (man / "wav2scp.txt").write_text("\n".join(lines_scp) + "\n")
    (man / "wav2ref.txt").write_text("\n".join(lines_ref) + "\n")
    return str(man)


def _make_tse_data(tmp_path, n=8):
    rng = np.random.default_rng(1)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir, exist_ok=True)
    scp, ref, r2l, r2s, w2s = [], [], [], [], []
    for i in range(n):
        spk_a, spk_b = f"sp{i % 4}", f"sp{(i + 1) % 4}"
        clean = (0.2 * np.sin(2 * np.pi * (100 + 40 * (i % 4)) / SR
                              * np.arange(2 * SR))).astype(np.float32)
        other = 0.1 * rng.standard_normal(2 * SR).astype(np.float32)
        mix = clean + other
        enroll = clean + 0.01 * rng.standard_normal(2 * SR).astype(np.float32)
        paths = {}
        for name, sig in (("mix", mix), ("clean", clean), ("enroll", enroll)):
            p = str(wav_dir / f"{name}_{i}.wav")
            AudioIO.save(sig.reshape(1, -1), p, SR)
            paths[name] = p
        key = f"mix_{i}_s1"
        scp.append(f"{key} {paths['mix']}")
        ref.append(f"{key} {paths['clean']}")
        r2l.append(f"{key} {paths['enroll']}")
        r2s.append(f"{key} {spk_a}")
        w2s.append(f"{key} {spk_a}-{spk_b}")
    man = tmp_path / "manifest"
    os.makedirs(man, exist_ok=True)
    for fname, lines in (("wav2scp.txt", scp), ("wav2ref.txt", ref),
                         ("ref2list.txt", r2l), ("ref2spk.txt", r2s),
                         ("wav2spk.txt", w2s)):
        (man / fname).write_text("\n".join(lines) + "\n")
    return str(man)


def _small_ns_model():
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import ConvTasNet
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.loss.sdr import SDRLoss

    return SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=32),
        masker=ConvTasNet(input_dim=32, embed_dim=0, tcn_kernel=3, tcn_dim=16,
                          repeat_tcn=1, per_tcn_stack=2, tcn_with_embed=(0, 0),
                          tcn_norm="cLN", dconv_norm="cLN", causal=True),
        loss_func_wav=SDRLoss.init_mode("sisnr"), mask_constraint="ReLU")


def _hparam(tmp_path, extra=None):
    h = {
        "DATASET": {"sample_rate": SR},
        "OPTIMIZER": {"lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
                      "weight_decay": 0.0, "lr_scheduler": "Plateau",
                      "gamma": 0.5, "patience": 2, "mode": "min",
                      "num_epochs_decay": 0, "gradiend_clip": 10.0,
                      "multi_rate": False},
        "TRAIN": {"num_epochs": 2, "resume_epoch": None, "multi_gpu": False,
                  "use_tensorboard": False,
                  "model_save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "log"),
                  "contrastive_learning": False, "seed": 0},
        "LOSS": {"alpha": 10.0},
    }
    if extra:
        for k, v in extra.items():
            h[k].update(v) if k in h else h.update({k: v})
    return h


def test_ns_training_loop(tmp_path):
    man = _make_ns_data(tmp_path)
    ds = NsDataset(man, resample_to=SR, max_length=1)
    loader = DataLoader(ds, batch_size=3, shuffle=True,
                        collate_fn=NsCollateFunc())
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    task = NsTask(_hparam(tmp_path), model, init_fn, "cpu", loader, loader)
    loss0 = task.train_one_epoch(0)["total_loss"]
    for _ in range(3):
        loss1 = task.train_one_epoch(0)["total_loss"]
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # optimizing

    dev = task.compute_dev_loss(0)
    assert np.isfinite(dev["total_loss"])

    # checkpoint round trip
    os.makedirs(task.hparam["TRAIN"]["model_save_dir"], exist_ok=True)
    ck = os.path.join(task.hparam["TRAIN"]["model_save_dir"], "epoch_0.ckpt")
    task.save_ckpt(ck, 0, {"total_loss": loss1})
    params_before = jax.tree_util.tree_leaves(task.state.params)[0].copy()
    task2 = NsTask(_hparam(tmp_path), model, init_fn, "cpu", loader, loader)
    task2.load_ckpt(ck)
    params_after = jax.tree_util.tree_leaves(task2.state.params)[0]
    np.testing.assert_allclose(np.asarray(params_before),
                               np.asarray(params_after))

    # inference path
    wav = jnp.zeros((1, SR))
    out = task.inference(wav)
    assert out.shape[0] == 1


def test_tse_training_loop(tmp_path):
    from puresound_tpu.zoo import init_tse_model
    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.loss.aamsoftmax import AAMsoftmax
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.nnet.skim import SkiM

    man = _make_tse_data(tmp_path)
    ds = TseDataset(man, resample_to=SR, max_length=1, single_spk_pb=0.2,
                    inactive_training=0.3)
    loader = DataLoader(ds, batch_size=4, shuffle=True,
                        collate_fn=TseCollateFunc(), drop_last=True)

    model = SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=24,
                           output_active=True),
        masker=SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                    seg_size=20, causal=True, embed_dim=8, embed_norm=True,
                    embed_fusion="FiLM", block_with_embed=(1, 1)),
        speaker_net=(TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
                         dconv_norm="gGN"),
                     AttentiveStatisticsPooling(24, 16),
                     Conv1d(48, 8, 1, use_bias=False)),
        loss_func_wav=SDRLoss.init_mode("sisnr"),
        loss_func_spk=AAMsoftmax(input_dim=8, n_class=4),
        mask_constraint="ReLU")

    def init_fn():
        x = jnp.zeros((2, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=x,
                          ref_clean=x, spk_class=jnp.zeros(2, jnp.int32),
                          train=False)

    hp = _hparam(tmp_path, {"OPTIMIZER": {"multi_rate": True}})
    task = TseTask(hp, model, init_fn, "cpu", loader, loader)
    loss = task.train_one_epoch(0)["total_loss"]
    assert np.isfinite(loss)
    dev = task.compute_dev_loss(0)
    assert np.isfinite(dev["total_loss"])


def test_lr_scheduler():
    s = LearningRateScheduler("stepLR", base_lr=1.0, gamma=0.5, patience=2)
    lrs = [s.step() for _ in range(4)]
    assert lrs == [1.0, 0.5, 0.5, 0.25]
    p = LearningRateScheduler("Plateau", base_lr=1.0, gamma=0.1, patience=1,
                              mode="min")
    p.step(1.0)
    p.step(1.1)
    assert p.lr == 1.0
    p.step(1.2)  # second bad epoch > patience -> decay
    assert p.lr == pytest.approx(0.1)


def test_dataloader_batch_sampler():
    from puresound_tpu.src.sampler import SpeakerSampler

    class Dummy:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return i

    meta = {f"spk{j}": list(range(j * 5, j * 5 + 5)) for j in range(4)}
    sampler = SpeakerSampler(meta, n_batch=3, n_spks=2, n_per=2)
    loader = DataLoader(Dummy(), batch_sampler=sampler,
                        collate_fn=lambda x: x, prefetch=0)
    batches = list(loader)
    assert len(batches) == 3 and all(len(b) == 4 for b in batches)


def test_checkpoint_averaging(tmp_path):
    """average_checkpoints (TRAIN.model_average — declared but unimplemented
    in the reference) averages params across epochs."""
    import os

    from puresound_tpu.tasks.base import BaseTrainer

    man = _make_ns_data(tmp_path)
    ds = NsDataset(man, resample_to=SR, max_length=1)
    loader = DataLoader(ds, batch_size=3, collate_fn=NsCollateFunc())
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    task = NsTask(_hparam(tmp_path), model, init_fn, "cpu", loader, loader)
    os.makedirs(task.hparam["TRAIN"]["model_save_dir"], exist_ok=True)
    paths = []
    for e in range(2):
        task.train_one_epoch(e)
        p = os.path.join(task.hparam["TRAIN"]["model_save_dir"], f"epoch_{e}.ckpt")
        task.save_ckpt(p, e, {"total_loss": 0.0})
        paths.append(p)
    variables = init_fn()
    avg = BaseTrainer.average_checkpoints(paths, variables)
    leaf = jax.tree_util.tree_leaves(avg["params"])[0]
    assert np.isfinite(np.asarray(leaf)).all()
    # averaged differs from either checkpoint
    last = jax.tree_util.tree_leaves(task.state.params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(last))

    # TRAIN.model_average wiring: the knob routes the eval-time load through
    # the same averaging (and falls back to a plain load when unset/1)
    hp = task.hparam
    hp["TRAIN"]["model_average"] = 2
    via_knob = BaseTrainer.resolve_eval_params(hp, "epoch_1.ckpt", variables)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(via_knob["params"])[0]),
        np.asarray(leaf))
    hp["TRAIN"]["model_average"] = None
    plain = BaseTrainer.resolve_eval_params(hp, "epoch_1.ckpt", variables)
    direct = BaseTrainer.load_params_from_ckpt(paths[1], variables)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(plain["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(direct["params"])[0]))


def test_ns_training_loop_mixed_precision(tmp_path):
    """TRAIN.mixed_precision: bf16 compute trains (loss decreases) and
    master params stay float32."""
    man = _make_ns_data(tmp_path)
    ds = NsDataset(man, resample_to=SR, max_length=1)
    loader = DataLoader(ds, batch_size=3, shuffle=True,
                        collate_fn=NsCollateFunc())
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    hp = _hparam(tmp_path, {"TRAIN": {"mixed_precision": True}})
    task = NsTask(hp, model, init_fn, "cpu", loader, loader)
    loss0 = task.train_one_epoch(0)["total_loss"]
    for _ in range(3):
        loss1 = task.train_one_epoch(0)["total_loss"]
    assert np.isfinite(loss1) and loss1 < loss0
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(task.state.params))


def test_ns_training_loop_multi_gpu_matches_single(tmp_path):
    """TRAIN.multi_gpu: true builds the ("dp", "mp") mesh from the config
    knob alone (the reference's one parallelism switch,
    puresound/task/base.py:226-229) and the dp-sharded epoch matches the
    single-device epoch loss; ragged final batches (6 utts, batch 4 ->
    batch of 2 padded to 8 devices) are wraparound-padded."""
    man = _make_ns_data(tmp_path)
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    def run(multi_gpu):
        ds = NsDataset(man, resample_to=SR, max_length=1)
        loader = DataLoader(ds, batch_size=4, shuffle=True,
                            collate_fn=NsCollateFunc(), seed=123)
        hp = _hparam(tmp_path, {"TRAIN": {"multi_gpu": multi_gpu}})
        task = NsTask(hp, model, init_fn, "cpu", loader, loader)
        losses = [task.train_one_epoch(0)["total_loss"] for _ in range(2)]
        return losses, task

    losses_1, _ = run(False)
    losses_8, task8 = run(True)
    assert task8._mesh is not None and task8._mesh.shape["dp"] == 8
    # first-epoch loss: batch 1 is identical (divisible by 8 after pad);
    # the ragged batch (2 utts wrapped to 8 rows) re-weights the mean of
    # duplicated rows only, so epoch losses stay close, and by epoch 2 the
    # trajectories must still agree
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-2)
    # params stay replicated across the mesh after stepping
    leaf = jax.tree_util.tree_leaves(task8.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_ns_training_loop_tensor_parallel_matches_single(tmp_path):
    """TRAIN.mp_devices: 4 on top of multi_gpu builds a (2 dp, 4 mp) mesh
    with eligible kernels sharded on their output axis (tp_spec); the
    2D-sharded epoch matches the single-device epoch loss."""
    from jax.sharding import PartitionSpec as P

    man = _make_ns_data(tmp_path)
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    def run(extra):
        ds = NsDataset(man, resample_to=SR, max_length=1)
        loader = DataLoader(ds, batch_size=4, shuffle=True,
                            collate_fn=NsCollateFunc(), seed=123)
        hp = _hparam(tmp_path, {"TRAIN": extra})
        task = NsTask(hp, model, init_fn, "cpu", loader, loader)
        losses = [task.train_one_epoch(0)["total_loss"] for _ in range(2)]
        return losses, task

    losses_1, _ = run({})
    losses_tp, task_tp = run({"multi_gpu": True, "mp_devices": 4,
                              "tp_min_size": 8})
    assert task_tp._tp and task_tp._mesh.shape == {"dp": 2, "mp": 4}
    np.testing.assert_allclose(losses_tp, losses_1, rtol=2e-2)
    # kernels really are mp-sharded after stepping
    mp_leaves = [p for p in jax.tree_util.tree_leaves(task_tp.state.params)
                 if hasattr(p, "sharding") and "mp" in (p.sharding.spec or ())]
    assert len(mp_leaves) >= 4, len(mp_leaves)


def test_ns_cli_train_multi_gpu(tmp_path):
    """egs/ns/main.py --action train with a tiny conf (multi_gpu: true,
    grad_accum: 2) runs the full recipe path on the 8-virtual-device mesh
    and writes a checkpoint (VERDICT r2 item 1's CLI-level criterion).

    Runs in a SUBPROCESS: in-process it aborts the interpreter when run
    after ~180 other tests (accumulated XLA-CPU process state; passes
    standalone) — isolation keeps the check and the suite stable."""
    import subprocess
    import sys as _sys

    man = _make_ns_data(tmp_path)
    conf = tmp_path / "conf.yaml"
    conf.write_text(f"""
DATASET:
  sample_rate: {SR}
  max_length: 1
  train: {man}
  dev: {man}
  eval:
  noise_folder:
  rir_folder:
  rir_mode:
  speed_perturbed: False
  vol_perturbed:
MODEL:
  type: ns_dpcrn_v0_causal
LOSS:
  sig_loss: sisnr
  alpha: 10.0
OPTIMIZER:
  lr: 0.001
  beta1: 0.9
  beta2: 0.999
  weight_decay: 0.0
  lr_scheduler: Plateau
  gamma: 0.5
  patience: 2
  mode: min
  num_epochs_decay: 0
  gradiend_clip: 10.0
  multi_rate: False
TRAIN:
  batch_size: 4
  num_epochs: 1
  resume_epoch:
  multi_gpu: True
  grad_accum: 2
  mixed_precision: False
  num_workers: 0
  use_tensorboard: False
  model_save_dir: {tmp_path}/ckpt
  log_dir: {tmp_path}/log
  contrastive_learning: False
  seed: 0
""")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    # root-caused flake (round-4): under full-suite memory pressure the
    # subprocess was observed ABORTING DURING INTERPRETER TEARDOWN after
    # training completed and the checkpoint was written (XLA-CPU client
    # destructor class). os._exit(0) after a successful run skips
    # teardown entirely, so the abort can't fire — no retry needed.
    driver = (
        "import os, sys, runpy\n"
        f"sys.argv = [{os.path.join(repo, 'egs', 'ns', 'main.py')!r}, "
        f"{str(conf)!r}, '--action', 'train', '--backend', 'cpu']\n"
        f"runpy.run_path(sys.argv[0], run_name='__main__')\n"
        "sys.stdout.flush(); sys.stderr.flush(); os._exit(0)\n")
    r = subprocess.run(
        [_sys.executable, "-c", driver],
        capture_output=True, text=True, timeout=1200, cwd=repo, env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Data-parallel training over 8x1 device mesh" in r.stdout
    assert os.path.isfile(str(tmp_path / "ckpt" / "epoch_0.ckpt"))


def test_ns_training_loop_device_augment(tmp_path, rng):
    """NsTask with DATASET.augment_on_device: RIR/noise run inside the
    jitted step (src/augment_jax); the loop still optimizes."""
    from scipy.io import wavfile

    man = _make_ns_data(tmp_path)
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    wavfile.write(noise_dir / "n0.wav", SR,
                  (rng.standard_normal(SR) * 3000).astype(np.int16))
    ds = NsDataset(man, resample_to=SR, max_length=1)  # host: decode+crop
    loader = DataLoader(ds, batch_size=3, shuffle=True,
                        collate_fn=NsCollateFunc())
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    hp = _hparam(tmp_path, extra={"DATASET": {
        "augment_on_device": True, "noise_folder": str(noise_dir),
        "rir_folder": None, "rir_mode": None, "vol_perturbed": None}})
    task = NsTask(hp, model, init_fn, "cpu", loader, loader)
    assert task.device_augmentor.noise_bank is not None
    loss0 = task.train_one_epoch(0)["total_loss"]
    for _ in range(3):
        loss1 = task.train_one_epoch(0)["total_loss"]
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0


def test_tse_training_loop_device_augment(tmp_path, rng):
    """TseTask with DATASET.augment_on_device: device augmentation with
    inactive-target + enrollment volume coupling through the real step."""
    from scipy.io import wavfile

    from puresound_tpu.nnet.base_nn import SoTaskWrapModule
    from puresound_tpu.nnet.conv_tasnet import TCN
    from puresound_tpu.nnet.encoder import FreeEncDec
    from puresound_tpu.nnet.lobe.cnn import Conv1d
    from puresound_tpu.nnet.lobe.pooling import AttentiveStatisticsPooling
    from puresound_tpu.nnet.loss.sdr import SDRLoss
    from puresound_tpu.nnet.skim import SkiM

    man = _make_tse_data(tmp_path)
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    wavfile.write(noise_dir / "n0.wav", SR,
                  (rng.standard_normal(SR) * 3000).astype(np.int16))
    ds = TseDataset(man, resample_to=SR, max_length=1, single_spk_pb=0.0,
                    inactive_training=0.5)  # host: decode/crop/enroll only
    loader = DataLoader(ds, batch_size=4, shuffle=True,
                        collate_fn=TseCollateFunc(), drop_last=True)

    model = SoTaskWrapModule(
        encoder=FreeEncDec(win_length=16, hop_length=8, laten_length=24,
                           output_active=True),
        masker=SkiM(input_size=24, hidden_size=16, output_size=24, n_blocks=2,
                    seg_size=20, causal=True, embed_dim=8, embed_norm=True,
                    embed_fusion="FiLM", block_with_embed=(1, 1)),
        speaker_net=(TCN(24, 16, 3, dilation=1, causal=False, tcn_norm="gLN",
                         dconv_norm="gGN"),
                     AttentiveStatisticsPooling(24, 16),
                     Conv1d(48, 8, 1, use_bias=False)),
        loss_func_wav=SDRLoss.init_mode("sisnr"),
        mask_constraint="ReLU")

    def init_fn():
        x = jnp.zeros((2, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=x,
                          ref_clean=x, train=False)

    hp = _hparam(tmp_path, extra={"DATASET": {
        "augment_on_device": True, "noise_folder": str(noise_dir),
        "rir_folder": None, "rir_mode": None,
        "vol_perturbed": (0.6, 1.0)}})
    task = TseTask(hp, model, init_fn, "cpu", loader, loader)
    assert task.device_augmentor.noise_bank is not None
    loss = task.train_one_epoch(0)["total_loss"]
    assert np.isfinite(loss)

    # PVAD guard
    hp_vad = _hparam(tmp_path, extra={"DATASET": {
        "type": "pvad", "augment_on_device": True,
        "noise_folder": str(noise_dir)}})
    with pytest.raises(ValueError, match="PVAD"):
        TseTask(hp_vad, model, init_fn, "cpu", loader, loader)


def test_deferred_metric_sink_order_and_flush():
    """The pipelined metric fetch (tasks/base.DeferredMetricSink) consumes
    every pushed step exactly once, in push order, one step late."""
    from puresound_tpu.tasks.base import DeferredMetricSink

    seen = []
    sink = DeferredMetricSink(lambda ctx, m: seen.append((ctx, m)))
    for k in range(5):
        sink.push(k, {"loss": float(k)})
        # consumption trails dispatch by exactly one step
        assert len(seen) == k
    sink.flush()
    assert seen == [(k, {"loss": float(k)}) for k in range(5)]
    sink.flush()  # idempotent
    assert len(seen) == 5


def test_training_loop_logs_every_iteration(tmp_path, capsys):
    """Deferred fetch must not drop or reorder the per-iteration loss lines
    (reference prints one line per iter: puresound/task/base.py)."""
    man = _make_ns_data(tmp_path)
    ds = NsDataset(man, resample_to=SR, max_length=1)
    loader = DataLoader(ds, batch_size=2, shuffle=False,
                        collate_fn=NsCollateFunc())
    model = _small_ns_model()

    def init_fn():
        x = jnp.zeros((1, SR))
        return model.init(jax.random.PRNGKey(0), noisy=x, enroll=None,
                          ref_clean=x, train=False)

    task = NsTask(_hparam(tmp_path), model, init_fn, "cpu", loader, loader)
    out = task.train_one_epoch(0)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("epoch: 0, iter:")]
    n_batches = len(list(loader))
    assert len(lines) == n_batches
    iters = [int(ln.split("iter: ")[1].split(",")[0]) for ln in lines]
    assert iters == list(range(1, n_batches + 1))
    # the epoch average equals the mean of the logged per-step losses
    logged = [float(ln.split("batch_loss: ")[1]) for ln in lines]
    assert abs(out["total_loss"] - sum(logged) / len(logged)) < 1e-3

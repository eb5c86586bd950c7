"""Multi-host (multi-process) data parallelism tests.

Library level: process-sharded DataLoader slicing. System level: two
subprocesses (2 virtual CPU devices each, Gloo collectives) run the NS
recipe CLI in lockstep over the 4-device global mesh and must match a
single-process 4-device run with the same seed. Reference capability
anchor: the reference tops out at single-machine DataParallel
(puresound/task/base.py:226-229) — multi-host is beyond it.
"""
import os
import re
import subprocess
import sys

import numpy as np

from puresound_tpu.tasks.base import DataLoader


def test_dataloader_shard_slices():
    """Sharded loaders slice the identical global batch order: process
    slices concatenate to the unsharded batches, ragged final global batch
    wraparound-padded so every process steps in lockstep."""
    ds = list(range(10))
    full = DataLoader(ds, batch_size=4, shuffle=True, seed=3, prefetch=0)
    p0 = DataLoader(ds, batch_size=4, shuffle=True, seed=3, shard=(0, 2),
                    prefetch=0)
    p1 = DataLoader(ds, batch_size=4, shuffle=True, seed=3, shard=(1, 2),
                    prefetch=0)
    fb, b0, b1 = list(iter(full)), list(iter(p0)), list(iter(p1))
    assert len(fb) == len(b0) == len(b1) == 3
    for k in range(2):
        assert len(b0[k]) == len(b1[k]) == 2
        assert b0[k] + b1[k] == fb[k]
    # final global batch has 2 items -> padded to 4 by wraparound
    last = b0[2] + b1[2]
    assert len(last) == 4 and set(last) == set(fb[2])
    # epoch 2 re-shuffles identically across loaders
    fb2, b02, b12 = list(iter(full)), list(iter(p0)), list(iter(p1))
    assert fb2 != fb and b02[0] + b12[0] == fb2[0]


def test_dataloader_shard_validation():
    ds = list(range(8))
    try:
        DataLoader(ds, batch_size=4, shuffle=True, shard=(0, 2))
        assert False, "sharded shuffle without seed must raise"
    except ValueError:
        pass
    try:
        DataLoader(ds, batch_size=5, seed=0, shard=(0, 2))
        assert False, "batch_size % world != 0 must raise"
    except ValueError:
        pass


def _write_conf(path, manifest, workdir):
    path.write_text(f"""
DATASET:
  sample_rate: 8000
  max_length: 1
  train: {manifest}
  dev: {manifest}
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
  mixed_precision: False
  num_workers: 0
  use_tensorboard: False
  model_save_dir: {workdir}/ckpt
  log_dir: {workdir}/log
  contrastive_learning: False
  seed: 0
""")


def _losses(stdout: str):
    return [float(x) for x in re.findall(r"batch_loss: ([0-9.]+)", stdout)]


def test_ns_cli_train_multihost(tmp_path):
    """2 processes x 2 virtual devices == 1 process x 4 virtual devices:
    identical per-step train losses (same seed => same global batches; the
    all-reduce spans processes), checkpoint written by the primary only."""
    from test_tasks import _make_ns_data

    man = _make_ns_data(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = str(tmp_path / "jax_cache")
    main_py = os.path.join(repo, "egs", "ns", "main.py")
    port = 13000 + os.getpid() % 2000

    for d in ("mh", "single"):
        os.makedirs(tmp_path / d, exist_ok=True)
        _write_conf(tmp_path / d / "conf.yaml", man, tmp_path / d)

    def env(n_dev):
        return dict(os.environ, JAX_PLATFORMS="cpu",
                    XLA_FLAGS=f"--xla_force_host_platform_device_count={n_dev}",
                    JAX_COMPILATION_CACHE_DIR=cache)

    # one retry for the XLA-CPU late-abort class (see
    # test_tasks.test_ns_cli_train_multi_gpu)
    for attempt in range(2):
        procs = [subprocess.Popen(
            [sys.executable, main_py, str(tmp_path / "mh" / "conf.yaml"),
             "--action", "train", "--backend", "cpu",
             "--coordinator", f"localhost:{port + attempt}",
             "--num_processes", "2", "--process_id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env(2)) for i in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=1200)
                outs.append(out)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        if all(p.returncode == 0 for p in procs):
            break
    assert all(p.returncode == 0 for p in procs), outs[0][-2000:] + outs[1][-2000:]

    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert len(l0) == 2 and l0 == l1, (l0, l1)
    # primary-only checkpoint: written once, loadable
    assert os.path.isfile(tmp_path / "mh" / "ckpt" / "epoch_0.ckpt")

    r = subprocess.run(
        [sys.executable, main_py, str(tmp_path / "single" / "conf.yaml"),
         "--action", "train", "--backend", "cpu"],
        capture_output=True, text=True, timeout=1200, cwd=repo, env=env(4))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    ls = _losses(r.stdout)
    np.testing.assert_allclose(l0, ls, rtol=2e-3)

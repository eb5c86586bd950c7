"""Multiprocess DataLoader tests: worker-pool correctness, shared-memory
handoff, seed determinism (worker-count invariance), and throughput of the
augmentation chain (round-1 verdict item 5; reference counterpart: torch
DataLoader workers, puresound/task/base.py via egs/tse/main.py:93-133)."""
import os
import time

import numpy as np
import pytest

from puresound_tpu.src.audio import AudioIO
from puresound_tpu.tasks.base import DataLoader
from puresound_tpu.tasks.ns import NsCollateFunc, NsDataset

SR = 8000


@pytest.fixture
def ns_manifest(tmp_path):
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir, exist_ok=True)
    noise_dir = tmp_path / "noise"
    os.makedirs(noise_dir, exist_ok=True)
    lines_scp, lines_ref = [], []
    for i in range(8):
        clean = (0.2 * np.sin(2 * np.pi * 220 * (i + 1) / SR
                              * np.arange(SR))).astype(np.float32)
        noisy = clean + 0.05 * rng.standard_normal(SR).astype(np.float32)
        cpath = str(wav_dir / f"clean_{i}.wav")
        npath = str(wav_dir / f"noisy_{i}.wav")
        AudioIO.save(clean.reshape(1, -1), cpath, SR)
        AudioIO.save(noisy.reshape(1, -1), npath, SR)
        lines_scp.append(f"utt{i} {npath}")
        lines_ref.append(f"utt{i} {cpath}")
    for j in range(2):
        noise = 0.1 * rng.standard_normal(SR).astype(np.float32)
        AudioIO.save(noise.reshape(1, -1), str(noise_dir / f"n{j}.wav"), SR)
    man = tmp_path / "manifest"
    os.makedirs(man, exist_ok=True)
    (man / "wav2scp.txt").write_text("\n".join(lines_scp) + "\n")
    (man / "wav2ref.txt").write_text("\n".join(lines_ref) + "\n")
    return str(man), str(noise_dir)


def _augmented_ds(ns_manifest):
    man, noise = ns_manifest
    return NsDataset(folder=man, resample_to=SR, max_length=1,  # seconds
                     noise_folder=noise, vol_perturbed=(0.5, 1.5),
                     speed_perturbed=True, perturb_frequency_response=True)


def _collect(loader):
    return [b for b in loader]


def test_multiprocess_matches_inprocess_with_seed(ns_manifest):
    """Same seed -> identical batches for num_workers 0 and 2 (the per-batch
    RNG discipline makes augmentation worker-count invariant)."""
    ds = _augmented_ds(ns_manifest)
    kw = dict(batch_size=2, shuffle=True, collate_fn=NsCollateFunc(), seed=123)
    b0 = _collect(DataLoader(ds, num_workers=0, prefetch=0, **kw))
    b2 = _collect(DataLoader(ds, num_workers=2, **kw))
    assert len(b0) == len(b2) == 4
    for x, y in zip(b0, b2):
        assert sorted(x.keys()) == sorted(y.keys())
        for k in x:
            if isinstance(x[k], np.ndarray):
                np.testing.assert_array_equal(x[k], y[k])
            else:
                assert x[k] == y[k]


def test_epochs_differ_but_are_reproducible(ns_manifest):
    ds = _augmented_ds(ns_manifest)
    kw = dict(batch_size=2, shuffle=True, collate_fn=NsCollateFunc(), seed=7)
    loader = DataLoader(ds, num_workers=2, **kw)
    e1 = _collect(loader)
    e2 = _collect(loader)  # second epoch: different shuffle/augmentation
    assert any(not np.array_equal(a["process_wav"], b["process_wav"])
               for a, b in zip(e1, e2))
    # a fresh loader with the same seed reproduces epoch 1 exactly
    e1b = _collect(DataLoader(ds, num_workers=2, **kw))
    for a, b in zip(e1, e1b):
        np.testing.assert_array_equal(a["process_wav"], b["process_wav"])


def test_worker_exception_propagates(ns_manifest):
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return {"x": np.zeros(4, np.float32)}

    loader = DataLoader(Boom(), batch_size=1, num_workers=2,
                        collate_fn=lambda items: items[0])
    with pytest.raises(RuntimeError, match="boom"):
        _collect(loader)


def test_order_preserved_under_uneven_work(ns_manifest):
    """Batches must come back in submission order even when early batches
    are slower than later ones."""

    class Skewed:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i < 2:
                time.sleep(0.2)
            return {"i": np.array([i])}

    loader = DataLoader(Skewed(), batch_size=1, num_workers=3,
                        collate_fn=lambda items: items[0])
    got = [int(b["i"][0]) for b in loader]
    assert got == list(range(8))


def test_augment_chain_throughput(ns_manifest):
    """The full augmentation chain (speed + noise + freq-response + vol)
    through the worker pool must sustain a realistic train-step rate.
    This box has 1 core, so assert against the measured per-item cost
    rather than wall-clock parallel speedup: loader overhead (IPC + shm)
    must stay under 3x the raw __getitem__+collate cost."""
    ds = _augmented_ds(ns_manifest)
    cf = NsCollateFunc()
    t0 = time.perf_counter()
    for _ in range(2):
        for i in range(0, len(ds), 2):
            cf([ds[i], ds[i + 1]])
    raw = (time.perf_counter() - t0) / 2

    loader = DataLoader(ds, batch_size=2, collate_fn=cf, num_workers=2, seed=1)
    _collect(loader)  # warm-up epoch (fork + import cost)
    t0 = time.perf_counter()
    n = len(_collect(loader))
    looped = time.perf_counter() - t0
    assert n == 4
    assert looped < 3.0 * raw + 0.5, (looped, raw)

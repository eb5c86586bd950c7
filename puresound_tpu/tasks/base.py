"""Training runtime: logging, LR scheduling, Kaldi-manifest datasets, a
host-side data loader, and the jit/pjit-based trainer.

Parity: puresound/task/base.py (TensorboardWriter :13,
LearningRateScheduler :66, TaskDataset :104, BaseTrainer :195). TPU-first
differences:
- one jitted train step (loss + grad + adam) built by parallel.make_train_step,
  optionally sharded over a (dp, mp) mesh — replaces torch DataParallel
- checkpoints are msgpack'd pytrees (params + batch_stats + optimizer state
  + schedule bookkeeping); the reference only saved weights and lr
- the data pipeline is host-side numpy with thread prefetch; the device only
  sees fixed-shape padded batches
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import queue
import random
import threading
import traceback
from multiprocessing import shared_memory
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from ..src.utils import create_folder, load_text_as_dict


# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------

class TensorboardWriter:
    """TensorBoard logger (falls back to JSONL when tensorboard is absent)."""

    def __init__(self, logging_path: str):
        create_folder(logging_path)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tf_writer = SummaryWriter(log_dir=logging_path)
        except Exception:
            self.tf_writer = None
        self._jsonl = open(os.path.join(logging_path, "metrics.jsonl"), "a")

    def _log(self, kind, name, value, step):
        self._jsonl.write(json.dumps(
            {"kind": kind, "name": name, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()

    def update_ep_lr(self, lr: float, epoch: int) -> None:
        if self.tf_writer:
            self.tf_writer.add_scalar("learning_rate", lr, epoch)
        self._log("scalar", "learning_rate", lr, epoch)

    def update_ep_loss(self, name: str, loss: Any, epoch: int) -> None:
        if self.tf_writer:
            self.tf_writer.add_scalar(name, float(loss), epoch)
        self._log("scalar", name, loss, epoch)

    def update_step_loss(self, name: str, loss: Any, step: int) -> None:
        if self.tf_writer:
            self.tf_writer.add_scalar(name, float(loss), step)
        self._log("scalar", name, loss, step)

    def add_ep_picture(self, name: str, pic: Any, epoch: int, log: bool = True) -> None:
        if self.tf_writer is None:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pic = np.asarray(pic)
        if log:
            pic = np.log10(np.maximum(pic, 1e-12))
        if pic.ndim == 3:
            pic = pic[0]
        fig = plt.figure()
        plt.imshow(pic, origin="lower")
        self.tf_writer.add_figure(name, fig, epoch)
        plt.close(fig)

    def add_ep_audio(self, name: str, audio: Any, epoch: int, sr: int = 16000) -> None:
        if self.tf_writer is None:
            return
        import torch

        audio = np.asarray(audio)
        if audio.ndim == 3:
            audio = audio[0]
        self.tf_writer.add_audio(name, torch.from_numpy(np.asarray(audio)), epoch, sr)

    def update_ep_metric(self, **kwargs) -> None:
        if self.tf_writer:
            self.tf_writer.add_scalar(**kwargs)
        self._log("scalar", kwargs.get("tag", "metric"),
                  kwargs.get("scalar_value", 0.0), kwargs.get("global_step", 0))


# ---------------------------------------------------------------------------
# LR scheduling (host-side; the value is injected into optax each epoch)
# ---------------------------------------------------------------------------

class LearningRateScheduler:
    """stepLR (decay every `patience` steps) or Plateau (decay after
    `patience` epochs without improvement). Host-side state machine; call
    step() per epoch and read .lr."""

    def __init__(self, type: str, base_lr: float, gamma: float = 0.5,
                 patience: int = 3, mode: str = "min"):
        if type not in ("stepLR", "Plateau"):
            raise NotImplementedError(type)
        self.type = type
        self.lr = base_lr
        self.gamma = gamma
        self.patience = patience
        self.mode = mode
        self._step_count = 0
        self._best = np.inf if mode == "min" else -np.inf
        self._bad_epochs = 0

    def step(self, loss: Optional[float] = None) -> float:
        if self.type == "stepLR":
            self._step_count += 1
            if self._step_count % self.patience == 0:
                self.lr *= self.gamma
        else:
            assert loss is not None, "Plateau scheduler needs the dev loss"
            improved = (loss < self._best) if self.mode == "min" else (loss > self._best)
            if improved:
                self._best = loss
                self._bad_epochs = 0
            else:
                self._bad_epochs += 1
                if self._bad_epochs > self.patience:
                    self.lr *= self.gamma
                    self._bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict:
        return {"lr": self.lr, "step_count": self._step_count,
                "best": float(self._best), "bad_epochs": self._bad_epochs}

    def load_state_dict(self, d: Dict) -> None:
        self.lr = d["lr"]
        self._step_count = d["step_count"]
        self._best = d["best"]
        self._bad_epochs = d["bad_epochs"]


# ---------------------------------------------------------------------------
# Datasets / loader
# ---------------------------------------------------------------------------

class TaskDataset:
    """Kaldi-style manifest dataset (wav2scp.txt is mandatory; subclasses
    declare extra files via folder_content)."""

    def __init__(self, folder: str, resample_to: Optional[int] = None):
        self.folder = folder
        self.resample_to = resample_to
        self.df = self._load_df(folder)
        self.idx_df = {i: k for i, k in enumerate(self.df.keys())}

    def __len__(self):
        return len(self.idx_df)

    def __getitem__(self, index):
        raise NotImplementedError

    def get_feature(self, key: str):
        raise NotImplementedError

    @property
    def folder_content(self) -> Dict[str, str]:
        return {"wav2scp": "wav2scp.txt"}

    def _load_df(self, folder: str) -> Dict:
        content = dict(self.folder_content)
        scp_path = os.path.join(folder, content.pop("wav2scp"))
        if not os.path.isfile(scp_path):
            raise FileNotFoundError(f"{scp_path} is not found")
        df: Dict[str, Dict] = {}
        wav2scp = load_text_as_dict(scp_path)
        for key in sorted(wav2scp.keys()):
            df[key] = {"wav2scp": wav2scp[key][0]}
        for name, fname in content.items():
            fpath = os.path.join(folder, fname)
            if not os.path.isfile(fpath):
                raise FileNotFoundError(f"{fpath} is not found")
            temp = load_text_as_dict(fpath)
            for key in sorted(temp.keys()):
                if key not in df:
                    print(f"Non match key {key}")
                    continue
                val = temp[key] if len(temp[key]) != 1 else temp[key][0]
                df[key][name] = val
        return df

    @staticmethod
    def to_onehot(y: int, num_classes: int) -> np.ndarray:
        out = np.zeros(num_classes, np.float32)
        out[y] = 1.0
        return out


def _batch_to_shm(batch):
    """Serialize a collated batch for cross-process handoff.

    numpy arrays are copied into one shared-memory block (no pipe pickling
    of the bulk audio data); everything else rides the queue pickled.
    """
    if not isinstance(batch, dict):
        return ("pickle", batch)
    arrays: Dict[str, np.ndarray] = {}
    others: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.nbytes > 0:
            arrays[k] = np.ascontiguousarray(v)
        else:
            others[k] = v
    if not arrays:
        return ("pickle", batch)
    total = sum(a.nbytes for a in arrays.values())
    shm = shared_memory.SharedMemory(create=True, size=total)
    meta = {}
    off = 0
    for k, a in arrays.items():
        view = np.ndarray(a.shape, a.dtype, buffer=shm.buf, offset=off)
        view[...] = a
        meta[k] = (off, a.shape, a.dtype.str)
        off += a.nbytes
    name = shm.name
    # The consumer unlinks; stop this process's resource tracker from
    # unlinking it again at worker exit (no `track=` kwarg before 3.13).
    try:
        from multiprocessing import resource_tracker

        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    shm.close()
    return ("shm", name, meta, others)


def _batch_from_shm(payload):
    if payload[0] == "pickle":
        return payload[1]
    _, name, meta, others = payload
    shm = shared_memory.SharedMemory(name=name)
    out = dict(others)
    for k, (off, shape, dt) in meta.items():
        out[k] = np.ndarray(shape, np.dtype(dt), buffer=shm.buf, offset=off).copy()
    shm.close()
    shm.unlink()
    return out


def _worker_loop(dataset, collate_fn, task_q, result_q):
    """Worker process: pull (seq, indices, seed) tasks, push collated
    batches via shared memory."""
    while True:
        task = task_q.get()
        if task is None:
            break
        seq, indices, batch_seed = task
        try:
            if batch_seed is not None:
                random.seed(batch_seed)
                np.random.seed(batch_seed % (2**32))
            batch = collate_fn([dataset[i] for i in indices])
            result_q.put(("ok", seq, _batch_to_shm(batch)))
        except BaseException:
            result_q.put(("err", seq, traceback.format_exc()))
            break


class DataLoader:
    """Host-side loader: shuffling, batching (or batch_sampler), collate,
    and prefetch.

    num_workers == 0: single background prefetch thread (GIL-bound — fine
    for light pipelines).  num_workers > 0: a pool of fork'd worker
    processes builds batches in parallel and hands the collated numpy
    arrays over through POSIX shared memory (reference counterpart:
    torch DataLoader workers feeding the sox/RIR-heavy augmentation chain,
    puresound/task/base.py usage at egs/tse/main.py:93-133).

    `seed` makes augmentation deterministic per (epoch, batch) REGARDLESS
    of num_workers: every batch is built under an RNG seeded from
    (seed, epoch, batch_index), so a run is reproducible and worker-count
    invariant — stronger than the reference's torch semantics.

    When `seed` is None a fresh random base seed is drawn per loader, and
    every batch still reseeds from (base, epoch, batch_index): runs stay
    non-reproducible, but fork'd workers never share duplicated global RNG
    state (without this, all workers would inherit identical random/
    np.random streams from the parent and draw correlated augmentation
    parameters — torch avoids it by seeding each worker base_seed+id).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 collate_fn: Optional[Callable] = None, num_workers: int = 0,
                 batch_sampler=None, drop_last: bool = False,
                 prefetch: int = 2, seed: Optional[int] = None,
                 shard: Optional[tuple] = None):
        """shard=(process_id, n_processes) makes this loader one process's
        slice of a MULTI-PROCESS run (parallel/multihost.py): `batch_size`
        becomes the GLOBAL batch size, every process computes the identical
        global batch order (requires `seed` when shuffling) and yields only
        its contiguous `batch_size / n_processes` rows — the global batch is
        re-assembled on device in process order by mesh.shard_batch. Ragged
        final batches are wraparound-padded so every process steps in
        lockstep. Per-item augmentation draws are deterministic per
        (seed, epoch, batch, process) but differ from the single-process
        draw sequence."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn or (lambda x: x)
        self.num_workers = num_workers
        self.batch_sampler = batch_sampler
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.shard = shard
        if shard is not None:
            rank, world = shard
            if batch_sampler is not None:
                raise ValueError("shard= is incompatible with batch_sampler")
            if shuffle and seed is None:
                raise ValueError("sharded loading requires seed= so every "
                                 "process shuffles identically")
            if batch_size % world:
                raise ValueError(f"batch_size {batch_size} must divide by "
                                 f"n_processes {world}")
            assert 0 <= rank < world
        # anti-correlation base for unseeded runs (see class docstring)
        self._auto_base = random.getrandbits(63)
        self._epoch = 0

    def _batches(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
            return
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            if self.seed is not None:
                random.Random(self.seed + 7919 * self._epoch).shuffle(idx)
            else:
                random.shuffle(idx)
        for i in range(0, len(idx), self.batch_size):
            b = idx[i : i + self.batch_size]
            if len(b) < self.batch_size:
                if self.drop_last:
                    continue
                if self.shard is not None:  # lockstep: pad, never ragged
                    b = (b * ((self.batch_size - 1) // len(b) + 1)
                         )[: self.batch_size]
            if self.shard is not None:
                rank, world = self.shard
                per = self.batch_size // world
                b = b[rank * per : (rank + 1) * per]
            yield b

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_seed(self, seq: int) -> int:
        base = self._auto_base if self.seed is None else self.seed
        return (base * 1_000_003 + self._epoch * 7919 + seq) % (2**63)

    def _make(self, indices, seq: int):
        s = self._batch_seed(seq)
        random.seed(s)
        np.random.seed(s % (2**32))
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self):
        self._epoch += 1
        if self.num_workers > 0:
            yield from self._iter_multiprocess()
        elif self.prefetch <= 0:
            for seq, b in enumerate(self._batches()):
                yield self._make(b, seq)
        else:
            yield from self._iter_thread()

    def _iter_thread(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []

        def worker():
            try:
                for seq, b in enumerate(self._batches()):
                    q.put(self._make(b, seq))
            except BaseException as e:  # surface worker failures to the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item

    def _iter_multiprocess(self):
        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        workers = [ctx.Process(target=_worker_loop,
                               args=(self.dataset, self.collate_fn, task_q, result_q),
                               daemon=True)
                   for _ in range(self.num_workers)]
        for w in workers:
            w.start()

        batches = enumerate(self._batches())
        max_outstanding = self.num_workers + max(self.prefetch, 1)
        outstanding = 0
        dispatched_all = False
        pending: Dict[int, Any] = {}
        next_seq = 0

        def dispatch_one():
            nonlocal outstanding, dispatched_all
            try:
                seq, b = next(batches)
            except StopIteration:
                dispatched_all = True
                return
            task_q.put((seq, list(b), self._batch_seed(seq)))
            outstanding += 1

        try:
            while not dispatched_all and outstanding < max_outstanding:
                dispatch_one()
            while outstanding > 0:
                while True:
                    try:
                        status, seq, payload = result_q.get(timeout=30.0)
                        break
                    except queue.Empty:
                        # surface hard-killed workers (OOM) instead of
                        # blocking on the queue forever
                        dead = [w for w in workers if not w.is_alive()]
                        if dead:
                            raise RuntimeError(
                                f"{len(dead)} DataLoader worker(s) died "
                                f"(exitcodes {[w.exitcode for w in dead]}) "
                                "with results outstanding")
                outstanding -= 1
                if status == "err":
                    raise RuntimeError(f"DataLoader worker failed:\n{payload}")
                pending[seq] = payload
                while next_seq in pending:
                    batch = _batch_from_shm(pending.pop(next_seq))
                    next_seq += 1
                    yield batch
                if not dispatched_all:
                    dispatch_one()
        finally:
            for _ in workers:
                task_q.put(None)
            for w in workers:
                w.join(timeout=2.0)
                if w.is_alive():
                    w.terminate()
            # drain results still in flight (early generator close / error)
            # so their shm blocks are released too — the workers
            # unregistered them from the resource tracker, so nothing else
            # would ever unlink them
            while True:
                try:
                    status, seq, payload = result_q.get_nowait()
                except queue.Empty:
                    break
                if status == "ok":
                    pending[seq] = payload
            for payload in pending.values():
                try:
                    _batch_from_shm(payload)
                except Exception:
                    pass


def pad_stack(seqs: List[np.ndarray]) -> np.ndarray:
    """Zero-pad 1-D arrays to the max length and stack -> [N, L]."""
    L = max(s.shape[-1] for s in seqs)
    out = np.zeros((len(seqs), L), np.float32)
    for i, s in enumerate(seqs):
        out[i, : s.shape[-1]] = s.reshape(-1)
    return out


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class DeferredMetricSink:
    """Fetch per-step device metrics one step behind dispatch.

    Calling ``float(metrics["loss"])`` right after a train-step dispatch
    blocks the host on the step still running on the chip: the host can
    neither prepare batch k+1 while the device runs step k, nor (on a
    remote/tunneled device) avoid paying a full readback round-trip per
    step. Holding the device arrays for one step and fetching them only
    after the NEXT step has been dispatched keeps the logged values,
    their order, and the epoch averages bit-identical while letting
    dispatch stay fully asynchronous — the device pipeline never drains.

    The reference trainer prints a loss line per iteration
    (/root/reference/puresound/task/base.py:300-316); this keeps that
    logging surface, one step later in wall time.

    Usage::

        sink = DeferredMetricSink(consume)   # consume(ctx, metrics)
        for ...:
            state, metrics = train_step(...)
            sink.push(ctx, metrics)          # fetches the PREVIOUS step
        sink.flush()                         # fetches the last one
    """

    def __init__(self, consume):
        self._consume = consume
        self._pending = None

    def push(self, ctx, metrics):
        prev = self._pending
        self._pending = (ctx, metrics)
        if prev is not None:
            self._consume(*prev)

    def flush(self):
        if self._pending is not None:
            prev = self._pending
            self._pending = None
            self._consume(*prev)


class BaseTrainer:
    """Epoch-driven trainer around one jitted (optionally mesh-sharded)
    train step.

    Subclasses implement build_model() (set self.model and loss callables)
    and the batch->kwargs mapping. Checkpoints include optimizer state and
    scheduler bookkeeping (full resume, unlike the reference which restores
    only weights + lr).
    """

    def __init__(self, hparam: Dict, device_backend: str = "tpu"):
        import jax

        self.hparam = hparam
        self.best_loss = np.inf
        self.best_epoch = np.inf
        self.overall_step = 0

        if device_backend.lower() == "cpu":
            jax.config.update("jax_platforms", "cpu")
        self.devices = jax.devices()

        self.build_model()
        self.build_optim()

        if hparam["TRAIN"].get("use_tensorboard") and self._is_primary():
            create_folder(hparam["TRAIN"]["log_dir"])
            self.tf_writer = TensorboardWriter(hparam["TRAIN"]["log_dir"])
        else:
            self.tf_writer = None

    @staticmethod
    def _is_primary() -> bool:
        """Host-side I/O owner: process 0 of a multi-process run (always
        true single-process). Checkpoints, TensorBoard, and eval-audio
        logging run on the primary only (parallel/multihost.py)."""
        import jax

        return jax.process_index() == 0

    # ------------------------------------------------------------- builders
    def build_model(self):
        raise NotImplementedError

    def lr_factors(self) -> Optional[Dict[str, float]]:
        """Optional per-submodule LR factors (e.g. encoder 0.1)."""
        return None

    def _make_tx(self):
        import optax

        opt = self.hparam["OPTIMIZER"]
        adam = optax.chain(
            optax.add_decayed_weights(opt.get("weight_decay", 0.0) or 0.0),
            optax.scale_by_adam(b1=opt.get("beta1", 0.9), b2=opt.get("beta2", 0.999)),
        )
        factors = self.lr_factors() if self.hparam["OPTIMIZER"].get("multi_rate") else None
        if factors:
            def scale_fn(path, update):
                top = path[0].key if hasattr(path[0], "key") else str(path[0])
                for prefix, f in factors.items():
                    if top.startswith(prefix):
                        return update * f
                return update

            def per_module_scale():
                def update_fn(updates, state, params=None):
                    import jax

                    new = jax.tree_util.tree_map_with_path(scale_fn, updates)
                    return new, state
                import optax as _o

                return _o.GradientTransformation(lambda p: _o.EmptyState(), update_fn)

            adam = optax.chain(adam, per_module_scale())
        return optax.chain(adam, optax.scale(-1.0))

    def build_optim(self):
        import jax
        import jax.numpy as jnp
        import optax

        from ..parallel.mesh import TrainState

        opt = self.hparam["OPTIMIZER"]
        self.scheduler = LearningRateScheduler(
            opt["lr_scheduler"], base_lr=opt["lr"], gamma=opt.get("gamma", 0.5),
            patience=opt.get("patience", 3), mode=opt.get("mode", "min"))

        # learning rate injected so the scheduler can update it without
        # rebuilding/recompiling the step
        def make(learning_rate):
            return optax.chain(self._make_tx(), optax.scale(learning_rate))

        self._tx = optax.inject_hyperparams(make)(
            learning_rate=jnp.asarray(opt["lr"], jnp.float32))

        variables = self.init_variables()
        self.state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}), self._tx)

        resume = self.hparam["TRAIN"].get("resume_epoch")
        if resume:
            print(f"***** Start from {resume} epoch")
            path = os.path.join(self.hparam["TRAIN"]["model_save_dir"],
                                f"epoch_{resume - 1}.ckpt")
            self.load_ckpt(path)

    def init_variables(self):
        raise NotImplementedError

    def set_learning_rate(self, lr: float):
        import jax.numpy as jnp

        self.state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

    @property
    def current_lr(self) -> float:
        return float(self.state.opt_state.hyperparams["learning_rate"])

    # ---------------------------------------------------------- checkpoints
    def _ckpt_tree(self, epoch, loss):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "meta": {
                "epoch": np.asarray(epoch),
                "learning_rate": np.asarray(self.current_lr),
                "loss": np.asarray(loss["total_loss"]),
                "best_loss": np.asarray(self.best_loss),
                "best_epoch": np.asarray(
                    self.best_epoch if np.isfinite(self.best_epoch) else -1),
                "overall_step": np.asarray(self.overall_step),
            },
            "scheduler": {k: np.asarray(v)
                          for k, v in self.scheduler.state_dict().items()},
        }

    def save_ckpt(self, filename: str, epoch: int, loss: Dict) -> None:
        from flax import serialization

        data = serialization.to_bytes(self._ckpt_tree(epoch, loss))
        with open(filename, "wb") as f:
            f.write(data)

    def save_ckpt_info(self, filename: str, epoch: int, learning_rate, loss) -> None:
        with open(filename, "w") as f:
            f.write(f"epoch: {epoch}\n")
            f.write(f"lr: {learning_rate}\n")
            f.write(f"loss: {loss['total_loss']}\n")
            f.write(f"best_epoch: {self.best_epoch}\n")
            f.write(f"best_dev_loss: {self.best_loss}\n")

    def load_ckpt(self, filename: str) -> Tuple[int, float, float]:
        from flax import serialization

        with open(filename, "rb") as f:
            data = f.read()
        target = self._ckpt_tree(0, {"total_loss": 0.0})
        tree = serialization.from_bytes(target, data)
        self.state = self.state.replace(
            params=tree["params"], batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"])
        meta = tree["meta"]
        self.best_loss = float(meta["best_loss"])
        be = float(meta["best_epoch"])
        self.best_epoch = np.inf if be < 0 else be
        self.overall_step = int(meta["overall_step"])
        if "scheduler" in tree:
            self.scheduler.load_state_dict(
                {k: (int(v) if k in ("step_count", "bad_epochs") else float(v))
                 for k, v in tree["scheduler"].items()})
        self.set_learning_rate(float(meta["learning_rate"]))
        return int(meta["epoch"]), float(meta["learning_rate"]), float(meta["loss"])

    @staticmethod
    def load_params_from_ckpt(filename: str, variables: Dict) -> Dict:
        """Eval-time loading: restore params/batch_stats into a freshly
        initialized variable tree (ignores optimizer state)."""
        from flax import serialization

        with open(filename, "rb") as f:
            raw = f.read()
        state_dict = serialization.msgpack_restore(raw)
        out = dict(variables)
        out["params"] = serialization.from_state_dict(
            variables["params"], state_dict["params"])
        if variables.get("batch_stats"):
            out["batch_stats"] = serialization.from_state_dict(
                variables["batch_stats"], state_dict["batch_stats"])
        return out

    @staticmethod
    def resolve_eval_params(hparam: Dict, ckpt_name: str,
                            variables: Dict) -> Dict:
        """Load eval-time params honoring ``TRAIN.model_average``.

        The reference declares ``model_average`` in every config schema
        (reference: egs/tse/TSE.yaml:56, egs/ns/NS.yaml:40) but never reads
        it; here ``model_average: N`` (N > 1) averages the N epoch
        checkpoints ending at ``--ckpt epoch_k.ckpt`` (epochs k-N+1 .. k,
        silently skipping epochs whose file is missing). Any other value —
        or a checkpoint not named ``epoch_<n>.ckpt`` — falls back to a
        plain single-checkpoint load.
        """
        import re

        save_dir = hparam["TRAIN"]["model_save_dir"]
        path = os.path.join(save_dir, ckpt_name)
        n_avg = hparam.get("TRAIN", {}).get("model_average") or 0
        m = re.fullmatch(r"epoch_(\d+)\.ckpt", ckpt_name)
        if int(n_avg) > 1 and m:
            k = int(m.group(1))
            paths = [os.path.join(save_dir, f"epoch_{e}.ckpt")
                     for e in range(max(0, k - int(n_avg) + 1), k + 1)]
            paths = [p for p in paths if os.path.isfile(p)]
            if len(paths) > 1:
                print(f"model_average: averaging {len(paths)} checkpoints "
                      f"ending at {ckpt_name}")
                return BaseTrainer.average_checkpoints(paths, variables)
        return BaseTrainer.load_params_from_ckpt(path, variables)

    @staticmethod
    def average_checkpoints(filenames, variables: Dict) -> Dict:
        """Average the params (and batch_stats) of several checkpoints into
        a fresh variable tree — the TRAIN.model_average option the reference
        declares in its config schema but never implements."""
        import jax
        from flax import serialization

        acc = None
        for fn in filenames:
            with open(fn, "rb") as f:
                sd = serialization.msgpack_restore(f.read())
            part = {"params": sd["params"]}
            if variables.get("batch_stats"):
                part["batch_stats"] = sd["batch_stats"]
            if acc is None:
                acc = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), part)
            else:
                acc = jax.tree_util.tree_map(lambda a, x: a + np.asarray(x, np.float64),
                                             acc, part)
        n = float(len(filenames))
        avg = jax.tree_util.tree_map(lambda a: (a / n).astype(np.float32), acc)
        out = dict(variables)
        out["params"] = serialization.from_state_dict(variables["params"], avg["params"])
        if variables.get("batch_stats"):
            out["batch_stats"] = serialization.from_state_dict(
                variables["batch_stats"], avg["batch_stats"])
        return out

    # -------------------------------------------------------------- running
    def train_one_epoch(self, current_epoch: int) -> Dict:
        raise NotImplementedError

    def compute_dev_loss(self, current_epoch: int) -> Dict:
        raise NotImplementedError

    def gen_logging(self, epoch: Optional[int] = None, prefix: str = ""):
        raise NotImplementedError

    def early_stopping(self, current_epoch: int, stop_criterion: int = 20):
        if current_epoch >= self.best_epoch + stop_criterion:
            raise RuntimeError("Early stopping")

    def train(self):
        num_epochs = self.hparam["TRAIN"]["num_epochs"]
        start = self.hparam["TRAIN"].get("resume_epoch") or 0
        for epoch in range(start, num_epochs):
            lr = self.current_lr
            loss = self.train_one_epoch(current_epoch=epoch)
            dev_loss = self.compute_dev_loss(current_epoch=epoch)

            if dev_loss["total_loss"] <= self.best_loss:
                self.best_loss = dev_loss["total_loss"]
                self.best_epoch = epoch

            if self.tf_writer:
                self.tf_writer.update_ep_lr(lr, epoch)
                self.tf_writer.update_ep_loss("train/avg_loss", loss["total_loss"], epoch)
                self.tf_writer.update_ep_loss("train/avg_dev_loss", dev_loss["total_loss"], epoch)

            if self._is_primary():
                save_dir = self.hparam["TRAIN"]["model_save_dir"]
                create_folder(save_dir)
                self.save_ckpt(os.path.join(save_dir, f"epoch_{epoch}.ckpt"),
                               epoch, loss)
                self.save_ckpt_info(os.path.join(save_dir, f"epoch_{epoch}.info"),
                                    epoch, lr, loss)

            if epoch >= self.hparam["OPTIMIZER"]["num_epochs_decay"]:
                new_lr = self.scheduler.step(
                    dev_loss["total_loss"]
                    if self.hparam["OPTIMIZER"]["lr_scheduler"] == "Plateau" else None)
                self.set_learning_rate(new_lr)

            if self._is_primary():
                self.gen_logging(epoch=epoch, prefix="")
            self.early_stopping(current_epoch=epoch, stop_criterion=25)

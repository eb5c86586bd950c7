"""Streaming serving loop: native ring-buffer hub + jitted batched step.

Architecture (replaces the reference demo's ad-hoc Python list/polling
threads, SURVEY.md §5.2):

    client threads ──push──▶ C++ SPSC input rings ┐
                                                  ├─ hub_gather ─▶ [B, S]
    serving thread:  one jitted StreamingTSE/NS step on the device
                                                  ├─ hub_scatter ◀ [B, S]
    client threads ◀──pop──  C++ SPSC output rings┘

Streams occupy fixed batch slots; a slot that hasn't buffered a full chunk
contributes zeros for that tick (real-time underrun semantics) and its
output is withheld. The device step always runs the full fixed batch, so
the compiled program never re-specializes.
"""
from __future__ import annotations

import ctypes
import threading
from typing import Optional

import numpy as np

from ..src import native as _native


class StreamHub:
    """ctypes wrapper over the native per-stream ring-buffer hub."""

    def __init__(self, n_streams: int, ring_capacity: int = 1 << 16):
        lib = _native._load()
        if lib is None:
            raise RuntimeError("native library unavailable (make -C csrc)")
        self._lib = lib
        self._bind(lib)
        self.n_streams = n_streams
        self._hub = lib.hub_create(n_streams, ring_capacity)

    @staticmethod
    def _bind(lib):
        if getattr(lib, "_hub_bound", False):
            return
        c = ctypes
        lib.hub_create.argtypes = [c.c_int, c.c_size_t]
        lib.hub_create.restype = c.c_void_p
        lib.hub_destroy.argtypes = [c.c_void_p]
        lib.hub_push_input.argtypes = [c.c_void_p, c.c_int,
                                       c.POINTER(c.c_float), c.c_int64]
        lib.hub_push_input.restype = c.c_int64
        lib.hub_pop_output.argtypes = [c.c_void_p, c.c_int,
                                       c.POINTER(c.c_float), c.c_int64]
        lib.hub_pop_output.restype = c.c_int64
        lib.hub_input_available.argtypes = [c.c_void_p, c.c_int]
        lib.hub_input_available.restype = c.c_int64
        lib.hub_output_available.argtypes = [c.c_void_p, c.c_int]
        lib.hub_output_available.restype = c.c_int64
        lib.hub_gather.argtypes = [c.c_void_p, c.c_int64,
                                   c.POINTER(c.c_float), c.POINTER(c.c_int8)]
        lib.hub_gather.restype = c.c_int
        lib.hub_scatter.argtypes = [c.c_void_p, c.c_int64,
                                    c.POINTER(c.c_float), c.POINTER(c.c_int8)]
        lib._hub_bound = True

    def __del__(self):
        if getattr(self, "_hub", None):
            self._lib.hub_destroy(self._hub)
            self._hub = None

    def _fptr(self, arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def push_input(self, stream_id: int, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, np.float32).reshape(-1)
        return int(self._lib.hub_push_input(self._hub, stream_id,
                                            self._fptr(samples), len(samples)))

    def pop_output(self, stream_id: int, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = int(self._lib.hub_pop_output(self._hub, stream_id,
                                           self._fptr(out), n))
        return out[:got]

    def input_available(self, stream_id: int) -> int:
        return int(self._lib.hub_input_available(self._hub, stream_id))

    def output_available(self, stream_id: int) -> int:
        return int(self._lib.hub_output_available(self._hub, stream_id))

    def gather(self, chunk: int):
        batch = np.empty((self.n_streams, chunk), np.float32)
        mask = np.empty(self.n_streams, np.int8)
        ready = int(self._lib.hub_gather(
            self._hub, chunk, self._fptr(batch),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))))
        return batch, mask.astype(bool), ready

    def scatter(self, batch: np.ndarray, mask: np.ndarray):
        batch = np.ascontiguousarray(batch, np.float32)
        m = np.ascontiguousarray(mask.astype(np.int8))
        self._lib.hub_scatter(self._hub, batch.shape[1], self._fptr(batch),
                              m.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))


class StreamingServer:
    """Fixed-slot streaming server around a jitted engine step.

    step_fn(chunk_batch [B, S]) -> out_batch [B, S] must be a jitted,
    state-carrying closure (see tests for construction). The server owns
    the tick loop; clients interact only with the hub.
    """

    def __init__(self, step_fn, n_streams: int, chunk_samples: int,
                 ring_capacity: int = 1 << 16, lockstep: bool = False):
        """lockstep=True only steps when EVERY stream has a full chunk
        buffered (deterministic batch processing); the default steps as soon
        as any stream is ready, with zeros for underrun slots (real-time
        semantics: missing audio is silence, time advances)."""
        self.hub = StreamHub(n_streams, ring_capacity)
        self.step_fn = step_fn
        self.chunk = chunk_samples
        self.n_streams = n_streams
        self.lockstep = lockstep
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.ticks = 0

    def tick(self) -> int:
        """One serving iteration: gather -> device step -> scatter.
        Returns the number of streams that produced output."""
        if self.lockstep:
            if any(self.hub.input_available(i) < self.chunk
                   for i in range(self.n_streams)):
                return 0
        batch, mask, ready = self.hub.gather(self.chunk)
        if ready == 0:
            return 0
        out = np.asarray(self.step_fn(batch))
        self.hub.scatter(out, mask)
        self.ticks += 1
        return ready

    def run(self, poll_s: float = 0.001):
        """Blocking serve loop (call stop() from another thread)."""
        import time

        while not self._stop.is_set():
            if self.tick() == 0:
                time.sleep(poll_s)

    def start(self):
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

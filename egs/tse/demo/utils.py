"""Streaming demo nets: speaker embedding + chunked TSE inference.

Parity: reference egs/tse/demo/utils.py (DemoSpeakerNet :11, DemoTseNet :48,
streaming_inference_chunk :100, overlap_add :121). Here both are thin
wrappers over the batched jitted StreamingTSE engine — the per-frame Python
loop of the reference is replaced by one jitted chunk step.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))


class DemoSpeakerNet:
    """Compute a speaker embedding from enrollment audio."""

    def __init__(self, engine, variables):
        self.engine = engine
        self.variables = variables

    def get_speaker_embedding(self, wav: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from puresound_tpu.streaming.engine import StreamingTSE

        wav = np.asarray(wav, np.float32).reshape(1, -1)
        dvec = self.engine.apply(self.variables, jnp.asarray(wav),
                                 method=StreamingTSE.embed)
        return np.asarray(dvec)


class DemoTseNet:
    """Chunked streaming TSE: feed fixed-size chunks, receive enhanced
    chunks with identical latency semantics to the reference demo
    (zero-primed 2-hop window, sum overlap-add)."""

    def __init__(self, engine, variables, batch: int = 1):
        import jax

        from puresound_tpu.streaming.engine import StreamingTSE

        self.engine = engine
        self.variables = variables
        self.state = engine.apply(variables, batch, method=StreamingTSE.init_state)

        def _step(chunk, dvec, state):
            return engine.apply(variables, chunk, dvec, state,
                                method=StreamingTSE.step)

        self._step = jax.jit(_step)

    def reset(self, batch: int = 1):
        from puresound_tpu.streaming.engine import StreamingTSE

        self.state = self.engine.apply(self.variables, batch,
                                       method=StreamingTSE.init_state)

    def streaming_inference_chunk(self, chunk: np.ndarray,
                                  embed: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        chunk = np.asarray(chunk, np.float32).reshape(1, -1)
        out, self.state = self._step(jnp.asarray(chunk), jnp.asarray(embed),
                                     self.state)
        return np.asarray(out)


def overlap_add(chunks, hop: int) -> np.ndarray:
    """Sample-domain overlap-add of a list of [*, W] frames at stride hop
    (the demo's reconstruction helper)."""
    chunks = [np.asarray(c).reshape(-1) for c in chunks]
    W = chunks[0].shape[-1]
    out = np.zeros(hop * (len(chunks) - 1) + W, np.float32)
    for i, c in enumerate(chunks):
        out[i * hop : i * hop + W] += c
    return out

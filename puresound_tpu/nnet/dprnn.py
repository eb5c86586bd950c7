"""Dual-path RNN masker with optional embedding-free TSE conditioning.

Parity: puresound/nnet/dprnn.py:10-244. The enrollment waveform variant
("veve": embedding-free TSE) encodes enrollment features into the
inter-chunk RNNs' initial hidden states (:120-126, 193-244).

TPU-first: intra-chunk runs as [N*S, K, C] batched scans, inter-chunk as
[N*K, S, C] batched scans — both single lax.scans with MXU-sized gates.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .lobe.activation import PReLU
from .lobe.cnn import Conv1d
from .lobe.norm import LayerNormLast
from .lobe.rnn import LSTM
from .lobe.trivial import FiLM, SplitMerge


class DPRNN(nn.Module):
    """x: [N, C, T], embed: [N, E] (or enrollment features [N, C, T'] when
    embedding_free_tse) -> [N, C_out, T]."""

    input_size: int
    hidden_size: int
    output_size: int
    n_blocks: int = 2
    seg_size: int = 20
    seg_overlap: bool = False
    causal: bool = True
    embed_dim: int = 0
    embed_norm: bool = False
    block_with_embed: Optional[tuple] = None
    embedding_free_tse: bool = False

    def setup(self):
        bi = not self.causal
        films, intra, intra_proj, intra_norm = [], [], [], []
        inter, inter_proj, inter_norm = [], [], []
        for i in range(self.n_blocks):
            if self.embed_dim != 0 and self.block_with_embed[i]:
                films.append(FiLM(self.input_size, self.embed_dim, input_norm=True))
            else:
                films.append(None)
            intra.append(LSTM(self.input_size, self.hidden_size, bidirectional=bi))
            intra_proj.append(nn.Dense(self.input_size))
            intra_norm.append(LayerNormLast(self.input_size))
            inter.append(LSTM(self.input_size, self.hidden_size, bidirectional=bi))
            inter_proj.append(nn.Dense(self.input_size))
            inter_norm.append(LayerNormLast(self.input_size))
        self.input_film = films
        self.intra_rnn = intra
        self.intra_proj = intra_proj
        self.intra_norm = intra_norm
        self.inter_rnn = inter
        self.inter_proj = inter_proj
        self.inter_norm = inter_norm
        self.out_act = PReLU()
        self.out_conv = Conv1d(self.input_size, self.output_size, 1)

    def _segment(self, x):
        """[N, C, T] -> ([N, S, K, C], rest)."""
        N, C, T = x.shape
        if self.seg_overlap:
            return SplitMerge.split(x, self.seg_size)
        xt = jnp.swapaxes(x, 1, 2)
        rest = self.seg_size - T % self.seg_size
        if rest > 0:
            xt = jnp.pad(xt, ((0, 0), (0, rest), (0, 0)))
        return xt.reshape(N, -1, self.seg_size, C), rest

    def _run_blocks(self, seg, embed_rep, inter_init, collect_hidden=False,
                    train: bool = False):
        """seg: [N, S, K, C]. Returns ([N, S, K, C], list of inter hiddens)."""
        N, S, K, C = seg.shape
        output = seg
        hiddens = []
        for i in range(self.n_blocks):
            output = output.reshape(N * S, K, C)
            if embed_rep is not None and self.block_with_embed and self.block_with_embed[i]:
                output = jnp.swapaxes(
                    self.input_film[i](jnp.swapaxes(output, 1, 2), embed_rep), 1, 2)

            intra_out, _ = self.intra_rnn[i](output)
            intra_out = self.intra_norm[i](self.intra_proj[i](intra_out))
            output = output + intra_out

            inter_in = output.reshape(N, S, K, C).transpose(0, 2, 1, 3).reshape(N * K, S, C)
            init = inter_init[i] if inter_init is not None else None
            inter_out, hid = self.inter_rnn[i](inter_in, init)
            if collect_hidden:
                hiddens.append(hid)
            inter_out = self.inter_norm[i](self.inter_proj[i](inter_out))
            output = inter_in + inter_out  # [N*K, S, C]
            output = output.reshape(N, K, S, C).transpose(0, 2, 1, 3)
        return output, hiddens

    def _get_hidden_states(self, enroll_feats, train: bool = False):
        """Run the net over enrollment features, return per-block inter
        final hidden states (the embedding-free TSE conditioning)."""
        seg, _ = self._segment(enroll_feats)
        _, hiddens = self._run_blocks(seg, None, None, collect_hidden=True,
                                      train=train)
        return hiddens

    def __call__(self, x: jnp.ndarray, embed: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        N, C, T = x.shape
        if self.embedding_free_tse:
            assert embed is not None and embed.ndim == 3, \
                "embedding-free TSE needs enrollment features [N, C, T']"
            # enrollment hidden states: [D, N*K', H] — K' may differ from the
            # mixture's K, but the inter RNN batch is N*K so K must match.
            inter_init = self._get_hidden_states(embed, train=train)
            embed_rep = None
        else:
            inter_init = None
            if embed is not None:
                if self.embed_norm:
                    embed = embed / jnp.linalg.norm(embed, axis=1, keepdims=True).clip(1e-12)
            embed_rep = None

        seg, rest = self._segment(x)
        N, S, K, C = seg.shape
        if embed is not None and not self.embedding_free_tse:
            embed_rep = jnp.broadcast_to(embed[:, None, :], (N, S, embed.shape[1])
                                         ).reshape(N * S, -1)

        output, _ = self._run_blocks(seg, embed_rep, inter_init, train=train)

        if self.seg_overlap:
            out = SplitMerge.merge(output, rest)
        else:
            out = jnp.swapaxes(output.reshape(N, S * K, C)[:, :T, :], 1, 2)
        return self.out_conv(self.out_act(out))

    # ------------------------------------------------------------- streaming
    def init_state(self, batch: int, dtype=jnp.float32) -> dict:
        """Streaming state: carried inter-LSTM (h, c) per block, one pair
        per (stream, intra-position) — [1, B*seg_size, H]. The intra LSTM
        restarts from zero every segment (offline semantics), so it carries
        nothing."""
        assert self.causal and not self.seg_overlap, (
            "streaming requires causal non-overlapping segments")
        K, H = self.seg_size, self.hidden_size
        z = lambda: jnp.zeros((1, batch * K, H), dtype)
        return {"h": [z() for _ in range(self.n_blocks)],
                "c": [z() for _ in range(self.n_blocks)]}

    def condition_stream_state(self, state: dict, enroll_feats) -> dict:
        """Embedding-free TSE (veve): write the enrollment-derived inter
        initial hidden states into a fresh stream state (dprnn.py:120-126
        reference semantics — conditioning enters ONCE, at stream start)."""
        hiddens = self._get_hidden_states(enroll_feats)
        return dict(state, h=[h for h, _ in hiddens],
                    c=[c for _, c in hiddens])

    def step_frames(self, x: jnp.ndarray, embed: Optional[jnp.ndarray],
                    state: dict):
        """Streaming chunk step matching the SkiM streaming API.

        x: [B, T, C] frames with T a multiple of seg_size -> ([B, C, T]
        mask frames, new state). Numerically identical to the offline
        forward on segment-aligned input. For embedding-free TSE pass
        embed=None and condition the state via `condition_stream_state`."""
        B, T, C = x.shape
        K = self.seg_size
        assert T % K == 0, "chunk frames must be a multiple of seg_size"
        S = T // K
        output = x.reshape(B, S, K, C)
        embed_rep = None
        if embed is not None and not self.embedding_free_tse:
            if self.embed_norm:
                embed = embed / jnp.linalg.norm(embed, axis=1,
                                                keepdims=True).clip(1e-12)
            embed_rep = jnp.broadcast_to(
                embed[:, None, :], (B, S, embed.shape[1])).reshape(B * S, -1)
        hs, cs = list(state["h"]), list(state["c"])
        for i in range(self.n_blocks):
            o = output.reshape(B * S, K, C)
            if embed_rep is not None and self.block_with_embed and self.block_with_embed[i]:
                o = jnp.swapaxes(
                    self.input_film[i](jnp.swapaxes(o, 1, 2), embed_rep), 1, 2)
            intra_out, _ = self.intra_rnn[i](o)
            o = o + self.intra_norm[i](self.intra_proj[i](intra_out))
            inter_in = o.reshape(B, S, K, C).transpose(0, 2, 1, 3).reshape(B * K, S, C)
            inter_out, (h, c) = self.inter_rnn[i](inter_in, (hs[i], cs[i]))
            hs[i], cs[i] = h, c
            o = inter_in + self.inter_norm[i](self.inter_proj[i](inter_out))
            output = o.reshape(B, K, S, C).transpose(0, 2, 1, 3)
        out = jnp.swapaxes(output.reshape(B, T, C), 1, 2)
        return self.out_conv(self.out_act(out)), dict(state, h=hs, c=cs)

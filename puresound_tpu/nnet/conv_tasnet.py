"""TCN / GatedTCN stacks and the ConvTasNet masker.

Parity: puresound/nnet/conv_tasnet.py (TCN :11, GatedTCN :93,
ConvTasNet :218). Dilated convs run as explicit-pad VALID convs; speaker
embedding is injected by broadcast-concat or FiLM exactly as the reference.
"""
from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .lobe.activation import PReLU
from .lobe.cnn import Conv1d, DepthwiseSeparableConv1d
from .lobe.norm import get_norm, apply_norm

# Route eligible TCN blocks through the fused Pallas training kernel
# (ops/tcn_train_kernel.py: whole block VMEM-resident per batch tile,
# custom VJP with in-kernel forward recompute — no autodiff residuals).
# Set by TRAIN.fused_scan (tasks) or PURESOUND_FUSED_TCN=1.
FUSED_TCN = int(os.environ.get("PURESOUND_FUSED_TCN", "0")) != 0

# Measured crossover guards (v5e, fwd+bwd, T~2000). f32: stock XLA's
# global-norm TCN autodiff is pathological at batch (593 ms for the
# 5-block C=128 stack at B=64; 1.3x even for C=192/512 ConvTasNet at
# B=64) -> engage from B>=16. bf16: stock XLA is already decent; the
# kernel wins only where the whole tile chain stays latency-lean —
# measured 1.25x at C<=128 B=64, NEUTRAL at C=192 B=64, SLOWER at B=16 —
# so bf16 needs B>=32 and in_channels<=128.
_FUSED_TCN_MIN_ROWS = 16
_FUSED_TCN_MIN_ROWS_BF16 = 32
_FUSED_TCN_MAX_C_BF16 = 128


class TCN(nn.Module):
    """Residual TCN block: 1x1-in(+embed concat) -> DSConv -> 1x1-out, +res.

    x: [N, C, T], embed: [N, E] or None.
    """

    in_channels: int
    hid_channels: int
    kernel: int
    dilation: int
    dropout: float = 0.0
    emb_dim: int = 0
    causal: bool = False
    tcn_norm: str = "gLN"
    dconv_norm: str = "gGN"

    def setup(self):
        self.in_conv = Conv1d(self.in_channels + self.emb_dim, self.hid_channels,
                              1, use_bias=False)
        self.in_norm = get_norm(self.tcn_norm)(self.hid_channels)
        self.in_act = PReLU()
        self.dconv = DepthwiseSeparableConv1d(
            in_channels=self.hid_channels, out_channels=self.hid_channels,
            hid_channels=None, kernel=self.kernel, dilation=self.dilation,
            skip=False, causal=self.causal, norm_cls=self.dconv_norm)
        self.drop = nn.Dropout(self.dropout)
        self.out_conv = Conv1d(self.hid_channels, self.in_channels, 1)

    def __call__(self, x: jnp.ndarray, embed: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self._fusable(x, embed):
            return self._fused_call(x)
        res = x
        if embed is not None:
            e = jnp.broadcast_to(embed[:, :, None], (*embed.shape, x.shape[-1]))
            x = jnp.concatenate([x, e], axis=1)
        x = self.in_act(apply_norm(self.in_norm, self.in_conv(x), train))
        x = self.drop(self.dconv(x, train=train), deterministic=not train)
        x = self.out_conv(x)
        return x + res

    def _fusable(self, x, embed) -> bool:
        if x.dtype == jnp.bfloat16:
            fast_enough = (x.shape[0] >= _FUSED_TCN_MIN_ROWS_BF16
                           and self.in_channels <= _FUSED_TCN_MAX_C_BF16)
        else:
            fast_enough = x.shape[0] >= _FUSED_TCN_MIN_ROWS
        return (FUSED_TCN and embed is None and not self.causal
                and self.dropout == 0.0 and self.emb_dim == 0
                and self.tcn_norm in ("gLN", "gGN")
                and self.dconv_norm in ("gLN", "gGN")
                and self.dconv.hid_channels is None and not self.dconv.skip
                and fast_enough)

    def _fused_call(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.tcn_train_kernel import tcn_block_train

        dn = self.dconv
        dd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        return tcn_block_train(
            x, self.in_conv.w[:, :, 0], self.in_norm.gamma,
            self.in_norm.beta, self.in_act.alpha,
            dn.dw_conv.w[:, 0, :], dn.dw_conv.b,
            dn.dw_norm.gamma, dn.dw_norm.beta, dn.dw_act.alpha,
            dn.pw_conv.w[:, :, 0], dn.pw_conv.b,
            dn.pw_norm.gamma, dn.pw_norm.beta, dn.pw_act.alpha,
            self.out_conv.w[:, :, 0], self.out_conv.b,
            self.dilation, 0, jax.default_backend() != "tpu", dd)

    @property
    def ctx_frames(self) -> int:
        return self.dconv.ctx_frames

    def init_ctx(self, batch: int, dtype=jnp.float32):
        return jnp.zeros((batch, self.hid_channels, self.ctx_frames), dtype)

    def step_chunk(self, x: jnp.ndarray, embed: Optional[jnp.ndarray],
                   ctx: jnp.ndarray):
        """Causal streaming chunk: x [B, C, K] + carried depthwise context
        -> (y [B, C, K], ctx'). The 1x1 convs and norms are frame-local."""
        res = x
        if embed is not None:
            e = jnp.broadcast_to(embed[:, :, None], (*embed.shape, x.shape[-1]))
            x = jnp.concatenate([x, e], axis=1)
        x = self.in_act(apply_norm(self.in_norm, self.in_conv(x), False))
        x, new_ctx = self.dconv.step_chunk(x, ctx)
        return self.out_conv(x) + res, new_ctx


class GatedTCN(nn.Module):
    """Gated two-branch TCN; the gate branch takes the embedding by concat
    or FiLM. Causal mode trims the right padding after the output conv.
    """

    in_channels: int
    hid_channels: int
    kernel: int
    dilation: int
    dropout: float = 0.0
    emb_dim: int = 0
    causal: bool = False
    tcn_norm: str = "gLN"
    use_film: bool = False

    def setup(self):
        self._padd = ((self.kernel - 1) * self.dilation // 2 if not self.causal
                      else (self.kernel - 1) * self.dilation)
        norm = get_norm(self.tcn_norm)
        self.in_conv = Conv1d(self.in_channels, self.hid_channels, 1, use_bias=False)
        self.left_conv = Conv1d(self.hid_channels, self.hid_channels, self.kernel,
                                dilation=self.dilation, padding=self._padd,
                                use_bias=False)
        self.left_norm = norm(self.hid_channels)
        self.left_act = PReLU()
        self.left_drop = nn.Dropout(self.dropout)
        if not self.use_film:
            right_in = self.hid_channels + self.emb_dim
        else:
            self.cond_scale = Conv1d(self.emb_dim, self.hid_channels, 1, use_bias=False)
            self.cond_bias = Conv1d(self.emb_dim, self.hid_channels, 1, use_bias=False)
            right_in = self.hid_channels
        self.right_conv = Conv1d(right_in, self.hid_channels, self.kernel,
                                 dilation=self.dilation, padding=self._padd,
                                 use_bias=False)
        self.right_norm = norm(self.hid_channels)
        self.right_act = PReLU()
        self.right_drop = nn.Dropout(self.dropout)
        self.out_conv = Conv1d(self.hid_channels, self.in_channels, 1, use_bias=False)

    def __call__(self, x: jnp.ndarray, embed: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        res = x
        x = self.in_conv(x)
        if embed is not None:
            if not self.use_film:
                e = jnp.broadcast_to(embed[:, :, None], (*embed.shape, x.shape[-1]))
                x_r = jnp.concatenate([x, e], axis=1)
            else:
                cond = embed[:, :, None]
                x_r = self.cond_scale(cond) * x + self.cond_bias(cond)
        else:
            x_r = x
        left = self.left_drop(self.left_act(apply_norm(self.left_norm, self.left_conv(x), train)),
                              deterministic=not train)
        right = jax.nn.sigmoid(
            self.right_drop(self.right_act(apply_norm(self.right_norm, self.right_conv(x_r), train)),
                            deterministic=not train))
        x = self.out_conv(left * right)
        if self.causal:
            x = x[..., : -self._padd] + res
        else:
            x = x + res
        return x

    @property
    def ctx_frames(self) -> int:
        return self._padd

    def init_ctx(self, batch: int, dtype=jnp.float32):
        """Two contexts: the raw hidden stream (left branch pads it with
        zeros offline) and the post-FiLM/concat stream (the right branch
        pads x_r AFTER conditioning, so zeros here match offline exactly)."""
        right_ch = self.hid_channels + (0 if self.use_film else self.emb_dim)
        return {"h": jnp.zeros((batch, self.hid_channels, self._padd), dtype),
                "r": jnp.zeros((batch, right_ch, self._padd), dtype)}

    def step_chunk(self, x: jnp.ndarray, embed: Optional[jnp.ndarray],
                   ctx: dict):
        """Causal streaming chunk: x [B, C, K] -> (y [B, C, K], ctx')."""
        assert self.causal, "step_chunk requires a causal GatedTCN"
        res = x
        h = self.in_conv(x)
        if embed is not None:
            if not self.use_film:
                e = jnp.broadcast_to(embed[:, :, None],
                                     (*embed.shape, h.shape[-1]))
                x_r = jnp.concatenate([h, e], axis=1)
            else:
                cond = embed[:, :, None]
                x_r = self.cond_scale(cond) * h + self.cond_bias(cond)
        else:
            x_r = h
        h_full = jnp.concatenate([ctx["h"], h], axis=-1)
        r_full = jnp.concatenate([ctx["r"], x_r], axis=-1)
        new_ctx = {"h": h_full[..., -self._padd:], "r": r_full[..., -self._padd:]}
        left = self.left_act(apply_norm(self.left_norm,
                                        self.left_conv(h_full, pad=0), False))
        right = jax.nn.sigmoid(self.right_act(apply_norm(
            self.right_norm, self.right_conv(r_full, pad=0), False)))
        return self.out_conv(left * right) + res, new_ctx


class ConvTasNet(nn.Module):
    """Repeated TCN stacks with dilation basic**i and per-layer embedding
    injection flags (`tcn_with_embed`). x: [N, C, T] -> mask [N, C, T].
    """

    input_dim: int = 512
    embed_dim: int = 256
    embed_norm: bool = False
    tcn_layer: str = "normal"
    tcn_kernel: int = 3
    tcn_dim: int = 256
    tcn_dilated_basic: int = 2
    per_tcn_stack: int = 5
    repeat_tcn: int = 4
    tcn_with_embed: tuple = (1, 0, 0, 0, 0)
    tcn_norm: str = "gLN"
    dconv_norm: str = "gGN"
    causal: bool = False

    def setup(self):
        assert self.per_tcn_stack == len(self.tcn_with_embed)
        layers = []
        for _ in range(self.repeat_tcn):
            stack = []
            for i in range(self.per_tcn_stack):
                emb = self.embed_dim if self.tcn_with_embed[i] else 0
                if self.tcn_layer.lower() == "normal":
                    stack.append(TCN(self.input_dim, self.tcn_dim,
                                     kernel=self.tcn_kernel,
                                     dilation=self.tcn_dilated_basic**i,
                                     emb_dim=emb, causal=self.causal,
                                     tcn_norm=self.tcn_norm,
                                     dconv_norm=self.dconv_norm))
                elif self.tcn_layer.lower() == "gated":
                    stack.append(GatedTCN(self.input_dim, self.tcn_dim,
                                          kernel=self.tcn_kernel,
                                          dilation=self.tcn_dilated_basic**i,
                                          emb_dim=emb, causal=self.causal,
                                          tcn_norm=self.tcn_norm))
                else:
                    raise NameError(self.tcn_layer)
            layers.append(stack)
        self.tcn_list = layers

    def __call__(self, x: jnp.ndarray, dvec: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        for stack in self.tcn_list:
            for i, layer in enumerate(stack):
                if self.tcn_with_embed[i]:
                    x = layer(x, dvec, train=train)
                else:
                    x = layer(x, train=train)
        return x

    # -------------------------------------------------------------- streaming
    def init_state(self, batch: int, dtype=jnp.float32) -> dict:
        """Streaming state: one dilated-conv context ring per TCN layer
        (the whole masker is convolutional, so this is all the state)."""
        assert self.causal, "streaming requires a causal ConvTasNet"
        ctxs = []
        for stack in self.tcn_list:
            for layer in stack:
                ctxs.append(layer.init_ctx(batch, dtype))
        return {"ctx": ctxs}

    def step_frames(self, x: jnp.ndarray, dvec: Optional[jnp.ndarray],
                    state: dict):
        """Streaming chunk step matching the SkiM streaming API.

        x: [B, K, C] frames -> ([B, C, K] mask frames, new state).
        Numerically identical to the offline forward on chunked input."""
        if self.embed_norm and dvec is not None:
            dvec = dvec / jnp.linalg.norm(dvec, axis=1, keepdims=True).clip(1e-12)
        h = jnp.swapaxes(x, 1, 2)  # [B, C, K]
        new_ctx = []
        idx = 0
        for stack in self.tcn_list:
            for i, layer in enumerate(stack):
                e = dvec if self.tcn_with_embed[i] else None
                h, c = layer.step_chunk(h, e, state["ctx"][idx])
                new_ctx.append(c)
                idx += 1
        return h, dict(state, ctx=new_ctx)

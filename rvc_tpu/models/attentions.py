"""Relative-position transformer encoder (the VITS text encoder core).

Re-derivation of the windowed relative-position attention used by the
reference (rvc/lib/algorithm/attentions.py:6-186, window_size=10) in NTC
layout. The rel->abs index shuffle is the standard Music-Transformer skew
trick expressed with static pads/reshapes, which XLA compiles to pure
layout ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .commons import SCAN_UNROLL, Conv1d, leaky_relu


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute logits."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))          # [B,H,L,2L]
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative weights."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _window_rel_embeddings(emb: jax.Array, length: int, window: int) -> jax.Array:
    """Slice/pad the [n, 2w+1, d] table to [n, 2L-1, d] for sequence length L."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad > 0:
        emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    """Self-attention with learned windowed relative-position embeddings."""

    channels: int
    out_channels: int
    n_heads: int
    window_size: Optional[int] = 10
    heads_share: bool = True
    # min length for the banded-correction softmax; below it the dense
    # skew is cheaper (see comment at the branch)
    banded_min_t: int = 448

    @nn.compact
    def __call__(
        self, x: jax.Array, c: jax.Array, attn_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        b, t, _ = x.shape
        h = self.n_heads
        d = self.channels // h

        q = Conv1d(self.channels, 1, name="conv_q")(x)
        k = Conv1d(self.channels, 1, name="conv_k")(c)
        v = Conv1d(self.channels, 1, name="conv_v")(c)

        # [B, T, C] -> [B, H, T, d]
        def split_heads(a):
            return a.reshape(b, -1, h, d).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = d**-0.5
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
        )

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)

        # The banded correction wins at long T (it avoids six [B,H,T,2T]
        # relayouts per layer — 30 ms of a 35 ms encoder at inference
        # lengths) but spawns ~60 small ops per block (2*(2w+1) rolls +
        # band dots), which dominates at training lengths (T=400, where the
        # dense skew's relayouts are ~2.6M-element copies). Pick per length.
        if (self.window_size is not None
                and t > max(self.window_size, self.banded_min_t)):
            # Banded softmax: the windowed rel-pos bias touches only 2w+1
            # diagonals, so instead of materializing biased [B,H,T,T] scores
            # through the rel->abs skew (six full-matrix relayouts per
            # layer — measured 30 ms of a 35 ms encoder), split the softmax
            # into an out-of-band dense part (bias is zero there) and an
            # in-band [B,H,T,2w+1] part carrying the bias:
            #
            #   softmax(S + B) @ (v + ev) =
            #     [exp(S_oob - m) @ v + sum_o e_o * v_{t+o} + e_band @ ev]
            #     / (sum exp(S_oob - m) + sum e_band),
            #   e_o = exp(S_band + B - m),  m = rowmax over both parts
            #
            # Algebraically identical to the reference computation, and
            # free of the 1 + sum(c) cancellation a correction-term form
            # would hit when the bias strongly suppresses in-band mass.
            w = self.window_size
            n_rel = 1 if self.heads_share else h
            rel_init = nn.initializers.normal(stddev=d**-0.5)
            emb_rel_k = self.param(
                "emb_rel_k", rel_init, (n_rel, 2 * w + 1, d)
            )
            emb_rel_v = self.param(
                "emb_rel_v", rel_init, (n_rel, 2 * w + 1, d)
            )
            # broadcast the (possibly shared) rel embeddings to one per head
            # so the einsum contracts d only — summing over n would mix heads
            # when heads_share=False
            rel_k_h = jnp.broadcast_to(emb_rel_k, (h,) + emb_rel_k.shape[1:])
            rel_v_h = jnp.broadcast_to(emb_rel_v, (h,) + emb_rel_v.shape[1:])
            bias_band = jnp.einsum(
                "bhtd,hrd->bhtr", q * scale, rel_k_h,
                preferred_element_type=jnp.float32,
            )  # [B,H,T,2w+1]
            col = (jax.lax.broadcasted_iota(jnp.int32, (t, 2 * w + 1), 0)
                   + jax.lax.broadcasted_iota(
                       jnp.int32, (t, 2 * w + 1), 1) - w)
            valid = ((col >= 0) & (col < t))[None, None]

            qs = q * scale
            k_sh = [jnp.roll(k, -(r - w), axis=2) for r in range(2 * w + 1)]
            v_sh = [jnp.roll(v, -(r - w), axis=2) for r in range(2 * w + 1)]
            # f32 logits like the dense `scores` einsum — on the bf16 path
            # the band carries the softmax mass, so rounding it to bf16
            # would drift from the dense-skew branch
            score_band = jnp.stack(
                [jnp.einsum("bhtd,bhtd->bht", qs, ks,
                            preferred_element_type=jnp.float32)
                 for ks in k_sh], axis=-1
            )  # [B,H,T,2w+1]
            if attn_mask is not None:
                # mirror the dense key masking on the banded scores:
                # band (t, r) attends key s = t + r - w
                km = jnp.broadcast_to(attn_mask, (b, 1, 1, t))[:, 0, 0, :]
                bm = jnp.stack(
                    [jnp.roll(km, -(r - w), axis=-1)
                     for r in range(2 * w + 1)], axis=-1)  # [B, T, 2w+1]
                score_band = jnp.where(
                    bm[:, None] == 0, -1e4, score_band
                )

            row_i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            in_band = (jnp.abs(row_i - col_i) <= w)[None, None]
            s_band = jnp.where(valid, score_band + bias_band, -1e30)
            s_oob = jnp.where(in_band, -1e30, scores)
            m = jnp.maximum(
                jnp.max(s_oob, axis=-1, keepdims=True),
                jnp.max(s_band, axis=-1, keepdims=True),
            )
            e_oob = jnp.exp(s_oob - m)            # zero on the band
            e_band = jnp.exp(s_band - m)          # zero at invalid cols
            denom = (jnp.sum(e_oob, axis=-1, keepdims=True)
                     + jnp.sum(e_band, axis=-1, keepdims=True))

            out = jnp.einsum("bhts,bhsd->bhtd", e_oob, v)
            for r in range(2 * w + 1):
                out = out + e_band[..., r : r + 1] * v_sh[r]
            out = out + jnp.einsum("bhtr,hrd->bhtd", e_band, rel_v_h)
            out = out / denom
        elif self.window_size is not None:
            # short sequences: the dense skew is cheap at these lengths
            w = self.window_size
            n_rel = 1 if self.heads_share else h
            rel_init = nn.initializers.normal(stddev=d**-0.5)
            emb_rel_k = self.param(
                "emb_rel_k", rel_init, (n_rel, 2 * w + 1, d)
            )
            emb_rel_v = self.param(
                "emb_rel_v", rel_init, (n_rel, 2 * w + 1, d)
            )
            # per-head contraction (see banded branch note on heads_share)
            rel_k = _window_rel_embeddings(emb_rel_k, t, w)
            rel_k = jnp.broadcast_to(rel_k, (h,) + rel_k.shape[1:])
            rel_logits = jnp.einsum("bhtd,hrd->bhtr", q * scale, rel_k,
                                    preferred_element_type=jnp.float32)
            scores = scores + _rel_to_abs(rel_logits)
            p_attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)
            rel_w = _abs_to_rel(p_attn)
            rel_v = _window_rel_embeddings(emb_rel_v, t, w)
            rel_v = jnp.broadcast_to(rel_v, (h,) + rel_v.shape[1:])
            out = out + jnp.einsum("bhtr,hrd->bhtd", rel_w, rel_v)
        else:
            p_attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return Conv1d(self.out_channels, 1, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward block (reference attentions.py:188-243)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array) -> jax.Array:
        y = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(x * x_mask)
        if self.activation == "gelu":
            y = y * jax.nn.sigmoid(1.702 * y)
        else:
            y = jnp.maximum(y, 0.0)
        y = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(y * x_mask)
        return y * x_mask


class _EncoderBlock(nn.Module):
    """One (rel-pos attention + conv FFN) block for nn.scan."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    kernel_size: int
    window_size: int

    @nn.compact
    def __call__(self, carry, _):
        x, attn_mask, mask3 = carry
        y = MultiHeadAttention(
            self.hidden_channels,
            self.hidden_channels,
            self.n_heads,
            window_size=self.window_size,
            name="attn",
        )(x, x, attn_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + y)
        y = FFN(
            self.hidden_channels,
            self.filter_channels,
            self.kernel_size,
            name="ffn",
        )(x, mask3)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)
        return (x, attn_mask, mask3), None


class Encoder(nn.Module):
    """Stack of (rel-pos attention + conv FFN) with post-layernorm.

    The uniform blocks run as one nn.scan program (params stacked on axis 0
    under "blocks") — a 6x cut in traced/compiled graph size."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    window_size: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array) -> jax.Array:
        # key-side mask [B, 1, 1, T]; output re-masked each block
        attn_mask = x_mask[:, None, None, :, 0] if x_mask.ndim == 3 else x_mask[:, None, None, :]
        mask3 = x_mask if x_mask.ndim == 3 else x_mask[..., None]
        x = x * mask3
        scan = nn.scan(
            _EncoderBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.n_layers,
            unroll=SCAN_UNROLL,
        )
        (x, _, _), _ = scan(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.kernel_size,
            self.window_size,
            name="blocks",
        )((x, attn_mask, mask3), None)
        return x * mask3

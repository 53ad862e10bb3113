"""Post-norm transformer encoder/decoder over superpixel tokens. Batch-first NHWC-style.

Capability parity with /root/reference/models/transformer2d.py: EncoderLayer
(31-60), TransformerEncoder (9-28), DecoderLayer (99-138), TransformerDecoder
(63-96). The reference's vendored Yu-Hsiang-Huang MultiHeadAttention
(transformer2d.py:158-229) is unused dead code there and intentionally omitted.

TPU-first design notes:
  * sequences are (batch, tokens, d_model) — batch-first so the attention
    einsums batch cleanly on the MXU (the reference uses (T, N, C)).
  * attention projections use a packed qkv weight with torch
    nn.MultiheadAttention's layout ((3d, d) in_proj) so pretrained reference
    weights map 1:1 in the converter.
  * dropout follows the reference placement (attention weights, FFN, residual
    branches) and is disabled unless ``deterministic=False``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHA (packed in_proj + out_proj)."""

    d_model: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic: bool = True):
        d, h = self.d_model, self.nhead
        hd = d // h
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d), jnp.float32
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        wq, wk, wv = jnp.split(in_proj_w, 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b, 3, axis=0)

        dtype = q.dtype
        n, tq, _ = q.shape
        tk = k.shape[1]
        qh = (q @ wq.T.astype(dtype) + bq.astype(dtype)).reshape(n, tq, h, hd)
        kh = (k @ wk.T.astype(dtype) + bk.astype(dtype)).reshape(n, tk, h, hd)
        vh = (v @ wv.T.astype(dtype) + bv.astype(dtype)).reshape(n, tk, h, hd)

        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, dtype=jnp.float32)).astype(dtype)
        logits = jnp.einsum("nqhd,nkhd->nhqk", qh * scale, kh)
        if key_padding_mask is not None:
            # True = padded-out key (torch semantics)
            big_neg = jnp.asarray(-1e9, dtype=logits.dtype)
            logits = jnp.where(key_padding_mask[:, None, None, :], big_neg, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        attn = nn.Dropout(self.dropout, name="attn_drop")(attn, deterministic=deterministic)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, vh).reshape(n, tq, d)
        out = nn.Dense(d, name="out_proj")(out)
        return out, attn


def _with_pos(x, pos):
    return x if pos is None else x + pos


class EncoderLayer(nn.Module):
    """Post-norm: MHA(q=k=src+pos, v=src) + FFN (transformer2d.py:31-60)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, pos=None, padding_mask=None, deterministic: bool = True):
        q = k = _with_pos(src, pos)
        attn_out, attn = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(q, k, src, key_padding_mask=padding_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout, name="dropout1")(attn_out, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1", dtype=src.dtype)(src)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src)
        ff = nn.Dropout(self.dropout, name="dropout")(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout, name="dropout2")(ff, deterministic=deterministic)
        src = nn.LayerNorm(name="norm2", dtype=src.dtype)(src)
        return src, attn


class TransformerEncoder(nn.Module):
    """Stack of independent EncoderLayers (reference deep-copies the layer).

    ``use_dense_pos=True`` adds pos to (q, k) at every layer; otherwise pos is
    added to the input once (transformer2d.py:17-28).
    """

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.1
    use_dense_pos: bool = True

    @nn.compact
    def __call__(self, src, pos, padding_mask=None, deterministic: bool = True):
        attn = None
        if self.use_dense_pos:
            out = src
            for i in range(self.num_layers):
                out, attn = EncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"layer{i}"
                )(out, pos, padding_mask, deterministic)
        else:
            out = src + pos
            for i in range(self.num_layers):
                out, attn = EncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"layer{i}"
                )(out, None, padding_mask, deterministic)
        return out, attn


class DecoderLayer(nn.Module):
    """Self-attn + cross-attn + FFN, post-norm (transformer2d.py:99-138)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_pos=None,
        memory_pos=None,
        tgt_padding_mask=None,
        memory_padding_mask=None,
        deterministic: bool = True,
    ):
        q = k = _with_pos(tgt, tgt_pos)
        sa, _ = MultiheadAttention(self.d_model, self.nhead, self.dropout, name="self_attn")(
            q, k, tgt, key_padding_mask=tgt_padding_mask, deterministic=deterministic
        )
        tgt = tgt + nn.Dropout(self.dropout, name="dropout1")(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1", dtype=tgt.dtype)(tgt)
        ca, attn = MultiheadAttention(self.d_model, self.nhead, self.dropout, name="corr_attn")(
            _with_pos(tgt, tgt_pos),
            _with_pos(memory, memory_pos),
            memory,
            key_padding_mask=memory_padding_mask,
            deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout, name="dropout2")(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2", dtype=tgt.dtype)(tgt)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout, name="dropout")(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout, name="dropout3")(ff, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm3", dtype=tgt.dtype)(tgt)
        return tgt, attn


class TransformerDecoder(nn.Module):
    """Stack of DecoderLayers (transformer2d.py:63-96); unused by the flagship
    model (both DISCO paths are encoders) but part of the public surface."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.1
    use_dense_pos: bool = True

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_pos,
        memory_pos,
        tgt_padding_mask=None,
        memory_padding_mask=None,
        deterministic: bool = True,
    ):
        attn = None
        if self.use_dense_pos:
            out = tgt
            tp, mp = tgt_pos, memory_pos
        else:
            out = tgt + tgt_pos
            tp, mp = None, None
        for i in range(self.num_layers):
            out, attn = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout, name=f"layer{i}"
            )(out, memory, tp, mp, tgt_padding_mask, memory_padding_mask, deterministic)
        return out, attn

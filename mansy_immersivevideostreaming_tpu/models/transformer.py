"""Transformer encoder/decoder with an Informer-style distillation layer.

Behavioral equivalent of the reference's customized torch Transformer
(reference ``viewport_prediction/models/customized_transformer.py``):

* post-norm residual blocks, ReLU feed-forward, nhead=8, dropout 0.1,
  final LayerNorm after both stacks (torch ``nn.Transformer`` defaults);
* a ``DistillLayer`` (circular Conv1d k3 + BatchNorm + ELU + stride-2
  MaxPool, reference ``customized_transformer.py:13-36``, after
  arXiv:2012.07436) halving the encoder memory length between encoder and
  decoder.

Weight-level parity with torch is a non-goal; metric-level behavior is.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MHA(nn.Module):
    """Multi-head attention with a fused Pallas core.

    Training mode uses the einsum path (attention-prob dropout matches torch
    ``nn.MultiheadAttention`` semantics); deterministic mode routes the
    QK^T -> softmax -> PV core through :func:`ops.pallas_kernels.mha_pallas`
    when ``use_pallas`` — one VMEM pass per (batch, head), no [L, L]
    intermediates in HBM.
    """
    num_heads: int
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q_in, kv_in, mask, deterministic: bool):
        d_model = q_in.shape[-1]
        dh = d_model // self.num_heads
        B, Lq, _ = q_in.shape
        Lk = kv_in.shape[1]

        def proj(x, name):
            y = nn.Dense(d_model, name=name)(x)
            return y.reshape(x.shape[0], x.shape[1], self.num_heads, dh)

        q = proj(q_in, "query")
        k = proj(kv_in, "key")
        v = proj(kv_in, "value")

        if self.use_pallas and deterministic:
            from mansy_immersivevideostreaming_tpu.ops.pallas_kernels import (
                mha_pallas)
            m = None if mask is None else jnp.broadcast_to(
                mask, (B, self.num_heads, Lq, Lk))
            o = mha_pallas(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                           v.transpose(0, 2, 1, 3), m)
            o = o.transpose(0, 2, 1, 3)
        else:
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(dh, q.dtype))
            if mask is not None:
                s = jnp.where(mask, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            p = nn.Dropout(self.dropout, deterministic=deterministic)(p)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return nn.Dense(d_model, name="out")(o.reshape(B, Lq, d_model))


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.Dense(self.dim_feedforward)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model)(h)
        return h


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool):
        attn = MHA(self.nhead, self.dropout, self.use_pallas)(
            x, x, None, deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5)(x + attn)
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout)(
            x, deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5)(x + ff)


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, memory, tgt_mask, deterministic: bool):
        sa = MHA(self.nhead, self.dropout, self.use_pallas)(
            x, x, tgt_mask, deterministic)
        sa = nn.Dropout(self.dropout, deterministic=deterministic)(sa)
        x = nn.LayerNorm(epsilon=1e-5)(x + sa)
        ca = MHA(self.nhead, self.dropout, self.use_pallas)(
            x, memory, None, deterministic)
        ca = nn.Dropout(self.dropout, deterministic=deterministic)(ca)
        x = nn.LayerNorm(epsilon=1e-5)(x + ca)
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout)(
            x, deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5)(x + ff)


class DistillLayer(nn.Module):
    """Circular Conv1d(k3) + BatchNorm + ELU + MaxPool1d(k3, s2, p1) over the
    time axis; reference ``customized_transformer.py:13-36``."""
    d_model: int

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # x: [B, L, D].  Circular pad along time, conv over time with D->D.
        h = jnp.concatenate([x[:, -1:, :], x, x[:, :1, :]], axis=1)
        h = nn.Conv(features=self.d_model, kernel_size=(3,), padding="VALID")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, axis=-1)(h)
        h = nn.elu(h)
        # MaxPool1d(kernel=3, stride=2, padding=1): pad with -inf.
        neg = jnp.full_like(h[:, :1, :], -jnp.inf)
        h = jnp.concatenate([neg, h, neg], axis=1)
        B, L, D = h.shape
        out_len = (L - 3) // 2 + 1
        idx = jnp.arange(out_len) * 2
        windows = jnp.stack([h[:, idx, :], h[:, idx + 1, :], h[:, idx + 2, :]], axis=0)
        return jnp.max(windows, axis=0)


def causal_mask(length: int) -> jnp.ndarray:
    """[1, 1, L, L] boolean causal mask for linen attention."""
    return nn.make_causal_mask(jnp.ones((1, length)), dtype=bool)


class Transformer(nn.Module):
    """Encoder + DistillLayer + decoder; mirrors reference
    ``customized_transformer.py:39-83`` (``encode``/``decode`` split exposed
    for stepwise decoding)."""
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 512
    dropout: float = 0.1
    use_pallas: bool = False

    def setup(self):
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                         self.dropout, self.use_pallas)
            for _ in range(self.num_encoder_layers)]
        self.encoder_norm = nn.LayerNorm(epsilon=1e-5)
        self.distill = DistillLayer(self.d_model)
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                         self.dropout, self.use_pallas)
            for _ in range(self.num_decoder_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5)

    def encode(self, src, deterministic: bool = True):
        h = src
        for layer in self.encoder_layers:
            h = layer(h, deterministic)
        h = self.encoder_norm(h)
        return self.distill(h, deterministic)

    def decode(self, tgt, memory, tgt_mask=None, deterministic: bool = True):
        h = tgt
        for layer in self.decoder_layers:
            h = layer(h, memory, tgt_mask, deterministic)
        return self.decoder_norm(h)

    def __call__(self, src, tgt, tgt_mask=None, deterministic: bool = True):
        memory = self.encode(src, deterministic)
        return self.decode(tgt, memory, tgt_mask, deterministic)

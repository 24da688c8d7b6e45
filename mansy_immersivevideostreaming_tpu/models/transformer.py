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
    """Multi-head attention (fused by XLA) with a KV-cache path.

    Attention-prob dropout matches torch ``nn.MultiheadAttention``
    semantics.  A hand-written Pallas core was benchmarked on the real
    chip and REMOVED: at this workload's shapes (L <= 21, Lq = 1 in the
    KV-cached decode) XLA's fused attention wins — 0.78x for the fused
    L16 core, 0.04x end-to-end in the incremental decode (BASELINE.md,
    round 2) — so the plain einsum path IS the fast path.

    For incremental autoregressive decoding, :meth:`project_kv` exposes the
    key/value projections so callers can cache them across steps and
    :meth:`attend` runs attention against a given cache — a step then costs
    O(1) projections instead of re-projecting the whole prefix (the
    reference re-decodes the full buffer every step, ``mtio.py:158-164``).
    """
    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query = nn.Dense(self.d_model, dtype=self.dtype)
        self.key = nn.Dense(self.d_model, dtype=self.dtype)
        self.value = nn.Dense(self.d_model, dtype=self.dtype)
        self.out = nn.Dense(self.d_model, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)

    def _split(self, y):
        return y.reshape(y.shape[0], y.shape[1], self.num_heads,
                         self.d_model // self.num_heads)

    def project_kv(self, kv_in):
        """(k, v) each [B, L, H, Dh] for caching."""
        return self._split(self.key(kv_in)), self._split(self.value(kv_in))

    def attend(self, q_in, k, v, mask, deterministic: bool):
        """Attention of ``q_in`` [B, Lq, D] over projected ``k``/``v``."""
        dh = self.d_model // self.num_heads
        B, Lq, _ = q_in.shape
        Lk = k.shape[1]
        q = self._split(self.query(q_in))
        # scores + softmax in f32 regardless of compute dtype
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / (dh ** 0.5)
        if mask is not None:
            s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = self.attn_drop(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
        return self.out(o.reshape(B, Lq, self.d_model))

    def __call__(self, q_in, kv_in, mask, deterministic: bool):
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, mask, deterministic)


class FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return h


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        attn = MHA(self.d_model, self.nhead, self.dropout,
                   self.dtype)(x, x, None, deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5)(x + attn)  # norms stay f32
        ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                         self.dtype)(x, deterministic)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5)(x + ff)


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.sa = MHA(self.d_model, self.nhead, self.dropout, self.dtype)
        self.ca = MHA(self.d_model, self.nhead, self.dropout, self.dtype)
        self.ff = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                              self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5)
        self.norm2 = nn.LayerNorm(epsilon=1e-5)
        self.norm3 = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, memory, tgt_mask, deterministic: bool):
        sa = self.sa(x, x, tgt_mask, deterministic)
        x = self.norm1(x + self.drop(sa, deterministic=deterministic))
        ca = self.ca(x, memory, None, deterministic)
        x = self.norm2(x + self.drop(ca, deterministic=deterministic))
        ff = self.ff(x, deterministic)
        return self.norm3(x + self.drop(ff, deterministic=deterministic))

    def step(self, x_t, sa_cache, t: int, mem_kv, deterministic: bool):
        """One decode step with fixed-size KV caches.

        ``x_t`` [B, 1, D] is the layer input at position ``t``; ``sa_cache``
        is (k, v) preallocated [B, L, H, Dh] caches of this layer's input
        projections; ``mem_kv`` is the precomputed cross-attention (k, v) of
        the encoder memory.  Position t's new k/v are written into slot t and
        attention masks out slots > t, so the result is exactly the full
        causal decode's column t.  All steps share one shape, which keeps the
        unrolled XLA graph small (growing-prefix shapes defeat subcomputation
        reuse and ballooned compile time on the remote-compile tunnel).
        Returns (out_t [B, 1, D], new sa_cache).
        """
        k_cache, v_cache = sa_cache
        k_t, v_t = self.sa.project_kv(x_t)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, t, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, t, 0, 0))
        mask = (jnp.arange(k_cache.shape[1]) <= t)[None, None, None, :]
        sa = self.sa.attend(x_t, k_cache, v_cache, mask, deterministic)
        x = self.norm1(x_t + self.drop(sa, deterministic=deterministic))
        ca = self.ca.attend(x, mem_kv[0], mem_kv[1], None, deterministic)
        x = self.norm2(x + self.drop(ca, deterministic=deterministic))
        ff = self.ff(x, deterministic)
        out = self.norm3(x + self.drop(ff, deterministic=deterministic))
        return out, (k_cache, v_cache)


class DistillLayer(nn.Module):
    """Circular Conv1d(k3) + BatchNorm + ELU + MaxPool1d(k3, s2, p1) over the
    time axis; reference ``customized_transformer.py:13-36``."""
    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # x: [B, L, D].  Circular pad along time, conv over time with D->D.
        h = jnp.concatenate([x[:, -1:, :], x, x[:, :1, :]], axis=1)
        h = nn.Conv(features=self.d_model, kernel_size=(3,), padding="VALID",
                    dtype=self.dtype)(h)
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
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                         self.dropout, self.dtype)
            for _ in range(self.num_encoder_layers)]
        self.encoder_norm = nn.LayerNorm(epsilon=1e-5)
        self.distill = DistillLayer(self.d_model, self.dtype)
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                         self.dropout, self.dtype)
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

    def init_decode_cache(self, memory, max_len: int):
        """Precompute per-layer cross-attention (k, v) of the encoder memory
        and zeroed fixed-size [B, max_len, H, Dh] self-attention caches."""
        B = memory.shape[0]
        dh = self.d_model // self.nhead
        mem_kvs = [layer.ca.project_kv(memory) for layer in self.decoder_layers]
        zeros = jnp.zeros((B, max_len, self.nhead, dh), self.dtype)
        sa_caches = [(zeros, zeros)] * len(self.decoder_layers)
        return mem_kvs, sa_caches

    def decode_step(self, x_t, sa_caches, t: int, mem_kvs,
                    deterministic: bool = True):
        """Incremental decode of position ``t`` [B, 1, D] through all layers.

        Equivalent to column t of :meth:`decode` under a causal mask, at
        O(1) per-step cost instead of O(t).  Returns (out_t, new sa_caches).
        """
        h = x_t
        new_caches = []
        for layer, cache, mem_kv in zip(self.decoder_layers, sa_caches, mem_kvs):
            h, cache = layer.step(h, cache, t, mem_kv, deterministic)
            new_caches.append(cache)
        return self.decoder_norm(h), new_caches

    def __call__(self, src, tgt, tgt_mask=None, deterministic: bool = True):
        memory = self.encode(src, deterministic)
        return self.decode(tgt, memory, tgt_mask, deterministic)

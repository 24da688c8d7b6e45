"""MTIO ensemble viewport-prediction Transformer (Flax).

Rebuild of the reference's multi-trajectory-input-output predictor
(reference ``viewport_prediction/models/mtio.py``):

* ``num_head`` trajectory slots concatenated channel-wise and embedded with a
  single Dense (the reference's per-timestep Python loop in
  ``ViewportEmbedding.forward``, ``mtio.py:40-44``, is a plain time-distributed
  linear — one einsum here);
* sinusoidal positional encoding with dropout (``mtio.py:10-29``);
* the shuffle/repeat multi-slot training trick (``mtio.py:72-90``, after
  arXiv:2010.06610) under an explicit PRNG key;
* autoregressive decode of ``fut_window`` steps as a ``lax.scan`` over a
  fixed-size target buffer instead of the reference's growing-concat loop
  (``mtio.py:117-131, 158-164``).  With a causal self-attention mask, step t's
  decoder output at position t is independent of the not-yet-written positions
  > t, so the padded-buffer scan is exactly equivalent.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models.transformer import Transformer, causal_mask
from mansy_immersivevideostreaming_tpu.ops.geometry import periodic_mse, wrap_position


def sinusoidal_pe(max_len: int, d_model: int) -> jnp.ndarray:
    """Classic sin/cos table [max_len, d_model]; reference ``mtio.py:17-24``."""
    position = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d_model, 2).astype(jnp.float32)
                  * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


class ViewportTransformerMTIO(nn.Module):
    """See module docstring.  Defaults mirror reference ``run_models.py``
    (d_model=hidden_dim=512, 2+2 layers, in_channel=2, num_head=3,
    fut_window=15, PE dropout 0.2, repeat_prob 0.5)."""
    in_channel: int = 2
    fut_window: int = 15
    d_model: int = 512
    dim_feedforward: int = 512
    num_head: int = 3
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dropout: float = 0.2
    repeat_prob: float = 0.5
    incremental: bool = True  # KV-cached decode (see _decode_incremental)
    teacher_forcing: bool = False  # single-pass TRAIN decode (see below)
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 opt-in; params f32)

    def setup(self):
        self.embedding = nn.Dense(self.d_model, dtype=self.dtype)
        self.transformer = Transformer(
            d_model=self.d_model, num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward, dtype=self.dtype)
        self.predictor = nn.Dense(self.in_channel * self.num_head)  # head f32
        self.pe = sinusoidal_pe(5000, self.d_model)
        self.pe_dropout = nn.Dropout(self.dropout)

    def _embed(self, x, deterministic: bool):
        """Dense embed + positional encoding + PE dropout
        (reference ``mtio.py:139-144``)."""
        h = self.embedding(x) + self.pe[None, : x.shape[1]]
        return self.pe_dropout(h, deterministic=deterministic)

    def _predict_coords(self, h):
        return nn.sigmoid(self.predictor(h))

    def _decode_incremental(self, memory, current, deterministic: bool):
        """fut_window-step KV-cached decode — O(F) positions total.

        Column-t equivalence with the full causal decode (see
        ``DecoderLayer.step``) makes this produce exactly the reference's
        autoregressive outputs (``mtio.py:150-166``) while doing 1 position
        of decoder work per step instead of re-decoding the whole 1+F
        buffer (the reference and :meth:`_decode_autoregressive` redo
        O(F^2) work).  Returns the raw multi-head predictions [B, F, C].
        """
        F = self.fut_window
        mem_kvs, sa_caches = self.transformer.init_decode_cache(memory, F)
        x_t = current[:, :1]
        preds = []
        for t in range(F):
            h = self.embedding(x_t) + self.pe[None, t: t + 1]
            h = self.pe_dropout(h, deterministic=deterministic)
            out, sa_caches = self.transformer.decode_step(
                h, sa_caches, t, mem_kvs, deterministic)
            pred = self._predict_coords(out[:, 0])
            preds.append(pred)
            x_t = pred[:, None, :]
        return jnp.stack(preds, axis=1)

    def _decode_autoregressive(self, memory, current, deterministic: bool):
        """fut_window-step decode over a fixed [B, 1+F, C] buffer.

        Direct port of reference ``_process_src_current`` (``mtio.py:150-166``)
        and the decode loop of ``sample`` (``mtio.py:117-131``); kept as the
        parity oracle for :meth:`_decode_incremental` (tests/test_mtio.py).
        Returns the raw multi-head predictions [B, F, C].
        """
        B = current.shape[0]
        F = self.fut_window
        C = self.in_channel * self.num_head
        buf0 = jnp.zeros((B, 1 + F, C), current.dtype).at[:, 0].set(current[:, 0])
        mask = causal_mask(1 + F)

        def step(buf, t):
            tgt = self._embed(buf, deterministic)
            out = self.transformer.decode(tgt, memory, mask, deterministic)
            pred = self._predict_coords(out[:, t])
            buf = jax.lax.dynamic_update_slice(buf, pred[:, None, :], (0, t + 1, 0))
            return buf, pred

        # nn.scan would be needed for scanning a method with dropout RNG;
        # a python loop over the static fut_window keeps exact semantics and
        # unrolls into one XLA graph (F <= ~15).
        preds = []
        buf = buf0
        for t in range(F):
            buf, pred = step(buf, t)
            preds.append(pred)
        return jnp.stack(preds, axis=1)

    def _decode_teacher_forced(self, memory, current, future,
                               deterministic: bool):
        """Single-pass TRAINING decode: ground truth in, all steps at once.

        TPU-first opt-in extension (NOT in the reference: ``mtio.py:150-166``
        always feeds back its own predictions during training).  The decoder
        input at position t is the ground-truth viewport t-1 (position 0 is
        ``current``), so the whole fut_window is decoded in ONE causal pass —
        the 15 sequential [B, 1, d] decode calls that make the AR train step
        decode-latency-bound (BASELINE.md round-3 MFU section) become a single
        [B, F, d] pass with fut_window-times-larger matmuls.  Training drops
        the reference's scheduled-sampling-style exposure handling; inference
        (:meth:`sample`) is autoregressive either way, so accuracy must be
        (and is) validated against the AR-trained baseline before use.
        Returns the raw multi-head predictions [B, F, C].
        """
        tgt_in = jnp.concatenate([current, future[:, :-1]], axis=1)
        tgt = self._embed(tgt_in, deterministic)
        out = self.transformer.decode(tgt, memory,
                                      causal_mask(self.fut_window),
                                      deterministic)
        return self._predict_coords(out)

    def __call__(self, history, current, future, train: bool = True):
        """Training forward; reference ``mtio.py:65-92``.

        history [B, M, C_in], current [B, 1, C_in], future [B, F, C_in].
        Returns (pred [B, F, C_in*num_head], gt [B, F, C_in*num_head]).
        Uses the 'shuffle' rng stream for the multi-slot trick and 'dropout'
        for dropout when ``train``.
        """
        if train:
            key = self.make_rng("shuffle")
            k_choice, k_perm = jax.random.split(key)
            B = history.shape[0]
            perms = jax.random.permutation(
                k_perm, jnp.tile(jnp.arange(B), (self.num_head - 1, 1)),
                axis=1, independent=True)
            repeat = jax.random.uniform(k_choice) < self.repeat_prob
            idx0 = jnp.tile(jnp.arange(B), (self.num_head - 1, 1))
            perms = jnp.where(repeat, idx0, perms)

            def slots(x):
                extra = [x[perms[i]] for i in range(self.num_head - 1)]
                return jnp.concatenate([x] + extra, axis=-1)

            multi_history = slots(history)
            multi_current = slots(current)
            multi_future = slots(future)
        else:
            multi_history = jnp.tile(history, (1, 1, self.num_head))
            multi_current = jnp.tile(current, (1, 1, self.num_head))
            multi_future = jnp.tile(future, (1, 1, self.num_head))

        deterministic = not train
        src = self._embed(multi_history, deterministic)
        memory = self.transformer.encode(src, deterministic)
        if train and self.teacher_forcing:
            pred = self._decode_teacher_forced(memory, multi_current,
                                               multi_future, deterministic)
        else:
            decode = (self._decode_incremental if self.incremental
                      else self._decode_autoregressive)
            pred = decode(memory, multi_current, deterministic)
        return pred, multi_future

    def loss_function(self, pred, gt):
        """Sum over heads of mean periodic MSE; reference ``mtio.py:94-104``."""
        loss = 0.0
        for i in range(self.num_head):
            sl = slice(i * self.in_channel, (i + 1) * self.in_channel)
            loss = loss + jnp.mean(periodic_mse(pred[:, :, sl], gt[:, :, sl]))
        return loss

    def sample(self, history, current):
        """Inference: all slots = the input trajectory, per-step ensemble mean
        of the heads, wrapped into [0,1]^2; reference ``mtio.py:106-133``."""
        multi_history = jnp.tile(history, (1, 1, self.num_head))
        multi_current = jnp.tile(current, (1, 1, self.num_head))
        src = self._embed(multi_history, True)
        memory = self.transformer.encode(src, True)
        decode = (self._decode_incremental if self.incremental
                  else self._decode_autoregressive)
        pred = decode(memory, multi_current, True)
        # ensemble average over heads per coordinate (reference mtio.py:125-129)
        B, F, _ = pred.shape
        heads = pred.reshape(B, F, self.num_head, self.in_channel)
        ens = jnp.mean(heads, axis=2)
        return wrap_position(ens)

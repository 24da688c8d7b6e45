"""Tests for the MTIO model: shapes, scan-decode equivalence, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models import (
    ViewportTransformerMTIO, linear_regression_sample,
)
from mansy_immersivevideostreaming_tpu.models.vp_train import (
    create_train_state, make_optimizer, train_step, valid_step, sample_step,
)

MODEL = ViewportTransformerMTIO(d_model=32, dim_feedforward=32, fut_window=5)


@pytest.fixture(scope="module")
def state():
    opt = make_optimizer(1e-3)
    return create_train_state(MODEL, jax.random.PRNGKey(0), his_window=5,
                              optimizer=opt), opt


def _batch(rng, B=4, M=5, F=5):
    return {
        "history": jnp.asarray(rng.random((B, M, 2), np.float32)),
        "current": jnp.asarray(rng.random((B, 1, 2), np.float32)),
        "future": jnp.asarray(rng.random((B, F, 2), np.float32)),
    }


def test_shapes_and_sample_range(state):
    st, _ = state
    rng = np.random.default_rng(0)
    b = _batch(rng)
    out = sample_step(MODEL, st, b["history"], b["current"])
    assert out.shape == (4, 5, 2)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_decode_matches_growing_prefix(state):
    """The fixed-buffer scan decode must equal a growing-prefix decode."""
    st, _ = state
    rng = np.random.default_rng(1)
    b = _batch(rng)

    fast = sample_step(MODEL, st, b["history"], b["current"])

    # Reference-style growing-prefix decode reusing the same trained modules.
    from mansy_immersivevideostreaming_tpu.models.transformer import causal_mask

    def slow_sample(variables, history, current):
        model = MODEL

        def run(mdl):
            mh = jnp.tile(history, (1, 1, mdl.num_head))
            mc = jnp.tile(current, (1, 1, mdl.num_head))
            src = mdl._embed(mh, True)
            memory = mdl.transformer.encode(src, True)
            tgt = mc
            outs = []
            for _ in range(mdl.fut_window):
                L = tgt.shape[1]
                emb = mdl._embed(tgt, True)
                out = mdl.transformer.decode(emb, memory, causal_mask(L), True)
                pred = mdl._predict_coords(out[:, -1])
                tgt = jnp.concatenate([tgt, pred[:, None, :]], axis=1)
                outs.append(pred)
            preds = jnp.stack(outs, axis=1)
            B, F, _ = preds.shape
            heads = preds.reshape(B, F, mdl.num_head, mdl.in_channel)
            from mansy_immersivevideostreaming_tpu.ops.geometry import wrap_position
            return wrap_position(jnp.mean(heads, axis=2))

        return jax.jit(lambda v: model.apply(v, method=lambda m: run(m)))(variables)

    slow = slow_sample({"params": st.params, "batch_stats": st.batch_stats},
                       b["history"], b["current"])
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-4, atol=2e-5)


def test_incremental_decode_matches_buffer_decode(state):
    """KV-cached decode == fixed-buffer full decode, per head, both in
    deterministic sample mode and in the train forward with the repeat slots
    (identical eval metrics is the acceptance bar for the KV cache)."""
    st, _ = state
    rng = np.random.default_rng(7)
    b = _batch(rng, B=6)
    buf_model = ViewportTransformerMTIO(d_model=32, dim_feedforward=32,
                                        fut_window=5, incremental=False)
    variables = {"params": st.params, "batch_stats": st.batch_stats}

    fast = sample_step(MODEL, st, b["history"], b["current"])
    slow = jax.jit(lambda v, h, c: buf_model.apply(
        v, h, c, method=ViewportTransformerMTIO.sample))(
            variables, b["history"], b["current"])
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-4, atol=2e-5)

    # eval-mode training forward (train=False disables dropout and the
    # shuffle RNG, so the two decode paths must agree exactly)
    pf, gf = MODEL.apply(variables, b["history"], b["current"], b["future"],
                         train=False)
    ps, gs = buf_model.apply(variables, b["history"], b["current"],
                             b["future"], train=False)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(ps),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), rtol=0, atol=0)
    np.testing.assert_allclose(float(MODEL.apply(variables, pf, gf,
                                                 method="loss_function")),
                               float(MODEL.apply(variables, ps, gs,
                                                 method="loss_function")),
                               rtol=1e-5)


def test_train_step_decreases_loss(state):
    st, opt = state
    # train_step donates its input state; work on a copy so the shared
    # fixture stays alive for other tests
    st = jax.tree_util.tree_map(jnp.copy, st)
    rng = np.random.default_rng(2)
    b = _batch(rng, B=16)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        st, loss = train_step(MODEL, opt, st, b, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_valid_step_finite(state):
    st, _ = state
    rng = np.random.default_rng(3)
    b = _batch(rng, B=8)
    mse = valid_step(MODEL, st, b)
    assert np.isfinite(float(mse))


def test_linear_regression_matches_polyfit():
    rng = np.random.default_rng(4)
    h = rng.random((6, 5, 2)).astype(np.float32)
    c = rng.random((6, 1, 2)).astype(np.float32)
    got = np.asarray(linear_regression_sample(jnp.asarray(h), jnp.asarray(c), 4))
    merge = np.concatenate([h, c], axis=1)
    t = np.arange(6)
    tf = np.arange(6, 10)
    for i in range(6):
        for a in range(2):
            coef = np.polyfit(t, merge[i, :, a], 1)
            want = coef[0] * tf + coef[1]
            np.testing.assert_allclose(got[i, :, a], want, rtol=1e-3, atol=1e-4)


def test_train_epoch_matches_looped_train_steps(state):
    """On-device epoch scan == looping train_step over the same shuffled
    minibatches (same fold-in rng, same permutation => identical params)."""
    st, opt = state
    rng = np.random.default_rng(3)
    n, bs = 20, 8
    data = {
        "history": jnp.asarray(rng.random((n, 5, 2), dtype=np.float32)),
        "current": jnp.asarray(rng.random((n, 1, 2), dtype=np.float32)),
        "future": jnp.asarray(rng.random((n, 5, 2), dtype=np.float32)),
    }
    key = jax.random.PRNGKey(9)
    perm = np.random.default_rng(4).permutation(n)

    from mansy_immersivevideostreaming_tpu.models.vp_train import train_epoch

    st_loop = jax.tree_util.tree_map(jnp.copy, st)
    losses_loop = []
    for start in range(0, n - n % bs, bs):
        ib = perm[start: start + bs]
        batch = {k: v[jnp.asarray(ib)] for k, v in data.items()}
        st_loop, loss = train_step(MODEL, opt, st_loop, batch, key)
        losses_loop.append(float(loss))

    st_scan, losses_scan = train_epoch(
        MODEL, opt, jax.tree_util.tree_map(jnp.copy, st), data, bs,
        jnp.asarray(perm), key)
    np.testing.assert_allclose(np.asarray(losses_scan), losses_loop, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        st_scan.params, st_loop.params)


def test_teacher_forced_decode_consistent_with_ar(state):
    """Self-consistency of the single-pass teacher-forced train decode
    (TPU-first extension, models/mtio.py _decode_teacher_forced): feeding the
    AR decoder's own predictions back as the "ground truth" must reproduce
    exactly those predictions — pins the causal mask, positional encoding,
    and input-shift alignment to the reference's AR semantics
    (ref mtio.py:150-166)."""
    st, _ = state
    rng = np.random.default_rng(11)
    b = _batch(rng, B=3)
    variables = {"params": st.params, "batch_stats": st.batch_stats}

    def run(mdl):
        mh = jnp.tile(b["history"], (1, 1, mdl.num_head))
        mc = jnp.tile(b["current"], (1, 1, mdl.num_head))
        src = mdl._embed(mh, True)
        memory = mdl.transformer.encode(src, True)
        ar = mdl._decode_incremental(memory, mc, True)
        fake_future = ar  # positions shifted inside _decode_teacher_forced
        tf = mdl._decode_teacher_forced(memory, mc, fake_future, True)
        return ar, tf

    ar, tf = MODEL.apply(variables, method=lambda m: run(m))
    np.testing.assert_allclose(np.asarray(tf), np.asarray(ar),
                               rtol=2e-4, atol=2e-5)


def test_teacher_forcing_train_step_decreases_loss():
    tf_model = ViewportTransformerMTIO(d_model=32, dim_feedforward=32,
                                       fut_window=5, teacher_forcing=True)
    opt = make_optimizer(1e-3)
    st = create_train_state(tf_model, jax.random.PRNGKey(3), his_window=5,
                            optimizer=opt)
    rng = np.random.default_rng(5)
    b = _batch(rng, B=16)
    key = jax.random.PRNGKey(4)
    losses = []
    for _ in range(12):
        st, loss = train_step(tf_model, opt, st, b, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    # inference path is unchanged (AR sample) and in range
    out = sample_step(tf_model, st, b["history"], b["current"])
    assert out.shape == (16, 5, 2)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

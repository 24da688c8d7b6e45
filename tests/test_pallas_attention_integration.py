"""MTIO sample output must be identical with and without the Pallas attention
core (deterministic path)."""

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
from mansy_immersivevideostreaming_tpu.models import vp_train


def test_sample_same_with_pallas_attention():
    m_ref = ViewportTransformerMTIO(d_model=32, dim_feedforward=32, fut_window=3)
    m_pal = ViewportTransformerMTIO(d_model=32, dim_feedforward=32, fut_window=3,
                                    use_pallas=True)
    opt = vp_train.make_optimizer(1e-3)
    st = vp_train.create_train_state(m_ref, jax.random.PRNGKey(0), 5, opt)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.random((4, 5, 2), np.float32))
    c = jnp.asarray(rng.random((4, 1, 2), np.float32))
    # same params work for both (use_pallas only switches the compute path)
    out_ref = m_ref.apply({"params": st.params, "batch_stats": st.batch_stats},
                          h, c, method=ViewportTransformerMTIO.sample)
    out_pal = m_pal.apply({"params": st.params, "batch_stats": st.batch_stats},
                          h, c, method=ViewportTransformerMTIO.sample)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_pal),
                               rtol=2e-4, atol=2e-5)

"""Linear-regression viewport baseline as a closed-form batched solve.

The reference fits one sklearn ``LinearRegression`` per sample per axis in a
Python loop (reference
``viewport_prediction/models/linear_regression.py:16-33``).  An ordinary
1-D least-squares fit has a closed form, so the whole batch is a handful of
vectorized reductions here — no loop, no sklearn.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_regression_sample(history: jnp.ndarray, current: jnp.ndarray,
                             fut_window: int) -> jnp.ndarray:
    """Extrapolate ``fut_window`` steps from (history ++ current).

    history [B, M, 2], current [B, 1, 2] -> [B, F, 2].
    Matches the reference numerically: x-grid = arange(M+1), prediction grid =
    arange(M+1, M+1+F), per-axis 1-D OLS with intercept.
    """
    merge = jnp.concatenate([history, current], axis=1)  # [B, P, 2]
    P = merge.shape[1]
    t = jnp.arange(P, dtype=merge.dtype)
    t_mean = jnp.mean(t)
    t_center = t - t_mean                     # [P]
    var_t = jnp.sum(t_center * t_center)
    y_mean = jnp.mean(merge, axis=1, keepdims=True)          # [B, 1, 2]
    slope = jnp.einsum("p,bpc->bc", t_center, merge - y_mean) / var_t  # [B, 2]
    intercept = y_mean[:, 0] - slope * t_mean                # [B, 2]
    t_fut = jnp.arange(P, P + fut_window, dtype=merge.dtype)  # [F]
    return intercept[:, None, :] + slope[:, None, :] * t_fut[None, :, None]

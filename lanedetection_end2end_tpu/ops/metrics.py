"""Evaluation metrics.

Vectorized trapezoidal exact-area metric between two order-2 polynomials,
replacing the reference's per-point Python loop
(Birds_Eye_View_Loss/Loss_crit.py:12-35, class `polynomial`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def trapezoidal_area(pred: jax.Array, gt: jax.Array, a: float = 0.0,
                     b: float = 0.7, n: int = 100) -> jax.Array:
    """Exact area between |x_pred(y) - x_gt(y)| via the trapezium rule.

    pred/gt: (..., 3) coefficients [a1, b1, c1] of x = a1*y^2 + b1*y + c1.
    Lower-order coefficient arrays are zero-padded on the left by callers.
    Returns per-row areas with the same endpoint-halving as the reference
    (Loss_crit.py:27-35).
    """
    h = (b - a) / n
    ys = jnp.asarray(np.linspace(a, b, n + 1))  # n+1 sample points
    # |diff| at each sample: (..., n+1)
    d = pred - gt
    vals = jnp.abs(d[..., 0:1] * ys**2 + d[..., 1:2] * ys + d[..., 2:3])
    s = vals[..., 0] / 2.0 + jnp.sum(vals[..., 1:-1], axis=-1) + vals[..., -1] / 2.0
    return s * h


def egolane_exact_area(beta0, beta1, gt0, gt1) -> jax.Array:
    """Mean of the two egolane trapezoidal areas halved — the per-batch metric
    tracked by the training driver (Birds_Eye_View_Loss/main.py:273-280)."""
    trap_left = trapezoidal_area(beta0.reshape(gt0.shape), gt0)
    trap_right = trapezoidal_area(beta1.reshape(gt1.shape), gt1)
    return jnp.mean((trap_left + trap_right) / 2.0)

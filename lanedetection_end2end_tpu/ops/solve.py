"""Tiny symmetric-positive-definite solves, unrolled for TPU.

The WLS normal equations are (order+1)x(order+1) SPD systems with
order <= 3 (Networks/LSQ_layer.py:103-140). `jnp.linalg.solve` lowers to a
batched LU factorization that costs milliseconds on TPU for thousands of
4x4 systems; an unrolled Cholesky is pure vectorized element-wise arithmetic
(VPU), runs in microseconds, and is differentiable through `jnp` ops — the
JAX analog of the reference's hand-written GELS autograd function
(Backprojection_Loss/Networks/gels.py:9-25).
"""

from __future__ import annotations

import jax.numpy as jnp


def spd_solve(Z, x):
    """Solve Z b = x for SPD Z of static size n<=8, batched over leading dims.

    Args:
      Z: (..., n, n) symmetric positive definite.
      x: (..., n).
    Returns:
      b: (..., n).
    """
    n = Z.shape[-1]
    if n > 8:
        return jnp.linalg.solve(Z, x[..., None])[..., 0]
    # Cholesky Z = L L^T, unrolled (static n)
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = Z[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(d)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = Z[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = x
    y = [None] * n
    for i in range(n):
        s = x[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T b = y
    b = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * b[k]
        b[i] = s / L[i][i]
    return jnp.stack(b, axis=-1)

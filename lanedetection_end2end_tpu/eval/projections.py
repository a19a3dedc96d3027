"""Backprojection of fitted BEV polynomials to original-image coordinates.

Parity with `Projections` (Backprojection_Loss/test.py:132-186), redesigned:
the reference precomputes per-batch repeated tensors and runs four separate
`bmm`s (one per lane, test.py:69-73); here the Vandermonde rows and M_inv are
(56, order+1) / (3, 3) constants and ALL lanes of all images backproject in
one einsum — jittable, batch-size agnostic, float32 with HIGHEST precision
(y_eval^3 ~ 1.4e7 would lose pixels in bf16).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.geometry import bev_matrices_pixel


class Projections:
    """Maps (B, C, order+1) BEV coefficients -> (B, C, 56) original-image x."""

    def __init__(self, resize: int = 256, order: int = 3,
                 no_mapping: bool = False, dtype=jnp.float32):
        if order not in (0, 1, 2, 3):
            raise NotImplementedError(
                f"Requested order {order} for polynomial fit is not implemented")
        M, M_inv = bev_matrices_pixel(resize, no_mapping)
        start, delta = 160, 10
        # factor hard-coded 2.5 in the reference (test.py:20-21) == 640/resize
        self.factor = 640.0 / resize
        y_d = (np.arange(start, 720, delta, dtype=np.float64) - 80.0) / self.factor
        y_prime = (M[1, 1] * y_d + M[1, 2]) / (M[2, 1] * y_d + M[2, 2])
        y_eval = (resize - 1.0) - y_prime  # 255 - y' at resize=256 (test.py:146)
        cols = [y_eval ** p for p in range(order, 0, -1)] + [np.ones_like(y_eval)]
        self.num_heights = y_d.shape[0]  # 56
        self.Y = jnp.asarray(np.stack(cols, axis=1), dtype=dtype)  # (56, o+1)
        self.y_prime = jnp.asarray(y_prime, dtype=dtype)  # (56,)
        self.M_inv = jnp.asarray(M_inv, dtype=dtype)

    def compute_coordinates(self, beta: jax.Array) -> jax.Array:
        """beta: (..., order+1) -> x in ORIGINAL image pixels, (..., 56).

        Mirrors test.py:172-186: sample x' = Y @ beta at the 56 heights,
        backproject through M_inv with perspective divide, scale by 2.5.
        """
        x_prime = jnp.einsum("...k,hk->...h", beta.astype(jnp.float32),
                             self.Y, precision=jax.lax.Precision.HIGHEST)
        Mi = self.M_inv
        yp = self.y_prime
        denom = Mi[2, 0] * x_prime + Mi[2, 1] * yp + Mi[2, 2]
        x_cal = (Mi[0, 0] * x_prime + Mi[0, 1] * yp + Mi[0, 2]) / denom
        return x_cal * self.factor

    def compute_coordinates_with_M(self, beta: jax.Array, M_b: jax.Array,
                                   M_inv_b: jax.Array) -> jax.Array:
        """Per-sample-homography variant (learned-homography option,
        geometry/dlt.py): beta (B, C, order+1), M_b/M_inv_b (B, 3, 3) ->
        (B, C, 56) original-image x."""
        M_b = M_b.astype(jnp.float32)
        Mi = M_inv_b.astype(jnp.float32)
        y_d = ((jnp.arange(160.0, 720.0, 10.0, dtype=jnp.float32) - 80.0)
               / self.factor)[None, :]                             # (1, 56)
        y_prime = ((M_b[:, 1, 1:2] * y_d + M_b[:, 1, 2:3])
                   / (M_b[:, 2, 1:2] * y_d + M_b[:, 2, 2:3]))      # (B, 56)
        resize = 640.0 / self.factor
        y_eval = (resize - 1.0) - y_prime
        order = self.Y.shape[1] - 1
        Yb = jnp.stack([y_eval ** p for p in range(order, 0, -1)]
                       + [jnp.ones_like(y_eval)], axis=-1)     # (B, 56, o+1)
        x_prime = jnp.einsum("bck,bhk->bch", beta.astype(jnp.float32), Yb,
                             precision=jax.lax.Precision.HIGHEST)
        yp = y_prime[:, None, :]                               # (B, 1, 56)
        denom = (Mi[:, 2, 0, None, None] * x_prime
                 + Mi[:, 2, 1, None, None] * yp + Mi[:, 2, 2, None, None])
        x_cal = (Mi[:, 0, 0, None, None] * x_prime
                 + Mi[:, 0, 1, None, None] * yp
                 + Mi[:, 0, 2, None, None]) / denom
        return x_cal * self.factor

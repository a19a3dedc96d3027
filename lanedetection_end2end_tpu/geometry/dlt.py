"""Differentiable DLT: a learned-homography layer (the README's "finetuned
homography" configuration, `/root/reference/README.md:93`).

The reference's only code trace of this idea is the dormant `DLT` branch in
the unimportable legacy file
(Backprojection_Loss/Networks/Least_squares_net.py:225-282): a tiny
spatial-transformer head predicts 3 offsets, the offsets perturb the target
trapezoid of the BEV mapping, and a 6-equation DLT system re-solves the
homography per sample — differentiably, so the backprojection loss finetunes
the mapping end to end. This module is a TPU-native redesign of that idea
(not a port — the reference code cannot even be imported):

- The homography is constrained to the row-separable form

      H = [[h0, h1, h2],
           [ 0, h3, h4],
           [ 0, h5,  1]]

  (the reference's 6-DOF structure, Least_squares_net.py:278-280). This
  keeps y' a function of y alone, so the WLS fitter's separable
  row-factorized path still applies with per-sample coefficient rows — the
  heavy W-axis reductions stay homography-independent and only tiny
  (B, H, order+1) host-free recomputations depend on the learned matrix.
- The 6x6 system is built as a batched constant-plus-offset tensor and
  solved with `jnp.linalg.solve` (natively differentiable; the reference
  hand-rolls normal equations + a per-sample `torch.gesv` loop, which is
  redundant for an exactly-determined square system).
- Offsets perturb the DST trapezoid: dx_left moves both left anchors,
  dx_right both right anchors, dy_top the top edge (the reference ties its
  3 outputs the same way, Least_squares_net.py:264-272).

Used by `models/dlt.py::HomographyHead` (the predictor) and opted in via
`LaneConfig.learn_homography`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def dlt_anchor_points(resize: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """(src, dst) 4-point trapezoids of the BP pixel homography
    (Backprojection_Loss/Networks/utils.py:104-121), order:
    [top-left, top-right, bottom-left, bottom-right]."""
    w = 2 * resize
    y_top = 0.20 * resize
    y_bot = resize - 1.0
    src = np.float64([[0.45 * w, y_top], [0.55 * w, y_top],
                      [0.02 * w, y_bot], [0.97 * w, y_bot]])
    dst = np.float64([[0.45 * w, y_top], [0.55 * w, y_top],
                      [0.45 * w, y_bot], [0.55 * w, y_bot]])
    return src, dst


def dlt_homography(offsets: jax.Array, resize: int = 256
                   ) -> tuple[jax.Array, jax.Array]:
    """Per-sample constrained homographies from learned trapezoid offsets.

    Args:
      offsets: (B, 3) in NORMALIZED units (the head emits tanh/16,
        Least_squares_net.py:261): columns (dx_left, dx_right, dy_top),
        scaled here by the image width / height to pixels.
      resize: image height; width is 2*resize.

    Returns:
      (M, M_inv): (B, 3, 3) pairs, f32. At zero offsets M equals the fixed
      `bev_matrices_pixel` matrix (verified by tests/test_dlt.py — the fixed
      8-DOF solution already has the separable structure, so the 6-DOF
      system recovers it exactly).

    Unknowns h = (h0, h1, h2, h3, h4, h5) in the structure above. With
    denominator D(y) = h5*y + 1:
      x-eq at (x, y) -> u:  h0*x + h1*y + h2 - u*y*h5 = u
      y-eq at  y     -> v:  h3*y + h4 - v*y*h5 = v
    Six equations: y-map at both rows, x-map at all four anchors.
    """
    src, dst = dlt_anchor_points(resize)
    (xs_tl, y_top), (xs_tr, _), (xs_bl, y_bot), (xs_br, _) = src
    (xd_l, _), (xd_r, _), _, _ = dst

    B = offsets.shape[0]
    off = offsets.astype(jnp.float32)
    w = 2.0 * resize
    dxl = off[:, 0] * w
    dxr = off[:, 1] * w
    dy = off[:, 2] * resize

    u_l = xd_l + dxl        # left-lane target x (both rows)
    u_r = xd_r + dxr        # right-lane target x
    v_top = y_top + dy      # top edge lands here; bottom edge stays fixed
    zeros = jnp.zeros((B,), jnp.float32)
    ones = jnp.ones((B,), jnp.float32)
    c = lambda v: jnp.full((B,), float(v), jnp.float32)

    def x_eq(x, y, u):
        return (jnp.stack([c(x), c(y), ones, zeros, zeros, -u * y], axis=-1),
                u)

    def y_eq(y, v):
        return (jnp.stack([zeros, zeros, zeros, c(y), ones, -v * y], axis=-1),
                v)

    rows, rhs = zip(y_eq(y_bot, c(y_bot)),
                    x_eq(xs_bl, y_bot, u_l),
                    x_eq(xs_br, y_bot, u_r),
                    y_eq(y_top, v_top),
                    x_eq(xs_tl, y_top, u_l),
                    x_eq(xs_tr, y_top, u_r))
    A = jnp.stack(rows, axis=1)            # (B, 6, 6)
    b = jnp.stack(rhs, axis=1)[..., None]  # (B, 6, 1)
    h = jnp.linalg.solve(A, b)[..., 0]     # (B, 6)

    z1 = jnp.zeros((B, 1), jnp.float32)
    o1 = jnp.ones((B, 1), jnp.float32)
    M = jnp.concatenate(
        [h[:, 0:3], z1, h[:, 3:5], z1, h[:, 5:6], o1],
        axis=1).reshape(B, 3, 3)
    # Normalize the inverse to the reference convention H[2,2] = 1
    # (homographies are scale-free; get_perspective_transform pins [2,2]=1).
    M_inv = jnp.linalg.inv(M)
    M_inv = M_inv / M_inv[:, 2:3, 2:3]
    return M, M_inv

"""Pure-function projective geometry for the bird's-eye-view (BEV) transform.

Self-contained: the perspective transform is an 8x8 linear solve (no cv2
dependency at runtime). Two parameterizations exist in the reference and both
are kept, plus the evaluation-time normalized variant:

- `bev_matrices_normalized`: normalized [0,1]x[0,1] coordinates
  (Birds_Eye_View_Loss/Networks/LSQ_layer.py:17-32).
- `bev_matrices_pixel`: pixel coordinates with an identity escape hatch
  (`no_mapping`) (Backprojection_Loss/Networks/utils.py:104-124).
- `eval_matrices_normalized`: the y_start=0.3 normalized trapezoid used by
  `write_lsq_results` (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:340-346)
  and the BP-tree coordinate utilities.

Because the homography is a compile-time constant, the projected grid is
precomputed ONCE on the host as a single (H*W, 2) array shared by every batch
element — unlike the reference, which re-runs a batched `bmm` of the constant
grid against the constant matrix on every forward pass
(Birds_Eye_View_Loss/Networks/LSQ_layer.py:84-87).
"""

from __future__ import annotations

import numpy as np


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography H with dst ~ H @ src (homogeneous), from 4 point pairs.

    Drop-in equivalent of cv2.getPerspectiveTransform: solves the standard
    8x8 linear system for the 8 DOF with H[2,2] = 1.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    if src.shape != (4, 2) or dst.shape != (4, 2):
        raise ValueError("src and dst must be (4, 2) arrays")
    A = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros((8,), dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def bev_matrices_normalized() -> tuple[np.ndarray, np.ndarray]:
    """(M, M_inv) in normalized coordinates.

    Trapezoid of Birds_Eye_View_Loss/Networks/LSQ_layer.py:23-29:
    y_start=0.3, src x in {0.45, 0.55, 0.1, 0.9}, dst x in {0.45, 0.55}.
    """
    y_start, y_stop = 0.3, 1.0
    src = np.float64([[0.45, y_start], [0.55, y_start], [0.1, y_stop], [0.9, y_stop]])
    dst = np.float64([[0.45, y_start], [0.55, y_start], [0.45, y_stop], [0.55, y_stop]])
    return get_perspective_transform(src, dst), get_perspective_transform(dst, src)


def bev_matrices_pixel(resize: int = 256, no_mapping: bool = False
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(M, M_inv) in pixel coordinates of the (resize, 2*resize) image.

    Trapezoid of Backprojection_Loss/Networks/utils.py:104-121:
    y_start=0.2*resize, y_stop=resize-1, src x in {0.45, 0.55, 0.02, 0.97}
    * 2*resize, dst x in {0.45, 0.55} * 2*resize. `no_mapping` yields identity.
    """
    if no_mapping:
        eye = np.identity(3)
        return eye, eye.copy()
    w = 2 * resize
    y_start = 0.20 * resize
    y_stop = resize - 1
    src = np.float64([[0.45 * w, y_start], [0.55 * w, y_start],
                      [0.02 * w, y_stop], [0.97 * w, y_stop]])
    dst = np.float64([[0.45 * w, y_start], [0.55 * w, y_start],
                      [0.45 * w, y_stop], [0.55 * w, y_stop]])
    return get_perspective_transform(src, dst), get_perspective_transform(dst, src)


def eval_matrices_normalized() -> tuple[np.ndarray, np.ndarray]:
    """(M, M_inv) of the normalized y_start=0.3 trapezoid used at evaluation
    time by `write_lsq_results` (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:340-346).
    Identical to `bev_matrices_normalized` (kept as a named alias so call sites
    document which reference path they mirror)."""
    return bev_matrices_normalized()


def homogeneous_transform(M: np.ndarray, x: np.ndarray, y: np.ndarray
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Apply a 3x3 homography to point arrays; perspective divide included.

    Mirrors `homogenous_transformation`
    (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:130-145). Works with both
    numpy and jax arrays.
    """
    denom = M[2, 0] * x + M[2, 1] * y + M[2, 2]
    x_out = (M[0, 0] * x + M[0, 1] * y + M[0, 2]) / denom
    y_out = (M[1, 0] * x + M[1, 1] * y + M[1, 2]) / denom
    return x_out, y_out


def base_grid(height: int, width: int, normalized: bool) -> np.ndarray:
    """Homogeneous pixel-center grid, shape (H*W, 3).

    normalized=True: x in [0, 1-1/W], y in [0, 1-1/H]
      (Birds_Eye_View_Loss/Networks/LSQ_layer.py:70-78).
    normalized=False: integer pixel coordinates 0..W-1 / 0..H-1
      (Backprojection_Loss/Networks/LSQ_layer.py:50-61).
    """
    if normalized:
        xs = np.linspace(0.0, 1.0 - 1.0 / width, width)
        ys = np.linspace(0.0, 1.0 - 1.0 / height, height)
    else:
        xs = np.arange(width, dtype=np.float64)
        ys = np.arange(height, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)  # (H, W)
    ones = np.ones_like(gx)
    return np.stack([gx, gy, ones], axis=-1).reshape(height * width, 3)


def projective_grid(M: np.ndarray, height: int, width: int, normalized: bool
                    ) -> np.ndarray:
    """BEV-projected sampling grid, shape (H*W, 2) of (x', y').

    grid = divide((base @ M^T)[:, :2], (base @ M^T)[:, 2:]) — the constant the
    reference recomputes per batch via bmm
    (Birds_Eye_View_Loss/Networks/LSQ_layer.py:85-87). Computed once in float64
    on the host; callers cast to the compute dtype.
    """
    g = base_grid(height, width, normalized) @ np.asarray(M, dtype=np.float64).T
    return g[:, :2] / g[:, 2:3]

import numpy as np
import pytest

from lanedetection_end2end_tpu.geometry import (
    get_perspective_transform, bev_matrices_normalized, bev_matrices_pixel,
    homogeneous_transform, base_grid, projective_grid,
)


def test_perspective_transform_maps_corners():
    src = np.float64([[0.45, 0.3], [0.55, 0.3], [0.1, 1.0], [0.9, 1.0]])
    dst = np.float64([[0.45, 0.3], [0.55, 0.3], [0.45, 1.0], [0.55, 1.0]])
    M = get_perspective_transform(src, dst)
    x, y = homogeneous_transform(M, src[:, 0], src[:, 1])
    np.testing.assert_allclose(np.stack([x, y], 1), dst, atol=1e-10)


def test_perspective_matches_cv2_if_available():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(5):
        src = rng.uniform(0, 1, (4, 2)).astype(np.float32)
        dst = rng.uniform(0, 1, (4, 2)).astype(np.float32)
        try:
            M_cv = cv2.getPerspectiveTransform(src, dst)
        except cv2.error:
            continue
        M = get_perspective_transform(src, dst)
        np.testing.assert_allclose(M, M_cv, atol=1e-4)


def test_inverse_roundtrip():
    M, M_inv = bev_matrices_normalized()
    prod = M @ M_inv
    np.testing.assert_allclose(prod / prod[2, 2], np.eye(3), atol=1e-10)
    rng = np.random.default_rng(1)
    x, y = rng.uniform(0.1, 0.9, 50), rng.uniform(0.35, 0.99, 50)
    xp, yp = homogeneous_transform(M, x, y)
    xb, yb = homogeneous_transform(M_inv, xp, yp)
    np.testing.assert_allclose(xb, x, atol=1e-9)
    np.testing.assert_allclose(yb, y, atol=1e-9)


def test_pixel_matrices_no_mapping_identity():
    M, M_inv = bev_matrices_pixel(256, no_mapping=True)
    np.testing.assert_allclose(M, np.eye(3))
    np.testing.assert_allclose(M_inv, np.eye(3))


def test_pixel_matrices_fixed_points():
    # The dst trapezoid corners must be the images of the src corners.
    resize = 256
    M, _ = bev_matrices_pixel(resize)
    w = 2 * resize
    src = np.float64([[0.45 * w, 0.2 * resize], [0.55 * w, 0.2 * resize],
                      [0.02 * w, resize - 1], [0.97 * w, resize - 1]])
    dst = np.float64([[0.45 * w, 0.2 * resize], [0.55 * w, 0.2 * resize],
                      [0.45 * w, resize - 1], [0.55 * w, resize - 1]])
    x, y = homogeneous_transform(M, src[:, 0], src[:, 1])
    np.testing.assert_allclose(np.stack([x, y], 1), dst, atol=1e-8)


def test_base_grid_shapes_and_ranges():
    g = base_grid(4, 8, normalized=True)
    assert g.shape == (32, 3)
    assert g[:, 0].max() == pytest.approx(1 - 1 / 8)
    assert g[:, 1].max() == pytest.approx(1 - 1 / 4)
    assert np.all(g[:, 2] == 1)
    gp = base_grid(4, 8, normalized=False)
    assert gp[:, 0].max() == 7 and gp[:, 1].max() == 3


def test_projective_grid_identity():
    g = projective_grid(np.eye(3), 4, 8, normalized=False)
    base = base_grid(4, 8, normalized=False)
    np.testing.assert_allclose(g, base[:, :2], atol=1e-12)

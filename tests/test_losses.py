import numpy as np
import jax.numpy as jnp
import pytest

from lanedetection_end2end_tpu.ops.losses import (
    area_loss, mse_params_loss, weighted_cross_entropy, bce_with_logits,
    cross_entropy_logits, BackprojectionLoss,
)
from lanedetection_end2end_tpu.ops.metrics import trapezoidal_area


def _numeric_area(pred, gt, weight, t=0.7, n=200000):
    y = np.linspace(0, t, n)
    d = np.polyval(pred, y) - np.polyval(gt, y)
    if weight == "none":
        w = 1.0
    elif weight == "linear":
        w = 1 - y
    else:
        w = 1 - np.sqrt(y)
    return np.trapz(w * d * d, y)


@pytest.mark.parametrize("weight", ["none", "linear", "quadratic"])
def test_area_loss_closed_form_matches_numeric(weight):
    rng = np.random.default_rng(0)
    pred = rng.normal(0, 0.3, (4, 3))
    gt = rng.normal(0, 0.3, (4, 3))
    gt[gt == 0] = 0.1
    got = float(area_loss(jnp.asarray(pred), jnp.asarray(gt), 2, weight))
    want = np.mean([_numeric_area(pred[i], gt[i], weight) for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_area_loss_order1():
    pred = np.array([[0.2, 0.5]])
    gt = np.array([[0.1, 0.4]])
    got = float(area_loss(jnp.asarray(pred), jnp.asarray(gt), 1))
    y = np.linspace(0, 0.7, 100000)
    want = np.trapz(((pred[0, 0] - gt[0, 0]) * y + pred[0, 1] - gt[0, 1]) ** 2, y)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_area_loss_masks_absent_lanes():
    pred = jnp.asarray([[0.5, 0.5, 0.5], [0.9, 0.9, 0.9]])
    gt = jnp.asarray([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0]])  # lane 2 absent
    only_first = float(area_loss(pred[:1], gt[:1], 2))
    both = float(area_loss(pred, gt, 2))
    np.testing.assert_allclose(both, only_first, rtol=1e-6)
    # all absent -> 0 (Loss_crit.py:133)
    assert float(area_loss(pred, jnp.zeros((2, 3)), 2)) == 0.0


def test_trapezoidal_doctest_values():
    """The commented doctests of Loss_crit.py:38-44."""
    p1 = jnp.asarray([[0.0, 1.0, 0.0]])
    p2 = jnp.asarray([[0.0, 0.0, 0.0]])
    # int_{-1}^{1} |y| dy = 1
    got = float(trapezoidal_area(p1, p2, a=-1, b=1)[0])
    np.testing.assert_allclose(got, 1.0, rtol=1e-3)
    # int_0^1 |y - y^2| dy = 1/6
    p3 = jnp.asarray([[1.0, 0.0, 0.0]])
    got = float(trapezoidal_area(p1, p3, a=0, b=1)[0])
    np.testing.assert_allclose(got, 1 / 6, rtol=1e-3)


def test_mse_params_loss():
    pred = jnp.asarray([[1.0, 2.0, 3.0]])
    gt = jnp.asarray([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(mse_params_loss(pred, gt)), (1 + 4 + 9) / 3)


def test_weighted_cross_entropy_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 1, (2, 8, 16, 3)).astype(np.float32)
    targets = rng.integers(0, 3, (2, 8, 16))
    weights = np.array([1.0, 30.0, 30.0], dtype=np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(targets),
                                       jnp.asarray(weights)))
    crit = torch.nn.CrossEntropyLoss(torch.tensor(weights))
    want = crit(torch.tensor(logits).permute(0, 3, 1, 2),
                torch.tensor(targets, dtype=torch.long)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_with_logits_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (4, 10)).astype(np.float32)
    targets = rng.integers(0, 2, (4, 10)).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                        torch.tensor(targets)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_logits_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.normal(0, 1, (4, 3, 4)).astype(np.float32)  # (B, 3 types, 4 lanes)
    targets = rng.integers(0, 3, (4, 4))
    got = float(cross_entropy_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                       torch.tensor(targets, dtype=torch.long)).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_backprojection_loss_reference_constants():
    """The 56 sampling heights and masked-MSE semantics of
    Backprojection_Loss/Loss_crit.py:161-218, against a float64 oracle."""
    bp = BackprojectionLoss(resize=256, order=3)
    assert bp.num_heights == 56
    rng = np.random.default_rng(4)
    # Realistic lane-scale coefficients: x_prime stays within the image, as a
    # trained WLS layer produces (random huge cubics hit the homography
    # singularity and only measure f32 cancellation, not the loss math).
    params = (rng.normal(0, 1, (3, 4)) * np.array([2e-7, 5e-5, 0.3, 30.0])
              + np.array([0, 0, 0.2, 220.0]))
    x_gt = rng.uniform(100, 411, (3, 56))
    valid = (rng.uniform(0, 1, (3, 56)) > 0.3).astype(np.float64)

    loss, x_cal = bp(jnp.asarray(params, jnp.float32), jnp.asarray(x_gt),
                     jnp.asarray(valid))
    # float64 oracle of the same math
    from lanedetection_end2end_tpu.geometry import bev_matrices_pixel
    M, M_inv = bev_matrices_pixel(256)
    y_d = (np.arange(160, 720, 10) - 80.0) / 2.5
    y_prime = (M[1, 1] * y_d + M[1, 2]) / (M[2, 1] * y_d + M[2, 2])
    y_eval = 255.0 - y_prime
    Y = np.stack([y_eval**3, y_eval**2, y_eval, np.ones(56)], 1)
    x_prime = params @ Y.T
    denom = M_inv[2, 0] * x_prime + M_inv[2, 1] * y_prime + M_inv[2, 2]
    x_cal_ref = (M_inv[0, 0] * x_prime + M_inv[0, 1] * y_prime + M_inv[0, 2]) / denom
    err = (x_gt - x_cal_ref) * valid
    want = err.flatten() @ err.flatten() / valid.sum()
    # Random (untrained-scale) cubic coefficients amplify f32 cancellation in
    # the y^3 term; 5e-3 relative on this adversarial input corresponds to
    # sub-pixel x_cal agreement, which the assertion below pins directly.
    np.testing.assert_allclose(float(loss), want, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(x_cal), x_cal_ref * valid,
                               rtol=1e-3, atol=1e-2)


def test_backprojection_loss_zero_valid():
    bp = BackprojectionLoss(resize=256, order=2)
    loss, _ = bp(jnp.ones((1, 3)), jnp.zeros((1, 56)), jnp.zeros((1, 56)))
    assert float(loss) == 0.0

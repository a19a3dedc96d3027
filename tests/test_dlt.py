"""Learned-homography (DLT) option: geometry, fit, loss, and model wiring.

The feature chases the reference README's "finetuned homography"
configuration (README.md:93); its only code trace is the dormant DLT branch
in the unimportable legacy file
(Backprojection_Loss/Networks/Least_squares_net.py:225-282)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanedetection_end2end_tpu.config import bp_defaults
from lanedetection_end2end_tpu.geometry import bev_matrices_pixel
from lanedetection_end2end_tpu.geometry.dlt import (
    dlt_anchor_points, dlt_homography)
from lanedetection_end2end_tpu.geometry.homography import (
    homogeneous_transform)
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.ops.losses import BackprojectionLoss
from lanedetection_end2end_tpu.ops.wls import WLSFitter


RESIZE = 64


def test_zero_offsets_reproduce_fixed_matrix():
    """The fixed 8-DOF solution has the separable structure, so the 6-DOF
    DLT system recovers it exactly at zero offsets."""
    M_fixed, M_inv_fixed = bev_matrices_pixel(RESIZE)
    assert abs(M_fixed[1, 0]) < 1e-9 and abs(M_fixed[2, 0]) < 1e-9
    M, M_inv = dlt_homography(jnp.zeros((2, 3)), RESIZE)
    np.testing.assert_allclose(np.asarray(M[0]), M_fixed, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(M[1]), M_fixed, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(M_inv[0]), M_inv_fixed, rtol=1e-4, atol=1e-3)


def test_offsets_move_dst_anchors():
    """M maps the src trapezoid onto the offset dst trapezoid: dx_left on
    both left anchors, dx_right on both right, dy_top on the top edge."""
    off = jnp.asarray([[0.01, -0.02, 0.015]])
    M, M_inv = dlt_homography(off, RESIZE)
    M0 = np.asarray(M[0], dtype=np.float64)
    src, dst = dlt_anchor_points(RESIZE)
    w = 2 * RESIZE
    dxl, dxr, dy = 0.01 * w, -0.02 * w, 0.015 * RESIZE
    expected = dst + np.array([[dxl, dy], [dxr, dy], [dxl, 0.0], [dxr, 0.0]])
    x_out, y_out = homogeneous_transform(M0, src[:, 0], src[:, 1])
    np.testing.assert_allclose(x_out, expected[:, 0], atol=1e-3)
    np.testing.assert_allclose(y_out, expected[:, 1], atol=1e-3)
    # inverse really inverts (projectively: round-trip the anchor points)
    xb, yb = homogeneous_transform(np.asarray(M_inv[0], np.float64),
                                   x_out, y_out)
    np.testing.assert_allclose(xb, src[:, 0], atol=1e-3)
    np.testing.assert_allclose(yb, src[:, 1], atol=1e-3)


def test_fit_with_M_matches_constant_path():
    M_fixed, _ = bev_matrices_pixel(RESIZE)
    fitter = WLSFitter(M_fixed, RESIZE, 2 * RESIZE, order=3,
                       normalized=False, reg_ls=1.0, use_pallas=False)
    rng = np.random.default_rng(0)
    wmaps = jnp.asarray(
        rng.uniform(0, 1, (2, RESIZE, 2 * RESIZE, 4)).astype(np.float32))
    beta_const = fitter(wmaps, layout="nhwc")
    M_b = jnp.tile(jnp.asarray(M_fixed, jnp.float32)[None], (2, 1, 1))
    beta_m = fitter.fit_with_M(wmaps, M_b, layout="nhwc")
    np.testing.assert_allclose(np.asarray(beta_m), np.asarray(beta_const),
                               rtol=2e-4, atol=2e-5)


def test_gradients_flow_to_offsets():
    M_fixed, _ = bev_matrices_pixel(RESIZE)
    fitter = WLSFitter(M_fixed, RESIZE, 2 * RESIZE, order=3,
                       normalized=False, reg_ls=1.0, use_pallas=False)
    rng = np.random.default_rng(1)
    wmaps = jnp.asarray(
        rng.uniform(0, 1, (1, RESIZE, 2 * RESIZE, 4)).astype(np.float32))
    crit = BackprojectionLoss(RESIZE, order=3)
    x_gt = jnp.asarray(rng.uniform(0, 2 * RESIZE, (1, 56)), jnp.float32)
    valid = jnp.ones((1, 56), jnp.float32)

    def loss_of_offsets(off):
        M_b, M_inv_b = dlt_homography(off, RESIZE)
        beta = fitter.fit_with_M(wmaps, M_b, layout="nhwc")
        loss, _ = crit.with_M(beta[:, 0], x_gt, valid, M_b, M_inv_b)
        return loss

    g = jax.grad(loss_of_offsets)(jnp.zeros((1, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_lanenet_forward_and_train_step():
    from lanedetection_end2end_tpu.data import SyntheticLanes
    from lanedetection_end2end_tpu.train import define_optim, make_train_step
    from lanedetection_end2end_tpu.train.state import init_train_state

    cfg = bp_defaults(resize=RESIZE, batch_size=2, nepochs=1, reg_ls=1.0,
                      learn_homography=True)
    lanenet = LaneNet(cfg)
    variables = lanenet.init(jax.random.PRNGKey(0))
    assert "homography_head" in variables["params"]
    images = jnp.zeros((2, RESIZE, 2 * RESIZE, 3), jnp.float32)
    out = lanenet.apply(variables, images, phase="e2e", train=False)
    # zero-initialized head => offsets 0 => the fixed calibrated matrices
    M_fixed, _ = bev_matrices_pixel(RESIZE)
    np.testing.assert_allclose(np.asarray(out.M[0]), M_fixed, rtol=1e-4, atol=1e-3)
    assert out.beta.shape == (2, cfg.nclasses, cfg.order + 1)
    assert np.all(np.isfinite(np.asarray(out.beta)))

    tx = define_optim(cfg.optimizer, cfg.learning_rate)
    state = init_train_state(variables, tx)
    step = make_train_step(lanenet, cfg, tx, "e2e")
    batch = SyntheticLanes(2, RESIZE, cfg.nclasses, "bp").batch()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_learn_homography_config_invariants():
    with pytest.raises(ValueError):
        bp_defaults(no_mapping=True, learn_homography=True)

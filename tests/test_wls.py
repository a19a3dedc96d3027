import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanedetection_end2end_tpu.geometry import (
    bev_matrices_normalized, bev_matrices_pixel, projective_grid,
)
from lanedetection_end2end_tpu.ops.wls import WLSFitter


def _numpy_wls_oracle(wmaps, grid, order, normalized, height, reg_ls=0.0):
    """Float64 reimplementation of the reference normal equations
    (Birds_Eye_View_Loss/Networks/LSQ_layer.py:103-167)."""
    B, C, N = wmaps.shape
    x_map = grid[:, 0]
    y_map = (1.0 - grid[:, 1]) if normalized else ((height - 1.0) - grid[:, 1])
    Y = np.stack([y_map ** p for p in range(order, -1, -1)], axis=1)  # (N, o+1)
    out = np.zeros((B, C, order + 1))
    for b in range(B):
        for c in range(C):
            w = wmaps[b, c].astype(np.float64)
            Y0 = w[:, None] * Y
            Z = Y0.T @ Y0 + reg_ls * np.eye(order + 1)
            X = Y0.T @ (w * x_map)
            out[b, c] = np.linalg.solve(Z, X)
    return out


@pytest.mark.parametrize("order", [0, 1, 2])
def test_wls_matches_reference_math_bev(order):
    H, W = 32, 64
    M, _ = bev_matrices_normalized()
    grid = projective_grid(M, H, W, normalized=True)
    rng = np.random.default_rng(42)
    wmaps = rng.uniform(0, 1, (2, 2, H * W)).astype(np.float32) ** 4
    fitter = WLSFitter(M, H, W, order, normalized=True, reg_floor=0.0)
    beta = np.asarray(fitter(jnp.asarray(wmaps)))
    oracle = _numpy_wls_oracle(wmaps, grid, order, True, H)
    np.testing.assert_allclose(beta, oracle, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("order", [2, 3])
def test_wls_matches_reference_math_pixel(order):
    H, W = 64, 128
    M, _ = bev_matrices_pixel(resize=H)
    grid = projective_grid(M, H, W, normalized=False)
    rng = np.random.default_rng(7)
    # Concentrated weights near a line, as a trained net would produce.
    wmaps = np.zeros((2, 4, H, W), dtype=np.float32)
    ys = np.arange(H)
    for b in range(2):
        for c in range(4):
            xs = np.clip((0.3 + 0.1 * c) * W + 0.1 * ys + rng.normal(0, .5, H), 0, W - 1)
            wmaps[b, c, ys, xs.astype(int)] = rng.uniform(0.5, 1.0, H)
    fitter = WLSFitter(M, H, W, order, normalized=False, reg_ls=1e-4,
                       reg_floor=0.0)
    beta = np.asarray(fitter(jnp.asarray(wmaps)))
    oracle = _numpy_wls_oracle(wmaps.reshape(2, 4, -1), grid, order, False, H,
                               reg_ls=1e-4)
    # Pixel-space order-3 normal equations are brutally conditioned; the
    # scaled-basis f32 result must still track the f64 oracle closely in the
    # coordinates that matter (predicted x positions).
    y = (H - 1.0) - grid[:, 1]
    Yv = np.stack([y ** p for p in range(order, -1, -1)], 1)
    x_pred = beta.reshape(-1, order + 1) @ Yv.T
    x_oracle = oracle.reshape(-1, order + 1) @ Yv.T
    err = np.abs(x_pred - x_oracle).max()
    assert err < 0.1, f"max x deviation {err}"


def test_wls_f64_oracle_full_resolution():
    """Full flagship-path resolution (256x512, order 3, pixel space) vs the
    f64 oracle: pins down that the ~5e-3 beta tolerance accepted at the
    torch-parity level (tests/test_reference_parity.py) is CONDITIONING of
    the order-3 normal equations, not a bias in the f32 moment pipeline —
    the predicted x positions (the quantity the TuSimple benchmark scores)
    must track the f64 oracle to well under a pixel."""
    H, W = 256, 512
    M, _ = bev_matrices_pixel(resize=H)
    grid = projective_grid(M, H, W, normalized=False)
    rng = np.random.default_rng(11)
    wmaps = np.zeros((1, 4, H, W), dtype=np.float32)
    ys = np.arange(H)
    for c in range(4):
        xs = np.clip((0.25 + 0.15 * c) * W + 0.2 * ys
                     + 1e-4 * (ys - H / 2) ** 2 + rng.normal(0, .5, H),
                     0, W - 1)
        on = ys >= int(0.2 * H)  # masked top rows carry no weight
        wmaps[0, c, ys[on], xs[on].astype(int)] = rng.uniform(.5, 1., on.sum())
    fitter = WLSFitter(M, H, W, order=3, normalized=False, reg_ls=1.0,
                       reg_floor=0.0)
    beta = np.asarray(fitter(jnp.asarray(wmaps)))
    oracle = _numpy_wls_oracle(wmaps.reshape(1, 4, -1), grid, 3, False, H,
                               reg_ls=1.0)
    # beta agreement is conditioning-limited (documented bound)
    rel = np.abs(beta - oracle) / np.maximum(np.abs(oracle), 1e-12)
    assert rel.max() < 5e-3, rel.max()
    # but the fitted curve is tight: evaluate x at the 56 TuSimple rows
    y_eval = (H - 1.0) - np.linspace(0.2 * H, H - 1, 56)
    Yv = np.stack([y_eval ** p for p in range(3, -1, -1)], 1)
    x_pred = beta.reshape(-1, 4) @ Yv.T
    x_oracle = oracle.reshape(-1, 4) @ Yv.T
    assert np.abs(x_pred - x_oracle).max() < 0.05  # BEV pixels


def test_wls_recovers_known_polynomial():
    """Weights concentrated exactly on x = a*y^2 + b*y + c must recover it."""
    H, W = 64, 128
    M = np.eye(3)  # identity mapping: grid == pixel grid
    fitter = WLSFitter(M, H, W, order=2, normalized=True, reg_floor=0.0)
    # normalized grid: x in [0,1), y in [0,1); y_map = 1 - y
    a, b, c = 0.05, -0.1, 0.5
    xs = np.linspace(0, 1 - 1 / W, W)
    ys = np.linspace(0, 1 - 1 / H, H)
    wmap = np.zeros((1, 1, H, W), dtype=np.float32)
    for i, y in enumerate(ys):
        ym = 1.0 - y
        x_true = a * ym**2 + b * ym + c
        j = int(np.argmin(np.abs(xs - x_true)))
        wmap[0, 0, i, j] = 1.0
    beta = np.asarray(fitter(jnp.asarray(wmap)))[0, 0]
    # grid quantization limits accuracy to ~1/W
    x_fit = beta[0] * (1 - ys)**2 + beta[1] * (1 - ys) + beta[2]
    x_ref = a * (1 - ys)**2 + b * (1 - ys) + c
    assert np.abs(x_fit - x_ref).max() < 2.0 / W


def test_wls_total_on_zero_weights():
    """All-zero weight maps (absent lane) must not produce NaN/Inf."""
    H, W = 32, 64
    M, _ = bev_matrices_normalized()
    fitter = WLSFitter(M, H, W, 2, normalized=True)
    beta = fitter(jnp.zeros((1, 2, H, W)))
    assert bool(jnp.all(jnp.isfinite(beta)))


def test_wls_cholesky_matches_solve():
    H, W = 32, 64
    M, _ = bev_matrices_normalized()
    rng = np.random.default_rng(3)
    wmaps = jnp.asarray(rng.uniform(0, 1, (2, 2, H, W)).astype(np.float32))
    f1 = WLSFitter(M, H, W, 2, normalized=True)
    f2 = WLSFitter(M, H, W, 2, normalized=True, use_cholesky=True)
    np.testing.assert_allclose(np.asarray(f1(wmaps)), np.asarray(f2(wmaps)),
                               rtol=1e-3, atol=1e-5)


def test_wls_is_differentiable():
    H, W = 16, 32
    M, _ = bev_matrices_normalized()
    fitter = WLSFitter(M, H, W, 2, normalized=True)

    def loss(w):
        beta = fitter(w)
        return jnp.sum(beta ** 2)

    g = jax.grad(loss)(jnp.ones((1, 2, H, W)) * 0.5)
    assert g.shape == (1, 2, H, W)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0

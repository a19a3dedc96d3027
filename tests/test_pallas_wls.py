"""Pallas moments kernel + unrolled SPD solve: parity with the plain XLA
path and with numpy oracles, including gradients (custom VJP)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.geometry import bev_matrices_normalized
from lanedetection_end2end_tpu.ops.pallas_wls import wls_moments
from lanedetection_end2end_tpu.ops.solve import spd_solve
from lanedetection_end2end_tpu.ops.wls import WLSFitter


# ----------------------------------------------------------------------
@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_spd_solve_matches_numpy(n):
    rng = np.random.default_rng(n)
    A = rng.normal(size=(6, n, n))
    Z = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(n)
    x = rng.normal(size=(6, n))
    got = np.asarray(spd_solve(jnp.asarray(Z), jnp.asarray(x)))
    want = np.linalg.solve(Z, x[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_spd_solve_grad():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 4)).astype(np.float32)
    Z = jnp.asarray(A @ A.T + 0.5 * np.eye(4, dtype=np.float32))
    x = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def f(Z, x):
        return jnp.sum(spd_solve(Z[None], x[None]) ** 2)

    gZ, gx = jax.grad(f, argnums=(0, 1))(Z, x)

    def f_ref(Z, x):
        return jnp.sum(jnp.linalg.solve(Z[None], x[None, :, None])[..., 0] ** 2)

    gZ_ref, gx_ref = jax.grad(f_ref, argnums=(0, 1))(Z, x)
    # spd_solve reads only the lower triangle, so its Z-gradient lives there;
    # on symmetric inputs gradients are equivalent up to symmetrization.
    sym = lambda G: (np.asarray(G) + np.asarray(G).T)
    np.testing.assert_allclose(sym(gZ), sym(gZ_ref), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-3, atol=1e-4)


# ----------------------------------------------------------------------
def _ref_moments(w, basis):
    return (w.astype(np.float64) ** 2) @ basis.astype(np.float64)


@pytest.mark.parametrize("shape", [(8, 1024, 12), (3, 4096, 30),
                                   (32, 2000, 6)])
def test_pallas_moments_matches_oracle(shape):
    """interpret=True runs the kernel logic on CPU (padding paths included:
    BC not multiple of 8, N not multiple of tile, K not multiple of 128)."""
    BC, N, K = shape
    rng = np.random.default_rng(1)
    w = rng.normal(size=(BC, N)).astype(np.float32)
    basis = rng.normal(size=(N, K)).astype(np.float32)
    got = np.asarray(wls_moments(jnp.asarray(w), jnp.asarray(basis),
                                 1024, True))
    want = _ref_moments(w, basis)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_moments_grad():
    BC, N, K = 4, 512, 6
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(BC, N)).astype(np.float32))
    basis = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))

    def f(w):
        return jnp.sum(wls_moments(w, basis, 256, True) ** 2)

    g = jax.grad(f)(w)
    # oracle: d/dw sum((w^2 B)^2) = 2w * (2 (w^2 B)) B^T
    m = _ref_moments(np.asarray(w), np.asarray(basis))
    g_ref = 2 * np.asarray(w) * ((2 * m) @ np.asarray(basis, np.float64).T)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-3, atol=1e-2)


# ----------------------------------------------------------------------
def test_fitter_pallas_path_matches_xla_path():
    M, _ = bev_matrices_normalized()
    H, W = 32, 64
    plain = WLSFitter(M, H, W, order=2, normalized=True, reg_ls=1e-4,
                      use_pallas=False)
    fused = WLSFitter(M, H, W, order=2, normalized=True, reg_ls=1e-4,
                      use_pallas=True, pallas_interpret=True)
    rng = np.random.default_rng(3)
    wmaps = jnp.asarray(rng.uniform(0, 1, (2, 4, H, W)).astype(np.float32))
    beta_plain = np.asarray(plain(wmaps))
    beta_fused = np.asarray(fused(wmaps))
    np.testing.assert_allclose(beta_fused, beta_plain, rtol=2e-3, atol=2e-4)


def test_fitter_pallas_grad_matches_xla_grad():
    M, _ = bev_matrices_normalized()
    H, W = 16, 32
    plain = WLSFitter(M, H, W, order=1, normalized=True, reg_ls=1e-3,
                      use_pallas=False)
    fused = WLSFitter(M, H, W, order=1, normalized=True, reg_ls=1e-3,
                      use_pallas=True, pallas_interpret=True)
    rng = np.random.default_rng(4)
    wmaps = jnp.asarray(rng.uniform(0.1, 1, (1, 2, H, W)).astype(np.float32))

    def loss(fitter, w):
        return jnp.sum(fitter(w) ** 2)

    g_plain = np.asarray(jax.grad(lambda w: loss(plain, w))(wmaps))
    g_fused = np.asarray(jax.grad(lambda w: loss(fused, w))(wmaps))
    np.testing.assert_allclose(g_fused, g_plain, rtol=2e-3, atol=1e-4)


# ----------------------------------------------------------------------
# Fused NB1D kernel + serving engine (interpret mode on CPU)
# ----------------------------------------------------------------------

def test_nb1d_fused_matches_flax():
    from lanedetection_end2end_tpu.models.erfnet import NonBottleneck1D
    from lanedetection_end2end_tpu.ops.pallas_nb1d import (
        pack_nb1d, nb1d_fused)
    for C, d, H, W in [(16, 1, 16, 32), (64, 2, 8, 16), (128, 4, 8, 8)]:
        mod = NonBottleneck1D(C, 0.0, d)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C))
        v = mod.init({"params": jax.random.PRNGKey(1)}, x, train=False)
        want = np.asarray(mod.apply(v, x, train=False))
        packed = pack_nb1d(jax.device_get(v["params"]),
                           jax.device_get(v["batch_stats"]), d)
        got = np.asarray(nb1d_fused(x, packed, interpret=True))
        scale = max(1e-6, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-2, (C, d)


def test_nb1d_fused_wino_tri_matches_flax():
    """Winograd-H (Kh (4,128,128)) + banded-W (Kw (2,128,128)) forms vs the
    flax NB1D block: same math at bf16 tolerance. h_hint triggers the
    Winograd form; 2*d*C<=128 triggers the banded W form."""
    from lanedetection_end2end_tpu.models.erfnet import NonBottleneck1D
    from lanedetection_end2end_tpu.ops.pallas_nb1d import (
        pack_nb1d, nb1d_fused)
    for C, d, H, W in [(16, 1, 16, 32), (64, 1, 8, 16), (64, 2, 8, 16),
                       (128, 4, 8, 8), (128, 16, 32, 8)]:
        mod = NonBottleneck1D(C, 0.0, d)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C))
        v = mod.init({"params": jax.random.PRNGKey(1)}, x, train=False)
        want = np.asarray(mod.apply(v, x, train=False))
        packed = pack_nb1d(jax.device_get(v["params"]),
                           jax.device_get(v["batch_stats"]), d, h_hint=H)
        assert packed["Kh2"].shape[0] == (4 if H % (2 * d) == 0 else 3)
        assert packed["Kw1"].shape[0] == (2 if 2 * C <= 128 else 3)
        got = np.asarray(nb1d_fused(x, packed, interpret=True))
        scale = max(1e-6, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-2, (C, d)


def test_nb1d_chain_matches_sequential():
    from lanedetection_end2end_tpu.models.erfnet import NonBottleneck1D
    from lanedetection_end2end_tpu.ops.pallas_nb1d import (
        pack_nb1d, nb1d_fused, nb1d_chain)
    C, H, W = 64, 8, 16
    dils = [1, 2, 4]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, C))
    packs = []
    for i, d in enumerate(dils):
        mod = NonBottleneck1D(C, 0.0, d)
        v = mod.init({"params": jax.random.PRNGKey(10 + i)}, x, train=False)
        packs.append(pack_nb1d(jax.device_get(v["params"]),
                               jax.device_get(v["batch_stats"]), d))
    want = x
    for p, d in zip(packs, dils):
        want = nb1d_fused(want, p, dilation=d, interpret=True)
    got = nb1d_chain(x, packs, dils, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["blocks", "full", "full-stack2"])
def test_fused_engine_matches_lanenet(mode, monkeypatch):
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.models import LaneNet
    from lanedetection_end2end_tpu.models.infer_engine import \
        FusedLaneNetEngine
    monkeypatch.delenv("NB1D_STACK", raising=False)
    if mode == "full-stack2":
        # NB1D_STACK=2: both images ride ONE plane stacked along rows —
        # junction masks on every H-direction tap (incl. dilation >= the
        # per-image stage height, where the taps are all-pad) must
        # reproduce the per-image result exactly.
        monkeypatch.setenv("NB1D_STACK", "2")
        mode = "full"
    cfg = train_sh_config(resize=64, batch_size=2, reg_ls=1.0)
    net = LaneNet(cfg, dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 128, 3))
    ref = net.apply(v, x, phase="e2e", train=False)
    eng = FusedLaneNetEngine(cfg, dtype=jnp.float32, interpret=True,
                             mode=mode)
    packed = eng.prepare(v)
    beta, line, hor = jax.jit(lambda p, v, x: eng(p, v, x))(packed, v, x)
    rel = (np.abs(np.asarray(beta) - np.asarray(ref.beta)).max()
           / np.abs(np.asarray(ref.beta)).max())
    # the engine's matmuls are bf16 (f32 accumulate); 'full' chains 16 of
    # them, so the tolerance is bf16-scale, not f32-scale
    assert rel < 3e-2, (mode, rel)
    np.testing.assert_allclose(np.asarray(line), np.asarray(ref.line_logits),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(hor),
                               np.asarray(ref.horizon_logits),
                               rtol=1e-2, atol=1e-2)


def test_fused_graph_bodies_match_flax():
    """Downsampler / upsampler / head lane-map bodies vs flax modules."""
    import flax.linen as nn
    from lanedetection_end2end_tpu.models.erfnet import (
        DownsamplerBlock, UpsamplerBlock)
    from lanedetection_end2end_tpu.ops.pallas_backbone import (
        body_downsampler, body_head, body_upsampler, pack_downsampler,
        pack_head, pack_upsampler)

    for (H, W, cin, cout, pad) in [(16, 32, 16, 64, 0), (8, 16, 64, 128, 0),
                                   (32, 64, 3, 16, 1)]:
        mod = DownsamplerBlock(cout)
        x = jax.random.normal(jax.random.PRNGKey(cin), (1, H, W, cin))
        v = mod.init({"params": jax.random.PRNGKey(cin + 1)}, x, train=False)
        want = np.asarray(mod.apply(v, x, train=False))[0]
        ci = cin + pad
        packed = pack_downsampler(jax.device_get(v["params"]),
                                  jax.device_get(v["batch_stats"]), ci, cout)
        xin = jnp.pad(x[0], ((0, 0), (0, 0), (0, pad))) if pad else x[0]
        got = np.asarray(body_downsampler(
            xin.reshape(H, W * ci), packed, H=H, W=W, interpret=True)
        ).reshape(H // 2, W // 2, cout)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-2, (cin, cout)

    for (H, W, cin, cout) in [(8, 16, 128, 64), (8, 16, 64, 16)]:
        mod = UpsamplerBlock(cout)
        x = jax.random.normal(jax.random.PRNGKey(cin), (1, H, W, cin))
        v = mod.init({"params": jax.random.PRNGKey(cin + 1)}, x, train=False)
        want = np.asarray(mod.apply(v, x, train=False))[0]
        packed = pack_upsampler(jax.device_get(v["params"]),
                                jax.device_get(v["batch_stats"]), cin, cout)
        got = np.asarray(body_upsampler(
            x[0].reshape(H, W * cin), packed, H=H, W=W, interpret=True)
        ).reshape(2 * H, 2 * W, cout)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-2, (cin, cout)

    H, W, cin, cout = 16, 32, 16, 4
    head = nn.ConvTranspose(cout, (2, 2), strides=(2, 2), padding="VALID")
    x = jax.random.normal(jax.random.PRNGKey(10), (1, H, W, cin))
    v = head.init(jax.random.PRNGKey(11), x)
    want = np.asarray(head.apply(v, x))[0]
    packed = pack_head(jax.device_get(v["params"]), cin, cout)
    got = np.asarray(body_head(x[0].reshape(H, W * cin), packed, H=H, W=W,
                               interpret=True)).reshape(2 * H, 2 * W, cout)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-2


def test_sharded_fused_engine():
    """Fused engine under shard_map: per-shard Pallas kernels over the
    8-device mesh produce the same fit as the single-device path."""
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.models import LaneNet
    from lanedetection_end2end_tpu.models.infer_engine import \
        FusedLaneNetEngine
    from lanedetection_end2end_tpu.parallel import (
        make_mesh, replicate, shard_batch)
    cfg = train_sh_config(resize=64, batch_size=8, reg_ls=1.0)
    net = LaneNet(cfg, dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 128, 3))
    ref = net.apply(v, x, phase="e2e", train=False)
    eng = FusedLaneNetEngine(cfg, dtype=jnp.float32, interpret=True,
                             mode="full")
    packed = eng.prepare(v)
    mesh = make_mesh()
    f = eng.sharded_call(mesh)
    out = f(replicate(packed, mesh), replicate(v, mesh),
            shard_batch(x, mesh))
    beta = np.asarray(out["beta"])
    rel = np.abs(beta - np.asarray(ref.beta)).max() / \
        np.abs(np.asarray(ref.beta)).max()
    assert rel < 3e-2, rel
    assert len(out["beta"].sharding.device_set) == 8

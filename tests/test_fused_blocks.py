"""Parity of the fused NB1D half-block kernels (ops/pallas_nb_block.py)
against the pure-jnp lane-packed formulation (ops/packed_graph.py), which is
itself chained to the flax graph and the torch reference by
tests/test_packed_graph.py.

Runs in f32 (interpret mode on CPU), where the kernels are dtype-preserving
and agreement is tight. The conv biases that feed a train-mode BatchNorm have
true gradient ~0 (the normalize cancels additive shifts), so they are checked
with an absolute tolerance.

Reference anchor: non_bottleneck_1d (ERFNet.py:25-60) and the training loop
the kernels accelerate (Birds_Eye_View_Loss/main.py:171-357)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.ops import packed_graph as pg


def _mk_block_params(rng, C):
    def mk_conv(shape):
        return {
            "kernel": jnp.asarray(
                rng.normal(0, 0.2, shape).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(0, 0.1, (C,)).astype(np.float32)),
        }
    params = {
        "conv3x1_1": mk_conv((3, 1, C, C)),
        "conv1x3_1": mk_conv((1, 3, C, C)),
        "conv3x1_2": mk_conv((3, 1, C, C)),
        "conv1x3_2": mk_conv((1, 3, C, C)),
        "bn1": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "bn2": {"scale": jnp.ones(C) * 1.1, "bias": jnp.ones(C) * 0.05},
    }
    stats = {
        "bn1": {"mean": jnp.zeros(C), "var": jnp.ones(C)},
        "bn2": {"mean": jnp.zeros(C) * 0.1, "var": jnp.ones(C)},
    }
    return params, stats


@pytest.mark.parametrize("C,d,banded", [
    # default direct 3-tap W-conv (measured-best on v5e) at every shape,
    # plus the opt-in banded 2-matmul form (PACKED_BANDED=1) where it
    # applies (2*d*C <= 128) — both forwards and both custom-VJP
    # backwards stay covered.
    (16, 1, False), (16, 2, False), (64, 1, False), (64, 2, False),
    (16, 1, True), (16, 2, True), (64, 1, True),
])
def test_fused_block_matches_jnp(monkeypatch, C, d, banded):
    monkeypatch.setenv("PACKED_FUSED_BLOCKS", "1")
    if banded:
        monkeypatch.setenv("PACKED_BANDED", "1")
    else:
        monkeypatch.delenv("PACKED_BANDED", raising=False)
    rng = np.random.default_rng(0)
    B, H, W = 2, 8, 128 // C * 4
    L = W * C
    x = jnp.asarray(rng.normal(0, 1, (B, H, L)).astype(np.float32))
    params, stats = _mk_block_params(rng, C)

    def f(p, x_, pallas):
        y, ns = pg.nb1d_packed(x_, p, stats, C=C, d=d, train=True,
                               drop=0.0, rng=None, pallas=pallas)
        return jnp.sum(y ** 2), (y, ns)

    (l_ref, (y_ref, ns_ref)), g_ref = jax.value_and_grad(
        lambda p: f(p, x, False), has_aux=True)(params)
    (l_fused, (y_fused, ns_fused)), g_fused = jax.value_and_grad(
        lambda p: f(p, x, True), has_aux=True)(params)

    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)
    for k in ("bn1", "bn2"):
        for s in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ns_fused[k][s]), np.asarray(ns_ref[k][s]),
                atol=1e-5, rtol=1e-4)

    flat_ref = {jax.tree_util.keystr(kp): v for kp, v in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    gmax = max(float(jnp.abs(v).max()) for v in jax.tree_util.tree_leaves(
        g_ref))
    for kp, v in jax.tree_util.tree_leaves_with_path(g_fused):
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[key]),
            atol=2e-3 * gmax, rtol=2e-3, err_msg=key)


def test_fused_block_eval_mode(monkeypatch):
    """Eval mode uses running stats; forward must be bit-comparable too."""
    monkeypatch.setenv("PACKED_FUSED_BLOCKS", "1")
    rng = np.random.default_rng(1)
    C, d, B, H, W = 16, 2, 2, 8, 32
    x = jnp.asarray(rng.normal(0, 1, (B, H, W * C)).astype(np.float32))
    params, stats = _mk_block_params(rng, C)
    stats = {"bn1": {"mean": jnp.full(C, 0.2), "var": jnp.full(C, 1.5)},
             "bn2": {"mean": jnp.full(C, -0.1), "var": jnp.full(C, 0.8)}}
    y_ref, ns_ref = pg.nb1d_packed(x, params, stats, C=C, d=d, train=False,
                                   drop=0.0, rng=None, pallas=False)
    y_fused, ns_fused = pg.nb1d_packed(x, params, stats, C=C, d=d,
                                       train=False, drop=0.0, rng=None,
                                       pallas=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)
    for k in ("bn1", "bn2"):
        for s in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(ns_fused[k][s]),
                                       np.asarray(ns_ref[k][s]))


def test_fused_full_graph_parity(monkeypatch):
    """erfnet_packed with fused blocks on: exercises every (C, d) stage the
    real model hits (enc C=64 d=1, C=128 d=2/4/8/16, dec C=64/16)."""
    from lanedetection_end2end_tpu.models.erfnet import ERFNet
    model = ERFNet(in_channels=3, out_channels=4, pretrained=True,
                   dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 64, 3))
    variables = model.init({"params": rng, "dropout": rng}, images,
                           train=False)
    params = variables["params"]["erfnet"] if "erfnet" in variables[
        "params"] else variables["params"]
    bstats = (variables["batch_stats"]["erfnet"]
              if "erfnet" in variables.get("batch_stats", {})
              else variables["batch_stats"])

    def fwd(pallas_env):
        monkeypatch.setenv("PACKED_FUSED_BLOCKS", pallas_env)
        return pg.erfnet_packed(params, bstats, images, out_channels=4,
                                train=True, rng=None, use_main_head=True,
                                dropout_1=0.0, dropout_2=0.0,
                                dtype=jnp.float32,
                                pallas_convs=pallas_env == "1")

    enc_ref, dec_ref, ns_ref = fwd("0")
    enc_f, dec_f, ns_f = fwd("1")
    np.testing.assert_allclose(np.asarray(enc_f), np.asarray(enc_ref),
                               atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(dec_f), np.asarray(dec_ref),
                               atol=5e-4, rtol=2e-3)
    for path, leaf in jax.tree_util.tree_leaves_with_path(ns_ref):
        got = jax.tree_util.tree_leaves_with_path(ns_f)
        flat_f = {jax.tree_util.keystr(kp): v for kp, v in got}
        np.testing.assert_allclose(
            np.asarray(flat_f[jax.tree_util.keystr(path)]),
            np.asarray(leaf), atol=1e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_fused_block_shardmap_syncbn(monkeypatch):
    """The fused block under shard_map DP: per-shard moments pmean'd inside
    _bn_mul_add must reproduce the single-device full-batch step (sync-BN),
    for both the output and the new running stats. Mirrors what
    train/steps.py does for the whole net (its CPU path is pure-jnp, so the
    fused+collective combination is pinned here)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from lanedetection_end2end_tpu.train.steps import _shard_map

    monkeypatch.setenv("PACKED_FUSED_BLOCKS", "1")
    rng = np.random.default_rng(2)
    C, d, B, H, W = 16, 1, 8, 8, 32
    x = jnp.asarray(rng.normal(0, 1, (B, H, W * C)).astype(np.float32))
    params, stats = _mk_block_params(rng, C)

    y_full, ns_full = pg.nb1d_packed(x, params, stats, C=C, d=d, train=True,
                                     drop=0.0, rng=None, pallas=True)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard_fn(p, s, xs):
        return pg.nb1d_packed(xs, p, s, C=C, d=d, train=True, drop=0.0,
                              rng=None, pallas=True, axis_name="data")

    y_sh, ns_sh = _shard_map(
        shard_fn, mesh,
        (P(), P(), P("data")),
        (P("data"), P()))(params, stats, x)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_full),
                               atol=2e-4, rtol=1e-3)
    for k in ("bn1", "bn2"):
        for s in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ns_sh[k][s]), np.asarray(ns_full[k][s]),
                atol=1e-5, rtol=1e-4, err_msg=f"{k}.{s}")


def _grad_compare(g_ref, g_fused, gmax_scale=2e-3):
    flat_ref = {jax.tree_util.keystr(kp): v for kp, v in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    gmax = max(float(jnp.abs(v).max())
               for v in jax.tree_util.tree_leaves(g_ref))
    for kp, v in jax.tree_util.tree_leaves_with_path(g_fused):
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[key]),
            atol=gmax_scale * gmax, rtol=2e-3, err_msg=key)


@pytest.mark.parametrize("cin,cout", [(128, 64), (64, 16)])
def test_fused_upsampler_matches_jnp(monkeypatch, cin, cout):
    """UpsamplerBlock via ops/pallas_lanemaps.lane_maps_op vs the pure-jnp
    packed formulation: forward, BN batch stats, gradients (the real model's
    up1 128->64 and up2 64->16 shapes, reduced spatially)."""
    rng = np.random.default_rng(3)
    B, H = 2, 4
    W = 256 // cin * 2
    L = W * cin
    x = jnp.asarray(rng.normal(0, 1, (B, H, L)).astype(np.float32))
    params = {
        "conv": {"kernel": jnp.asarray(
            rng.normal(0, 0.2, (3, 3, cin, cout)).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(0, 0.1, (cout,)).astype(np.float32))},
        "bn": {"scale": jnp.ones(cout) * 1.1, "bias": jnp.ones(cout) * 0.05},
    }
    stats = {"bn": {"mean": jnp.zeros(cout), "var": jnp.ones(cout)}}

    def f(p, fused):
        monkeypatch.setenv("PACKED_FUSED_MAPS", "1" if fused else "0")
        y, ns = pg.upsampler_packed(x, p, stats, cin=cin, cout=cout,
                                    train=True, pallas=fused)
        return jnp.sum(y ** 2), (y, ns)

    (l_ref, (y_ref, ns_ref)), g_ref = jax.value_and_grad(
        lambda p: f(p, False), has_aux=True)(params)
    (l_f, (y_f, ns_f)), g_f = jax.value_and_grad(
        lambda p: f(p, True), has_aux=True)(params)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)
    for s in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(ns_f["bn"][s]),
                                   np.asarray(ns_ref["bn"][s]),
                                   atol=1e-5, rtol=1e-4)
    _grad_compare(g_ref, g_f)


def test_fused_head_matches_jnp(monkeypatch):
    """Output ConvTranspose 2x2/s2 head via lane_maps_op vs jnp."""
    rng = np.random.default_rng(4)
    cin, cout, B, H, W = 16, 4, 2, 4, 16
    x = jnp.asarray(rng.normal(0, 1, (B, H, W * cin)).astype(np.float32))
    params = {"kernel": jnp.asarray(
        rng.normal(0, 0.2, (2, 2, cin, cout)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))}

    def f(p, fused):
        monkeypatch.setenv("PACKED_FUSED_MAPS", "1" if fused else "0")
        y = pg.head_packed(x, p, cin=cin, cout=cout, pallas=fused)
        return jnp.sum(y ** 2), y

    (l_ref, y_ref), g_ref = jax.value_and_grad(
        lambda p: f(p, False), has_aux=True)(params)
    (l_f, y_f), g_f = jax.value_and_grad(
        lambda p: f(p, True), has_aux=True)(params)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)
    _grad_compare(g_ref, g_f)


@pytest.mark.parametrize("cin,cin0,cout", [(4, 3, 16), (16, 16, 64),
                                           (64, 64, 128)])
def test_fused_downsampler_matches_jnp(monkeypatch, cin, cin0, cout):
    """DownsamplerBlock via downsampler_op vs jnp: forward, BN stats, grads
    (the real model's initial/down1/down2 shapes, reduced spatially). The
    maxpool select-and-scatter gradient must follow the jnp where-chain's
    exact tie routing."""
    rng = np.random.default_rng(5)
    B, H = 2, 8
    W = 512 // cin
    L = W * cin
    cc = cout - cin0
    xnp = rng.normal(0, 1, (B, H, L)).astype(np.float32)
    if cin != cin0:  # padded RGB lanes are zero
        xv = xnp.reshape(B, H, W, cin)
        xv[..., cin0:] = 0.0
        xnp = xv.reshape(B, H, L)
    x = jnp.asarray(xnp)
    params = {
        "conv": {"kernel": jnp.asarray(
            rng.normal(0, 0.2, (3, 3, cin0, cc)).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(0, 0.1, (cc,)).astype(np.float32))},
        "bn": {"scale": jnp.ones(cout) * 1.1, "bias": jnp.ones(cout) * 0.05},
    }
    stats = {"bn": {"mean": jnp.zeros(cout), "var": jnp.ones(cout)}}

    def f(p, fused):
        monkeypatch.setenv("PACKED_FUSED_MAPS", "1" if fused else "0")
        y, ns = pg.downsampler_packed(x, p, stats, cin=cin, cout=cout,
                                      train=True, pallas=fused)
        return jnp.sum(y ** 2), (y, ns)

    (l_ref, (y_ref, ns_ref)), g_ref = jax.value_and_grad(
        lambda p: f(p, False), has_aux=True)(params)
    (l_f, (y_f, ns_f)), g_f = jax.value_and_grad(
        lambda p: f(p, True), has_aux=True)(params)

    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)
    for s in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(ns_f["bn"][s]),
                                   np.asarray(ns_ref["bn"][s]),
                                   atol=1e-5, rtol=1e-4)
    _grad_compare(g_ref, g_f)


def test_fused_head_rowsums_tail(monkeypatch):
    """apply_packed's fused e2e tail (head + square activation + row mask +
    WLS row sums in one kernel, logits never materialized) vs the unfused
    packed path: beta and input/param gradients."""
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.models import LaneNet

    cfg = train_sh_config(resize=32, batch_size=2, reg_ls=1.0,
                          packed_train=True)
    net = LaneNet(cfg, dtype=jnp.float32)
    v = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 64, 3))

    def run(fused):
        monkeypatch.setenv("PACKED_PALLAS", "1" if fused else "0")
        monkeypatch.setenv("PACKED_FUSED_BLOCKS", "1" if fused else "0")

        def f(params):
            out = net.apply_packed({**v, "params": params}, x, phase="e2e",
                                   train=True, rng=None)
            return jnp.sum(out.beta ** 2), out.beta
        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l_ref, beta_ref), g_ref = run(False)
    (l_f, beta_f), g_f = run(True)
    assert (beta_f is not None) and (beta_ref is not None)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(beta_f), np.asarray(beta_ref),
                               atol=1e-4, rtol=1e-3)
    # gradients: direction + magnitude (elementwise equality is unattainable
    # between two numerical paths through relu/maxpool decision boundaries —
    # same rationale as test_packed_train_step_sharded_matches_single_device)
    lref = jax.tree_util.tree_leaves(g_ref)
    lf = jax.tree_util.tree_leaves(g_f)
    dots = sum(float((np.asarray(a) * np.asarray(b)).sum())
               for a, b in zip(lref, lf))
    n1 = np.sqrt(sum(float((np.asarray(a) ** 2).sum()) for a in lref))
    n2 = np.sqrt(sum(float((np.asarray(a) ** 2).sum()) for a in lf))
    assert dots / (n1 * n2) > 0.999, dots / (n1 * n2)
    assert 0.98 < n1 / n2 < 1.02, n1 / n2

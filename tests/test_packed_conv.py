"""Parity of the Pallas packed-conv custom_vjp ops (ops/pallas_packed_conv.py)
against the pure-jnp formulation in ops/packed_graph.py — forward, input
gradient, and weight gradient (through the block-diagonal expansion).

On CPU the ops run in interpret mode automatically (interpret=None ->
backend != 'tpu'), so this chain validates the exact kernel bodies the TPU
compiles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.ops import packed_graph as pg
from lanedetection_end2end_tpu.ops.pallas_packed_conv import packed_conv


def _conv_jnp(x, kern, C, d, axis):
    """Pre-bias jnp reference (the non-pallas branch of conv_*_packed)."""
    if axis == "h":
        up, dn = pg._shift_rows(x, d)
        return (pg._block_matmul(up, pg._expand(kern[0], C))
                + pg._block_matmul(x, pg._expand(kern[1], C))
                + pg._block_matmul(dn, pg._expand(kern[2], C)))
    left, right = pg._shift_lanes(x, d * C)
    return (pg._block_matmul(left, pg._expand(kern[0], C))
            + pg._block_matmul(x, pg._expand(kern[1], C))
            + pg._block_matmul(right, pg._expand(kern[2], C)))


@pytest.mark.parametrize("C,d,axis", [
    (16, 1, "h"), (16, 1, "w"), (64, 1, "h"), (64, 1, "w"),
    (128, 4, "h"), (128, 16, "w"), (128, 16, "h"),
])
def test_packed_conv_forward_and_grads(C, d, axis):
    B, H, W = 2, 16, 32
    L = W * C
    assert L % 128 == 0
    x = jax.random.normal(jax.random.PRNGKey(C + d), (B, H, L), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(7), (3, C, C),
                             jnp.float32) * 0.2

    def f_pallas(x, kern):
        kexp = jnp.stack([pg._expand(kern[t], C) for t in range(3)])
        s = d if axis == "h" else d * C
        return jnp.sum(packed_conv(x, kexp, axis, s) ** 2)

    def f_jnp(x, kern):
        return jnp.sum(_conv_jnp(x, kern, C, d, axis) ** 2)

    np.testing.assert_allclose(float(f_pallas(x, kern)),
                               float(f_jnp(x, kern)), rtol=1e-5)
    gx_p, gk_p = jax.grad(f_pallas, argnums=(0, 1))(x, kern)
    gx_j, gk_j = jax.grad(f_jnp, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_j),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_j),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("C,d,axis,act", [
    (16, 1, "h", True), (64, 1, "w", False), (128, 8, "h", True),
    (128, 2, "w", False),
])
def test_packed_conv_act_forward_and_grads(C, d, axis, act):
    """Fused conv+bias[+relu] vs conv_*_packed's jnp branch."""
    from lanedetection_end2end_tpu.ops.packed_graph import (
        conv_h_packed, conv_w_packed)
    B, H, W = 2, 16, 32
    L = W * C
    x = jax.random.normal(jax.random.PRNGKey(C + d), (B, H, L), jnp.float32)
    kern4 = jax.random.normal(jax.random.PRNGKey(3),
                              (3, 1, C, C) if axis == "h" else (1, 3, C, C),
                              jnp.float32) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(4), (C,), jnp.float32)
    conv = conv_h_packed if axis == "h" else conv_w_packed

    def f(x, kern4, bias, pallas):
        return jnp.sum(conv(x, kern4, bias, C, d, pallas=pallas,
                            act=act) ** 2)

    np.testing.assert_allclose(float(f(x, kern4, bias, True)),
                               float(f(x, kern4, bias, False)), rtol=1e-5)
    gp = jax.grad(f, argnums=(0, 1, 2))(x, kern4, bias, True)
    gj = jax.grad(f, argnums=(0, 1, 2))(x, kern4, bias, False)
    for a, b, name in zip(gp, gj, ("dx", "dkern", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3, err_msg=name)


def test_packed_conv_dilation_exceeds_plane():
    """d >= H (3x1) and d*C >= L (1x3): shifted taps vanish entirely."""
    C, H, W = 16, 4, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W * C), jnp.float32)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, C, C), jnp.float32)
    for axis, s in (("h", H + 2), ("w", W * C)):
        kexp = jnp.stack([pg._expand(kern[t], C) for t in range(3)])
        got = packed_conv(x, kexp, axis, s)
        want = pg._block_matmul(x, pg._expand(kern[1], C))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_erfnet_packed_pallas_convs_matches_jnp():
    """Full packed backbone: pallas convs (interpret on CPU) vs jnp convs,
    forward and gradient."""
    from lanedetection_end2end_tpu.models.erfnet import ERFNet
    model = ERFNet(in_channels=3, out_channels=4, pretrained=True,
                   dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 64, 3))
    variables = model.init({"params": rng, "dropout": rng}, images,
                           train=False)

    def loss(params, pallas):
        enc, dec, _ = pg.erfnet_packed(
            params, variables["batch_stats"], images, out_channels=4,
            train=True, rng=None, use_main_head=True, dropout_1=0.0,
            dropout_2=0.0, dtype=jnp.float32, pallas_convs=pallas)
        return jnp.mean(jnp.square(dec)) + jnp.mean(jnp.abs(enc))

    lj = loss(variables["params"], False)
    lp = loss(variables["params"], True)
    np.testing.assert_allclose(float(lp), float(lj), rtol=1e-5)

    gj = jax.grad(lambda p: loss(p, False))(variables["params"])
    gp = jax.grad(lambda p: loss(p, True))(variables["params"])
    flat_j = jax.tree_util.tree_leaves_with_path(gj)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    # Elementwise equality is unattainable: the one-pass channel_sums kernel
    # reduces in a different order than the HIGHEST einsum, the f32 noise
    # renormalizes through train-mode BN at every layer, and each flipped
    # near-zero relu mask reroutes an O(1) grad contribution. The meaningful
    # training-equivalence contract is per-leaf DIRECTION and NORM agreement
    # (see test_packed_graph.py::test_grad_parity), which any structural bug
    # (wrong tap pairing / transpose / shift sign) destroys outright.
    global_norm = float(np.sqrt(sum(
        float((np.asarray(l) ** 2).sum()) for _, l in flat_j)))
    checked = 0
    for path, leaf in flat_j:
        a, b = np.asarray(flat_p[path]), np.asarray(leaf)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if nb > 1e-3 * global_norm:
            cos = float((a * b).sum()) / (na * nb)
            assert cos > 0.995, (str(path), cos)
            assert 0.95 < na / nb < 1.05, (str(path), na / nb)
            checked += 1
    assert checked > 50

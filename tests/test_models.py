import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanedetection_end2end_tpu.config import LaneConfig, bp_defaults, bev_defaults
from lanedetection_end2end_tpu.models import (
    ERFNet, LaneNet, define_model, init_weights)


RESIZE = 64  # small images for test speed; shapes scale linearly


def _count_params(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


def test_erfnet_shapes_and_param_count():
    net = ERFNet(in_channels=3, out_channels=2)
    x = jnp.zeros((2, RESIZE, 2 * RESIZE, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    enc, dec, seg2 = net.apply(variables, x, train=False)
    assert enc.shape == (2, RESIZE // 8, 2 * RESIZE // 8, 128)
    assert dec.shape == (2, RESIZE, 2 * RESIZE, 2)
    # ~2.4M parameters printed by the reference (Birds_Eye_View_Loss/main.py:167)
    n = _count_params(variables)
    assert 1.9e6 < n < 2.9e6, n


def test_erfnet_dual_head():
    net = ERFNet(in_channels=3, out_channels=2, pretrained=True)
    x = jnp.zeros((1, RESIZE, 2 * RESIZE, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    _, main, _ = net.apply(variables, x, train=False, use_main_head=True)
    _, aux, _ = net.apply(variables, x, train=False, use_main_head=False)
    assert main.shape[-1] == 2 and aux.shape[-1] == 3


def test_erfnet_only_encode():
    net = ERFNet(in_channels=3, out_channels=5)
    x = jnp.zeros((1, RESIZE, 2 * RESIZE, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False, only_encode=True)
    assert out.shape == (1, RESIZE // 8, 2 * RESIZE // 8, 5)


def test_registry():
    assert define_model("erfnet").out_channels == 2
    with pytest.raises(KeyError):
        define_model("resnet999")


@pytest.mark.parametrize("profile,clas", [("bp", True), ("bev", True),
                                          ("bp", False)])
def test_lanenet_e2e_forward(profile, clas):
    nclasses = 4 if clas else 2
    defaults = bp_defaults if profile == "bp" else bev_defaults
    cfg = defaults(resize=RESIZE, nclasses=nclasses, clas=clas,
                   batch_size=2, order=2)
    net = LaneNet(cfg)
    variables = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, RESIZE, 2 * RESIZE, 3)),
                    jnp.float32)
    out = net.apply(variables, x, phase="e2e", train=False)
    assert out.beta.shape == (2, nclasses, 3)
    assert out.weightmaps.shape == (2, nclasses, RESIZE, 2 * RESIZE)
    assert out.seg_logits.shape == (2, RESIZE, 2 * RESIZE, nclasses)
    if clas:
        if profile == "bev":
            assert out.line_logits.shape == (2, 3, 4)
        else:
            assert out.line_logits.shape == (2, 4)
        assert out.horizon_logits.shape == (2, RESIZE)
    assert bool(jnp.all(jnp.isfinite(out.beta)))


def test_lanenet_mask_zeroes_top_rows():
    cfg = bp_defaults(resize=RESIZE, nclasses=2, batch_size=1,
                      mask_percentage=0.3)
    net = LaneNet(cfg)
    variables = net.init(jax.random.PRNGKey(1))
    x = jnp.ones((1, RESIZE, 2 * RESIZE, 3))
    out = net.apply(variables, x, phase="e2e", train=False)
    from math import ceil
    zr = ceil(RESIZE * 0.3)
    assert float(jnp.abs(out.weightmaps[:, :, :zr]).max()) == 0.0
    assert float(jnp.abs(out.weightmaps[:, :, zr:]).max()) > 0.0


def test_lanenet_seg_phase_uses_class_index_weights():
    cfg = bp_defaults(resize=RESIZE, nclasses=4, batch_size=1,
                      end_to_end=False)
    net = LaneNet(cfg)
    variables = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, RESIZE, 2 * RESIZE, 3)),
                    jnp.float32)
    out = net.apply(variables, x, phase="seg", train=False)
    # seg logits have nclasses+1 channels (background)
    assert out.seg_logits.shape[-1] == 5
    # weight maps take values in {0, k} for lane k (LSQ_layer.py:302-308)
    for k in range(4):
        vals = np.unique(np.asarray(out.weightmaps[0, k]))
        assert set(vals.tolist()) <= {0.0, float(k + 1)}


def test_lanenet_skip_phase():
    cfg = bp_defaults(resize=RESIZE, nclasses=4, pretrained=True,
                      end_to_end=True)
    net = LaneNet(cfg)
    variables = net.init(jax.random.PRNGKey(3))
    x = jnp.zeros((1, RESIZE, 2 * RESIZE, 3))
    out = net.apply(variables, x, phase="skip", train=False)
    assert out.beta is None
    assert out.seg_logits.shape[-1] == 5  # aux head: nclasses+1


def test_lanenet_train_mode_mutates_batch_stats():
    cfg = bp_defaults(resize=RESIZE, nclasses=2)
    net = LaneNet(cfg)
    variables = net.init(jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.default_rng(2).normal(0.5, 1, (2, RESIZE, 2 * RESIZE, 3)),
                    jnp.float32)
    out, new_vars = net.apply(variables, x, phase="e2e", train=True,
                              rng=jax.random.PRNGKey(5),
                              mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_vars["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.parametrize("scheme", ["normal", "xavier", "kaiming", "orthogonal"])
def test_init_weights_schemes(scheme):
    net = ERFNet(in_channels=3, out_channels=2)
    x = jnp.zeros((1, 32, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    new = init_weights(variables, scheme, jax.random.PRNGKey(7))
    # biases zeroed
    flat = jax.tree_util.tree_flatten_with_path(new["params"])[0]
    for path, leaf in flat:
        name = path[-1].key
        if name == "bias":
            assert float(jnp.abs(leaf).max()) == 0.0
    # kernels resampled & finite, forward still works
    enc, dec, _ = net.apply(new, x, train=False)
    assert bool(jnp.all(jnp.isfinite(dec)))


def test_kaiming_statistics():
    """kaiming std = sqrt(2/fan_in) (utils.py:530-543)."""
    net = ERFNet(in_channels=3, out_channels=2)
    x = jnp.zeros((1, 32, 64, 3))
    variables = init_weights(net.init(jax.random.PRNGKey(0), x, train=False),
                             "kaiming", jax.random.PRNGKey(11))
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    checked = 0
    for path, leaf in flat:
        if path[-1].key == "kernel" and leaf.ndim == 4 and leaf.size > 10000:
            kh, kw, cin, cout = leaf.shape
            want = np.sqrt(2.0 / (kh * kw * cin))
            got = float(jnp.std(leaf))
            assert abs(got - want) / want < 0.15, (path, got, want)
            checked += 1
    assert checked > 0

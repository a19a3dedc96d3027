"""Numerical parity against the actual PyTorch reference implementation.

Imports the reference modules from /root/reference (CPU torch) and checks
our JAX ops produce the same numbers — the BASELINE.json contract ("area
metric within 1e-5 of the reference"). Skipped wholesale if the reference
tree or torch is unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
BEV = os.path.join(REF, "Birds_Eye_View_Loss")
BP = os.path.join(REF, "Backprojection_Loss")

pytestmark = pytest.mark.skipif(not os.path.isdir(BEV),
                                reason="reference tree not mounted")


def _import_tree(tree, name):
    """Import `Loss_crit` and `Networks.LSQ_layer` of one reference tree
    under a unique module alias (both trees reuse the same module names)."""
    saved_path = list(sys.path)
    saved_mods = {k: v for k, v in sys.modules.items()
                  if k in ("Loss_crit", "Networks") or k.startswith("Networks.")}
    for k in saved_mods:
        del sys.modules[k]
    sys.path.insert(0, tree)
    try:
        spec = importlib.util.spec_from_file_location(
            f"{name}_loss_crit", os.path.join(tree, "Loss_crit.py"))
        loss_crit = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(loss_crit)
        import Networks.LSQ_layer as lsq  # noqa: F401
        lsq = sys.modules["Networks.LSQ_layer"]
        return loss_crit, lsq
    finally:
        sys.path[:] = saved_path
        for k in ("Loss_crit", "Networks"):
            sys.modules.pop(k, None)
        for k in list(sys.modules):
            if k.startswith("Networks."):
                del sys.modules[k]
        sys.modules.update(saved_mods)


@pytest.fixture(scope="module")
def bev():
    return _import_tree(BEV, "bev")


@pytest.fixture(scope="module")
def bp():
    return _import_tree(BP, "bp")


# ----------------------------------------------------------------------
# Exact-area metric (Loss_crit.polynomial.trapezoidal)
# ----------------------------------------------------------------------

def test_trapezoidal_metric_parity(bev):
    from lanedetection_end2end_tpu.ops import trapezoidal_area
    loss_crit, _ = bev
    rng = np.random.default_rng(0)
    pred = rng.normal(0.5, 0.2, (6, 3)).astype(np.float32)
    gt = rng.normal(0.5, 0.2, (6, 3)).astype(np.float32)
    ref = loss_crit.polynomial(torch.tensor(pred)).trapezoidal(
        loss_crit.polynomial(torch.tensor(gt)))
    ours = np.asarray(trapezoidal_area(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-7)


# ----------------------------------------------------------------------
# Area / MSE losses
# ----------------------------------------------------------------------

@pytest.mark.parametrize("order,weight_funct", [
    (2, "none"), (2, "linear"), (2, "quadratic"), (1, "none")])
def test_area_loss_parity(bev, order, weight_funct):
    from lanedetection_end2end_tpu.ops import area_loss
    loss_crit, _ = bev
    rng = np.random.default_rng(1)
    o1 = order + 1
    pred = rng.normal(0.5, 0.2, (8, o1)).astype(np.float32)
    gt = rng.normal(0.5, 0.2, (8, o1)).astype(np.float32)
    gt[5] = 0.0  # absent lane: masked out (Loss_crit.py:131-133)
    crit = loss_crit.Area_Loss(order, weight_funct)
    # the reference's `.byte()` mask predates torch's bool-only masked_select
    orig_ms = torch.masked_select
    torch.masked_select = lambda inp, mask: orig_ms(inp, mask.bool())
    try:
        ref = crit(torch.tensor(pred).unsqueeze(-1), torch.tensor(gt))
    finally:
        torch.masked_select = orig_ms
    ours = np.asarray(area_loss(jnp.asarray(pred), jnp.asarray(gt),
                                order=order, weight_funct=weight_funct))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5, atol=1e-7)


def test_mse_loss_parity(bev):
    from lanedetection_end2end_tpu.ops import mse_params_loss
    loss_crit, _ = bev
    opts = types.SimpleNamespace(no_cuda=True)
    crit = loss_crit.MSE_Loss(opts)
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(4, 3)).astype(np.float32)
    gt = rng.normal(size=(4, 3)).astype(np.float32)
    ref = crit(torch.tensor(pred).unsqueeze(-1), torch.tensor(gt))
    ours = np.asarray(mse_params_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-6)


# ----------------------------------------------------------------------
# Backprojection loss (BP tree)
# ----------------------------------------------------------------------

def test_backprojection_loss_parity(bp):
    from lanedetection_end2end_tpu.ops import BackprojectionLoss
    loss_crit, _ = bp
    opts = types.SimpleNamespace(resize=256, no_mapping=False, order=3,
                                 batch_size=4, no_cuda=True)
    ref_crit = loss_crit.backprojection_loss(opts)
    ours_crit = BackprojectionLoss(resize=256, order=3)
    rng = np.random.default_rng(3)
    # realistic coefficient scales: x ~ hundreds of BEV pixels
    beta = np.stack([rng.normal(0, 1e-7, 4), rng.normal(0, 1e-4, 4),
                     rng.normal(0, 1e-2, 4),
                     rng.uniform(100, 400, 4)], axis=1).astype(np.float64)
    x_gt = rng.uniform(0, 511, (4, 56)).astype(np.float64)
    valid = (rng.uniform(size=(4, 56)) > 0.3).astype(np.float64)
    ref_loss, ref_xcal = ref_crit(
        torch.tensor(beta).unsqueeze(-1), torch.tensor(x_gt),
        torch.tensor(valid))
    our_loss, our_xcal = ours_crit(jnp.asarray(beta, jnp.float32),
                                   jnp.asarray(x_gt, jnp.float32),
                                   jnp.asarray(valid, jnp.float32))
    np.testing.assert_allclose(np.asarray(our_xcal), ref_xcal.numpy(),
                               rtol=1e-4, atol=5e-3)
    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=5e-4)


# ----------------------------------------------------------------------
# Weighted least squares: full reference path (grid generator + WLS module)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("order", [1, 2])
def test_wls_full_path_parity(bev, order):
    from lanedetection_end2end_tpu.geometry import bev_matrices_normalized
    from lanedetection_end2end_tpu.ops import WLSFitter
    _, lsq = bev
    B, C, H, W = 2, 4, 64, 128
    size, M, M_inv = lsq.Init_Projective_transform(C, B, H)
    size = torch.Size([B, C, H, W])
    gridgen = lsq.ProjectiveGridGenerator(size, M, no_cuda=True)
    wls = lsq.Weighted_least_squares(size, C, order, no_cuda=True,
                                     reg_ls=1e-5)
    grid = gridgen(M)

    rng = np.random.default_rng(4)
    wmaps = np.zeros((B, C, H, W), dtype=np.float32)
    ys = np.arange(H)
    for b in range(B):
        for c in range(C):
            xs = np.clip((0.3 + 0.1 * c) * W + 0.05 * ys
                         + rng.normal(0, .5, H), 0, W - 1)
            wmaps[b, c, ys, xs.astype(int)] = rng.uniform(0.5, 1.0, H)
    t_w = torch.tensor(wmaps.reshape(B, C, H * W))
    beta0, beta1, beta2, beta3 = wls(t_w, grid)
    ref_beta = np.stack([b.squeeze(-1).numpy()
                         for b in (beta0, beta1, beta2, beta3)], axis=1)

    our_M, _ = bev_matrices_normalized()
    fitter = WLSFitter(our_M, H, W, order, normalized=True, reg_ls=1e-5,
                       reg_floor=0.0)
    ours = np.asarray(fitter(jnp.asarray(wmaps)))
    np.testing.assert_allclose(ours, ref_beta, rtol=5e-3, atol=5e-4)


def test_area_metric_within_1e5_of_reference(bev):
    """The BASELINE.json acceptance: trapezoidal area metric computed from
    our fit vs from the reference's fit agrees within 1e-5."""
    from lanedetection_end2end_tpu.geometry import bev_matrices_normalized
    from lanedetection_end2end_tpu.ops import WLSFitter, trapezoidal_area
    loss_crit, lsq = bev
    B, C, H, W = 2, 2, 64, 128
    size = torch.Size([B, C, H, W])
    _, M, _ = lsq.Init_Projective_transform(C, B, H)
    gridgen = lsq.ProjectiveGridGenerator(size, M, no_cuda=True)
    wls = lsq.Weighted_least_squares(size, C, 2, no_cuda=True, reg_ls=1e-5)
    grid = gridgen(M)

    rng = np.random.default_rng(5)
    wmaps = np.zeros((B, C, H, W), dtype=np.float32)
    ys = np.arange(H)
    for b in range(B):
        for c in range(C):
            xs = np.clip((0.4 + 0.2 * c) * W + 0.05 * ys
                         + rng.normal(0, .5, H), 0, W - 1)
            wmaps[b, c, ys, xs.astype(int)] = rng.uniform(0.5, 1.0, H)
    beta0, beta1, _, _ = wls(torch.tensor(wmaps.reshape(B, C, H * W)), grid)

    gt = rng.normal(0.5, 0.1, (B, 2, 3)).astype(np.float32)
    ref_trap = (loss_crit.polynomial(beta0.squeeze(-1)).trapezoidal(
                    loss_crit.polynomial(torch.tensor(gt[:, 0])))
                + loss_crit.polynomial(beta1.squeeze(-1)).trapezoidal(
                    loss_crit.polynomial(torch.tensor(gt[:, 1])))) / 2
    ref_metric = float(ref_trap.mean())

    our_M, _ = bev_matrices_normalized()
    fitter = WLSFitter(our_M, H, W, 2, normalized=True, reg_ls=1e-5,
                       reg_floor=0.0)
    beta = np.asarray(fitter(jnp.asarray(wmaps)))
    ours = (np.asarray(trapezoidal_area(jnp.asarray(beta[:, 0]),
                                        jnp.asarray(gt[:, 0])))
            + np.asarray(trapezoidal_area(jnp.asarray(beta[:, 1]),
                                          jnp.asarray(gt[:, 1])))) / 2
    our_metric = float(ours.mean())
    assert abs(our_metric - ref_metric) < 1e-5


# ----------------------------------------------------------------------
# Segmentation CE semantics vs torch
# ----------------------------------------------------------------------

def test_weighted_ce_matches_torch():
    from lanedetection_end2end_tpu.ops import weighted_cross_entropy
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(2, 8, 16, 5)).astype(np.float32)
    targets = rng.integers(0, 5, (2, 8, 16))
    weights = np.array([1.0] + [30.0] * 4, dtype=np.float32)
    # torch CE over NCHW (Backprojection_Loss/Loss_crit.py:64-65)
    ref = torch.nn.CrossEntropyLoss(torch.tensor(weights))(
        torch.tensor(logits.transpose(0, 3, 1, 2)), torch.tensor(targets))
    ours = np.asarray(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_bce_matches_torch():
    from lanedetection_end2end_tpu.ops import bce_with_logits
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(4, 256)).astype(np.float32)
    targets = (rng.uniform(size=(4, 256)) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                       torch.tensor(targets))
    ours = np.asarray(bce_with_logits(jnp.asarray(logits),
                                      jnp.asarray(targets)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-6)


# ----------------------------------------------------------------------
# Full-network weight port: torch Net state_dict -> flax, forward parity
# ----------------------------------------------------------------------

def test_weight_port_full_net_forward(bev):
    """Port a randomly-initialized reference BEV `Net` (ERFNet backbone +
    line/horizon heads + WLS, LSQ_layer.py:231-326) into the flax model via
    models/port.py and require forward agreement in eval mode — closes the
    ConvTranspose/BN/padding/flatten-order parity hole."""
    _, lsq = bev
    import types
    from lanedetection_end2end_tpu.config import bev_defaults
    from lanedetection_end2end_tpu.models import (
        LaneNet, load_into_variables, port_torch_state_dict)
    from lanedetection_end2end_tpu.ops.wls import WLSFitter

    B, resize = 2, 256
    args = types.SimpleNamespace(
        resize=resize, batch_size=B, nclasses=4, mod="erfnet", layers=18,
        channels_in=3, pretrained=False, pool=False,
        activation_layer="square", no_cuda=True, order=2, reg_ls=1e-5,
        use_cholesky=False, mask_percentage=0.3, clas=True,
        end_to_end=True)
    torch.manual_seed(7)
    ref = lsq.Net(args)
    ref.eval()
    # make the ported running stats non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.05, 0.05)
            m.running_var.uniform_(0.9, 1.1)

    cfg = bev_defaults(resize=resize, batch_size=B, nclasses=4, order=2,
                       end_to_end=True, clas=True, reg_ls=1e-5,
                       mask_percentage=0.3, activation_layer="square")
    lanenet = LaneNet(cfg)
    # exact-parity solve (no trace-relative floor on top of reg_ls)
    lanenet.fitter = WLSFitter(lanenet.M, cfg.image_height, cfg.image_width,
                               cfg.order, normalized=True, reg_ls=1e-5,
                               reg_floor=0.0, use_pallas=False)
    variables = lanenet.init(jax.random.PRNGKey(0))
    ported = port_torch_state_dict(ref.state_dict(), profile="bev",
                                   resize=resize)
    variables = load_into_variables(jax.device_get(variables), ported)

    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (B, 3, resize, 2 * resize)).astype(np.float32)
    with torch.no_grad():
        (b0, b1, b2, b3, masked, _M, output, line,
         horizon) = ref(torch.tensor(img), end_to_end=True)
    ref_beta = np.stack([b.squeeze(-1).numpy() for b in (b0, b1, b2, b3)],
                        axis=1)

    out = lanenet.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                        phase="e2e", train=False)

    # backbone seg logits (the decoder output; covers every conv /
    # ConvTranspose / BN on the main path)
    np.testing.assert_allclose(
        np.asarray(out.seg_logits).transpose(0, 3, 1, 2), output.numpy(),
        rtol=1e-3, atol=2e-4)
    # classification heads (cover the NCHW->NHWC flatten permutation)
    np.testing.assert_allclose(np.asarray(out.line_logits), line.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.horizon_logits),
                               horizon.numpy(), rtol=1e-3, atol=2e-4)
    # end-to-end fitted coefficients
    np.testing.assert_allclose(np.asarray(out.beta), ref_beta,
                               rtol=5e-3, atol=5e-4)


def test_weight_port_erfnet_pretrain_head(bev):
    """Dual-head ERFNet port: the pretrain head (output_conv2) is carried
    over and selected by the seg phase (ERFNet.py:125-139)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_erfnet_bev", os.path.join(BEV, "Networks", "ERFNet.py"))
    ref_erfnet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_erfnet)
    from lanedetection_end2end_tpu.models import (
        ERFNet, load_into_variables, port_torch_state_dict)

    torch.manual_seed(3)
    ref = ref_erfnet.Net(in_channels=3, out_channels=2, pretrained=True)
    ref.eval()

    model = ERFNet(in_channels=3, out_channels=2, pretrained=True)
    img = np.random.default_rng(1).uniform(
        0, 1, (1, 3, 64, 128)).astype(np.float32)
    xj = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xj, train=False)
    ported = port_torch_state_dict(ref.state_dict())
    # bare-ERFNet init names its subtrees encoder/decoder directly (no
    # 'erfnet' wrapper module)
    ported = {"params": ported["params"]["erfnet"],
              "batch_stats": ported["batch_stats"]["erfnet"]}
    variables = load_into_variables(jax.device_get(variables), ported)

    for flag, use_main in ((1, True), (0, False)):
        with torch.no_grad():
            _, ref_out = ref(torch.tensor(img), flag)
        ours = model.apply(variables, xj, train=False,
                           use_main_head=use_main)[1]
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref_out.numpy(), rtol=1e-3, atol=2e-4)


def test_train_step_grad_parity(bev):
    """Gradient-level training parity: ONE e2e step's parameter gradients.

    From identical ported weights and an identical batch, compute the BEV
    e2e loss (forward per LSQ_layer.py:290-326, area loss assembled per
    main.py:222-237) in BOTH frameworks and compare d(loss)/d(theta) for
    every conv/BN/ConvTranspose parameter. This is the strongest
    correctness statement available without the TuSimple label blobs: it
    exercises the WLS solve's backward (the reference's torch.inverse
    autograd / gels.py:17-25 analog — our spd_solve is natively
    differentiable), the area-loss closed forms, and the whole backbone
    transpose chain. Eval-mode normalization on both sides (running BN
    stats, no dropout) keeps the comparison deterministic; the parameter
    gradients are identical functions of theta either way."""
    loss_crit, lsq = bev
    from lanedetection_end2end_tpu.config import bev_defaults
    from lanedetection_end2end_tpu.models import (
        LaneNet, load_into_variables, port_torch_state_dict)
    from lanedetection_end2end_tpu.ops.wls import WLSFitter
    from lanedetection_end2end_tpu.train.steps import make_loss_fn

    B, resize = 2, 128
    args = types.SimpleNamespace(
        resize=resize, batch_size=B, nclasses=2, mod="erfnet", layers=18,
        channels_in=3, pretrained=False, pool=False,
        activation_layer="square", no_cuda=True, order=2, reg_ls=1e-4,
        use_cholesky=False, mask_percentage=0.3, clas=False,
        end_to_end=True)
    torch.manual_seed(21)
    ref = lsq.Net(args)
    ref.eval()  # running stats + no dropout: deterministic gradients
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.05, 0.05)
            m.running_var.uniform_(0.9, 1.1)

    cfg = bev_defaults(resize=resize, batch_size=B, nclasses=2, order=2,
                       end_to_end=True, clas=False, reg_ls=1e-4,
                       mask_percentage=0.3, activation_layer="square",
                       loss_policy="area", weight_funct="none")
    lanenet = LaneNet(cfg)
    lanenet.fitter = WLSFitter(lanenet.M, cfg.image_height, cfg.image_width,
                               cfg.order, normalized=True, reg_ls=1e-4,
                               reg_floor=0.0, use_pallas=False)
    variables = lanenet.init(jax.random.PRNGKey(0))
    ported = port_torch_state_dict(ref.state_dict(), profile="bev",
                                   resize=resize)
    variables = load_into_variables(jax.device_get(variables), ported)

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (B, 3, resize, 2 * resize)).astype(np.float32)
    gt = rng.uniform(0.2, 0.8, (B, 2, 3)).astype(np.float32)

    # --- torch: forward + area loss + backward (main.py:214-266) ---------
    criterion = loss_crit.Area_Loss(order=2, weight_funct="none")
    b0, b1, _, _, _, _, _, _, _ = ref(torch.tensor(img), end_to_end=True)
    # the reference's `.byte()` mask predates torch's bool-only masked_select
    orig_ms = torch.masked_select
    torch.masked_select = lambda inp, mask: orig_ms(inp, mask.bool())
    try:
        loss_ref = (criterion(b0, torch.tensor(gt[:, 0]))
                    + criterion(b1, torch.tensor(gt[:, 1])))
    finally:
        torch.masked_select = orig_ms
    ref.zero_grad()
    loss_ref.backward()
    grad_sd = {}
    named = dict(ref.named_parameters())
    for k, v in ref.state_dict().items():
        g = named[k].grad if k in named and named[k].grad is not None else None
        grad_sd[k] = (g if g is not None
                      else torch.zeros(v.shape, dtype=torch.float32))
    ported_grads = port_torch_state_dict(grad_sd, profile="bev",
                                         resize=resize)["params"]

    # --- ours: jax.grad of the same loss through the same weights --------
    loss_fn = make_loss_fn(lanenet, cfg, "e2e", train=False,
                           use_packed=False)
    batch = {"image": jnp.asarray(img.transpose(0, 2, 3, 1)),
             "params": jnp.asarray(gt)}

    def scalar_loss(params):
        loss, _ = loss_fn(params, variables["batch_stats"], batch, None)
        return loss

    loss_ours, grads = jax.value_and_grad(scalar_loss)(variables["params"])
    np.testing.assert_allclose(float(loss_ours), float(loss_ref),
                               rtol=1e-4, atol=1e-7)

    flat_ref = jax.tree_util.tree_flatten_with_path(ported_grads)[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(
        jax.device_get(grads))[0])
    checked = 0
    for path, want in flat_ref:
        got = np.asarray(flat_got[path], np.float64)
        want = np.asarray(want, np.float64)
        # f32 forward + transpose chain: per-leaf tolerance scaled to the
        # leaf's gradient magnitude (deep leaves have tiny grads)
        tol = 5e-3 * max(np.abs(want).max(), 1e-12) + 1e-9
        err = np.abs(got - want).max()
        assert err <= tol, (jax.tree_util.keystr(path), err, tol)
        checked += 1
    assert checked > 100  # every conv/BN/ConvT leaf of the backbone


def test_weight_port_full_net_forward_bp(bp):
    """BP-tree full-`Net` weight port: the Backprojection wrapper (PIXEL
    grid, order-3 fit, FC-4 presence line head,
    Backprojection_Loss/Networks/LSQ_layer.py:210-315) ported end-to-end
    and required to agree in eval mode — the BP twin of
    test_weight_port_full_net_forward (which covers the BEV wrapper)."""
    _, lsq = bp
    from lanedetection_end2end_tpu.config import bp_defaults
    from lanedetection_end2end_tpu.models import (
        LaneNet, load_into_variables, port_torch_state_dict)
    from lanedetection_end2end_tpu.ops.wls import WLSFitter

    B, resize = 2, 256
    args = types.SimpleNamespace(
        resize=resize, batch_size=B, nclasses=4, mod="erfnet", layers=18,
        channels_in=3, pretrained=False, pool=False,
        activation_layer="square", no_cuda=True, order=3, reg_ls=1.0,
        use_cholesky=False, mask_percentage=0.2, clas=True,
        end_to_end=True, no_mapping=False)
    torch.manual_seed(13)
    ref = lsq.Net(args)
    ref.eval()
    # make the ported running stats non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.05, 0.05)
            m.running_var.uniform_(0.9, 1.1)

    cfg = bp_defaults(resize=resize, batch_size=B, nclasses=4, order=3,
                      end_to_end=True, clas=True, reg_ls=1.0,
                      mask_percentage=0.2, activation_layer="square",
                      loss_policy="backproject")
    lanenet = LaneNet(cfg)
    # exact-parity solve (no trace-relative floor on top of reg_ls)
    lanenet.fitter = WLSFitter(lanenet.M, cfg.image_height, cfg.image_width,
                               cfg.order, normalized=False, reg_ls=1.0,
                               reg_floor=0.0, use_pallas=False)
    variables = lanenet.init(jax.random.PRNGKey(0))
    ported = port_torch_state_dict(ref.state_dict(), profile="bp",
                                   resize=resize)
    variables = load_into_variables(jax.device_get(variables), ported)

    rng = np.random.default_rng(17)
    img = rng.uniform(0, 1, (B, 3, resize, 2 * resize)).astype(np.float32)
    gt_line = torch.zeros(B, 4)  # e2e: the seg-mode guard must not trigger
    with torch.no_grad():
        (b0, b1, b2, b3, masked, output, line,
         horizon, _seg) = ref(torch.tensor(img), gt_line, end_to_end=True)
    ref_beta = np.stack([b.squeeze(-1).numpy() for b in (b0, b1, b2, b3)],
                        axis=1)  # (B, 4, order+1), float64 upstream

    out = lanenet.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                        phase="e2e", train=False)

    # backbone seg logits (decoder output: every conv/ConvTranspose/BN)
    np.testing.assert_allclose(
        np.asarray(out.seg_logits).transpose(0, 3, 1, 2), output.numpy(),
        rtol=1e-3, atol=2e-4)
    # BP classification heads: (B, 4) presence logits + (B, resize) horizon
    assert out.line_logits.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(out.line_logits), line.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.horizon_logits),
                               horizon.numpy(), rtol=1e-3, atol=2e-4)
    # order-3 fit in PIXEL coordinates: compare the fitted curves where the
    # reference's own conditioning is meaningful — x(y) over the unmasked
    # rows — rather than raw f32-vs-f64 coefficients of an ill-conditioned
    # normal-equations solve (y^3 spans ~1.7e7 in pixel space)
    ys = np.arange(int(resize * 0.2), resize, dtype=np.float64)
    Y = np.stack([ys ** 3, ys ** 2, ys, np.ones_like(ys)], axis=-1)
    ref_x = ref_beta @ Y.T                              # (B, 4, len(ys))
    our_x = np.asarray(out.beta, np.float64) @ Y.T
    np.testing.assert_allclose(our_x, ref_x, rtol=5e-3, atol=5e-2)

"""Jitted train/eval steps — one XLA graph per (profile, phase) combination.

The reference mutates `args.end_to_end` mid-training and branches at runtime
(Birds_Eye_View_Loss/main.py:179-184, Backprojection_Loss/main.py:32-44);
here every phase is a separate compiled graph over the SAME TrainState:

  'skip' : seg CE only, LSQ layer not traced (BP early_return,
           Backprojection_Loss/main.py:256-293)
  'seg'  : seg CE drives gradients; curve losses computed as metrics only
           (main.py:239-245 BEV / :309-321 BP)
  'e2e'  : curve loss (area/mse/backprojection) [+ clas heads] end to end
           (main.py:222-255 BEV / :296-331 BP)

Loss assembly is bit-faithful to the reference drivers, including the lane
masking for absent lanes (main.py:225-237) and the per-lane averaging of the
BP tree (main.py:308). All metrics (exact trapezoidal area, rmse, clas
accuracies) are computed INSIDE the jitted graph — the reference pulls betas
to the CPU per step (main.py:273-280); here only final scalars leave the
device.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.ops import (
    BackprojectionLoss, area_loss, mse_params_loss, weighted_cross_entropy,
    bce_with_logits, cross_entropy_logits, trapezoidal_area)
from lanedetection_end2end_tpu.train.state import TrainState


def prepare_batch(batch):
    """Device-side batch preparation for compact-transfer batches: applies
    the per-sample horizontal mirror (`flip` flag — the dataset ships the
    image unflipped so the host never pays the strided uint8 mirror copy),
    widens uint8 images -> f32 in [0,1] (XLA fuses the scale into the first
    conv) and uint8 gt -> int32. A no-op for float32 batches, so both
    dataset `image_dtype` modes feed the same graphs."""
    img = batch["image"]
    flip = batch.get("flip")
    if (img.dtype != jnp.uint8 and flip is None
            and ("gt" not in batch or batch["gt"].dtype == jnp.int32)):
        return batch
    out = dict(batch)
    if flip is not None:
        # NHWC: mirror the W axis where flipped (gt/labels were mirrored on
        # host — they are tiny; the 0.4 MB image is what's worth deferring).
        img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
        out.pop("flip")
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) * (1.0 / 255.0)
    out["image"] = img
    if "gt" in batch and batch["gt"].dtype != jnp.int32:
        out["gt"] = batch["gt"].astype(jnp.int32)
    return out


def _seg_class_weights(cfg: LaneConfig) -> jnp.ndarray:
    """BEV: [1, w, w] (Loss_crit.py:52-54); BP: [1] + [w]*nclasses
    (Loss_crit.py:64-65)."""
    w = cfg.weight_seg
    if cfg.profile == "bev":
        return jnp.asarray([1.0, w, w], dtype=jnp.float32)
    return jnp.asarray([1.0] + [w] * cfg.nclasses, dtype=jnp.float32)


def _lane_present_mask(gt_params: jax.Array) -> jax.Array:
    """(B,) 1.0 where every gt coefficient is nonzero (main.py:226-229)."""
    return jnp.all(gt_params != 0, axis=-1).astype(jnp.float32)


def _resolve_packed(lanenet, cfg: LaneConfig, phase: str,
                    sharded: bool = False) -> bool:
    """Whether this graph should use the lane-packed backbone
    (ops/packed_graph.py): explicit cfg.packed_train wins; None = auto.

    Auto = on for TPU runs: with the Pallas packed-conv kernels
    (ops/pallas_packed_conv.py) the packed step measures 518+ img/s at
    256x512 bs32 vs 386 for the flax NHWC graph on v5e. `sharded=True`
    means the caller wraps the step in shard_map (pallas_calls are not
    GSPMD-partitionable, so a bare multi-device jit must NOT go packed —
    make_train_step/make_eval_step pass the mesh and build the wrapper)."""
    if cfg.packed_train is not None:
        if cfg.packed_train and not lanenet.packed_supported(phase):
            import warnings
            warnings.warn(
                "packed_train=True was forced but the packed backbone does "
                f"not support this configuration (phase={phase!r}); falling "
                "back to the flax graph. Check homography separability / "
                "resize alignment (LaneNet.packed_supported).",
                RuntimeWarning, stacklevel=2)
        return bool(cfg.packed_train) and lanenet.packed_supported(phase)
    return (jax.default_backend() == "tpu"
            and (jax.device_count() == 1 or sharded)
            and lanenet.packed_supported(phase))


def make_loss_fn(lanenet, cfg: LaneConfig, phase: str, train: bool,
                 use_packed: bool | None = None,
                 axis_name=None) -> Callable:
    """Returns loss_fn(params, batch_stats, batch, rng) ->
    (loss, (metrics, outputs, new_batch_stats)).

    `axis_name` (packed path only): mesh axis name — or tuple of names for
    the hierarchical ICI x DCN mesh — for sync-BN inside shard_map."""
    profile = cfg.profile
    seg_weights = _seg_class_weights(cfg)
    if use_packed is None:
        use_packed = _resolve_packed(lanenet, cfg, phase)
    assert axis_name is None or use_packed, \
        "axis_name is only meaningful for the shard_map'd packed path"
    if profile == "bp":
        bp_criterion = BackprojectionLoss(cfg.resize, cfg.order,
                                          cfg.no_mapping)

    def curve_loss_bev(beta, gt_params):
        """Area/MSE losses + lane masking (main.py:222-237)."""
        crit = area_loss if cfg.loss_policy == "area" else None
        loss = 0.0
        for k in range(2):
            if crit is not None:
                loss = loss + crit(beta[:, k], gt_params[:, k],
                                   order=cfg.order,
                                   weight_funct=cfg.weight_funct)
            else:
                loss = loss + mse_params_loss(beta[:, k], gt_params[:, k])
        if cfg.nclasses > 3:
            for k in (2, 3):
                if crit is not None:
                    loss = loss + crit(beta[:, k], gt_params[:, k],
                                       order=cfg.order,
                                       weight_funct=cfg.weight_funct)
                else:
                    mask = _lane_present_mask(gt_params[:, k])[:, None]
                    loss = loss + mse_params_loss(beta[:, k] * mask,
                                                  gt_params[:, k])
        return loss

    def curve_loss_bp(beta, lanes, valid_points, M_b=None, M_inv_b=None):
        """Backprojection MSE summed over lanes / nclasses (main.py:296-308).
        With learn_homography, the loss geometry uses each sample's learned
        matrices (BackprojectionLoss.with_M)."""
        loss = 0.0
        x_cal = []
        for k in range(cfg.nclasses):
            if M_b is not None:
                lk, xk = bp_criterion.with_M(beta[:, k], lanes[:, k],
                                             valid_points[:, k], M_b, M_inv_b)
            else:
                lk, xk = bp_criterion(beta[:, k], lanes[:, k],
                                      valid_points[:, k])
            loss = loss + lk
            x_cal.append(xk)
        return loss / cfg.nclasses, jnp.stack(x_cal, axis=1)

    def clas_losses(out, batch):
        if profile == "bev":
            # 3-way line-type CE + horizon BCE (main.py:88-89, 246-254)
            loss_line = cross_entropy_logits(out.line_logits, batch["line"])
        else:
            loss_line = bce_with_logits(out.line_logits, batch["line"])
        loss_horizon = bce_with_logits(out.horizon_logits, batch["horizon"])
        return loss_line, loss_horizon

    def pad_order2(beta):
        """Left-pad coefficients to [a,b,c] for the order-2 trapezoid metric."""
        pad = 3 - beta.shape[-1]
        if pad > 0:
            beta = jnp.pad(beta, [(0, 0)] * (beta.ndim - 1) + [(pad, 0)])
        elif pad < 0:
            beta = beta[..., -3:]
        return beta

    def loss_fn(params, batch_stats, batch, rng):
        batch = prepare_batch(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"] if train else False
        apply = lanenet.apply_packed if use_packed else lanenet.apply
        extra = {"axis_name": axis_name} if axis_name is not None else {}
        res = apply(variables, batch["image"], phase=phase,
                    train=train, rng=rng,
                    gt_line=batch.get("line"), mutable=mutable, **extra)
        out, new_vars = res if train else (res, None)
        new_bs = new_vars["batch_stats"] if train else batch_stats
        metrics: Dict[str, jax.Array] = {}
        outputs: Dict[str, jax.Array] = {}

        if phase in ("skip", "seg") and out.seg_logits.shape[-1] != seg_weights.shape[0]:
            raise ValueError(
                f"segmentation head has {out.seg_logits.shape[-1]} channels but "
                f"{seg_weights.shape[0]} classes are expected — seg-phase "
                "training needs the background channel (configure "
                "pretrained=True for the dual head, or end_to_end=False; "
                "reference: LSQ_layer.py:242 out_channels=nclasses+~end_to_end)")

        if phase == "skip":
            loss = weighted_cross_entropy(out.seg_logits, batch["gt"],
                                          seg_weights)
            metrics["loss"] = loss
            return loss, (metrics, outputs, new_bs)

        beta = out.beta
        outputs["beta"] = beta
        if profile == "bev":
            gt_params = batch["params"]
            curve = curve_loss_bev(beta, gt_params)
            if phase == "e2e":
                loss = curve
            else:
                loss = weighted_cross_entropy(out.seg_logits, batch["gt"],
                                              seg_weights)
                metrics["area_sq"] = jax.lax.stop_gradient(curve)
            # exact trapezoidal egolane area metric (main.py:273-280)
            tl = trapezoidal_area(pad_order2(beta[:, 0]),
                                  pad_order2(gt_params[:, 0]))
            tr = trapezoidal_area(pad_order2(beta[:, 1]),
                                  pad_order2(gt_params[:, 1]))
            metrics["exact_area"] = jax.lax.stop_gradient(
                jnp.mean((tl + tr) / 2.0))
        else:
            curve, x_cal = curve_loss_bp(beta, batch["lanes"],
                                         batch["valid_points"],
                                         out.M, out.M_inv)
            outputs["x_cal"] = x_cal
            if phase == "e2e":
                loss = curve
            else:
                loss = weighted_cross_entropy(out.seg_logits, batch["gt"],
                                              seg_weights)
                metrics["rmse"] = jax.lax.stop_gradient(curve)

        if cfg.clas and phase == "e2e":
            loss_line, loss_horizon = clas_losses(out, batch)
            loss = (loss * cfg.weight_fit
                    + (loss_line + loss_horizon) * cfg.weight_class)
            metrics["loss_line"] = loss_line
            metrics["loss_horizon"] = loss_horizon
            # Validation accuracies (main.py:417-433)
            if profile == "bev":
                line_pred = jnp.argmax(out.line_logits, axis=1)
                metrics["acc_line"] = jnp.mean(
                    (line_pred == batch["line"]).astype(jnp.float32))
            else:
                line_pred = jnp.round(jax.nn.sigmoid(out.line_logits))
                metrics["acc_line"] = jnp.mean(
                    (line_pred == batch["line"]).astype(jnp.float32))
            horizon_pred = jnp.round(jax.nn.sigmoid(out.horizon_logits))
            metrics["acc_horizon"] = jnp.mean(
                (horizon_pred == batch["horizon"]).astype(jnp.float32))
            outputs["line_pred"] = line_pred
            outputs["horizon_pred"] = horizon_pred

        metrics["loss"] = loss
        return loss, (metrics, outputs, new_bs)

    return loss_fn


def _packed_compiler_options(use_packed: bool, dtype=None):
    """Per-jit XLA options for the packed TPU train step.

    The fused NB1D half-block backward kernels (ops/pallas_nb_block.py) need
    ~22 MB of scoped VMEM at bs32 in bf16 against XLA's 16 MB default —
    and ~37.4 MB when the planes are f32 (measured: the decoder NB16
    backward at resize 256 allocates 37.35 M and a 32 M limit fails the
    compile with a scoped-vmem stack OOM). Raise the limit per dtype for
    this one program (v5e has 128 MB of VMEM). Passed per-jit because the
    flag is TPU-only — putting it in XLA_FLAGS kills CPU-backend processes
    with 'Unknown flag'."""
    from lanedetection_end2end_tpu.ops.packed_graph import fused_blocks_on
    if use_packed and fused_blocks_on() and jax.default_backend() == "tpu":
        limit = "32768" if dtype == jnp.bfloat16 else "49152"
        return {"xla_tpu_scoped_vmem_limit_kib": limit}
    return None


def _mesh_is_sharded(mesh) -> bool:
    return mesh is not None and mesh.devices.size > 1


def _mesh_axes(mesh) -> tuple:
    """All axis names of the DP mesh — ("data",) for the 1-D mesh,
    ("dcn", "data") for the two-level ICI x DCN mesh (parallel/mesh.py).
    Collectives over the tuple decompose hierarchically in XLA."""
    return tuple(mesh.axis_names)


def _shard_index(axes) -> jax.Array:
    """Linear index of this shard over (possibly hierarchical) mesh axes."""
    idx = 0
    for a in axes:
        idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
    return idx


def _shard_map(fn, mesh, in_specs, out_specs):
    import inspect
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    kw = ("check_vma" if "check_vma" in inspect.signature(shard_map).parameters
          else "check_rep")
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **{kw: False})


def make_train_step(lanenet, cfg: LaneConfig, tx, phase: str,
                    donate: bool = True, mesh=None):
    """jitted (state, batch, rng) -> (state, metrics).

    `mesh`: the DP mesh the caller shards batches over (parallel/mesh.py).
    When the packed backbone is active on a real mesh, the whole step runs
    per-shard inside shard_map — pallas_calls are not GSPMD-partitionable —
    with explicit collectives supplying what GSPMD otherwise infers:
    train-mode BN moments pmean'd over the axis (sync-BN) and gradients +
    metrics pmean'd before the (replicated) optimizer update. The flax
    graph keeps the plain jit: GSPMD partitions it from the input shardings.
    """
    sharded = _mesh_is_sharded(mesh)
    use_packed = _resolve_packed(lanenet, cfg, phase, sharded=sharded)
    axis = _mesh_axes(mesh) if (sharded and use_packed) else None
    loss_fn = make_loss_fn(lanenet, cfg, phase, train=True,
                           use_packed=use_packed, axis_name=axis)

    def step(state: TrainState, batch, rng):
        if axis is not None and rng is not None:
            # decorrelate dropout draws across shards (GSPMD equivalent:
            # one global mask array split over the batch axis)
            rng = jax.random.fold_in(rng, _shard_index(axis))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, _, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        if axis is not None:
            # hierarchical mesh: XLA decomposes the pmean over ("dcn",
            # "data") into intra-slice (ICI) + cross-slice (DCN) phases
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        return (TrainState(new_params, new_bs, new_opt), metrics)

    if axis is not None:
        from jax.sharding import PartitionSpec as P
        step = _shard_map(step, mesh, in_specs=(P(), P(axis), P()),
                          out_specs=(P(), P()))
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=_packed_compiler_options(
                       use_packed, getattr(lanenet, "dtype", None)))


def make_eval_step(lanenet, cfg: LaneConfig, phase: str, mesh=None):
    """jitted (state, batch) -> (metrics, outputs) — no gradients, running
    BN statistics (model.eval() semantics, main.py:373-376). Same shard_map
    wrapping rule as make_train_step (metrics pmean'd, outputs sharded)."""
    sharded = _mesh_is_sharded(mesh)
    use_packed = _resolve_packed(lanenet, cfg, phase, sharded=sharded)
    axis = _mesh_axes(mesh) if (sharded and use_packed) else None
    loss_fn = make_loss_fn(lanenet, cfg, phase, train=False,
                           use_packed=use_packed)

    def step(state: TrainState, batch):
        _, (metrics, outputs, _) = loss_fn(state.params, state.batch_stats,
                                           batch, None)
        if axis is not None:
            metrics = jax.lax.pmean(metrics, axis)
        return metrics, outputs

    if axis is not None:
        from jax.sharding import PartitionSpec as P
        step = _shard_map(step, mesh, in_specs=(P(), P(axis)),
                          out_specs=(P(), P(axis)))
    return jax.jit(step, compiler_options=_packed_compiler_options(
        use_packed, getattr(lanenet, "dtype", None)))

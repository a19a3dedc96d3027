"""LaneNet: the composite model — backbone -> activation -> row mask ->
differentiable weighted-LSQ fit, plus aux classification heads.

Parity with `Net` (Birds_Eye_View_Loss/Networks/LSQ_layer.py:231-326 and
Backprojection_Loss/Networks/LSQ_layer.py:210-315), redesigned for XLA:

- The `end_to_end` switch is a STATIC phase ('e2e' | 'seg' | 'skip'); each
  phase compiles to its own XLA graph over shared parameters instead of
  branching at runtime (the reference mutates `args.end_to_end` mid-training).
- The top-row mask (`index_fill` over rows [0, ceil(resize*mask_pct)),
  LSQ_layer.py:316) is a constant multiplicative mask fused into the
  activation by XLA.
- Seg-mode lane maps: detached argmax split into per-lane maps carrying the
  CLASS INDEX as weight (left=1*(am==1), right=2*(am==2), ...,
  LSQ_layer.py:302-308 / BP :283-293) — replicated exactly, including the
  index weighting quirk.
- The BP tree's seg-mode "singular matrix guard" (LSQ_layer.py:309-311)
  copies lane-0's weight map over lanes flagged by `gt_line` — as written in
  the reference it overwrites maps of PRESENT lanes (gt_line==1 means
  present). Our solve is total (regularized floor, ops/wls.py), so the guard
  is unnecessary; `absent_lane_guard=True` opts into the sane variant
  (replace ABSENT-lane maps) for experimentation.

The neural part is a flax module (`LaneNetModule`); the full pipeline
(`LaneNet`) is a thin host object composing it with the constant-basis WLS
fitter and mask.
"""

from __future__ import annotations

import dataclasses
import os
from math import ceil
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.geometry import (
    bev_matrices_normalized, bev_matrices_pixel)
from lanedetection_end2end_tpu.models.erfnet import ERFNet
from lanedetection_end2end_tpu.models.heads import Classification
from lanedetection_end2end_tpu.ops.activations import activation_fn
from lanedetection_end2end_tpu.ops.wls import WLSFitter


@dataclasses.dataclass
class LaneNetOutput:
    """Forward outputs; mirrors the reference forward tuple
    (beta0..3, weightmap_zeros, [M,] output_net, outputs_line,
    outputs_horizon[, output_seg])."""
    beta: Optional[jax.Array]          # (B, nclasses, order+1) or None (skip)
    weightmaps: Optional[jax.Array]    # (B, nclasses, H, W)
    seg_logits: jax.Array              # (B, H, W, out_channels) NHWC
    line_logits: Optional[jax.Array]   # (B,3,4) bev | (B,4) bp | None
    horizon_logits: Optional[jax.Array]  # (B, resize) | None
    encoder_features: Optional[jax.Array] = None  # (B, H/8, W/8, 128)
    # learned-homography option only (cfg.learn_homography): per-sample
    # matrices from the DLT solve, like the reference BEV forward's M slot
    # (Birds_Eye_View_Loss/Networks/LSQ_layer.py:326)
    M: Optional[jax.Array] = None        # (B, 3, 3)
    M_inv: Optional[jax.Array] = None    # (B, 3, 3)


class LaneNetModule(nn.Module):
    """Backbone + heads (the parameterized part)."""
    cfg: LaneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool, use_main_head: bool = True):
        cfg = self.cfg
        net = ERFNet(in_channels=cfg.channels_in,
                     out_channels=cfg.nclasses if cfg.pretrained
                     else cfg.seg_out_channels,
                     pretrained=cfg.pretrained, dtype=self.dtype,
                     name="erfnet")
        enc, dec, seg2 = net(images, train, use_main_head=use_main_head)
        line = horizon = offsets = None
        if cfg.clas:
            variant = "bev" if cfg.profile == "bev" else "bp"
            line = Classification("line", resize=cfg.resize, variant=variant,
                                  dtype=self.dtype,
                                  name="line_classification")(enc, train)
            horizon = Classification("horizon", resize=cfg.resize,
                                     variant=variant, dtype=self.dtype,
                                     name="horizon_estimation")(enc, train)
        if cfg.learn_homography:
            from lanedetection_end2end_tpu.models.dlt import HomographyHead
            offsets = HomographyHead(dtype=self.dtype,
                                     name="homography_head")(enc, train)
        return enc, dec, seg2, line, horizon, offsets


class LaneNet:
    """Host-side pipeline: flax module + constant WLS basis + row mask."""

    def __init__(self, cfg: LaneConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        H, W = cfg.image_height, cfg.image_width
        if cfg.profile == "bev":
            M, M_inv = bev_matrices_normalized()
            normalized = True
        else:
            M, M_inv = bev_matrices_pixel(cfg.resize, cfg.no_mapping)
            normalized = False
        self.M, self.M_inv = M, M_inv
        self.fitter = WLSFitter(M, H, W, cfg.order, normalized=normalized,
                                reg_ls=cfg.reg_ls,
                                use_cholesky=cfg.use_cholesky,
                                use_pallas=cfg.use_pallas_wls)
        zero_rows = ceil(cfg.resize * cfg.mask_percentage)
        mask = np.ones((H, W), dtype=np.float32)
        mask[:zero_rows] = 0.0
        self._mask = jnp.asarray(mask)[None, :, :, None]  # (1, H, W, 1)
        self.module = LaneNetModule(cfg, dtype=dtype)
        self._act = activation_fn(cfg.activation_layer)

    # -- parameter init -------------------------------------------------
    def init(self, rng, sample_images=None):
        cfg = self.cfg
        if sample_images is None:
            sample_images = jnp.zeros(
                (1, cfg.image_height, cfg.image_width, cfg.channels_in),
                self.dtype)
        return self.module.init({"params": rng, "dropout": rng},
                                sample_images, train=False)

    # -- forward --------------------------------------------------------
    def apply(self, variables, images, *, phase: str = "e2e",
              train: bool = False, rng=None,
              gt_line: Optional[jax.Array] = None,
              absent_lane_guard: bool = False,
              mutable=False) -> LaneNetOutput:
        """One forward pass. `phase`/`train` are static (per-graph).

        phase:
          'e2e' : activation(weight maps) -> WLS (LSQ_layer.py:309-325)
          'seg' : detached argmax maps -> WLS metric-only (:302-308)
          'skip': backbone only, no LSQ (BP early_return, LSQ_layer.py:274-275)
        """
        cfg = self.cfg
        rngs = {"dropout": rng} if (train and rng is not None) else None
        # In the staged schedule the main head (nclasses ch) serves e2e and
        # the aux head (nclasses+1 ch) serves seg pretraining; mirrors
        # flag=end_to_end*pretrained (LSQ_layer.py:295).
        use_main = (phase == "e2e") or not cfg.pretrained
        out = self.module.apply(variables, images, train=train,
                                use_main_head=use_main, rngs=rngs,
                                mutable=mutable)
        if mutable:
            (enc, dec, seg2, line, horizon, offsets), new_vars = out
        else:
            enc, dec, seg2, line, horizon, offsets = out
            new_vars = None

        dec = dec.astype(jnp.float32)
        if phase == "skip":
            res = LaneNetOutput(None, None, dec, None, None, enc)
            return (res, new_vars) if mutable else res

        if phase == "e2e":
            activated = self._act(dec)  # (B, H, W, C)
        else:
            am = jnp.argmax(jax.lax.stop_gradient(dec), axis=-1)  # (B, H, W)
            lanes = [(k * (am == k)).astype(jnp.float32)
                     for k in range(1, cfg.nclasses + 1)]
            activated = jnp.stack(lanes, axis=-1)  # (B, H, W, C)
            line = horizon = None  # clas heads only feed losses in e2e mode
            if absent_lane_guard and gt_line is not None:
                # Sane variant of LSQ_layer.py:309-311: absent lanes borrow
                # lane 0's map so their (masked-out) fit stays well-posed.
                present = gt_line[:, None, None, :] > 0  # (B,1,1,C)
                activated = jnp.where(present, activated,
                                      activated[..., :1])

        masked = activated * self._mask.astype(activated.dtype)
        M_b = M_inv_b = None
        if offsets is not None and phase == "e2e":
            from lanedetection_end2end_tpu.geometry.dlt import dlt_homography
            M_b, M_inv_b = dlt_homography(offsets, cfg.resize)
            beta = self.fitter.fit_with_M(masked, M_b, layout="nhwc")
        else:
            # Fit straight from the channels-last maps (the NHWC->NCHW
            # transpose is a pathological C-minor relayout on TPU; see
            # WLSFitter.__call__).
            beta = self.fitter(masked, layout="nhwc")
        # NCHW weight maps only for visualization/parity consumers; XLA
        # dead-code-eliminates this transpose from graphs that don't use it.
        wmaps = jnp.transpose(masked, (0, 3, 1, 2))  # (B, C, H, W)
        res = LaneNetOutput(beta, wmaps, dec, line, horizon, enc,
                            M_b, M_inv_b)
        return (res, new_vars) if mutable else res

    # -- packed fast path ------------------------------------------------
    def packed_supported(self, phase: str) -> bool:
        """Whether the lane-packed training graph (ops/packed_graph.py) can
        serve this config/phase: e2e only, separable homography, and every
        stage's packed plane 128-lane aligned."""
        from lanedetection_end2end_tpu.ops.packed_graph import packed_shapes_ok
        cfg = self.cfg
        out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
        return (phase == "e2e" and self.fitter.separable
                and not cfg.learn_homography
                and packed_shapes_ok(cfg.resize, out_ch))

    def apply_packed(self, variables, images, *, phase: str = "e2e",
                     train: bool = False, rng=None,
                     gt_line: Optional[jax.Array] = None,
                     absent_lane_guard: bool = False,
                     mutable=False, axis_name=None) -> LaneNetOutput:
        """Lane-packed twin of `apply` for the e2e phase — identical math
        (tests/test_packed_graph.py), but the backbone runs in the dense
        (B, H, W*C) layout and the WLS fit consumes packed row sums, so the
        (B, H, W, C) weight maps are never materialized in lane-padded NHWC.
        This is the training throughput path (the backward pass inherits the
        same MXU-shaped matmuls).

        `axis_name`: mesh axis for sync-BN when running inside shard_map
        (train/steps.py wraps this path per shard because pallas_calls are
        not GSPMD-partitionable); train-mode BN moments are pmean'd over it."""
        from lanedetection_end2end_tpu.ops.packed_graph import (
            _fused_maps_on, erfnet_packed, head_plan_maps, rowsums_packed)
        cfg = self.cfg
        assert self.packed_supported(phase), "packed path: unsupported config"
        out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
        head_rng = enc_rng = None
        if train and rng is not None:
            enc_rng, head_rng = jax.random.split(rng)
        # Pallas conv kernels carry the shift+matmul structure that XLA would
        # otherwise materialize through HBM; pure-jnp fallback off-TPU.
        pallas_convs = (jax.default_backend() == "tpu"
                        if os.environ.get("PACKED_PALLAS") is None
                        else os.environ["PACKED_PALLAS"] == "1")
        # e2e training never reads the logits (the loss consumes only the
        # WLS row sums, train/steps.py:196-229): fuse head + activation +
        # mask + row sums so the full-res plane never reaches HBM.
        fuse_tail = (pallas_convs and _fused_maps_on() and train
                     and phase == "e2e" and cfg.activation_layer == "square")
        enc, dec, new_erf_stats = erfnet_packed(
            variables["params"]["erfnet"],
            variables["batch_stats"]["erfnet"], images,
            out_channels=out_ch, train=train, rng=enc_rng,
            use_main_head=True, dtype=self.dtype,
            pallas_convs=pallas_convs,
            axis_name=axis_name, skip_head=fuse_tail)
        if fuse_tail:
            from math import ceil as _ceil
            from lanedetection_end2end_tpu.ops.packed_graph import (
                _chan_select)
            from lanedetection_end2end_tpu.ops.pallas_lanemaps import (
                head_rowsums_op)
            head_params = variables["params"]["erfnet"]["decoder"][
                "output_conv"]
            plan, maps, btile, in_lanes, out_lanes = head_plan_maps(
                head_params, 16, out_ch)
            assert out_lanes == 128, out_lanes
            L2 = (dec.shape[-1] // in_lanes) * 128
            xs = jnp.asarray(np.repeat(np.asarray(self.fitter._sep_xs),
                                       out_ch)[None, :], jnp.float32)
            sel = jnp.zeros((128, 128), jnp.float32).at[:, :out_ch].set(
                jnp.asarray(_chan_select(out_ch)))
            red = jnp.asarray(
                np.tile(np.eye(128, dtype=np.float32), (L2 // 128, 1)))
            s = head_rowsums_op(dec, maps, btile, xs, sel, red, plan,
                                in_lanes,
                                _ceil(cfg.resize * cfg.mask_percentage))
            S0 = s[:, :, :out_ch].transpose(0, 2, 1)
            S1 = s[:, :, 128:128 + out_ch].transpose(0, 2, 1)
            dec = None
        else:
            S0, S1 = rowsums_packed(dec, self._act, self.fitter._sep_xs,
                                    C=out_ch, resize=cfg.resize,
                                    mask_percentage=cfg.mask_percentage)
        beta = self.fitter.beta_from_rowsums(S0, S1)

        line = horizon = None
        new_stats = dict(variables["batch_stats"])
        new_stats["erfnet"] = new_erf_stats
        if cfg.clas:
            variant = "bev" if cfg.profile == "bev" else "bp"
            for key, kind in (("line_classification", "line"),
                              ("horizon_estimation", "horizon")):
                mod = Classification(kind, resize=cfg.resize, variant=variant,
                                     dtype=self.dtype, axis_name=axis_name)
                sub = {"params": variables["params"][key],
                       "batch_stats": variables["batch_stats"][key]}
                if train:
                    out, upd = mod.apply(sub, enc, train=True,
                                         mutable=["batch_stats"])
                    new_stats[key] = upd["batch_stats"]
                else:
                    out = mod.apply(sub, enc, train=False)
                if kind == "line":
                    line = out
                else:
                    horizon = out
        if dec is None:  # fused head+rowsums tail: logits never materialized
            # Guard the invariant train/steps.py relies on: a seg/skip-phase
            # caller would consume seg_logits (CE loss), so the tail fusion
            # that drops them must only ever run in the e2e phase.
            assert phase == "e2e" and train, (phase, train)
            seg_logits = None
        else:
            B, H = dec.shape[0], dec.shape[1]
            seg_logits = dec.reshape(B, H, -1, out_ch)  # NHWC view (DCE'd if unused)
        res = LaneNetOutput(beta, None, seg_logits, line, horizon, enc)
        if mutable:
            return res, {"batch_stats": new_stats}
        return res

"""Test-set inference driver: the throughput path of the framework.

Parity with `test_model` (Backprojection_Loss/test.py:23-129), TPU-native:
the whole per-batch pipeline — forward pass, sigmoid gating of the line and
horizon branches, polynomial backprojection, bounds clipping — is ONE jitted
function; the host only rounds to ints and streams JSON. Timing wraps
`block_until_ready` (the `torch.cuda.synchronize` equivalent, test.py:51-58).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.data.labels import read_json_lines
from lanedetection_end2end_tpu.eval.lane_eval import LaneEval
from lanedetection_end2end_tpu.eval.projections import Projections
from lanedetection_end2end_tpu.utils import AverageMeter, mkdir_if_missing


def make_infer_fn(lanenet, cfg: LaneConfig, projections: Projections,
                  engine=None, packed=None):
    """Builds the jitted images -> (B, 4, 56) gated-lane-coordinates fn.

    With `engine`/`packed` (models/infer_engine.py), the forward runs the
    fused Pallas serving path; otherwise the flax graph."""

    @jax.jit
    def infer(variables, images):
        if images.dtype == jnp.uint8:  # compact-transfer batches
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        M_b = M_inv_b = None
        if engine is not None:
            beta, line_logits, horizon_logits = engine(packed, variables,
                                                       images)
        else:
            out = lanenet.apply(variables, images, phase="e2e", train=False)
            beta = out.beta
            line_logits, horizon_logits = out.line_logits, out.horizon_logits
            M_b, M_inv_b = out.M, out.M_inv
        if M_b is not None:  # learned-homography option (geometry/dlt.py)
            lanes_pred = projections.compute_coordinates_with_M(
                beta, M_b, M_inv_b)
        else:
            lanes_pred = projections.compute_coordinates(beta)  # (B, C, 56)

        if cfg.clas:
            # Horizon row estimate: round((2.5*sum(sigmoid)+80)/10)*10
            # (test.py:62-63).
            horizon_pred = jnp.sum(jax.nn.sigmoid(horizon_logits), axis=1)
            horizon_pred = jnp.round(
                (projections.factor * horizon_pred + 80.0) / 10.0) * 10.0
            # Line branch slots [ll, l, r, rr] -> lane order [l, r, ll, rr]
            # (test.py:76).
            line_pred = jnp.round(jax.nn.sigmoid(line_logits))
            line_pred = line_pred[:, jnp.array([1, 2, 0, 3])]
            lanes_pred = jnp.where(line_pred[:, :, None] > 0, lanes_pred, -2.0)
            # Suppress rows above the estimated horizon (test.py:80-82).
            bound = (horizon_pred - 160.0) / 10.0  # (B,)
            cols = jnp.arange(lanes_pred.shape[-1], dtype=jnp.float32)
            lanes_pred = jnp.where(cols[None, None, :] < bound[:, None, None],
                                   -2.0, lanes_pred)
        # Out-of-image x -> -2 (test.py:85-86).
        lanes_pred = jnp.where(
            (lanes_pred > 1279.0) | (lanes_pred < 0.0), -2.0, lanes_pred)
        return lanes_pred

    return infer


_COLORMAP = [(255, 0, 0), (0, 255, 0), (255, 255, 0), (0, 0, 255),
             (0, 128, 128)]  # test.py:31


def _draw_test_image(json_line: dict, test_dir: str, save_path: str,
                     im_id: int) -> None:
    """--draw_testset visualization: predicted points drawn on the original
    test image (Backprojection_Loss/test.py:101-121), without cv2."""
    from PIL import Image, ImageDraw
    out_dir = os.path.join(save_path, "example", "testset")
    mkdir_if_missing(out_dir)
    img_path = os.path.join(test_dir, json_line["raw_file"])
    if not os.path.exists(img_path):
        return
    with open(img_path, "rb") as f:
        img = Image.open(f).convert("RGB")
    draw = ImageDraw.Draw(img)
    for lane_i, lane in enumerate(json_line["lanes"]):
        color = _COLORMAP[lane_i % len(_COLORMAP)]
        for x, y in zip(lane, json_line["h_samples"]):
            if x != -2:
                draw.ellipse((x - 3, y - 3, x + 3, y + 3), fill=color)
    img.save(os.path.join(out_dir, f"{im_id}.jpg"))


def test_model(loader, lanenet, variables, cfg: LaneConfig,
               gt_file: Optional[str] = None,
               save_path: Optional[str] = None,
               verbose: bool = True, use_engine: bool = False) -> float:
    """Run test-set inference, write `test_set_predictions.json`, score.

    Args:
      loader: sequential Loader over a LaneTestSet (pad_final batches;
        predictions sliced to `loader.num_real`).
      gt_file: TuSimple gt label file (defaults to test_dir/test_label.json).
      save_path: output directory (defaults to cfg.save_path).
    Returns:
      TuSimple accuracy (the reference returns acc_seg[0], test.py:129).
    """
    assert cfg.end_to_end, "test inference requires the end-to-end graph"
    gt_file = gt_file or os.path.join(cfg.test_dir, "test_label.json")
    save_path = save_path or cfg.save_path
    mkdir_if_missing(save_path)
    test_set_file = os.path.join(save_path, "test_set_predictions.json")

    projections = Projections(cfg.resize, cfg.order, cfg.no_mapping)
    engine = packed = None
    if use_engine:
        from lanedetection_end2end_tpu.models.infer_engine import \
            FusedLaneNetEngine
        engine = FusedLaneNetEngine(cfg)
        packed = jax.device_put(engine.prepare(variables))
    infer = make_infer_fn(lanenet, cfg, projections, engine, packed)
    gt_lanes = read_json_lines(gt_file)

    batch_time = AverageMeter()
    preds = []
    for batch in loader:
        images = jnp.asarray(batch["image"])
        t0 = time.perf_counter()
        lanes_pred = infer(variables, images)
        lanes_pred.block_until_ready()
        batch_time.update(time.perf_counter() - t0)
        preds.append(np.asarray(lanes_pred))

    lanes_all = np.concatenate(preds, axis=0)[: loader.num_real]
    with open(test_set_file, "w") as jsonFile:
        for im_id in range(lanes_all.shape[0]):
            json_line = dict(gt_lanes[im_id])
            json_line["lanes"] = np.int_(np.round(lanes_all[im_id])).tolist()
            json_line["run_time"] = 20
            json.dump(json_line, jsonFile)
            jsonFile.write("\n")
            if cfg.draw_testset:
                _draw_test_image(json_line, cfg.test_dir, save_path, im_id)

    acc = LaneEval.bench_one_submit(test_set_file, gt_file)
    if verbose:
        print(acc)
        print("===> Average ACC on TESTSET is {:.8} in {:.6}s for a batch"
              .format(acc[0], batch_time.avg))
    return acc[0]

"""Eval subsystem tests: LaneEval scoring, projections, write_lsq_results
round-trip on synthetic data, and the test-set inference driver."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lanedetection_end2end_tpu.config import bp_defaults
from lanedetection_end2end_tpu.data import (
    make_synthetic_root, read_json_lines, write_json_lines, LaneTestSet,
    get_testloader)
from lanedetection_end2end_tpu.eval import (
    LaneEval, Projections, write_lsq_results)
from lanedetection_end2end_tpu.eval import test_model as run_test_model
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.ops import BackprojectionLoss


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = tmp_path_factory.mktemp("synth_eval")
    return make_synthetic_root(str(path), num_train=8, num_test=4, seed=3)


# ----------------------------------------------------------------------
def test_lane_eval_perfect_predictions(root, tmp_path):
    gt = read_json_lines(root["labels_all_file"])
    pred_file = str(tmp_path / "pred.json")
    preds = [dict(g, run_time=20) for g in gt]
    write_json_lines(pred_file, preds)
    acc, fp, fn = LaneEval.bench_one_submit(pred_file, root["labels_all_file"])
    assert acc == pytest.approx(1.0)
    assert fp == 0.0 and fn == 0.0


def test_lane_eval_shifted_predictions(root, tmp_path):
    gt = read_json_lines(root["labels_all_file"])
    pred_file = str(tmp_path / "pred.json")
    preds = []
    for g in gt:
        lanes = [[x + 100 if x != -2 else -2 for x in lane]
                 for lane in g["lanes"]]
        preds.append(dict(g, lanes=lanes, run_time=20))
    write_json_lines(pred_file, preds)
    acc, fp, fn = LaneEval.bench_one_submit(pred_file, root["labels_all_file"])
    # steep lanes get a 20/cos(angle) threshold that can exceed 100 px,
    # so a +100 shift is only partially penalized
    assert acc < 0.8
    assert fn > 0.1


def test_lane_eval_angle_matches_polyfit():
    ys = np.arange(160.0, 720.0, 10.0)
    xs = 0.7 * ys + 30.0
    angle = LaneEval.get_angle(xs, ys)
    assert angle == pytest.approx(np.arctan(0.7), rel=1e-9)
    # <2 valid points -> 0 (eval_lane.py:22-23)
    assert LaneEval.get_angle(np.full(56, -2.0), ys) == 0.0


def test_lane_eval_slow_runtime_rejected():
    acc, fp, fn = LaneEval.bench([[1] * 56], [[1] * 56],
                                 list(range(160, 720, 10)), running_time=500)
    assert (acc, fp, fn) == (0.0, 0.0, 1.0)


# ----------------------------------------------------------------------
def test_projections_match_backprojection_loss():
    """Projections x (original px) == BackprojectionLoss x_cal * 2.5."""
    proj = Projections(resize=256, order=3)
    bploss = BackprojectionLoss(resize=256, order=3)
    beta = jnp.asarray(np.random.default_rng(0).normal(
        0, 1e-4, (2, 4, 4)).astype(np.float32))
    beta = beta.at[:, :, -1].set(jnp.asarray([[100., 200., 300., 400.],
                                              [150., 250., 350., 450.]]))
    x_proj = np.asarray(proj.compute_coordinates(beta))  # (2, 4, 56)
    x_gt = jnp.zeros((2, 56))
    valid = jnp.ones((2, 56))
    _, x_cal = bploss(beta[:, 0, :], x_gt, valid)
    np.testing.assert_allclose(x_proj[:, 0, :], np.asarray(x_cal) * 2.5,
                               rtol=1e-4)


# ----------------------------------------------------------------------
def test_write_lsq_results_roundtrip(root, tmp_path):
    """Ground-truth BEV params pushed through write_lsq_results must score
    ~perfect TuSimple accuracy — the whole eval path is consistent."""
    gt_all = read_json_lines(root["labels_all_file"])
    curves = read_json_lines(root["curves_file"])
    ordered = read_json_lines(root["lanes_file"])
    src_file = str(tmp_path / "val.json")
    records = []
    for g, c, o in zip(gt_all, curves, ordered):
        rec = dict(g)
        rec["lanes"] = o["lanes"]  # full 4-row lane matrix, original px
        rec["params"] = c["poly_params"]  # [l, r, ll, rr] BEV coefficients
        rec["line_id"] = [1, 1, 1, 1]
        rec["horizon_est"] = [0] * 256
        records.append(rec)
    write_json_lines(src_file, records)

    dst_file = str(tmp_path / "pred.json")
    write_lsq_results(src_file, dst_file, nclasses=4,
                      all_branches_ready=False, horizon_on=False,
                      resize=256, no_ortho=False)
    # Score against a gt file with the same 4-row lane matrices
    gt_file = str(tmp_path / "gt.json")
    write_json_lines(gt_file, records)
    acc, fp, fn = LaneEval.bench_one_submit(dst_file, gt_file)
    assert acc > 0.96
    assert fn < 0.05


# ----------------------------------------------------------------------
def test_inference_driver(root, tmp_path):
    """End-to-end inference driver on an untrained net: well-formed
    predictions JSON for every test image + finite accuracy."""
    cfg = bp_defaults(resize=64, batch_size=2, val_batch_size=2, nclasses=4,
                      clas=True, order=2, end_to_end=True,
                      test_dir=root["test_dir"], save_path=str(tmp_path),
                      reg_ls=1.0)
    lanenet = LaneNet(cfg)
    variables = lanenet.init(__import__("jax").random.PRNGKey(0))
    ts = LaneTestSet(root["test_label_file"], root["test_dir"], resize=64)
    loader = get_testloader(ts, batch_size=2, nworkers=2)
    acc = run_test_model(loader, lanenet, variables, cfg, verbose=False)
    assert 0.0 <= acc <= 1.0
    preds = read_json_lines(str(tmp_path / "test_set_predictions.json"))
    assert len(preds) == len(ts)
    for p in preds:
        assert p["run_time"] == 20
        assert len(p["lanes"]) == 4
        assert all(len(lane) == 56 for lane in p["lanes"])
        assert all(-2 <= x <= 1279 for lane in p["lanes"] for x in lane)

"""CLI parsing round-trips and the BEV clas validation path (fitted-curve
JSON emission + write_lsq_results + LaneEval, main.py:446-488)."""

import numpy as np
import pytest

from lanedetection_end2end_tpu.config import (
    config_from_args, bev_defaults, bp_defaults, train_sh_config)
from lanedetection_end2end_tpu.data import (
    LaneDataset, Loader, make_synthetic_root, read_json_lines,
    load_valid_set_file_all)
from lanedetection_end2end_tpu.train import Trainer


def test_cli_parses_reference_train_sh():
    """The canonical Backprojection_Loss/train.sh:1 command line."""
    argv = ("--loss_policy backproject --save_freq 100 --weight_init xavier "
            "--use_cholesky 0 --split_percentage 0.1 --activation_layer square "
            "--pretrained false --pretrain_epochs 25 --skip_epochs 25 "
            "--nclasses 4 --mask_percentage 0.20 --order 3 --clas 1 "
            "--nepochs 400").split()
    cfg = config_from_args(argv, profile="bp")
    assert cfg.loss_policy == "backproject"
    assert cfg.nclasses == 4 and cfg.order == 3 and cfg.clas
    assert cfg.mask_percentage == pytest.approx(0.20)
    assert not cfg.pretrained and cfg.nepochs == 400
    assert cfg.weight_init == "xavier"
    assert cfg.split_percentage == pytest.approx(0.1)


def test_cli_bev_readme_usage():
    cfg = config_from_args(
        "--image_dir /x --gt_dir /y --end_to_end True".split(), profile="bev")
    assert cfg.profile == "bev" and cfg.end_to_end
    assert cfg.num_train == 2535 and cfg.nepochs == 350  # BEV defaults


def test_save_id_naming():
    assert "end2end_True" in bev_defaults().save_id
    assert "mask" in bp_defaults().save_id
    assert train_sh_config().save_id.startswith("Mod_erfnet_opt_adam")


def test_cross_flag_invariants():
    with pytest.raises(ValueError):
        bp_defaults(clas=True, nclasses=2)
    with pytest.raises(ValueError):
        bp_defaults(end_to_end=False, pretrained=True)
    with pytest.raises(ValueError):
        bev_defaults(order=3)


# ----------------------------------------------------------------------
def test_bev_clas_validation_emits_and_scores(tmp_path):
    """BEV profile, clas, 4 lanes: validation writes one record per sample
    (fixing the reference's per-batch truncation, main.py:458) and scores
    the fitted curves with LaneEval."""
    root = make_synthetic_root(str(tmp_path / "d"), num_train=10, num_test=0,
                               seed=7)
    cfg = bev_defaults(resize=32, batch_size=4, val_batch_size=4, nclasses=4,
                       clas=True, order=2, end_to_end=True, loss_policy="area",
                       reg_ls=1.0, save_path=str(tmp_path / "run"),
                       print_freq=9999, num_train=10)
    valid_idx = [0, 1, 2, 3]
    ds = LaneDataset("bev", root["image_dir"], root["gt_dir"],
                     valid_idx=valid_idx, resize=32, nclasses=2,
                     curves_file=root["curves_file"],
                     line_file=root["line_file"])
    valid_loader = Loader(ds, valid_idx, 4, shuffle=False)

    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    vs_path = str(tmp_path / "validation_set.json")
    load_valid_set_file_all(valid_idx, vs_path, root["image_dir"],
                            root["curves_file"])
    labels = read_json_lines(vs_path)
    metrics = trainer.validate(valid_loader, epoch=0,
                               valid_set_labels=labels)
    assert "acc_seg" in metrics  # LaneEval ran
    recs = read_json_lines(str(trainer.save_path + "/validation_set_dst.json"))
    assert len(recs) == 4  # ALL records, not just the last batch
    for r in recs:
        assert len(r["params"]) == 4 and len(r["params"][0]) == 3
        assert len(r["line_id"]) == 4
        assert len(r["horizon_est"]) == cfg.resize


def test_parse_args_strips_framework_flags():
    """main.py's --synthetic/--test_only additions round-trip without
    leaking into the reference-parity flag set."""
    import main as main_mod
    cfg, synthetic, test_only = main_mod.parse_args(
        "--profile bp --synthetic 8 --test_only --nclasses 4 --clas 1 "
        "--order 3".split())
    assert synthetic == 8 and test_only
    assert cfg.nclasses == 4 and cfg.clas and cfg.order == 3
    cfg, synthetic, test_only = main_mod.parse_args(
        "--profile bp --image_dir /x --gt_dir /y".split())
    assert synthetic == 0 and not test_only


def test_bp_val_laneeval_scores_validation(tmp_path):
    """--val_laneeval 1 (framework opt-in): the BP profile LaneEval-scores
    the VALIDATION split, producing an accuracy curve for runs without a
    TuSimple test set (the reference only scores the test set,
    Backprojection_Loss/main.py:389-396)."""
    root = make_synthetic_root(str(tmp_path / "d"), num_train=8, num_test=0,
                               seed=3)
    cfg = bp_defaults(resize=32, batch_size=4, val_batch_size=4, nclasses=4,
                      clas=True, order=3, end_to_end=True,
                      loss_policy="backproject", reg_ls=1.0,
                      save_path=str(tmp_path / "run"), print_freq=9999,
                      num_train=8, val_laneeval=True)
    valid_idx = [0, 1, 2, 3]
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"],
                     valid_idx=valid_idx, resize=32, nclasses=4,
                     lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    valid_loader = Loader(ds, valid_idx, 4, shuffle=False)
    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    vs_path = str(tmp_path / "validation_set.json")
    load_valid_set_file_all(valid_idx, vs_path, root["image_dir"],
                            root["labels_all_file"])
    labels = read_json_lines(vs_path)
    metrics = trainer.validate(valid_loader, epoch=0, valid_set_labels=labels)
    assert "acc" in metrics and 0.0 <= metrics["acc"] <= 1.0
    # prediction/gt JSON written under the run dir
    import os
    assert os.path.exists(os.path.join(trainer.save_path,
                                       "validation_predictions.json"))

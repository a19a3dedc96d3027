#!/usr/bin/env python
"""Training / evaluation CLI of the TPU-native lane-detection framework.

Usage parity with the reference (README.md:45-49 and
Backprojection_Loss/train.sh):

  python main.py --profile bev --image_dir <imgs> --gt_dir <gt> --end_to_end True
  python main.py --profile bp  --loss_policy backproject --nclasses 4 \
      --order 3 --clas 1 --mask_percentage 0.20 --image_dir ... --gt_dir ...

Framework additions:
  --synthetic N   generate an N-image synthetic TuSimple-format dataset under
                  save_path (the reference's label blobs are not distributed)
                  and train on it; no --image_dir/--gt_dir needed.
  --test_only     load the best checkpoint and run ONLY test-set inference +
                  TuSimple LaneEval scoring — the standalone `test.py`
                  entry point of the reference (Backprojection_Loss/test.py:23,
                  invoked there as a separate script); requires --test_dir.

Label files resolve relative to the directory of --json_file exactly like the
reference's hard-coded 'Labels/*.json' paths (Backprojection_Loss/main.py:81,
Load_Data_new.py:81).
"""

from __future__ import annotations

import os
import sys

import jax

# Persistent compilation cache (TPU compiles cost minutes over the
# remote-compile tunnel; harmless elsewhere).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lanedet_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# LANEDET_PLATFORM=cpu forces the CPU backend BEFORE first backend use.
# Env vars (JAX_PLATFORMS/JAX_PLATFORM_NAME) are unreliable here: plugin
# sites that preload jax read them at interpreter startup, and enumerating
# backends can block indefinitely on an unreachable remote device — only
# jax.config.update avoids initializing the remote plugin at all.
if os.environ.get("LANEDET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LANEDET_PLATFORM"])

from lanedetection_end2end_tpu.config import build_parser, config_from_args
from lanedetection_end2end_tpu.data import (
    LaneDataset, LaneTestSet, get_loader, get_testloader,
    load_valid_set_file_all, make_synthetic_root, read_json_lines)
from lanedetection_end2end_tpu.eval import test_model
from lanedetection_end2end_tpu.train import Trainer
from lanedetection_end2end_tpu.train.checkpoint import (
    best_checkpoint_path, load_checkpoint)
from lanedetection_end2end_tpu.utils import mkdir_if_missing


def parse_args(argv=None):
    profile = "bp"
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--profile" in argv:
        profile = argv[argv.index("--profile") + 1]
    parser = build_parser(profile)
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate an N-image synthetic dataset and train on it")
    parser.add_argument("--test_only", action="store_true",
                        help="best checkpoint -> test-set inference + LaneEval "
                             "only (the reference's standalone test.py)")
    ns, _ = parser.parse_known_args(argv)
    synthetic, test_only = ns.synthetic, ns.test_only
    argv = [a for i, a in enumerate(argv)
            if a not in ("--synthetic", "--test_only")
            and (i == 0 or argv[i - 1] != "--synthetic")]
    cfg = config_from_args(argv, profile)
    return cfg, synthetic, test_only


def main(argv=None):
    cfg, synthetic, test_only = parse_args(argv)

    if synthetic:
        synth_root = os.path.join(cfg.save_path, "synthetic_data")
        if not os.path.isdir(os.path.join(synth_root, "images")):
            print(f"Generating {synthetic}-image synthetic dataset under "
                  f"{synth_root} ...")
            paths = make_synthetic_root(synth_root, num_train=synthetic,
                                        num_test=max(2, synthetic // 8),
                                        seed=cfg.seed)
        else:
            paths = {
                "image_dir": os.path.join(synth_root, "images"),
                "gt_dir": os.path.join(synth_root, "ground_truth"),
                "curves_file": os.path.join(synth_root, "Labels",
                                            "Curve_parameters.json"),
                "lanes_file": os.path.join(synth_root, "Labels",
                                           "lanes_ordered.json"),
                "line_file": os.path.join(synth_root, "Labels",
                                          "label_new.json"),
                "labels_all_file": os.path.join(synth_root, "Labels",
                                                "label_data_all.json"),
                "test_dir": os.path.join(synth_root, "test_set"),
            }
        cfg = cfg.replace(image_dir=paths["image_dir"], gt_dir=paths["gt_dir"],
                          json_file=paths["curves_file"],
                          test_dir=paths["test_dir"],
                          num_train=min(cfg.num_train, synthetic))
        labels_dir = os.path.dirname(paths["curves_file"])
    else:
        labels_dir = os.path.dirname(cfg.json_file) or "Labels"
    if not cfg.image_dir or not cfg.gt_dir:
        raise SystemExit("--image_dir and --gt_dir are required "
                         "(or use --synthetic N)")

    lanes_file = os.path.join(labels_dir, "lanes_ordered.json")
    line_file = os.path.join(labels_dir, "label_new.json")
    # validation gt source: BEV uses Curve_parameters.json records
    # (Load_Data_new.py:449), BP uses label_data_all.json (:325)
    labels_all = (cfg.json_file if cfg.profile == "bev"
                  else os.path.join(labels_dir, "label_data_all.json"))
    line_file = line_file if os.path.exists(line_file) else None

    def dataset_factory(valid_idx):
        return LaneDataset(
            cfg.profile, cfg.image_dir, cfg.gt_dir, valid_idx=valid_idx,
            resize=cfg.resize, nclasses=cfg.nclasses, flip_on=cfg.flip_on,
            curves_file=cfg.json_file if cfg.profile == "bev" else None,
            lanes_file=lanes_file if cfg.profile == "bp" else None,
            line_file=line_file, image_dtype="uint8")

    train_loader, valid_loader, valid_idx = get_loader(
        dataset_factory, cfg.num_train, cfg.batch_size,
        cfg.effective_val_batch_size, shuffle=True, nworkers=cfg.nworkers,
        flip_on=cfg.flip_on, split_percentage=cfg.split_percentage,
        seed=cfg.seed)

    test_loader = None
    if cfg.clas and cfg.test_dir:
        test_label = os.path.join(cfg.test_dir, "test_label.json")
        if os.path.exists(test_label):
            test_loader = get_testloader(
                LaneTestSet(test_label, cfg.test_dir, cfg.resize),
                cfg.effective_val_batch_size, cfg.nworkers)

    trainer = Trainer(cfg, log_to_file=not cfg.test_mode)
    print("=" * 40 + f"\nArgs:{cfg}\n" + "=" * 40)
    print(f"devices: {jax.devices()}")

    # Validation-set gt records for fitted-curve JSON emission
    # (main.py:104-113)
    valid_set_labels = None
    if cfg.clas and os.path.exists(labels_all):
        validation_set_path = os.path.join(trainer.save_path,
                                           "validation_set.json")
        load_valid_set_file_all(valid_idx, validation_set_path,
                                cfg.image_dir, labels_all)
        valid_set_labels = read_json_lines(validation_set_path)

    if test_only:
        # Standalone test-set entry (Backprojection_Loss/test.py:23): best
        # checkpoint -> jitted inference -> test_set_predictions.json ->
        # LaneEval. No validation pass, no training.
        if test_loader is None:
            raise SystemExit("--test_only needs --clas 1 and a --test_dir "
                             "containing test_label.json")
        best = best_checkpoint_path(trainer.save_path)
        if best is None:
            raise SystemExit(f"no best checkpoint under {trainer.save_path}")
        print(f"=> loading checkpoint '{best}'")
        state, _ = load_checkpoint(best, jax.device_get(trainer.state))
        acc = test_model(test_loader, trainer.lanenet, state.variables, cfg,
                         save_path=trainer.save_path)
        print(f"===> TuSimple test accuracy: {acc:.8f}")
        return {"acc": acc}

    if cfg.evaluate:
        best = best_checkpoint_path(trainer.save_path)
        if best is None:
            raise SystemExit(f"no best checkpoint under {trainer.save_path}")
        print(f"=> loading checkpoint '{best}'")
        state, _ = load_checkpoint(best, jax.device_get(trainer.state))
        trainer.state = state
        metrics = trainer.validate(valid_loader, epoch=cfg.nepochs,
                                   valid_set_labels=valid_set_labels)
        print({k: float(v) for k, v in metrics.items()})
        if test_loader is not None:
            acc = test_model(test_loader, trainer.lanenet,
                             trainer.state.variables, cfg,
                             save_path=trainer.save_path)
            print(f"===> TuSimple test accuracy: {acc:.8f}")
        return metrics

    trainer.maybe_resume()
    return trainer.fit(train_loader, valid_loader, test_loader,
                       valid_set_labels)


if __name__ == "__main__":
    main()

"""End-to-end learning check: the staged pretraining schedule actually
learns on the synthetic dataset (skip -> seg -> e2e), i.e. gradients flow
through the CE head and through the differentiable LSQ + backprojection."""

import tempfile

import numpy as np
import pytest

from lanedetection_end2end_tpu.config import bp_defaults
from lanedetection_end2end_tpu.data import LaneDataset, Loader, \
    make_synthetic_root
from lanedetection_end2end_tpu.train import Trainer


@pytest.mark.filterwarnings("ignore")
def test_staged_training_learns(tmp_path):
    root = make_synthetic_root(str(tmp_path / "data"), num_train=16,
                               num_test=0, seed=5)
    cfg = bp_defaults(resize=48, batch_size=8, nclasses=4, order=2,
                      end_to_end=True, pretrained=True, pretrain_epochs=8,
                      skip_epochs=5, loss_policy="backproject", reg_ls=1.0,
                      learning_rate=5e-4, weight_seg=10.0,
                      save_path=str(tmp_path / "run"), print_freq=9999,
                      num_train=16)
    ds = LaneDataset("bp", root["image_dir"], root["gt_dir"], valid_idx=[],
                     resize=48, nclasses=4, lanes_file=root["lanes_file"],
                     line_file=root["line_file"])
    train_loader = Loader(ds, range(16), 8, shuffle=True, seed=0)

    trainer = Trainer(cfg, log_to_file=False, verbose=False)
    seg_losses, e2e_losses = [], []
    for epoch in range(13):
        m = trainer.train_epoch(train_loader, epoch)
        phase = cfg.phase_for_epoch(epoch)
        assert np.isfinite(m["loss"]), (epoch, phase)
        (e2e_losses if phase == "e2e" else seg_losses).append(m["loss"])

    # segmentation CE must drop substantially AND steadily over the warm-up
    # (the exact endpoint wobbles a few percent with the dropout RNG stream,
    # so require a robust decrease rather than a knife-edge ratio)
    assert seg_losses[-1] < 0.9 * seg_losses[0], seg_losses
    drops = sum(b < a for a, b in zip(seg_losses, seg_losses[1:]))
    assert drops >= 0.75 * (len(seg_losses) - 1), seg_losses
    # the end-to-end fitting loss must drop after switching phases
    assert e2e_losses[-1] < 0.6 * e2e_losses[0], e2e_losses

"""Weight-map / fitted-curve visualization.

The observability analog of `save_weightmap`
(Birds_Eye_View_Loss/Networks/utils.py:95-155 — 7-panel BEV version;
Backprojection_Loss/Networks/utils.py:127-187 — 5-panel coordinate-scatter
version): input image, per-lane weight maps, and fitted-vs-gt curves, dumped
under save_path/example/{train,valid,pretrain,testset}.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from lanedetection_end2end_tpu.utils.observability import mkdir_if_missing


def save_weightmap(mode: str, weightmaps, beta, gt_params_or_lanes, image,
                   save_path: str, batch_idx: int = 0,
                   x_cal: Optional[np.ndarray] = None,
                   resize: int = 256) -> str:
    """Dump a multi-panel figure for training-sample 0 of a batch.

    Args:
      mode: 'train' | 'valid' | 'pretrain' | 'testset' (subdirectory).
      weightmaps: (B, C, H, W) activated weight maps.
      beta: (B, C, order+1) fitted coefficients.
      gt_params_or_lanes: gt curve params (B, C, 3) or gt lane x (B, C, 56).
      image: (B, H, W, 3) input batch.
      x_cal: optional backprojected x coordinates (B, C, 56), BP profile.
    """
    out_dir = os.path.join(save_path, "example", mode)
    mkdir_if_missing(out_dir)
    w = np.asarray(weightmaps[0])
    img = np.clip(np.asarray(image[0]), 0, 1)
    C = w.shape[0]

    fig, axes = plt.subplots(2 + (C + 1) // 2, 1, figsize=(6, 9))
    axes[0].imshow(img)
    axes[0].set_title("input")
    combined = np.zeros_like(w[0])
    for k in range(C):
        mx = w[k].max()
        combined = combined + (w[k] / mx if mx > 0 else w[k])
    axes[1].imshow(combined, cmap="viridis")
    axes[1].set_title("weight maps (normalized sum)")

    ax = axes[2]
    b = np.asarray(beta[0])
    g = np.asarray(gt_params_or_lanes[0])
    ys = np.linspace(0, 1, 100)
    for k in range(C):
        coeff = b[k]
        x_fit = sum(c * ys ** p for c, p in
                    zip(coeff, range(len(coeff) - 1, -1, -1)))
        ax.plot(x_fit, 1 - ys, label=f"fit {k}")
    if x_cal is not None:
        xc = np.asarray(x_cal[0])
        hs = np.arange(xc.shape[-1])
        for k in range(C):
            ax.scatter(xc[k] / (2 * resize), 1 - hs / xc.shape[-1], s=4)
    elif g.ndim == 2 and g.shape[-1] <= 4:
        for k in range(min(C, g.shape[0])):
            x_gt = sum(c * ys ** p for c, p in
                       zip(g[k], range(len(g[k]) - 1, -1, -1)))
            ax.plot(x_gt, 1 - ys, "--", label=f"gt {k}")
    ax.legend(fontsize=6)
    ax.set_title("fitted curves (BEV)")
    for a in axes[3:]:
        a.axis("off")
    path = os.path.join(out_dir, f"idx-0_batch-{batch_idx}.png")
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path


def save_pretrain_panel(image, gt, seg_logits, save_path: str,
                        batch_idx: int) -> str:
    """3-panel (input / gt / argmax) dump of the skip phase
    (Backprojection_Loss/main.py:265-281)."""
    out_dir = os.path.join(save_path, "example", "pretrain")
    mkdir_if_missing(out_dir)
    img = np.clip(np.asarray(image[0]), 0, 1)
    seg = np.argmax(np.asarray(seg_logits[0]), axis=-1)
    fig, (ax1, ax2, ax3) = plt.subplots(3, 1, figsize=(6, 7))
    ax1.imshow(img)
    ax2.imshow(np.asarray(gt[0]))
    ax3.imshow(seg)
    path = os.path.join(out_dir, f"idx-0_batch-{batch_idx}.png")
    fig.savefig(path, dpi=80)
    plt.close(fig)
    return path

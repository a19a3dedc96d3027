"""Line-type and horizon classification heads on the shared encoder features.

Parity with `Classification`
(Birds_Eye_View_Loss/Networks/LSQ_layer.py:170-228 — line head emits 4x 3-way
type logits; Backprojection_Loss/Networks/LSQ_layer.py:157-207 — line head is
a single 4-way presence logit vector). Four conv+BN stages (128,128,64,64),
maxpool 2x2 for the line head / full-width avgpool for the horizon head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BN_EPS = 1e-5  # torch BatchNorm2d default (heads use the default eps)
_BN_MOMENTUM = 0.9


class Classification(nn.Module):
    class_type: str  # 'line' | 'horizon'
    resize: int = 256
    # 'bev': 4 separate 3-way type heads -> (B, 3, 4) logits
    # 'bp':  single 4-way presence head  -> (B, 4) logits
    variant: str = "bp"
    dtype: Any = jnp.float32
    # mesh axis to reduce train-mode BN statistics over (sync-BN) when the
    # caller runs inside shard_map; None under jit (GSPMD syncs implicitly)
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i, ch in enumerate((128, 128, 64, 64)):
            k = (1, 1) if i == 0 else (3, 3)
            pad = ((0, 0), (0, 0)) if i == 0 else ((1, 1), (1, 1))
            x = nn.Conv(ch, k, padding=pad, use_bias=True, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                             momentum=_BN_MOMENTUM, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"conv{i + 1}_bn")(x)
            x = nn.relu(x)

        if self.class_type == "line":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc1")(x))
            if self.variant == "bev":
                cols = [nn.Dense(3, dtype=self.dtype, name=f"fc_line{k + 1}")(x)
                        for k in range(4)]
                return jnp.stack(cols, axis=2)  # (B, 3, 4)
            return nn.Dense(4, dtype=self.dtype, name="fc_line1")(x)  # (B, 4)

        # horizon: average over the full width, flatten rows*64, FC -> resize
        x = jnp.mean(x, axis=2)  # (B, rows, 64) == AvgPool2d((1, cols))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.resize, dtype=self.dtype, name="fc_horizon")(x)

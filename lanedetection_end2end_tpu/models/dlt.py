"""Homography-offset predictor head for the learned-homography option.

TPU-native take on the reference's dormant `Spatial_transformer_net`
(Backprojection_Loss/Networks/Least_squares_net.py:284-329): a small
conv+BN stack over the shared encoder features, pooled to a 3-vector of
trapezoid offsets squashed by tanh/16 (Least_squares_net.py:261). The final
layer is zero-initialized so training STARTS from the fixed calibrated
homography (Least_squares_net.py:316-317) — the DLT solve
(geometry/dlt.py) then reproduces `bev_matrices_pixel` exactly at step 0.

Differences from the reference, deliberate:
- Consumes the H/8 x W/8 x 128 encoder features the other aux heads share
  (the reference feeds its own full-resolution input through 5 convs) — no
  extra backbone work, and the flatten stays small.
- Global average pool instead of a giant `Linear(64*rows*cols//4, 128)`:
  resolution-independent and removes a ~0.5M-parameter matrix whose only
  job is downsampling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9


class HomographyHead(nn.Module):
    """Encoder features (B, H/8, W/8, 128) -> (B, 3) normalized trapezoid
    offsets in (-1/16, 1/16): (dx_left, dx_right, dy_top)."""
    dtype: Any = jnp.float32
    axis_name: Any = None  # sync-BN axis under shard_map; None under jit

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
            if i == 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # (B, 64) global average pool
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc1")(x))
        x = nn.Dense(3, dtype=self.dtype, name="fc_offsets",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(x)
        return jnp.tanh(x.astype(jnp.float32)) / 16.0

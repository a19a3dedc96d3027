"""ERFNet segmentation backbone in JAX/flax, NHWC, TPU-first.

Architecture parity with the reference ERFNet
(Birds_Eye_View_Loss/Networks/ERFNet.py, Backprojection_Loss/Networks/ERFNet.py):

- DownsamplerBlock: 3x3/s2 conv (out-in channels) || 2x2 maxpool, concat,
  BN(eps=1e-3), relu                                     (ERFNet.py:11-22)
- non_bottleneck_1d: factorized 3x1 + 1x3 convs, two BN, optional dilation,
  dropout, residual relu                                 (ERFNet.py:25-60)
- Encoder: 3->16 -> 64 (5x NB1D d=1, p=0.03) -> 128 (2x NB1D dilations
  2/4/8/16, p=0.3), optional 1x1 predict head            (ERFNet.py:63-95)
- Decoder: Up(128->64), 2x NB1D, Up(64->16), 2x NB1D, ConvT 2x2/s2 output
  head; dual head (num_classes / num_classes+1) when pretraining
  (ERFNet.py:109-142); optional dormant second decoder of the BP tree
  (Backprojection_Loss/Networks/ERFNet.py:129-160, never enabled there).

TPU redesign choices: NHWC layouts (channels-last convs map directly onto
XLA's TPU convolution tiling), BatchNorm eps=1e-3 with torch-equivalent
momentum (0.1 torch == 0.9 flax running-average decay), dropout with explicit
RNG, compute dtype configurable (bfloat16 backbone with f32 params/stats).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torch BatchNorm2d defaults: eps given as 1e-3 in ERFNet, momentum 0.1
# (=> flax momentum 0.9).
_BN_EPS = 1e-3
_BN_MOMENTUM = 0.9


class DownsamplerBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # NOTE: a reshape+where 2x2 max (avoiding reduce_window) was tried
        # and REGRESSED the full train step 21.3 -> 27 ms/step at bs8 despite
        # reduce_window+select-and-scatter profiling at only ~0.9 ms — the
        # where-chain changes layout assignment around the concat and costs
        # more downstream than it saves. Keep nn.max_pool.
        in_ch = x.shape[-1]
        conv = nn.Conv(self.out_channels - in_ch, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), use_bias=True,
                       dtype=self.dtype, name="conv")(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = jnp.concatenate([conv, pool], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=_BN_MOMENTUM, dtype=self.dtype,
                         name="bn")(y)
        return nn.relu(y)


class NonBottleneck1D(nn.Module):
    channels: int
    dropprob: float
    dilated: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dilated
        y = nn.Conv(self.channels, (3, 1), padding=((1, 1), (0, 0)),
                    dtype=self.dtype, name="conv3x1_1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 3), padding=((0, 0), (1, 1)),
                    dtype=self.dtype, name="conv1x3_1")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=_BN_MOMENTUM, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 1), padding=((d, d), (0, 0)),
                    kernel_dilation=(d, 1), dtype=self.dtype,
                    name="conv3x1_2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (1, 3), padding=((0, 0), (d, d)),
                    kernel_dilation=(1, d), dtype=self.dtype,
                    name="conv1x3_2")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=_BN_MOMENTUM, dtype=self.dtype, name="bn2")(y)
        if self.dropprob > 0:
            # the reference uses nn.Dropout2d (ERFNet.py:41): whole CHANNELS
            # drop per sample -> broadcast the mask over H, W (NHWC axes 1, 2)
            y = nn.Dropout(self.dropprob, deterministic=not train,
                           broadcast_dims=(1, 2), name="dropout")(y)
        return nn.relu(y + x)


class Encoder(nn.Module):
    in_channels: int = 3
    num_classes: int = 2
    dropout_1: float = 0.03  # 64-ch stage (ERFNet.py:73)
    dropout_2: float = 0.3   # 128-ch stage (ERFNet.py:78-81)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, predict: bool = False):
        x = DownsamplerBlock(16, dtype=self.dtype, name="initial_block")(x, train)
        x = DownsamplerBlock(64, dtype=self.dtype, name="down1")(x, train)
        for i in range(5):
            x = NonBottleneck1D(64, self.dropout_1, 1, dtype=self.dtype,
                                name=f"nb64_{i}")(x, train)
        x = DownsamplerBlock(128, dtype=self.dtype, name="down2")(x, train)
        for j in range(2):
            for d in (2, 4, 8, 16):
                x = NonBottleneck1D(128, self.dropout_2, d, dtype=self.dtype,
                                    name=f"nb128_{j}_d{d}")(x, train)
        # Always trace the encoder-only predict head so its parameters exist
        # regardless of which mode initialized the model; XLA drops it from
        # graphs that don't select it.
        pred = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="output_conv")(x)
        return pred if predict else x


class UpsamplerBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # torch ConvTranspose2d(3, stride=2, padding=1, output_padding=1)
        # doubles the spatial dims. flax equivalent is padding ((1,2),(1,2))
        # with the spatially FLIPPED torch kernel (verified numerically in
        # tests/test_reference_parity.py); "SAME" shifts the output one
        # row/col and differs at the boundary.
        y = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype,
                             name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         momentum=_BN_MOMENTUM, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class Decoder(nn.Module):
    num_classes: int
    pretrain: bool = False  # dual output heads (ERFNet.py:125-126)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, use_main_head: bool = True):
        x = UpsamplerBlock(64, dtype=self.dtype, name="up1")(x, train)
        x = NonBottleneck1D(64, 0.0, 1, dtype=self.dtype, name="nb64_0")(x, train)
        x = NonBottleneck1D(64, 0.0, 1, dtype=self.dtype, name="nb64_1")(x, train)
        x = UpsamplerBlock(16, dtype=self.dtype, name="up2")(x, train)
        x = NonBottleneck1D(16, 0.0, 1, dtype=self.dtype, name="nb16_0")(x, train)
        x = NonBottleneck1D(16, 0.0, 1, dtype=self.dtype, name="nb16_1")(x, train)
        # torch ConvTranspose2d(2, stride=2) doubles dims; VALID k=2/s=2 matches.
        main = nn.ConvTranspose(self.num_classes, (2, 2), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                name="output_conv")
        if self.pretrain:
            aux = nn.ConvTranspose(self.num_classes + 1, (2, 2), strides=(2, 2),
                                   padding="VALID", dtype=self.dtype,
                                   name="output_conv2")
            # `use_main_head` is static per jitted graph (one graph per
            # training phase), mirroring the runtime `flag` of ERFNet.py:136-139.
            # Both heads are traced so both get parameters; XLA dead-code
            # eliminates the unselected one from each compiled graph.
            main_out, aux_out = main(x), aux(x)
            return main_out if use_main_head else aux_out
        return main(x)


class ERFNet(nn.Module):
    """Encoder + decoder; returns (encoder_features, seg_logits[, seg2]).

    `do_segmentation` adds the BP tree's declared-but-dormant second decoder
    (Backprojection_Loss/Networks/ERFNet.py:129-160). When disabled, the raw
    encoder features stand in for `output_seg`, matching the reference default
    (ERFNet.py:145, constructed with do_segmentation=False at :164-169).
    """
    in_channels: int = 3
    out_channels: int = 2
    pretrained: bool = False
    do_segmentation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, use_main_head: bool = True,
                 only_encode: bool = False):
        if only_encode:
            return Encoder(self.in_channels, self.out_channels,
                           dtype=self.dtype, name="encoder")(
                               x, train, predict=True)
        enc = Encoder(self.in_channels, self.out_channels, dtype=self.dtype,
                      name="encoder")(x, train)
        dec = Decoder(self.out_channels, pretrain=self.pretrained,
                      dtype=self.dtype, name="decoder")(
                          enc, train, use_main_head=use_main_head)
        if self.do_segmentation:
            seg = Decoder(self.out_channels + 1, pretrain=False,
                          dtype=self.dtype, name="decoder_seg")(enc, train)
            return enc, dec, seg
        return enc, dec, enc

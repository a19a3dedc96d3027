"""Fully fused ERFNet graph: encoder and decoder as single Pallas kernels.

Serving-path culmination of ops/pallas_nb1d.py + ops/pallas_backbone.py:
per image, the ENTIRE encoder (initial downsampler -> down1 -> 5x NB1D-64 ->
down2 -> 8x dilated NB1D-128) runs as one kernel with every intermediate
plane resident in VMEM, and the ENTIRE decoder (up1 -> 2x NB1D-64 -> up2 ->
2x NB1D-16 -> 2x2 ConvTranspose head -> activation -> row mask -> WLS row
sums) as another. HBM sees: image in, encoder features out (for the
line/horizon heads), and an (H, 2C) row-sum tensor out — the decoder's
256x512 activations never leave the chip.

The WLS row sums S0[c, r] = sum_w w2, S1[c, r] = sum_w w2 * xs feed
WLSFitter's separable moment path (ops/wls.py point 5): beta =
fitter.beta_from_rowsums(S0, S1).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanedetection_end2end_tpu.config import LaneConfig
from lanedetection_end2end_tpu.ops.pallas_backbone import (
    body_downsampler, body_head, body_upsampler, pack_downsampler, pack_head,
    pack_upsampler)
from lanedetection_end2end_tpu.ops.pallas_nb1d import (
    _nb1d_body, pack_nb1d, wino_hint)

_ENC_NB64 = [(f"nb64_{i}", 1) for i in range(5)]
_ENC_NB128 = [(f"nb128_{j}_d{d}", d) for j in range(2) for d in (2, 4, 8, 16)]
_DEC_NB64 = [("nb64_0", 1), ("nb64_1", 1)]
_DEC_NB16 = [("nb16_0", 1), ("nb16_1", 1)]
_NB_CONSTS = ("Kh1", "Kw1", "Kh2", "Kw2", "b1", "m1", "a1", "b3", "m2", "a2")


# ----------------------------------------------------------------------
# Packed-constants flattening (arrays -> kernel operands, statics kept)
# ----------------------------------------------------------------------

def _flatten_packed(tree) -> Tuple[List[Any], Any]:
    arrays: List[Any] = []

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        if isinstance(node, (int, float, str)) or node is None:
            return node
        arrays.append(node)
        return ("__arr__", len(arrays) - 1)

    return arrays, walk(tree)


def _rebuild(struct, values, read):
    if isinstance(struct, dict):
        return {k: _rebuild(v, values, read) for k, v in struct.items()}
    if isinstance(struct, list):
        return [_rebuild(v, values, read) for v in struct]
    if isinstance(struct, tuple) and len(struct) == 2 and struct[0] == "__arr__":
        return read(values[struct[1]])
    return struct


# ----------------------------------------------------------------------
# NB1D adapter: dict-packed -> _nb1d_body consts tuple
# ----------------------------------------------------------------------

def _nb(x, p, *, H, L, C, d, interpret, seg=0):
    consts = tuple(p[k] for k in _NB_CONSTS)
    y = _nb1d_body(x.astype(jnp.bfloat16), consts, H=H, L=L, C=C, d=d,
                   interpret=interpret, seg=seg)
    return y.astype(jnp.bfloat16).reshape(H, L)


# ----------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------

def pack_encoder(variables, cfg: LaneConfig):
    v = jax.device_get(variables)
    p = v["params"]["erfnet"]["encoder"]
    s = v["batch_stats"]["erfnet"]["encoder"]
    packed = {
        "initial": pack_downsampler(p["initial_block"], s["initial_block"],
                                    4, 16),
        "down1": pack_downsampler(p["down1"], s["down1"], 16, 64),
        "down2": pack_downsampler(p["down2"], s["down2"], 64, 128),
    }
    h_nb64 = wino_hint(cfg.image_height // 4)
    h_nb128 = wino_hint(cfg.image_height // 8)
    for name, d in _ENC_NB64:
        packed[name] = pack_nb1d(p[name], s[name], d, h_hint=h_nb64)
        packed[name].pop("C"), packed[name].pop("dilation")
    for name, d in _ENC_NB128:
        packed[name] = pack_nb1d(p[name], s[name], d, h_hint=h_nb128)
        packed[name].pop("C"), packed[name].pop("dilation")
    return _flatten_packed(packed)


def _encoder_plane_a(x, c, *, H, W, interpret, stack=1):
    """x: (stack*H, W*4) padded-RGB plane -> (stack*(H/4), (W/4)*64):
    initial + down1 + the 5-block NB1D-64 chain. With stack > 1
    (NB1D_STACK), the plane holds `stack` images and every body masks its
    H-direction taps at the image junctions (seg=per-image height)."""
    sg = lambda h: h if stack > 1 else 0
    t = body_downsampler(x, c["initial"], H=stack * H, W=W,
                         interpret=interpret, seg=sg(H))
    H2, W2 = H // 2, W // 2
    t = body_downsampler(t, c["down1"], H=stack * H2, W=W2,
                         interpret=interpret, seg=sg(H2))
    H3, W3 = H2 // 2, W2 // 2
    for name, d in _ENC_NB64:
        t = _nb(t, c[name], H=stack * H3, L=W3 * 64, C=64, d=d,
                interpret=interpret, seg=sg(H3))
    return t


def _encoder_plane_b(t, c, *, H, W, interpret, stack=1):
    """(stack*(H/4), (W/4)*64) -> (stack*(H/8), (W/8)*128): down2 +
    dilated NB1D-128 chain."""
    sg = lambda h: h if stack > 1 else 0
    H3, W3 = H // 4, W // 4
    t = body_downsampler(t, c["down2"], H=stack * H3, W=W3,
                         interpret=interpret, seg=sg(H3))
    H4, W4 = H3 // 2, W3 // 2
    for name, d in _ENC_NB128:
        t = _nb(t, c[name], H=stack * H4, L=W4 * 128, C=128, d=d,
                interpret=interpret, seg=sg(H4))
    return t


def _encoder_plane(x, c, *, H, W, interpret, stack=1):
    """x: (stack*H, W*4) padded-RGB plane -> (stack*(H/8), (W/8)*128)."""
    t = _encoder_plane_a(x, c, H=H, W=W, interpret=interpret, stack=stack)
    return _encoder_plane_b(t, c, H=H, W=W, interpret=interpret, stack=stack)


def _stack_factor(B: int) -> int:
    """Images stacked along the SUBLANE (row) axis per grid step (env
    NB1D_STACK, default 1). Unlike program unrolling (the removed
    NB1D_PAIR experiment — measured r04: Mosaic does not interleave the
    unrolled per-image chains), stacking keeps the instruction count
    constant and doubles every matmul's M dimension: (S*H*L/128, 128) @
    (128, 128) — better MXU pipelining and half the per-element
    instruction issue — at the cost of cheap junction masks on the
    H-direction conv taps (see `_nb1d_body(seg=...)`). Compile cost is
    flat in S."""
    import os
    S = int(os.environ.get("NB1D_STACK", "1"))
    while S > 1 and B % S:
        S -= 1
    return max(S, 1)


def _plane_call(x, packed_arrays, struct, body, *, Ho, Lo, out_dtype,
                interpret):
    """Run `body(plane, consts) -> (Ho, Lo)` per image as one pallas_call.

    x: (B, H, L); all packed constants are passed to the kernel (constant
    index maps — fetched into VMEM once, not per grid step)."""
    B, H, L = x.shape

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        c = _rebuild(struct, refs[:-1], read=lambda r: r[:])
        out_ref[0] = body(x_ref[0], c)

    full = lambda a: pl.BlockSpec(
        a.shape, lambda b, _n=len(a.shape): (0,) * _n,
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in packed_arrays],
        out_specs=pl.BlockSpec((1, Ho, Lo), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Lo), out_dtype),
        interpret=interpret,
    )(x, *packed_arrays)


def encoder_fused(images, packed_arrays, struct, cfg: LaneConfig,
                  interpret: bool = False):
    """images: (B, H, W, 3) -> encoder features (B, H/8, W/8, 128)."""
    B, H, W, _ = images.shape
    S = _stack_factor(B)
    x = jnp.pad(images.astype(jnp.bfloat16),
                ((0, 0), (0, 0), (0, 0), (0, 1)))  # RGB -> 4ch lane packing
    # NB1D_STACK: S consecutive images stacked along rows into one plane
    xf = x.reshape(B // S, S * H, W * 4)
    Ho, Lo = H // 8, (W // 8) * 128
    out = _plane_call(
        xf, packed_arrays, struct,
        lambda p, c: _encoder_plane(p, c, H=H, W=W, interpret=interpret,
                                    stack=S),
        Ho=S * Ho, Lo=Lo, out_dtype=jnp.bfloat16, interpret=interpret)
    return out.reshape(B, Ho, W // 8, 128)


# ----------------------------------------------------------------------
# Decoder (+ head + activation + mask + WLS row sums)
# ----------------------------------------------------------------------

def pack_decoder(variables, cfg: LaneConfig, fitter):
    v = jax.device_get(variables)
    p = v["params"]["erfnet"]["decoder"]
    s = v["batch_stats"]["erfnet"]["decoder"]
    out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
    packed = {
        "up1": pack_upsampler(p["up1"], s["up1"], 128, 64),
        "up2": pack_upsampler(p["up2"], s["up2"], 64, 16),
        "head": pack_head(p["output_conv"], 16, out_ch),
    }
    for name, d in _DEC_NB64:
        packed[name] = pack_nb1d(p[name], s[name], d,
                                 h_hint=wino_hint(cfg.image_height // 4))
        packed[name].pop("C"), packed[name].pop("dilation")
    for name, d in _DEC_NB16:
        packed[name] = pack_nb1d(p[name], s[name], d,
                                 h_hint=wino_hint(cfg.image_height // 2))
        packed[name].pop("C"), packed[name].pop("dilation")

    # WLS row-sum constants. Mosaic cannot hold tiny-lane (N, C) vectors,
    # so the selection keeps 128 output lanes (channel c in lane c, rest 0)
    # and the per-row block reduction is a (H, nblk*128) @ (nblk*128, 128)
    # matmul; XLA slices the C meaningful lanes outside the kernel.
    C = out_ch
    W = cfg.image_width
    L = W * C
    g = 128 // C  # w per lane block
    sel = np.zeros((128, 128), np.float32)
    for w in range(g):
        for c in range(C):
            sel[w * C + c, c] = 1.0
    nblk = L // 128
    red = np.tile(np.eye(128, dtype=np.float32), (nblk, 1))  # (nblk*128, 128)
    xs_n = np.asarray(fitter._sep_xs)  # (W,) normalized column coordinate
    xs_lane = np.repeat(xs_n, C)[None, :]  # (1, L)
    packed["sel"] = jnp.asarray(sel, jnp.float32)
    packed["red"] = jnp.asarray(red, jnp.float32)
    packed["xs"] = jnp.asarray(xs_lane, jnp.float32)
    return _flatten_packed(packed)


def _decoder_plane_a(enc, c, *, cfg: LaneConfig, interpret, stack=1):
    """enc (stack*(H/8), (W/8)*128) -> (stack*(H/2), (W/2)*16):
    up1 + NB1D-64 x2 + up2."""
    H, W = cfg.image_height, cfg.image_width
    sg = lambda h: h if stack > 1 else 0
    H4, W4 = H // 8, W // 8
    t = body_upsampler(enc, c["up1"], H=stack * H4, W=W4,
                       interpret=interpret, seg=sg(H4))
    H3, W3 = H4 * 2, W4 * 2
    for name, d in _DEC_NB64:
        t = _nb(t, c[name], H=stack * H3, L=W3 * 64, C=64, d=d,
                interpret=interpret, seg=sg(H3))
    return body_upsampler(t, c["up2"], H=stack * H3, W=W3,
                          interpret=interpret, seg=sg(H3))


def _decoder_plane_b(t, c, *, cfg: LaneConfig, interpret, stack=1):
    """(stack*(H/2), (W/2)*16) -> S (stack*H, 256): NB1D-16 x2 + head +
    activation + row mask + WLS row sums ([S0 | S1], channel c in lanes c
    and 128+c)."""
    H, W = cfg.image_height, cfg.image_width
    sg = lambda h: h if stack > 1 else 0
    out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
    C = out_ch
    H2, W2 = H // 2, W // 2
    for name, d in _DEC_NB16:
        t = _nb(t, c[name], H=stack * H2, L=W2 * 16, C=16, d=d,
                interpret=interpret, seg=sg(H2))
    # 2x2/s2 ConvT head reads one input row per output row pair: no
    # junction leak, no seg needed
    dec = body_head(t, c["head"], H=stack * H2, W=W2,
                    interpret=interpret)  # (stack*H, W*C) f32

    # activation -> (act * mask)^2, with the row mask applied to S below
    act = cfg.activation_layer
    if act == "square":
        w2 = jnp.square(jnp.square(dec))
    elif act == "relu":
        w2 = jnp.square(jnp.maximum(dec, 0.0))
    elif act == "abs":
        w2 = jnp.square(dec)  # |x|^2 == x^2
    elif act == "none":
        w2 = jnp.square(dec)
    elif act == "sigmoid":
        w2 = jnp.square(jax.nn.sigmoid(dec))
    elif act == "softplus":
        w2 = jnp.square(jax.nn.softplus(dec))
    else:
        raise NotImplementedError(act)

    L = W * C
    nblk = L // 128
    Ht = stack * H
    z0 = w2.astype(jnp.float32).reshape(-1, 128)
    z1 = (w2 * c["xs"]).astype(jnp.float32).reshape(-1, 128)
    p0 = jnp.dot(z0, c["sel"], preferred_element_type=jnp.float32)
    p1 = jnp.dot(z1, c["sel"], preferred_element_type=jnp.float32)
    # per-row reduction over the nblk partials, all at 128 lanes
    s0 = jnp.dot(p0.reshape(Ht, nblk * 128), c["red"],
                 preferred_element_type=jnp.float32)
    s1 = jnp.dot(p1.reshape(Ht, nblk * 128), c["red"],
                 preferred_element_type=jnp.float32)
    # top-row mask: rows [0, ceil(resize * mask_pct)) of EACH image
    # contribute nothing (per-image row index: H is a power of two)
    from math import ceil
    zero_rows = ceil(cfg.resize * cfg.mask_percentage)
    assert (H & (H - 1)) == 0, H
    row = jax.lax.broadcasted_iota(jnp.int32, (Ht, 128), 0)
    row = jax.lax.bitwise_and(row, H - 1)
    s0 = jnp.where(row < zero_rows, 0.0, s0)
    s1 = jnp.where(row < zero_rows, 0.0, s1)
    return jnp.concatenate([s0, s1], axis=1)  # (stack*H, 256)


def _decoder_plane(enc, c, *, cfg: LaneConfig, interpret, stack=1):
    """enc (stack*(H/8), (W/8)*128) -> S (stack*H, 256) WLS row sums."""
    t = _decoder_plane_a(enc, c, cfg=cfg, interpret=interpret, stack=stack)
    return _decoder_plane_b(t, c, cfg=cfg, interpret=interpret, stack=stack)


def decoder_fused(enc, packed_arrays, struct, cfg: LaneConfig,
                  interpret: bool = False):
    """enc: (B, H/8, W/8, 128) -> S (B, H, 2*C) WLS row sums [S0 | S1]."""
    B, H8, W8, _ = enc.shape
    H = cfg.image_height
    S = _stack_factor(B)
    out_ch = cfg.nclasses if cfg.pretrained else cfg.seg_out_channels
    encf = enc.reshape(B // S, S * H8, W8 * 128)

    out = _plane_call(
        encf, packed_arrays, struct,
        lambda p, c: _decoder_plane(p, c, cfg=cfg, interpret=interpret,
                                    stack=S),
        Ho=S * H, Lo=256, out_dtype=jnp.float32, interpret=interpret)
    out = out.reshape(B, H, 256)
    # lanes 0..C-1 = S0 channels, 128..128+C-1 = S1 channels
    return jnp.concatenate([out[:, :, :out_ch], out[:, :, 128:128 + out_ch]],
                           axis=-1)

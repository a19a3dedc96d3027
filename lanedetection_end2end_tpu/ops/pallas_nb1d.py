"""Pallas fused non_bottleneck_1d block — the backbone's hot op.

ERFNet spends its time in NB1D blocks (ERFNet.py:25-60): four factorized
convs (3x1, 1x3, 3x1-dilated, 1x3-dilated) + two BatchNorms + relus +
residual. XLA executes the small-channel instances (C=16/64 at high
resolution) at ~5% of memory speed-of-light: channel counts far below the
128-lane width force layout churn, and every conv/elementwise boundary
inserts lane-permuting copies that run ~40 GB/s (profiled: two C=16 blocks
cost 2.4 ms of a 6.6 ms inference batch — more than all MXU work combined).

This kernel processes one image per grid step with the WHOLE block fused in
VMEM, in the "lane-packed" layout (H, W*C): lanes are fully occupied for any
C dividing 128, and

- a 1x3 conv (along W, dilation d) = 3 lane-rotations by ±d*C
  (`pltpu.roll` — native VPU op) with edge masking, each followed by a
  block-diagonal (128, 128) matmul (G = 128/C copies of the (C, C) channel
  mixer on the diagonal) — MXU-perfect shapes;
- a 3x1 conv (along H, dilation d) = 3 row-shifts (sublane slices, cheap)
  with the same block-diagonal matmul;
- conv biases and BatchNorm (inference: running stats) fold into per-lane
  multiply/add vectors; relus and the residual are VPU elementwise.

HBM traffic per block: read + write one bf16 plane per image — speed of
light for this op. Used by the fused inference engine
(models/infer_engine.py); training keeps the differentiable flax graph.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def wino_hint(h: int) -> int | None:
    """Plane-height hint enabling the Winograd-H conv form, gated by env
    NB1D_WINO=1. Default OFF: on v5e the (H,L)->(H/2d, 2dL) regrouping is a
    Mosaic relayout and 4 half-height matmuls pay more pipeline latency than
    3 full ones — measured 8.9 -> 13.5 ms/batch32 end-to-end (round 3)."""
    return h if os.environ.get("NB1D_WINO") == "1" else None


def roll_lanes(t: jax.Array, shift: int, interpret: bool) -> jax.Array:
    """Lane-roll (axis 1) that works for 16-bit data inside Mosaic.

    Mosaic's rotate is 32-bit only ("Rotate with non-32-bit data" compile
    error), and rolling an f32 COPY of a bf16 plane doubles the VPU traffic
    and adds cast round-trips. Instead: bitcast bf16 -> i32 (Mosaic packs
    the SUBLANE dim, lanes unchanged), roll the i32 view, bitcast back —
    a lane roll is row-uniform, so row packing is transparent."""
    if interpret:
        return jnp.roll(t, shift, axis=1)
    if t.dtype.itemsize == 4:
        return pltpu.roll(t, shift, axis=1)
    ti = pltpu.bitcast(t, jnp.int32)
    return pltpu.bitcast(pltpu.roll(ti, shift, axis=1), t.dtype)


def fold_bn(bn_params: Dict, bn_stats: Dict, eps: float = 1e-3):
    """BatchNorm (inference) -> per-channel (mul, add):
    y = (x - mean)/sqrt(var+eps)*scale + bias = x*mul + add."""
    scale = np.asarray(bn_params["scale"], np.float32)
    bias = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    mul = scale / np.sqrt(var + eps)
    return mul, bias - mean * mul


def _block_diag(k: np.ndarray) -> np.ndarray:
    """(C, C) channel mixer -> (128, 128) block diagonal (G = 128//C copies)."""
    C = k.shape[0]
    assert 128 % C == 0, f"channel count {C} must divide 128"
    G = 128 // C
    out = np.zeros((128, 128), np.float32)
    for g in range(G):
        out[g * C:(g + 1) * C, g * C:(g + 1) * C] = k
    return out


def _wino_taps(g0: np.ndarray, g1: np.ndarray, g2: np.ndarray) -> np.ndarray:
    """F(2,3) transformed kernels: G @ [g0;g1;g2] for the 1D Winograd
    decomposition (2 outputs from 4 multiplies instead of 6). Each g is a
    (C, C) channel mixer; output (4, 128, 128) block-diagonal."""
    t = [g0, (g0 + g1 + g2) * 0.5, (g0 - g1 + g2) * 0.5, g2]
    return np.stack([_block_diag(m) for m in t])


def _tri_taps(g0: np.ndarray, g1: np.ndarray, g2: np.ndarray, d: int
              ) -> np.ndarray:
    """W-conv (dilation d, C = g.shape[0] <= 64) as TWO 128-lane matmuls.

    A 128-lane block holds G = 128/C w-positions. The in-block taps form a
    banded (bandwidth d) block matrix M_main; the 2d words that cross block
    boundaries arrive via one combined edge plane (left-neighbor words in
    the first d word slots, right-neighbor in the last d) mixed by M_edge.
    Replaces the 3 block-diagonal matmuls of the legacy path — a pure 33%
    MXU saving, VPU-neutral. Requires 2*d*C <= 128.
    """
    C = g0.shape[0]
    G = 128 // C
    assert 2 * d * C <= 128, (C, d)
    taps = {-d: g0, 0: g1, +d: g2}
    main = np.zeros((128, 128), np.float32)
    for w_out in range(G):
        for dw, g in taps.items():
            w_in = w_out + dw
            if 0 <= w_in < G:
                main[w_in * C:(w_in + 1) * C,
                     w_out * C:(w_out + 1) * C] = g
    edge = np.zeros((128, 128), np.float32)
    for w in range(d):  # left-neighbor words: tap -d for out words [0, d)
        edge[w * C:(w + 1) * C, w * C:(w + 1) * C] = g0
    for w in range(G - d, G):  # right-neighbor: tap +d for words [G-d, G)
        edge[w * C:(w + 1) * C, w * C:(w + 1) * C] = g2
    return np.stack([main, edge])


def pack_nb1d(params: Dict, stats: Dict, dilation: int, eps: float = 1e-3,
              h_hint: int | None = None):
    """Precompute the kernel's constants from a flax NonBottleneck1D
    param/batch_stats subtree (models/erfnet.py NonBottleneck1D names).

    Conv kernels are flax (kh, kw, cin, cout); 3x1 kernels index kh (taps
    over H), 1x3 kernels index kw (taps over W). Biases and BatchNorms fold
    into per-channel (mul, add) pairs applied after each directional pair.

    Emitted conv forms (the kernel body dispatches on leading dim):
      Kh*: (4,128,128) Winograd F(2,3) when `h_hint` (the plane height) is
           given and divisible by 2*dilation — 4 half-height matmuls per
           conv instead of 3 full ones; else (3,128,128) direct taps.
      Kw*: (2,128,128) banded main+edge form when 2*dilation*C <= 128;
           else (3,128,128) direct taps (C=128 uses the W-Winograd path
           at apply time, sharing the direct taps).
    """
    k31_1 = np.asarray(params["conv3x1_1"]["kernel"], np.float32)  # (3,1,C,C)
    k13_1 = np.asarray(params["conv1x3_1"]["kernel"], np.float32)  # (1,3,C,C)
    k31_2 = np.asarray(params["conv3x1_2"]["kernel"], np.float32)
    k13_2 = np.asarray(params["conv1x3_2"]["kernel"], np.float32)
    C = k31_1.shape[2]
    G = 128 // C

    def taps_h(k, d):  # (3,1,C,C) -> (4,128,128) wino or (3,128,128) direct
        if h_hint is not None and h_hint % (2 * d) == 0:
            return _wino_taps(k[0, 0], k[1, 0], k[2, 0])
        return np.stack([_block_diag(k[t, 0]) for t in range(3)])

    def taps_w(k, d):  # (1,3,C,C) -> (2,128,128) tri or (3,128,128) direct
        if 2 * d * C <= 128:
            return _tri_taps(k[0, 0], k[0, 1], k[0, 2], d)
        return np.stack([_block_diag(k[0, t]) for t in range(3)])

    mul1, add1 = fold_bn(params["bn1"], stats["bn1"], eps)
    mul2, add2 = fold_bn(params["bn2"], stats["bn2"], eps)
    b1 = np.asarray(params["conv3x1_1"]["bias"], np.float32)
    b2 = np.asarray(params["conv1x3_1"]["bias"], np.float32)
    b3 = np.asarray(params["conv3x1_2"]["bias"], np.float32)
    b4 = np.asarray(params["conv1x3_2"]["bias"], np.float32)

    tile = lambda v: jnp.asarray(np.tile(v, G)[None, :], jnp.float32)  # (1,128)
    return {
        "Kh1": jnp.asarray(taps_h(k31_1, 1), jnp.bfloat16),
        "Kw1": jnp.asarray(taps_w(k13_1, 1), jnp.bfloat16),
        "Kh2": jnp.asarray(taps_h(k31_2, dilation), jnp.bfloat16),
        "Kw2": jnp.asarray(taps_w(k13_2, dilation), jnp.bfloat16),
        "b1": tile(b1),
        # bn1(conv + b2) = conv*mul1 + (b2*mul1 + add1)
        "m1": tile(mul1), "a1": tile(b2 * mul1 + add1),
        "b3": tile(b3),
        "m2": tile(mul2), "a2": tile(b4 * mul2 + add2),
        "C": C, "dilation": int(dilation),
    }


def _nb1d_kernel(x_ref, Kh1, Kw1, Kh2, Kw2, b1, m1, a1, b3, m2, a2,
                 out_ref, *, H, L, C, d, interpret):
    """One image: x_ref (1, H, L) bf16 lane-packed; out_ref same."""
    consts = (Kh1[:], Kw1[:], Kh2[:], Kw2[:], b1[:], m1[:], a1[:],
              b3[:], m2[:], a2[:])
    y = _nb1d_body(x_ref[0], consts, H=H, L=L, C=C, d=d, interpret=interpret)
    out_ref[0] = y.astype(out_ref.dtype).reshape(H, L)


def _nb1d_body(x, consts, *, H, L, C, d, interpret, seg: int = 0):
    """One NB1D block on a resident (H, L) plane; returns (H*L/128, 128)
    post-relu residual output (f32 accumulators). Shared by the single and
    chain kernels.

    `seg` > 0: the plane stacks H/seg images of `seg` rows each (the
    NB1D_STACK serving mode, models/fused_graph.py::_stack_factor) — the
    H-direction taps must not leak across image junctions, so the shifted
    planes are masked at the `seg`-row boundaries. `seg` must be a power of
    two (every ERFNet stage height is), letting the per-image row index be
    a bitwise AND instead of a mod."""
    Kh1, Kw1, Kh2, Kw2, b1, m1, a1, b3, m2, a2 = consts
    assert seg == 0 or (seg & (seg - 1)) == 0, seg

    def _seg_mask_rows(t, dil, side):
        """Zero the `dil` rows adjacent to each image junction that a
        row-shift by `dil` pulled from the neighboring image. side='up':
        rows with (r mod seg) < dil read image k-1; side='dn': rows with
        (r mod seg) >= seg - dil read image k+1."""
        if not seg or dil >= seg:
            return t if seg == 0 else jnp.zeros_like(t)
        row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        rseg = jax.lax.bitwise_and(row, seg - 1)
        cond = rseg < dil if side == "up" else rseg >= seg - dil
        return jnp.where(cond, jnp.zeros((), t.dtype), t)

    # Epilogue accumulator dtype. bf16 accumulators were measured 10%
    # SLOWER (r04, PROFILE_r04.md): the VPU traffic saved by halving the
    # epilogue dtype is repaid with interest in pack/unpack relayouts
    # around the 32-bit-only roll/compare ops — f32 stays.
    acc_dtype = jnp.float32
    dot = lambda a, K: jnp.dot(a.reshape(-1, 128), K,
                               preferred_element_type=jnp.float32
                               ).astype(acc_dtype)

    def conv_h_direct(t, K, dil):
        if dil >= H:
            up = dn = jnp.zeros((H, L), t.dtype)
        else:
            zeros = jnp.zeros((dil, L), t.dtype)
            up = _seg_mask_rows(jnp.concatenate([zeros, t[:-dil]], axis=0),
                                dil, "up")
            dn = _seg_mask_rows(jnp.concatenate([t[dil:], zeros], axis=0),
                                dil, "dn")
        return dot(up, K[0]) + dot(t, K[1]) + dot(dn, K[2])

    def conv_h_wino(t, K, dil):
        # F(2,3) over rows: pair output rows (r, r+dil). The even/odd row
        # classes are FREE lane views — (H, L) -> (H/2d, 2dL) groups 2d
        # consecutive rows per super-row, E = first d (rows r with
        # (r mod 2d) < d), O = last d. 4 matmuls on half-height planes
        # replace 3 full ones (33% MXU saving); transforms are plane adds.
        assert H % (2 * dil) == 0, (H, dil)
        q = H // (2 * dil)
        v = t.reshape(q, 2 * dil * L)
        E, O = v[:, :dil * L], v[:, dil * L:]
        if q == 1:  # single super-row: both shifted classes are all-pad
            O_prev = jnp.zeros_like(O)
            E_next = jnp.zeros_like(E)
        else:
            zrow = jnp.zeros((1, dil * L), t.dtype)
            O_prev = jnp.concatenate([zrow, O[:-1]], axis=0)
            E_next = jnp.concatenate([E[1:], zrow], axis=0)
        m0 = dot(O_prev - O, K[0])
        m1 = dot(E + O, K[1])
        m2 = dot(O - E, K[2])
        m3 = dot(E - E_next, K[3])
        ye = (m0 + m1 + m2).reshape(q, dil * L)
        yo = (m1 - m2 - m3).reshape(q, dil * L)
        return jnp.concatenate([ye, yo], axis=1)

    def conv_h(t, K, dil):
        # Winograd-H pairs rows across super-rows and cannot be junction-
        # masked; NB1D_WINO and NB1D_STACK are mutually exclusive.
        assert K.shape[0] == 3 or seg == 0, "NB1D_WINO incompatible with NB1D_STACK"
        out = (conv_h_wino if K.shape[0] == 4 else conv_h_direct)(t, K, dil)
        return out.reshape(-1, 128)

    def conv_w_direct(t, K, dil):
        s = dil * C
        if s >= L:
            # both shifted taps fall entirely off the plane
            return dot(t, K[1])
        # rolls and edge masks stay in the input dtype (bf16): half the VPU
        # traffic of rolling f32 copies, and no cast round-trips
        left = roll_lanes(t, s, interpret)
        right = roll_lanes(t, L - s, interpret)
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
        zero = jnp.zeros((), t.dtype)
        left = jnp.where(lane < s, zero, left)
        right = jnp.where(lane >= L - s, zero, right)
        return dot(left, K[0]) + dot(t, K[1]) + dot(right, K[2])

    def conv_w_tri(t, K, dil):
        # banded main matmul (in-block taps) + one edge matmul fed by a
        # combined neighbor plane: first dil*C lanes of each block from the
        # left neighbor, last dil*C from the right (see _tri_taps).
        s = dil * C
        if s >= L:
            return dot(t, K[0])  # main holds the 0-tap band
        er = roll_lanes(t, s, interpret)
        el = roll_lanes(t, L - s, interpret)
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
        word = jax.lax.bitwise_and(lane, 127)
        zero = jnp.zeros((), t.dtype)
        edge = jnp.where(word < s, er, jnp.where(word >= 128 - s, el, zero))
        edge = jnp.where(jnp.logical_or(lane < s, lane >= L - s), zero, edge)
        return dot(t, K[0]) + dot(edge, K[1])

    def conv_w(t, K, dil):
        return (conv_w_tri if K.shape[0] == 2 else conv_w_direct)(t, K, dil)

    to_plane = lambda v: v.reshape(H, L)
    cv = lambda v: v.astype(acc_dtype)  # epilogue constants in the acc dtype
    y = conv_h(x, Kh1, 1)
    y = jnp.maximum(y + cv(b1), 0.0).astype(jnp.bfloat16)
    y = conv_w(to_plane(y), Kw1, 1)
    y = jnp.maximum(y * cv(m1) + cv(a1), 0.0).astype(jnp.bfloat16)
    y = conv_h(to_plane(y), Kh2, d)
    y = jnp.maximum(y + cv(b3), 0.0).astype(jnp.bfloat16)
    y = conv_w(to_plane(y), Kw2, d)
    y = y * cv(m2) + cv(a2)
    y = y + x.reshape(-1, 128).astype(acc_dtype)
    return jnp.maximum(y, 0.0)


_CONST_KEYS = ("Kh1", "Kw1", "Kh2", "Kw2", "b1", "m1", "a1", "b3", "m2", "a2")


def _chain_kernel(*refs, H, L, C, dilations, interpret):
    """n NB1D blocks back to back on one resident plane."""
    n = len(dilations)
    x_ref = refs[0]
    out_ref = refs[-1]
    x = x_ref[0]
    for i in range(n):
        consts = tuple(r[:] for r in refs[1 + i * 10: 1 + (i + 1) * 10])
        y = _nb1d_body(x, consts, H=H, L=L, C=C, d=dilations[i],
                       interpret=interpret)
        x = y.astype(jnp.bfloat16).reshape(H, L)
    out_ref[0] = x.astype(out_ref.dtype)


def nb1d_chain(x: jax.Array, packed_list, dilations, *,
               interpret: bool = False) -> jax.Array:
    """Run a sequence of same-width NB1D blocks as ONE kernel.

    Consecutive blocks (5x 64-ch encoder, 8x 128-ch dilated encoder, 2x
    decoder stages — ERFNet.py:71-81,118-124) share a VMEM-resident plane:
    HBM sees one read and one write for the whole chain instead of one per
    block, and per-kernel launch overhead is paid once.

    Args:
      x: (B, H, W, C) activations.
      packed_list: one `pack_nb1d` dict per block.
      dilations: static per-block dilation list.
    """
    B, H, W, C = x.shape
    L = W * C
    xf = x.reshape(B, H, L)
    n = len(packed_list)
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [xf]
    for p in packed_list:
        for k in _CONST_KEYS:
            args.append(p[k])
            in_specs.append(full(p[k].shape))
    kern = functools.partial(_chain_kernel, H=H, L=L, C=C,
                             dilations=tuple(int(d) for d in dilations),
                             interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, W, C)


def nb1d_fused(x: jax.Array, packed: Dict, *, dilation: int | None = None,
               interpret: bool = False) -> jax.Array:
    """Apply one fused NB1D block (inference).

    Args:
      x: (B, H, W, C) activations, C dividing 128.
      packed: constants from `pack_nb1d`. When the dict crosses a jit
        boundary its "C"/"dilation" ints become tracers — pass `dilation`
        explicitly there (C is taken from the static shape of x).
    Returns:
      (B, H, W, C) output activations, same dtype.
    """
    B, H, W, C = x.shape
    d = int(dilation if dilation is not None else packed["dilation"])
    L = W * C
    xf = x.reshape(B, H, L)
    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    kern = functools.partial(_nb1d_kernel, H=H, L=L, C=C, d=d,
                             interpret=interpret)
    args = [packed[k] for k in _CONST_KEYS]
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(a.shape) for a in args],
        out_specs=pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L), x.dtype),
        interpret=interpret,
    )(xf, *args)
    return out.reshape(B, H, W, C)

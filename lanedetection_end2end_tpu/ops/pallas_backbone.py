"""Lane-packed bodies for the remaining ERFNet blocks — building toward a
fully fused backbone (encoder / decoder each as ONE Pallas kernel).

Complementing ops/pallas_nb1d.py (the NB1D blocks), this module covers the
blocks XLA still executes poorly at small channel counts: DownsamplerBlock
(strided 3x3 conv || maxpool concat, ERFNet.py:11-22), UpsamplerBlock
(ConvTranspose 3x3/s2, ERFNet.py:98-106), and the 2x2/s2 output
ConvTranspose head (ERFNet.py:124).

The key abstraction is the LANE MAP: in the (H, W*C) lane-packed layout,
any W-direction linear op (strided conv taps, transposed-conv phases,
stride-2 selection) whose output block depends only on a bounded lane window
is a sum of block matmuls

    out.reshape(-1, 128*r_out) = sum_s  roll_blocks(in, s).reshape(-1, 128)
                                        @ M_s            (128, 128*r_out)

with TRANSLATION-INVARIANT constant matrices M_s (s in {-1, 0, +1} input
128-blocks), built on the host directly from the flax conv kernels. Rolls by
whole 128-lane blocks are cheap on the VPU, all compute lands on the MXU at
full lane occupancy, and BatchNorm/bias fold into per-lane vectors.

Row (H) direction handling is exact and cheap: stride-2 row access is a free
(H, L) -> (H/2, 2L) reshape; transposed-conv row phases interleave by a
stack+reshape.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lanedetection_end2end_tpu.ops.pallas_nb1d import fold_bn, roll_lanes


# ----------------------------------------------------------------------
# Host-side lane-map matrix builders
# ----------------------------------------------------------------------

def _lane_maps(contribs, cin: int, cout: int, n_out: int,
               r_in: int = 1) -> Dict[int, np.ndarray]:
    """Build block-matmul matrices for a W-direction linear op.

    Input is processed in SUPER-blocks of r_in*128 lanes (r_in*128//cin
    w-positions); each super-block produces n_out output w-positions
    (n_out*cout lanes, a multiple of 128). `contribs(w_out)` yields
    (w_in, ci, co, weight) with absolute w for outputs of super-block 0;
    the op must be translation-invariant with this period.

    Returns {shift: M} with M (r_in*128, n_out*cout); shift counts input
    super-blocks (w_in outside super-block 0 lands in shift != 0).
    """
    out_lanes = n_out * cout
    assert out_lanes % 128 == 0, (cin, cout, n_out)
    in_lanes = r_in * 128
    maps: Dict[int, np.ndarray] = {}
    for w_out in range(n_out):
        for (w_in, ci, co, k) in contribs(w_out):
            lane_in = w_in * cin + ci
            shift, lane_rel = divmod(lane_in, in_lanes)
            lane_out = w_out * cout + co
            M = maps.setdefault(shift, np.zeros((in_lanes, out_lanes),
                                                np.float32))
            M[lane_rel, lane_out] += k
    return maps


def _apply_lane_maps(x2d, maps, r_in: int, interpret: bool):
    """x2d: (H, L) -> (H, (L // (r_in*128)) * out_lanes) via super-block matmuls."""
    H, L = x2d.shape
    in_lanes = r_in * 128
    out = None
    for shift, M in maps.items():
        if shift == 0:
            zz = x2d.reshape(-1, in_lanes)
        else:
            # roll whole super-blocks: shift>0 means input super-block b+shift
            # feeds output super-block b. Rolls/masks stay in the input dtype
            # (bf16): half the VPU traffic of f32 copies, no cast round-trips.
            rolled = roll_lanes(x2d, (L - shift * in_lanes) % L, interpret)
            lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
            zero = jnp.zeros((), x2d.dtype)
            if shift > 0:
                rolled = jnp.where(lane >= L - shift * in_lanes, zero, rolled)
            else:
                rolled = jnp.where(lane < -shift * in_lanes, zero, rolled)
            zz = rolled.reshape(-1, in_lanes)
        term = jnp.dot(zz, M, preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    out_lanes = next(iter(maps.values())).shape[1]
    return out.reshape(H, (L // in_lanes) * out_lanes)


# ----------------------------------------------------------------------
# DownsamplerBlock (conv 3x3/s2 (cout-cin ch) || maxpool 2x2, concat, BN, relu)
# ----------------------------------------------------------------------

def pack_downsampler(params: Dict, stats: Dict, cin: int, cout: int,
                     eps: float = 1e-3) -> Dict:
    """Constants for `body_downsampler` from a flax DownsamplerBlock subtree.

    cin may be padded (e.g. RGB 3 -> 4): the kernel array is zero-padded on
    the input-channel axis; callers pad the activations to match.
    """
    kern = np.asarray(params["conv"]["kernel"], np.float32)  # (3,3,cin0,cc)
    bias = np.asarray(params["conv"]["bias"], np.float32)
    cin0 = kern.shape[2]
    cc = kern.shape[3]  # conv channels = cout - cin0
    if cin0 != cin:  # channel padding
        kern = np.pad(kern, ((0, 0), (0, 0), (0, cin - cin0), (0, 0)))
    g_out = 128 // cout

    maps_rows = []
    for kh in range(3):
        def contribs(w_out, kh=kh):
            # out (h', w') <- in (2h'+kh-1, 2w'+kw-1); this builder handles
            # the W direction for one fixed row tap.
            for kw in range(3):
                # w_in may be negative: it lands in the shift=-1 map and the
                # apply-side edge mask zeroes the out-of-image contribution
                w_in = 2 * w_out + kw - 1
                for ci in range(cin):
                    for co in range(cc):
                        yield (w_in, ci, co, kern[kh, kw, ci, co])
        maps_rows.append(_lane_maps(contribs, cin, cout,
                                    (128 // cin) // 2))

    # pool channels: identity selection of in channel ci (first cin0 only)
    # at w_in = 2w' (max over w pairs is done before the selection)
    def pool_contribs(w_out):
        for ci in range(cin0):
            yield (2 * w_out, ci, cc + ci, 1.0)
    pool_maps = _lane_maps(pool_contribs, cin, cout, (128 // cin) // 2)

    mul, add = fold_bn(params["bn"], stats["bn"], eps)
    bfull = np.concatenate([bias, np.zeros(cout - cc)])
    g = 128 // cout
    mul_l = np.tile(mul, g)[None, :]
    add_l = np.tile(add + bfull * mul, g)[None, :]  # bn(conv+bias) folding
    to_dev = lambda m: {k: jnp.asarray(v, jnp.bfloat16)
                        for k, v in m.items()}
    return {
        "rows": [to_dev(m) for m in maps_rows],
        "pool": to_dev(pool_maps),
        "mul": jnp.asarray(mul_l, jnp.float32),
        "add": jnp.asarray(add_l, jnp.float32),
        "cin": cin, "cout": cout, "cc": cc, "cin0": cin0,
    }


def body_downsampler(x, packed, *, H, W, interpret, seg: int = 0):
    """x: (H, W*cin) -> (H/2, (W/2)*cout), fused conv||pool + BN + relu.

    `seg` > 0 (NB1D_STACK serving mode): the plane stacks H/seg images of
    `seg` rows; the only cross-row tap that can leak across a junction is
    row 2h'-1 at the top of each image — masked below. The 2h'/2h'+1 taps
    and the 2x2 maxpool pair rows within an image (seg is even)."""
    cin, cout = packed["cin"], packed["cout"]
    L = W * cin
    # one input 128-block (128/cin w) -> (128/cin)/2 w' -> that many * cout
    assert ((128 // cin) // 2 * cout) % 128 == 0, (cin, cout)

    xp = x.reshape(H // 2, 2 * L)
    r0 = xp[:, :L]                       # rows 2h'
    r1 = xp[:, L:]                       # rows 2h'+1
    zeros = jnp.zeros((1, L), x.dtype)
    rm1 = jnp.concatenate([zeros, r1[:-1]], axis=0)  # rows 2h'-1
    if seg:
        hseg = seg // 2
        assert (hseg & (hseg - 1)) == 0, seg
        hp = jax.lax.broadcasted_iota(jnp.int32, rm1.shape, 0)
        rm1 = jnp.where(jax.lax.bitwise_and(hp, hseg - 1) == 0,
                        jnp.zeros((), rm1.dtype), rm1)

    acc = None
    for t, rows in zip(packed["rows"], (rm1, r0, r1)):
        term = _apply_lane_maps(rows, t, 1, interpret)
        acc = term if acc is None else acc + term

    # maxpool 2x2: max over row pair then over w pair (lane shift by cin);
    # bf16 maxes are exact on bf16 inputs, so no f32 round-trip
    p = jnp.maximum(r0, r1)
    p_sh = roll_lanes(p, L - cin, interpret)
    lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p_sh = jnp.where(lane >= L - cin, jnp.zeros((), p.dtype), p_sh)
    p = jnp.maximum(p, p_sh)
    acc = acc + _apply_lane_maps(p, packed["pool"], 1, interpret)

    nrep = acc.shape[1] // packed["mul"].shape[1]
    out = jnp.maximum(acc * jnp.tile(packed["mul"], (1, nrep))
                      + jnp.tile(packed["add"], (1, nrep)), 0.0)
    return out.astype(x.dtype)  # (H/2, (W/2)*cout)


# ----------------------------------------------------------------------
# UpsamplerBlock (ConvTranspose 3x3/s2/p1/op1 + BN + relu)
# ----------------------------------------------------------------------

def pack_upsampler(params: Dict, stats: Dict, cin: int, cout: int,
                   eps: float = 1e-3) -> Dict:
    """ConvTranspose2d(3, s=2, p=1, op=1) + BN + relu as lane maps.

    flax ConvTranspose with the torch-equivalent padding ((1,2),(1,2))
    (UpsamplerBlock in models/erfnet.py; verified by impulse response):
    out[y] += x[h] K[kh] with y = 2h + 1 - kh, so
      i=0: x[h'] K[1];   i=1: x[h'] K[0] + x[h'+1] K[2]
    (identically in W). Column phases are FOLDED into the lane map (output
    treated as 2*cout channels per input w), so no lane interleave is needed
    afterwards; row phases are computed as two planes and interleaved by a
    sublane stack+reshape."""
    kern = np.asarray(params["conv"]["kernel"], np.float32)  # (3,3,cin,cout)
    bias = np.asarray(params["conv"]["bias"], np.float32)

    def taps(i):
        # (kernel index, input offset) per output phase
        return [(1, 0)] if i == 0 else [(0, 0), (2, +1)]

    g_in = 128 // cin if cin <= 128 else 1
    r_in = 1
    while (g_in * r_in * 2 * cout) % 128:
        r_in *= 2
    n_out = g_in * r_in

    out = {"cin": cin, "cout": cout, "r_in": r_in}
    for i in (0, 1):
        for kh, dh in taps(i):
            def contribs(w_out, kh=kh):
                for j in (0, 1):
                    for (kw, dw) in taps(j):
                        w_in = w_out + dw
                        for ci in range(cin):
                            for co in range(cout):
                                yield (w_in, ci, j * cout + co,
                                       kern[kh, kw, ci, co])
            m = _lane_maps(contribs, cin, 2 * cout, n_out, r_in)
            out[(i, dh)] = {k: jnp.asarray(v, jnp.bfloat16)
                            for k, v in m.items()}
    mul, add = fold_bn(params["bn"], stats["bn"], eps)
    reps = max(1, 128 // cout)
    out["mul"] = jnp.asarray(np.tile(mul, reps)[None, :128], jnp.float32)
    out["add"] = jnp.asarray(np.tile(add + bias * mul, reps)[None, :128],
                             jnp.float32)
    return out


def body_upsampler(x, packed, *, H, W, interpret, seg: int = 0):
    """x: (H, W*cin) -> (2H, 2W*cout) ConvT 3x3/s2 + BN + relu.

    `seg` > 0 (NB1D_STACK): only the row-(h+1) tap can cross an image
    junction (at the last row of each image) — masked. The row-phase
    interleave pairs output rows of the SAME input row, junction-safe."""
    cin, cout, r_in = packed["cin"], packed["cout"], packed["r_in"]
    zeros = jnp.zeros((1, W * cin), x.dtype)
    x_next = jnp.concatenate([x[1:], zeros], axis=0)  # row h+1
    if seg:
        assert (seg & (seg - 1)) == 0, seg
        row = jax.lax.broadcasted_iota(jnp.int32, x_next.shape, 0)
        x_next = jnp.where(jax.lax.bitwise_and(row, seg - 1) == seg - 1,
                           jnp.zeros((), x_next.dtype), x_next)

    phases = []
    for i in (0, 1):
        acc = None
        for dh, rows in ((0, x), (+1, x_next)):
            if (i, dh) not in packed:
                continue
            term = _apply_lane_maps(rows, packed[(i, dh)], r_in, interpret)
            acc = term if acc is None else acc + term
        nrep = acc.shape[1] // 128
        row = jnp.maximum(acc * jnp.tile(packed["mul"], (1, nrep))
                          + jnp.tile(packed["add"], (1, nrep)), 0.0)
        phases.append(row.astype(x.dtype))
    return jnp.stack(phases, axis=1).reshape(2 * H, 2 * W * cout)


# ----------------------------------------------------------------------
# Output head: ConvTranspose 2x2/s2 VALID (cin -> nclasses)
# ----------------------------------------------------------------------

def pack_head(params: Dict, cin: int, cout: int) -> Dict:
    """out[2h+i, 2w+j, co] = x[h, w] @ K[i, j] + bias — column phases folded
    into the lane map, one map per row phase."""
    kern = np.asarray(params["kernel"], np.float32)  # (2,2,cin,cout)
    bias = np.asarray(params["bias"], np.float32)
    g_in = 128 // cin
    r_in = 1
    while (g_in * r_in * 2 * cout) % 128:
        r_in *= 2
    n_out = g_in * r_in
    out = {"cin": cin, "cout": cout, "r_in": r_in}
    for i in (0, 1):
        def contribs(w_out, i=i):
            for j in (0, 1):
                for ci in range(cin):
                    for co in range(cout):
                        # flax ConvTranspose: spatially flipped kernel
                        yield (w_out, ci, j * cout + co,
                               kern[1 - i, 1 - j, ci, co])
        m = _lane_maps(contribs, cin, 2 * cout, n_out, r_in)
        out[i] = {k: jnp.asarray(v, jnp.bfloat16) for k, v in m.items()}
    reps = max(1, 128 // cout + 1)
    out["bias"] = jnp.asarray(np.tile(bias, reps)[None, :128], jnp.float32)
    return out


def body_head(x, packed, *, H, W, interpret):
    """x: (H, W*cin) -> (2H, 2W*cout) f32 logits."""
    cin, cout, r_in = packed["cin"], packed["cout"], packed["r_in"]
    rows = []
    for i in (0, 1):
        t = _apply_lane_maps(x, packed[i], r_in, interpret)
        nrep = t.shape[1] // 128
        rows.append(t + jnp.tile(packed["bias"], (1, nrep)))
    return jnp.stack(rows, axis=1).reshape(2 * H, 2 * W * cout)

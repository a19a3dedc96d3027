"""Fused NB1D half-block kernels — the training-throughput path.

Profiling the per-conv Pallas training graph (ops/pallas_packed_conv.py)
showed the step is no longer conv-FLOP bound: at bs32 a 57 ms step spent
~25 ms in ~500 XLA glue fusions and ~2600 DMAs between 10 pallas_calls per
NB block (4 convs fwd + 2 moments + 4 merged bwd). These kernels collapse
each NonBottleneck1D block (ERFNet.py:25-60) to FOUR pallas_calls:

  half A  (fwd): y1 = relu(conv3x1(x) + b);  y2 = conv1x3(y1) + b;
                 BatchNorm moments of y2 — one kernel, x read once.
  half B  (fwd): z = relu(y2*mul + add)   [the BN1 normalize, fused as a
                 prologue];  y3 = relu(conv3x1_d(z) + b);
                 y4 = conv1x3_d(y3) + b;  moments of y4.
  half A/B (bwd): the full transposed chain in one pass each, with the
                 moments cotangent folded in (ds1 + 2*y*ds2) and, for B,
                 the prologue gradient (dmul, dadd) emitted per lane.

Between A and B only the per-channel statistics math runs in XLA ((C,)
vectors); after B, the residual + dropout + relu epilogue remains one XLA
fusion (packed_graph.nb1d_packed).

Numerics are bit-identical to the per-conv path: bf16 operands into the
MXU, f32 tap accumulation, bf16 inter-conv activations, f32 moments
(verified by tests/test_packed_graph.py which compares against the pure-jnp
formulation and torch).

Reference anchor: the training loop this accelerates
(Birds_Eye_View_Loss/main.py:171-357)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanedetection_end2end_tpu.ops.pallas_nb1d import roll_lanes
from lanedetection_end2end_tpu.ops.pallas_packed_conv import (
    _const_spec, _plane_spec, _resolve, _shift_plane)


def _conv(t, k_ref, shifts, axis, interpret):
    """sum_t T_{s_t}(t) @ k[t]; f32 accumulation. t: (H, L)."""
    k = k_ref[:].astype(t.dtype)
    acc = None
    for i, s in enumerate(shifts):
        z = _shift_plane(t, s, axis, interpret)
        term = jnp.dot(z.reshape(-1, 128), k[i],
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc  # (H*L/128, 128) f32


def _conv_t(dz, k_ref, shifts, axis, interpret):
    """Transposed conv: sum_t T_{-s_t}(dz @ k[t]^T)."""
    H, L = dz.shape
    k = k_ref[:].astype(dz.dtype)
    acc = None
    for i, s in enumerate(shifts):
        z = _shift_plane(dz, -s, axis, interpret)
        term = jnp.dot(z.reshape(-1, 128), k[i].T,
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _wgrad(t, dz2, shifts, axis, interpret):
    """dk[i] = T_{s_i}(t)^T @ dz; t plane, dz2 (H*L/128, 128)."""
    parts = []
    for s in shifts:
        z = _shift_plane(t, s, axis, interpret)
        parts.append(jax.lax.dot_general(
            z.reshape(-1, 128), dz2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.stack(parts)  # (3, 128, 128)


# ----------------------------------------------------------------------
# Banded W-conv (2 matmuls instead of 3, serving's _tri_taps form)
# ----------------------------------------------------------------------
# When 2*s <= 128 (s = d*C, so every C<=64 block at its dilation), a
# 128-lane block holds G = 128/C w-positions and the in-block taps fold
# into ONE banded matrix M_main; the 2s lanes crossing block boundaries
# ride a single combined edge plane mixed by M_edge
# (ops/pallas_nb1d.py::_tri_taps — measured win in the serving engine).
# The kernels dispatch on kw.shape[0]: 3 = direct block-diag taps,
# 2 = [M_main, M_edge] banded (built differentiably by
# packed_graph.banded_w_mats, so tap gradients flow via XLA outside).
# Matmul counts per W-conv: fwd 3->2, input-grad 3->2, weight-grad 3->2.

def _edge_plane(t, s, interpret):
    """Combined neighbor plane: first s lanes of each 128-block carry the
    left neighbor's last word(s) (tap -s), last s lanes the right
    neighbor's first (tap +s); outer image edges zero-filled."""
    H, L = t.shape
    er = roll_lanes(t, s, interpret)
    el = roll_lanes(t, L - s, interpret)
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    word = jax.lax.bitwise_and(lane, 127)
    zero = jnp.zeros((), t.dtype)
    edge = jnp.where(word < s, er, jnp.where(word >= 128 - s, el, zero))
    return jnp.where(jnp.logical_or(lane < s, lane >= L - s), zero, edge)


def _conv_w(t, k_ref, s, interpret):
    """W-conv (lane shift s): direct 3-tap or banded 2-matmul form."""
    if k_ref.shape[0] == 3:
        return _conv(t, k_ref, (-s, 0, s), "w", interpret)
    k = k_ref[:].astype(t.dtype)
    main = jnp.dot(t.reshape(-1, 128), k[0],
                   preferred_element_type=jnp.float32)
    edge = _edge_plane(t, s, interpret)
    return main + jnp.dot(edge.reshape(-1, 128), k[1],
                          preferred_element_type=jnp.float32)


def _conv_w_t(dy, k_ref, s, interpret):
    """Input gradient of _conv_w; dy (H, L) plane."""
    if k_ref.shape[0] == 3:
        return _conv_t(dy, k_ref, (-s, 0, s), "w", interpret)
    H, L = dy.shape
    k = k_ref[:].astype(dy.dtype)
    dx = jnp.dot(dy.reshape(-1, 128), k[0].T,
                 preferred_element_type=jnp.float32)
    # f32 throughout: pltpu.roll is 32-bit native, no bf16 rounding added
    de = jnp.dot(dy.reshape(-1, 128), k[1].T,
                 preferred_element_type=jnp.float32).reshape(H, L)
    # adjoint of _edge_plane: route the masked de components back to their
    # source lanes (edge[l] = t[l-s] for word<s, t[l+s] for word>=128-s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    word = jax.lax.bitwise_and(lane, 127)
    zero = jnp.zeros((), de.dtype)
    inb = jnp.logical_and(lane >= s, lane < L - s)
    de_l = jnp.where(jnp.logical_and(word < s, inb), de, zero)
    de_r = jnp.where(jnp.logical_and(word >= 128 - s, inb), de, zero)
    back = (roll_lanes(de_l, L - s, interpret)
            + roll_lanes(de_r, s, interpret))
    return dx + back.reshape(-1, 128)


def _wgrad_w(t, dz2, s, n_taps, interpret):
    """Weight gradient of _conv_w: (3,...) direct taps or (2,...)
    [dM_main, dM_edge] (t^T @ dz and edge(t)^T @ dz)."""
    if n_taps == 3:
        return _wgrad(t, dz2, (-s, 0, s), "w", interpret)
    dot_t = lambda a: jax.lax.dot_general(
        a.reshape(-1, 128), dz2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.stack([dot_t(t), dot_t(_edge_plane(t, s, interpret))])


def _moments(y, sel_ref):
    """(2, 128) [sel^T colsum(y); sel^T colsum(y^2)] — BN batch moments."""
    yf = y.astype(jnp.float32).reshape(-1, 128)
    s1 = jnp.sum(yf, axis=0, keepdims=True)
    s2 = jnp.sum(yf * yf, axis=0, keepdims=True)
    sel = sel_ref[:]
    return jnp.concatenate(
        [jnp.dot(s1, sel, preferred_element_type=jnp.float32),
         jnp.dot(s2, sel, preferred_element_type=jnp.float32)], axis=0)


def _dmom_rows(dmom_ref, sel_ref):
    """Per-lane (ds1, ds2) rows from the (2, 128) moments cotangent."""
    selT = sel_ref[:].T
    d = dmom_ref[:]
    ds1 = jnp.dot(d[0:1], selT, preferred_element_type=jnp.float32)
    ds2 = jnp.dot(d[1:2], selT, preferred_element_type=jnp.float32)
    return ds1, ds2  # (1, 128) each


def _relu_mask(y, dtype):
    # Mosaic can't compare 16-bit values; compare in f32, multiply
    return (y.astype(jnp.float32) > 0.0).astype(dtype)


def _accum(ref, value, first):
    @pl.when(first)
    def _init():
        ref[...] = value

    @pl.when(jnp.logical_not(first))
    def _acc():
        ref[...] += value


# ----------------------------------------------------------------------
# Half A: conv3x1 + relu + conv1x3 + moments
# ----------------------------------------------------------------------
# One image per grid step. Multi-image grid steps (the former PACKED_PAIR
# knob) were a measured dead end (r04): Mosaic does not interleave the
# unrolled per-image chains — PAIR=2 was throughput-neutral-to-negative and
# PAIR=4 SIGKILLed the compile helper.

def _half_a_fwd_kernel(x_ref, kh_ref, bh_ref, kw_ref, bw_ref, sel_ref,
                       y2_ref, y1_ref, mom_ref, *, sw, interpret):
    x = x_ref[0]
    H, L = x.shape
    a = _conv(x, kh_ref, (-1, 0, 1), "h", interpret)
    y1 = jnp.maximum(a + bh_ref[:].astype(jnp.float32), 0.0
                     ).astype(x.dtype).reshape(H, L)
    b = _conv_w(y1, kw_ref, sw, interpret)
    y2 = (b + bw_ref[:].astype(jnp.float32)).astype(x.dtype).reshape(H, L)
    y1_ref[0] = y1
    y2_ref[0] = y2
    _accum(mom_ref, _moments(y2, sel_ref), pl.program_id(0) == 0)


def _half_a_bwd_kernel(x_ref, y1_ref, y2_ref, dy2_ref, dmom_ref,
                       kh_ref, kw_ref, sel_ref,
                       dx_ref, dkh_ref, dbh_ref, dkw_ref, dbw_ref, *,
                       sw, interpret):
    first = pl.program_id(0) == 0
    ds1, ds2 = _dmom_rows(dmom_ref, sel_ref)  # (1, 128) lane rows
    x = x_ref[0]
    y1 = y1_ref[0]
    y2 = y2_ref[0]
    H, L = x.shape
    dy2v = (dy2_ref[0].astype(jnp.float32).reshape(-1, 128) + ds1
            + 2.0 * y2.astype(jnp.float32).reshape(-1, 128) * ds2)
    dy2 = dy2v.astype(x.dtype).reshape(H, L)
    dz2 = dy2.reshape(-1, 128)
    dbw = jnp.sum(dy2v, axis=0, keepdims=True)
    dkw = _wgrad_w(y1, dz2, sw, kw_ref.shape[0], interpret)
    dy1 = _conv_w_t(dy2, kw_ref, sw, interpret)
    dy1f = dy1 * _relu_mask(y1, jnp.float32).reshape(-1, 128)
    dy1 = dy1f.astype(x.dtype).reshape(H, L)
    dbh = jnp.sum(dy1f, axis=0, keepdims=True)
    dkh = _wgrad(x, dy1.reshape(-1, 128), (-1, 0, 1), "h", interpret)
    dx = _conv_t(dy1, kh_ref, (-1, 0, 1), "h", interpret)
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(H, L)
    _accum(dbw_ref, dbw, first)
    _accum(dkw_ref, dkw, first)
    _accum(dbh_ref, dbh, first)
    _accum(dkh_ref, dkh, first)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def nb_half_a(x, kh, bh, kw, bw, sw: int, interpret: bool | None = None):
    """First NB1D half: relu(conv3x1(x)+bh) -> conv1x3(.)+bw, + BN moments.

    Args:
      x: (B, H, L) bf16 lane-packed plane.
      kh: (3, 128, 128) f32 block-diagonal channel mixers.
      kw: (3, 128, 128) direct taps, or (2, 128, 128) banded
        [M_main, M_edge] (packed_graph.banded_w_mats) when 2*sw <= 128 —
        the kernels dispatch on the leading dim.
      bh/bw: (1, 128) f32 lane-tiled biases.
      sw: conv1x3 lane shift (= C; dilation 1 in the first half).
    Returns: (y2 (B, H, L), mom (2, 128) f32 — sel-selected [sum; sum^2]).
    """
    y2, _, mom = _half_a_call(x, kh, bh, kw, bw, sw, _resolve(interpret))
    return y2, mom


def _pspec(H, L):
    return pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _half_a_call(x, kh, bh, kw, bw, sw, interpret):
    B, H, L = x.shape
    sel = _sel128(sw_to_C(sw, 1))
    return pl.pallas_call(
        functools.partial(_half_a_fwd_kernel, sw=sw, interpret=interpret),
        grid=(B,),
        in_specs=[_pspec(H, L), _const_spec((3, 128, 128)),
                  _const_spec((1, 128)), _const_spec(kw.shape),
                  _const_spec((1, 128)), _const_spec((128, 128))],
        out_specs=[_pspec(H, L), _pspec(H, L),
                   _const_spec((2, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), x.dtype),
                   jax.ShapeDtypeStruct((B, H, L), x.dtype),
                   jax.ShapeDtypeStruct((2, 128), jnp.float32)],
        interpret=interpret,
    )(x, kh, bh, kw, bw, sel)


def _half_a_fwd(x, kh, bh, kw, bw, sw, interpret):
    interpret = _resolve(interpret)
    y2, y1, mom = _half_a_call(x, kh, bh, kw, bw, sw, interpret)
    return (y2, mom), (x, y1, y2, kh, kw)


def _half_a_bwd(sw, interpret, res, cot):
    x, y1, y2, kh, kw = res
    dy2, dmom = cot
    interpret = _resolve(interpret)
    B, H, L = x.shape
    sel = _sel128(sw_to_C(sw, 1))
    dx, dkh, dbh, dkw, dbw = pl.pallas_call(
        functools.partial(_half_a_bwd_kernel, sw=sw, interpret=interpret),
        grid=(B,),
        in_specs=[_pspec(H, L)] * 4
        + [_const_spec((2, 128)), _const_spec((3, 128, 128)),
           _const_spec(kw.shape), _const_spec((128, 128))],
        out_specs=[_pspec(H, L), _const_spec((3, 128, 128)),
                   _const_spec((1, 128)), _const_spec(kw.shape),
                   _const_spec((1, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), x.dtype),
                   jax.ShapeDtypeStruct((3, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct(kw.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        interpret=interpret,
    )(x, y1, y2, dy2.astype(x.dtype), dmom.astype(jnp.float32), kh, kw, sel)
    return dx, dkh, dbh, dkw, dbw


nb_half_a.defvjp(_half_a_fwd, _half_a_bwd)


# ----------------------------------------------------------------------
# Half B: BN-normalize prologue + relu + conv3x1_d + relu + conv1x3_d
#         + moments
# ----------------------------------------------------------------------

def _half_b_fwd_kernel(y2_ref, mul_ref, add_ref, kh_ref, bh_ref, kw_ref,
                       bw_ref, sel_ref, y4_ref, y3_ref, mom_ref, *,
                       sh, sw, interpret):
    y2 = y2_ref[0]
    H, L = y2.shape
    z = jnp.maximum(
        y2.astype(jnp.float32).reshape(-1, 128) * mul_ref[:]
        + add_ref[:], 0.0).astype(y2.dtype).reshape(H, L)
    a = _conv(z, kh_ref, (-sh, 0, sh), "h", interpret)
    y3 = jnp.maximum(a + bh_ref[:].astype(jnp.float32), 0.0
                     ).astype(y2.dtype).reshape(H, L)
    b = _conv_w(y3, kw_ref, sw, interpret)
    y4 = (b + bw_ref[:].astype(jnp.float32)).astype(y2.dtype).reshape(H, L)
    y3_ref[0] = y3
    y4_ref[0] = y4
    _accum(mom_ref, _moments(y4, sel_ref), pl.program_id(0) == 0)


def _half_b_bwd_kernel(y2_ref, mul_ref, add_ref, y3_ref, y4_ref, dy4_ref,
                       dmom_ref, kh_ref, kw_ref, sel_ref,
                       dy2_ref, dkh_ref, dbh_ref, dkw_ref, dbw_ref,
                       dmul_ref, dadd_ref, *, sh, sw, interpret):
    first = pl.program_id(0) == 0
    ds1, ds2 = _dmom_rows(dmom_ref, sel_ref)
    y2 = y2_ref[0]
    y3 = y3_ref[0]
    y4 = y4_ref[0]
    H, L = y2.shape
    # recompute the prologue (cheaper than a third stashed plane)
    y2v = y2.astype(jnp.float32).reshape(-1, 128)
    zf = y2v * mul_ref[:] + add_ref[:]
    zmask = (zf > 0.0).astype(jnp.float32)
    z = jnp.maximum(zf, 0.0).astype(y2.dtype).reshape(H, L)

    dy4v = (dy4_ref[0].astype(jnp.float32).reshape(-1, 128) + ds1
            + 2.0 * y4.astype(jnp.float32).reshape(-1, 128) * ds2)
    dy4 = dy4v.astype(y2.dtype).reshape(H, L)
    dbw = jnp.sum(dy4v, axis=0, keepdims=True)
    dkw = _wgrad_w(y3, dy4.reshape(-1, 128), sw, kw_ref.shape[0], interpret)
    dy3 = _conv_w_t(dy4, kw_ref, sw, interpret)
    dy3f = dy3 * _relu_mask(y3, jnp.float32).reshape(-1, 128)
    dy3 = dy3f.astype(y2.dtype).reshape(H, L)
    dbh = jnp.sum(dy3f, axis=0, keepdims=True)
    dkh = _wgrad(z, dy3.reshape(-1, 128), (-sh, 0, sh), "h", interpret)
    dz = _conv_t(dy3, kh_ref, (-sh, 0, sh), "h", interpret)  # (-1, 128)
    dz = dz * zmask
    dmul = jnp.sum(dz * y2v, axis=0, keepdims=True)
    dadd = jnp.sum(dz, axis=0, keepdims=True)
    dy2_ref[0] = (dz * mul_ref[:]).astype(dy2_ref.dtype).reshape(H, L)
    _accum(dbw_ref, dbw, first)
    _accum(dkw_ref, dkw, first)
    _accum(dbh_ref, dbh, first)
    _accum(dkh_ref, dkh, first)
    _accum(dmul_ref, dmul, first)
    _accum(dadd_ref, dadd, first)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def nb_half_b(y2, mul, add, kh, bh, kw, bw, sh: int, sw: int,
              interpret: bool | None = None):
    """Second NB1D half with the BN1 normalize+relu fused as a prologue.

    Args:
      y2: (B, H, L) output of nb_half_a.
      mul/add: (1, 128) f32 lane-tiled BN scale/shift (from the moments).
      kh/kw, bh/bw: dilated conv mixers/biases; kw may be the (2, 128, 128)
        banded form when 2*sw <= 128 (see nb_half_a).
      sh: conv3x1 row shift (= dilation d); sw: conv1x3 lane shift (= d*C).
    Returns: (y4 (B, H, L), mom (2, 128)).
    """
    y4, _, mom = _half_b_call(y2, mul, add, kh, bh, kw, bw, sh, sw,
                              _resolve(interpret))
    return y4, mom


def _half_b_call(y2, mul, add, kh, bh, kw, bw, sh, sw, interpret):
    B, H, L = y2.shape
    sel = _sel128(sw_to_C(sw, sh))
    return pl.pallas_call(
        functools.partial(_half_b_fwd_kernel, sh=sh, sw=sw,
                          interpret=interpret),
        grid=(B,),
        in_specs=[_pspec(H, L), _const_spec((1, 128)),
                  _const_spec((1, 128)), _const_spec((3, 128, 128)),
                  _const_spec((1, 128)), _const_spec(kw.shape),
                  _const_spec((1, 128)), _const_spec((128, 128))],
        out_specs=[_pspec(H, L), _pspec(H, L),
                   _const_spec((2, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), y2.dtype),
                   jax.ShapeDtypeStruct((B, H, L), y2.dtype),
                   jax.ShapeDtypeStruct((2, 128), jnp.float32)],
        interpret=interpret,
    )(y2, mul, add, kh, bh, kw, bw, sel)


def _half_b_fwd(y2, mul, add, kh, bh, kw, bw, sh, sw, interpret):
    interpret = _resolve(interpret)
    y4, y3, mom = _half_b_call(y2, mul, add, kh, bh, kw, bw, sh, sw,
                               interpret)
    return (y4, mom), (y2, mul, add, y3, y4, kh, kw)


def _half_b_bwd(sh, sw, interpret, res, cot):
    y2, mul, add, y3, y4, kh, kw = res
    dy4, dmom = cot
    interpret = _resolve(interpret)
    B, H, L = y2.shape
    sel = _sel128(sw_to_C(sw, sh))
    dy2, dkh, dbh, dkw, dbw, dmul, dadd = pl.pallas_call(
        functools.partial(_half_b_bwd_kernel, sh=sh, sw=sw,
                          interpret=interpret),
        grid=(B,),
        in_specs=[_pspec(H, L), _const_spec((1, 128)),
                  _const_spec((1, 128))]
        + [_pspec(H, L)] * 3
        + [_const_spec((2, 128)), _const_spec((3, 128, 128)),
           _const_spec(kw.shape), _const_spec((128, 128))],
        out_specs=[_pspec(H, L), _const_spec((3, 128, 128)),
                   _const_spec((1, 128)), _const_spec(kw.shape),
                   _const_spec((1, 128)), _const_spec((1, 128)),
                   _const_spec((1, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), y2.dtype),
                   jax.ShapeDtypeStruct((3, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct(kw.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        interpret=interpret,
    )(y2, mul, add, y3, y4, dy4.astype(y2.dtype),
      dmom.astype(jnp.float32), kh, kw, sel)
    return dy2, dmul, dadd, dkh, dbh, dkw, dbw


nb_half_b.defvjp(_half_b_fwd, _half_b_bwd)


# ----------------------------------------------------------------------
# Small host helpers
# ----------------------------------------------------------------------

def sw_to_C(sw: int, sh: int) -> int:
    """Channel count from the lane shift: sw = d*C and sh = d (h-dilation),
    so C = sw // max(sh, 1). Half A passes sh=1 (dilation 1)."""
    return sw // max(sh, 1)


@functools.lru_cache(maxsize=None)
def _sel128_np(C: int):
    import numpy as np
    sel = np.zeros((128, 128), np.float32)
    for lane in range(128):
        sel[lane, lane % C] = 1.0
    return sel


def _sel128(C: int):
    return jnp.asarray(_sel128_np(C))

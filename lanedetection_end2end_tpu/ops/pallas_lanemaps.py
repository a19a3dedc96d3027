"""Pallas lane-map kernels: ConvTranspose upsampler / output head on packed
planes — the training graph's relayout killers.

The packed training graph's up-sampling ops (ops/packed_graph.py
upsampler_packed / head_packed, the twins of ERFNet's UpsamplerBlock and
output ConvTranspose, ERFNet.py:98-106,124) compute two output ROW PHASES
with lane-map matmuls and then interleave them:

    stack([p0, p1], axis=2).reshape(B, 2H, L2)

Profiled on v5e, that interleave is the single most expensive XLA op of the
packed train step (a full-plane HBM relayout, ~2.8 ms f32 at bs16, plus its
mirror image in the backward pass), and every shifted lane view feeding the
matmuls is another full-plane HBM copy. This kernel runs the whole op per
image in VMEM:

    read x once ->  shifted views (sublane slices / lane rolls)
                ->  one matmul per (row-phase, row-shift, lane-shift) map
                ->  + bias, row interleave, BatchNorm batch moments
                ->  write y once

The (in_lanes, 128) lane-map matrices are built OUTSIDE the kernel by
ops/packed_graph._build_maps (a COO scatter of the learnable conv kernel),
so `jax.grad` flows into the conv weights through the scatter for free; the
custom_vjp here only supplies d(x, maps, bias).

Numerics are bit-comparable to the jnp formulation: bf16 operands into the
MXU, f32 accumulation, bf16 plane between map ops, f32 moments.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from lanedetection_end2end_tpu.ops.pallas_nb_block import (
    _accum, _dmom_rows, _moments, _sel128)
from lanedetection_end2end_tpu.ops.pallas_packed_conv import (
    _const_spec, _plane_spec, _resolve, _shift_plane)

# plan: static tuple of (row_phase i, input row shift dh, lane-block shift)
Plan = Tuple[Tuple[int, int, int], ...]


def _shifted(x, dh: int, wsh: int, in_lanes: int, interpret: bool):
    t = x
    if dh:
        t = _shift_plane(t, dh, "h", interpret)
    if wsh:
        t = _shift_plane(t, wsh * in_lanes, "w", interpret)
    return t


def _phase_planes(x, m_refs, btile_ref, plan: Plan, in_lanes: int,
                  n_phase: int, interpret: bool):
    """Apply every lane map; returns one (H*L/in_lanes*?, 128) f32 block per
    row phase, bias added."""
    acc = [None] * n_phase
    for (i, dh, wsh), m_ref in zip(plan, m_refs):
        t = _shifted(x, dh, wsh, in_lanes, interpret)
        term = jnp.dot(t.reshape(-1, in_lanes),
                       m_ref[:].astype(t.dtype),
                       preferred_element_type=jnp.float32)
        acc[i] = term if acc[i] is None else acc[i] + term
    b = btile_ref[:].astype(jnp.float32)
    return [a + b for a in acc]


def _interleave(ps, H: int, L2: int, dtype):
    """Row phases -> (n*H, L2): output row n*h + i comes from phase i."""
    n = len(ps)
    if n == 1:
        return ps[0].astype(dtype).reshape(H, L2)
    stacked = jnp.concatenate(
        [p.astype(dtype).reshape(H, 1, L2) for p in ps], axis=1)
    return stacked.reshape(n * H, L2)


def _fwd_kernel(x_ref, *refs, y_ref, mom_ref, plan, in_lanes, n_phase,
                L2, want_mom, interpret):
    m_refs, btile_ref, sel_ref = refs[:-2], refs[-2], refs[-1]
    x = x_ref[0]
    H = x.shape[0]
    ps = _phase_planes(x, m_refs, btile_ref, plan, in_lanes, n_phase,
                       interpret)
    y = _interleave(ps, H, L2, y_ref.dtype)
    y_ref[0] = y
    if want_mom:
        _accum(mom_ref, _moments(y, sel_ref), pl.program_id(0) == 0)
    else:
        @pl.when(pl.program_id(0) == 0)
        def _zero():
            mom_ref[...] = jnp.zeros_like(mom_ref)


def _bwd_kernel(x_ref, y_ref, dy_ref, dmom_ref, *refs, dx_ref, dm_refs_out,
                db_ref, plan, in_lanes, n_phase, L2, want_mom, interpret):
    """One pass: fold the moments cotangent, de-interleave, emit
    dx / dM per map / db (lane bias grad)."""
    m_refs, sel_ref = refs[:-1], refs[-1]
    x = x_ref[0]
    H, L = x.shape
    first = pl.program_id(0) == 0

    dyv = dy_ref[0].astype(jnp.float32).reshape(-1, 128)
    if want_mom:
        ds1, ds2 = _dmom_rows(dmom_ref, sel_ref)
        y = y_ref[0]
        dyv = dyv + ds1 + 2.0 * y.astype(jnp.float32).reshape(-1, 128) * ds2
    _accum(db_ref, jnp.sum(dyv, axis=0, keepdims=True), first)

    # de-interleave: output row n*h + i belongs to phase i
    dyp = dyv.reshape(H, n_phase, L2)
    dps = [dyp[:, i].astype(x.dtype) for i in range(n_phase)]

    dx = None
    for (i, dh, wsh), m_ref, dm_ref in zip(plan, m_refs, dm_refs_out):
        dp2 = dps[i].reshape(-1, 128)
        t = _shifted(x, dh, wsh, in_lanes, interpret)
        dm = jax.lax.dot_general(
            t.reshape(-1, in_lanes), dp2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        _accum(dm_ref, dm, first)
        g = jnp.dot(dp2, m_ref[:].T.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        g = g.astype(x.dtype).reshape(H, L)
        g = _shifted(g, 0, -wsh, in_lanes, interpret)
        if dh:
            g = _shift_plane(g, -dh, "h", interpret)
        dx = g if dx is None else dx + g
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _call_fwd(x, maps, btile, plan, in_lanes, n_phase, C, out_dtype,
              want_mom, interpret):
    B, H, L = x.shape
    L2 = (L // in_lanes) * 128
    sel = _sel128(C)
    kern = functools.partial(
        _fwd_kernel, plan=plan, in_lanes=in_lanes, n_phase=n_phase, L2=L2,
        want_mom=want_mom, interpret=interpret)

    def body(x_ref, *refs):
        y_ref, mom_ref = refs[-2], refs[-1]
        kern(x_ref, *refs[:-2], y_ref=y_ref, mom_ref=mom_ref)

    y, mom = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H, L)]
        + [_const_spec((in_lanes, 128))] * len(maps)
        + [_const_spec((1, 128)), _const_spec((128, 128))],
        out_specs=[_plane_spec(n_phase * H, L2), _const_spec((2, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, n_phase * H, L2), out_dtype),
                   jax.ShapeDtypeStruct((2, 128), jnp.float32)],
        interpret=interpret,
    )(x, *maps, btile, sel)
    return y, mom


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def lane_maps_op(x, maps, btile, plan: Plan, in_lanes: int, n_phase: int,
                 C: int, out_dtype=jnp.bfloat16, want_mom: bool = True,
                 interpret: bool | None = None):
    """Fused lane-map op: y[b, n*h+i] = sum_maps T(x)[h] @ M + bias.

    Args:
      x: (B, H, L) packed plane.
      maps: list of (in_lanes, 128) f32 lane maps (packed_graph._build_maps
        output, one per plan entry).
      btile: (1, 128) f32 lane-tiled bias.
      plan: static ((row_phase, row_shift dh, lane_block_shift), ...) — one
        entry per map, row phases interleave into the output.
      in_lanes: map input width (128 * r_in).
      n_phase: number of output row phases (2 for s2 ConvTranspose).
      C: output channel count (lane % C) for the BN moment selection.
      want_mom: also return (2, 128) BatchNorm batch moments of y.
    Returns:
      (y (B, n_phase*H, (L/in_lanes)*128), mom (2, 128) f32).
    """
    y, mom = _call_fwd(x, list(maps), btile, plan, in_lanes, n_phase, C,
                       out_dtype, want_mom, _resolve(interpret))
    return y, mom


def _op_fwd(x, maps, btile, plan, in_lanes, n_phase, C, out_dtype, want_mom,
            interpret):
    interpret = _resolve(interpret)
    y, mom = _call_fwd(x, list(maps), btile, plan, in_lanes, n_phase, C,
                       out_dtype, want_mom, interpret)
    return (y, mom), (x, y, list(maps))


def _op_bwd(plan, in_lanes, n_phase, C, out_dtype, want_mom, interpret,
            res, cot):
    x, y, maps = res
    dy, dmom = cot
    interpret = _resolve(interpret)
    B, H, L = x.shape
    L2 = (L // in_lanes) * 128
    n_maps = len(maps)
    sel = _sel128(C)
    kern = functools.partial(
        _bwd_kernel, plan=plan, in_lanes=in_lanes, n_phase=n_phase, L2=L2,
        want_mom=want_mom, interpret=interpret)

    def body(x_ref, y_ref, dy_ref, dmom_ref, *refs):
        dx_ref = refs[n_maps + 1]
        dm_refs = refs[n_maps + 2: n_maps + 2 + n_maps]
        db_ref = refs[-1]
        kern(x_ref, y_ref, dy_ref, dmom_ref, *refs[:n_maps + 1],
             dx_ref=dx_ref, dm_refs_out=dm_refs, db_ref=db_ref)

    outs = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H, L), _plane_spec(n_phase * H, L2),
                  _plane_spec(n_phase * H, L2), _const_spec((2, 128))]
        + [_const_spec((in_lanes, 128))] * n_maps
        + [_const_spec((128, 128))],
        out_specs=[_plane_spec(H, L)]
        + [_const_spec((in_lanes, 128))] * n_maps
        + [_const_spec((1, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), x.dtype)]
        + [jax.ShapeDtypeStruct((in_lanes, 128), jnp.float32)] * n_maps
        + [jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        interpret=interpret,
    )(x, y, dy.astype(out_dtype),
      (dmom if dmom is not None else jnp.zeros((2, 128))).astype(jnp.float32),
      *maps, sel)
    dx, dmaps, db = outs[0], list(outs[1:1 + n_maps]), outs[-1]
    return dx, dmaps, db


lane_maps_op.defvjp(_op_fwd, _op_bwd)


# ----------------------------------------------------------------------
# DownsamplerBlock (conv3x3/s2 || maxpool2x2 concat, ERFNet.py:11-22)
# ----------------------------------------------------------------------

def _row_pair(x):
    """(H, L) -> even rows, odd rows ((H/2, L) each)."""
    H, L = x.shape
    xh = x.reshape(H // 2, 2, L)
    return xh[:, 0], xh[:, 1]


def _pool_chain(r0, r1, cin: int, interpret: bool):
    """maxpool 2x2 with the jnp where-chain's tie routing
    (packed_graph.upsampler/downsampler comment): row max then w max."""
    m1 = (r0.astype(jnp.float32) >= r1.astype(jnp.float32))
    p1 = jnp.where(m1, r0, r1)
    p1sh = _shift_plane(p1, cin, "w", interpret)
    m2 = (p1.astype(jnp.float32) >= p1sh.astype(jnp.float32))
    p = jnp.where(m2, p1, p1sh)
    return p, p1, p1sh, m1, m2


def _ds_fwd_kernel(x_ref, *refs, y_ref, mom_ref, plan, cin, out_lanes,
                   interpret):
    m_refs, pool_ref, btile_ref, sel_ref = (refs[:-3], refs[-3], refs[-2],
                                            refs[-1])
    x = x_ref[0]
    r0, r1 = _row_pair(x)
    rm1 = _shift_plane(r1, -1, "h", interpret)
    srcs = (rm1, r0, r1)
    acc = None
    for (s, wsh), m_ref in zip(plan, m_refs):
        t = _shifted(srcs[s], 0, wsh, 128, interpret)
        term = jnp.dot(t.reshape(-1, 128), m_ref[:].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    p, *_ = _pool_chain(r0, r1, cin, interpret)
    # pool matrix is a 0/1 selection: each output lane copies exactly one
    # input, so a bf16 matmul is exact (matches the jnp path's HIGHEST)
    acc = acc + jnp.dot(p.reshape(-1, 128), pool_ref[:].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    y = (acc + btile_ref[:].astype(jnp.float32)).astype(y_ref.dtype)
    H2 = x.shape[0] // 2
    y_ref[0] = y.reshape(H2, -1)
    _accum(mom_ref, _moments(y_ref[0], sel_ref), pl.program_id(0) == 0)


def _ds_bwd_kernel(x_ref, y_ref, dy_ref, dmom_ref, *refs, dx_ref,
                   dm_refs_out, db_ref, plan, cin, out_lanes, interpret):
    m_refs, pool_ref, sel_ref = refs[:-2], refs[-2], refs[-1]
    x = x_ref[0]
    H, L = x.shape
    H2 = H // 2
    first = pl.program_id(0) == 0
    r0, r1 = _row_pair(x)
    rm1 = _shift_plane(r1, -1, "h", interpret)
    srcs = (rm1, r0, r1)

    ds1, ds2 = _dmom_rows(dmom_ref, sel_ref)
    y = y_ref[0]
    dyv = (dy_ref[0].astype(jnp.float32).reshape(-1, 128) + ds1
           + 2.0 * y.astype(jnp.float32).reshape(-1, 128) * ds2)
    _accum(db_ref, jnp.sum(dyv.reshape(-1, out_lanes), axis=0,
                           keepdims=True), first)
    dz = dyv.astype(x.dtype).reshape(-1, out_lanes)

    dsrc = [None, None, None]
    for (s, wsh), m_ref, dm_ref in zip(plan, m_refs, dm_refs_out):
        t = _shifted(srcs[s], 0, wsh, 128, interpret)
        dm = jax.lax.dot_general(
            t.reshape(-1, 128), dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        _accum(dm_ref, dm, first)
        g = jnp.dot(dz, m_ref[:].T.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        g = g.astype(x.dtype).reshape(H2, L)
        g = _shifted(g, 0, -wsh, 128, interpret)
        dsrc[s] = g if dsrc[s] is None else dsrc[s] + g

    # pool gradient: select-and-scatter along the recomputed where-chain
    p, p1, p1sh, m1, m2 = _pool_chain(r0, r1, cin, interpret)
    gp = jnp.dot(dz, pool_ref[:].T.astype(x.dtype),
                 preferred_element_type=jnp.float32)
    gp = gp.astype(x.dtype).reshape(H2, L)
    mf2 = m2.astype(jnp.float32)
    g_p1 = (gp.astype(jnp.float32) * mf2).astype(x.dtype)
    g_sh = (gp.astype(jnp.float32) * (1.0 - mf2)).astype(x.dtype)
    g_p1 = g_p1 + _shift_plane(g_sh, -cin, "w", interpret)
    mf1 = m1.astype(jnp.float32)
    g0 = (g_p1.astype(jnp.float32) * mf1).astype(x.dtype)
    g1 = (g_p1.astype(jnp.float32) * (1.0 - mf1)).astype(x.dtype)

    dr0 = g0 if dsrc[1] is None else dsrc[1] + g0
    dr1 = g1 if dsrc[2] is None else dsrc[2] + g1
    if dsrc[0] is not None:  # rm1 = T_{-1,rows}(r1): transpose shifts back
        dr1 = dr1 + _shift_plane(dsrc[0], 1, "h", interpret)

    dx = jnp.concatenate([dr0.reshape(H2, 1, L), dr1.reshape(H2, 1, L)],
                         axis=1).reshape(H, L)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _ds_call_fwd(x, maps, pool, btile, plan, cin, cout, out_lanes,
                 interpret):
    B, H, L = x.shape
    Lout = (L // 128) * out_lanes
    sel = _sel128(cout)
    kern = functools.partial(_ds_fwd_kernel, plan=plan, cin=cin,
                             out_lanes=out_lanes, interpret=interpret)

    def body(x_ref, *refs):
        kern(x_ref, *refs[:-2], y_ref=refs[-2], mom_ref=refs[-1])

    return pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H, L)]
        + [_const_spec((128, out_lanes))] * (len(maps) + 1)
        + [_const_spec((1, out_lanes)), _const_spec((128, 128))],
        out_specs=[_plane_spec(H // 2, Lout), _const_spec((2, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H // 2, Lout), x.dtype),
                   jax.ShapeDtypeStruct((2, 128), jnp.float32)],
        interpret=interpret,
    )(x, *maps, pool, btile, sel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def downsampler_op(x, maps, pool, btile, plan, cin: int, cout: int,
                   out_lanes: int, interpret: bool | None = None):
    """Fused DownsamplerBlock core: strided conv lane maps + maxpool concat
    + bias + BN batch moments, one pallas_call per direction.

    Args:
      x: (B, H, L) packed plane (L = W*cin).
      maps: list of (128, out_lanes) f32 lane maps, one per plan entry.
      pool: (128, out_lanes) constant 0/1 pool-selection matrix (nondiff).
      btile: (1, out_lanes) f32 lane-tiled bias (conv channels; pooled
        channels zero).
      plan: static ((src, lane_block_shift), ...) with src 0=rm1, 1=r0,
        2=r1 (the three row taps of the s2 conv).
    Returns:
      (y (B, H/2, (L/128)*out_lanes) pre-BN, mom (2, 128) f32).
    """
    y, mom = _ds_call_fwd(x, list(maps), pool, btile, plan, cin, cout,
                          out_lanes, _resolve(interpret))
    return y, mom


def _ds_fwd(x, maps, pool, btile, plan, cin, cout, out_lanes, interpret):
    interpret = _resolve(interpret)
    y, mom = _ds_call_fwd(x, list(maps), pool, btile, plan, cin, cout,
                          out_lanes, interpret)
    return (y, mom), (x, y, list(maps), pool)


def _ds_bwd(plan, cin, cout, out_lanes, interpret, res, cot):
    x, y, maps, pool = res
    dy, dmom = cot
    interpret = _resolve(interpret)
    B, H, L = x.shape
    Lout = (L // 128) * out_lanes
    n_maps = len(maps)
    sel = _sel128(cout)
    kern = functools.partial(_ds_bwd_kernel, plan=plan, cin=cin,
                             out_lanes=out_lanes, interpret=interpret)

    def body(x_ref, y_ref, dy_ref, dmom_ref, *refs):
        dx_ref = refs[n_maps + 2]
        dm_refs = refs[n_maps + 3: n_maps + 3 + n_maps]
        db_ref = refs[-1]
        kern(x_ref, y_ref, dy_ref, dmom_ref, *refs[:n_maps + 2],
             dx_ref=dx_ref, dm_refs_out=dm_refs, db_ref=db_ref)

    outs = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H, L), _plane_spec(H // 2, Lout),
                  _plane_spec(H // 2, Lout), _const_spec((2, 128))]
        + [_const_spec((128, out_lanes))] * (n_maps + 1)
        + [_const_spec((128, 128))],
        out_specs=[_plane_spec(H, L)]
        + [_const_spec((128, out_lanes))] * n_maps
        + [_const_spec((1, out_lanes))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), x.dtype)]
        + [jax.ShapeDtypeStruct((128, out_lanes), jnp.float32)] * n_maps
        + [jax.ShapeDtypeStruct((1, out_lanes), jnp.float32)],
        interpret=interpret,
    )(x, y, dy.astype(x.dtype), dmom.astype(jnp.float32), *maps, pool, sel)
    dx, dmaps, db = outs[0], list(outs[1:1 + n_maps]), outs[-1]
    return dx, dmaps, None, db


downsampler_op.defvjp(_ds_fwd, _ds_bwd)


# ----------------------------------------------------------------------
# Output head + activation + row mask + WLS row sums, one kernel (e2e)
# ----------------------------------------------------------------------

def _hr_sums(w2, xs_row, sel_ref, red_ref, H):
    z = w2.reshape(-1, 128)
    p = jnp.dot(z, sel_ref[:], preferred_element_type=jnp.float32)
    s = jnp.dot(p.reshape(H, -1), red_ref[:],
                preferred_element_type=jnp.float32)
    zx = (w2 * xs_row).reshape(-1, 128)
    px = jnp.dot(zx, sel_ref[:], preferred_element_type=jnp.float32)
    sx = jnp.dot(px.reshape(H, -1), red_ref[:],
                 preferred_element_type=jnp.float32)
    return jnp.concatenate([s, sx], axis=1)  # (H, 256)


def _hr_fwd_kernel(x_ref, *refs, s_ref, plan, in_lanes, L2, zero_rows,
                   interpret):
    m_refs = refs[:-4]
    btile_ref, xs_ref, sel_ref, red_ref = refs[-4:]
    x = x_ref[0]
    H2 = x.shape[0]
    ps = _phase_planes(x, m_refs, btile_ref, plan, in_lanes, 2, interpret)
    dec = _interleave(ps, H2, L2, jnp.float32)  # (H, L2) f32 logits
    H = 2 * H2
    a = dec * dec
    w2 = a * a  # square activation: (dec^2)^2
    row = jax.lax.broadcasted_iota(jnp.int32, (H, L2), 0)
    w2 = jnp.where(row < zero_rows, 0.0, w2)
    s_ref[0] = _hr_sums(w2, xs_ref[:], sel_ref, red_ref, H)


def _hr_bwd_kernel(x_ref, ds_ref, *refs, dx_ref, dm_refs_out, db_ref, plan,
                   in_lanes, L2, zero_rows, interpret):
    m_refs = refs[:-4]
    btile_ref, xs_ref, sel_ref, red_ref = refs[-4:]
    x = x_ref[0]
    H2, L = x.shape
    H = 2 * H2
    first = pl.program_id(0) == 0

    # recompute dec (2 map matmuls — cheaper than stashing the f32 plane)
    ps = _phase_planes(x, m_refs, btile_ref, plan, in_lanes, 2, interpret)
    dec = _interleave(ps, H2, L2, jnp.float32)

    ds = ds_ref[0]  # (H, 256)
    gS0, gS1 = ds[:, :128], ds[:, 128:]
    # transpose of the two reduction matmuls
    g0 = jnp.dot(jnp.dot(gS0, red_ref[:].T,
                         preferred_element_type=jnp.float32
                         ).reshape(-1, 128), sel_ref[:].T,
                 preferred_element_type=jnp.float32).reshape(H, L2)
    g1 = jnp.dot(jnp.dot(gS1, red_ref[:].T,
                         preferred_element_type=jnp.float32
                         ).reshape(-1, 128), sel_ref[:].T,
                 preferred_element_type=jnp.float32).reshape(H, L2)
    dw2 = g0 + xs_ref[:] * g1
    row = jax.lax.broadcasted_iota(jnp.int32, (H, L2), 0)
    dw2 = jnp.where(row < zero_rows, 0.0, dw2)
    ddec = 4.0 * dec * dec * dec * dw2  # d((dec^2)^2) = 4 dec^3

    _accum(db_ref, jnp.sum(ddec.reshape(-1, 128), axis=0, keepdims=True),
           first)
    dps = [ddec.reshape(H2, 2, L2)[:, i].astype(x.dtype) for i in (0, 1)]
    dx = None
    for (i, dh, wsh), m_ref, dm_ref in zip(plan, m_refs, dm_refs_out):
        dp2 = dps[i].reshape(-1, 128)
        t = _shifted(x, dh, wsh, in_lanes, interpret)
        dm = jax.lax.dot_general(
            t.reshape(-1, in_lanes), dp2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        _accum(dm_ref, dm, first)
        g = jnp.dot(dp2, m_ref[:].T.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        g = g.astype(x.dtype).reshape(H2, L)
        g = _shifted(g, 0, -wsh, in_lanes, interpret)
        if dh:
            g = _shift_plane(g, -dh, "h", interpret)
        dx = g if dx is None else dx + g
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _hr_call_fwd(x, maps, btile, xs, sel, red, plan, in_lanes, zero_rows,
                 interpret):
    B, H2, L = x.shape
    L2 = (L // in_lanes) * 128
    H = 2 * H2
    kern = functools.partial(_hr_fwd_kernel, plan=plan, in_lanes=in_lanes,
                             L2=L2, zero_rows=zero_rows, interpret=interpret)

    def body(x_ref, *refs):
        kern(x_ref, *refs[:-1], s_ref=refs[-1])

    return pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H2, L)]
        + [_const_spec((in_lanes, 128))] * len(maps)
        + [_const_spec((1, 128)), _const_spec((1, L2)),
           _const_spec((128, 128)), _const_spec((L2, 128))],
        out_specs=[_plane_spec(H, 256)],
        out_shape=[jax.ShapeDtypeStruct((B, H, 256), jnp.float32)],
        interpret=interpret,
    )(x, *maps, btile, xs, sel, red)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def head_rowsums_op(x, maps, btile, xs, sel, red, plan, in_lanes: int,
                    zero_rows: int, interpret: bool | None = None):
    """Output ConvTranspose head + square activation + top-row mask + WLS
    row sums, fused: the full-resolution logits plane never reaches HBM.

    Only valid for activation='square' (the flagship config,
    LSQ_layer.py:51-52); callers fall back to head_packed + rowsums_packed
    otherwise.

    Args:
      x: (B, H/2, W/2*16) pre-head plane.
      maps/btile: head lane maps (plan as in lane_maps_op) and bias.
      xs: (1, W*C) lane-tiled normalized column coordinate.
      sel/red: the serving-path reduction constants
        (models/fused_graph.py pack_decoder): channel selection and
        per-row block reduction, both 0/1 — exact in f32 dots.
    Returns:
      S (B, H, 256) f32: lanes [0,C) = S0 rows, [128, 128+C) = S1 rows.
    """
    return _hr_call_fwd(x, list(maps), btile, xs, sel, red, plan, in_lanes,
                        zero_rows, _resolve(interpret))


def _hr_fwd(x, maps, btile, xs, sel, red, plan, in_lanes, zero_rows,
            interpret):
    s = _hr_call_fwd(x, list(maps), btile, xs, sel, red, plan, in_lanes,
                     zero_rows, _resolve(interpret))
    return s, (x, list(maps), btile, xs, sel, red)


def _hr_bwd(plan, in_lanes, zero_rows, interpret, res, ds):
    x, maps, btile, xs, sel, red = res
    interpret = _resolve(interpret)
    B, H2, L = x.shape
    L2 = (L // in_lanes) * 128
    H = 2 * H2
    n_maps = len(maps)
    kern = functools.partial(_hr_bwd_kernel, plan=plan, in_lanes=in_lanes,
                             L2=L2, zero_rows=zero_rows, interpret=interpret)

    def body(x_ref, ds_ref, *refs):
        dx_ref = refs[n_maps + 4]
        dm_refs = refs[n_maps + 5: n_maps + 5 + n_maps]
        db_ref = refs[-1]
        kern(x_ref, ds_ref, *refs[:n_maps + 4], dx_ref=dx_ref,
             dm_refs_out=dm_refs, db_ref=db_ref)

    outs = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[_plane_spec(H2, L), _plane_spec(H, 256)]
        + [_const_spec((in_lanes, 128))] * n_maps
        + [_const_spec((1, 128)), _const_spec((1, L2)),
           _const_spec((128, 128)), _const_spec((L2, 128))],
        out_specs=[_plane_spec(H2, L)]
        + [_const_spec((in_lanes, 128))] * n_maps
        + [_const_spec((1, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H2, L), x.dtype)]
        + [jax.ShapeDtypeStruct((in_lanes, 128), jnp.float32)] * n_maps
        + [jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        interpret=interpret,
    )(x, ds.astype(jnp.float32), *maps, btile, xs, sel, red)
    dx, dmaps, db = outs[0], list(outs[1:1 + n_maps]), outs[-1]
    return dx, dmaps, db, None, None, None


head_rowsums_op.defvjp(_hr_fwd, _hr_bwd)

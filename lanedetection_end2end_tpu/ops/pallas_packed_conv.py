"""Differentiable Pallas convs on lane-packed planes — the training hot ops.

Profiling the pure-XLA packed training graph (ops/packed_graph.py) showed
its cost is NOT compute: XLA materializes a full HBM round-trip (~100 us at
bs16) for every shift/concatenate feeding a conv matmul, and the backward
pass doubles that churn. These ops move exactly that shift+matmul structure
into Pallas kernels where the shifted views live in VMEM/registers:

    y = sum_t T_{s_t}(x) @ Kexp[t]          (forward)
    dx = sum_t T_{-s_t}(dy @ Kexp[t]^T)     (input gradient: transposed taps,
                                             negated shifts — T_s^T = T_{-s})
    dKexp[t] = T_{s_t}(x)^T @ dy            (weight gradient: one big MXU
                                             contraction over all pixels,
                                             accumulated across the batch
                                             grid inside the kernel)

with T_s a zero-fill shift over rows (3x1 convs, sublane slices) or lanes
(1x3 convs, `roll_lanes` + edge mask), and Kexp the (3, 128, 128)
block-diagonal expansion of the (3, C, C) channel mixers (kron with I_{128/C}
— differentiable in XLA, so kernel gradients flow back through the
expansion for free). Exposed through `jax.custom_vjp`, so `jax.grad` of the
packed training graph uses all three kernels.

Numerics match ops/packed_graph.py's jnp formulation: bf16 operands into the
MXU, f32 tap accumulation (verified by tests/test_packed_graph.py with
use_pallas_convs on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanedetection_end2end_tpu.ops.pallas_nb1d import roll_lanes


def _shift_plane(x, s: int, axis: str, interpret: bool):
    """T_s(x)[i] = x[i+s] along rows (axis='h') or lanes (axis='w'),
    zero-filled at the edges. x: (H, L)."""
    H, L = x.shape
    if s == 0:
        return x
    if axis == "h":
        n = abs(s)
        if n >= H:
            return jnp.zeros_like(x)
        zeros = jnp.zeros((n, L), x.dtype)
        if s > 0:
            return jnp.concatenate([x[s:], zeros], axis=0)
        return jnp.concatenate([zeros, x[:s]], axis=0)
    n = abs(s)
    if n >= L:
        return jnp.zeros_like(x)
    rolled = roll_lanes(x, (L - s) % L, interpret)
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, L), 1)
    zero = jnp.zeros((), x.dtype)
    if s > 0:
        return jnp.where(lane >= L - s, zero, rolled)
    return jnp.where(lane < -s, zero, rolled)


def _apply_kernel(x_ref, k_ref, o_ref, *, shifts, axis, interpret):
    """One image: o = sum_t T_{s_t}(x) @ k[t]; o f32."""
    x = x_ref[0]
    H, L = x.shape
    k = k_ref[:].astype(x.dtype)  # bf16 on the training path, like the
    # jnp reference (_block_matmul casts the expanded mixer to x.dtype)
    acc = None
    for t, s in enumerate(shifts):
        z = _shift_plane(x, s, axis, interpret)
        term = jnp.dot(z.reshape(-1, 128), k[t],
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    o_ref[0] = acc.reshape(H, L)


def _wgrad_kernel(x_ref, dy_ref, dk_ref, *, shifts, axis, interpret):
    """dk[t] += T_{s_t}(x)^T @ dy, accumulated across the batch grid."""
    x = x_ref[0]
    dy2 = dy_ref[0].astype(x.dtype).reshape(-1, 128)
    parts = []
    for s in shifts:
        z = _shift_plane(x, s, axis, interpret)
        parts.append(jax.lax.dot_general(
            z.reshape(-1, 128), dy2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dk = jnp.stack(parts)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dk_ref[...] = dk

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dk_ref[...] += dk


def _resolve(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _run_apply(x, kexp, shifts, axis, interpret):
    interpret = _resolve(interpret)
    B, H, L = x.shape
    return pl.pallas_call(
        functools.partial(_apply_kernel, shifts=shifts, axis=axis,
                          interpret=interpret),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L), jnp.float32),
        interpret=interpret,
    )(x, kexp)


def _run_wgrad(x, dy, shifts, axis, interpret):
    interpret = _resolve(interpret)
    B, H, L = x.shape
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, shifts=shifts, axis=axis,
                          interpret=interpret),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 128, 128), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 128, 128), jnp.float32),
        interpret=interpret,
    )(x, dy)


def _apply_act_kernel(x_ref, k_ref, b_ref, o_ref, *, shifts, axis, act,
                      interpret):
    """o = [relu](sum_t T_{s_t}(x) @ k[t] + bias), emitted in x.dtype."""
    x = x_ref[0]
    H, L = x.shape
    k = k_ref[:].astype(x.dtype)
    acc = None
    for t, s in enumerate(shifts):
        z = _shift_plane(x, s, axis, interpret)
        term = jnp.dot(z.reshape(-1, 128), k[t],
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    acc = acc + b_ref[:].astype(jnp.float32)
    if act:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(H, L)


def _bwd_act_kernel(x_ref, dy_ref, y_ref, k_ref, dx_ref, dk_ref, db_ref, *,
                    shifts, axis, act, interpret):
    """Merged backward: dx, dk, db in ONE pass over (x, dy, y).

    Halves the backward's HBM traffic vs the split dx/wgrad kernels (dy and
    y were each read twice; the relu mask and dz were computed twice)."""
    x = x_ref[0]
    dy = dy_ref[0]
    H, L = dy.shape
    if act:
        # Mosaic can't compare 16-bit values; mask in f32 and multiply
        mask = (y_ref[0].astype(jnp.float32) > 0.0).astype(dy.dtype)
        dz = dy * mask
    else:
        dz = dy
    kT = k_ref[:].astype(dy.dtype)
    acc = None
    for t, s in enumerate(shifts):
        z = _shift_plane(dz, -s, axis, interpret)
        term = jnp.dot(z.reshape(-1, 128), kT[t].T,
                       preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    dx_ref[0] = acc.astype(dx_ref.dtype).reshape(H, L)

    dz2 = dz.astype(x.dtype).reshape(-1, 128)
    parts = []
    for s in shifts:
        z = _shift_plane(x, s, axis, interpret)
        parts.append(jax.lax.dot_general(
            z.reshape(-1, 128), dz2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dk = jnp.stack(parts)
    db = jnp.sum(dz.astype(jnp.float32).reshape(-1, 128), axis=0,
                 keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dk_ref[...] = dk
        db_ref[...] = db

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dk_ref[...] += dk
        db_ref[...] += db


def _plane_spec(H, L):
    return pl.BlockSpec((1, H, L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_conv_act(x, kexp, btile, axis: str, d: int, act: bool,
                    interpret: bool | None = None):
    """Fused 3-tap conv + bias + optional relu, emitted in x.dtype.

    The fused epilogue removes the XLA bias/relu/cast passes around every
    conv (measured ~40 per-plane HBM round-trips per train step), and the
    bf16 output halves the conv's write traffic vs an f32 accumulator
    output.

    Args:
      x: (B, H, L) packed activations (bf16 on the training path).
      kexp: (3, 128, 128) f32 block-diagonal channel mixers (tap t pairs
        with shift s_t in (-d, 0, +d)).
      btile: (1, 128) f32 bias tiled across the 128//C channel groups.
      act: apply relu (conv3x1 positions); False = bias only (conv1x3,
        BatchNorm follows).
    Returns: (B, H, L) x.dtype.
    """
    interpret = _resolve(interpret)
    B, H, L = x.shape
    return pl.pallas_call(
        functools.partial(_apply_act_kernel, shifts=(-d, 0, d), axis=axis,
                          act=act, interpret=interpret),
        grid=(B,),
        in_specs=[_plane_spec(H, L), _const_spec((3, 128, 128)),
                  _const_spec((1, 128))],
        out_specs=_plane_spec(H, L),
        out_shape=jax.ShapeDtypeStruct((B, H, L), x.dtype),
        interpret=interpret,
    )(x, kexp, btile)


def _act_fwd(x, kexp, btile, axis, d, act, interpret):
    y = packed_conv_act(x, kexp, btile, axis, d, act, interpret)
    return y, (x, kexp, y)


def _act_bwd(axis, d, act, interpret, res, dy):
    x, kexp, y = res
    interpret = _resolve(interpret)
    B, H, L = x.shape
    shifts = (-d, 0, d)
    dx, dk, db = pl.pallas_call(
        functools.partial(_bwd_act_kernel, shifts=shifts, axis=axis, act=act,
                          interpret=interpret),
        grid=(B,),
        in_specs=[_plane_spec(H, L), _plane_spec(H, L), _plane_spec(H, L),
                  _const_spec((3, 128, 128))],
        out_specs=[_plane_spec(H, L), _const_spec((3, 128, 128)),
                   _const_spec((1, 128))],
        out_shape=[jax.ShapeDtypeStruct((B, H, L), x.dtype),
                   jax.ShapeDtypeStruct((3, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32)],
        interpret=interpret,
    )(x, dy, y, kexp)
    return dx, dk.astype(kexp.dtype), db.astype(kexp.dtype)


packed_conv_act.defvjp(_act_fwd, _act_bwd)


# ----------------------------------------------------------------------
# Fused per-channel batch moments (BatchNorm train statistics)
# ----------------------------------------------------------------------

def _moments_kernel(x_ref, sel_ref, o_ref):
    """o[0] += sel^T colsum(x); o[1] += sel^T colsum(x^2) — one pass."""
    x = x_ref[0].astype(jnp.float32)
    x2d = x.reshape(-1, 128)
    s1 = jnp.sum(x2d, axis=0, keepdims=True)           # (1, 128)
    s2 = jnp.sum(x2d * x2d, axis=0, keepdims=True)
    sel = sel_ref[:]
    out = jnp.concatenate([jnp.dot(s1, sel, preferred_element_type=jnp.float32),
                           jnp.dot(s2, sel, preferred_element_type=jnp.float32)],
                          axis=0)                      # (2, 128)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = out

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        o_ref[...] += out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def channel_sums(x, sel, C: int, interpret: bool | None = None):
    """One-pass per-channel (sum, sum of squares) of a packed (B, H, L)
    tensor: sums[0, c] = sum x over lanes of channel c, sums[1, c] = sum x^2.

    Replaces the XLA formulation (f32 cast materialization + two HIGHEST
    einsums = 3 full-plane HBM passes per BatchNorm) with a single pass.
    `sel` is the (128, 128) zero-padded channel-selection matrix
    (packed_graph._chan_select padded to 128 columns)."""
    interpret = _resolve(interpret)
    B, H, L = x.shape
    return pl.pallas_call(
        _moments_kernel,
        grid=(B,),
        in_specs=[_plane_spec(H, L), _const_spec((128, 128))],
        out_specs=_const_spec((2, 128)),
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
        interpret=interpret,
    )(x, sel)


def _sums_fwd(x, sel, C, interpret):
    return channel_sums(x, sel, C, interpret), x


def _sums_bwd(C, interpret, x, dout):
    # d x[l] = ds1[c(l)] + 2 x[l] ds2[c(l)], c(l) = l mod C
    L = x.shape[-1]
    ds1 = jnp.tile(dout[0, :C], L // C)
    ds2 = jnp.tile(dout[1, :C], L // C)
    dx = ds1[None, None, :] + 2.0 * x.astype(jnp.float32) * ds2[None, None, :]
    return dx.astype(x.dtype), jnp.zeros((128, 128), jnp.float32)


channel_sums.defvjp(_sums_fwd, _sums_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def packed_conv(x, kexp, axis: str, d: int, interpret: bool | None = None):
    """3-tap conv on a lane-packed plane.

    Args:
      x: (B, H, L) bf16 (or f32) packed activations, L a multiple of 128.
      kexp: (3, 128, 128) f32 block-diagonal expanded channel mixers
        (tap order: [-d, 0, +d] — i.e. kern[0] multiplies x[i-d]).
      axis: 'h' (3x1 conv over rows, shift d rows) or 'w' (1x3 conv over
        columns, shift d*C lanes — pass d_lanes as `d`).
    Returns:
      (B, H, L) f32 pre-bias conv output.
    """
    # NOTE tap order: packed_graph conv_h computes up@k0 + x@k1 + dn@k2 with
    # up[h] = x[h-d] = T_{-d}; so kexp[0] pairs with shift -d.
    shifts = (-d, 0, d)
    return _run_apply(x, kexp, shifts, axis, interpret)


def _fwd(x, kexp, axis, d, interpret):
    return packed_conv(x, kexp, axis, d, interpret), (x, kexp)


def _bwd(axis, d, interpret, res, dy):
    x, kexp = res
    shifts = (-d, 0, d)
    # dx: transposed taps, negated shifts
    kT = jnp.transpose(kexp, (0, 2, 1))[::-1]  # tap t pairs with shift -s_t
    dx = _run_apply(dy.astype(x.dtype), kT, shifts, axis, interpret)
    dk = _run_wgrad(x, dy, shifts, axis, interpret)
    return dx.astype(x.dtype), dk.astype(kexp.dtype)


packed_conv.defvjp(_fwd, _bwd)

"""Differentiable lane-packed ERFNet — the TRAINING fast path.

Two interchangeable execution modes, selected by `pallas_convs`:

- pure-jnp (CPU / interpret / oracle): every conv is shift + block-diagonal
  einsum. Measured on v5e this LOSES to the flax NHWC graph (319 vs 386
  img/s at 256x512) — XLA materializes a full HBM round-trip (~100 us at
  bs16) for every shift/concatenate feeding a conv.
- pallas_convs=True (TPU training): the convs (+bias+relu epilogues) and
  the BatchNorm batch moments run as custom_vjp Pallas kernels
  (ops/pallas_packed_conv.py) in which the shifted views never touch HBM.
  Measured 518 img/s at bs32 — 1.3x the flax graph, 1.8x the round-1
  record. Auto-enabled for single-device TPU training
  (train/steps.py::_resolve_packed).

The inference engine (ops/pallas_nb1d.py, ops/pallas_backbone.py,
models/fused_graph.py) showed where XLA loses the backbone's time: NHWC
activations with C in {3, 16, 64} tile the TPU lane dimension at 128, so
every conv / BatchNorm / elementwise op on a small-channel tensor moves and
computes 8x (C=16) or 2x (C=64) dead lanes, and every conv boundary inserts
lane-permuting relayout copies. Those kernels fix it for inference by folding
BatchNorm statistics into constants — which a TRAINING graph cannot do (BN
needs cross-image batch statistics, and every weight is a differentiated
leaf).

This module is the training-compatible redesign: the same lane-packed
(B, H, W*C) layout and block-matmul formulation, but built from PURE jnp ops
so XLA differentiates it. The trick that keeps it differentiable is that
every lane-map matrix is LINEAR in the conv kernel, so it can be materialized
at trace time with a scatter-add of the learnable kernel entries into a
(128·r, 128·s) matrix (gradients flow back through the scatter as a gather):

    M_shift = zeros.at[rows, cols].add(kernel.reshape(-1)[kidx])

with (shift, rows, cols, kidx) precomputed on the host from static shapes
only. Convolutions then become dense (…, 128) @ (128, 128·s) matmuls — MXU
shapes — plus cheap lane/row shifts, exactly like the serving kernels:

  - 3x1 conv (over H, dilation d): row shifts by ±d + block-diagonal matmul
    (kron(I_{128/C}, K_t), ERFNet.py:31,40 taps);
  - 1x3 conv (over W, dilation d): lane shifts by ±d·C + the same matmuls;
  - DownsamplerBlock / UpsamplerBlock / 2x2 ConvTranspose head: the lane-map
    construction of ops/pallas_backbone.py, scatter-built (ERFNet.py:11-22,
    98-106, 124);
  - BatchNorm (train mode): per-channel batch statistics computed IN the
    packed layout via a constant channel-selection matmul, with flax
    BatchNorm semantics (biased variance, running average momentum 0.9);
  - Dropout2d: per-(image, channel) mask tiled across W
    (torch nn.Dropout2d, ERFNet.py:41).

The packed e2e tail never materializes the (B, 256, 512, C) weight maps in
NHWC: activation -> top-row mask -> the separable WLS row sums S0/S1
(ops/wls.py point 5) are computed straight from the packed plane with one
selection einsum, mirroring models/fused_graph.py's decoder tail.

Numerical contract: identical math to the flax graph (models/erfnet.py) —
verified by tests/test_packed_graph.py against `ERFNet.apply` forward,
train-mode batch statistics, and gradients.
"""

from __future__ import annotations

import functools
import os
from math import ceil
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_BN_EPS = 1e-3
_BN_MOMENTUM = 0.9


def fused_blocks_on() -> bool:
    """Whether the fused NB1D half-block kernels (ops/pallas_nb_block.py)
    serve nb1d_packed (env PACKED_FUSED_BLOCKS, default ON). Their backward
    kernels need a raised scoped-VMEM limit at bs32 — train/steps.py passes
    the matching compiler option when this is on. Default flipped to 1 after
    TPU-benching r04: 642 img/s fused vs 565 unfused at bs32 bf16 (+13.5%),
    interpret-mode parity in tests/test_fused_blocks.py."""
    return os.environ.get("PACKED_FUSED_BLOCKS", "1") == "1"

# Block inventories (ERFNet.py:66-81, 116-124).
ENC_NB64 = [(f"nb64_{i}", 1) for i in range(5)]
ENC_NB128 = [(f"nb128_{j}_d{d}", d) for j in range(2) for d in (2, 4, 8, 16)]
DEC_NB64 = [("nb64_0", 1), ("nb64_1", 1)]
DEC_NB16 = [("nb16_0", 1), ("nb16_1", 1)]


def packed_shapes_ok(resize: int, out_ch: int) -> bool:
    """True when every packed stage is 128-lane aligned for this resolution:
    the initial plane W*4 = 8*resize must tile into 128-lane blocks (the
    tightest stage constraint) and the head's input plane (16*resize lanes)
    must tile into its r_in super-blocks."""
    if resize % 16:
        return False
    g_in = 128 // 16
    r_in = 1
    while (g_in * r_in * 2 * out_ch) % 128:
        r_in *= 2
    return (16 * resize) % (128 * r_in) == 0


# ----------------------------------------------------------------------
# Scatter-built lane maps (host: static index triples; trace: one scatter)
# ----------------------------------------------------------------------

class _CooMaps:
    """COO triples per shift for a W-direction linear op.

    Same contract as ops/pallas_backbone._lane_maps, but collecting
    (row, col, kernel_flat_index) instead of baking numpy weights, so the
    matrices can be rebuilt from LEARNABLE kernels at trace time.

    `block=(cin_lane, cout_lane, cinK, coutK)`: when the map's rows tile in
    blocks of `cin_lane` lanes (kernel input channels occupying the first
    `cinK`), its columns in blocks of `cout_lane` (first `coutK` used), and
    kidx = t*cinK*coutK + ci*coutK + co (every conv/ConvT layout here),
    finalize() derives a constant 0/1 block-placement mask per kernel tap so
    `_build_maps` can construct the matrices as
    einsum(masks, kernel_taps) — broadcasts/multiplies only. The default
    gather(kern_flat)+scatter construction runs at ~0.6 GB/s on TPU and was
    40%+ of the packed train step's XLA tail (PROFILE_r04.md train trace:
    0.5 ms for ONE 128x576 map); the einsum form is a few-microsecond
    fusion with a plain reduction (not a scatter) as its weight gradient."""

    def __init__(self, in_lanes: int, out_lanes: int,
                 block: Tuple[int, int, int, int] | None = None):
        self.in_lanes, self.out_lanes = in_lanes, out_lanes
        self.block = block
        self.coo: Dict[int, list] = {}

    def add(self, w_in: int, cin: int, ci: int, lane_out: int, kidx: int):
        lane_in = w_in * cin + ci
        shift, lane_rel = divmod(lane_in, self.in_lanes)
        self.coo.setdefault(shift, []).append((lane_rel, lane_out, kidx))

    def _decomp(self, rows, cols, kidx):
        """(masks (T_used, R, Cq) f32, tap list) when the triples factor into
        whole-kernel-block placements; None otherwise (generic scatter)."""
        cin_l, cout_l, cinK, coutK = self.block
        ci, wi = rows % cin_l, rows // cin_l
        co, wo = cols % cout_l, cols // cout_l
        if (ci >= cinK).any() or (co >= coutK).any():
            return None
        base = kidx - (ci * coutK + co)
        if (base % (cinK * coutK)).any():
            return None
        t = base // (cinK * coutK)
        R, Cq = self.in_lanes // cin_l, self.out_lanes // cout_l
        tmap = np.full((R, Cq), -1, np.int64)
        cnt = np.zeros((R, Cq), np.int64)
        for a in range(len(rows)):
            if tmap[wi[a], wo[a]] not in (-1, t[a]):
                return None  # two taps share a block: not factorable
            tmap[wi[a], wo[a]] = t[a]
            cnt[wi[a], wo[a]] += 1
        if ((tmap >= 0) & (cnt != cinK * coutK)).any():
            return None  # partial/duplicated block coverage
        tlist = sorted(set(int(v) for v in tmap[tmap >= 0]))
        masks = np.zeros((len(tlist), R, Cq), np.float32)
        for u, tv in enumerate(tlist):
            masks[u][tmap == tv] = 1.0
        return masks, tuple(tlist)

    def finalize(self) -> Dict[int, tuple]:
        out = {}
        for shift, triples in self.coo.items():
            arr = np.asarray(triples, np.int64)
            rows, cols, kidx = arr[:, 0], arr[:, 1], arr[:, 2]
            decomp = None
            if self.block is not None \
                    and os.environ.get("PACKED_GATHER_MAPS") != "1":
                decomp = self._decomp(rows, cols, kidx)
                if decomp is not None:
                    decomp = (*decomp, self.block)
            out[shift] = (rows.astype(np.int32), cols.astype(np.int32),
                          kidx.astype(np.int32), decomp)
        return out


def _build_maps(coo, kern_flat, in_lanes: int, out_lanes: int):
    """COO entries + flat kernel vector -> {shift: (in_lanes, out_lanes)}.

    Entries carrying a block decomposition (see _CooMaps) build the matrix
    as einsum(constant masks, kernel tap blocks) — no gathers; the rest
    fall back to the scatter construction."""
    out = {}
    for shift, (rows, cols, kidx, decomp) in coo.items():
        if decomp is None:
            out[shift] = (jnp.zeros((in_lanes, out_lanes), kern_flat.dtype)
                          .at[rows, cols].add(kern_flat[kidx]))
            continue
        masks, tlist, (cin_l, cout_l, cinK, coutK) = decomp
        T = kern_flat.size // (cinK * coutK)
        k3 = kern_flat.reshape(T, cinK, coutK)
        kb = jnp.stack([k3[t] for t in tlist])  # static slices, no gather
        kb = jnp.pad(kb, ((0, 0), (0, cin_l - cinK), (0, cout_l - coutK)))
        m = jnp.einsum("trc,tij->ricj",
                       jnp.asarray(masks, kern_flat.dtype), kb)
        out[shift] = m.reshape(in_lanes, out_lanes)
    return out


def _apply_maps(x, maps, r_in: int, precision=None):
    """x (B, H, L) -> (B, H, (L // in_lanes) * out_lanes) via super-block
    matmuls; `shift` counts whole input super-blocks (jnp twin of
    ops/pallas_backbone._apply_lane_maps, zero-fill edges).

    `precision` defaults to the backend default (bf16 passes on TPU — the
    same precision flax's convs run at); pass Precision.HIGHEST for
    exactness-sensitive selections (the maxpool path must reproduce the
    pooled values bit-exactly, not bf16-rounded)."""
    B, H, L = x.shape
    in_lanes = 128 * r_in
    out = None
    for shift, M in maps.items():
        s = shift * in_lanes
        if shift > 0:
            zz = jnp.concatenate(
                [x[..., s:], jnp.zeros((B, H, s), x.dtype)], axis=-1)
        elif shift < 0:
            zz = jnp.concatenate(
                [jnp.zeros((B, H, -s), x.dtype), x[..., :s]], axis=-1)
        else:
            zz = x
        z = zz.reshape(B, H, L // in_lanes, in_lanes)
        term = jnp.einsum("bhgk,ko->bhgo", z, M.astype(x.dtype),
                          preferred_element_type=jnp.float32,
                          precision=precision)
        out = term if out is None else out + term
    out_lanes = next(iter(maps.values())).shape[1]
    return out.reshape(B, H, (L // in_lanes) * out_lanes)


# ----------------------------------------------------------------------
# Packed BatchNorm (train + eval) and Dropout2d
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _chan_select(C: int) -> np.ndarray:
    """(128, C) matrix summing packed lanes (w_rel*C + c) into channel c."""
    sel = np.zeros((128, C), np.float32)
    for w in range(128 // C):
        for c in range(C):
            sel[w * C + c, c] = 1.0
    return sel


def _channel_moments(x, C: int, pallas: bool = False, axis_name=None):
    """Per-channel mean and mean-of-squares of a packed (B, H, L) tensor.

    `axis_name`: mesh axis to pmean the moments over when running inside
    shard_map (sync-BN over the global batch — equal-size shards, so the
    mean of per-shard means IS the global mean). Under plain jit GSPMD
    inserts the cross-chip reduction itself and this stays None."""
    B, H, L = x.shape
    sel = jnp.asarray(_chan_select(C))
    n = B * H * (L // C)
    if pallas:
        from lanedetection_end2end_tpu.ops.pallas_packed_conv import \
            channel_sums
        sel_pad = jnp.zeros((128, 128), jnp.float32).at[:, :C].set(sel)
        sums = channel_sums(x, sel_pad, C)
        s1, s2 = sums[0, :C] / n, sums[1, :C] / n
    else:
        xf = x.astype(jnp.float32).reshape(B, H, L // 128, 128)
        # HIGHEST: the selection must not bf16-round the activations — batch
        # statistics feed the normalization (and flax reduces in f32)
        s1 = jnp.einsum("bhgk,kc->c", xf, sel,
                        precision=jax.lax.Precision.HIGHEST) / n
        s2 = jnp.einsum("bhgk,kc->c", jnp.square(xf), sel,
                        precision=jax.lax.Precision.HIGHEST) / n
    if axis_name is not None:
        s1 = jax.lax.pmean(s1, axis_name)
        s2 = jax.lax.pmean(s2, axis_name)
    return s1, s2


def _tile_lane(v, L: int, C: int):
    """(C,) per-channel vector -> (L,) packed-lane vector."""
    return jnp.tile(v, L // C)


def batchnorm_packed(x, bn_params: Dict, bn_stats: Dict, C: int, train: bool,
                     pallas: bool = False, axis_name=None):
    """flax.linen.BatchNorm semantics on a packed (B, H, L) tensor.

    Returns (y, new_stats): batch statistics (biased variance) in train mode,
    running statistics in eval mode; running averages updated with
    momentum 0.9 (torch momentum 0.1, models/erfnet.py:30-33)."""
    L = x.shape[-1]
    if train:
        mean, mean2 = _channel_moments(x, C, pallas=pallas,
                                       axis_name=axis_name)
        var = mean2 - jnp.square(mean)
        new_stats = {
            "mean": _BN_MOMENTUM * bn_stats["mean"]
            + (1.0 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * bn_stats["var"]
            + (1.0 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = bn_stats["mean"], bn_stats["var"]
        new_stats = bn_stats
    mul = bn_params["scale"] * jax.lax.rsqrt(var + _BN_EPS)
    add = bn_params["bias"] - mean * mul
    y = x * _tile_lane(mul, L, C).astype(x.dtype) \
        + _tile_lane(add, L, C).astype(x.dtype)
    return y, new_stats


def dropout2d_packed(x, rate: float, rng, C: int, train: bool):
    """torch nn.Dropout2d (ERFNet.py:41): whole channels drop per sample."""
    if not train or rate <= 0.0 or rng is None:
        return x
    B, _, L = x.shape
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (B, C)).astype(x.dtype)
    mask_l = jnp.tile(mask, (1, L // C))  # lane order is w-major
    return x * mask_l[:, None, :] / keep


# ----------------------------------------------------------------------
# non_bottleneck_1d (ERFNet.py:25-60)
# ----------------------------------------------------------------------

def _shift_rows(x, d: int):
    """(up, down) row-shifted planes: up[h] = x[h-d], down[h] = x[h+d]."""
    B, H, L = x.shape
    zeros = jnp.zeros((B, min(d, H), L), x.dtype)
    if d >= H:
        return zeros, zeros
    up = jnp.concatenate([zeros, x[:, :-d]], axis=1)
    dn = jnp.concatenate([x[:, d:], zeros], axis=1)
    return up, dn


def _shift_lanes(x, s: int):
    """(left, right) lane-shifted planes: left needs x[w-d] (shift right by
    s = d*C lanes, zeros enter at the image's left edge), right needs
    x[w+d]."""
    B, H, L = x.shape
    zeros = jnp.zeros((B, H, min(s, L)), x.dtype)
    if s >= L:
        return zeros, zeros
    left = jnp.concatenate([zeros, x[..., :-s]], axis=-1)
    right = jnp.concatenate([x[..., s:], zeros], axis=-1)
    return left, right


def _block_matmul(x, K):
    """x (B, H, L) @ block-diag-expanded K (128, 128) per 128-lane block.
    Returns f32 (tap sums accumulate in f32; callers cast once per conv)."""
    B, H, L = x.shape
    z = x.reshape(B, H, L // 128, 128)
    y = jnp.einsum("bhgk,km->bhgm", z, K.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.reshape(B, H, L)


def _expand(K, C: int):
    """(C, C) channel mixer -> (128, 128) block diagonal (differentiable)."""
    if C == 128:
        return K
    return jnp.kron(jnp.eye(128 // C, dtype=K.dtype), K)


def conv_h_packed(x, kern, bias, C: int, d: int, pallas: bool = False,
                  act: bool = False):
    """3x1 conv over H (dilation d) on packed (B, H, L); kern (3,1,C,C).
    `act` fuses the following relu (exact: relu commutes with the bf16
    cast)."""
    if pallas:
        from lanedetection_end2end_tpu.ops.pallas_packed_conv import \
            packed_conv_act
        kexp = jnp.stack([_expand(kern[t, 0].astype(jnp.float32), C)
                          for t in range(3)])
        btile = _tile_lane(bias.astype(jnp.float32), 128, C)[None]
        return packed_conv_act(x, kexp, btile, "h", d, act)
    up, dn = _shift_rows(x, d)
    y = (_block_matmul(up, _expand(kern[0, 0], C))
         + _block_matmul(x, _expand(kern[1, 0], C))
         + _block_matmul(dn, _expand(kern[2, 0], C)))
    y = (y + _tile_lane(bias, x.shape[-1], C)).astype(x.dtype)
    return jax.nn.relu(y) if act else y


def conv_w_packed(x, kern, bias, C: int, d: int, pallas: bool = False,
                  act: bool = False):
    """1x3 conv over W (dilation d) on packed (B, H, L); kern (1,3,C,C)."""
    if pallas:
        from lanedetection_end2end_tpu.ops.pallas_packed_conv import \
            packed_conv_act
        kexp = jnp.stack([_expand(kern[0, t].astype(jnp.float32), C)
                          for t in range(3)])
        btile = _tile_lane(bias.astype(jnp.float32), 128, C)[None]
        return packed_conv_act(x, kexp, btile, "w", d * C, act)
    left, right = _shift_lanes(x, d * C)
    y = (_block_matmul(left, _expand(kern[0, 0], C))
         + _block_matmul(x, _expand(kern[0, 1], C))
         + _block_matmul(right, _expand(kern[0, 2], C)))
    y = (y + _tile_lane(bias, x.shape[-1], C)).astype(x.dtype)
    return jax.nn.relu(y) if act else y


def _bn_mul_add(mom, bn_params, bn_stats, C: int, n: int, train: bool,
                axis_name):
    """(mul, add, new_stats) from fused-kernel moments (train) or running
    statistics (eval); flax BatchNorm semantics (batchnorm_packed)."""
    if train:
        mean, mean2 = mom[0, :C] / n, mom[1, :C] / n
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = mean2 - jnp.square(mean)
        new_stats = {
            "mean": _BN_MOMENTUM * bn_stats["mean"]
            + (1.0 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * bn_stats["var"]
            + (1.0 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = bn_stats["mean"], bn_stats["var"]
        new_stats = bn_stats
    mul = bn_params["scale"] * jax.lax.rsqrt(var + _BN_EPS)
    add = bn_params["bias"] - mean * mul
    return mul.astype(jnp.float32), add.astype(jnp.float32), new_stats


def _kexp_b(p, key, C, axis):
    """(kexp (3,128,128) f32, btile (1,128) f32) for a conv param dict."""
    kern = p[key]["kernel"]
    taps = ([kern[t, 0] for t in range(3)] if axis == "h"
            else [kern[0, t] for t in range(3)])
    kexp = jnp.stack([_expand(t.astype(jnp.float32), C) for t in taps])
    btile = _tile_lane(p[key]["bias"].astype(jnp.float32), 128, C)[None]
    return kexp, btile


@functools.lru_cache(maxsize=None)
def _band_masks(C: int, d: int):
    """Constant (G, G) word-placement masks for the banded W-conv form
    (ops/pallas_nb1d.py::_tri_taps): per-tap in-block shift matrices +
    the left/right edge-word diagonals."""
    G = 128 // C

    def shifted(dw):
        m = np.zeros((G, G), np.float32)
        for w_out in range(G):
            if 0 <= w_out + dw < G:
                m[w_out + dw, w_out] = 1.0
        return m

    e0 = np.zeros((G, G), np.float32)
    e2 = np.zeros((G, G), np.float32)
    for w in range(d):
        e0[w, w] = 1.0
        e2[G - 1 - w, G - 1 - w] = 1.0
    return shifted(-d), shifted(0), shifted(+d), e0, e2


def banded_w_mats(kern, C: int, d: int):
    """(2, 128, 128) f32 [M_main, M_edge] banded W-conv matrices from a
    flax (1, 3, C, C) 1x3 kernel — DIFFERENTIABLE (kron with constant
    masks), so the fused half-block kernels' (2, ...) weight cotangent
    flows back to the taps through XLA. Requires 2*d*C <= 128.

    One 128-lane block holds G = 128/C w-positions: M_main carries every
    tap that stays inside the block (bandwidth d); the 2*d*C lanes that
    cross block boundaries ride ONE combined edge plane mixed by M_edge
    (serving twin: ops/pallas_nb1d.py::_tri_taps). 2 matmuls per W-conv
    instead of 3 — forward, input-grad, AND weight-grad."""
    s0, s1, s2, e0, e2 = (jnp.asarray(m) for m in _band_masks(C, d))
    g0 = kern[0, 0].astype(jnp.float32)
    g1 = kern[0, 1].astype(jnp.float32)
    g2 = kern[0, 2].astype(jnp.float32)
    main = jnp.kron(s0, g0) + jnp.kron(s1, g1) + jnp.kron(s2, g2)
    edge = jnp.kron(e0, g0) + jnp.kron(e2, g2)
    return jnp.stack([main, edge])


def _kw_mats(p, key, C, d):
    """W-conv matrices for the fused half-block kernels: direct block-diag
    taps (3,128,128) by default; PACKED_BANDED=1 opts into the banded
    (2,128,128) [M_main, M_edge] form where 2*d*C <= 128.

    Measured A/B (2026-08-20, bs32 e2e train step, idle host, each in a
    fresh process): direct 732.9 img/s vs banded 707-709 — the banded
    form trades one matmul for the edge-plane select/roll VPU work and
    loses ~3.5% on v5e (and its kernels cold-compile ~2.5x slower,
    169 s vs 419 s mode wall). Kept as an opt-in for parts where a
    2-matmul W-conv may win (e.g. narrower MXUs)."""
    kern = p[key]["kernel"]
    btile = _tile_lane(p[key]["bias"].astype(jnp.float32), 128, C)[None]
    if 2 * d * C <= 128 and os.environ.get("PACKED_BANDED") == "1":
        return banded_w_mats(kern, C, d), btile
    kexp = jnp.stack([_expand(kern[0, t].astype(jnp.float32), C)
                      for t in range(3)])
    return kexp, btile


def _nb1d_fused(x, p, stats, *, C, d, train, drop, rng, axis_name):
    """NB1D block via the fused half-block kernels (ops/pallas_nb_block.py):
    2 forward pallas_calls instead of 6, BN1 normalize fused as half B's
    prologue, only per-channel statistics math and the residual epilogue in
    XLA."""
    from lanedetection_end2end_tpu.ops.pallas_nb_block import (
        nb_half_a, nb_half_b)
    B, H, L = x.shape
    n = B * H * (L // C)
    kh1, bh1 = _kexp_b(p, "conv3x1_1", C, "h")
    kw1, bw1 = _kw_mats(p, "conv1x3_1", C, 1)
    kh2, bh2 = _kexp_b(p, "conv3x1_2", C, "h")
    kw2, bw2 = _kw_mats(p, "conv1x3_2", C, d)

    y2, mom1 = nb_half_a(x, kh1, bh1, kw1, bw1, C)
    mul1, add1, bn1 = _bn_mul_add(mom1, p["bn1"], stats["bn1"], C, n, train,
                                  axis_name)
    y4, mom2 = nb_half_b(y2, _tile_lane(mul1, 128, C)[None],
                         _tile_lane(add1, 128, C)[None],
                         kh2, bh2, kw2, bw2, d, d * C)
    mul2, add2, bn2 = _bn_mul_add(mom2, p["bn2"], stats["bn2"], C, n, train,
                                  axis_name)
    y = y4 * _tile_lane(mul2, L, C).astype(y4.dtype) \
        + _tile_lane(add2, L, C).astype(y4.dtype)
    y = dropout2d_packed(y, drop, rng, C, train)
    return jax.nn.relu(y + x), {"bn1": bn1, "bn2": bn2}


def nb1d_packed(x, params: Dict, stats: Dict, *, C: int, d: int,
                train: bool, drop: float, rng, pallas: bool = False,
                axis_name=None):
    """One NonBottleneck1D block on a packed plane. Returns (y, new_stats)."""
    p = params
    if pallas and fused_blocks_on():
        return _nb1d_fused(x, p, stats, C=C, d=d, train=train, drop=drop,
                           rng=rng, axis_name=axis_name)
    y = conv_h_packed(x, p["conv3x1_1"]["kernel"],
                      p["conv3x1_1"]["bias"], C, 1, pallas=pallas, act=True)
    y = conv_w_packed(y, p["conv1x3_1"]["kernel"], p["conv1x3_1"]["bias"],
                      C, 1, pallas=pallas)
    y, bn1 = batchnorm_packed(y, p["bn1"], stats["bn1"], C, train,
                              pallas=pallas, axis_name=axis_name)
    y = jax.nn.relu(y)
    y = conv_h_packed(y, p["conv3x1_2"]["kernel"],
                      p["conv3x1_2"]["bias"], C, d, pallas=pallas, act=True)
    y = conv_w_packed(y, p["conv1x3_2"]["kernel"], p["conv1x3_2"]["bias"],
                      C, d, pallas=pallas)
    y, bn2 = batchnorm_packed(y, p["bn2"], stats["bn2"], C, train,
                              pallas=pallas, axis_name=axis_name)
    y = dropout2d_packed(y, drop, rng, C, train)
    return jax.nn.relu(y + x), {"bn1": bn1, "bn2": bn2}


# ----------------------------------------------------------------------
# DownsamplerBlock (ERFNet.py:11-22): conv3x3/s2 || maxpool2x2, concat, BN
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _downsampler_idx(cin: int, cin0: int, cc: int, cout: int):
    """COO lane maps per row tap kh for the strided conv (kern flat index
    over (3, 3, cin0, cc)) + the constant pool-selection matrix."""
    n_out = (128 // cin) // 2
    out_lanes = n_out * cout
    assert out_lanes % 128 == 0, (cin, cout)
    rows = []
    for kh in range(3):
        m = _CooMaps(128, out_lanes, block=(cin, cout, cin0, cc))
        for w_out in range(n_out):
            for kw in range(3):
                w_in = 2 * w_out + kw - 1
                for ci in range(cin0):
                    for co in range(cc):
                        kidx = ((kh * 3 + kw) * cin0 + ci) * cc + co
                        m.add(w_in, cin, ci, w_out * cout + co, kidx)
        rows.append(m.finalize())
    pool = np.zeros((128, out_lanes), np.float32)
    for w_out in range(n_out):
        for ci in range(cin0):
            pool[2 * w_out * cin + ci, w_out * cout + cc + ci] = 1.0
    return rows, pool


def _downsampler_fused(x, params, stats, *, cin, cout, train, axis_name):
    """DownsamplerBlock via ops/pallas_lanemaps.downsampler_op: strided conv
    lane maps + maxpool concat + bias + BN moments in one kernel/direction."""
    from lanedetection_end2end_tpu.ops.pallas_lanemaps import downsampler_op
    B, H, L = x.shape
    kern = params["conv"]["kernel"]
    cin0, cc = kern.shape[2], kern.shape[3]
    coo_rows, pool_np = _downsampler_idx(cin, cin0, cc, cout)
    out_lanes = pool_np.shape[1]
    kflat = kern.reshape(-1)
    plan, flat = [], []
    for src, coo in enumerate(coo_rows):  # 0=rm1, 1=r0, 2=r1
        for shift in sorted(coo):
            plan.append((src, shift))
            flat.append(_build_maps({shift: coo[shift]}, kflat, 128,
                                    out_lanes)[shift])
    bias = jnp.concatenate([params["conv"]["bias"],
                            jnp.zeros((cout - cc,),
                                      params["conv"]["bias"].dtype)])
    btile = _tile_lane(bias.astype(jnp.float32), out_lanes, cout)[None]
    y_raw, mom = downsampler_op(x, flat, jnp.asarray(pool_np), btile,
                                tuple(plan), cin, cout, out_lanes)
    Lout = y_raw.shape[-1]
    n = B * (H // 2) * (Lout // cout)
    mul, add, bn = _bn_mul_add(mom, params["bn"], stats["bn"], cout, n,
                               train, axis_name)
    y = y_raw * _tile_lane(mul, Lout, cout).astype(y_raw.dtype) \
        + _tile_lane(add, Lout, cout).astype(y_raw.dtype)
    return jax.nn.relu(y), {"bn": bn}


def downsampler_packed(x, params: Dict, stats: Dict, *, cin: int, cout: int,
                       train: bool, pallas: bool = False, axis_name=None):
    """x (B, H, W*cin) -> (B, H/2, (W/2)*cout); cin may be padded (RGB 3->4:
    callers pad activations, the kernel's input-channel axis stays cin0)."""
    if pallas and _fused_maps_on():
        return _downsampler_fused(x, params, stats, cin=cin, cout=cout,
                                  train=train, axis_name=axis_name)
    B, H, L = x.shape
    kern = params["conv"]["kernel"]  # (3, 3, cin0, cc)
    cin0, cc = kern.shape[2], kern.shape[3]
    coo_rows, pool_np = _downsampler_idx(cin, cin0, cc, cout)
    kflat = kern.reshape(-1)
    out_lanes = pool_np.shape[1]

    xp = x.reshape(B, H // 2, 2 * L)
    r0, r1 = xp[..., :L], xp[..., L:]
    rm1 = jnp.concatenate(
        [jnp.zeros((B, 1, L), x.dtype), r1[:, :-1]], axis=1)

    acc = None
    for coo, plane in zip(coo_rows, (rm1, r0, r1)):
        maps = _build_maps(coo, kflat, 128, out_lanes)
        term = _apply_maps(plane, maps, 1)
        acc = term if acc is None else acc + term

    # maxpool 2x2: max over the row pair, then over the w pair (shift by cin).
    # `where`-based max, NOT jnp.maximum: gradient routing at ties should
    # match lax.reduce_window's select-and-scatter (all of the gradient to
    # one maximal element, not maximum's 50/50 split). Pool inputs are relu
    # outputs, so all-zero windows — exact 4-way ties — are common, and tie
    # splitting measurably skewed conv/BN bias grads (up to 2x) before this
    # fix. All-zero windows route identically to reduce_window; the one
    # remaining divergence is exact ties between distinct NONZERO
    # activations across positions (e.g. (r1,2w) vs (r0,2w+1)), where this
    # chain picks the column-first element and reduce_window the row-major
    # first — vanishingly rare with real activations.
    p = jnp.where(r0 >= r1, r0, r1)
    p_sh = jnp.concatenate(
        [p[..., cin:], jnp.zeros((B, H // 2, cin), x.dtype)], axis=-1)
    p = jnp.where(p >= p_sh, p, p_sh)
    acc = acc + _apply_maps(p, {0: jnp.asarray(pool_np)}, 1,
                            precision=jax.lax.Precision.HIGHEST)

    bias = jnp.concatenate([params["conv"]["bias"],
                            jnp.zeros((cout - cc,),
                                      params["conv"]["bias"].dtype)])
    acc = acc + _tile_lane(bias, acc.shape[-1], cout).astype(acc.dtype)
    acc = acc.astype(x.dtype)
    y, bn = batchnorm_packed(acc, params["bn"], stats["bn"], cout, train,
                             pallas=pallas, axis_name=axis_name)
    return jax.nn.relu(y), {"bn": bn}


# ----------------------------------------------------------------------
# UpsamplerBlock (ConvTranspose 3x3/s2/p1/op1 + BN + relu, ERFNet.py:98-106)
# ----------------------------------------------------------------------

def _convt_taps(i: int):
    """(kernel row/col index, input offset) pairs for output phase i of the
    torch ConvTranspose2d(3, s=2, p=1, op=1) (ops/pallas_backbone.py:199-215,
    verified by impulse response)."""
    return [(1, 0)] if i == 0 else [(0, 0), (2, +1)]


@functools.lru_cache(maxsize=None)
def _upsampler_idx(cin: int, cout: int):
    """COO maps keyed (row phase i, input row offset dh); column phases are
    folded into the lane map (2*cout channels per input w)."""
    g_in = 128 // cin if cin <= 128 else 1
    r_in = 1
    while (g_in * r_in * 2 * cout) % 128:
        r_in *= 2
    n_out = g_in * r_in
    out_lanes = n_out * 2 * cout
    maps = {}
    for i in (0, 1):
        for kh, dh in _convt_taps(i):
            m = _CooMaps(128 * r_in, out_lanes, block=(cin, cout, cin, cout))
            for w_out in range(n_out):
                for j in (0, 1):
                    for (kw, dw) in _convt_taps(j):
                        w_in = w_out + dw
                        for ci in range(cin):
                            for co in range(cout):
                                kidx = ((kh * 3 + kw) * cin + ci) * cout + co
                                m.add(w_in, cin, ci,
                                      w_out * 2 * cout + j * cout + co, kidx)
            maps[(i, dh)] = m.finalize()
    return maps, r_in, out_lanes


def _fused_maps_on() -> bool:
    """Fused lane-map kernels follow the fused-block gate unless overridden
    (PACKED_FUSED_MAPS=0/1)."""
    v = os.environ.get("PACKED_FUSED_MAPS")
    if v is None:
        return fused_blocks_on()
    return v == "1"


def _upsampler_fused(x, params, stats, *, cin, cout, train, axis_name):
    """UpsamplerBlock via the fused lane-map kernel: one pallas_call does
    shifted views + map matmuls + bias + row interleave + BN moments; only
    the per-channel BN math + relu stay in XLA."""
    from lanedetection_end2end_tpu.ops.pallas_lanemaps import lane_maps_op
    B, H, L = x.shape
    coo, r_in, out_lanes = _upsampler_idx(cin, cout)
    assert out_lanes == 128, (cin, cout)
    in_lanes = 128 * r_in
    kflat = params["conv"]["kernel"].reshape(-1)
    # flatten {(i, dh): {shift: (rows, cols, kidx)}} -> plan + matrices
    plan, flat = [], []
    for (i, dh) in sorted(coo):
        per_shift = coo[(i, dh)]
        for shift in sorted(per_shift):
            plan.append((i, dh, shift))
            flat.append(_build_maps({shift: per_shift[shift]}, kflat,
                                    in_lanes, out_lanes)[shift])
    btile = _tile_lane(params["conv"]["bias"].astype(jnp.float32),
                       128, cout)[None]
    y_raw, mom = lane_maps_op(x, flat, btile, tuple(plan), in_lanes, 2,
                              cout, x.dtype, True)
    n = B * 2 * H * (y_raw.shape[-1] // cout)
    mul, add, bn = _bn_mul_add(mom, params["bn"], stats["bn"], cout, n,
                               train, axis_name)
    L2 = y_raw.shape[-1]
    y = y_raw * _tile_lane(mul, L2, cout).astype(y_raw.dtype) \
        + _tile_lane(add, L2, cout).astype(y_raw.dtype)
    return jax.nn.relu(y), {"bn": bn}


def upsampler_packed(x, params: Dict, stats: Dict, *, cin: int, cout: int,
                     train: bool, pallas: bool = False, axis_name=None):
    """x (B, H, W*cin) -> (B, 2H, 2W*cout)."""
    B, H, L = x.shape
    coo, r_in, out_lanes = _upsampler_idx(cin, cout)
    if pallas and out_lanes == 128 and _fused_maps_on():
        return _upsampler_fused(x, params, stats, cin=cin, cout=cout,
                                train=train, axis_name=axis_name)
    kflat = params["conv"]["kernel"].reshape(-1)
    x_next = jnp.concatenate(
        [x[:, 1:], jnp.zeros((B, 1, L), x.dtype)], axis=1)

    bias = params["conv"]["bias"]
    phases = []
    for i in (0, 1):
        acc = None
        for dh, plane in ((0, x), (+1, x_next)):
            if (i, dh) not in coo:
                continue
            maps = _build_maps(coo[(i, dh)], kflat, 128 * r_in, out_lanes)
            term = _apply_maps(plane, maps, r_in)
            acc = term if acc is None else acc + term
        # bias + cast per phase plane, BEFORE the row interleave: the
        # (B, H, 2, L) -> (B, 2H, L) relayout is the single most expensive
        # XLA op of the packed graph (2.8 ms f32 at bs16); doing it in bf16
        # halves that traffic in both directions of autodiff
        acc = acc + _tile_lane(bias, acc.shape[-1], cout)
        phases.append(acc.astype(x.dtype))
    y = jnp.stack(phases, axis=2).reshape(B, 2 * H, phases[0].shape[-1])
    y, bn = batchnorm_packed(y, params["bn"], stats["bn"], cout, train,
                             pallas=pallas, axis_name=axis_name)
    return jax.nn.relu(y), {"bn": bn}


# ----------------------------------------------------------------------
# Output head: ConvTranspose 2x2/s2 VALID (ERFNet.py:124)
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _head_idx(cin: int, cout: int):
    g_in = 128 // cin
    r_in = 1
    while (g_in * r_in * 2 * cout) % 128:
        r_in *= 2
    n_out = g_in * r_in
    out_lanes = n_out * 2 * cout
    maps = {}
    for i in (0, 1):
        m = _CooMaps(128 * r_in, out_lanes, block=(cin, cout, cin, cout))
        for w_out in range(n_out):
            for j in (0, 1):
                for ci in range(cin):
                    for co in range(cout):
                        # flax ConvTranspose applies the spatially FLIPPED
                        # kernel (models/erfnet.py:147, pallas_backbone.py:286)
                        kidx = (((1 - i) * 2 + (1 - j)) * cin + ci) * cout + co
                        m.add(w_out, cin, ci, w_out * 2 * cout + j * cout + co,
                              kidx)
        maps[i] = m.finalize()
    return maps, r_in, out_lanes


def head_plan_maps(params: Dict, cin: int, cout: int):
    """(plan, maps, btile, in_lanes, out_lanes) of the output head for the
    fused lane-map kernels (maps built from the learnable kernel, so grads
    flow through the COO scatter)."""
    coo, r_in, out_lanes = _head_idx(cin, cout)
    in_lanes = 128 * r_in
    kflat = params["kernel"].reshape(-1)
    plan, flat = [], []
    for i in sorted(coo):
        for shift in sorted(coo[i]):
            plan.append((i, 0, shift))
            flat.append(_build_maps({shift: coo[i][shift]}, kflat,
                                    in_lanes, out_lanes)[shift])
    btile = _tile_lane(params["bias"].astype(jnp.float32), 128, cout)[None]
    return tuple(plan), flat, btile, in_lanes, out_lanes


def head_packed(x, params: Dict, *, cin: int, cout: int,
                pallas: bool = False):
    """x (B, H, W*cin) -> (B, 2H, 2W*cout) f32 logits."""
    B, H, L = x.shape
    coo, r_in, out_lanes = _head_idx(cin, cout)
    if pallas and out_lanes == 128 and _fused_maps_on():
        from lanedetection_end2end_tpu.ops.pallas_lanemaps import \
            lane_maps_op
        plan, flat, btile, in_lanes, _ = head_plan_maps(params, cin, cout)
        y, _ = lane_maps_op(x, flat, btile, plan, in_lanes, 2,
                            cout, jnp.float32, False)
        return y
    kflat = params["kernel"].reshape(-1)
    rows = []
    for i in (0, 1):
        maps = _build_maps(coo[i], kflat, 128 * r_in, out_lanes)
        t = _apply_maps(x, maps, r_in)
        rows.append(t + _tile_lane(params["bias"], t.shape[-1],
                                   cout).astype(t.dtype))
    return jnp.stack(rows, axis=2).reshape(
        B, 2 * H, rows[0].shape[-1]).astype(jnp.float32)


# ----------------------------------------------------------------------
# Full backbone forward (encoder + decoder), packed end to end
# ----------------------------------------------------------------------

def erfnet_packed(params: Dict, stats: Dict, images, *, out_channels: int,
                  train: bool, rng=None, use_main_head: bool = True,
                  dropout_1: float = 0.03, dropout_2: float = 0.3,
                  dtype=jnp.bfloat16, pallas_convs: bool = False,
                  axis_name=None, skip_head: bool = False):
    """Packed twin of ERFNet.__call__ (models/erfnet.py:178-194).

    Args:
      params/stats: the `erfnet` subtrees of the flax variables.
      images: (B, H, W, 3) NHWC input.
      use_main_head: selects output_conv vs output_conv2 (pretrain dual head).
      skip_head: return the pre-head plane (B, H/2, W/2*16) instead of the
        logits — for callers fusing the head downstream (head_rowsums_op).
    Returns:
      (enc NHWC (B, H/8, W/8, 128), dec_packed (B, H, W*out_ch) f32 logits,
       new_stats tree mirroring `stats`).
    """
    B, H, W, _ = images.shape
    x = jnp.pad(images.astype(dtype), ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(B, H, W * 4)
    new_enc: Dict[str, Any] = {}
    new_dec: Dict[str, Any] = {}
    ep, es = params["encoder"], stats["encoder"]

    def take_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    x, new_enc["initial_block"] = downsampler_packed(
        x, ep["initial_block"], es["initial_block"], cin=4, cout=16,
        train=train, pallas=pallas_convs, axis_name=axis_name)
    x, new_enc["down1"] = downsampler_packed(
        x, ep["down1"], es["down1"], cin=16, cout=64, train=train,
        pallas=pallas_convs, axis_name=axis_name)
    for name, d in ENC_NB64:
        x, new_enc[name] = nb1d_packed(
            x, ep[name], es[name], C=64, d=d, train=train, drop=dropout_1,
            rng=take_rng(), pallas=pallas_convs, axis_name=axis_name)
    x, new_enc["down2"] = downsampler_packed(
        x, ep["down2"], es["down2"], cin=64, cout=128, train=train,
        pallas=pallas_convs, axis_name=axis_name)
    for name, d in ENC_NB128:
        x, new_enc[name] = nb1d_packed(
            x, ep[name], es[name], C=128, d=d, train=train, drop=dropout_2,
            rng=take_rng(), pallas=pallas_convs, axis_name=axis_name)
    enc = x.reshape(B, H // 8, W // 8, 128)  # C=128: packed == NHWC

    dp, ds = params["decoder"], stats["decoder"]
    y, new_dec["up1"] = upsampler_packed(x, dp["up1"], ds["up1"], cin=128,
                                         cout=64, train=train,
                                         pallas=pallas_convs,
                                         axis_name=axis_name)
    for name, d in DEC_NB64:
        y, new_dec[name] = nb1d_packed(y, dp[name], ds[name], C=64, d=d,
                                       train=train, drop=0.0, rng=None,
                                       pallas=pallas_convs,
                                       axis_name=axis_name)
    y, new_dec["up2"] = upsampler_packed(y, dp["up2"], ds["up2"], cin=64,
                                         cout=16, train=train,
                                         pallas=pallas_convs,
                                         axis_name=axis_name)
    for name, d in DEC_NB16:
        y, new_dec[name] = nb1d_packed(y, dp[name], ds[name], C=16, d=d,
                                       train=train, drop=0.0, rng=None,
                                       pallas=pallas_convs,
                                       axis_name=axis_name)
    new_stats = dict(stats)
    new_stats["encoder"] = {**es, **new_enc}
    new_stats["decoder"] = {**ds, **new_dec}
    if skip_head:
        return enc, y, new_stats
    head_name = "output_conv" if use_main_head else "output_conv2"
    dec = head_packed(y, dp[head_name], cin=16, cout=out_channels,
                      pallas=pallas_convs)
    return enc, dec, new_stats


# ----------------------------------------------------------------------
# Packed e2e tail: activation -> row mask -> separable WLS row sums
# ----------------------------------------------------------------------

def rowsums_packed(dec_packed, act_fn, xs_norm, *, C: int, resize: int,
                   mask_percentage: float):
    """Packed twin of the fused decoder tail (models/fused_graph.py:206-241):
    w = act(dec); S0[b,c,h] = sum_w (w*mask)^2, S1 with the normalized column
    coordinate folded in. Never materializes NHWC weight maps.

    Args:
      dec_packed: (B, H, W*C) f32 logits.
      xs_norm: (W,) the fitter's centered/normalized column coordinate
        (WLSFitter._sep_xs).
    Returns (S0, S1): (B, C, H) each.
    """
    B, H, L = dec_packed.shape
    W = L // C
    w2 = jnp.square(act_fn(dec_packed))
    zero_rows = ceil(resize * mask_percentage)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    w2 = jnp.where(row < zero_rows, 0.0, w2)
    xs_lane = jnp.repeat(xs_norm, C)[None, None, :]  # (1, 1, L)
    sel = jnp.asarray(_chan_select(C))
    z0 = w2.reshape(B, H, L // 128, 128)
    z1 = (w2 * xs_lane).reshape(B, H, L // 128, 128)
    # HIGHEST: the W-axis reduction is the numerically critical step of the
    # fit (ops/wls.py point 5) — it must accumulate the f32 w^2 exactly
    S0 = jnp.einsum("bhgk,kc->bch", z0, sel,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    S1 = jnp.einsum("bhgk,kc->bch", z1, sel,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return S0, S1

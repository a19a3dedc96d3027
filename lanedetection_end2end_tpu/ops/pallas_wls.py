"""Pallas TPU kernel for the weighted-LSQ moment contraction — the hot op.

The fit needs, per (image, lane), the moments

    m[bc, k] = sum_n  w[bc, n]^2 * basis[n, k]          n = H*W pixels

i.e. a (BC, N) x (N, K) matmul with a HUGE contraction axis (N = 131072 at
256x512) and tiny M/N (BC ~ 32, K <= 20 + 4). XLA schedules this shape poorly
on the MXU (~7 ms/batch measured on v5e); this kernel streams N in VMEM-sized
tiles, fuses the squaring of the weight maps into the load, and accumulates
the (BC, K) block in VMEM across grid steps — one HBM pass over the weight
maps and the basis, ~2 orders of magnitude less time.

The backward pass is simple by the chain rule:
    d m / d w:  grad_w[bc, n] = 2 * w[bc, n] * (g @ basis^T)[bc, n]
which is a (BC, K) x (K, N) matmul — K tiny, memory-bound, XLA handles it
well — fused with the elementwise scale (implemented as a custom VJP).

basis is a compile-time constant (geometry), never differentiated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _moments_kernel(w_ref, basis_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:]
    out_ref[:] += jnp.dot(w * w, basis_ref[:],
                          preferred_element_type=jnp.float32)


def _moments_fwd_impl(w, basis, *, tile_n: int, interpret: bool):
    """w: (BC, N) f32; basis: (N, K) f32 -> (BC, K) f32."""
    BC, N = w.shape
    K = basis.shape[1]
    # Pad shapes to hardware tiles: BC to sublane 8, N to tile_n, K to lane 128.
    BCp = _round_up(max(BC, 8), 8)
    Np = _round_up(N, tile_n)
    Kp = _round_up(K, 128)
    if (BCp, Np) != (BC, N):
        w = jnp.pad(w, ((0, BCp - BC), (0, Np - N)))
    if (Np, Kp) != basis.shape:
        basis = jnp.pad(basis, ((0, Np - N), (0, Kp - K)))

    grid = (Np // tile_n,)
    out = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BCp, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BCp, Kp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BCp, Kp), jnp.float32),
        interpret=interpret,
    )(w.astype(jnp.float32), basis.astype(jnp.float32))
    return out[:BC, :K]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def wls_moments(w, basis, tile_n: int = 2048, interpret: bool = False):
    """Fused squared-weight moment contraction: sum_n w^2[., n] basis[n, .].

    Args:
      w: (BC, N) activated+masked weight maps (NOT yet squared).
      basis: (N, K) constant monomial-product basis (ops/wls.py).
    Returns:
      (BC, K) float32 moments.
    """
    return _moments_fwd_impl(w, basis, tile_n=tile_n, interpret=interpret)


def _fwd(w, basis, tile_n, interpret):
    return _moments_fwd_impl(w, basis, tile_n=tile_n, interpret=interpret), (w, basis)


def _bwd(tile_n, interpret, res, g):
    w, basis = res
    # grad_w = 2 w * (g @ basis^T): K is tiny -> XLA handles this fine.
    gw = 2.0 * w * jax.lax.dot_general(
        g, basis, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return gw.astype(w.dtype), None


wls_moments.defvjp(_fwd, _bwd)

"""Profiling harness: single NB1D block kernel, stacked vs per-image grid.

Decision experiment for row-stacking (NB1D_STACK / the prospective
PACKED_STACK): the whole-graph serving kernels OOM the Mosaic compile
helper at stack>=2 (PROFILE_r04.md), so measure the stacking effect where
it CAN compile — one NB1D-128 block (d=2, the encoder's hot shape,
32x(64*128) plane per image) as its own pallas_call:

  STACK=1: grid=(B,),   plane (32, 8192), no junction masks
  STACK=S: grid=(B/S,), plane (S*32, 8192), seg=32 masks

Same FLOPs, same program op-count; stacking multiplies every matmul's M
by S and divides grid steps by S. If this does not win here, stacking the
training kernels (ops/pallas_nb_block.py) is not worth building.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("LANEDET_XLA_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanedetection_end2end_tpu.ops.pallas_nb1d import _nb1d_body

B = int(os.environ.get("BS", "32"))
H, W, C, d = 32, 64, 128, 2
L = W * C
REPS = int(os.environ.get("REPS", "8"))  # block applications per dispatch
INTERPRET = os.environ.get("INTERPRET") == "1"  # CPU correctness check

rng = np.random.default_rng(0)
consts_np = {
    "Kh1": rng.normal(0, .05, (3, 128, 128)), "Kw1": rng.normal(0, .05, (3, 128, 128)),
    "Kh2": rng.normal(0, .05, (3, 128, 128)), "Kw2": rng.normal(0, .05, (3, 128, 128)),
    "b1": rng.normal(0, .05, (1, 128)), "m1": rng.normal(1, .05, (1, 128)),
    "a1": rng.normal(0, .05, (1, 128)), "b3": rng.normal(0, .05, (1, 128)),
    "m2": rng.normal(1, .05, (1, 128)), "a2": rng.normal(0, .05, (1, 128)),
}
NAMES = ("Kh1", "Kw1", "Kh2", "Kw2", "b1", "m1", "a1", "b3", "m2", "a2")
consts = [jnp.asarray(consts_np[k], jnp.bfloat16 if k.startswith("K")
                      else jnp.float32) for k in NAMES]
x = jnp.asarray(rng.normal(0, 1, (B, H, L)), jnp.bfloat16)


def run_block(xb, S):
    seg = H if S > 1 else 0
    Hs = S * H

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        c = tuple(r[:] for r in refs[:-1])
        t = x_ref[0]
        for _ in range(REPS):
            t = _nb1d_body(t, c, H=Hs, L=L, C=C, d=d, interpret=INTERPRET,
                           seg=seg).astype(jnp.bfloat16).reshape(Hs, L)
        out_ref[0] = t

    full = lambda a: pl.BlockSpec(a.shape, lambda b, _n=len(a.shape):
                                  (0,) * _n, memory_space=pltpu.VMEM)
    xf = xb.reshape(B // S, Hs, L)
    return pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[pl.BlockSpec((1, Hs, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in consts],
        out_specs=pl.BlockSpec((1, Hs, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // S, Hs, L), jnp.bfloat16),
        interpret=INTERPRET,
    )(xf, *consts)


for S in (int(s) for s in os.environ.get("STACKS", "1,2,4").split(",")):
    try:
        f = jax.jit(lambda xb, S=S: run_block(xb, S))
        ref = None
        if S > 1:  # parity vs the per-image grid
            a = np.asarray(jax.jit(lambda xb: run_block(xb, 1))(x),
                           np.float32)
            b = np.asarray(f(x), np.float32).reshape(B, H, L)
            err = np.max(np.abs(a.reshape(B, H, L) - b))
            assert err < 1e-1, f"stack parity broke: max err {err}"
        f(x).block_until_ready()
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50):
                out = f(x)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, B * 50 * REPS / dt)
        print(f"BS={B} REPS={REPS} STACK={S}: {best:.1f} block-img/s",
              flush=True)
    except Exception as e:
        print(f"BS={B} REPS={REPS} STACK={S}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

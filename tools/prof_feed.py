"""Host->device feed probe: is sustained-e2e feed bandwidth- or
dispatch-serialization-bound on this host?

Round-4 retraction (PROFILE_r04.md) showed fresh-input train steps cost
180 ms vs 44.9 ms resident at bs32 and blamed the remote-tunnel runtime;
VERDICT r04 asked for proof by construction. This probe measures, on the
real device, with one uint8 batch (the loader's image payload):

  put_sync      : device_put + block, per batch     (raw feed ceiling)
  put_pipelined : issue put n+1 before blocking n   (does async dispatch
                                                     overlap transfers?)
  put_overlap   : device_put while a jitted matmul chain runs on resident
                  data (does a transfer overlap compute at all?)
  step_resident : train-proxy compute on a resident batch (baseline)
  step_fresh    : device_put + compute, sequential   (the naive e2e loop)
  step_lookahead: put batch n+1 async, then compute batch n (the
                  software-pipelined loop DevicePrefetcher(depth=0) runs
                  after the r05 lookahead change)

If put_sync bytes/s ~= step_fresh's implied feed rate and pipelining/
overlap do not raise it, the tunnel serializes transfers with dispatch and
no host-side restructuring can help (the PCIe-convergence claim stands as
strong as it can be measured here)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("LANEDET_XLA_CACHE", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BS = int(os.environ.get("BS", "32"))
N = int(os.environ.get("N", "20"))
dev = jax.devices()[0]
batch = (np.random.default_rng(0).integers(0, 255, (BS, 256, 512, 3))
         .astype(np.uint8))
mb = batch.nbytes / 1e6


def report(name, dt, n=N):
    print(f"{name:16s} {n * mb / dt:8.1f} MB/s  {n * BS / dt:8.1f} img/s  "
          f"({dt / n * 1e3:.1f} ms/batch)", flush=True)


# warm
jax.device_put(batch, dev).block_until_ready()

# 1. synchronous puts
t0 = time.perf_counter()
for _ in range(N):
    jax.device_put(batch, dev).block_until_ready()
report("put_sync", time.perf_counter() - t0)

# 2. pipelined puts (issue before blocking the previous)
t0 = time.perf_counter()
prev = None
for _ in range(N):
    cur = jax.device_put(batch, dev)
    if prev is not None:
        prev.block_until_ready()
    prev = cur
prev.block_until_ready()
report("put_pipelined", time.perf_counter() - t0)

# 3. put overlapped with resident compute
a = jax.device_put(np.random.default_rng(1).normal(
    0, 1, (2048, 2048)).astype(np.float32), dev)


@jax.jit
def burn(a):
    for _ in range(30):
        a = jnp.tanh(a @ a) * 1e-3
    return a


burn(a).block_until_ready()
t0 = time.perf_counter()
out = burn(a)
comp_only = None
for _ in range(N):
    jax.device_put(batch, dev).block_until_ready()
out.block_until_ready()
report("put_overlap", time.perf_counter() - t0)
t0 = time.perf_counter()
burn(a).block_until_ready()
print(f"burn alone: {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

# 4/5/6. compute proxy on the batch (cheap cast+reduce, stands in for the
# train step's input consumption; the real step adds its own compute)
@jax.jit
def consume(x, a):
    v = x.astype(jnp.float32).mean()
    for _ in range(30):
        a = jnp.tanh(a @ a) * (1e-3 + v * 0)
    return a

resident = jax.device_put(batch, dev)
consume(resident, a).block_until_ready()
t0 = time.perf_counter()
for _ in range(N):
    out = consume(resident, a)
out.block_until_ready()
report("step_resident", time.perf_counter() - t0)

t0 = time.perf_counter()
for _ in range(N):
    d = jax.device_put(batch, dev)
    out = consume(d, a)
out.block_until_ready()
report("step_fresh", time.perf_counter() - t0)

t0 = time.perf_counter()
pending = jax.device_put(batch, dev)
for _ in range(N):
    nxt = jax.device_put(batch, dev)   # async issue for "n+1"
    out = consume(pending, a)
    pending = nxt
out.block_until_ready()
report("step_lookahead", time.perf_counter() - t0)

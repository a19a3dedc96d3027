"""Profiling harness: trace the packed e2e train step on TPU.

The serving path has a committed per-kernel breakdown (PROFILE_r04.md,
via tools/prof_infer.py); this is the training twin — one jitted e2e
train step (fwd + bwd + adam + BN stats) on the flagship train.sh
config, traced with jax.profiler and summarized per op class so the
next round knows where the ~637 img/s (bs32, fused blocks on) goes.

Env: BS (default 32), BENCH_PACKED ("0"/"1" force packed path),
PACKED_FUSED_BLOCKS (default on).
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

from lanedetection_end2end_tpu.config import train_sh_config
from lanedetection_end2end_tpu.data import SyntheticLanes
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.train import define_optim, make_train_step
from lanedetection_end2end_tpu.train.state import init_train_state
from lanedetection_end2end_tpu.utils.profiling import trace, summarize

bs = int(os.environ.get("BS", "32"))
packed = os.environ.get("BENCH_PACKED")
cfg = train_sh_config(resize=256, batch_size=bs, reg_ls=1.0,
                      packed_train=None if packed is None
                      else bool(int(packed)))
lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    variables = lanenet.init(jax.random.PRNGKey(0))
variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
tx = define_optim(cfg.optimizer, cfg.learning_rate)
state = jax.device_put(init_train_state(variables, tx), jax.devices()[0])
step = make_train_step(lanenet, cfg, tx, "e2e")
batch = jax.device_put(SyntheticLanes(bs, cfg.resize, cfg.nclasses,
                                      "bp").batch())
rng = jax.random.PRNGKey(1)
for _ in range(3):
    state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
for _ in range(20):
    state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
dt = time.perf_counter() - t0
print(f"throughput {bs*20/dt:.1f} img/s  ({dt/20*1e3:.2f} ms/batch)")
N = 10
with trace("/tmp/trace_train") as t:
    for _ in range(N):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
print(summarize(t.dir, iters=N).format(top=40))

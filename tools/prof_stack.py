"""Profiling harness: measure NB1D_STACK serving variants on TPU."""
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
from lanedetection_end2end_tpu.eval.projections import Projections
from lanedetection_end2end_tpu.eval.test_driver import make_infer_fn
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.models.infer_engine import FusedLaneNetEngine

bs = int(os.environ.get("BS", "32"))
cfg = train_sh_config(resize=256, batch_size=bs, reg_ls=1.0)
lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    variables = lanenet.init(jax.random.PRNGKey(0))
variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
images = jnp.asarray(np.random.default_rng(0).uniform(
    0, 1, (bs, cfg.image_height, cfg.image_width, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

for stack in os.environ.get("STACKS", "2,4,1").split(","):
    os.environ["NB1D_STACK"] = stack
    try:
        engine = FusedLaneNetEngine(cfg, dtype=jnp.bfloat16)
        packed = jax.device_put(engine.prepare(variables), jax.devices()[0])
        infer = make_infer_fn(lanenet, cfg,
                              Projections(cfg.resize, cfg.order,
                                          cfg.no_mapping),
                              engine, packed)
        for _ in range(5):
            infer(variables, images).block_until_ready()
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                out = infer(variables, images)
            out.block_until_ready()
            best = max(best, bs * 30 / (time.perf_counter() - t0))
        print(f"BS={bs} STACK={stack}: {best:.1f} img/s", flush=True)
    except Exception as e:
        print(f"BS={bs} STACK={stack}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)

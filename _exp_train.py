"""Train-step experiments: new maxpool, remat, batch size; engine bs64."""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lanedet_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

from lanedetection_end2end_tpu.config import train_sh_config
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.data import SyntheticLanes
from lanedetection_end2end_tpu.train import define_optim
from lanedetection_end2end_tpu.train.state import init_train_state, TrainState
from lanedetection_end2end_tpu.train.steps import make_loss_fn


def bench_step(bs, remat, iters=20):
    cfg = train_sh_config(resize=256, batch_size=bs, reg_ls=1.0,
                          packed_train=False)
    lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = lanenet.init(jax.random.PRNGKey(0))
    variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
    tx = define_optim(cfg.optimizer, cfg.learning_rate)
    state = jax.device_put(init_train_state(variables, tx), jax.devices()[0])
    loss_fn = make_loss_fn(lanenet, cfg, "e2e", train=True)
    if remat:
        inner = jax.checkpoint(
            lambda p, bsatts, b, r: loss_fn(p, bsatts, b, r))
    else:
        inner = loss_fn

    def step(state, batch, rng):
        grad_fn = jax.value_and_grad(inner, has_aux=True)
        (_, (metrics, _, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        return TrainState(new_params, new_bs, new_opt), metrics

    step = jax.jit(step, donate_argnums=(0,))
    batch = jax.device_put(SyntheticLanes(bs, 256, 4, "bp").batch())
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train bs{bs} remat={remat}: {dt*1e3:.2f} ms/step "
          f"({bs/dt:.0f} img/s)", flush=True)
    return bs / dt


r1 = bench_step(8, False)
r2 = bench_step(8, True)
r3 = bench_step(16, r2 > r1)

# engine inference at bs64
from lanedetection_end2end_tpu.eval.projections import Projections
from lanedetection_end2end_tpu.eval.test_driver import make_infer_fn
from lanedetection_end2end_tpu.models.infer_engine import FusedLaneNetEngine
BS = 64
cfg = train_sh_config(resize=256, batch_size=BS, reg_ls=1.0)
lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    variables = lanenet.init(jax.random.PRNGKey(0))
variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
engine = FusedLaneNetEngine(cfg, dtype=jnp.bfloat16)
packed = jax.device_put(engine.prepare(variables), jax.devices()[0])
infer = make_infer_fn(lanenet, cfg,
                      Projections(cfg.resize, cfg.order, cfg.no_mapping),
                      engine, packed)
images = jnp.asarray(np.random.default_rng(0).uniform(
    0, 1, (BS, 256, 512, 3)).astype(np.float32)).astype(jnp.bfloat16)
for _ in range(5):
    infer(variables, images).block_until_ready()
t0 = time.perf_counter()
for _ in range(50):
    out = infer(variables, images)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 50
print(f"engine infer bs64: {dt*1e3:.2f} ms ({BS/dt:.0f} img/s)")

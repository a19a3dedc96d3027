import os, re
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lanedet_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from lanedetection_end2end_tpu.config import train_sh_config
from lanedetection_end2end_tpu.models import LaneNet
from lanedetection_end2end_tpu.data import SyntheticLanes
from lanedetection_end2end_tpu.train import define_optim, make_train_step
from lanedetection_end2end_tpu.train.state import init_train_state

BS = 32
cfg = train_sh_config(resize=256, batch_size=BS, reg_ls=1.0,
                      packed_train=True)
lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    variables = lanenet.init(jax.random.PRNGKey(0))
variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
tx = define_optim(cfg.optimizer, cfg.learning_rate)
state = jax.device_put(init_train_state(variables, tx), jax.devices()[0])
step = make_train_step(lanenet, cfg, tx, "e2e", donate=False)
batch = jax.device_put(SyntheticLanes(BS, cfg.resize, cfg.nclasses,
                                      "bp").batch())
rng = jax.random.PRNGKey(1)
txt = step.lower(state, batch, rng).compile().as_text()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(txt)
for m in re.finditer(r"^\s*%?(reshape\.\d+) = (.*)$", txt, re.M):
    name, rest = m.groups()
    print(name, "::", rest[:160])

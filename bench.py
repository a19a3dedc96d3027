#!/usr/bin/env python
"""Throughput benchmark: images/sec/chip at 256x512, with repeats + medians.

Prints ONE JSON line per completed stage (the LAST line is always the most
complete result — a harness that kills the process mid-run can still parse
the latest line). The headline metric is FIXED at end-to-end inference,
batch 32 (ERFNet forward -> activation/mask -> weighted-LSQ fit ->
line/horizon gating -> backprojection to TuSimple coordinates):

  {"metric": "inference_images_per_sec_per_chip_256x512_bs32_tpu",
   "value": <median over repeats>, "unit": "images/sec",
   "vs_baseline": <value / 50>,
   "detail": {"infer": {...}, "train": {...}, "pipeline": {...},
              "e2e": {...}, "infer_bs128": {...}, "wall_s": ...}}

The headline stays at bs32 across rounds for comparability; the bs128 sweep
point (bigger batch amortizes the fixed ~0.6 ms dispatch, +6% measured r04)
is reported in `detail.infer_bs128` only, and only when the wall budget
allows its extra compile.

Budget management (r04 post-mortem: the driver's run timed out with NO
parseable output, rc=124): the orchestrator tracks a global wall budget
(env BENCH_BUDGET_S, default 1800 s), gives each mode's subprocess only the
remaining budget, skips modes whose cold-compile floor no longer fits, and
emits the cumulative JSON line after every mode. Per-mode wall floors
(cold-compile and warm-cache tiers, both measured on the v5e bench host
2026-08-20) are in _MODE_FLOOR_COLD_S/_MODE_FLOOR_WARM_S; the warm tier
applies when the repo-local .xla_cache has entries, with a per-child
watchdog + cache-bypass retry in case those entries are stale or the
cache read wedges.

Baseline: the reference writes `run_time = 20` ms/image into its TuSimple
submissions (Backprojection_Loss/test.py:97) => 50 images/sec on its
unspecified single GPU. `vs_baseline` is measured-throughput / 50.

Why one subprocess per mode (measured, PROFILE_r04.md "contamination
retraction"): after the big infer/train phases, the same process's
device_put path degrades ~10x (tunnel/runtime state), so host-feed modes
measured late in a shared process understate by an order of magnitude.
The repo-local persistent compile cache (.xla_cache, gitignored) makes the
per-process compile cost a cache read for repeat runs in the same axon
service epoch; across epochs a rotating compile-option token invalidates
every entry, so the driver's run is planned as all-cold.

Env knobs: BENCH_MODE=infer|train|pipeline|e2e|infer128|all (default all on
TPU, infer elsewhere), BENCH_BUDGET_S=1800, BENCH_TRAIN_BS=32,
BENCH_DTYPE=f32, BENCH_REPEATS=3, BENCH_PACKED=0/1 (force packed/flax train
graph), BENCH_SUBPROC=0 (run modes in one shared process).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_T0 = time.monotonic()
_REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_IMG_PER_SEC = 50.0  # 20 ms/image claimed by the reference

# Wall floors (s) per mode: a mode is skipped (with a note in detail)
# when the remaining budget is below its floor + margin. Two tiers,
# both measured on the v5e bench host via the axon tunnel (2026-08-20
# full cold run: wall_s 3311 total):
#   cold — backend init ~15 s + Mosaic/XLA compile + data + iterations;
#   warm — a same-epoch repo-local .xla_cache turns each compile into
#          a cache read (measured: warm infer mode wall 343 s vs 762).
# The warm tier is used when the cache dir already holds entries. An
# over-optimistic warm pick cannot poison the output: each child is
# still hard-bounded by the remaining budget, and a timed-out child
# contributes an error entry while earlier modes' results stand.
_MODE_FLOOR_COLD_S = {
    "infer": 900,      # measured 762-843: whole-graph Mosaic compile
    "train": 300,      # measured 419 banded / 169 direct-tap default
    "pipeline": 60,    # measured 6-36: host-only + h2d probe
    "e2e": 700,       # 896 banded-era; direct-tap step compiles faster
    "infer128": 1300,  # measured 1234: second engine compile at bs128
}
_MODE_FLOOR_WARM_S = {
    "infer": 120, "train": 120, "pipeline": 60, "e2e": 220,
    # bs128 is a different HLO from the bs32 engine, so it is cold unless a
    # full run already compiled it THIS epoch; demand real headroom.
    "infer128": 700,
}
_MARGIN_S = 30.0


def _cache_warm() -> bool:
    cache = os.environ.get("LANEDET_XLA_CACHE",
                           os.path.join(_REPO, ".xla_cache"))
    try:
        return any(n.endswith("-cache") for n in os.listdir(cache))
    except OSError:
        return False


def _mode_floor(mode: str) -> float:
    return (_MODE_FLOOR_WARM_S if _cache_warm() else _MODE_FLOOR_COLD_S)[mode]


def _budget() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "1800"))


def _remaining() -> float:
    return _budget() - (time.monotonic() - _T0) - _MARGIN_S


def _setup_jax():
    """Configure + import jax (child processes / single-mode runs only)."""
    import jax
    # Persistent compilation cache: the fused kernels take minutes to
    # compile over the remote-compile tunnel; repeated runs in the SAME
    # service epoch hit the repo-local cache (gitignored — the axon
    # service rotates a compile-option token across restarts, so entries
    # do not survive an epoch and committing them is dead weight).
    # Override with LANEDET_XLA_CACHE (falls back to ~/.cache for
    # read-only checkouts).
    cache = os.environ.get("LANEDET_XLA_CACHE",
                           os.path.join(_REPO, ".xla_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        probe = os.path.join(cache, ".write_probe")
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        cache = os.path.expanduser("~/.cache/lanedet_xla")
        os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # LANEDET_PLATFORM=cpu forces the CPU backend before first backend use
    # (see main.py: env vars are read too early by plugin sites, and
    # enumerating backends can block on an unreachable remote device).
    if os.environ.get("LANEDET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LANEDET_PLATFORM"])
    return jax


def _stats(samples):
    return {"median": round(statistics.median(samples), 2),
            "min": round(min(samples), 2), "max": round(max(samples), 2),
            "repeats": len(samples)}


def _repeats() -> int:
    return int(os.environ.get("BENCH_REPEATS", "3"))


# ----------------------------------------------------------------------
# Modes (each runs in its own subprocess under the orchestrator)
# ----------------------------------------------------------------------

def bench_infer(batch_size: int, dtype, warmup: int = 5, iters: int = 50,
                use_engine: bool = True) -> list:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.eval.projections import Projections
    from lanedetection_end2end_tpu.eval.test_driver import make_infer_fn
    from lanedetection_end2end_tpu.models import LaneNet

    cfg = train_sh_config(resize=256, batch_size=batch_size, reg_ls=1.0)
    lanenet = LaneNet(cfg, dtype=dtype)
    # init on CPU: avoids paying a TPU compile for parameter initialization
    with jax.default_device(jax.devices("cpu")[0]):
        variables = lanenet.init(jax.random.PRNGKey(0))
    variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
    engine = packed = None
    if use_engine and jax.devices()[0].platform != "cpu":
        from lanedetection_end2end_tpu.models.infer_engine import \
            FusedLaneNetEngine
        engine = FusedLaneNetEngine(cfg, dtype=dtype)
        packed = jax.device_put(engine.prepare(variables), jax.devices()[0])
    infer = make_infer_fn(lanenet, cfg,
                          Projections(cfg.resize, cfg.order, cfg.no_mapping),
                          engine, packed)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(
            0, 1, (batch_size, cfg.image_height, cfg.image_width, 3)
        ).astype(np.float32)).astype(dtype)
    for _ in range(warmup):
        infer(variables, images).block_until_ready()
    samples = []
    for _ in range(_repeats()):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, images)
        out.block_until_ready()
        samples.append(batch_size * iters / (time.perf_counter() - t0))
    return samples


def _train_setup(batch_size: int):
    import jax
    import jax.numpy as jnp
    from lanedetection_end2end_tpu.config import train_sh_config
    from lanedetection_end2end_tpu.models import LaneNet
    from lanedetection_end2end_tpu.train import define_optim, make_train_step
    from lanedetection_end2end_tpu.train.state import init_train_state

    packed = os.environ.get("BENCH_PACKED")  # "0"/"1" force; unset = auto
    cfg = train_sh_config(resize=256, batch_size=batch_size, reg_ls=1.0,
                          packed_train=None if packed is None
                          else bool(int(packed)))
    lanenet = LaneNet(cfg, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = lanenet.init(jax.random.PRNGKey(0))
    variables = jax.device_put(jax.device_get(variables), jax.devices()[0])
    tx = define_optim(cfg.optimizer, cfg.learning_rate)
    state = jax.device_put(init_train_state(variables, tx), jax.devices()[0])
    step = make_train_step(lanenet, cfg, tx, "e2e")
    return cfg, state, step


def bench_train(batch_size: int, warmup: int = 3, iters: int = 20) -> list:
    """Training throughput (img/s): full jitted e2e train step (fwd + bwd +
    adam + BN stats) on the flagship config."""
    import jax
    from lanedetection_end2end_tpu.data import SyntheticLanes

    cfg, state, step = _train_setup(batch_size)
    batch = jax.device_put(
        SyntheticLanes(batch_size, cfg.resize, cfg.nclasses, "bp").batch())
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    samples = []
    for _ in range(_repeats()):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rng)
        jax.block_until_ready(m["loss"])
        samples.append(batch_size * iters / (time.perf_counter() - t0))
    return samples


def _bench_dataset(batch_size: int, num_images: int):
    from lanedetection_end2end_tpu.data import (
        LaneDataset, Loader, make_synthetic_root)

    root = os.path.expanduser(f"~/.cache/lanedet_bench_data_{num_images}")
    marker = os.path.join(root, "Labels", "lanes_ordered.json")
    if os.path.exists(marker):
        paths = {"image_dir": os.path.join(root, "images"),
                 "gt_dir": os.path.join(root, "ground_truth"),
                 "lanes_file": marker,
                 "line_file": os.path.join(root, "Labels", "label_new.json")}
    else:
        paths = make_synthetic_root(root, num_train=num_images, num_test=1,
                                    seed=0)
    ds = LaneDataset("bp", paths["image_dir"], paths["gt_dir"], valid_idx=[],
                     resize=256, nclasses=4, flip_on=True,
                     lanes_file=paths["lanes_file"],
                     line_file=paths["line_file"], image_dtype="uint8",
                     cache_dir=os.path.join(root, "u8cache"))
    loader = Loader(ds, range(num_images), batch_size, shuffle=True,
                    flip=True, nworkers=int(os.environ.get("BENCH_WORKERS",
                                                           "16")))
    return ds, loader


def pipeline_stage_split(loader, batch_size: int) -> dict:
    """Per-stage throughput (img/s) of one warm epoch, measured in
    isolation: decode+labels (dataset fetch), collate, H2D device_put.
    Names the binding stage of the composed pipeline number."""
    import jax
    from lanedetection_end2end_tpu.data.loader import collate
    ds = loader.dataset
    n = min(len(loader.indices), 12 * batch_size)
    t0 = time.perf_counter()
    samples = [ds.__getitem__(int(i), flip=bool(i % 2))
               for i in loader.indices[:n]]
    t_fetch = time.perf_counter() - t0
    batches = [samples[i:i + batch_size]
               for i in range(0, n - batch_size + 1, batch_size)]
    t0 = time.perf_counter()
    collated = [collate(b) for b in batches]
    t_collate = time.perf_counter() - t0
    t0 = time.perf_counter()
    for c in collated:
        jax.block_until_ready(jax.device_put(c)["image"])
    t_h2d = time.perf_counter() - t0
    nb = len(batches) * batch_size
    return {"fetch_img_s": round(n / t_fetch, 2),
            "collate_img_s": round(nb / max(t_collate, 1e-9), 2),
            "h2d_img_s": round(nb / t_h2d, 2)}


def bench_pipeline(batch_size: int, num_images: int = 96, epochs: int = 4
                   ) -> tuple:
    """Host input-pipeline throughput (img/s): PNG decode -> crop/resize
    (C++ laneops) -> collate -> sharded device_put, via
    LaneDataset -> Loader -> DevicePrefetcher. Demonstrates the host feed can
    sustain the device rate (the pin_memory DataLoader analog it replaces,
    Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:318-324). Returns
    (samples, stage_split)."""
    import jax
    from lanedetection_end2end_tpu.data import DevicePrefetcher

    ds, loader = _bench_dataset(batch_size, num_images)
    # On 1-core hosts with a remote-tunneled device, background threads only
    # convoy the GIL against the RPC layer; run synchronously there.
    depth = 2 if (os.cpu_count() or 1) > 1 else 0
    # warmup epoch (thread pools, native lib build, image cache)
    for batch in DevicePrefetcher(loader, depth=depth):
        jax.block_until_ready(batch["image"])
    samples = []
    for rep in range(_repeats()):
        count = 0
        t0 = time.perf_counter()
        for epoch in range(epochs):
            loader.set_epoch(rep * epochs + epoch)
            for batch in DevicePrefetcher(loader, depth=depth):
                jax.block_until_ready(batch["image"])
                count += batch["image"].shape[0]
        samples.append(count / (time.perf_counter() - t0))
    return samples, pipeline_stage_split(loader, batch_size)


def bench_e2e(batch_size: int, num_images: int = 96, epochs: int = 3) -> list:
    """Sustained end-to-end training throughput (img/s): PNG decode ->
    crop/resize -> collate -> device_put (overlapped via DevicePrefetcher)
    -> jitted e2e train step, one stream. The honest composition of the
    `train` (pre-staged tensors) and `pipeline` (host only) numbers.
    Reference anchor: the DataLoader+pin_memory loop it replaces
    (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:318-324,
    main.py:200-270)."""
    import jax
    from lanedetection_end2end_tpu.data import DevicePrefetcher

    cfg, state, step = _train_setup(batch_size)
    ds, loader = _bench_dataset(batch_size, num_images)
    depth = 2 if (os.cpu_count() or 1) > 1 else 0
    rng = jax.random.PRNGKey(1)
    # warmup epoch: compiles (cached from bench_train), image cache, pools
    for batch in DevicePrefetcher(loader, depth=depth):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    samples = []
    for rep in range(_repeats()):
        count = 0
        t0 = time.perf_counter()
        for epoch in range(epochs):
            loader.set_epoch(100 + rep * epochs + epoch)
            for batch in DevicePrefetcher(loader, depth=depth):
                state, m = step(state, batch, rng)
                count += batch_size
        jax.block_until_ready(m["loss"])
        samples.append(count / (time.perf_counter() - t0))
    return samples


# ----------------------------------------------------------------------
# Orchestration
# ----------------------------------------------------------------------

def _run_single_mode(mode: str) -> dict:
    """Run one mode in THIS process; returns its detail-dict fragment."""
    import jax.numpy as jnp
    train_bs = int(os.environ.get("BENCH_TRAIN_BS", "32"))
    dtype = (jnp.float32 if os.environ.get("BENCH_DTYPE") == "f32"
             else jnp.bfloat16)
    if mode == "infer":
        bs = int(os.environ.get("BENCH_BATCH_SIZES", "32").split(",")[0])
        return {"infer": {**_stats(bench_infer(bs, dtype)),
                          "batch_size": bs}}
    if mode == "infer128":
        return {"infer_bs128": {**_stats(bench_infer(128, dtype)),
                                "batch_size": 128}}
    if mode == "train":
        return {"train": {**_stats(bench_train(train_bs)),
                          "batch_size": train_bs}}
    if mode == "pipeline":
        s, stages = bench_pipeline(train_bs)
        return {"pipeline": {**_stats(s), "batch_size": train_bs,
                             "stages": stages}}
    if mode == "e2e":
        return {"e2e": {**_stats(bench_e2e(train_bs)),
                        "batch_size": train_bs}}
    raise ValueError(f"unknown BENCH_MODE {mode!r}")


def _emit(detail: dict, platform: str):
    """Print the cumulative headline JSON line (the last one printed wins)."""
    head_key = next((k for k in ("infer", "train", "pipeline", "e2e")
                     if isinstance(detail.get(k), dict)
                     and "median" in detail[k]), None)
    name = {"train": "train_images_per_sec_per_chip_256x512",
            "pipeline": "input_pipeline_images_per_sec_256x512",
            "e2e": "e2e_train_images_per_sec_256x512",
            "infer": "inference_images_per_sec_per_chip_256x512",
            None: "inference_images_per_sec_per_chip_256x512"}[head_key]
    head = detail.get(head_key, {})
    value = head.get("median")
    bs = head.get("batch_size", 32)
    detail = dict(detail, wall_s=round(time.monotonic() - _T0, 1))
    print(json.dumps({
        "metric": f"{name}_bs{bs}_{platform}",
        "value": value,
        "unit": "images/sec",
        "vs_baseline": (round(value / BASELINE_IMG_PER_SEC, 3)
                        if value is not None else None),
        "detail": detail,
    }), flush=True)


def _run_mode_subprocess(mode: str, timeout_s: float) -> dict:
    """Run one bench mode in a FRESH interpreter; returns its detail dict.

    Measured motivation (PROFILE_r04.md "contamination retraction"): after
    the big infer/train phases, the same process's device_put path degrades
    ~10x (tunnel/runtime state), so host-feed modes measured late in a
    shared process understate by an order of magnitude. Each mode gets a
    clean process; the persistent compile cache keeps that cheap."""
    import subprocess
    env = dict(os.environ, BENCH_MODE=mode, BENCH_SUBPROC="0")
    if os.environ.get("_BENCH_NO_CACHE_READ") == "1":
        # Retry path: point the child at a fresh cache dir so a hung
        # persistent-cache read cannot recur; writes there are discarded.
        import tempfile
        env["LANEDET_XLA_CACHE"] = tempfile.mkdtemp(prefix="lanedet_xla_")
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=max(timeout_s, 1.0))
    except subprocess.TimeoutExpired:
        return {mode: {"error": f"timeout after {timeout_s:.0f}s"}}
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        return {mode: {"error": f"rc={proc.returncode}"}}
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])["detail"]
    except (ValueError, IndexError, KeyError) as e:
        return {mode: {"error": f"unparseable child output: {e}"}}


# Per-child watchdog bound when cache entries exist: covers both a warm
# hit (observed warm infer = 343 s: trace + deserialize + measure) and a
# stale-key miss that falls back to a full compile (the axon service
# rotates a compile-option token across restarts, so entries from an
# earlier service epoch silently miss). If the child exceeds this, the
# persistent-cache read path is assumed wedged (observed once on
# 2026-08-20: a repo-cache read that never returned in 1470 s while cold
# compiles of the same program completed in 762 s) and the mode is
# retried once with cache reads disabled, bounded by the remaining
# budget. Keeps one hung cache read from eating the whole budget.
_WARM_TRY_S = {
    "infer": 1000, "train": 700, "pipeline": 300,
    "e2e": 1000, "infer128": 1300,
}


def _orchestrate():
    """Parent: schedule modes within the global budget, one subprocess
    each, emitting the cumulative JSON line after every mode. Does NOT
    initialize a JAX backend (that costs ~15 s over the tunnel)."""
    platform = os.environ.get("BENCH_PLATFORM_HINT", "tpu")
    detail = {}
    modes = ["infer", "train", "pipeline", "e2e", "infer128"]
    warm = _cache_warm()
    for mode in modes:
        rem = _remaining()
        floor = _mode_floor(mode)
        if rem < floor:
            key = "infer_bs128" if mode == "infer128" else mode
            detail[key] = {"skipped":
                           f"budget: {rem:.0f}s left < {floor}s floor"}
            _emit(detail, platform)
            continue
        bound = min(_remaining(), _WARM_TRY_S[mode]) if warm else _remaining()
        res = _run_mode_subprocess(mode, bound)
        key = next(iter(res))
        if (warm and isinstance(res.get(key), dict)
                and "timeout" in str(res[key].get("error", ""))
                and _remaining() >= _MODE_FLOOR_COLD_S[mode]):
            os.environ["_BENCH_NO_CACHE_READ"] = "1"
            try:
                res = _run_mode_subprocess(mode, _remaining())
            finally:
                os.environ.pop("_BENCH_NO_CACHE_READ", None)
        detail.update(res)
        _emit(detail, platform)


def main():
    mode = os.environ.get("BENCH_MODE")
    subproc = os.environ.get("BENCH_SUBPROC", "1") != "0"
    if (mode is None or mode == "all") and subproc:
        # Orchestrate WITHOUT initializing a backend in this process.
        _orchestrate()
        return

    jax = _setup_jax()
    platform = jax.devices()[0].platform
    if mode is None or mode == "all":
        # Shared-process fallback (BENCH_SUBPROC=0 + BENCH_MODE=all):
        # honest but known to understate the host-feed modes (see
        # _run_mode_subprocess docstring).
        detail = {}
        for m in ("infer", "train", "pipeline", "e2e"):
            if platform == "cpu" and m != "infer":
                continue
            detail.update(_run_single_mode(m))
            _emit(detail, platform)
        return
    _emit(_run_single_mode(mode), platform)


if __name__ == "__main__":
    main()

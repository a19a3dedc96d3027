#!/usr/bin/env python
"""Throughput benchmark: images/sec/chip at 256x512, with repeats + medians.

Measures three throughputs and prints ONE JSON line whose headline metric is
end-to-end inference (ERFNet forward -> activation/mask -> weighted-LSQ fit
-> line/horizon gating -> backprojection to TuSimple coordinates):

  {"metric": "inference_images_per_sec_per_chip_256x512_...",
   "value": <median over repeats>, "unit": "images/sec",
   "vs_baseline": <value / 50>,
   "detail": {"infer": {...}, "train": {...}, "pipeline": {...}}}

Each mode is timed `BENCH_REPEATS` times (default 3) after shared warmup and
reports median/min/max so round-over-round deltas are distinguishable from
run-to-run noise (r01->r02 moved 2.5% with no code change on the inference
path — inside single-run noise).

Baseline: the reference writes `run_time = 20` ms/image into its TuSimple
submissions (Backprojection_Loss/test.py:97) => 50 images/sec on its
unspecified single GPU. `vs_baseline` is measured-throughput / 50.

Env knobs: BENCH_MODE=infer|train|pipeline|all (default all on TPU, infer
elsewhere), BENCH_BATCH_SIZES=8,32 (infer sweep; best-by-median wins),
BENCH_TRAIN_BS=32 (train/pipeline/e2e batch), BENCH_DTYPE=f32,
BENCH_REPEATS=3, BENCH_PACKED=0/1 (force packed/flax train graph).
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np
import jax

# Persistent compilation cache: the fused kernels take minutes to compile
# over the remote-compile tunnel; cache them across bench invocations.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/lanedet_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# LANEDET_PLATFORM=cpu forces the CPU backend before first backend use (see
# main.py: env vars are read too early by plugin sites, and enumerating
# backends can block on an unreachable remote device).
if os.environ.get("LANEDET_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["LANEDET_PLATFORM"])

import jax.numpy as jnp

from lanedetection_end2end_tpu.config import train_sh_config
from lanedetection_end2end_tpu.eval.projections import Projections
from lanedetection_end2end_tpu.eval.test_driver import make_infer_fn
from lanedetection_end2end_tpu.models import LaneNet

BASELINE_IMG_PER_SEC = 50.0  # 20 ms/image claimed by the reference
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _stats(samples):
    return {"median": round(statistics.median(samples), 2),
            "min": round(min(samples), 2), "max": round(max(samples), 2),
            "repeats": len(samples)}


def bench_infer(batch_size: int, dtype, warmup: int = 5, iters: int = 50,
                use_engine: bool = True) -> list:
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
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, images)
        out.block_until_ready()
        samples.append(batch_size * iters / (time.perf_counter() - t0))
    return samples


def bench_train(batch_size: int, warmup: int = 3, iters: int = 20) -> list:
    """Training throughput (img/s): full jitted e2e train step (fwd + bwd +
    adam + BN stats) on the flagship config."""
    from lanedetection_end2end_tpu.data import SyntheticLanes
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
    batch = jax.device_put(
        SyntheticLanes(batch_size, cfg.resize, cfg.nclasses, "bp").batch())
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    samples = []
    for _ in range(REPEATS):
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
    from lanedetection_end2end_tpu.data.loader import collate
    ds = loader.dataset
    n = min(len(loader.indices), 4 * batch_size)
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
    from lanedetection_end2end_tpu.data import DevicePrefetcher

    ds, loader = _bench_dataset(batch_size, num_images)
    # On 1-core hosts with a remote-tunneled device, background threads only
    # convoy the GIL against the RPC layer; run synchronously there.
    depth = 2 if (os.cpu_count() or 1) > 1 else 0
    # warmup epoch (thread pools, native lib build, image cache)
    for batch in DevicePrefetcher(loader, depth=depth):
        jax.block_until_ready(batch["image"])
    samples = []
    for rep in range(REPEATS):
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
    `train` (pre-staged tensors) and `pipeline` (host only) numbers: on a
    1-core host the loader binds and this reports the host ceiling; on a
    production host it converges to the train number. Reference anchor: the
    DataLoader+pin_memory loop it replaces
    (Birds_Eye_View_Loss/Dataloader/Load_Data_new.py:318-324,
    main.py:200-270)."""
    from lanedetection_end2end_tpu.data import DevicePrefetcher
    from lanedetection_end2end_tpu.train import define_optim, make_train_step
    from lanedetection_end2end_tpu.train.state import init_train_state
    from lanedetection_end2end_tpu.models import LaneNet

    packed = os.environ.get("BENCH_PACKED")
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

    ds, loader = _bench_dataset(batch_size, num_images)
    depth = 2 if (os.cpu_count() or 1) > 1 else 0
    rng = jax.random.PRNGKey(1)
    # warmup epoch: compiles (cached from bench_train), image cache, pools
    for batch in DevicePrefetcher(loader, depth=depth):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    samples = []
    for rep in range(REPEATS):
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


def _run_mode_subprocess(mode: str) -> dict:
    """Run one bench mode in a FRESH interpreter and return its detail dict.

    Measured motivation (PROFILE_r04.md "stage split: contamination
    retraction"): after the big infer/train phases, the same process's
    device_put path degrades ~10x (tunnel/runtime state), so host-feed
    modes measured late in a shared process understate by an order of
    magnitude (pipeline 119 in-process vs ~1130 img/s fresh). Each mode
    gets a clean process; the persistent compile cache keeps it cheap."""
    import subprocess
    import sys
    env = dict(os.environ, BENCH_MODE=mode, BENCH_SUBPROC="0")
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env, capture_output=True, text=True,
                          timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"bench mode {mode} failed:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])["detail"]


def main():
    platform = jax.devices()[0].platform
    default_mode = "all" if platform != "cpu" else "infer"
    mode = os.environ.get("BENCH_MODE", default_mode)

    if mode == "all" and os.environ.get("BENCH_SUBPROC", "1") != "0":
        detail = {}
        for m in ("infer", "train", "pipeline", "e2e"):
            detail.update(_run_mode_subprocess(m))
        head = detail["infer"]
        print(json.dumps({
            "metric": (f"inference_images_per_sec_per_chip_256x512"
                       f"_bs{head['batch_size']}_{platform}"),
            "value": head["median"],
            "unit": "images/sec",
            "vs_baseline": round(head["median"] / BASELINE_IMG_PER_SEC, 3),
            "detail": detail,
        }))
        return
    # Measured r04 (PROFILE_r04.md): inference 3750 (bs32) -> 3869 (bs64)
    # -> 3973 img/s (bs128) — the fixed ~0.6 ms dispatch amortizes with
    # batch, so the infer sweep covers both ends (both compile-cached).
    # Train/pipeline/e2e stay at BENCH_TRAIN_BS (default 32: the packed
    # train kernels improve with batch up to bs32, and bs128 train has no
    # cached compile on the bench host).
    sweep = tuple(int(b) for b in os.environ.get(
        "BENCH_BATCH_SIZES", "32,128").split(","))
    train_bs = int(os.environ.get("BENCH_TRAIN_BS", "32"))
    dtype = (jnp.float32 if os.environ.get("BENCH_DTYPE") == "f32"
             else jnp.bfloat16)

    detail = {}
    if mode in ("infer", "all"):
        best = None
        for bs in sweep:
            s = bench_infer(bs, dtype)
            if best is None or statistics.median(s) > best[1]:
                best = (bs, statistics.median(s), s)
        detail["infer"] = {**_stats(best[2]), "batch_size": best[0]}
    if mode in ("train", "all"):
        s = bench_train(train_bs)
        detail["train"] = {**_stats(s), "batch_size": train_bs}
    if mode in ("pipeline", "all"):
        s, stages = bench_pipeline(train_bs)
        detail["pipeline"] = {**_stats(s), "batch_size": train_bs,
                              "stages": stages}
    if mode in ("e2e", "all"):
        s = bench_e2e(train_bs)
        detail["e2e"] = {**_stats(s), "batch_size": train_bs}

    head_key = mode if mode != "all" else "infer"
    name = {"train": "train_images_per_sec_per_chip_256x512",
            "pipeline": "input_pipeline_images_per_sec_256x512",
            "e2e": "e2e_train_images_per_sec_256x512",
            "infer": "inference_images_per_sec_per_chip_256x512"}[head_key]
    head = detail[head_key]
    print(json.dumps({
        "metric": f"{name}_bs{head['batch_size']}_{platform}",
        "value": head["median"],
        "unit": "images/sec",
        "vs_baseline": round(head["median"] / BASELINE_IMG_PER_SEC, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()

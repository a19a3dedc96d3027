"""TPU trace capture + per-op summarization.

The reference's only profiling is manual wall-clock timing around the train
loop (Birds_Eye_View_Loss/main.py:187-203) and cuda-synchronized inference
timing (Backprojection_Loss/test.py:51-58). The TPU-native equivalent is a
`jax.profiler` trace: capture a few steps, then aggregate the device-side op
events into a per-op time table. Every kernel-level perf decision in this
repo is driven by this tool (microbenchmarks of jitted sub-functions are
unreliable here — whole-step traces are the only trustworthy signal).

Usage:

    from lanedetection_end2end_tpu.utils.profiling import trace, summarize

    with trace("/tmp/mytrace") as t:
        for _ in range(20):
            out = step(x)
        jax.block_until_ready(out)
    print(summarize(t.dir, iters=20).format())
"""

from __future__ import annotations

import collections
import dataclasses
import glob
import gzip
import json
import os
import re
from contextlib import contextmanager
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class TraceHandle:
    dir: str


@contextmanager
def trace(trace_dir: str):
    """Capture a jax.profiler trace into `trace_dir` (created if missing).

    Yields a TraceHandle whose `.dir` feeds `summarize`. Works on the axon
    TPU tunnel and on CPU backends alike.
    """
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield TraceHandle(trace_dir)


@dataclasses.dataclass
class OpRow:
    name: str
    total_us: float
    count: int


@dataclasses.dataclass
class TraceSummary:
    """Aggregated device-op times from one trace.

    `by_category` groups ops by name with trailing digits/dots stripped
    (fusion.123 -> fusion); `by_op` keeps full op names.
    """

    total_us: float
    iters: int
    by_category: List[OpRow]
    by_op: List[OpRow]

    def us_per_iter(self, category: Optional[str] = None) -> float:
        if category is None:
            return self.total_us / self.iters
        for row in self.by_category:
            if row.name == category:
                return row.total_us / self.iters
        return 0.0

    def format(self, top: int = 25) -> str:
        lines = [f"total device op time {self.total_us / self.iters:.0f} us/iter"]
        for row in self.by_category[:top]:
            lines.append(f"  {row.total_us / self.iters:9.1f} us/iter  "
                         f"n={row.count:5d}  {row.name}")
        lines.append("--- top single ops")
        for row in self.by_op[:15]:
            lines.append(f"  {row.total_us / self.iters:9.1f}  {row.name}")
        return "\n".join(lines)


def _latest_trace_file(trace_dir: str) -> str:
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    return files[-1]


def summarize(trace_dir: str, iters: int = 1,
              device_substr: Tuple[str, ...] = ("TPU",)) -> TraceSummary:
    """Aggregate device-lane op events of the newest trace in `trace_dir`.

    Events are attributed to a device when their pid's process_name contains
    any of `device_substr`. The default "TPU" matches the axon tunnel's
    device lanes; on the CPU backend there are no separate device lanes —
    pass `device_substr=("/host:CPU",)` there (host-side TraceMe events are
    then included, which is fine for smoke testing). jit wrapper events and
    bare-number counter lanes are dropped.
    """
    with gzip.open(_latest_trace_file(trace_dir), "rt") as fh:
        tr = json.load(fh)
    pidname: Dict[int, str] = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    cat_us: collections.Counter = collections.Counter()
    cat_n: collections.Counter = collections.Counter()
    op_us: collections.Counter = collections.Counter()
    op_n: collections.Counter = collections.Counter()
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pidname.get(e["pid"], "")
        if not any(s in pname for s in device_substr):
            continue
        name = e["name"]
        if name.startswith("jit") or re.fullmatch(r"\d+", name):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        cat_us[base] += e["dur"]
        cat_n[base] += 1
        op_us[name] += e["dur"]
        op_n[name] += 1
    by_cat = [OpRow(k, v, cat_n[k]) for k, v in cat_us.most_common()]
    by_op = [OpRow(k, v, op_n[k]) for k, v in op_us.most_common()]
    return TraceSummary(total_us=sum(cat_us.values()), iters=iters,
                        by_category=by_cat, by_op=by_op)

"""Smoke test for the in-repo trace-capture + summarize tool.

TPU equivalent of the reference's manual timers
(Birds_Eye_View_Loss/main.py:187-203): capture a jax.profiler trace and
aggregate per-op device time. On the CPU test backend the device lanes are
named "/device:CPU:*", which `summarize` matches by default.
"""

import jax
import jax.numpy as jnp

from lanedetection_end2end_tpu.utils.profiling import summarize, trace


def test_trace_and_summarize(tmp_path):
    f = jax.jit(lambda a, b: jnp.dot(a, b) + 1.0)
    x = jnp.ones((256, 256), jnp.float32)
    jax.block_until_ready(f(x, x))  # compile outside the trace
    iters = 5
    with trace(str(tmp_path)) as t:
        for _ in range(iters):
            out = f(x, x)
        jax.block_until_ready(out)
    s = summarize(t.dir, iters=iters, device_substr=("/host:CPU",))
    assert s.total_us > 0
    assert s.by_category, "expected at least one device op category"
    text = s.format()
    assert "us/iter" in text
    names = {row.name for row in s.by_category}
    assert names, "expected op categories"


def test_us_per_iter_missing_category_is_zero(tmp_path):
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((64, 64), jnp.float32)
    jax.block_until_ready(f(x))
    with trace(str(tmp_path)) as t:
        jax.block_until_ready(f(x))
    s = summarize(t.dir, iters=1, device_substr=("/host:CPU",))
    assert s.us_per_iter("definitely_not_a_real_op") == 0.0
    assert s.us_per_iter() == s.total_us

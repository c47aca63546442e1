"""Render profiling — the TPU equivalent of the reference's dipstick
instrumentation (orchestration/src/metrics.rs: gather_audio timer,
per-entity audio timers, printed after a performance with --perf).

`profile_render` times the end-to-end program plus each device's isolated
subprogram (instrument render or effect transform on its realized input),
so a --perf --debug run prints a per-entity table like the reference's.
`trace` wraps jax.profiler for xprof captures when a trace dir is given.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def _timed(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jnp.abs(out)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jnp.abs(out)))
        best = min(best, time.perf_counter() - t0)
    return best


def profile_render(renderer) -> list[tuple[str, float]]:
    """Per-entity wall times (seconds, incl. one host sync each).

    Mirrors metrics.rs's per-entity timers: instruments timed on their note
    batches, effects timed on their realized inputs.
    """
    c = renderer.c
    n = c.n_frames
    rows: list[tuple[str, float]] = []
    outputs: dict[str, jnp.ndarray] = {}
    inputs = renderer.inputs
    for uvid in c.order:
        dev = c.devices[uvid]
        if dev.role == "instrument":
            fn = jax.jit(
                lambda inp, d=dev: renderer._render_instrument(inp, d, n)
            )
            rows.append((f"instrument {uvid} ({dev.kind})",
                         _timed(fn, inputs)))
            outputs[uvid] = fn(inputs)
            continue
        sources = c.sinks.get(uvid, [])
        acc = jnp.zeros((2, n), jnp.float32)
        for s in sources:
            if s in outputs:
                acc = acc + outputs[s]
        if dev.role == "controller" and dev.kind != "signal-passthrough-controller":
            continue
        fn = jax.jit(
            lambda inp, x, d=dev: renderer._apply_effect(inp, d, x, n, {})
        )
        rows.append((f"effect {uvid} ({dev.kind})", _timed(fn, inputs, acc)))
        outputs[uvid] = fn(inputs, acc)
    return rows


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace context (xprof) when a directory is given."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield

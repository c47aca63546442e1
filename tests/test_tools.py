"""Measurement-tool smoke tests (round 5).

The perf/fidelity tooling (bench.py, tools/profile_configs.py,
tools/stream_bench.py, tools/prewarm.py, tools/fidelity_tpu.py,
tools/f64_matrix.py) is part of the shipped methodology — PARITY.md's
round-5 perf column and the artifact files are regenerated with them —
so keep them importable and keep profile_configs.measure()'s adaptive
rep-growth loop terminating on a fast function (it must stop at
max_reps even when one timed call never reaches 6x the measured RTT,
which on this virtual-CPU host it never will for a trivial op).
"""

import importlib
import pathlib
import sys

import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


@pytest.mark.parametrize("mod", [
    "bench",
    "tools.profile_configs",
    "tools.stream_bench",
    "tools.prewarm",
    "tools.fidelity_tpu",
    "tools.f64_matrix",
    "tools.f64_reference",
])
def test_tool_imports(mod):
    importlib.import_module(mod)


def test_measure_adaptive_reps_terminates():
    import jax.numpy as jnp

    from tools.profile_configs import measure

    calls = {"n": 0}

    def fn(inputs):
        calls["n"] += 1
        return inputs["x_vels"] * 2.0

    med, compile_s, st = measure(
        fn, {"x_vels": jnp.float32(1.0)}, reps=2, runs=3, max_reps=8)
    assert st["reps"] <= 8          # growth capped
    assert st["n"] == 3             # requested run count
    assert med > 0 and st["min"] <= med <= st["max"]
    assert st["rtt_s"] > 0

"""Benchmark: offline render speed of the north-star project.

Prints ONE JSON line:
  {"metric": ..., "value": xRT, "unit": "x_realtime", "vs_baseline": ...}

metric: steady-state render speed (audio-seconds per wall-second per chip)
of projects/demos/effects/drums-filtered-24db.json at 44.1 kHz — drumkit
sampler through a rising (automated) 24 dB low-pass, the BASELINE.json
headline config. vs_baseline is the ratio against the reference's own
self-measured goal of 1.0x realtime (src/bin/groove-cli.rs:128-138 prints
">= sample_rate/1000 samples/msec" as its target; BASELINE.md).

Timing excludes compilation (programs are compiled once per song and
cached) and includes on-device compute to a materialized result.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

PROJECT = "/root/reference/projects/demos/effects/drums-filtered-24db.json"


def _watchdog(interval_s: float = 300.0):
    """Progress watchdog: the tunnel-attached device can wedge (observed:
    remote compile helper hung after a VMEM-overflow rejection, stalling
    even cached execution) — in that state every device call blocks
    silently forever. Periodically note the stall on stderr so a hung
    bench is diagnosable; never touches stdout (the one-JSON-line
    contract)."""
    import threading

    state = {"t0": time.time(), "phase": "startup"}

    def tick():
        while True:
            time.sleep(interval_s)
            dt = time.time() - state["t0"]
            print(f"bench watchdog: '{state['phase']}' still running "
                  f"after {dt:.0f}s — device/tunnel may be wedged",
                  file=sys.stderr, flush=True)

    threading.Thread(target=tick, daemon=True).start()

    def phase(name):
        state["t0"] = time.time()
        state["phase"] = name

    return phase


def main():
    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings

    phase = _watchdog()
    phase("compile song + renderer init")

    song = SongSettings.from_project_file(PROJECT)
    compiled = compile_song(song)
    r = Renderer(compiled)

    # Device-throughput measurement: run `reps` renders inside ONE program
    # (fori_loop) so neither the host dispatch path nor the tunnel's ~24 ms
    # round trip is counted per render. Each iteration perturbs one input
    # infinitesimally so XLA cannot hoist the loop-invariant render.
    # reps is sized so one timed call (~0.2 s at the round-4 median of
    # ~0.8 ms/render) is >> the ~24-32 ms tunnel RTT: at the old reps=32
    # the loop barely exceeded ONE round trip, so the rtt subtraction
    # below removed most of the signal and the headline inherited the
    # tunnel's minute-to-minute drift (the round-4 bench-vs-profile
    # 6041-vs-4532 spread). Kept a FIXED constant (not adaptive) so the
    # compiled program is deterministic and the persistent compile cache
    # (tools/prewarm.py) always hits.
    reps = 256
    # perturb EVERY velocity-like input so no instrument's render is
    # loop-invariant (hoistable) — /vels feeds the generic paths, /hvels
    # the Pallas drum path
    pert_keys = [k for k in r.inputs if k.endswith("vels")]
    assert pert_keys

    def many(inputs):
        def body(i, acc):
            inp = dict(inputs)
            for k in pert_keys:
                inp[k] = inputs[k] + 1e-6 * i.astype(jnp.float32)
            return acc + jnp.sum(jnp.abs(r._render(inp)))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    many_fn = jax.jit(many)
    phase("warm-up compile + first device execution")
    float(many_fn(r.inputs))  # warm up / compile
    phase("measurement")

    # Measure the tunnel's scalar-readback round trip inline (it drifts):
    # time a trivial jitted scalar op, take the min of several runs.
    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.float32(0)))  # compile
    rtt = min(
        (lambda t0: (float(tiny(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for i in range(5)
    )
    runs = 6
    times = []
    for _ in range(runs):  # tunnel throughput drifts minute-to-minute ~2x
        t0 = time.perf_counter()
        float(many_fn(r.inputs))
        times.append(time.perf_counter() - t0)
    per = sorted(max(t - rtt, 1e-9) / reps for t in times)
    med = per[len(per) // 2] if runs % 2 else \
        0.5 * (per[runs // 2 - 1] + per[runs // 2])

    audio_seconds = compiled.n_frames / compiled.sample_rate
    # headline = MEDIAN of the runs (VERDICT r4 item 4: single-sample
    # numbers carried 30%+ run-to-run spread); best/worst published
    # alongside so the tunnel's drift is visible in the artifact
    xrt = audio_seconds / med
    print(json.dumps({
        "metric": "offline render speed, drums-filtered-24db @44.1kHz, 1 chip",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1.0, 1),
        "stat": "median",
        "n_runs": runs,
        "reps_per_run": reps,
        "xrt_best": round(audio_seconds / per[0], 1),
        "xrt_worst": round(audio_seconds / per[-1], 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

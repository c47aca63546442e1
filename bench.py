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
import sys
import time

import jax
import jax.numpy as jnp

PROJECT = "/root/reference/projects/demos/effects/drums-filtered-24db.json"


def main():
    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings

    song = SongSettings.from_project_file(PROJECT)
    compiled = compile_song(song)
    r = Renderer(compiled)

    # One program: render + checksum (so completion is observable through a
    # scalar; on the axon tunnel block_until_ready returns early).
    render_sum = jax.jit(lambda inputs: jnp.sum(jnp.abs(r._render(inputs))))
    float(render_sum(r.inputs))  # warm up / compile

    # Amortized throughput: the device executes enqueued programs in order,
    # so syncing on the LAST checksum bounds completion of all of them and
    # pays the ~24 ms host<->device round trip once, not per render.
    reps = 10
    t0 = time.perf_counter()
    accs = [render_sum(r.inputs) for _ in range(reps)]
    float(accs[-1])
    per_render = (time.perf_counter() - t0) / reps

    audio_seconds = compiled.n_frames / compiled.sample_rate
    xrt = audio_seconds / per_render
    print(json.dumps({
        "metric": "offline render speed, drums-filtered-24db @44.1kHz, 1 chip",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1.0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

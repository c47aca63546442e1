"""Per-config device-throughput profiler (BASELINE.json "additional configs").

For each project: compile, then measure steady-state per-render device time
with the same in-program repetition trick bench.py uses (fori_loop over
perturbed renders, so neither host dispatch nor the axon tunnel's ~24 ms
round trip is counted per render). With --breakdown, additionally times
each device's sub-program in isolation to locate the hot entities.

Usage: python tools/profile_configs.py [--breakdown] [project ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

DEFAULT_CONFIGS = [
    "/root/reference/projects/demos/effects/drums-filtered-24db.json",
    "/root/reference/projects/scale-c4-major.json",
    "/root/reference/test-data/perf-1.json",
    "/root/reference/test-data/kitchen-sink.json",
]


def measure(fn, inputs, reps=32, runs=3, max_reps=8192):
    """Steady-state seconds per call of fn(inputs)->array, via an in-program
    fori_loop of `reps` perturbed evaluations. Returns
    (per_render_median_s, compile_s, stats) where stats carries the full
    per-run distribution (median/min/max/n — VERDICT r4 item 4: publish
    spread, not single samples).

    The in-program rep count GROWS (x4) until one timed call takes at
    least ~6x the measured host<->device round trip: the tunnel RTT here
    is ~24-32 ms, so a sub-ms render timed with a fixed small loop
    measures the LINK, not the chip (the round-4 kitchen-sink
    1299-vs-1855 discrepancy was exactly this — t - rtt of a loop that
    barely exceeded one RTT). With the loop >= 6x RTT the subtraction
    is a <20% correction instead of the whole signal."""
    pert_keys = [k for k in inputs if k.endswith("vels")]

    def make(n_reps):
        def many(inp0):
            def body(i, acc):
                inp = dict(inp0)
                for k in pert_keys:
                    inp[k] = inp0[k] + 1e-6 * i.astype(jnp.float32)
                return acc + jnp.sum(jnp.abs(fn(inp)))
            return jax.lax.fori_loop(0, n_reps, body, jnp.float32(0))
        return jax.jit(many)

    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.float32(0)))
    rtt = min(
        (lambda t: (float(tiny(jnp.float32(i))), time.perf_counter() - t)[1])(
            time.perf_counter())
        for i in range(5)
    )

    compile_s = 0.0
    while True:
        many_fn = make(reps)
        t0 = time.perf_counter()
        float(many_fn(inputs))  # compile + first execution
        compile_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        float(many_fn(inputs))
        first = time.perf_counter() - t0
        if first >= 6.0 * rtt or reps >= max_reps:
            break
        # grow at least enough to clear the bar in one more hop
        grow = max(4, int((8.0 * rtt) / max(first, 1e-4)))
        reps = min(max_reps, reps * min(grow, 64))

    times = [first]
    for _ in range(runs - 1):
        t0 = time.perf_counter()
        float(many_fn(inputs))
        times.append(time.perf_counter() - t0)
    per = sorted(max(t - rtt, 1e-9) / reps for t in times)
    med = per[len(per) // 2] if runs % 2 else \
        0.5 * (per[runs // 2 - 1] + per[runs // 2])
    stats = {"median": med, "min": per[0], "max": per[-1], "n": runs,
             "reps": reps, "rtt_s": rtt}
    return med, compile_s, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("projects", nargs="*", default=DEFAULT_CONFIGS)
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings

    for proj in args.projects or DEFAULT_CONFIGS:
        if proj.endswith((".mid", ".midi")):
            compiled = compile_midi_file(proj)
        else:
            compiled = compile_song(SongSettings.from_project_file(proj))
        r = Renderer(compiled)
        audio_s = compiled.n_frames / compiled.sample_rate
        per_render, compile_s, st = measure(r._render, r.inputs,
                                            reps=args.reps, runs=5)
        name = os.path.basename(proj)
        print(f"{name}: audio={audio_s:.2f}s n_frames={compiled.n_frames} "
              f"render={per_render*1e3:.3f}ms "
              f"xRT={audio_s/per_render:.0f} (median of {st['n']}; "
              f"best {audio_s/st['min']:.0f} / worst {audio_s/st['max']:.0f}; "
              f"loop reps={st['reps']}, rtt={st['rtt_s']*1e3:.1f}ms) "
              f"(compile {compile_s:.1f}s)")
        if args.breakdown:
            n = compiled.n_frames
            for uvid in compiled.order:
                dev = compiled.devices[uvid]
                if dev.role == "instrument":
                    sub = lambda inp, d=dev: r._render_instrument(inp, d, n)
                elif dev.role == "effect" or (
                        dev.role == "controller"
                        and dev.kind == "signal-passthrough-controller"):
                    x = jnp.zeros((2, n), jnp.float32)
                    sub = lambda inp, d=dev: r._apply_effect(inp, d, x, n, {})
                else:
                    continue
                try:
                    t, _, _ = measure(sub, r.inputs, reps=args.reps, runs=2)
                    print(f"    {uvid} ({dev.kind}): {t*1e3:.3f}ms")
                except Exception as e:  # noqa: BLE001
                    print(f"    {uvid} ({dev.kind}): FAILED {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()

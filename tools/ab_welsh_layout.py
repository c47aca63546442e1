"""A/B the welsh render layout on the real chip.

The tunnel-attached chip's throughput drifts across minutes (PARITY
round-3 caveat), so single measurements of alternative layouts are not
comparable. This tool compiles every variant first, then interleaves
timing rounds across variants so drift hits all of them equally.

Usage: python tools/ab_welsh_layout.py [project ...]
"""

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

import jax.numpy as jnp  # noqa: E402

from groove_tpu.engine.render import Renderer  # noqa: E402


def variants():
    class PerDevLr16(Renderer):
        WELSH_MERGE_GLOBAL = False

    class PerDevLr0(Renderer):
        WELSH_MERGE_GLOBAL = False
        WELSH_LAUNCH_ROWS = 0

    class GlobalLr16Mb12(Renderer):
        WELSH_GLOBAL_BUCKETS = 12

    class GlobalLr0Mb16(Renderer):
        WELSH_GLOBAL_BUCKETS = 16
        WELSH_LAUNCH_ROWS = 0

    return [("perdev-lr16-mb3", PerDevLr16),
            ("perdev-lr0-mb3", PerDevLr0),
            ("global-lr16-mb12", GlobalLr16Mb12),
            ("global-lr0-mb16", GlobalLr0Mb16)]


def main():
    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.project.schema import SongSettings

    paths = sys.argv[1:] or ["/root/reference/test-data/midi/jingle_bells.mid"]
    for p in paths:
        if p.endswith(".mid"):
            c = compile_midi_file(p)
        else:
            c = compile_song(SongSettings.from_project_file(p))
        rs = []
        for name, cls in variants():
            t0 = time.time()
            r = cls(c)
            out = r.render_device()
            ok = float(jnp.sum(jnp.abs(out[:100])))
            print(f"{name}: compiled+warm in {time.time()-t0:.1f}s "
                  f"(probe {ok:.4f})", flush=True)
            rs.append((name, r))
        times = {name: [] for name, _ in rs}
        for rnd in range(4):
            for name, r in rs:
                t0 = time.perf_counter()
                for _ in range(4):
                    out = r.render_device()
                _ = float(jnp.sum(jnp.abs(out[:100])))
                times[name].append((time.perf_counter() - t0) / 4)
        audio_s = c.n_frames / c.sample_rate
        for name, ts in times.items():
            best = min(ts)
            print(f"{p.split('/')[-1]} {name}: best {best*1e3:.1f}ms "
                  f"xRT={audio_s/best:.0f} all={[f'{t*1e3:.0f}' for t in ts]}")


if __name__ == "__main__":
    main()

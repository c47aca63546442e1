"""Pre-warm the persistent XLA compile cache for the SHIPPED configs
(VERDICT r4 item 4/7: the round-4 bench wedged ~20 min on a cache miss;
first-run users of the streamed defaults paid 4-8 min of remote compile).

Compiles and runs once, on the attached device, with
JAX_COMPILATION_CACHE_DIR pointed at the repo's .jax_cache:
  - the north-star whole-timeline render (bench.py's program shape),
  - the streamed headline configs (jingle_bells at S=1048576 batch 3 and
    S=524288 batch 4, mono-fold auto, f32 + device-quantized int16),
so a subsequent bench.py / stream_bench / CLI run starts warm.

Usage: python tools/prewarm.py [--skip-stream] [--skip-render]
Prints one line per program with its cold-compile wall time.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

NORTH_STAR = "/root/reference/projects/demos/effects/drums-filtered-24db.json"
STREAM_SMF = "/root/reference/test-data/midi/jingle_bells.mid"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-stream", action="store_true")
    ap.add_argument("--skip-render", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    if not args.skip_bench:
        # bench.py's measurement program (jit of the reps-loop) is a
        # DIFFERENT XLA program from the plain render below — warming
        # only jit__render still left BENCH_r04's 20-min warm-up wedge.
        import subprocess
        t0 = time.time()
        subprocess.run([sys.executable,
                        str(pathlib.Path(__file__).parent.parent
                            / "bench.py")], check=True)
        print(f"bench program: {time.time() - t0:.1f}s", flush=True)

    import numpy as np

    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.project.schema import SongSettings

    if not args.skip_render:
        from groove_tpu.engine.render import Renderer

        t0 = time.time()
        c = compile_song(SongSettings.from_project_file(NORTH_STAR))
        r = Renderer(c)
        np.asarray(r.render())
        print(f"north-star render: {time.time() - t0:.1f}s", flush=True)

    if not args.skip_stream:
        from groove_tpu.engine.stream import StreamingRenderer

        c = compile_midi_file(STREAM_SMF)
        for seg, batch in ((1048576, 3), (524288, 4)):
            for quant in (True, False):
                t0 = time.time()
                r = StreamingRenderer(c, segment_frames=seg)
                for chunk in r.stream(batch_segments=batch, quantize=quant):
                    pass
                print(f"stream S={seg} batch={batch} "
                      f"{'i16' if quant else 'f32'}: "
                      f"{time.time() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

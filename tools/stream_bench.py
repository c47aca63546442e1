"""Steady-state streamed-throughput measurement on the attached device.

For each requested mode, builds a StreamingRenderer over the given
project/SMF, runs one full warm pass (compiles the segment program), then
times a second full pass — the steady-state figure PARITY.md quotes.

Usage: python tools/stream_bench.py [path] [--seg N] [--batch K]
       [--modes unsliced,sliced]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?",
                    default="/root/reference/test-data/midi/jingle_bells.mid")
    ap.add_argument("--seg", type=int, default=262144)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--modes", default="unsliced,unsliced-i16",
                    help="comma list: unsliced | sliced, with optional "
                         "-i16 suffix for device-side quantization")
    ap.add_argument("--passes", type=int, default=3,
                    help="steady-state passes per mode (median + range "
                         "published; the tunnel's fetch throughput drifts "
                         "minute-to-minute)")
    args = ap.parse_args()

    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.engine.stream import StreamingRenderer
    from groove_tpu.project.schema import SongSettings

    p = pathlib.Path(args.path)
    if p.suffix.lower() in (".mid", ".midi"):
        c = compile_midi_file(p)
    else:
        c = compile_song(SongSettings.from_project_file(p))
    audio_s = c.n_frames / c.sample_rate
    print(f"{p.name}: {c.n_frames} frames = {audio_s:.1f}s audio, "
          f"seg={args.seg} batch={args.batch}", flush=True)

    for mode in args.modes.split(","):
        # "sliced" = the CLI --sliced configuration (per-device "auto"
        # routing by stream._slice_wins); "sliced-forced" = every
        # sliceable device slices (the bitwise-test configuration)
        if mode.startswith("sliced-forced"):
            welsh_sliced = True
        elif mode.startswith("sliced"):
            welsh_sliced = "auto"
        else:
            welsh_sliced = False
        # "-st" forces STEREO fetches (mono_fold=False) to measure the
        # fold's link-byte saving against; default is auto (fold when
        # channel_symmetric proves L == R)
        fold = False if mode.endswith("-st") else None
        mode_core = mode[:-3] if mode.endswith("-st") else mode
        quant = mode_core.endswith("-i16")
        cls = type("R", (StreamingRenderer,), {"WELSH_SLICED": welsh_sliced})
        t0 = time.perf_counter()
        r = cls(c, segment_frames=args.seg)
        t1 = time.perf_counter()

        def run():
            import numpy as _np
            return _np.concatenate(list(r.stream(
                batch_segments=args.batch, quantize=quant,
                mono_fold=fold)), axis=0)

        out = run()
        t2 = time.perf_counter()
        steady = []
        for _ in range(max(1, args.passes)):
            ts = time.perf_counter()
            out = run()
            steady.append(time.perf_counter() - ts)
        steady.sort()
        med = steady[len(steady) // 2] if len(steady) % 2 else \
            0.5 * (steady[len(steady) // 2 - 1] + steady[len(steady) // 2])
        wide = out.astype("int32") if quant else out  # |int16 -32768| wraps
        peak = float(abs(wide).max()) / (32767.0 if quant else 1.0)
        print(f"  {mode}: init {t1 - t0:.1f}s, first pass {t2 - t1:.1f}s, "
              f"steady {med:.2f}s = {audio_s / med:.1f}x realtime "
              f"(median of {len(steady)}; best {audio_s / steady[0]:.1f}x / "
              f"worst {audio_s / steady[-1]:.1f}x; peak {peak:.3f})",
              flush=True)


if __name__ == "__main__":
    main()

"""On-TPU play-along (lookahead) live-path measurement (VERDICT r3 item 7).

The reference pulls the live graph in 64-frame buffers
(src/panels/legacy/audio_panel.rs:66-98); this machine's TPU sits behind a
~24 ms tunnel, so 64-frame interactivity is physically impossible there
(one round trip outlasts the buffer). The lookahead mode runs the SAME
live graph (engine/livesong.LiveSongRenderer, voice pools + carried
state) at a larger block on the chip: note-to-audio latency grows to
block/sr, throughput must clear 1x realtime with margin.

Measures steady-state xRT of render_block() at several block sizes on
the attached device (with live welsh voices sounding), plus the CPU
64-frame baseline, and writes LIVE_TPU.md.

Usage: python tools/live_lookahead_bench.py [--project P] [--blocks ...]
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

import numpy as np


def measure(compiled, device, block: int, n_blocks: int,
            pipelined: bool = False) -> dict:
    from groove_tpu.engine.livesong import LiveSongRenderer

    r = LiveSongRenderer(compiled, n_voices=8, device=device,
                         block_frames=block)
    # sound two held voices + a drum hit on every mapped channel
    chans = {d.midi_in for d in compiled.devices.values()
             if d.uvid in r._pools}
    for ch in chans:
        r.note_on(ch, 60, 100)
        r.note_on(ch, 64, 90)
    pull = r.render_block_pipelined if pipelined else r.render_block
    pull()  # compile (+ primes the pipeline in pipelined mode)
    t0 = time.perf_counter()
    out = None
    for _ in range(n_blocks):
        out = pull()
    dt = time.perf_counter() - t0
    assert out is not None and float(np.abs(out).max()) >= 0.0
    sr = compiled.sample_rate
    audio_s = n_blocks * block / sr
    return {
        "block": block,
        "pipelined": pipelined,
        # pipelined mode holds one extra in-flight block
        "latency_ms": round(1000.0 * block * (2 if pipelined else 1) / sr, 1),
        "xrt": round(audio_s / dt, 2),
        "block_ms": round(1000.0 * dt / n_blocks, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--project",
                    default="/root/reference/projects/default.json5")
    ap.add_argument("--blocks", default="1024,4096,16384")
    ap.add_argument("--seconds", type=float, default=4.0,
                    help="audio seconds measured per block size")
    args = ap.parse_args()

    import jax

    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.live import _live_device
    from groove_tpu.project.schema import SongSettings

    compiled = compile_song(SongSettings.from_project_file(args.project))
    sr = compiled.sample_rate
    tpu = jax.devices()[0]
    rows = []
    for b in (int(x) for x in args.blocks.split(",")):
        n = max(4, int(args.seconds * sr / b))
        for pipelined in (False, True):
            row = measure(compiled, tpu, b, n, pipelined=pipelined)
            row["device"] = str(tpu)
            rows.append(row)
            print(row, flush=True)
    # CPU 64-frame baseline (the interactive path the engine keeps)
    cpu = _live_device()
    row = measure(compiled, cpu, 64, int(1.0 * sr / 64))
    row["device"] = str(cpu)
    rows.append(row)
    print(row, flush=True)

    md = [
        "# LIVE_TPU — play-along (lookahead) live path on the chip",
        "",
        f"Project: `{pathlib.Path(args.project).name}`. The live graph",
        "(engine/livesong voice pools + carried effect state) pulled",
        "block-at-a-time; each row holds two welsh voices + pool voices",
        "on every mapped channel. Match: the reference's 64-frame audio",
        "pull (legacy/audio_panel.rs:66-98) — impossible over this",
        "machine's ~24 ms device tunnel, hence the lookahead blocks; the",
        "CPU row is the low-latency interactive path the engine keeps.",
        "",
        "Pipelined rows dispatch block b+1 before fetching block b",
        "(engine/livesong.render_block_pipelined): the fetch overlaps the",
        "next block's device compute, paying the tunnel RTT once per",
        "block instead of serializing dispatch and readback — at the cost",
        "of one extra block of note-to-audio latency (reflected in the",
        "latency column).",
        "",
        "| device | block | pipelined | note-to-audio latency | xRT "
        "| ms/block |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(f"| {r['device']} | {r['block']} "
                  f"| {'yes' if r.get('pipelined') else 'no'} "
                  f"| {r['latency_ms']} ms "
                  f"| **{r['xrt']}** | {r['block_ms']} |")
    md.append("")
    ok = [r for r in rows if "TPU" in r["device"].upper() and r["xrt"] > 1.2]
    if ok:
        best = min(ok, key=lambda r: r["block"])
        md.append(
            f"Smallest realtime-capable TPU block: **{best['block']} frames"
            f" = {best['latency_ms']} ms latency at {best['xrt']}x** — the"
            " play-along bound over this tunnel.")
        md.append("")
    out = pathlib.Path(__file__).resolve().parent.parent / "LIVE_TPU.md"
    out.write_text("\n".join(md))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""groove-tpu CLI: render project files to WAV.

Interface parity with groove-cli (src/bin/groove-cli.rs:26-53):
  positional inputs, --wav, --mp3 (unimplemented, like the reference),
  --debug, --perf, --quiet, --version. Output filename: input with its
  .json/.json5 extension replaced by .wav, next to the source file
  (groove-cli.rs:143-148; we extend the reference's `.json5$` regex to
  `.json` too so plain-JSON demos don't collide with their input names).

Extra flags (TPU-native additions): --sample-rate, --out-dir, --play,
--stream/--segment-frames, --loop/--loop-iterations, --multidevice.
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

from groove_tpu import __version__
from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.io.wav import write_wav_16bit_stereo
from groove_tpu.project.paths import Paths
from groove_tpu.project.schema import SongSettings


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="groove-tpu",
        description="Render Groove project files to WAV on TPU.",
    )
    p.add_argument("input", nargs="*", help="project files (JSON or JSON5)")
    p.add_argument("-w", "--wav", action="store_true",
                   help="render as WAVE file(s) (appears next to source)")
    p.add_argument("-m", "--mp3", action="store_true",
                   help="render as MP3 (not yet implemented)")
    p.add_argument("-d", "--debug", action="store_true", help="debug mode")
    p.add_argument("-p", "--perf", action="store_true",
                   help="print perf information")
    p.add_argument("-q", "--quiet", action="store_true",
                   help="suppress status updates")
    p.add_argument("-v", "--version", action="store_true",
                   help="print version and exit")
    p.add_argument("--sample-rate", type=int, default=44100)
    p.add_argument("--out-dir", type=str, default=None,
                   help="write WAVs here instead of next to the input")
    p.add_argument("--play", action="store_true",
                   help="stream the render through the native audio service "
                        "in real time (null sink when no audio HW)")
    p.add_argument("--stream", action="store_true",
                   help="render segment-streamed with bounded device memory "
                        "(unbounded song length); WAV is written "
                        "incrementally as segments arrive")
    p.add_argument("--segment-frames", type=int, default=262144,
                   help="streamed segment length (multiple of 64); larger "
                        "segments amortize note-window recompute across "
                        "fewer overlaps (jingle_bells measured 157x "
                        "realtime at the 262144 default vs 269x at 524288 "
                        "on-chip — each new size costs one fresh XLA "
                        "compile, cached after; ROOFLINE.md)")
    p.add_argument("--stream-batch", type=int, default=8,
                   help="segments folded into one device program per "
                        "--stream dispatch (amortizes the host<->device "
                        "round trip; 1 = the bitwise-pinned loop driver)")
    p.add_argument("--sliced", action="store_true",
                   help="--stream only: render each segment's SLICE of "
                        "every active welsh note with carried per-note "
                        "filter state instead of recomputing whole note "
                        "windows per overlapping segment (3-5x streamed "
                        "throughput on the CPU backend; bitwise "
                        "segmentation-invariant, ~1e-6 of the whole-"
                        "timeline render). Linear streams only")
    p.add_argument("--multidevice", action="store_true",
                   help="partition the song graph into independent "
                        "components and render them concurrently across "
                        "all visible devices (parallel/multidevice.py)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the song's TIMELINE over all visible "
                        "devices (shard_map + ppermute state relaxation, "
                        "parallel/meshrender.py) — one song, sequence-"
                        "parallel")
    p.add_argument("--live", metavar="MIDI_PORT", default=None,
                   help="play the project LIVE: read raw MIDI bytes from "
                        "this FIFO/file 'port' and route them through the "
                        "song's instruments and effect chains to the audio "
                        "service (engine/livesong.py)")
    p.add_argument("--midi-out", metavar="MIDI_PORT", default=None,
                   help="with --live: echo incoming MIDI to this out port")
    p.add_argument("--loop", nargs=2, type=float, metavar=("START", "END"),
                   help="bounce a loop range (beats): renders [0, END) then "
                        "--loop-iterations passes of [START, END) with "
                        "effect state carried across the seam")
    p.add_argument("--loop-iterations", type=int, default=4)
    return p


def output_path(input_filename: str, out_dir: str | None) -> Path:
    out = re.sub(r"\.(json5?|midi?|nsn)$", ".wav", input_filename)
    if out == input_filename:
        raise SystemExit(
            "would overwrite input file; couldn't generate output filename"
        )
    path = Path(out)
    if out_dir:
        path = Path(out_dir) / path.name
        path.parent.mkdir(parents=True, exist_ok=True)
    return path


def main(argv=None) -> int:
    from groove_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    args = build_parser().parse_args(argv)
    if args.version:
        print(f"groove-tpu {__version__}")
        return 0
    if args.mp3:
        print("MP3 output is not yet implemented", file=sys.stderr)
    paths = Paths()
    rc = 0
    for input_filename in args.input:
        if input_filename == "-":
            continue
        try:
            _process_file(input_filename, paths, args)
        except Exception as e:  # noqa: BLE001
            # per-file isolation: the reference's input loop processes the
            # remaining files after a bad one (groove-cli.rs:68 matches each
            # load Err and moves on); a malformed project must not abort
            # the batch
            print(f"error: {input_filename}: {e}", file=sys.stderr)
            rc = 1
    return rc


def _process_file(input_filename: str, paths: Paths, args) -> None:
    t0 = time.perf_counter()
    if input_filename.endswith((".mid", ".midi")):
        from groove_tpu.compiler.song import compile_midi_file
        compiled = compile_midi_file(
            Path(input_filename), paths, sample_rate=args.sample_rate
        )
    else:
        song = SongSettings.from_project_file(Path(input_filename))
        compiled = compile_song(song, paths, sample_rate=args.sample_rate)
    if args.live:
        _play_live(compiled, args)
        return
    if args.loop:
        _render_loop(compiled, input_filename, args)
        return
    if args.stream:
        _render_streamed(compiled, input_filename, args)
        return
    if args.multidevice:
        from groove_tpu.parallel.multidevice import MultiDeviceRenderer
        renderer = MultiDeviceRenderer(compiled)
        if not args.quiet:
            import jax as _jax
            print(f"Multi-device: {len(renderer.assignments)} components "
                  f"across {len(_jax.devices())} device(s)")
    elif args.mesh:
        from groove_tpu.parallel.meshrender import MeshRenderer
        renderer = MeshRenderer(compiled)
        if not args.quiet:
            print(f"Mesh: timeline sharded {renderer.n_devices} ways x "
                  f"{renderer.S} frames, {renderer.iterations} relaxation "
                  f"round(s)")
    else:
        renderer = Renderer(compiled)
    if args.perf:
        print(f"Orchestrator instantiation time: "
              f"{time.perf_counter() - t0:.2f}s")
    if args.debug and not (args.multidevice or args.mesh):
        # per-entity device timing, like the reference's dipstick
        # metrics (--perf + `metrics` feature); the multidevice
        # renderer is a set of per-component programs, not one
        # profileable graph
        from groove_tpu.utils.profiling import profile_render
        for name, seconds in profile_render(renderer):
            print(f"  {name}: {seconds * 1000:.2f} ms")
    if not args.quiet:
        print(f"Performing to queue ({compiled.n_frames} frames) ", end="")
    # --wav renders fetch device-quantized int16 (bitwise the host WAV
    # spec; halves the tunnel fetch). --play needs the float samples.
    render_fn = renderer.render
    if args.wav and not args.play \
            and hasattr(renderer, "render_quantized"):
        render_fn = renderer.render_quantized
    t1 = time.perf_counter()
    samples = render_fn()  # includes compile on first call
    compile_and_render = time.perf_counter() - t1
    render_s = compile_and_render
    if args.perf:
        # steady-state render (program cached) for the honest perf
        # number — only when asked: it re-executes AND re-fetches the
        # whole song over the tunnel (~2x wall-clock on plain renders)
        t2 = time.perf_counter()
        samples = render_fn()
        render_s = time.perf_counter() - t2
    if not args.quiet:
        print(".")
    if args.perf:
        n = len(samples)
        audio_s = n / args.sample_rate
        print(f" Orchestrator performance time: {compile_and_render:.2f}s "
              f"(first, incl. compile) / {render_s * 1000:.2f}ms (cached)")
        print(f" Sample count: {n}")
        if render_s > 0 and n:
            per_ms = n / (render_s * 1000.0)
            print(f" Samples per msec: {per_ms:.2f} "
                  f"(goal >{args.sample_rate / 1000.0:.2f})")
            print(f" usec per sample: {render_s * 1e6 / n:.4f} "
                  f"(goal <{1e6 / args.sample_rate:.2f})")
            print(f" xRT: {audio_s / render_s:.1f}x realtime")
    if args.wav:
        out = output_path(input_filename, args.out_dir)
        if not args.quiet:
            print(f"Rendering queue to {out}")
        write_wav_16bit_stereo(out, samples, args.sample_rate)
    if args.play:
        _stream_realtime(samples, args.sample_rate, args.quiet)


def _play_live(compiled, args) -> None:
    """--live PORT: interactive full-graph playback — MIDI bytes from the
    port play the project's instruments through its effect chains (the
    reference's GUI live path: MidiFromExternal -> broadcast_midi_messages,
    orchestrator.rs:722-754; audio pull legacy/audio_panel.rs:66-98)."""
    from groove_tpu.engine.livesong import LiveSongRenderer, LiveSongService

    echo = None
    if args.midi_out:
        from groove_tpu.io.midi_output import open_port
        echo = open_port(args.midi_out)
    if not args.quiet:
        # print BEFORE the open: a FIFO with no writer blocks open(2),
        # and the user should see what the CLI is waiting on
        print(f"Live: MIDI from {args.live}; Ctrl-C to stop")
    src = open(args.live, "rb", buffering=0)
    renderer = LiveSongRenderer(compiled)
    svc = LiveSongService(renderer, midi_source=src, midi_echo=echo)
    try:
        while True:
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    finally:
        svc.stop()
        try:
            src.close()
        except Exception:
            pass
        if echo is not None:
            echo.close()


def _render_loop(compiled, input_filename: str, args) -> None:
    """--loop START END: bounce the looped performance, state carried
    across every seek seam (orchestrator.rs:868-874 semantics; the shell's
    bounce-loop, CLI edition)."""
    from groove_tpu.engine.stream import StreamingRenderer
    from groove_tpu.io.wav import write_wav_16bit_stereo_stream

    start_beats, end_beats = args.loop
    r = StreamingRenderer(compiled, segment_frames=args.segment_frames)
    ls, le = r.loop_frames(start_beats, end_beats)
    chunks = r.stream_loop(start_beats, end_beats,
                           iterations=args.loop_iterations)
    out = output_path(input_filename, args.out_dir)
    total = write_wav_16bit_stereo_stream(out, chunks, args.sample_rate)
    if not args.quiet:
        n_expect = le + args.loop_iterations * (le - ls)
        print(f"Looped [{start_beats:g}, {end_beats:g}) beats x"
              f"{args.loop_iterations}: {total} frames (expected {n_expect}) "
              f"-> {out}")


def _render_streamed(compiled, input_filename: str, args) -> None:
    """Segment-streamed render path (--stream): bounded device memory for
    unbounded songs; segments land in the WAV as they are produced
    (engine/stream.StreamingRenderer + io.wav incremental writer)."""
    from groove_tpu.engine.stream import StreamingRenderer
    from groove_tpu.io.wav import write_wav_16bit_stereo_stream

    t0 = time.perf_counter()
    cls = StreamingRenderer
    if getattr(args, "sliced", False):
        # "auto": per-device routing by the _slice_wins work model, so
        # --sliced never LOSES to the unsliced path (at large segments a
        # device whose note spans are shorter than the slice renders
        # mostly-masked rows and routes back to whole windows)
        cls = type("SlicedStreamingRenderer", (StreamingRenderer,),
                   {"WELSH_SLICED": "auto"})
    r = cls(compiled, segment_frames=args.segment_frames)
    batch = max(1, min(args.stream_batch, r.n_segs))
    if not args.quiet:
        print(f"Streaming {compiled.n_frames} frames in "
              f"{r.n_segs} x {r.S}-frame segments "
              f"(batch {batch}) ", end="", flush=True)

    def progress(chunks):
        for c in chunks:
            if not args.quiet:
                print(".", end="", flush=True)
            yield c

    # quantize=True: int16 conversion happens ON DEVICE (bitwise the host
    # WAV spec — io.wav.quantize_16bit_device), halving the tunnel fetch
    # that bounds streamed throughput on this machine
    if args.wav:
        out = output_path(input_filename, args.out_dir)
        total = write_wav_16bit_stereo_stream(
            out, progress(r.stream(batch_segments=batch, quantize=True)),
            args.sample_rate)
        if not args.quiet:
            print(f"\nStreamed {total} frames to {out}")
    else:
        total = sum(len(c) for c in progress(
            r.stream(batch_segments=batch, quantize=True)))
        if not args.quiet:
            print(f"\nStreamed {total} frames")
    if args.perf:
        wall = time.perf_counter() - t0
        audio_s = compiled.n_frames / args.sample_rate
        print(f" Streamed wall: {wall:.2f}s (incl. compile) — "
              f"{audio_s / max(wall, 1e-9):.1f}x realtime end-to-end")


def _stream_realtime(samples, sample_rate: int, quiet: bool) -> None:
    """Push the rendered audio through the native ring-buffer service at
    realtime pace (the reference's AudioPanel pull model)."""
    from groove_tpu.io import native

    if not native.available():
        print("native audio service unavailable; skipping --play",
              file=sys.stderr)
        return
    svc = native.AudioService(sample_rate=sample_rate, buffer_frames=64)
    try:
        pos = 0
        n = len(samples)
        while pos < n:
            need = svc.needs_frames()
            if need > 0:
                chunk = samples[pos:pos + need]
                svc.write(chunk.astype("float32"))
                pos += len(chunk)
            else:
                time.sleep(0.001)
        # drain
        while svc.frames_consumed() < n:
            time.sleep(0.005)
        if not quiet:
            print(f"Played {n / sample_rate:.2f}s "
                  f"({svc.underruns()} underruns)")
    finally:
        svc.stop()


if __name__ == "__main__":
    sys.exit(main())

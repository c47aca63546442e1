"""Streaming segmented render (VERDICT r1 #10): segment boundaries must be
invisible — rendering a song as ONE segment and as MANY small segments is
bit-identical, because every stateful op in ops/stream.py has a
segmentation-invariant float schedule (see its module docstring). Also:
the lax.scan one-shot driver equals the Python-loop streamed driver
bitwise, the streamed result matches the whole-timeline Renderer to float
tolerance, and loop-range playback carries effect state across the seek
seam like the reference (orchestrator.rs:868-874)."""

from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.engine.stream import StreamingRenderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

# fixtures chosen to exercise every carried state: reverb delay-line
# tails, the 24 dB cascade + drum one-shots, automated-threshold
# compressor, sidechain one-block value, pure delay, chorus taps with an
# automated wet-dry-mix, and welsh notes spanning segment boundaries
FIXTURES = [
    "projects/demos/effects/drums-reverb.json",
    "projects/demos/effects/drums-filtered-24db.json",
    "projects/demos/effects/compressor.json",
    "projects/demos/controllers/sidechain.json",
    "projects/demos/effects/delay.json",
    "projects/demos/effects/chorus.json",
    "projects/scale-c4-major.json",
]


def _compiled(rel):
    return compile_song(SongSettings.from_project_file(REF / rel))


@pytest.mark.parametrize("rel", FIXTURES,
                         ids=[f.split("/")[-1] for f in FIXTURES])
def test_segmentation_is_invisible_bitwise(rel):
    c = _compiled(rel)
    one_seg = -(-c.n_frames // 64) * 64
    one = StreamingRenderer(c, segment_frames=one_seg).render()
    many = StreamingRenderer(c, segment_frames=8192).render()
    assert one.shape == many.shape == (c.n_frames, 2)
    assert np.array_equal(one, many), (
        f"segment seams visible: max diff {np.abs(one - many).max()}"
    )


@pytest.mark.parametrize("rel", FIXTURES[:3],
                         ids=[f.split("/")[-1] for f in FIXTURES[:3]])
def test_scan_driver_equals_stream_driver(rel):
    """The lax.scan driver runs the same step function, but XLA may fuse a
    scan body differently from a standalone program (measured ~3e-5 on the
    welsh voice's transcendentals), so this one is tolerance, not bitwise;
    the bitwise segmentation claim is the test above."""
    c = _compiled(rel)
    r = StreamingRenderer(c, segment_frames=8192)
    a = r.render_scan()
    b = r.render()
    peak = max(1.0, float(np.abs(b).max()))
    assert float(np.abs(a - b).max()) < 1e-4 * peak


@pytest.mark.parametrize("rel", FIXTURES,
                         ids=[f.split("/")[-1] for f in FIXTURES])
def test_streamed_matches_whole_timeline(rel):
    """The streamed path reproduces the one-program Renderer. Not bitwise
    (the whole-timeline path groups its scans by total length, block_for);
    tolerance covers float-reassociation only."""
    c = _compiled(rel)
    whole = np.asarray(Renderer(c).render())
    streamed = StreamingRenderer(c, segment_frames=8192).render()
    peak = max(1.0, float(np.abs(whole).max()))
    # drums-filtered-24db sweeps the cascade through near-critical
    # cutoffs: BOTH paths apply the defect-correction refinement (each
    # accurate to ~-88 dBFS vs f64), so they agree to ~2e-4 — the residual
    # is block grouping (whole path 128 vs stream 64).
    tol = 5e-4 if "24db" in rel else 1e-4
    assert float(np.abs(whole - streamed).max()) < tol * peak


def test_batched_stream_matches_loop_stream():
    """batch_segments folds k segments into one lax.scan dispatch (the
    tunnel-RTT amortization); the result must match the loop driver to
    scan tolerance, cover exactly n_frames, and the final partial batch
    (padded past the song end) must trim correctly."""
    c = _compiled("projects/demos/effects/drums-reverb.json")
    r = StreamingRenderer(c, segment_frames=8192)
    loop = r.render()
    assert r.n_segs % 4 != 0  # ensures a padded final batch
    batched = r.render(batch_segments=4)
    assert batched.shape == loop.shape == (c.n_frames, 2)
    peak = max(1.0, float(np.abs(loop).max()))
    assert float(np.abs(batched - loop).max()) < 1e-4 * peak


def test_prefetch_stream_is_bitwise_identical():
    """Pipelined dispatch (prefetch_segments) only changes host timing,
    never the programs — bitwise identical to unpipelined."""
    c = _compiled("projects/demos/effects/delay.json")
    r = StreamingRenderer(c, segment_frames=8192)
    a = np.concatenate(list(r.stream(prefetch_segments=0)), axis=0)
    b = np.concatenate(list(r.stream(prefetch_segments=8)), axis=0)
    assert np.array_equal(a, b)


def test_device_quantizer_matches_host_spec():
    """io.wav.quantize_16bit_device must be BITWISE the host writers'
    trunc(float64(x)*32767)+saturate over adversarial families: random,
    exact-boundary k/32767 products and their f32 neighbors, half-steps,
    signed zeros, subnormals, saturation range."""
    from groove_tpu.io.wav import quantize_16bit_device

    rng = np.random.default_rng(0)
    k = np.arange(-40000, 40000)
    base = (k[::7] / 32767.0).astype(np.float32)
    x = np.concatenate([
        rng.uniform(-1.3, 1.3, 100000).astype(np.float32),
        (k / 32767.0).astype(np.float32),
        ((k + 0.5) / 32767.0).astype(np.float32),
        ((k + 0.5) / 32768.0).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, 1e-41, -1e-41,
                  np.nextafter(np.float32(1.0), np.float32(0))],
                 np.float32),
        np.nextafter(base, np.float32(2.0)),
        np.nextafter(base, np.float32(-2.0)),
    ])
    host = np.clip(np.trunc(x.astype(np.float64) * 32767.0),
                   -32768, 32767).astype(np.int16)
    dev = np.asarray(quantize_16bit_device(x))
    assert dev.dtype == np.int16
    assert np.array_equal(host, dev)


def test_stream_quantized_equals_host_quantized_floats():
    """stream(quantize=True) (device-side int16, the halved-tunnel-fetch
    path the CLI uses) must equal quantizing the float stream on the
    host, for both the loop and batched drivers."""
    c = _compiled("projects/demos/effects/drums-reverb.json")
    r = StreamingRenderer(c, segment_frames=8192)
    for kw in ({}, {"batch_segments": 4}):
        f = r.render(**kw)
        q = r.render(quantize=True, **kw)
        assert q.dtype == np.int16 and q.shape == f.shape
        host = np.clip(np.trunc(f.astype(np.float64) * 32767.0),
                       -32768, 32767).astype(np.int16)
        assert np.array_equal(host, q)


def test_oneshot_render_quantized_matches_host():
    """Renderer.render_quantized (the CLI --wav fetch path) must equal
    host quantization of the float render."""
    c = _compiled("projects/demos/effects/delay.json")
    r = Renderer(c)
    f = r.render()
    q = r.render_quantized()
    host = np.clip(np.trunc(f.astype(np.float64) * 32767.0),
                   -32768, 32767).astype(np.int16)
    assert q.dtype == np.int16
    assert np.array_equal(host, q)


def test_stream_bounded_memory_path_yields_segments():
    c = _compiled("projects/demos/effects/drums-reverb.json")
    r = StreamingRenderer(c, segment_frames=16384)
    segs = list(r.stream())
    assert sum(s.shape[0] for s in segs) == c.n_frames
    assert all(s.shape[1] == 2 for s in segs)
    assert segs[0].shape[0] == 16384  # full segments until the trim


def test_loop_range_carries_state_across_the_seam():
    """Reverb tails must ring across the loop seek (the reference seeks
    only the clock; delay lines keep their content). With an RT60 longer
    than the loop window, every iteration accumulates tail energy, so
    consecutive iterations audibly differ at the seam."""
    import json

    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"welsh": [{"midi-in": 0},
                                             {"name": "piano"}]}]},
            {"effect": ["rv", {"reverb": {"attenuation": 1.0,
                                          "seconds": 3.0}}]},
        ],
        "patch-cables": [["i1", "rv", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "quarter",
                      "notes": [[60, 0, 0, 0]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    r = StreamingRenderer(c, segment_frames=16384)
    ls, le = r.loop_frames(0.0, 2.0)
    assert ls % 64 == 0 and le % 64 == 0 and ls < le
    audio = np.concatenate(list(r.stream_loop(0.0, 2.0, iterations=2)),
                           axis=0)
    L = le - ls
    assert audio.shape[0] == le + 2 * L
    it1 = audio[le:le + L]
    it2 = audio[le + L:le + 2 * L]
    # the seam carries audible state: the second pass rides the first
    # pass's accumulated tail (RT60 3 s vs a 0.5 s window)
    head = slice(0, 4096)
    assert float(np.abs(it1[head] - it2[head]).max()) > 1e-3
    # and the linear prefix [0, le) matches a plain stream exactly
    linear = StreamingRenderer(c, segment_frames=16384).render()
    assert np.array_equal(audio[:le], linear[:le])


def test_loop_range_stateless_song_repeats_exactly():
    """With no stateful effects in the chain, every loop iteration is the
    same audio — the seek itself must not disturb anything."""
    import json

    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"toy-instrument": [{"midi-in": 0},
                                                      {"fake-value": 0.25}]}]},
            {"effect": ["g1", {"gain": {"ceiling": 0.5}}]},
        ],
        "patch-cables": [["i1", "g1", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    r = StreamingRenderer(c, segment_frames=4096)
    ls, le = r.loop_frames(1.0, 3.0)
    L = le - ls
    audio = np.concatenate(list(r.stream_loop(1.0, 3.0, iterations=3)),
                           axis=0)
    it = [audio[le + k * L: le + (k + 1) * L] for k in range(3)]
    assert np.array_equal(it[0], it[1]) and np.array_equal(it[1], it[2])


def test_cli_stream_writes_identical_wav(tmp_path):
    """--stream writes the WAV incrementally; bytes must equal the
    whole-render path's WAV for a short fixture (same trunc/saturate
    spec, same audio modulo the documented float tolerance — compare the
    decoded samples at 1 LSB)."""
    import shutil

    from groove_tpu.cli import main as cli_main
    from groove_tpu.io.wav import read_wav

    src = REF / "projects/demos/effects/drums-reverb.json"
    a_dir = tmp_path / "whole"
    b_dir = tmp_path / "streamed"
    a_dir.mkdir()
    b_dir.mkdir()
    proj = tmp_path / "drums-reverb.json"
    shutil.copy(src, proj)
    assert cli_main([str(proj), "--wav", "--quiet",
                     "--out-dir", str(a_dir)]) == 0
    assert cli_main([str(proj), "--wav", "--quiet", "--stream",
                     "--segment-frames", "16384",
                     "--out-dir", str(b_dir)]) == 0
    wa, ra = read_wav(a_dir / "drums-reverb.wav")
    wb, rb = read_wav(b_dir / "drums-reverb.wav")
    assert ra == rb == 44100
    assert wa.shape == wb.shape
    # 16-bit quantized: float-path differences can flip at most 1 LSB
    assert float(np.abs(wa - wb).max()) <= (1.0 / 32768) + 1e-9


def test_cli_loop_bounce(tmp_path):
    """--loop START END bounces [0, end) + N looped passes to WAV."""
    import shutil

    from groove_tpu.cli import main as cli_main
    from groove_tpu.engine.stream import StreamingRenderer
    from groove_tpu.io.wav import read_wav

    src = REF / "projects/demos/effects/drums-reverb.json"
    proj = tmp_path / "drums-reverb.json"
    shutil.copy(src, proj)
    assert cli_main([str(proj), "--loop", "4", "8", "--loop-iterations", "2",
                     "--quiet", "--out-dir", str(tmp_path)]) == 0
    c = compile_song(SongSettings.from_project_file(src))
    ls, le = StreamingRenderer(c).loop_frames(4.0, 8.0)
    audio, rate = read_wav(tmp_path / "drums-reverb.wav")
    assert rate == 44100
    assert audio.shape[0] == le + 2 * (le - ls)


def test_streamed_smf_import_matches_whole_timeline():
    """An SMF import (multi-channel GM welsh + channel-10 drums) through
    the streamed path: bitwise segmentation invariance plus tolerance
    equivalence to the whole-timeline render."""
    from groove_tpu.compiler.song import compile_midi_file

    c = compile_midi_file(REF / "test-data/midi/sound_of_music.mid")
    one_seg = -(-c.n_frames // 64) * 64
    one = StreamingRenderer(c, segment_frames=one_seg).render()
    many = StreamingRenderer(c, segment_frames=16384).render()
    assert np.array_equal(one, many)
    whole = np.asarray(Renderer(c).render())
    peak = max(1.0, float(np.abs(whole).max()))
    assert float(np.abs(whole - many).max()) < 1e-4 * peak


def test_pulse_width_oscillator_streamed_bitwise_whole():
    """The streamed oscillator track must use the SAME host time base and
    op order as the whole-song path: (freq*t)/sr vs freq*(t/sr)
    reassociates in f32 and flips pulse EDGE samples (review finding,
    round 3 — measured 4 flips / 200k samples at 440 Hz)."""
    import json

    c = compile_song(SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"instrument": ["o", {"oscillator": {
            "waveform": {"pulse-width": 0.37}, "frequency": 440.0}}]}],
        "patch-cables": [["o", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "whole", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    })))
    whole = np.asarray(Renderer(c).render())
    streamed = np.asarray(StreamingRenderer(c, segment_frames=8192).render())
    assert np.array_equal(whole, streamed), \
        "pulse edges differ between whole and streamed oscillator tracks"


def test_empty_loop_range_raises():
    """loop end quantizing below one block must raise, not busy-hang
    stream_loop(iterations=None) on an empty window."""
    c = _compiled("projects/demos/effects/delay.json")
    r = StreamingRenderer(c)
    with pytest.raises(ValueError, match="empty window"):
        r.loop_frames(0.0, 0.0)


# --------------------------------------------------------------------------
# Streamed mono-fold (half the fetch bytes when the graph proves L == R)


def test_channel_symmetric_classification():
    from groove_tpu.engine.stream import channel_symmetric

    sym = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-filtered-24db.json"))
    assert channel_symmetric(sym)
    # stereo-automation pans a DCA with an LFO -> must classify stereo
    asym = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/controllers/stereo-automation.json"))
    assert not channel_symmetric(asym)
    assert not StreamingRenderer(asym, segment_frames=4096).mono_foldable


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("batch", [1, 2])
def test_mono_fold_bitwise_equals_stereo_fetch(quantize, batch):
    """Folded fetches must emit BITWISE the stereo fetch's arrays (the
    device computes mono + a tripwire; the host duplicates) in both
    drivers, f32 and int16."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-filtered-24db.json"))
    sr_ = StreamingRenderer(c, segment_frames=16384)
    assert sr_.mono_foldable
    folded = np.concatenate(list(sr_.stream(
        batch_segments=batch, quantize=quantize)), axis=0)
    plain = np.concatenate(list(sr_.stream(
        batch_segments=batch, quantize=quantize, mono_fold=False)), axis=0)
    assert folded.dtype == plain.dtype
    assert np.array_equal(folded, plain)


def test_mono_fold_tripwire_raises_on_asymmetric_audio():
    """Forcing the fold onto a stereo song must raise the tripwire (the
    device-side flag travels with every fetch), not corrupt audio."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/controllers/stereo-automation.json"))
    sr_ = StreamingRenderer(c, segment_frames=16384)
    with pytest.raises(RuntimeError, match="tripwire"):
        list(sr_.stream(mono_fold=True))


def test_channel_symmetric_rejects_stereo_samples_and_pan():
    """The conservative analysis must reject a sample table whose stereo
    channels differ and any nonzero pan param (the two asymmetry sources
    not exercised by stereo-automation's pan LFO)."""
    from groove_tpu.engine.stream import channel_symmetric

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-filtered-24db.json"))
    assert channel_symmetric(c)
    dev = next(d for d in c.devices.values()
               if getattr(d, "sample_table", None) is not None)
    dev.sample_table.data[0, 1, 0] += 0.25  # channel 1 differs by one sample
    assert not channel_symmetric(c)
    dev.sample_table.data[0, 1, 0] -= 0.25
    assert channel_symmetric(c)
    other = next(d for d in c.devices.values())
    other.params["pan"] = 0.5
    assert not channel_symmetric(c)
    other.params["pan"] = 0.0
    assert channel_symmetric(c)

"""Engine golden tests, mirroring the reference's gather_audio tests
(orchestration/src/orchestrator.rs:1444-1668) and sample-count accounting,
but through the real project-file surface."""

import json
from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import PatchError, compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

CLOCK = {"bpm": 240, "time-signature": [4, 4]}
SILENT_PATTERN = [{"id": "p1", "notes": [[0]]}]
TRACKS = [{"id": "t1", "midi-channel": 0, "patterns": ["p1"]}]


def _song(devices, cables, patterns=None, tracks=None, controls=None):
    d = {
        "clock": CLOCK,
        "devices": devices,
        "patch-cables": cables,
        "patterns": patterns or SILENT_PATTERN,
        "tracks": tracks or TRACKS,
    }
    if controls:
        d["controls"] = controls
    return SongSettings.from_json5_str(json.dumps(d))


def _toy(uvid, level):
    return {"instrument": [uvid, {"toy-instrument": [{"midi-in": 0},
                                                     {"fake-value": level}]}]}


def _gain(uvid, ceiling):
    return {"effect": [uvid, {"gain": {"ceiling": ceiling}}]}


def _render(song):
    return Renderer(compile_song(song)).render()


def test_gather_audio_basic():
    # 0.1 source through 0.5 gain (orchestrator.rs:1444-1472)
    out = _render(_song(
        [_toy("i1", 0.1), _gain("g1", 0.5)],
        [["i1", "g1", "main-mixer"]],
    ))
    assert out.shape[1] == 2
    assert np.allclose(out, 0.1 * 0.5, atol=1e-6)


def test_gather_audio_branches():
    # 0.1 direct + 0.5*(0.3 + 0.5) (orchestrator.rs:1642-1668)
    out = _render(_song(
        [_toy("i1", 0.1), _toy("i2", 0.3), _toy("i3", 0.5), _gain("g1", 0.5)],
        [["i1", "main-mixer"], ["i2", "g1", "main-mixer"], ["i3", "g1"]],
    ))
    assert np.allclose(out, 0.1 + 0.5 * (0.3 + 0.5), atol=1e-6)


def test_toy_effect_negation_cancels():
    # signal + its negation == silence (orchestration/src/util.rs:52-78)
    out = _render(_song(
        [_toy("i1", 0.25), {"effect": ["neg", {"toy": {}}]}],
        [["i1", "main-mixer"], ["i1", "neg", "main-mixer"]],
    ))
    assert np.allclose(out, 0.0, atol=1e-7)


def test_instruments_have_no_inputs():
    # patching into an instrument is a hard error
    # (orchestrator.rs:263-304; test-data/instruments-have-no-inputs.json5)
    with pytest.raises(PatchError):
        compile_song(_song(
            [_toy("i1", 0.1), _toy("i2", 0.2)],
            [["i1", "i2", "main-mixer"]],
        ))


def test_render_length_buffer_granular():
    # one silent 1-measure pattern at 240 BPM / 44.1 kHz: 1s of audio,
    # rounded up to the 64-frame buffer grid
    c = compile_song(_song([_toy("i1", 0.1)], [["i1", "main-mixer"]]))
    assert c.n_frames == 44160  # ceil(44100 / 64) * 64


def test_scale_c4_major_compiles_with_correct_shape():
    song = SongSettings.from_project_file(
        "/root/reference/projects/scale-c4-major.json"
    )
    c = compile_song(song)
    # 2 measures at 60 BPM = 8 s
    assert c.n_frames == 352832  # ceil(352800/64)*64
    notes = c.devices["instrument-1"].notes
    assert notes.count == 8
    assert list(notes.keys) == [60, 62, 64, 65, 67, 69, 71, 72]
    # eighth notes at 60 BPM: 0.5 beats = 0.5 s apart, buffer-quantized
    assert abs(notes.on_frames[1] - notes.on_frames[0] - 22050) < 64


def test_drums_trip_curve_rises():
    song = SongSettings.from_project_file(
        "/root/reference/projects/demos/effects/drums-filtered-24db.json"
    )
    c = compile_song(song)
    curve = c.devices["low-pass-1"].automation["cutoff"]
    assert curve[0] == pytest.approx(25.0, rel=1e-3)     # pct 0 -> 25 Hz
    assert curve[-1] == pytest.approx(20000.0, rel=1e-3)  # pct 1 -> 20 kHz
    assert np.all(np.diff(curve.astype(np.float64)) >= -1e-3)  # monotone rise


def test_envelope_demo_renders_adsr_shape():
    song = SongSettings.from_project_file(
        "/root/reference/projects/demos/instruments/envelope-adsr-linear.json"
    )
    c = compile_song(song)
    out = Renderer(c).render()
    assert len(out) == c.n_frames
    env = np.abs(out[:, 0])
    # peak of attack within ~0.1s; gate is a half note (1 beat at 128bpm?)
    peak_t = np.argmax(env) / 44100.0
    assert peak_t < 0.2
    assert env.max() > 0.9
    assert np.max(env[-4410:]) < 0.05  # released by the end


def test_sidechain_compiles_and_orders():
    song = SongSettings.from_project_file(
        "/root/reference/projects/demos/controllers/sidechain.json"
    )
    c = compile_song(song)
    assert ("sidechain-2", "compressor-2", "threshold") in c.sidechain
    # passthrough must be evaluated before its target
    assert c.order.index("sidechain-2") < c.order.index("compressor-2")


def test_load_only_test_entities_mode():
    """The reference loader can swap EVERY device for a toy test double
    (instruments.rs:47-65 ToyInstrument 0.23498239, effects.rs:59-62
    ToyEffect negator, controllers.rs:119-158) so graph/routing tests run
    without real DSP. Every corpus project must still compile and render
    in this mode, with exactly-predictable audio: each chain contributes
    (-1)^n_effects * 0.23498239 while its notes gate."""
    import numpy as np

    from groove_tpu.engine.render import Renderer

    song = SongSettings.from_project_file(
        Path("/root/reference/projects/demos/effects/drums-filtered-24db.json"))
    c = compile_song(song, load_only_test_entities=True)
    dev_kinds = {d.kind for d in c.devices.values()}
    assert "drumkit" not in dev_kinds and "filter-low-pass-24db" not in dev_kinds
    out = np.asarray(Renderer(c).render())
    # one chain: toy-instrument through ONE toy negator
    nz = out[np.abs(out[:, 0]) > 0]
    assert nz.size > 0
    assert np.allclose(np.abs(nz), 0.23498239, atol=1e-6)
    assert np.all(nz <= 0)  # single negation


def test_load_only_test_entities_corpus_loads():
    """Spot the trickier corpus files: sidechain (passthrough mid-cable)
    and kitchen-sink (every effect) still compile in toy mode."""
    for rel in ("projects/demos/controllers/sidechain.json",
                "test-data/kitchen-sink.json"):
        song = SongSettings.from_project_file(Path("/root/reference") / rel)
        c = compile_song(song, load_only_test_entities=True)
        assert c.n_frames > 0


def test_fm_span_buckets_mixed_drone_and_short_notes():
    """An FM song whose notes split into multiple span buckets must ship
    per-BUCKET host phase tables (render.py _collect_instrument): the
    round-4 host-phase migration initially built every bucket's phm/phc
    at the device-global span, which fails XLA shape checking at trace
    time as soon as a drone and short notes land in different buckets.
    Streamed path pinned too (stream.py passes per-bucket spans)."""
    from groove_tpu.engine.stream import StreamingRenderer

    song = _song(
        [{"instrument": ["f", {"fm-synthesizer": [
            {"midi-in": 0},
            {"ratio": 2.0, "depth": 1.0, "beta": 2.0}]}]}],
        [["f", "main-mixer"]],
        patterns=[
            {"id": "drone", "note-value": "whole", "notes": [[36]]},
            {"id": "riff", "note-value": "sixteenth",
             "notes": [[60], [62], [64], [65]] * 4},
        ],
        tracks=[
            {"id": "t1", "midi-channel": 0, "patterns": ["drone"]},
            {"id": "t2", "midi-channel": 0, "patterns": ["riff"]},
        ],
    )
    c = compile_song(song)
    r = Renderer(c)
    assert len(r._buckets.get("f", [])) >= 2, \
        "fixture no longer splits FM notes into multiple span buckets"
    out = np.asarray(r.render())
    assert np.abs(out).max() > 1e-4
    streamed = np.asarray(StreamingRenderer(c, segment_frames=8192).render())
    peak = max(1.0, float(np.abs(out).max()))
    assert float(np.abs(streamed - out).max()) < 5e-4 * peak

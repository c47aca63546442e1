"""Controller tail: arpeggiator held-set cycling, Trigger, Calculator,
MultiLimit voice stealing (VERDICT round-1 item 8)."""

import json
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.events import NoteEvent, arpeggiate
from groove_tpu.compiler.song import compile_song
from groove_tpu.core.time import Tempo
from groove_tpu.engine.render import Renderer
from groove_tpu.models.voices import apply_multilimit_policy
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")


def test_arp_chord_cycles_held_set_one_note_at_a_time():
    """A held chord must produce ONE note per step cycling the held set —
    NOT simultaneous per-note arp streams (the round-1 reconstruction
    emitted parallel arps; this test distinguishes the two)."""
    chord = [
        NoteEvent(0, 60, 100, Fraction(0), Fraction(4)),
        NoteEvent(0, 64, 90, Fraction(0), Fraction(4)),
        NoteEvent(0, 67, 80, Fraction(0), Fraction(4)),
    ]
    out = arpeggiate(chord, 120.0, Tempo(120.0), out_channel=1)
    assert out, "arp emitted nothing"
    # exactly one note per step time
    by_start = {}
    for e in out:
        by_start.setdefault(e.on_beats, []).append(e)
    assert all(len(v) == 1 for v in by_start.values()), \
        "parallel notes at one step — held-set cycling violated"
    # keys cycle the held set ascending: 60, 64, 67, 60, ...
    keys = [e.key for e in sorted(out, key=lambda e: e.on_beats)]
    assert keys[:6] == [60, 64, 67, 60, 64, 67]
    # velocity follows the sounding note
    vels = [e.velocity for e in sorted(out, key=lambda e: e.on_beats)][:3]
    assert vels == [100, 90, 80]


def test_arp_single_note_still_arpeggiates():
    out = arpeggiate(
        [NoteEvent(0, 60, 127, Fraction(0), Fraction(2))],
        120.0, Tempo(120.0), out_channel=1,
    )
    keys = [e.key for e in sorted(out, key=lambda e: e.on_beats)]
    assert keys[:4] == [60, 64, 67, 72]


def test_arp_set_change_mid_stream():
    """Releasing a chord member drops it from the cycle."""
    notes = [
        NoteEvent(0, 60, 127, Fraction(0), Fraction(4)),
        NoteEvent(0, 65, 127, Fraction(0), Fraction(1)),  # released early
    ]
    out = sorted(arpeggiate(notes, 120.0, Tempo(120.0), 1),
                 key=lambda e: e.on_beats)
    early = [e.key for e in out if e.on_beats < 1]
    late = [e.key for e in out if e.on_beats >= 1]
    # while both are held the cycle alternates 60/65
    assert set(early) == {60, 65}
    # after the release, 65 never sounds again (the single-note extension
    # of 60 is 60/64/67/72 — 65 is not in it)
    assert 65 not in late and late
    assert all(k in (60, 64, 67, 72) for k in late)


def test_multilimit_steals_oldest():
    on = np.array([0, 100, 200, 300], np.int64)
    off = np.array([1000, 1000, 1000, 1000], np.int64)
    out = apply_multilimit_policy(on, off, limit=2)
    # note 0 stolen at 200, note 1 stolen at 300, last two play out
    assert list(out) == [200, 300, 1000, 1000]


def test_multilimit_respects_released_notes():
    on = np.array([0, 100, 200], np.int64)
    off = np.array([50, 1000, 1000], np.int64)  # first already released
    out = apply_multilimit_policy(on, off, limit=2)
    assert list(out) == [50, 1000, 1000]  # no stealing needed


def test_multilimit_patch_applies_in_compile():
    """banjo.json has polyphony {multi-limit: 5}; 6 overlapping notes on
    a banjo track must gate the oldest off."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["b", {"welsh": [{"midi-in": 0},
                                            {"name": "banjo"}]}]},
        ],
        "patch-cables": [["b", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "whole",
                      "notes": [[60], [62], [64], [65], [67], [69]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    dev = c.devices["b"]
    assert dev.voice.polyphony == "multi-limit" and dev.voice.poly_limit == 5
    n = dev.notes
    # all 6 notes start at once (one per row, same slot 0) -> oldest stolen
    starts = n.on_frames
    assert len(starts) == 6
    overlap_end = n.off_frames
    # at most 5 sounding at any time
    times = np.unique(np.concatenate([starts, overlap_end]))
    for t in times:
        sounding = np.sum((starts <= t) & (overlap_end > t))
        assert sounding <= 5, (t, sounding)


def test_trigger_fires_control_value_at_time():
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i", {"toy-instrument": [{"midi-in": 0},
                                                     {"fake-value": 0.4}]}]},
            {"effect": ["g", {"gain": {"ceiling": 1.0}}]},
            {"controller": ["trig", {"trigger": [
                {"midi-in": 0, "midi-out": 0},
                {"time": 2.0, "value": 0.25},
            ]}]},
        ],
        "patch-cables": [["i", "g", "main-mixer"]],
        "controls": [{"id": "c", "source": "trig",
                      "target": {"id": "g", "param": "ceiling"}}],
        "patterns": [{"id": "p", "note-value": "whole", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    curve = c.devices["g"].automation["ceiling"]
    out = np.asarray(Renderer(c).render())
    # before beat 2: ceiling 1.0 -> 0.4; after: 0.25 -> 0.1
    assert abs(curve[0] - 1.0) < 1e-6
    assert abs(curve[-1] - 0.25) < 1e-6
    assert abs(out[0, 0] - 0.4) < 1e-5
    assert abs(out[-1, 0] - 0.1) < 1e-5


def test_triggered_step_latches_trigger_value():
    """ControlStep::Triggered (settings/src/controllers.rs:34-38; todo!()
    at control_trip.rs:126). RECONSTRUCTION: the step holds the value it
    entered with until a Trigger controller TARGETING THE TRIP fires;
    then it latches the fired value. Timeline here (240 BPM, whole-note
    steps of 4 beats): flat 0.2 over [0,4), triggered over [4,8) with a
    trigger firing 0.9 at beat 6, flat 0.6 over [8,12)."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i", {"toy-instrument": [{"midi-in": 0},
                                                     {"fake-value": 0.5}]}]},
            {"effect": ["g", {"gain": {"ceiling": 1.0}}]},
            {"controller": ["trig", {"trigger": [
                {"midi-in": 0, "midi-out": 0},
                {"time": 6.0, "value": 0.9},
            ]}]},
            {"controller": ["t1", {"timer": [{}, {"beats": 12}]}]},
        ],
        "patch-cables": [["i", "g", "main-mixer"]],
        "paths": [{"id": "path-1", "note-value": "whole", "steps": [
            {"flat": {"value": 0.2}},
            {"triggered": {}},
            {"flat": {"value": 0.6}},
        ]}],
        "trips": [{"id": "trip-1", "paths": ["path-1"],
                   "target": {"id": "g", "param": "ceiling"}}],
        "controls": [{"id": "c", "source": "trig",
                      "target": {"id": "trip-1", "param": "trigger"}}],
    }))
    c = compile_song(song)
    curve = c.devices["g"].automation["ceiling"]
    beats_per_block = 240.0 / 60.0 * 64 / 44100.0

    def at(beats):
        return curve[int(beats / beats_per_block) + 1]

    assert abs(at(1.0) - 0.2) < 1e-6          # flat step
    assert abs(at(5.0) - 0.2) < 1e-6          # triggered, not yet fired: held
    assert abs(at(7.0) - 0.9) < 1e-6          # fired at beat 6: latched
    assert abs(at(9.0) - 0.6) < 1e-6          # next flat step
    # no warning path: the trigger is consumed by the trip, and the render
    # applies the curve (0.5 * 0.2 at beat 1; 0.5 * 0.9 at beat 7)
    out = np.asarray(Renderer(c).render())
    sr = 44100
    assert abs(out[int(1.5 * sr / 4), 0] - 0.5 * 0.2) < 1e-5
    assert abs(out[int(7.5 * sr / 4), 0] - 0.5 * 0.9) < 1e-5


def test_triggered_step_never_fired_holds_entering_value():
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"effect": ["g", {"gain": {"ceiling": 1.0}}]},
            {"controller": ["t1", {"timer": [{}, {"beats": 8}]}]},
        ],
        "paths": [{"id": "path-1", "note-value": "whole", "steps": [
            {"flat": {"value": 0.3}},
            {"triggered": {}},
        ]}],
        "trips": [{"id": "trip-1", "paths": ["path-1"],
                   "target": {"id": "g", "param": "ceiling"}}],
    }))
    c = compile_song(song)
    curve = c.devices["g"].automation["ceiling"]
    # unfired triggered step holds 0.3 throughout and after
    assert abs(curve[len(curve) // 2] - 0.3) < 1e-6
    assert abs(curve[-1] - 0.3) < 1e-6


@pytest.mark.skipif(not REF.is_dir(), reason="reference assets not mounted")
def test_calculator_project_plays():
    """projects/calculator.json must produce audible output (VERDICT item:
    'parsed, renders silence')."""
    song = SongSettings.from_project_file(REF / "projects" / "calculator.json")
    c = compile_song(song)
    dev = c.devices["instrument-1"]
    assert dev.notes is not None and dev.notes.count > 0
    out = np.asarray(Renderer(c).render())
    assert out.shape[0] > 0
    assert float(np.max(np.abs(out))) > 1e-3, "calculator is silent"


def test_timer_sets_render_length_exactly():
    """Timer(4 beats) at 240 BPM => 1 s of samples on the 64-frame buffer
    grid (the reference's non-ignored accounting tests: Timer 4 beats @
    240 BPM / 24 kHz = exactly 24,000 = 375 buffers, orchestrator.rs:
    1722-1737; at 44.1 kHz the end falls mid-buffer and the run rounds to
    whole buffers, core/time.render_length_frames)."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"controller": ["t1", {"timer": [{}, {"beats": 4}]}]},
        ],
    }))
    c = compile_song(song)
    assert c.n_frames == -(-44100 // 64) * 64  # 44160


def test_zero_timer_renders_zero_samples():
    """orchestrator.rs:1689-1701: a default (zero) Timer alone produces
    an empty performance."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"controller": ["t1", {"timer": [{}, {"beats": 0}]}]},
        ],
    }))
    c = compile_song(song)
    assert c.n_frames == 0
    out = np.asarray(Renderer(c).render())
    assert out.shape == (0, 2)


def test_timer_extends_past_patterns():
    """All controllers must finish before the run ends: a timer longer
    than the stamped patterns extends the render."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"toy-instrument": [{"midi-in": 0},
                                                      {"fake-value": 0.2}]}]},
            {"controller": ["t1", {"timer": [{}, {"beats": 12}]}]},
        ],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    # patterns stamp 1 measure (4 beats); the 12-beat timer wins: 3 s
    assert c.n_frames == -(-3 * 44100 // 64) * 64


def test_steal_rings_out_through_release():
    """A stolen voice is gated into RELEASE at the steal point, not
    truncated: its tone must remain audible (decaying over the amp
    envelope's release) underneath the stealing note, and be gone after
    the release elapses. Render-level proof of the MultiLimit policy's
    interaction with ops/envelope.adsr (release from the value at t_off,
    settings/src/patches.rs:193-200 reconstruction)."""
    from groove_tpu.compiler.song import NoteTensors
    from groove_tpu.utils.spectrum import analyze

    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"instrument": ["i1", {"welsh-raw": [
            {"midi-in": 0},
            {
                "oscillator-1": {"waveform": "sine",
                                 "tune": {"float": 1}, "mix-pct": 1},
                "oscillator-2": {"waveform": "none",
                                 "tune": {"float": 1}, "mix-pct": 0},
                "oscillator-2-track": True,
                "oscillator-2-sync": False,
                "noise": 0,
                "lfo": {"routing": "none", "waveform": "none",
                        "frequency": 0, "depth": "none"},
                "glide": 0, "unison": False,
                "polyphony": {"multi-limit": 1},
                # weight is the sweep TARGET pct (patches.rs derive): keep
                # the filter parked open with sustain 1 + weight 1
                "filter-type-24db": {"cutoff-hz": 20000, "cutoff-pct": 1.0},
                "filter-type-12db": {"cutoff-hz": 20000, "cutoff-pct": 1.0},
                "filter-resonance": 0,
                "filter-envelope-weight": 1.0,
                "filter-envelope": {"attack": 0, "decay": 0,
                                    "sustain": 1, "release": 0},
                # release:=decay quirk (patches.rs:133-138): decay 0.5
                # gives the 0.5 s release this test relies on
                "amp-envelope": {"attack": 0.005, "decay": 0.5,
                                 "sustain": 1.0, "release": 0.5},
            },
        ]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "whole",
                      "notes": [[69], [69], [69], [69]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    dev = c.devices["i1"]
    assert dev.voice.poly_limit == 1
    sr = c.sample_rate
    # two overlapping notes: A4 held, C5 arrives at 0.5 s and steals it
    on = np.array([0, sr // 2], np.int32)
    off = np.array([3 * sr // 2, 3 * sr // 2], np.int32)
    off = apply_multilimit_policy(on, off, limit=1).astype(np.int32)
    assert off[0] == sr // 2  # stolen at the C5 onset
    dev.notes = NoteTensors(np.array([69, 72], np.int32),
                            np.array([100.0, 100.0], np.float32), on, off)
    out = np.asarray(Renderer(c).render()).T  # [2, n]

    # During the first 0.3 s after the steal both tones sound: the stolen
    # A4 is releasing (0.5 s) under the new C5.
    during = analyze(out[:, sr // 2 + 2205: sr // 2 + int(0.3 * sr)], sr)
    a4, c5 = during.level_at(440.0), during.level_at(523.25)
    assert c5 > -20.0, c5
    assert a4 > -40.0, a4          # ring-out present (not truncated)
    assert a4 < c5, (a4, c5)       # but decaying below the live note

    # Well after the release has elapsed, A4 is gone and C5 remains.
    t2 = sr // 2 + int(0.7 * sr)
    after = analyze(out[:, t2: t2 + int(0.3 * sr)], sr)
    assert after.level_at(523.25) > -20.0
    assert after.level_at(440.0) < after.level_at(523.25) - 35.0


def test_trigger_fires_in_containing_block():
    """A trigger time strictly INSIDE a 64-frame block fires in that block
    (matching note buffer-quantization) — `block start >= time` fired one
    block late whenever the time wasn't block-aligned (review finding)."""
    bpm, sr = 128.0, 44100
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": bpm},
        "devices": [
            {"instrument": ["i", {"toy-instrument": [{"midi-in": 0},
                                                     {"fake-value": 0.4}]}]},
            {"effect": ["g", {"gain": {"ceiling": 1.0}}]},
            {"controller": ["trig", {"trigger": [
                {"midi-in": 0, "midi-out": 0},
                {"time": 0.999, "value": 0.25},
            ]}]},
        ],
        "patch-cables": [["i", "g", "main-mixer"]],
        "controls": [{"id": "c", "source": "trig",
                      "target": {"id": "g", "param": "ceiling"}}],
        "patterns": [{"id": "p", "note-value": "whole", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    from groove_tpu.compiler.automation import block_start_beats
    from groove_tpu.core.time import SampleRate, Tempo

    curve = compile_song(song).devices["g"].automation["ceiling"]
    beats = block_start_beats(len(curve), Tempo(bpm), SampleRate(sr))
    # the block CONTAINING beat 0.999 (strictly inside: starts are
    # ~0.99690 and 1.0 at 128 bpm on the quantized musical-time grid)
    blk = int(np.searchsorted(beats, 0.999, side="right") - 1)
    assert beats[blk] < 0.999 < beats[blk + 1], "fixture must be mid-block"
    assert abs(curve[blk] - 0.25) < 1e-6, "trigger missed its containing block"
    assert abs(curve[blk - 1] - 1.0) < 1e-6, "trigger fired early"


def test_bitcrusher_bits_alias_seeds_pre_trigger_region():
    """Project data stores bitcrusher depth under `bits` (the registry
    name is `bits-to-crush`); the pre-trigger region must read the
    CONFIGURED value through the alias, not 0 (review finding)."""
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i", {"toy-instrument": [{"midi-in": 0},
                                                     {"fake-value": 0.4}]}]},
            {"effect": ["b", {"bitcrusher": {"bits": 6}}]},
            {"controller": ["trig", {"trigger": [
                {"midi-in": 0, "midi-out": 0},
                {"time": 2.0, "value": 1.0},
            ]}]},
        ],
        "patch-cables": [["i", "b", "main-mixer"]],
        "controls": [{"id": "c", "source": "trig",
                      "target": {"id": "b", "param": "bits-to-crush"}}],
        "patterns": [{"id": "p", "note-value": "whole", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    curve = compile_song(song).devices["b"].automation["bits-to-crush"]
    assert abs(curve[0] - 6.0) < 1e-6, \
        f"pre-trigger bits read {curve[0]}, expected the configured 6"
    assert abs(curve[-1] - 15.0) < 1e-6  # fired: ControlValue 1.0 -> 15

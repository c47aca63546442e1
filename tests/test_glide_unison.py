"""Glide (portamento) and unison — RECONSTRUCTED IMPROVEMENTS: the
reference parses both patch fields (settings/src/patches.rs:33-34) but its
derive drops them (patches.rs:110-169, WelshSynthParams has no slots), even
though 19 shipped patches carry nonzero glide and screaming-sync sets
unison. Semantics here: constant-time exponential pitch slide from the last
played pitch (welsh._glide_factor/_glide_phase); unison = three detuned
copies at +/-welsh.UNISON_CENTS and vel/3, tripled at render-input time
only (dev.notes stays the true performance)."""

import json

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.engine.stream import StreamingRenderer
from groove_tpu.models.voices import glide_prev_keys
from groove_tpu.project.schema import SongSettings

SR = 44100


def _song(glide=0.0, unison=False, notes=((48, "whole"), (60, "whole")),
          waveform="sawtooth", bpm=240):
    patterns = [{"id": f"p{i}", "note-value": nv, "notes": [[k]]}
                for i, (k, nv) in enumerate(notes)]
    return SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": bpm},
        "devices": [{"instrument": ["i1", {"welsh-raw": [
            {"midi-in": 0},
            {
                "oscillator-1": {"waveform": waveform,
                                 "tune": {"float": 1}, "mix-pct": 1},
                "oscillator-2": {"waveform": "none",
                                 "tune": {"float": 1}, "mix-pct": 0},
                "oscillator-2-track": True, "oscillator-2-sync": False,
                "noise": 0,
                "lfo": {"routing": "none", "waveform": "none",
                        "frequency": 0, "depth": "none"},
                "glide": glide, "unison": unison, "polyphony": "mono",
                "filter-type-24db": {"cutoff-hz": 20000, "cutoff-pct": 1},
                "filter-type-12db": {"cutoff-hz": 20000, "cutoff-pct": 1},
                "filter-resonance": 0,
                "filter-envelope-weight": 0,
                "filter-envelope": {"attack": 0, "decay": 0,
                                    "sustain": 0, "release": 0},
                "amp-envelope": {"attack": 0.005, "decay": 0,
                                 "sustain": 1, "release": 0.05},
            },
        ]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": patterns,
        "tracks": [{"id": "t", "midi-channel": 0,
                    "patterns": [p["id"] for p in patterns]}],
    }))


def _peak_hz(seg):
    f = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SR)
    lo = np.searchsorted(freqs, 40.0)  # skip DC/envelope leakage
    return float(freqs[lo + int(np.argmax(f[lo:]))])


def test_glide_prev_keys_rules():
    keys = np.array([60, 64, 67, 72, 55])
    on = np.array([0, 0, 100, 200, 200])
    prev = glide_prev_keys(keys, on)
    # first onset group: no glide (prev == own key)
    assert prev[0] == 60 and prev[1] == 64
    # 67 glides from the last key of the first group
    assert prev[2] == 64
    # the chord at 200 both glide from 67, never from each other
    assert prev[3] == 67 and prev[4] == 67


def test_glide_slides_pitch_between_notes():
    """C3 whole note then C4 whole note at 240 bpm (1 s each), glide 0.6 s:
    right after the second onset the fundamental is still near C3; by the
    end of the slide it is C4. Without glide the second note starts at C4
    immediately."""
    c = compile_song(_song(glide=0.6))
    out = np.asarray(Renderer(c).render())[:, 0]
    on2 = SR  # second note starts at 1 s
    early = _peak_hz(out[on2 + 441: on2 + 441 + 4096])       # ~10-100 ms in
    late = _peak_hz(out[on2 + int(0.8 * SR): on2 + int(0.8 * SR) + 8192])
    c3, c4 = 130.81, 261.63
    assert abs(early - c3) < 25, f"slide start {early} Hz, expected ~C3"
    assert abs(late - c4) < 10, f"slide end {late} Hz, expected C4"

    plain = np.asarray(Renderer(compile_song(_song(glide=0.0))).render())[:, 0]
    early_p = _peak_hz(plain[on2 + 441: on2 + 441 + 4096])
    assert abs(early_p - c4) < 25, "no-glide render should start at C4"


def test_glide_zero_is_bitwise_unchanged():
    """glide == 0 must keep the exact glide-free graph (no prev inputs)."""
    c = compile_song(_song(glide=0.0))
    assert c.devices["i1"].notes.prev_keys is None
    r = Renderer(c)
    assert not any("/prev" in k for k in r.inputs)


def test_glide_streamed_segmentation_invariant():
    """Glide devices refuse the sliced path and stay bitwise under any
    64-multiple segmentation on the unsliced streamed path."""
    from groove_tpu.models.welsh import can_slice

    c = compile_song(_song(glide=0.3, bpm=480))
    assert not can_slice(c.devices["i1"].voice)
    one_seg = -(-c.n_frames // 64) * 64
    one = np.asarray(StreamingRenderer(c, segment_frames=one_seg).render())
    many = np.asarray(StreamingRenderer(c, segment_frames=8192).render())
    assert np.array_equal(one, many)
    whole = np.asarray(Renderer(c).render())
    assert np.max(np.abs(whole - many)) <= 1e-4 * max(np.abs(whole).max(), 1)


def test_unison_triples_render_only():
    """Unison: the render sees 3 detuned rows per note at vel/3; dev.notes
    (MIDI bounce / GUI surface) keeps the original performance; the audio
    beats against itself (amplitude modulation a single saw lacks)."""
    c = compile_song(_song(unison=True, notes=((57, "whole"),), bpm=120))
    assert c.devices["i1"].notes.count == 1  # true performance untouched
    r = Renderer(c)
    key_rows = [v for k, v in r.inputs.items()
                if k.startswith("wm/") and k.endswith("/keys")]
    assert sum(len(v) for v in key_rows) == 3
    uni = np.asarray(r.render())[:, 0]
    plain = np.asarray(
        Renderer(compile_song(_song(unison=False, notes=((57, "whole"),),
                                    bpm=120))).render())[:, 0]
    assert np.abs(uni).max() > 0.05
    # +/-7 cents on A3 (220 Hz) beats at ~0.9 Hz: the 2 s note's envelope
    # must dip well below its peak mid-note while the plain saw stays flat
    seg = slice(int(0.2 * SR), int(1.8 * SR))
    blk = SR // 10

    def env_ratio(x):
        peaks = [np.abs(x[seg][i:i + blk]).max()
                 for i in range(0, len(x[seg]) - blk, blk)]
        return min(peaks) / max(peaks)

    assert env_ratio(plain) > 0.9, "plain saw should have a flat envelope"
    assert env_ratio(uni) < 0.75, "unison stack should beat audibly"


def test_unison_streamed_matches_whole():
    """The streamed engine must triple unison notes exactly like the
    whole-song path (input-build tripling + _note_buckets on/off
    overrides): whole vs streamed stays within the usual regroup
    tolerance, and streaming is bitwise segmentation-invariant."""
    c = compile_song(_song(unison=True, glide=0.1,
                           notes=((57, "half"), (64, "half")), bpm=240))
    whole = np.asarray(Renderer(c).render())
    one_seg = -(-c.n_frames // 64) * 64
    one = np.asarray(StreamingRenderer(c, segment_frames=one_seg).render())
    many = np.asarray(StreamingRenderer(c, segment_frames=8192).render())
    assert np.array_equal(one, many)
    assert np.abs(whole).max() > 0.05
    assert np.max(np.abs(whole - many)) <= 1e-4 * np.abs(whole).max()


def test_boolean_glide_is_skipped():
    """'glide: true' must fall to 0 like other non-numeric values (bool is
    an int subclass — must not parse as a 1-second portamento)."""
    from groove_tpu.project.patches import WelshPatchSettings

    raw = {"name": "x", "glide": True, "oscillator-1": {
        "waveform": "sine", "tune": {"float": 1}, "mix-pct": 1}}
    v = WelshPatchSettings(name="x", raw=raw).derive_welsh_voice_params()
    assert v.glide == 0.0


def test_glide_patch_loads_from_corpus():
    """didgeridoo (glide 0.1, mono) and screaming-sync (glide+unison) parse
    their fields; octave-switch's glide: 'off' quirk maps to 0."""
    from groove_tpu.project.paths import Paths
    from groove_tpu.project.patches import WelshPatchSettings

    paths = Paths()
    d = WelshPatchSettings.by_name(paths, "didgeridoo")\
        .derive_welsh_voice_params()
    assert d.glide == pytest.approx(0.1) and not d.unison
    s = WelshPatchSettings.by_name(paths, "screaming-sync")\
        .derive_welsh_voice_params()
    assert s.glide == pytest.approx(0.02) and s.unison
    o = WelshPatchSettings.by_name(paths, "octave-switch")\
        .derive_welsh_voice_params()
    assert o.glide == 0.0


def test_live_glide_slides_pitch():
    """Two sequential live notes on a glide patch: the second note's first
    blocks sound near the FIRST pitch and slide up."""
    from groove_tpu.engine.livesong import LiveSongRenderer

    c = compile_song(_song(glide=0.6))
    r = LiveSongRenderer(c)
    r.note_on(0, 48, 120)
    for _ in range(40):
        r.render_block()
    r.note_off(0, 48)
    r.note_on(0, 60, 120)
    blocks = [r.render_block()[:, 0] for _ in range(700)]
    audio = np.concatenate(blocks)
    early = _peak_hz(audio[441:441 + 4096])
    late = _peak_hz(audio[int(0.8 * SR):int(0.8 * SR) + 8192])
    assert abs(early - 130.81) < 25, f"live slide start {early} Hz"
    assert abs(late - 261.63) < 10, f"live slide end {late} Hz"

"""Sliced streamed welsh (StreamingRenderer.WELSH_SLICED, opt-in):
per-segment note slices with carried per-note cascade state must be
(a) bitwise segmentation-invariant — osc/env/noise values come from
gathers of the same host constants at absolute note ages, and the
cascade streams on the fixed 64-grid like the effect filters — and
(b) equivalent to the whole-timeline Renderer within the streamed
tolerance contract."""

import json

import numpy as np

from groove_tpu.compiler.song import compile_midi_file, compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.engine.stream import StreamingRenderer
from groove_tpu.project.schema import SongSettings
from tests.test_project import REF


class Sliced(StreamingRenderer):
    WELSH_SLICED = True


def _noise_song(bpm=120):
    """welsh-raw with noise mixed in (exercises the sliced noise gather)
    and two overlapping notes (state slots in one bucket)."""
    return SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": bpm},
        "devices": [{"instrument": ["i1", {"welsh-raw": [
            {"midi-in": 0},
            {
                "oscillator-1": {"waveform": "sawtooth",
                                 "tune": {"float": 1}, "mix-pct": 1},
                "oscillator-2": {"waveform": "square",
                                 "tune": {"float": 1.5}, "mix-pct": 0.5},
                "oscillator-2-track": True, "oscillator-2-sync": False,
                "noise": 0.25,
                "lfo": {"routing": "none", "waveform": "none",
                        "frequency": 0, "depth": "none"},
                "glide": 0, "unison": False, "polyphony": "multi",
                "filter-type-24db": {"cutoff-hz": 3000, "cutoff-pct": 0.6},
                "filter-type-12db": {"cutoff-hz": 3000, "cutoff-pct": 0.6},
                "filter-resonance": 0.3,
                "filter-envelope-weight": 0.8,
                "filter-envelope": {"attack": 0.05, "decay": 0.3,
                                    "sustain": 0.4, "release": 0.5},
                "amp-envelope": {"attack": 0.01, "decay": 0.1,
                                 "sustain": 0.8, "release": 0.4},
            },
        ]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "quarter",
                      "notes": [[60, 64], [67], [], [72, 55]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))


def _check(c, seg=16384):
    one_seg = -(-c.n_frames // 64) * 64
    one = Sliced(c, segment_frames=one_seg).render()
    many = Sliced(c, segment_frames=seg).render()
    assert np.array_equal(one, many), "sliced segmentation not bitwise"
    whole = np.asarray(Renderer(c).render())
    peak = max(1.0, float(np.abs(whole).max()))
    err = float(np.abs(whole - many).max())
    assert err < 1e-4 * peak, f"sliced diverges from whole: {err}"
    return many


def test_sliced_noise_song_bitwise_and_matches_whole():
    out = _check(compile_song(_noise_song()), seg=4096)
    assert float(np.abs(out).max()) > 0.05


def test_sliced_scale_c4_matches_whole():
    _check(compile_song(SongSettings.from_project_file(
        REF / "projects/scale-c4-major.json")))


def test_sliced_smf_multichannel_matches_whole():
    # 9 GM welsh channels incl. 'serial'-fidelity devices + drums
    _check(compile_midi_file(REF / "test-data/midi/sound_of_music.mid"))


def test_sliced_pallas_kernel_path(monkeypatch):
    """With Pallas routing forced (interpret mode on CPU), the sliced
    cascade runs in the fused stream kernels with packed p4/p20 state:
    (a) chaining two half-slices through the state is BITWISE one full
    slice (segmentation invariance), and (b) the result tracks the XLA
    sliced path to the blockrate-kernel tolerance (the kernel reads
    block-rate coefs directly; groupings differ like the other
    blockrate kernels)."""
    from groove_tpu.models import welsh as wm
    from groove_tpu.ops import iir, pallas_iir

    c = compile_song(_noise_song())
    params = c.devices["i1"].voice
    sr, span, S = 44100.0, 8192, 4096
    tf, tbf = wm.slice_time_bases(span, sr)
    keys = np.array([60.0, 64.0, 67.0], np.float32)
    vels = np.array([100.0, 90.0, 80.0], np.float32)
    gate = np.array([4096.0, 6144.0, 2048.0], np.float32)
    z3 = np.zeros(3, np.int32)

    def run(fidelity, S_, n_calls):
        st = wm.slice_state_init(2, fidelity)  # 3 rows == batch here
        outs = []
        for i in range(n_calls):
            y, st = wm.render_notes_slice(
                params, keys, vels, gate, z3 + i * S_, S_, sr, st,
                tf, tbf, fidelity=fidelity)
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1), st

    for fidelity, key in ((None, "p4"), ("refine", "p20")):
        y_xla, st_xla = run(fidelity, span, 1)
        assert key not in st_xla  # CPU default: XLA path

        monkeypatch.setattr(iir, "USE_PALLAS", True)
        monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", True)
        y_full, st_full = run(fidelity, span, 1)
        assert key in st_full
        y_chain, st_chain = run(fidelity, S, 2)
        assert np.array_equal(y_full, y_chain), "sliced pallas not bitwise"
        assert np.array_equal(np.asarray(st_full[key]),
                              np.asarray(st_chain[key]))
        peak = max(1.0, float(np.abs(y_xla).max()))
        err = float(np.abs(y_full - y_xla).max())
        assert err < 1e-4 * peak, f"pallas vs xla sliced: {err}"
        monkeypatch.setattr(iir, "USE_PALLAS", None)
        monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", False)


def test_sliced_pallas_end_to_end(monkeypatch):
    """StreamingRenderer WELSH_SLICED under forced-Pallas routing: state
    init produces the packed kernel state and segmented output is
    bitwise-invariant and close to the whole-timeline render."""
    from groove_tpu.ops import iir, pallas_iir

    monkeypatch.setattr(iir, "USE_PALLAS", True)
    monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", True)
    c = compile_song(_noise_song(bpm=480))
    one_seg = -(-c.n_frames // 64) * 64
    r = Sliced(c, segment_frames=one_seg)
    assert any(k.endswith("/p4") for k in r._state0), \
        "pallas sliced state not active"
    one = r.render()
    many = Sliced(c, segment_frames=8192).render()
    assert np.array_equal(one, many), "sliced segmentation not bitwise"
    monkeypatch.setattr(iir, "USE_PALLAS", None)
    monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", False)
    whole = np.asarray(Renderer(c).render())
    peak = max(1.0, float(np.abs(whole).max()))
    err = float(np.abs(whole - np.asarray(many)).max())
    assert err < 1e-3 * peak, f"sliced pallas diverges from whole: {err}"
    assert float(np.abs(whole).max()) > 0.05


def test_sliced_excludes_pitch_lfo_devices():
    """Pitch-modulated phases integrate over the whole window and must
    fall back to the unsliced path (welsh.can_slice)."""
    from groove_tpu.models.welsh import can_slice

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/scale-c4-major.json"))
    r = Sliced(c)
    for u in r._sliced:
        assert can_slice(c.devices[u].voice)


def test_auto_routing_by_segment_size():
    """VERDICT r3 item 4: the CLI --sliced configuration routes PER
    DEVICE by the _slice_wins work model, so it never loses to the
    unsliced path — a device slices when the segment is short relative
    to its note windows and keeps whole windows when it isn't. Output
    matches the whole-timeline render either way."""
    c = compile_song(_noise_song(bpm=480))
    Auto = type("Auto", (StreamingRenderer,), {"WELSH_SLICED": "auto"})
    small = Auto(c, segment_frames=4096)
    assert small._sliced, "short segments should route to slicing"
    one_seg = -(-c.n_frames // 64) * 64
    big = Auto(c, segment_frames=one_seg)
    assert not big._sliced, \
        "a whole-song segment should route to whole windows"
    whole = np.asarray(Renderer(c).render())
    peak = max(1.0, float(np.abs(whole).max()))
    for r in (small, big):
        out = r.render()
        assert float(np.abs(out - whole).max()) < 1e-4 * peak


def test_tpu_calibrated_slice_cost_routing():
    """The TPU kernel-cost calibration (SLICE_COST_TPU=6, round 5):
    after welsh.slice_rows replaced the slice path's per-sample
    gathers, on-chip forced-sliced measured 57.4x vs unsliced 33.5x
    at S=16384 and 50.7x vs 75.9x at S=65536 (jingle_bells) — fitted
    work-model constants 3.6 / 1.7, shipped as 6 for conservatism
    (stream.SLICE_COST_TPU comment). The router must keep ~1s spans
    on whole windows at the north-star (65536) and mid (16384)
    segment sizes, slice them at live-pull sizes (4096: span/S ~ 11
    recompute factor > cost), and slice a long drone at small S while
    keeping it whole at 65536 (recompute ~7 vs cost-weighted ~8.8)."""
    Auto = type("AutoTpu", (StreamingRenderer,), {"WELSH_SLICED": "auto"})

    c = compile_song(_noise_song())
    r = Auto(c, segment_frames=4096)
    r._slice_cost = lambda: StreamingRenderer.SLICE_COST_TPU
    welsh_devs = [d for d in c.devices.values()
                  if d.kind == "welsh-raw" and d.notes is not None]
    assert welsh_devs
    for S in (65536, 16384):
        r.S = S
        for d in welsh_devs:
            assert not r._slice_wins(d), \
                f"S={S}: ~1s spans must not slice at TPU cost"
    r.S = 4096
    for d in welsh_devs:
        assert r._slice_wins(d), \
            "S=4096: ~1s spans (recompute ~11x > cost 6) must slice"

    # one whole note held at bpm 30 = 8s gate (~370k-frame span):
    # span/S ~ 90 >> 6 at S=4096 -> slices; at S=65536 the window
    # recompute factor ~7 sits under the cost-weighted sliced estimate
    # (6 * (span+S)/span ~ 7.1, and ceil rounds the recompute up to 7
    # only in aggregate) -> stays unsliced
    # build the drone from JSON (the schema's parsed BeatValue types
    # are not assignable as strings)
    cd = compile_song(SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 30},
        "devices": [{"instrument": ["i1", {"welsh-raw": [
            {"midi-in": 0},
            {
                "oscillator-1": {"waveform": "sawtooth",
                                 "tune": {"float": 1}, "mix-pct": 1},
                "oscillator-2": {"waveform": "square",
                                 "tune": {"float": 1.5}, "mix-pct": 0.5},
                "oscillator-2-track": True, "oscillator-2-sync": False,
                "noise": 0.25,
                "lfo": {"routing": "none", "waveform": "none",
                        "frequency": 0, "depth": "none"},
                "glide": 0, "unison": False, "polyphony": "multi",
                "filter-type-24db": {"cutoff-hz": 3000, "cutoff-pct": 0.6},
                "filter-type-12db": {"cutoff-hz": 3000, "cutoff-pct": 0.6},
                "filter-resonance": 0.3,
                "filter-envelope-weight": 0.8,
                "filter-envelope": {"attack": 0.05, "decay": 0.3,
                                    "sustain": 0.4, "release": 0.5},
                "amp-envelope": {"attack": 0.01, "decay": 0.1,
                                 "sustain": 0.8, "release": 0.4},
            },
        ]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "whole", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    })))
    rd = Auto(cd, segment_frames=4096)
    rd._slice_cost = lambda: StreamingRenderer.SLICE_COST_TPU
    dev = [d for d in cd.devices.values()
           if d.kind == "welsh-raw" and d.notes is not None][0]
    rd.S = 4096
    assert rd._slice_wins(dev), "long drone at live-pull S must slice"
    rd.S = 65536
    assert not rd._slice_wins(dev)

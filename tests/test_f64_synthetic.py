"""Synthetic f64-golden coverage for the round-5 tool extensions
(VERDICT r4 item 2): NO corpus file automates chorus taps, FM params, or
a sidechain onto a filter's coefficients, so these songs construct each
class and pin the engine against tools/f64_reference.py song-level.

Bars sit ~8 dB above values measured on the CPU suite backend. The
sidechain-filter bar is looser: the control derives from each renderer's
OWN signal (semantics, not shared bits), and coefficient differences are
amplified by the filter's memory.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

pytest.importorskip("tools.f64_reference")


def _residual_db(song_dict) -> float:
    from tools.f64_reference import render_f64

    c = compile_song(SongSettings.from_json5_str(json.dumps(song_dict)))
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    ref = render_f64(c)
    assert got.shape == ref.shape
    peak = max(1.0, float(np.abs(ref).max()))
    return 20.0 * np.log10(float(np.abs(got - ref).max()) / peak + 1e-30)


def _base(devices, cables, paths=None, trips=None, controls=None,
          patterns=None, tracks=None):
    d = {
        "clock": {"bpm": 120, "time-signature": [4, 4]},
        "devices": devices,
        "patch-cables": cables,
        "patterns": patterns or [
            {"id": "p", "note-value": "half", "notes": [[60], [64]]}],
        "tracks": tracks or [
            {"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }
    if paths:
        d["paths"] = paths
    if trips:
        d["trips"] = trips
    if controls:
        d["controls"] = controls
    return d


def test_automated_chorus_taps_vs_f64():
    """Trips on chorus `delay-seconds` AND `voices` — the per-block
    gather-tap path (delayfx.chorus_automated) vs the f64 mirror's exact
    integer tap math."""
    song = _base(
        devices=[
            {"instrument": ["w", {"welsh": [{"midi-in": 0},
                                            {"name": "piano"}]}]},
            {"effect": ["ch", {"chorus": {"voices": 4,
                                          "delay-seconds": 0.2}}]},
        ],
        cables=[["w", "ch", "main-mixer"]],
        paths=[
            {"id": "dsweep", "note-value": "whole",
             "steps": [{"slope": [0.05, 0.3]}, {"flat": [0.15]}]},
            {"id": "vsweep", "note-value": "whole",
             "steps": [{"slope": [0.1, 0.9]}]},
        ],
        trips=[
            {"id": "td", "target": {"id": "ch", "param": "delay-seconds"},
             "paths": ["dsweep"]},
            {"id": "tv", "target": {"id": "ch", "param": "voices"},
             "paths": ["vsweep"]},
        ],
    )
    db = _residual_db(song)
    assert db <= -90.0, f"automated chorus taps residual {db:.1f} dBFS"


def test_automated_fm_params_vs_f64():
    """Trips on FM ratio/depth/beta — the blocked-cumsum modulator phase
    (fm.modulator_phase) shared eagerly by the f64 mirror."""
    song = _base(
        devices=[
            {"instrument": ["f", {"fm-synthesizer": [{"midi-in": 0}, {}]}]},
            {"effect": ["g", {"gain": {"ceiling": 0.7}}]},
        ],
        cables=[["f", "g", "main-mixer"]],
        paths=[
            {"id": "rsweep", "note-value": "whole",
             "steps": [{"slope": [0.2, 0.8]}]},
            {"id": "dsweep", "note-value": "whole",
             "steps": [{"slope": [0.1, 0.9]}]},
            {"id": "bsweep", "note-value": "whole",
             "steps": [{"flat": [0.3]}, {"slope": [0.3, 0.6]}]},
        ],
        trips=[
            {"id": "tr", "target": {"id": "f", "param": "ratio"},
             "paths": ["rsweep"]},
            {"id": "td", "target": {"id": "f", "param": "depth"},
             "paths": ["dsweep"]},
            {"id": "tb", "target": {"id": "f", "param": "beta"},
             "paths": ["bsweep"]},
        ],
    )
    db = _residual_db(song)
    assert db <= -80.0, f"automated FM params residual {db:.1f} dBFS"


def test_sidechain_driven_filter_vs_f64():
    """A signal-passthrough control driving a FILTER's cutoff — the
    engine computes coefficients in-trace from the runtime control; the
    f64 mirror designs from its own f64-derived control cast to f32
    (semantics comparison, hence the looser bar)."""
    song = _base(
        devices=[
            {"instrument": ["w", {"welsh": [{"midi-in": 0},
                                            {"name": "piano"}]}]},
            {"instrument": ["d", {"welsh": [{"midi-in": 1},
                                            {"name": "cowbell"}]}]},
            {"controller": ["sc", {"signal-passthrough-controller":
                                   {"midi-in": 1}}]},
            {"effect": ["lp", {"filter-low-pass-12db": {"cutoff": 2000.0,
                                                        "q": 0.9}}]},
        ],
        cables=[["w", "lp", "main-mixer"], ["d", "sc", "main-mixer"]],
        controls=[{"id": "link", "source": "sc",
                   "target": {"id": "lp", "param": "cutoff"}}],
        tracks=[{"id": "t0", "midi-channel": 0, "patterns": ["p"]},
                {"id": "t1", "midi-channel": 1, "patterns": ["p"]}],
    )
    db = _residual_db(song)
    assert db <= -60.0, f"sidechain-driven filter residual {db:.1f} dBFS"

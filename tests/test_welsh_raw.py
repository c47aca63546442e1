"""welsh-raw instrument (inline params, InstrumentSettings::WelshRaw,
settings/src/instruments.rs:31) and batch song rendering."""

import json

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.parallel.mesh import render_songs_data_parallel
from groove_tpu.project.schema import SongSettings


def _raw_song():
    return SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"instrument": ["i1", {"welsh-raw": [
            {"midi-in": 0},
            {
                "oscillator-1": {"waveform": "sawtooth",
                                 "tune": {"float": 1}, "mix-pct": 1},
                "oscillator-2": {"waveform": "none",
                                 "tune": {"float": 1}, "mix-pct": 0},
                "oscillator-2-track": True,
                "oscillator-2-sync": False,
                "noise": 0,
                "lfo": {"routing": "none", "waveform": "none",
                        "frequency": 0, "depth": "none"},
                "glide": 0, "unison": False, "polyphony": "multi",
                "filter-type-24db": {"cutoff-hz": 8000, "cutoff-pct": 0.8},
                "filter-type-12db": {"cutoff-hz": 8000, "cutoff-pct": 0.8},
                "filter-resonance": 0,
                "filter-envelope-weight": 0.9,
                "filter-envelope": {"attack": 0, "decay": 1,
                                    "sustain": 1, "release": 1},
                "amp-envelope": {"attack": 0.01, "decay": 0.1,
                                 "sustain": 0.8, "release": 0.2},
            },
        ]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "quarter", "notes": [[69]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))


def test_welsh_raw_renders_pitched_audio():
    c = compile_song(_raw_song())
    assert c.devices["i1"].voice is not None
    out = np.asarray(Renderer(c).render())
    seg = out[2000:20000, 0]
    assert np.sqrt((seg**2).mean()) > 0.05
    f = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / 44100)
    peak = freqs[np.argmax(f)]
    # A4 sawtooth: peak at 440 or a harmonic
    assert min(abs(peak - 440 * k) for k in (1, 2, 3, 4)) < 5


def test_batch_render_across_devices():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    renderers = [Renderer(compile_song(_raw_song())) for _ in range(3)]
    outs = render_songs_data_parallel(renderers)
    assert len(outs) == 3
    assert all(np.array_equal(outs[0], o) for o in outs[1:])
    assert np.abs(outs[0]).max() > 0.05

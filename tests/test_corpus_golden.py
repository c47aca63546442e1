"""Corpus-wide golden regression (VERDICT r1 #9): every reference project
renders to pinned frames/peak/rms, so ANY silent semantic change to a
voice, effect, controller, or compiler path fails CI — not just the 4
headline configs in test_regression.py.

Fixture: tests/golden_corpus.json, full-precision stats recorded by
  python tools/render_corpus.py --golden tests/golden_corpus.json
on the CPU backend (the suite's backend). Frames are exact; peak/rms get
1% relative tolerance (float-ordering headroom across jax/XLA versions)
with a small absolute floor for near-silent files.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_midi_file, compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")
FIXTURE = Path(__file__).parent / "golden_corpus.json"

GOLDEN = json.loads(FIXTURE.read_text()) if FIXTURE.exists() else {}


@pytest.mark.parametrize(
    "rel", sorted(GOLDEN), ids=[r.replace("/", "-") for r in sorted(GOLDEN)]
)
def test_corpus_render_pinned(rel):
    n_frames, peak, rms = GOLDEN[rel]
    p = REF / rel
    if p.suffix == ".mid":
        compiled = compile_midi_file(p)
    else:
        compiled = compile_song(SongSettings.from_project_file(p))
    out = np.asarray(Renderer(compiled).render())
    assert compiled.n_frames == n_frames
    assert int(np.isnan(out).sum() + np.isinf(out).sum()) == 0
    got_peak = float(np.abs(out).max()) if out.size else 0.0
    got_rms = float(np.sqrt((out**2).mean())) if out.size else 0.0
    assert got_peak == pytest.approx(peak, rel=0.01, abs=1e-4)
    assert got_rms == pytest.approx(rms, rel=0.01, abs=1e-5)


def test_golden_fixture_covers_the_corpus():
    """The fixture must track the shipped corpus: every project file the
    loader accepts (same walk as tools/render_corpus.py) has a pin."""
    skip = {"invalid-project.json", "test.grv",
            "instruments-have-no-inputs.json5"}
    expected = set()
    for base in [REF / "projects", REF / "test-data"]:
        for p in sorted(base.rglob("*.json")) + sorted(base.rglob("*.json5")):
            if p.name not in skip and "midi" not in p.parts:
                expected.add(str(p.relative_to(REF)))
    assert GOLDEN, "tests/golden_corpus.json missing — regenerate it"
    missing = expected - set(GOLDEN)
    assert not missing, f"corpus files without golden pins: {sorted(missing)}"

"""Render-regression pins: audio statistics of headline configs, recorded
on the CPU backend. Loose enough for float-ordering changes (rel 1%),
tight enough to catch any semantic change to the voices, effects,
automation, or event compiler."""

from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

# (file, n_frames, peak, rms) recorded 2026-08-16 on jax 0.9 CPU
PINS = [
    ("projects/demos/effects/drums-filtered-24db.json",
     165376, 0.990818, 0.067093),
    ("projects/scale-c4-major.json", 352832, 0.710013, 0.186101),
    ("projects/demos/instruments/fm-synthesizer.json",
     352832, 0.710475, 0.195639),
    ("test-data/perf-1.json", 10368, 1.353878, 0.445604),
]


@pytest.mark.parametrize("rel,n_frames,peak,rms", PINS,
                         ids=[p[0].split("/")[-1] for p in PINS])
def test_render_stats_pinned(rel, n_frames, peak, rms):
    c = compile_song(SongSettings.from_project_file(REF / rel))
    out = np.asarray(Renderer(c).render())
    assert c.n_frames == n_frames
    assert float(np.abs(out).max()) == pytest.approx(peak, rel=0.01)
    assert float(np.sqrt((out**2).mean())) == pytest.approx(rms, rel=0.01)

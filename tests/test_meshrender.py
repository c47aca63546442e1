"""Single-song timeline sharding over the 8-device virtual mesh
(VERDICT r2 item 3): MeshRenderer must reproduce the single-device
render of arbitrary corpus songs, carrying IIR/delay/reverb/follower
state across shard boundaries via ppermute relaxation."""

from pathlib import Path

import jax
import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.stream import StreamingRenderer
from groove_tpu.parallel.meshrender import MeshRenderer
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device virtual mesh")

# fixtures spanning the carried states: reverb tails, the refined 24 dB
# cascade under an automated sweep, pure delay, sidechain scalar
FIXTURES = [
    "projects/demos/effects/drums-reverb.json",
    "projects/demos/effects/drums-filtered-24db.json",
    "projects/demos/effects/delay.json",
    "projects/demos/controllers/sidechain.json",
]


@pytest.mark.parametrize("rel", FIXTURES,
                         ids=[f.split("/")[-1] for f in FIXTURES])
def test_mesh_render_matches_single_device(rel):
    c = compile_song(SongSettings.from_project_file(REF / rel))
    single = StreamingRenderer(c, segment_frames=8192).render()
    mesh = MeshRenderer(c).render()  # auto iterations from effect memory
    assert mesh.shape == single.shape == (c.n_frames, 2)
    peak = max(1.0, float(np.abs(single).max()))
    err = float(np.abs(mesh - single).max())
    assert err < 2e-4 * peak, f"mesh render diverges: {err} vs peak {peak}"


def test_mesh_render_quantized_matches_host():
    """render_quantized (the CLI --wav fetch path) must equal host
    quantization of the float mesh render."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/delay.json"))
    r = MeshRenderer(c)
    f = r.render()
    q = r.render_quantized()
    host = np.clip(np.trunc(f.astype(np.float64) * 32767.0),
                   -32768, 32767).astype(np.int16)
    assert q.dtype == np.int16 and np.array_equal(host, q)


def test_auto_iterations_converged():
    """The auto round count (from effect_memory_seconds) must already be
    converged: two extra rounds change nothing beyond float noise."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-reverb.json"))
    auto = MeshRenderer(c)
    a = auto.render()
    b = MeshRenderer(c, iterations=auto.iterations + 2).render()
    peak = max(1.0, float(np.abs(b).max()))
    assert float(np.abs(a - b).max()) < 1e-5 * peak


def test_mesh_scale_c4_welsh_notes_cross_shards():
    """Welsh notes whose windows cross shard boundaries must render
    identically (instruments are recomputed per overlapping shard)."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/scale-c4-major.json"))
    single = StreamingRenderer(c, segment_frames=8192).render()
    mesh = MeshRenderer(c).render()
    peak = max(1.0, float(np.abs(single).max()))
    assert float(np.abs(mesh - single).max()) < 2e-4 * peak


def test_effect_memory_counts_automation_and_sidechain():
    """The relaxation-iteration bound must see a delay whose TIME comes
    from an automation trip (static param absent -> 0.0) or a sidechain
    link (no host maximum -> the engine clamp), mirroring the streamed
    engine's tail sizing — otherwise a mesh render silently drops echo
    contributions at shard seams."""
    import json

    from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
    from groove_tpu.parallel.meshrender import effect_memory_seconds

    def song(extra_controls=(), trips=False):
        d = {
            "clock": {"bpm": 120},
            "devices": [
                {"instrument": ["i1", {"oscillator": {
                    "waveform": "sine", "frequency": 220.0}}]},
                {"effect": ["fx", {"delay": {"delay": 0.0}}]},
                {"controller": ["sc",
                                {"signal-passthrough-controller": [{}]}]},
            ],
            "patch-cables": [["i1", "fx", "main-mixer"],
                             ["i1", "sc", "main-mixer"]],
            "patterns": [{"id": "p", "notes": [[60]]}],
            "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
        }
        if trips:
            d["paths"] = [{"id": "pa", "note-value": "whole",
                           "steps": [{"slope": {"start": 0.6,
                                                "end": 0.6}}]}]
            d["trips"] = [{"id": "tr",
                           "target": {"id": "fx", "param": "delay"},
                           "paths": ["pa"]}]
        d["controls"] = list(extra_controls)
        return compile_song(SongSettings.from_json5_str(json.dumps(d)))

    assert effect_memory_seconds(song()) == 0.0
    # a 0.6 s delay trip with static delay 0.0 must register
    assert effect_memory_seconds(song(trips=True)) >= 0.6
    # a sidechain link onto the delay time registers the engine clamp
    sc = [{"id": "c", "source": "sc",
           "target": {"id": "fx", "param": "delay"}}]
    assert effect_memory_seconds(song(sc)) >= SIDECHAIN_SECONDS_MAX

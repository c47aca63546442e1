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


def _song_with_reverb(measures: int, seconds: float):
    import json

    d = {
        "clock": {"bpm": 120},
        "devices": [
            {"instrument": ["i1", {"oscillator": {
                "waveform": "sine", "frequency": 220.0}}]},
            {"effect": ["rv", {"reverb": {"attenuation": 0.8,
                                          "seconds": seconds}}]},
        ],
        "patch-cables": [["i1", "rv", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]] }],
        "tracks": [{"id": "t", "midi-channel": 0,
                    "patterns": ["p"] * measures}],
    }
    return compile_song(SongSettings.from_json5_str(json.dumps(d)))


def test_iteration_count_derivation():
    """VERDICT r3 weak #5: the D/(K+1) cost story's K must be pinned.
    A LONG song derives iterations == 1 (one shard exceeds the effect
    memory); a SHORT song with a LONG reverb derives > 1 (each round
    extends exactness one shard of memory back)."""
    long_song = _song_with_reverb(measures=32, seconds=0.2)
    r_long = MeshRenderer(long_song)
    assert r_long.iterations == 1, (r_long.iterations, r_long.S)
    short_song = _song_with_reverb(measures=2, seconds=3.0)
    r_short = MeshRenderer(short_song)
    # memory = 5/3*3s + 0.05 = 5.05 s >> one shard of a 4 s song / 8
    assert r_short.iterations > 1, (r_short.iterations, r_short.S)


def test_exactly_k_plus_1_step_evaluations():
    """The relaxation loop must run exactly iterations+1 renders of the
    local shard — the whole performance claim is wall-clock ~ (K+1)/D;
    pin the mechanics by counting _step_impl invocations in the traced
    build."""
    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-reverb.json"))
    r = MeshRenderer(c)
    calls = {"n": 0}
    orig = r.stream._step_impl

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    r.stream._step_impl = counting
    out = r.render()
    assert out.shape == (c.n_frames, 2)
    # the python relaxation loop traces once; every round calls the step
    assert calls["n"] == r.iterations + 1, (calls["n"], r.iterations)


def test_cross_shard_state_stays_kb_scale():
    """Only the carried state pytree crosses chips per round (ppermute);
    assert it stays KB-scale for representative corpus songs — the claim
    that timeline sharding ships 'tiny state, not audio' over ICI."""
    for rel in FIXTURES:
        c = compile_song(SongSettings.from_project_file(REF / rel))
        r = MeshRenderer(c)
        state = r.stream._state0
        nbytes = sum(np.asarray(v).nbytes
                     for v in jax.tree_util.tree_leaves(state))
        audio_bytes = c.n_frames * 2 * 4
        assert nbytes < 256 * 1024, (rel, nbytes)
        assert nbytes < audio_bytes, (rel, nbytes, audio_bytes)


def test_mesh_width_sweep_output_equality():
    """D in {2, 4, 8}: every mesh width must reproduce the single-device
    streamed render (the sweep VERDICT r3 weak #5 asked to record)."""
    from groove_tpu.parallel.mesh import make_mesh

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-reverb.json"))
    single = StreamingRenderer(c, segment_frames=8192).render()
    peak = max(1.0, float(np.abs(single).max()))
    for d in (2, 4, 8):
        mesh = MeshRenderer(c, mesh=make_mesh(d, axis="time")).render()
        err = float(np.abs(mesh - single).max())
        assert err < 2e-4 * peak, (d, err, peak)

"""Multi-chip sharding on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groove_tpu.models import welsh as welsh_model
from groove_tpu.models.voices import scatter_notes
from groove_tpu.ops import iir
from pathlib import Path

from groove_tpu.compiler.song import compile_song
from groove_tpu.parallel.mesh import make_mesh, sharded_welsh_mix_step
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")
from groove_tpu.project.paths import Paths
from groove_tpu.project.patches import WelshPatchSettings

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _params():
    return WelshPatchSettings.by_name(Paths(), "piano").derive_welsh_voice_params()


def test_sharded_mix_matches_single_device():
    params = _params()
    n_frames, span, sr = 1024, 512, 44100.0
    n_tracks = 8
    rng = np.random.default_rng(0)
    keys = rng.integers(48, 72, (n_tracks, 2)).astype(np.int32)
    vels = np.full((n_tracks, 2), 127.0, np.float32)
    gates = np.full((n_tracks, 2), 256, np.int32)
    ons = np.tile(np.array([[0, 256]], np.int32), (n_tracks, 1))
    gains = np.linspace(0.2, 0.9, n_tracks).astype(np.float32)

    mesh = make_mesh(8, axis="tracks")
    step = sharded_welsh_mix_step(params, n_frames, span, sr, mesh)
    sharded = np.asarray(step(keys, vels, gates, ons, gains))

    # single-device reference: same math, plain loop
    mix = np.zeros((2, n_frames), np.float32)
    for t in range(n_tracks):
        mono = welsh_model.render_notes(
            params, jnp.asarray(keys[t]), jnp.asarray(vels[t]),
            jnp.asarray(gates[t]), span, sr,
        )
        track = scatter_notes(mono, jnp.asarray(ons[t]), n_frames)
        track = iir.biquad(track, iir.rbj_low_pass(8000.0, 0.707, sr))
        mix += np.asarray(jnp.stack([track, track])) * gains[t]

    assert sharded.shape == (2, n_frames)
    assert np.max(np.abs(sharded - mix)) < 1e-4


def test_dryrun_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_timesharded_biquad_matches_serial():
    from groove_tpu.parallel.timeshard import biquad_timesharded

    n = 8 * iir.BIQUAD_BLOCK * 4  # 4 blocks per device on 8 devices
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    cutoff = np.linspace(200.0, 6000.0, n).astype(np.float32)
    coefs = iir.rbj_low_pass(cutoff, 0.707, 44100.0)
    # same fixed block grouping as the sharded path (bit-exact claim)
    y_serial = np.asarray(iir.biquad(jnp.asarray(x), coefs, block=iir.BIQUAD_BLOCK))
    mesh = make_mesh(8, axis="time")
    y_shard = np.asarray(
        biquad_timesharded(jnp.asarray(x), coefs, mesh, axis_name="time")
    )
    err = np.max(np.abs(y_shard - y_serial))
    assert err < 1e-5, err


def test_multidevice_components_weld_sidechain():
    """The sidechain edge must place the observed bus and the compressed
    chain in ONE component (a nonlinear compressor must see its full
    sidechain input on one device)."""
    from groove_tpu.parallel.multidevice import partition_components

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/controllers/sidechain.json"))
    comps = partition_components(c)
    by_dev = {u: i for i, comp in enumerate(comps) for u in comp}
    for src, tgt, _ in c.sidechain:
        assert by_dev[src] == by_dev[tgt]


@pytest.mark.parametrize("rel", [
    "projects/demos/controllers/sidechain.json",
    "test-data/perf-1.json",
    "projects/demos/effects/delay.json",
])
def test_multidevice_render_matches_single(rel):
    """Concurrent per-component rendering across the virtual 8-device mesh
    equals the single-device Renderer up to mix-bus float reassociation."""
    import numpy as np

    from groove_tpu.engine.render import Renderer
    from groove_tpu.parallel.multidevice import (
        MultiDeviceRenderer,
        partition_components,
    )

    c = compile_song(SongSettings.from_project_file(REF / rel))
    comps = partition_components(c)
    assert len(comps) >= 2  # these fixtures genuinely fan out
    # every AUDIO-PATH device is covered (controllers like arps/LFOs/trips
    # act at compile time and never render)
    audio_devs = [u for u in c.order if u != "main-mixer"]
    assert sorted(u for comp in comps for u in comp) == sorted(audio_devs)
    single = np.asarray(Renderer(c).render())
    multi = MultiDeviceRenderer(c).render()
    assert single.shape == multi.shape
    peak = max(1.0, float(np.abs(single).max()))
    assert float(np.abs(single - multi).max()) <= 1e-6 * peak


def test_multidevice_render_quantized_matches_host():
    """render_quantized (the CLI --wav fetch path) must equal host
    quantization of the float multi-device render."""
    from groove_tpu.parallel.multidevice import MultiDeviceRenderer

    c = compile_song(SongSettings.from_project_file(
        REF / "projects/demos/controllers/sidechain.json"))
    r = MultiDeviceRenderer(c)
    f = r.render()
    q = r.render_quantized()
    host = np.clip(np.trunc(f.astype(np.float64) * 32767.0),
                   -32768, 32767).astype(np.int16)
    assert q.dtype == np.int16 and np.array_equal(host, q)


def test_cli_multidevice_render(tmp_path):
    """--multidevice renders through the component partitioner and writes
    the same WAV (1 LSB) as the single-device path."""
    import shutil

    from groove_tpu.cli import main as cli_main
    from groove_tpu.io.wav import read_wav

    src = REF / "test-data/perf-1.json"
    proj = tmp_path / "perf-1.json"
    shutil.copy(src, proj)
    a_dir = tmp_path / "single"
    b_dir = tmp_path / "multi"
    a_dir.mkdir()
    b_dir.mkdir()
    assert cli_main([str(proj), "--wav", "--quiet",
                     "--out-dir", str(a_dir)]) == 0
    assert cli_main([str(proj), "--wav", "--quiet", "--multidevice",
                     "--out-dir", str(b_dir)]) == 0
    wa, _ = read_wav(a_dir / "perf-1.wav")
    wb, _ = read_wav(b_dir / "perf-1.wav")
    assert wa.shape == wb.shape
    assert float(np.abs(wa - wb).max()) <= (1.0 / 32768) + 1e-9

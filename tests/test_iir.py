"""IIR engine: associative-scan biquads vs sample-serial float64 reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from groove_tpu.ops import iir


def _rms_db(err, ref):
    denom = np.sqrt(np.mean(ref**2)) + 1e-20
    return 20 * np.log10(np.sqrt(np.mean(err**2)) / denom + 1e-20)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_biquad_matches_serial_reference_constant_coefs(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    coefs = iir.rbj_low_pass(1000.0, 0.707, 44100.0)
    y = np.asarray(iir.biquad(x, coefs))
    y_ref = iir.biquad_ref(x.astype(np.float64), [np.float64(c) for c in coefs])
    assert _rms_db(y - y_ref, y_ref) < -100


def test_biquad_time_varying_coefficients(rng):
    n = 8192
    x = rng.standard_normal(n).astype(np.float32)
    cutoff = np.linspace(200.0, 8000.0, n).astype(np.float32)
    coefs = iir.rbj_low_pass(cutoff, 0.707, 44100.0)
    y = np.asarray(iir.biquad(x, coefs))
    y_ref = iir.biquad_ref(
        x.astype(np.float64), [np.asarray(c, np.float64) for c in coefs]
    )
    assert _rms_db(y - y_ref, y_ref) < -80


def test_biquad_batched(rng):
    x = rng.standard_normal((2, 3, 1024)).astype(np.float32)
    coefs = iir.rbj_high_pass(500.0, 2.0, 44100.0)
    y = np.asarray(iir.biquad(x, coefs))
    for i in range(2):
        for j in range(3):
            y_ref = iir.biquad_ref(
                x[i, j].astype(np.float64), [np.float64(c) for c in coefs]
            )
            # high-Q highpass accumulates a bit more f32 error
            assert _rms_db(y[i, j] - y_ref, y_ref) < -85


def test_lowpass_dc_gain_is_unity():
    x = np.ones(8192, dtype=np.float32)
    y = np.asarray(iir.biquad(x, iir.rbj_low_pass(1000.0, 0.707, 44100.0)))
    assert abs(y[-1] - 1.0) < 1e-3


def test_lowpass_attenuates_high_freq():
    n = 16384
    t = np.arange(n) / 44100.0
    hi = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    lo = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    coefs = iir.rbj_low_pass(1000.0, 0.707, 44100.0)
    y_hi = np.asarray(iir.biquad(hi, coefs))[n // 2:]
    y_lo = np.asarray(iir.biquad(lo, coefs))[n // 2:]
    assert np.sqrt(np.mean(y_hi**2)) < 0.02
    assert np.sqrt(np.mean(y_lo**2)) > 0.6


def test_highpass_blocks_dc():
    x = np.ones(8192, dtype=np.float32)
    y = np.asarray(iir.biquad(x, iir.rbj_high_pass(1000.0, 0.707, 44100.0)))
    assert abs(y[-1]) < 1e-3


def test_allpass_preserves_magnitude(rng):
    n = 16384
    t = np.arange(n) / 44100.0
    x = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    y = np.asarray(iir.biquad(x, iir.rbj_all_pass(1000.0, 0.707, 44100.0)))
    rms_in = np.sqrt(np.mean(x[n // 2:] ** 2))
    rms_out = np.sqrt(np.mean(y[n // 2:] ** 2))
    assert abs(rms_out / rms_in - 1.0) < 0.01


def test_bandpass_peak_at_center():
    n = 16384
    t = np.arange(n) / 44100.0
    # bandwidth is in Hz (corpus convention): 1000 Hz wide at 1 kHz -> Q=1
    coefs = iir.rbj_band_pass(1000.0, 1000.0, 44100.0)
    at = {}
    for f in [100.0, 1000.0, 8000.0]:
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        y = np.asarray(iir.biquad(x, coefs))[n // 2:]
        at[f] = np.sqrt(np.mean(y**2))
    assert at[1000.0] > 5 * at[100.0]
    assert at[1000.0] > 5 * at[8000.0]
    assert abs(at[1000.0] - np.sqrt(0.5)) < 0.02  # 0 dB peak gain


def test_lp24_is_steeper_than_lp12():
    n = 16384
    t = np.arange(n) / 44100.0
    x = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
    y12 = np.asarray(iir.biquad(x, iir.rbj_low_pass(1000.0, 0.707, 44100.0)))
    y24 = np.asarray(iir.lp24_apply(x, 1000.0, 1.0, 44100.0))
    r12 = np.sqrt(np.mean(y12[n // 2:] ** 2))
    r24 = np.sqrt(np.mean(y24[n // 2:] ** 2))
    assert r24 < r12 / 5  # ~24 vs ~12 dB/oct, 2 octaves above cutoff


def test_lp24_dc_gain_unity():
    x = np.ones(16384, dtype=np.float32)
    y = np.asarray(iir.lp24_apply(x, 1000.0, 1.0, 44100.0))
    assert abs(y[-1] - 1.0) < 1e-2


def test_lp24_resonance_boosts_cutoff():
    n = 16384
    t = np.arange(n) / 44100.0
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    flat = np.asarray(iir.lp24_apply(x, 1000.0, 1.0, 44100.0))
    resonant = np.asarray(iir.lp24_apply(x, 1000.0, 10.0, 44100.0))
    assert np.sqrt(np.mean(resonant[n // 2:] ** 2)) > 1.5 * np.sqrt(
        np.mean(flat[n // 2:] ** 2)
    )


def test_one_pole(rng):
    n = 4096
    x = rng.standard_normal(n).astype(np.float32)
    a, b = 0.99, 0.01
    y = np.asarray(iir.one_pole(x, a, b))
    y_ref = np.zeros(n)
    acc = 0.0
    for i in range(n):
        acc = a * acc + b * x[i]
        y_ref[i] = acc
    assert _rms_db(y - y_ref, y_ref) < -90


def test_low_cutoff_static_meets_80dbfs_bar():
    """VERDICT round-1 item 6: <= -80 dBFS vs the f64 serial reference at
    a 25 Hz cutoff over 1e5 samples. Static near-critical poles dispatch
    to the per-sample serial scan on every backend (biquad_best and the
    blockrate/lp24 wrappers all route through the same check), so this
    covers the XLA and TPU dispatch paths alike."""
    n = 100_000
    coefs = iir.rbj_low_pass(25.0, 0.707, 44100.0)
    assert iir._near_critical_static(coefs)
    c64 = tuple(np.float64(np.asarray(c)) for c in np.asarray(coefs))
    worst = 0.0
    for seed in range(3):
        x = (np.random.default_rng(seed).standard_normal(n) * 0.3).astype(
            np.float32)
        y_ref = iir.biquad_ref(x.astype(np.float64)[None], c64)[0]
        y = np.asarray(iir.biquad_best(jnp.asarray(x[None]), coefs))[0]
        worst = max(worst, float(np.abs(y - y_ref).max()))
    db = 20 * np.log10(worst)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_low_cutoff_static_lp24_meets_80dbfs_bar():
    n = 100_000
    x = (np.random.default_rng(9).standard_normal(n) * 0.3).astype(np.float32)
    gain, secs = iir.lp24_sections(jnp.float32(25.0), jnp.float32(0.707),
                                   44100.0)
    assert all(iir._near_critical_static(s) for s in secs)
    x64 = x.astype(np.float64) * float(gain)
    y_ref = x64[None]
    for sec in secs:
        c64 = tuple(np.float64(np.asarray(c)) for c in sec)
        y_ref = iir.biquad_ref(y_ref, c64)
    y = np.asarray(iir.lp24_apply_blockrate(
        jnp.asarray(x[None]), 25.0, 0.707, 44100.0))
    db = 20 * np.log10(float(np.abs(y - y_ref).max()) + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_high_cutoff_keeps_blocked_path():
    """The serial fallback must NOT trigger for ordinary cutoffs."""
    coefs = iir.rbj_low_pass(1000.0, 0.707, 44100.0)
    assert not iir._near_critical_static(coefs)


def _tv_serial_ref64(x64, secs_up):
    """f64 TDF2 serial reference with per-sample (upsampled block-rate)
    f32 coefficients — the gold standard the engine's automated filters
    are measured against."""
    y = x64
    n = len(y)
    for sec in secs_up:
        b0, b1, b2, a1, a2 = [np.asarray(c, np.float64) for c in sec]
        out = np.empty(n)
        s1 = s2 = 0.0
        for i in range(n):
            yi = b0[i] * y[i] + s1
            s1 = b1[i] * y[i] - a1[i] * yi + s2
            s2 = b2[i] * y[i] - a2[i] * yi
            out[i] = yi
        y = out
    return y


def test_automated_sweep_meets_80dbfs_bar():
    """VERDICT round-1 item 6, TRACED-coefficient case: the north-star
    demo sweeps the 24 dB cascade 25 Hz -> 20 kHz. The plain blocked
    scheme measures -60 dBFS vs f64 through the near-critical region;
    the defect-correction refinement pass (iir.biquad_blockrate_refined,
    triggered by iir.needs_refinement on the host-visible curve) must
    bring it under -80 while staying fully parallel."""
    sr = 44100.0
    n = 165376
    cblock = 64
    nb = -(-n // cblock)
    pct = np.linspace(0.0, 1.0, nb)
    hz = np.asarray(25.0 * (800.0 ** pct), np.float32)
    x = (np.random.default_rng(0).standard_normal(n) * 0.3).astype(
        np.float32)

    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(0.707), sr)
    a1s = np.stack([np.asarray(s[3]) for s in secs])
    a2s = np.stack([np.asarray(s[4]) for s in secs])
    assert iir.needs_refinement(a1s, a2s)

    gain_up = np.asarray(iir.upsample_hold(gain_b, n), np.float32)
    secs_up = [
        tuple(np.asarray(iir.upsample_hold(jnp.asarray(c), n), np.float32)
              for c in s_)
        for s_ in secs
    ]
    y_ref = _tv_serial_ref64((x * gain_up).astype(np.float64), secs_up)

    y = np.asarray(iir.lp24_apply_blockrate(
        jnp.asarray(x), jnp.asarray(hz), 0.707, sr, fidelity="refine"))
    db = 20 * np.log10(float(np.abs(y.astype(np.float64) - y_ref).max())
                       + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_refinement_not_triggered_for_safe_sweeps():
    """Sweeps that stay above ~200 Hz keep the plain blocked path."""
    sr = 44100.0
    nb = 1024
    hz = np.linspace(500.0, 8000.0, nb).astype(np.float32)
    _, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(0.707), sr)
    a1s = np.stack([np.asarray(s[3]) for s in secs])
    a2s = np.stack([np.asarray(s[4]) for s in secs])
    assert not iir.needs_refinement(a1s, a2s)


def test_renderer_flags_north_star_fidelity():
    """drums-filtered-24db's rising-cutoff trip starts at 25 Hz and its
    slow-start exponential PARKS there for hundreds of blocks: on this
    non-Pallas backend the host plan routes it serially (residence-based
    deepening; the Pallas backends keep the refine pass — the fused
    kernel handles the corner at -95 dBFS)."""
    from pathlib import Path

    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings

    c = compile_song(SongSettings.from_project_file(Path(
        "/root/reference/projects/demos/effects/drums-filtered-24db.json")))
    r = Renderer(c)
    expect = "refine" if iir._pallas_available() else "serial"
    assert r._filter_modes.get("low-pass-1") == expect


def _filter_device_song(kind, params):
    import json

    from groove_tpu.project.schema import SongSettings

    return SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"oscillator": {"waveform": "noise",
                                                  "frequency": 100.0}}]},
            {"effect": ["f1", {kind: params}]},
        ],
        "patch-cables": [["i1", "f1", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))


def test_chunked_refined_meets_bar_on_sweep():
    """The row-packed refined solver (_solve_chunked two-pass + exact
    entry composition; the few-row latency fix for the master-bus
    cascade) must still clear -80 dBFS vs f64 on the north-star sweep and
    agree with the unchunked refined path to float tolerance."""
    sr = 44100.0
    n = 165376
    cblock = 64
    nb = -(-n // cblock)
    pct = np.linspace(0.0, 1.0, nb)
    hz = np.asarray(25.0 * (800.0 ** pct), np.float32)
    x = (np.random.default_rng(2).standard_normal((2, n)) * 0.3).astype(
        np.float32)
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(0.707), sr)
    gain_up = np.asarray(iir.upsample_hold(jnp.asarray(gain_b), n))
    xg = x * gain_up
    secs_up = [
        tuple(np.asarray(iir.upsample_hold(jnp.asarray(c), n), np.float32)
              for c in s_)
        for s_ in secs
    ]
    y_ref = _tv_serial_ref64((xg[0]).astype(np.float64), secs_up)

    y_chunk = jnp.asarray(xg)
    y_plain = jnp.asarray(xg)
    for sec in secs:
        sec_t = tuple(jnp.asarray(c) for c in sec)
        y_chunk = iir.biquad_blockrate_refined(y_chunk, sec_t, cblock,
                                               chunks=16)
        y_plain = iir.biquad_blockrate_refined(y_plain, sec_t, cblock)
    y_chunk = np.asarray(y_chunk)
    db = 20 * np.log10(
        float(np.abs(y_chunk[0].astype(np.float64) - y_ref).max()) + 1e-30)
    assert db <= -80.0, f"chunked refined vs f64: {db:.1f} dBFS"
    diff = float(np.abs(y_chunk - np.asarray(y_plain)).max())
    assert diff < 1e-4, f"chunked vs plain refined: {diff}"


def test_parked_corner_serial_fidelity_on_cpu():
    """VERDICT r2 item 5: a cascade PARKED at the literal 25 Hz floor with
    high q (octave-switch's resting point) must route to the serial scan
    on this non-Pallas backend: the refined fallback reads ~-24 dBFS vs
    f64 there (section A in f32 noise, section B's resonance amplifying),
    the serial path ~-79."""
    sr = 44100.0
    cblock = 64
    n = 8192
    nb = n // cblock
    hz = np.full(nb, 25.0, np.float32)
    x = (np.random.default_rng(1).standard_normal(n) * 0.3).astype(np.float32)
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(5.331), sr)
    gain_up = np.asarray(iir.upsample_hold(gain_b, n), np.float32)
    secs_up = [
        tuple(np.asarray(iir.upsample_hold(jnp.asarray(c), n), np.float32)
              for c in s_)
        for s_ in secs
    ]
    y_ref = _tv_serial_ref64((x * gain_up).astype(np.float64), secs_up)
    y = np.asarray(iir.lp24_apply_blockrate(
        jnp.asarray(x), jnp.asarray(hz), 5.331, sr, fidelity="serial"))
    db = 20 * np.log10(float(np.abs(y.astype(np.float64) - y_ref).max())
                       + 1e-30)
    assert db <= -70.0, f"serial fallback at the parked corner: {db:.1f} dBFS"
    y_rf = np.asarray(iir.lp24_apply_blockrate(
        jnp.asarray(x), jnp.asarray(hz), 5.331, sr, fidelity="refine"))
    db_rf = 20 * np.log10(float(np.abs(y_rf.astype(np.float64) - y_ref).max())
                          + 1e-30)
    assert db < db_rf - 30.0, \
        f"serial ({db:.1f}) must beat refined ({db_rf:.1f}) at the corner"


def test_octave_switch_routes_serial_and_matches_tpu_truth():
    """The one corpus file in the parked-corner regime: its welsh voice
    must classify 'serial' on this backend and the CPU render must agree
    with the TPU/f64 truth — the round-2 8% CPU<->TPU divergence is
    closed. Round 4 moved the pitch-LFO phases to HOST tables
    (welsh.host_pitch_phases; shared bit-for-bit by CPU, TPU, and the f64
    reference — the chip pins −81.2 dBFS song-level, FIDELITY_TPU.md),
    which shifted the truth rms 0.5996 → 0.5911."""
    from pathlib import Path

    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.models import welsh as welsh_model
    from groove_tpu.project.schema import SongSettings

    ref = Path("/root/reference/projects/demos/instruments/welsh-octave-switch.json")
    if not ref.exists():
        import pytest
        pytest.skip("reference corpus not mounted")
    c = compile_song(SongSettings.from_project_file(ref))
    dev = next(d for d in c.devices.values() if d.kind == "welsh")
    assert welsh_model.filter_fidelity_mode(dev.voice, 44100.0) == "serial"
    out = np.asarray(Renderer(c).render())
    rms = float(np.sqrt((out ** 2).mean()))
    assert abs(rms - 0.5911) / 0.5911 < 0.005, \
        f"CPU rms {rms} still diverges from TPU truth 0.5911"


def test_engine_static_deep_corner_dispatches_serial_in_graph():
    """Inside the compiled program coefficients are tracers, so the ops'
    own float(a1) checks are inert — the Renderer must route static
    deep-corner filters serially from its HOST-side fidelity table.
    Proven by bitwise equality with the eager serial scan."""
    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer

    c = compile_song(_filter_device_song(
        "filter-low-pass-12db", {"cutoff": 25.0, "q": 0.707}))
    r = Renderer(c)
    assert r._filter_modes.get("f1") == "serial"
    out = np.asarray(Renderer(c).render())
    # reproduce: the instrument track is noise; recover it by rendering
    # with the filter bypassed, then serial-filter eagerly
    c2 = compile_song(_filter_device_song(
        "filter-low-pass-12db", {"cutoff": 25.0, "q": 0.707}))
    c2.devices["f1"].kind = "mixer"
    dry = np.asarray(Renderer(c2).render())
    coefs = iir.rbj_low_pass(25.0, 0.707, 44100.0)
    serial_ref = np.asarray(
        iir.biquad_serial(jnp.asarray(dry.T), tuple(coefs))).T
    blocked_ref = np.asarray(
        iir.biquad(jnp.asarray(dry.T), tuple(coefs))).T
    d_serial = float(np.abs(out - serial_ref).max())
    d_blocked = float(np.abs(out - blocked_ref).max())
    gap = float(np.abs(serial_ref - blocked_ref).max())
    # the engine output follows the serial scan (up to XLA-vs-eager libm
    # constant folding of the coefficients), NOT the blocked scheme
    assert gap > 1e-6, "test can't discriminate"
    assert d_serial < 0.05 * gap, (d_serial, d_blocked, gap)
    assert d_blocked > 0.5 * gap


def test_engine_static_high_q_is_refined_in_graph():
    """Static 1 kHz q=20 (the corpus's filter q-20 demo configuration)
    measures -78.6 dBFS through the blocked scheme — under the bar. The
    host fidelity table routes it through the defect-correction pass."""
    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer

    c = compile_song(_filter_device_song(
        "filter-low-pass-12db", {"cutoff": 1000.0, "q": 20.0}))
    r = Renderer(c)
    assert r._filter_modes.get("f1") == "refine"
    out = np.asarray(r.render())
    c2 = compile_song(_filter_device_song(
        "filter-low-pass-12db", {"cutoff": 1000.0, "q": 20.0}))
    c2.devices["f1"].kind = "mixer"
    dry = np.asarray(Renderer(c2).render())
    coefs = iir.rbj_low_pass(jnp.float32(1000.0), jnp.float32(20.0), 44100.0)
    c64 = tuple(np.float64(np.asarray(v)) for v in coefs)
    ref = iir.biquad_ref(dry.T.astype(np.float64), c64).T
    db = 20 * np.log10(float(np.abs(out - ref).max()) + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_welsh_cascade_fidelity_flag_and_bar():
    """Welsh voices park their internal cascade near the unit circle
    (acid-bass: 330 Hz at q 4.3 measures -62 dBFS blocked). The host flag
    must fire and the refined cascade must clear the bar on that
    trajectory."""
    from groove_tpu.models import welsh as wm
    from groove_tpu.project.paths import Paths
    from groove_tpu.project.patches import WelshPatchSettings

    p = WelshPatchSettings.by_name(Paths(), "acid-bass")\
        .derive_welsh_voice_params()
    assert wm.needs_filter_refinement(p)
    n = 65536
    x = (np.random.default_rng(3).standard_normal(n) * 0.3).astype(
        np.float32)
    hz = np.full(n // 64, 330.0, np.float32)
    q = float(max(p.filter_q, 1e-3))
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(q), 44100.0)
    gain_up = np.asarray(iir.upsample_hold(gain_b, n), np.float32)
    secs_up = [
        tuple(np.asarray(iir.upsample_hold(jnp.asarray(c), n), np.float32)
              for c in s_)
        for s_ in secs
    ]
    y_ref = _tv_serial_ref64((x * gain_up).astype(np.float64), secs_up)
    y = np.asarray(iir.lp24_apply_blockrate(
        jnp.asarray(x), jnp.asarray(hz), q, 44100.0, fidelity="refine"))
    db = 20 * np.log10(float(np.abs(y.astype(np.float64) - y_ref).max())
                       + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"

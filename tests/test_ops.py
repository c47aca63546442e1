"""Pointwise/delay/dynamics op tests (reference contracts in SURVEY §2.2)."""

import numpy as np
import pytest

from groove_tpu.ops import dca, delayfx, dynamics, effects, envelope, oscillator


def test_gain_exact():
    # gather_audio_basic: 0.1 source through 0.5 gain (orchestrator.rs:1518)
    assert float(effects.gain(np.float32(0.1), 0.5)) == pytest.approx(0.05)


def test_limiter_clamps_and_boosts():
    x = np.array([0.0, 0.05, 0.5, 0.95, -0.95, -0.05], np.float32)
    y = np.asarray(effects.limiter(x, 0.1, 0.9))
    # exact zero keeps its (zero) sign; small magnitudes are boosted to min
    assert np.allclose(y, [0.0, 0.1, 0.5, 0.9, -0.9, -0.1], atol=1e-6)


def test_bitcrusher_quantizes():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    y8 = np.asarray(effects.bitcrusher(x, 8))
    # 8 crushed bits -> step = 256/32767
    steps = np.unique(np.round(np.abs(y8) * 32767.0 / 256.0))
    assert np.allclose(steps, np.round(steps))
    y0 = np.asarray(effects.bitcrusher(x, 0))
    assert np.max(np.abs(y0 - np.trunc(np.abs(x) * 32767) / 32767 * np.sign(x))) < 1e-6
    # more crushed bits -> fewer levels
    assert len(np.unique(y8)) < len(np.unique(np.asarray(effects.bitcrusher(x, 4))))


def test_delay_is_pure_shift():
    x = np.arange(10, dtype=np.float32)
    y = np.asarray(delayfx.delay_signal(x, 3))
    assert np.allclose(y, [0, 0, 0, 0, 1, 2, 3, 4, 5, 6])


def test_comb_feedback_matches_serial():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500).astype(np.float32)
    d, g = 37, 0.8
    y = np.asarray(delayfx.comb_feedback(x, d, g))
    y_ref = np.zeros(500)
    for n in range(500):
        y_ref[n] = (x[n - d] if n >= d else 0.0) + g * (y_ref[n - d] if n >= d else 0.0)
    assert np.max(np.abs(y - y_ref)) < 1e-4


def test_allpass_matches_serial_and_preserves_energy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2000).astype(np.float32)
    d, g = 53, 0.7
    y = np.asarray(delayfx.allpass(x, d, g))
    # serial: w[n] = x[n] + g w[n-D]; y[n] = -g x[n] + (1-g^2) w[n-D]
    w = np.zeros(2000)
    y_ref = np.zeros(2000)
    for n in range(2000):
        wd = w[n - d] if n >= d else 0.0
        w[n] = x[n] + g * wd
        y_ref[n] = -g * x[n] + (1 - g * g) * wd
    assert np.max(np.abs(y - y_ref)) < 1e-4
    # allpass: magnitude response is unity -> energies comparable
    assert abs(np.sum(y**2) / np.sum(x**2) - 1.0) < 0.1


def test_reverb_tail_decays_with_rt60():
    sr = 22050.0
    x = np.zeros(int(sr), np.float32)
    x[0] = 1.0
    y = np.asarray(delayfx.reverb(x, attenuation=1.0, seconds=0.3, sample_rate=sr))
    early = np.sqrt(np.mean(y[: int(0.1 * sr)] ** 2))
    late = np.sqrt(np.mean(y[int(0.6 * sr):] ** 2))
    assert early > 0
    assert late < early / 30  # well past RT60


def test_compressor_instantaneous():
    x = np.array([0.1, 0.5, -0.5, 1.0], np.float32)
    y = np.asarray(dynamics.compressor(x, threshold=0.2, ratio=0.5))
    assert np.allclose(y, [0.1, 0.2 + 0.3 * 0.5, -(0.2 + 0.3 * 0.5), 0.2 + 0.8 * 0.5])


def test_compressor_smoothed_reduces_to_instant_at_zero_times():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(256).astype(np.float32)
    a = np.asarray(dynamics.compressor(x, 0.3, 0.2))
    b = np.asarray(dynamics.compressor_smoothed(x, 0.3, 0.2, 0.0, 0.0, 44100.0))
    assert np.max(np.abs(a - b)) < 1e-6


def test_dca_pan_law():
    l0, r0 = dca.pan_gains(0.0)
    assert float(l0) == pytest.approx(0.75)
    assert float(r0) == pytest.approx(0.75)
    ll, rl = dca.pan_gains(-1.0)
    assert float(ll) == pytest.approx(1.0)
    assert float(rl) == pytest.approx(0.0)
    st = np.asarray(dca.dca(np.ones(4, np.float32), 0.5, 1.0))
    assert st.shape == (2, 4)
    assert st[0, 0] == pytest.approx(0.0)


def test_oscillator_waveforms():
    ph = np.linspace(0, 2, 400, endpoint=False).astype(np.float32)
    saw = np.asarray(oscillator.evaluate("sawtooth", ph))
    assert saw.min() >= -1 and saw.max() <= 1
    assert saw[0] == pytest.approx(-1.0)
    sq = np.asarray(oscillator.evaluate("square", ph))
    assert set(np.unique(sq)) == {-1.0, 1.0}
    assert np.mean(sq) == pytest.approx(0.0, abs=1e-6)
    pw = np.asarray(oscillator.evaluate("pulse-width", ph, width=0.1))
    assert np.mean(pw > 0) == pytest.approx(0.1, abs=0.01)
    tri = np.asarray(oscillator.evaluate("triangle", ph))
    assert tri.max() == pytest.approx(1.0, abs=0.02)
    assert tri.min() == pytest.approx(-1.0, abs=0.02)
    assert np.asarray(oscillator.evaluate("none", ph)).max() == 0.0


def test_oscillator_phase_and_sync():
    sr = 44100.0
    ph = np.asarray(oscillator.phase_from_const_freq(np.float32(440.0), 1000, sr))
    assert ph.shape == (1, 1000) or ph.shape == (1000,)
    ph = ph.reshape(-1)
    assert ph[0] == 0.0
    assert ph[1] == pytest.approx(440.0 / sr)
    # cumsum path agrees with const path
    ph2 = np.asarray(
        oscillator.phase_from_freq(np.full(1000, 440.0, np.float32), sr)
    )
    assert np.max(np.abs(ph - ph2)) < 1e-3
    # hard sync: slave phase resets at master wraps
    sync = np.asarray(oscillator.hard_sync_phase(ph, 1.5))
    wraps = np.where(np.diff(np.floor(ph)) > 0)[0]
    assert len(wraps) > 5
    # one sample after a master wrap, slave phase <= ratio * f/sr (+wrap lag)
    assert np.all(sync[wraps + 1] < 2 * 1.5 * 440.0 / sr)


def test_adsr_envelope_shape():
    sr = 1000.0
    t = (np.arange(3000) / sr).astype(np.float32)
    env = np.asarray(
        envelope.adsr(t, t_off=1.5, attack=0.1, decay=0.2, sustain=0.5, release=0.3)
    )
    assert env[0] == pytest.approx(0.0, abs=1e-3)
    assert env[100] == pytest.approx(1.0, abs=0.02)         # end of attack
    assert env[300] == pytest.approx(0.5, abs=0.02)         # end of decay
    assert env[1400] == pytest.approx(0.5, abs=1e-3)        # sustain
    assert env[1650] == pytest.approx(0.25, abs=0.02)       # mid-release
    assert env[1900] == 0.0                                  # released
    # note-off during attack releases from partial value
    env2 = np.asarray(
        envelope.adsr(t, t_off=0.05, attack=0.1, decay=0.2, sustain=0.5, release=0.3)
    )
    assert env2[49] == pytest.approx(0.49, abs=0.02)
    assert env2[51] < 0.5
    assert env2[400] == 0.0


def test_follower_release_holds_short_transients():
    """Decoupled peak detector (round-3 review finding): a 10 ms burst
    through a 500 ms release must ring out from ~the PEAK, not collapse
    instantly (the old two-one-pole+select form released from a slow
    low-pass's value, ~0.02, making the release knob dead for short
    material)."""
    sr = 44100
    n = int(0.6 * sr)
    x = np.zeros(n, np.float32)
    x[: int(0.010 * sr)] = 1.0
    env = np.asarray(dynamics.envelope_follower(x, 0.001, 0.5, float(sr)))
    burst_end = int(0.010 * sr)
    assert env[burst_end - 1] > 0.9, "attack did not track the burst"
    # 100 ms after the burst: exp(-0.1/0.5) = 0.82 of the held peak
    at_100ms = env[burst_end + int(0.100 * sr)]
    assert 0.6 < at_100ms < 0.95, \
        f"release tail {at_100ms} — expected ~0.82 of the held peak"
    # the tail decays monotonically (no regime-switch steps)
    tail = env[burst_end + 64:burst_end + int(0.4 * sr)]
    assert np.all(np.diff(tail) <= 1e-7)


def test_follower_stream_matches_whole(tmp_path=None):
    """The streamed follower (fixed 64-grid) chains bitwise and matches
    the whole-window follower to float tolerance."""
    from groove_tpu.ops import stream as sops

    sr = 44100.0
    rng = np.random.default_rng(7)
    x = (rng.uniform(-1, 1, 8192).astype(np.float32)
         * np.linspace(1, 0, 8192, dtype=np.float32))
    whole = np.asarray(dynamics.envelope_follower(x, 0.01, 0.2, sr))
    env1, e1, p1 = sops.follower_stream(x, 0.01, 0.2, sr, 0.0, 0.0)
    parts, e, p = [], 0.0, 0.0
    for i in range(0, 8192, 1024):
        seg, e, p = sops.follower_stream(x[i:i + 1024], 0.01, 0.2, sr, e, p)
        parts.append(np.asarray(seg))
    chained = np.concatenate(parts)
    assert np.array_equal(np.asarray(env1), chained), \
        "streamed follower not segmentation-invariant"
    assert float(np.abs(whole - chained).max()) < 1e-4 * whole.max()

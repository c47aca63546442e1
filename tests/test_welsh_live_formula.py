"""Live-path voice formula fidelity (round-3 review findings): live noise
must not repeat per block, the S&H (noise) LFO must run live like it does
offline, and LFO-boosted resonance must count toward the fidelity flags."""

import jax.numpy as jnp
import numpy as np
import pytest

from groove_tpu.models import welsh
from groove_tpu.project.patches import (EnvelopeSeconds, LfoPreset,
                                        OscSettings, Waveform,
                                        WelshVoiceParams)

SR = 44100.0


def _params(osc1="sawtooth", noise=0.0, lfo=None, q=1.0,
            cutoff_start=0.5, cutoff_end=0.5):
    osc = lambda k: OscSettings(Waveform(k), 1.0, None, 0.5)  # noqa: E731
    return WelshVoiceParams(
        oscillator_1=osc(osc1),
        oscillator_2=osc("none"),
        oscillator_2_sync=False,
        oscillator_2_fixed_hz=None,
        noise=noise,
        oscillator_mix=1.0,
        amp_envelope=EnvelopeSeconds(0.0, 0.0, 1.0, 0.1),
        lfo=lfo or LfoPreset(),
        filter_cutoff_hz=8000.0,
        filter_q=q,
        filter_cutoff_start=cutoff_start,
        filter_cutoff_end=cutoff_end,
        filter_envelope=EnvelopeSeconds(0.0, 0.0, 1.0, 0.1),
        polyphony="multi",
    )


def _window_blocks(params, n_blocks, n=64):
    """Play one held note through live_window_block for n_blocks."""
    fstate = welsh.live_window_state_init(1)
    keys = jnp.array([60.0]); vels = jnp.array([100.0])
    on = jnp.array([0], jnp.int32); off = jnp.array([1 << 29], jnp.int32)
    out = []
    for b in range(n_blocks):
        mono, fstate = welsh.live_window_block(
            params, fstate, keys, vels, on, off, b * n, n, SR)
        out.append(np.asarray(mono))
    return out


def test_live_noise_osc_does_not_repeat_per_block():
    """A constant PRNG key per block turned the noise oscillator into a
    64-sample-periodic ~689 Hz buzz; blocks must draw fresh noise."""
    blocks = _window_blocks(_params(osc1="noise"), 3)
    assert np.abs(blocks[0]).max() > 1e-3
    assert not np.array_equal(blocks[1], blocks[2]), \
        "live noise repeats the same 64-sample pattern every block"


def test_live_mix_noise_does_not_repeat_per_block():
    blocks = _window_blocks(_params(noise=0.8), 3)
    assert not np.array_equal(blocks[1], blocks[2]), \
        "live noise mix-in repeats per block"


def test_live_render_block_noise_fresh_per_block():
    """Same for the fixed-pool path (live_render_block via its t0 arg)."""
    params = _params(osc1="noise")
    state = welsh.live_init_state(2)
    state = welsh.LiveVoiceState(
        phase1=state.phase1, phase2=state.phase2,
        s1a=state.s1a, s2a=state.s2a, s1b=state.s1b, s2b=state.s2b,
        age=state.age, release_age=state.release_age,
        keys=state.keys.at[0].set(60.0), vels=state.vels.at[0].set(100.0),
        prev_keys=state.prev_keys.at[0].set(60.0))
    m1, state = welsh.live_render_block(params, state, 64, SR, t0=0)
    m2, state = welsh.live_render_block(params, state, 64, SR, t0=64)
    assert np.abs(np.asarray(m1)).max() > 1e-3
    assert not np.array_equal(np.asarray(m1), np.asarray(m2)), \
        "live_render_block noise repeats per block"


def test_live_sh_noise_lfo_modulates_filter():
    """The live paths used to silently DISABLE a noise-waveform (S&H) LFO;
    a cutoff-routed S&H LFO must now wobble the live filter exactly as the
    offline render does."""
    lfo = LfoPreset(routing="filter-cutoff", waveform=Waveform("noise"),
                    frequency=40.0, depth=0.9)
    moving = np.concatenate(_window_blocks(
        _params(lfo=lfo, cutoff_start=0.3, cutoff_end=0.3), 12))
    static = np.concatenate(_window_blocks(
        _params(cutoff_start=0.3, cutoff_end=0.3), 12))
    assert np.abs(moving).max() > 1e-3
    assert not np.allclose(moving, static, atol=1e-7), \
        "S&H noise LFO is still disabled in the live path"


def test_resonance_lfo_counts_toward_fidelity_flags():
    """needs_filter_refinement must test q*(1+depth) when the LFO routes to
    'resonance': the runtime boosts q mid-cycle, parking poles past the
    thresholds a static-q check misses."""
    # a parked ~988 Hz cutoff: q=2 sits just under the refine bar
    # (a2 0.948 < 0.95) while q*(1+1.0) = 4 crosses it (a2 0.974)
    base = _params(q=2.0, cutoff_start=0.55, cutoff_end=0.55)
    assert not welsh.needs_filter_refinement(base, SR)
    res = _params(q=2.0, cutoff_start=0.55, cutoff_end=0.55,
                  lfo=LfoPreset(routing="resonance",
                                waveform=Waveform("sine"),
                                frequency=1.0, depth=1.0))
    assert welsh.needs_filter_refinement(res, SR), \
        "LFO-boosted q (2x static) not reflected in the fidelity flag"


def test_stream_kernel_wrappers_reject_unaligned_segments():
    """The stateful Pallas stream wrappers must refuse n not a multiple of
    cblock: padded zero samples would contaminate the exported state and
    silently break the chain-bitwise contract."""
    from groove_tpu.ops import pallas_iir

    x = jnp.zeros((2, 100), jnp.float32)
    secs = tuple(
        tuple(jnp.zeros((2, 2), jnp.float32) for _ in range(5))
        for _ in range(2))
    with pytest.raises(ValueError, match="64"):
        pallas_iir.lp24_blockrate_stream_pallas(
            x, secs, jnp.zeros((2, 4)), interpret=True)
    with pytest.raises(ValueError, match="64"):
        pallas_iir.lp24_refined_blockrate_stream_pallas(
            x, secs, jnp.zeros((2, 20)), interpret=True)

"""Oscillator waveforms.

The reference's Oscillator (groove-core::generators, missing at HEAD; enum
mirrored at settings/src/patches.rs:173-189) is a phase-accumulator: each
tick advances phase by adjusted_frequency/sample_rate. Here phase is
computed in closed form per note (constant frequency -> t * f/sr; modulated
frequency -> cumsum(f)/sr), so waveform evaluation is pure elementwise VPU
work over [notes, time] tensors.

Waveform shapes are bipolar [-1, 1]:
  sine        sin(2*pi*phase)
  square      pulse-width at 50%
  pulse-width +1 while frac(phase) < width else -1
  sawtooth    2*frac - 1 (rising)
  triangle    rising -1..+1 over the first half cycle, falling after
  noise       white noise, counter-based PRNG (deterministic per seed)
  triangle-sine  marked TODO in the reference (patches.rs:189); rendered as
                 a sine here
  debug-zero/max/min  constants 0 / +1 / -1

The exact waveform polarity/alignment conventions are reconstruction
decisions (leaf sources missing at HEAD); they are spectrally identical to
any alternative alignment.

Hard sync (oscillator-2-sync, patches.rs:110-169): osc2's phase resets
whenever osc1 wraps. Closed form: synced_phase2 = frac(phase1) * f2/f1,
valid for any phase1 trajectory — used by the Welsh voice kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def frac(phase):
    return phase - jnp.floor(phase)


def sine(phase, pulse_width=None):
    # Range-reduce mod 1 BEFORE the f32 sin: frac() is exact in f32
    # (Sterbenz — floor and subtract are single correctly-rounded ops, and
    # p - floor(p) is representable), and sin is exactly 1-periodic, so
    # this never changes the mathematical angle. It changes everything for
    # accuracy: the TPU's f32 sin range reduction loses precision with
    # argument magnitude (measured on-chip at phase ~1040 cycles:
    # -67.5 dB vs the f64 value unreduced, -127.6 dB reduced) — note
    # phases reach thousands of cycles on multi-second notes, which is
    # exactly where the round-4 -77.9/-79.8 dBFS corpus residuals came
    # from (F64_MATRIX.md welsh-test-lfo-pitch / envelope-adsr-linear).
    return jnp.sin(TWO_PI * frac(phase))


def square(phase, pulse_width=None):
    return jnp.where(frac(phase) < 0.5, 1.0, -1.0)


def pulse_width(phase, width):
    return jnp.where(frac(phase) < width, 1.0, -1.0)


def sawtooth(phase, pulse_width=None):
    return 2.0 * frac(phase) - 1.0


def triangle(phase, pulse_width=None):
    f = frac(phase)
    return jnp.where(f < 0.5, 4.0 * f - 1.0, 3.0 - 4.0 * f)


def zero(phase, pulse_width=None):
    return jnp.zeros_like(phase)


def debug_max(phase, pulse_width=None):
    return jnp.ones_like(phase)


def debug_min(phase, pulse_width=None):
    return -jnp.ones_like(phase)


_TABLE = {
    "sine": sine,
    "square": square,
    "sawtooth": sawtooth,
    "triangle": triangle,
    "triangle-sine": sine,
    "none": zero,
    "debug-zero": zero,
    "debug-max": debug_max,
    "debug-min": debug_min,
}


def parse_waveform(params: dict) -> tuple[str, float]:
    """Decode a device's `waveform` param -> (kind, pulse_width).

    The schema allows either a plain kind string or the dict form
    {"pulse-width": w} (projects/demos/instruments/oscillator-*.json).
    Single source of truth for the three engines (whole-timeline,
    streamed, live) — they previously each carried a copy."""
    wf = params.get("waveform", "sine")
    pw = 0.5
    if isinstance(wf, dict):
        pw = float(wf.get("pulse-width", 0.5))
        wf = "pulse-width"
    return str(wf), pw


def evaluate(kind: str, phase, width=0.5, noise_key=None):
    """Evaluate a waveform by (static) kind name.

    `kind` is resolved at trace time — per-instrument waveforms are static
    in the song IR, so no runtime dispatch is needed.
    """
    if kind == "pulse-width":
        return pulse_width(phase, width)
    if kind == "noise":
        if noise_key is None:
            raise ValueError("noise waveform needs noise_key")
        return noise(noise_key, jnp.shape(phase))
    try:
        return _TABLE[kind](phase)
    except KeyError:
        raise ValueError(f"unknown waveform kind {kind!r}") from None


def noise(key: jax.Array, shape) -> jax.Array:
    """White noise in [-1, 1), deterministic per key."""
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def noise_rows(key: jax.Array, row_ids, span: int) -> jax.Array:
    """White noise [n, span] where row i is keyed by row_ids[i].

    A row's values depend on its IDENTITY, not its position in the batch:
    the render paths batch notes by span bucket (engine/render) and by
    per-segment overlap sets (engine/stream), so the same note must draw
    the same noise whatever batch it lands in — position-keyed noise made
    audio depend on the bucket partition and broke the streamed path's
    bitwise segmentation invariance."""
    ids = jnp.asarray(row_ids, jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(ids)
    return jax.vmap(
        lambda k: jax.random.uniform(k, (span,), jnp.float32, -1.0, 1.0)
    )(keys)


def phase_from_const_freq(freq_hz, n: int, sample_rate: float, dtype=jnp.float32):
    """Phase trajectory for a constant frequency: [..., n].

    Computed in f32 via k * (f/sr); for typical note lengths (< 2^20
    samples) the product stays well within f32's exact-integer range, and
    only frac(phase) matters downstream.
    """
    k = jnp.arange(n, dtype=dtype)
    return jnp.asarray(freq_hz, dtype)[..., None] * (k / sample_rate)


def phase_from_freq(freq_hz, sample_rate: float):
    """Phase trajectory for a per-sample frequency [..., n]: cumsum(f)/sr.

    Matches a phase accumulator that advances by f[k]/sr *after* emitting
    sample k (phase[0] == 0).
    """
    inc = freq_hz / sample_rate
    ph = jnp.cumsum(inc, axis=-1)
    return jnp.concatenate(
        [jnp.zeros_like(ph[..., :1]), ph[..., :-1]], axis=-1
    )


def hard_sync_phase(phase_master, freq_ratio):
    """Slave phase under hard sync: resets at each master wrap.

    synced = frac(master_phase) * (f_slave / f_master); exact for
    piecewise-constant ratios.
    """
    return frac(phase_master) * freq_ratio

"""Pointwise effects: gain, limiter, bitcrusher, mixer sum.

Reference contracts (DSP bodies missing at HEAD; reconstructed from param
schemas, tests, and fixtures — see SURVEY.md §2.2):

  Gain {ceiling}:    out = in * ceiling (orchestrator.rs:1518-1524 asserts
                     0.1 * 0.5 exactly).
  Limiter {minimum, maximum}: clamps |sample| into [min, max], preserving
                     sign (README.md admits some effects are "just plain
                     wrong"; a limiter that *boosts* quiet signals to the
                     minimum is the documented reading of the param pair;
                     fixtures: limiter_sine_min-0.400_max-0.600.json).
  Bitcrusher {bits}: quantizes the sample's 16-bit image by dropping `bits`
                     low-order bits, preserving sign (param is named
                     bits-to-crush in automation targets, perf-1.json
                     trip-4).
  Mixer:             pure sum node (gather_audio adds child outputs,
                     orchestrator.rs:397-459).

All functions are shape-preserving elementwise ops over [..., n] (or
[2, n] stereo) arrays; params may be scalars or per-sample arrays
broadcastable against the input (automation).
"""

from __future__ import annotations

import jax.numpy as jnp

I16_MAX = 32767.0


def gain(x, ceiling):
    return x * ceiling


def limiter(x, minimum, maximum):
    return jnp.sign(x) * jnp.clip(jnp.abs(x), minimum, maximum)


def bitcrusher(x, bits):
    """Drop `bits` low-order bits of the 16-bit image.

    Rust semantics reconstructed: (|x| * 32767) as i16 >> bits << bits,
    sign reapplied; the float->int cast truncates toward zero. `bits` may
    be a float array (automation feeds Normal 0..1 scaled elsewhere); we
    floor it to an integer shift amount and implement the shift as an
    integer divide/multiply so it stays differentiable-shape-friendly.
    """
    # clamp to the registry's own 0..15 range (MAX_BITS_TO_CRUSH): an
    # unclamped project value >= 31 is an out-of-range int32 shift that
    # XLA lowers to 0, turning the divide into NaN for every sample
    b = jnp.clip(jnp.floor(jnp.asarray(bits)), 0, 15).astype(jnp.int32)
    step = jnp.left_shift(jnp.int32(1), b).astype(x.dtype)
    mag = jnp.trunc(jnp.abs(x) * I16_MAX)
    crushed = jnp.trunc(mag / step) * step
    return jnp.sign(x) * crushed / I16_MAX

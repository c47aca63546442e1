"""Single-operator FM voice.

Reference FmSynth/FmVoice (missing at HEAD; params at
settings/src/patches.rs:691-715, Wikipedia-FM cited there; beta-sweep demo
corpus projects/demos/instruments/fm-synthesizer-beta-*.json):

    modulator freq = ratio * carrier freq
    carrier out    = sin(2*pi*phase_c + beta * depth * mod_env * sin(2*pi*phase_m))
    out            = carrier_env * velocity * carrier out

beta=0 must degenerate to a pure sine (the beta-0.0 demo), and growing
beta widens the spectrum. Velocity scaling and exact modulation-index
normalization are reconstruction decisions.
"""

from __future__ import annotations

import jax.numpy as jnp

from groove_tpu.ops import envelope as env_ops
from groove_tpu.project.patches import FmSynthParams
from groove_tpu.models.voices import note_freqs

TWO_PI = 2.0 * jnp.pi


def render_notes(
    params: FmSynthParams,
    keys,
    vels,
    gate_frames,
    span: int,
    sample_rate: float,
) -> jnp.ndarray:
    keys = jnp.asarray(keys, jnp.float32)
    t = jnp.arange(span, dtype=jnp.float32)[None, :] / sample_rate
    f_c = note_freqs(keys)[:, None]
    f_m = params.ratio * f_c
    gate_s = jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate

    me = params.modulator_envelope
    mod_env = env_ops.adsr(t, gate_s, me.attack, me.decay, me.sustain, me.release)
    ce = params.carrier_envelope
    car_env = env_ops.adsr(t, gate_s, ce.attack, ce.decay, ce.sustain, ce.release)

    mod = jnp.sin(TWO_PI * f_m * t) * mod_env * params.depth
    carrier = jnp.sin(TWO_PI * f_c * t + params.beta * mod)
    amp = car_env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)
    return carrier * amp


def tail_seconds(params: FmSynthParams) -> float:
    return max(params.carrier_envelope.release, 0.0)

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


def _voices_at(params: FmSynthParams, keys, vels, gate_s, t) -> jnp.ndarray:
    """FM voice value at note-relative times t [n, m] (seconds; t < 0 is
    silence — the note hasn't started). Shared by the offline span render
    and the live window render."""
    f_c = note_freqs(jnp.asarray(keys, jnp.float32))[:, None]
    f_m = params.ratio * f_c

    me = params.modulator_envelope
    mod_env = env_ops.adsr(t, gate_s, me.attack, me.decay, me.sustain, me.release)
    ce = params.carrier_envelope
    car_env = env_ops.adsr(t, gate_s, ce.attack, ce.decay, ce.sustain, ce.release)

    mod = jnp.sin(TWO_PI * f_m * t) * mod_env * params.depth
    carrier = jnp.sin(TWO_PI * f_c * t + params.beta * mod)
    amp = car_env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)
    return carrier * amp * (t >= 0.0)


def render_notes(
    params: FmSynthParams,
    keys,
    vels,
    gate_frames,
    span: int,
    sample_rate: float,
) -> jnp.ndarray:
    t = jnp.arange(span, dtype=jnp.float32)[None, :] / sample_rate
    gate_s = jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate
    return _voices_at(params, keys, vels, gate_s, t)


def render_window(
    params: FmSynthParams,
    keys,
    vels,
    on_abs,
    off_abs,
    t0,
    n: int,
    sample_rate: float,
) -> jnp.ndarray:
    """Live window render -> [n_voices, n]: the block [t0, t0+n) of voices
    whose notes started at absolute frame on_abs (off_abs large while
    held). The voice is a closed-form function of note age, so a block at
    any offset needs no carried state (engine/livesong.py)."""
    # integer note age (i32) before the float divide: f32 absolute frame
    # counts lose sample precision past ~2^24 frames (6 min of session)
    on = jnp.asarray(on_abs, jnp.int32)[:, None]
    off = jnp.asarray(off_abs, jnp.int32)[:, None]
    tj = (jnp.asarray(t0, jnp.int32)
          + jnp.arange(n, dtype=jnp.int32))[None, :]
    t = (tj - on).astype(jnp.float32) / sample_rate
    gate_s = (off - on).astype(jnp.float32) / sample_rate
    active = (jnp.asarray(vels, jnp.float32) > 0.0)[:, None]
    return _voices_at(params, keys, vels, gate_s, t) * active


def tail_seconds(params: FmSynthParams) -> float:
    return max(params.carrier_envelope.release, 0.0)

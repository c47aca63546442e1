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


def _voices_at(params: FmSynthParams, keys, vels, gate_s, t,
               ratio=None, depth=None, beta=None,
               sample_rate: float | None = None) -> jnp.ndarray:
    """FM voice value at note-relative times t [n, m] (seconds; t < 0 is
    silence — the note hasn't started). Shared by the offline span render
    and the live window render. ratio/depth/beta may be per-sample [n, m]
    arrays (block-held automation, VERDICT r2 item 10): a time-varying
    ratio integrates the modulator phase (cumsum) instead of the static
    closed form."""
    f_c = note_freqs(jnp.asarray(keys, jnp.float32))[:, None]

    if ratio is None:
        mod_phase = (params.ratio * f_c) * t
    else:
        f_m = ratio * f_c                                  # [n, m]
        inc = f_m / sample_rate * (t >= 0.0)
        m = inc.shape[-1]
        if m % 64 == 0:
            # exclusive prefix regrouped per 64-sample block: a flat
            # per-sample f32 cumsum accumulates rounding against the
            # growing sum (the oscillator measured ~0.3 cycles drift
            # over 2 s before its host-f64 fix); block-level
            # accumulation cuts the serial term count 64x, putting a
            # 5 s automated-ratio note's phase error below audibility
            nb = m // 64
            inc3 = inc.reshape(inc.shape[0], nb, 64)
            blk = inc3.sum(-1)                              # [n, nb]
            blk_prefix = jnp.cumsum(blk, axis=-1) - blk     # exclusive
            within = jnp.cumsum(inc3, axis=-1) - inc3
            mod_phase = (blk_prefix[..., None] + within).reshape(inc.shape)
        else:
            mod_phase = jnp.cumsum(inc, axis=-1) - inc      # exclusive

    me = params.modulator_envelope
    mod_env = env_ops.adsr(t, gate_s, me.attack, me.decay, me.sustain, me.release)
    ce = params.carrier_envelope
    car_env = env_ops.adsr(t, gate_s, ce.attack, ce.decay, ce.sustain, ce.release)

    depth_v = params.depth if depth is None else depth
    beta_v = params.beta if beta is None else beta
    mod = jnp.sin(TWO_PI * mod_phase) * mod_env * depth_v
    carrier = jnp.sin(TWO_PI * f_c * t + beta_v * mod)
    amp = car_env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)
    return carrier * amp * (t >= 0.0)


def _note_curve(curve_b, on_frames, span: int, cblock: int = 64):
    """Slice a song-level block-rate curve [nb] into per-note per-sample
    values [n, span] at each note's absolute position (held per block)."""
    on = jnp.asarray(on_frames, jnp.int32)[:, None]
    j = jnp.arange(span, dtype=jnp.int32)[None, :]
    idx = jnp.clip((on + j) // cblock, 0, curve_b.shape[0] - 1)
    return jnp.asarray(curve_b, jnp.float32)[idx]


def render_notes(
    params: FmSynthParams,
    keys,
    vels,
    gate_frames,
    span: int,
    sample_rate: float,
    on_frames=None,
    ratio_b=None,
    depth_b=None,
    beta_b=None,
) -> jnp.ndarray:
    """ratio_b/depth_b/beta_b: optional song-level block-rate automation
    curves (domain units); on_frames anchors each note's window on the
    absolute timeline for the slicing."""
    t = jnp.arange(span, dtype=jnp.float32)[None, :] / sample_rate
    gate_s = jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate
    cur = {}
    if on_frames is not None:
        for name, c in (("ratio", ratio_b), ("depth", depth_b),
                        ("beta", beta_b)):
            if c is not None:
                cur[name] = _note_curve(c, on_frames, span)
    return _voices_at(params, keys, vels, gate_s, t,
                      ratio=cur.get("ratio"), depth=cur.get("depth"),
                      beta=cur.get("beta"), sample_rate=sample_rate)


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

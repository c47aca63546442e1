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
import numpy as np

from groove_tpu.ops import envelope as env_ops
from groove_tpu.ops import oscillator as osc_ops
from groove_tpu.project.patches import FmSynthParams
from groove_tpu.models.voices import note_freqs

TWO_PI = 2.0 * jnp.pi


def _voices_at(params: FmSynthParams, keys, vels, gate_s, t,
               ratio=None, depth=None, beta=None,
               sample_rate: float | None = None, freqs=None,
               phases=None) -> jnp.ndarray:
    """FM voice value at note-relative times t [n, m] (seconds; t < 0 is
    silence — the note hasn't started). Shared by the offline span render
    and the live window render. ratio/depth/beta may be per-sample [n, m]
    arrays (block-held automation, VERDICT r2 item 10): a time-varying
    ratio integrates the modulator phase (cumsum) instead of the static
    closed form. freqs: optional HOST-precomputed carrier Hz [n] (the
    offline engines ship numpy-f32 note_freqs so phases are backend-
    independent — a traced exp2's ~1e-6-relative rounding drifts a
    multi-second note's carrier phase to ~-44 dB); live callers omit it."""
    if freqs is not None:
        f_c = jnp.asarray(freqs, jnp.float32)[:, None]
    else:
        f_c = note_freqs(jnp.asarray(keys, jnp.float32))[:, None]

    if phases is not None:
        # host mod-1-reduced tables (host_phases): uniform phase
        # resolution for any note length
        mod_phase = jnp.asarray(phases["phm"], jnp.float32)
    else:
        mod_phase = modulator_phase(params, f_c, t, ratio, sample_rate)

    me = params.modulator_envelope
    mod_env = env_ops.adsr(t, gate_s, me.attack, me.decay, me.sustain, me.release)
    ce = params.carrier_envelope
    car_env = env_ops.adsr(t, gate_s, ce.attack, ce.decay, ce.sustain, ce.release)

    depth_v = params.depth if depth is None else depth
    beta_v = params.beta if beta is None else beta
    # range-reduce phases mod 1 before the f32 sin (exact; sin is
    # 1-periodic — see osc_ops.sine): the TPU's f32 sin loses precision
    # with argument magnitude, and traced-fallback phases (oversize
    # batches / automated ratio) reach thousands of cycles. Host tables
    # are already reduced (host_phases), so frac is a numeric no-op there.
    mod = jnp.sin(TWO_PI * osc_ops.frac(mod_phase)) * mod_env * depth_v
    if phases is not None:
        carrier = jnp.sin(
            TWO_PI * jnp.asarray(phases["phc"], jnp.float32) + beta_v * mod)
    else:
        carrier = jnp.sin(TWO_PI * osc_ops.frac(f_c * t) + beta_v * mod)
    amp = car_env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)
    return carrier * amp * (t >= 0.0)


def modulator_phase(params: FmSynthParams, f_c, t, ratio,
                    sample_rate: float | None):
    """Modulator phase [n, m] in cycles — the static closed form, or (for
    a per-sample `ratio` curve) the 64-block regrouped exclusive cumsum.
    Split out of _voices_at so tools/f64_reference.py can evaluate the
    SAME formula eagerly and share its f32 bits (automated-FM audit)."""
    if ratio is None:
        return (params.ratio * f_c) * t
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
        return (blk_prefix[..., None] + within).reshape(inc.shape)
    return jnp.cumsum(inc, axis=-1) - inc               # exclusive


#: element cap for shipping host FM phase tables (see welsh's cap)
HOST_PHASE_MAX_ELEMS = 8_000_000


def host_phases(params: FmSynthParams, keys, span: int, sample_rate: float,
                max_elems: int = HOST_PHASE_MAX_ELEMS) -> dict | None:
    """HOST (numpy) modulator/carrier phase tables, REDUCED mod 1 in f64
    then cast to f32 -> {"phm", "phc": [n, span]} or None (too big, or
    ratio automation varies the modulator per sample).

    A raw f32 phase f*t loses resolution as it grows (2^-15 cycles at
    phase ~440), and FM's beta multiplies the modulator's error into the
    carrier: beta=100 measured -42.9 dBFS vs the f64 reference. sin is
    exactly 1-periodic, so host f64 reduction keeps uniform 6e-8-cycle
    resolution for any note length; the engines ship these bits and the
    f64 reference shares them (beta-100 pins at -90 after this)."""
    keys = np.asarray(keys, np.float32)
    n = len(keys)
    if n == 0 or n * span > max_elems:
        return None
    f_c = note_freqs(keys).astype(np.float64)[:, None]       # host f32 bits
    k = np.arange(span, dtype=np.float64)[None, :]
    phc = np.mod(f_c * k / float(sample_rate), 1.0)
    phm = np.mod((float(params.ratio) * f_c) * k / float(sample_rate), 1.0)
    return {"phm": phm.astype(np.float32), "phc": phc.astype(np.float32)}


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
    freqs=None,
    phases=None,
) -> jnp.ndarray:
    """ratio_b/depth_b/beta_b: optional song-level block-rate automation
    curves (domain units); on_frames anchors each note's window on the
    absolute timeline for the slicing. freqs: optional host carrier Hz
    [n]; phases: optional host mod-1-reduced phase tables (host_phases)
    — ignored when a ratio curve varies the modulator (see _voices_at)."""
    # HOST time-base literal: an in-graph arange/sample_rate lets XLA
    # rewrite the divide into a reciprocal multiply, shifting phases by
    # ulps between programs (see welsh.render_notes_parts' t) — measured
    # -63 dB carrier drift on 2 s FM notes vs the f64 reference
    t = jnp.asarray(np.arange(span, dtype=np.float32)[None, :]
                    / np.float32(sample_rate))
    gate_s = jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate
    cur = {}
    if on_frames is not None:
        for name, c in (("ratio", ratio_b), ("depth", depth_b),
                        ("beta", beta_b)):
            if c is not None:
                cur[name] = _note_curve(c, on_frames, span)
    return _voices_at(params, keys, vels, gate_s, t,
                      ratio=cur.get("ratio"), depth=cur.get("depth"),
                      beta=cur.get("beta"), sample_rate=sample_rate,
                      freqs=freqs,
                      phases=None if cur.get("ratio") is not None
                      else phases)


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

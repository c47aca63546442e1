"""ADSR envelopes in closed form.

The reference Envelope (groove-core::generators, missing at HEAD) is a
gated segment automaton; patch files store attack/decay/release in seconds
and sustain as a 0..1 level (assets/patches/welsh/*.json,
projects/demos/instruments/envelope-adsr-linear.json — whose title fixes
the segment shape as *linear*).

For offline rendering all note-on/off times are known statically, so the
envelope is a pure function of the sample index — no scan needed:

    held(t)  = t/A                     t < A          (A=0 -> 1)
             = 1 - (1-S)(t-A)/D        t < A+D        (D=0 -> S)
             = S                       otherwise
    env(t)   = held(t)                          t < t_off
             = held(t_off) * (1 - (t-t_off)/R)  t >= t_off, clamped at 0
                                                 (R=0 -> 0)

Release starts from the envelope's value at note-off (handles note-off
during attack/decay). Everything is vectorized over [notes, time].

BACKEND-GENERIC: numpy inputs evaluate with numpy (host f32), tracers/jnp
arrays with jnp — same dispatch rule as ops/iir's coefficient designers.
Host evaluation makes envelope-derived CONTROL values (the welsh filter
cutoff tables) backend-independent data: the jitted TPU program, the CPU
test backend, and the f64 golden reference all consume identical bits
instead of each backend's own transcendental/fusion rounding (measured
1e-5-relative eager-vs-jit drift in lp24 a1 on the TPU, amplified to
-70 dBFS by near-critical poles).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _ns(*vals):
    """numpy for host (numpy/python) inputs, jnp when anything is traced."""
    for v in vals:
        if not isinstance(v, (int, float, np.ndarray, np.floating,
                              np.integer)):
            return jnp
    return np


def _held(t, attack, decay, sustain, ns=jnp):
    eps = 1e-9
    a = ns.maximum(attack, eps)
    d = ns.maximum(decay, eps)
    in_attack = t < attack
    in_decay = t < attack + decay
    v_attack = t / a
    v_decay = 1.0 - (1.0 - sustain) * (t - attack) / d
    return ns.where(in_attack, v_attack, ns.where(in_decay, v_decay, sustain))


def adsr(t, t_off, attack, decay, sustain, release):
    """Envelope value at time t (seconds since note-on).

    All arguments broadcast; typically t is [..., n] and the rest are
    [..., 1] per-note parameters. t_off is the gate length in seconds.
    """
    ns = _ns(t, t_off, attack, decay, sustain, release)
    eps = 1e-9
    r = ns.maximum(release, eps)
    v_off = _held(t_off, attack, decay, sustain, ns)
    rel = v_off * (1.0 - (t - t_off) / r)
    env = ns.where(t < t_off, _held(t, attack, decay, sustain, ns), rel)
    return ns.clip(env, 0.0, 1.0)


def release_tail_seconds(release: float) -> float:
    """How long a voice keeps sounding after note-off."""
    return float(release)

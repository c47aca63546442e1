"""DCA: digitally-controlled amplifier — gain + stereo pan placement.

The reference's Dca (groove-core, missing at HEAD; params {gain, pan} at
settings/src/instruments.rs use-sites) places a mono voice in the stereo
field with the Pirkle synth-book pan law (the classic quadratic law used
throughout that codebase's era):

    left  = 1 - 0.25 * (pan + 1)^2
    right = 1 - (0.5 * pan - 0.5)^2

pan in [-1, 1]; pan=0 gives 0.75/0.75, pan=-1 gives 1.0/0.0.
"""

from __future__ import annotations

import jax.numpy as jnp


def pan_gains(pan):
    pan = jnp.asarray(pan, jnp.float32)
    left = 1.0 - 0.25 * (pan + 1.0) ** 2
    right = 1.0 - (0.5 * pan - 0.5) ** 2
    return left, right


def dca(mono, gain, pan):
    """mono [..., n] -> stereo [..., 2, n]. gain/pan broadcast (automation
    may supply per-sample pan, e.g. the stereo-automation demo's LFO)."""
    left, right = pan_gains(pan)
    sig = mono * gain
    return jnp.stack(
        [jnp.broadcast_to(left * sig, sig.shape),
         jnp.broadcast_to(right * sig, sig.shape)],
        axis=-2,
    )

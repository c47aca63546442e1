"""Dynamics: compressor (and the sidechain control signal).

Compressor {threshold, ratio, attack, release}
(projects/default.json5:54-61, demos/effects/compressor.json, sidechain
fixtures). The reference-era compressor is *instantaneous* — attack and
release are parsed but unused at this snapshot (fixtures default them to
0; README.md:88-90 flags the dynamics effects as approximate):

    |x| >  threshold:  y = sign(x) * (threshold + (|x| - threshold) * ratio)
    |x| <= threshold:  y = x

`compressor` reproduces that exactly (and accepts per-sample threshold
arrays — the sidechain path drives `threshold` per 64-frame block,
projects/demos/controllers/sidechain.json:113-120).

`compressor_smoothed` adds a standard one-pole envelope follower using
attack/release seconds. The follower's coefficient switches on signal
direction, which is data-dependent; we keep it linear by computing both
smoothings and selecting per-sample against the *raw* rectified signal —
a branch-free equivalent of the classic follower for attack != release.
"""

from __future__ import annotations

import jax.numpy as jnp

from groove_tpu.ops.iir import one_pole


def compressor(x, threshold, ratio):
    mag = jnp.abs(x)
    compressed = jnp.sign(x) * (threshold + (mag - threshold) * ratio)
    return jnp.where(mag > threshold, compressed, x)


def _follower_coef(seconds, sample_rate):
    s = jnp.maximum(jnp.asarray(seconds, jnp.float32), 1e-6)
    return jnp.exp(-1.0 / (s * sample_rate))


def envelope_follower(x, attack_s, release_s, sample_rate):
    """Peak follower: attacks with `attack_s`, releases with `release_s`.

    attack_s/release_s may be per-sample arrays (automated trips): the
    recurrence in one_pole is time-varying, and _follower_coef clamps
    zero-seconds to ~instantaneous, so array inputs that pass through 0
    degrade gracefully to pass-through rather than diverging.
    """
    mag = jnp.abs(x)
    if isinstance(attack_s, (int, float)) and isinstance(release_s, (int, float)) \
            and attack_s <= 0.0 and release_s <= 0.0:
        return mag
    a_att = _follower_coef(attack_s, sample_rate)
    a_rel = _follower_coef(release_s, sample_rate)
    env_att = one_pole(mag, a_att, 1.0 - a_att)
    env_rel = one_pole(mag, a_rel, 1.0 - a_rel)
    rising = mag >= jnp.maximum(env_att, env_rel)
    return jnp.where(rising, env_att, env_rel)


def compressor_smoothed(x, threshold, ratio, attack_s, release_s, sample_rate):
    env = envelope_follower(x, attack_s, release_s, sample_rate)
    over = env > threshold
    target = threshold + (env - threshold) * ratio
    g = jnp.where(over, target / jnp.maximum(env, 1e-9), 1.0)
    return x * g

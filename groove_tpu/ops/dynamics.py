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

`compressor_smoothed` adds a DECOUPLED PEAK DETECTOR using attack/release
seconds: a release-rate peak hold y[n] = max(|x[n]|, r*y[n-1]) followed by
attack-rate one-pole smoothing toward the held peak. The max-decay
recurrence is associative (combine (v1,p1),(v2,p2) -> (max(v2, v1*p2),
p1*p2)), so it parallelizes like one_pole. An earlier branch-free form ran
two independent one-poles and selected per-sample — its release branch
decayed from a slow LOW-PASS's value rather than the tracked peak, so a
10 ms burst through a 500 ms release collapsed instantly instead of
ringing out (round-3 review finding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groove_tpu.ops.iir import one_pole


def compressor(x, threshold, ratio):
    mag = jnp.abs(x)
    compressed = jnp.sign(x) * (threshold + (mag - threshold) * ratio)
    return jnp.where(mag > threshold, compressed, x)


def _follower_coef(seconds, sample_rate):
    s = jnp.maximum(jnp.asarray(seconds, jnp.float32), 1e-6)
    return jnp.exp(-1.0 / (s * sample_rate))


def max_decay(x, r):
    """y[n] = max(x[n], r[n]*y[n-1]), zero initial state — the peak-hold
    recurrence, via associative scan (the product term p underflows to 0
    over long windows, which is exactly the decayed-away contribution)."""
    r = jnp.broadcast_to(jnp.asarray(r, x.dtype), x.shape)

    def combine(e1, e2):
        v1, p1 = e1
        v2, p2 = e2
        return (jnp.maximum(v2, v1 * p2), p1 * p2)

    y, _ = jax.lax.associative_scan(combine, (x, r), axis=-1)
    return y


def envelope_follower(x, attack_s, release_s, sample_rate):
    """Decoupled peak detector: release-rate PEAK HOLD (max_decay), then
    attack-rate one-pole smoothing toward the held peak. At 0/0 seconds it
    degenerates to |x| (the instantaneous path).

    attack_s/release_s may be per-sample arrays (automated trips): both
    recurrences are time-varying, and _follower_coef clamps zero-seconds
    to ~instantaneous, so array inputs that pass through 0 degrade
    gracefully to pass-through rather than diverging."""
    mag = jnp.abs(x)
    if isinstance(attack_s, (int, float)) and isinstance(release_s, (int, float)) \
            and attack_s <= 0.0 and release_s <= 0.0:
        return mag
    peak = max_decay(mag, _follower_coef(release_s, sample_rate))
    a_att = _follower_coef(attack_s, sample_rate)
    return one_pole(peak, a_att, 1.0 - a_att)


def compressor_smoothed(x, threshold, ratio, attack_s, release_s, sample_rate):
    env = envelope_follower(x, attack_s, release_s, sample_rate)
    over = env > threshold
    target = threshold + (env - threshold) * ratio
    g = jnp.where(over, target / jnp.maximum(env, 1e-9), 1.0)
    return x * g

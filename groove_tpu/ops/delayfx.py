"""Delay-line effects: delay, chorus, reverb.

Reference DSP bodies are missing at HEAD; param schemas:
  Delay {delay: seconds}           (projects/demos/effects/delay.json)
  Chorus {voices, delay-seconds}   (projects/demos/effects/chorus.json)
  Reverb {attenuation, seconds}    (test-data/kitchen-sink.json:106-115)

Reconstruction decisions (documented per SURVEY.md §2.2):
  - Delay outputs the delayed signal (100% wet): y[n] = x[n-D].
  - Chorus sums `voices` taps spaced delay/voices apart (tap 0 = dry),
    scaled by 1/voices.
  - Reverb is the classic Schroeder topology the reference's parameter
    pair implies: four recirculating combs (29.7/37.1/41.1/43.7 ms) whose
    feedback gain realizes an RT60 of `seconds` (g = 0.001^(D/RT60), i.e.
    -60 dB after `seconds`), followed by two all-pass diffusers
    (5.0 ms / 1.7 ms, g = 0.7), output scaled by `attenuation`.

TPU mapping: a feedback delay of D samples is a *first-order* recurrence
in block space — reshape time to [n/D, D] and the D lanes are independent:
  comb   y[n] = x[n-D] + g y[n-D]  ->  Y[b] = X[b-1] + g Y[b-1]
  allpass y[n] = -g x[n] + (1-g^2)(x[n-D] + g y'[n-D]) via the canonical
    one-multiply form: w[n] = x[n] + g w[n-D]; y[n] = -g x[n] + (1-g^2) w[n-D]
    (w is the same comb recurrence, so both reuse `one_pole` over blocks).
All delay lengths are static per song, so shapes stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from groove_tpu.ops.iir import one_pole, upsample_hold

COMB_DELAYS_S = (0.0297, 0.0371, 0.0411, 0.0437)
ALLPASS_DELAYS_S = (0.005, 0.0017)
ALLPASS_G = 0.7


def delay_signal(x, delay_samples: int):
    """y[n] = x[n - D], zero history. D is a static Python int."""
    if delay_samples <= 0:
        return x
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(delay_samples, 0)]
    return jnp.pad(x, pad)[..., :n]


def _block_view(x, d: int):
    """Pad time axis to a multiple of d and reshape to [..., n/d, d]."""
    n = x.shape[-1]
    nb = -(-n // d)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, nb * d - n)]
    xp = jnp.pad(x, pad)
    return xp.reshape(x.shape[:-1] + (nb, d)), n


def comb_feedback(x, delay_samples: int, g: float):
    """y[n] = x[n-D] + g*y[n-D] (recirculating delay line), zero history."""
    xb, n = _block_view(x, delay_samples)
    # Y[b] = g*Y[b-1] + X[b-1]: shift X one block, first-order scan over b.
    x_shift = jnp.concatenate([jnp.zeros_like(xb[..., :1, :]), xb[..., :-1, :]], axis=-2)
    yb = one_pole(x_shift, g, 1.0, axis=-2)
    return yb.reshape(x.shape[:-1] + (-1,))[..., :n]


def allpass(x, delay_samples: int, g: float = ALLPASS_G):
    """Schroeder all-pass: H(z) = (-g + z^-D) / (1 - g z^-D).

    One-multiply form: w[n] = x[n] + g*w[n-D]; y = -g*x + (1-g^2)*w[n-D].
    """
    xb, n = _block_view(x, delay_samples)
    wb = one_pole(xb, g, 1.0, axis=-2)
    w_delayed = jnp.concatenate(
        [jnp.zeros_like(wb[..., :1, :]), wb[..., :-1, :]], axis=-2
    )
    yb = -g * xb + (1.0 - g * g) * w_delayed
    return yb.reshape(x.shape[:-1] + (-1,))[..., :n]


def delay(x, delay_seconds: float, sample_rate: float):
    return delay_signal(x, int(round(delay_seconds * sample_rate)))


def delay_automated(x, delay_seconds_b, sample_rate: float,
                    cblock: int = 64):
    """Automated delay TIME (VERDICT r2 item 10): the delay length is a
    block-rate curve held for 64 samples (the reference recomputes params
    at handle_work cadence, orchestrator.rs:631-708) and the output is a
    gather y[n] = x[n - D(block(n))] — length changes take effect at
    block boundaries with no crossfade, exactly like a live param tweak
    in the reference's per-buffer model."""
    n = x.shape[-1]
    d_b = jnp.round(jnp.asarray(delay_seconds_b, jnp.float32)
                    * sample_rate).astype(jnp.int32)
    d_up = upsample_hold(d_b, n, cblock)
    idx = jnp.arange(n, dtype=jnp.int32) - d_up
    valid = (idx >= 0).astype(x.dtype)
    idx = jnp.clip(idx, 0, n - 1)
    return jnp.take(x, idx, axis=-1) * valid


def comb_feedback_automated(x, delay_samples: int, g):
    """y[n] = x[n-D] + g[n]*y[n-D] with a PER-SAMPLE feedback coefficient
    (automated reverb RT60). Same block-space recurrence as comb_feedback —
    the D lanes stay independent; each lane is a first-order time-varying
    recurrence over blocks, so `one_pole`'s associative scan applies with
    a[b, lane] = g at that absolute sample."""
    d = delay_samples
    g = jnp.broadcast_to(jnp.asarray(g, x.dtype), x.shape)
    xb, n = _block_view(x, d)
    gb, _ = _block_view(g, d)
    x_shift = jnp.concatenate(
        [jnp.zeros_like(xb[..., :1, :]), xb[..., :-1, :]], axis=-2
    )
    # move the block axis last so one_pole's per-element `a` lines up
    yb = one_pole(jnp.moveaxis(x_shift, -2, -1), jnp.moveaxis(gb, -2, -1),
                  1.0)
    yb = jnp.moveaxis(yb, -1, -2)
    return yb.reshape(x.shape[:-1] + (-1,))[..., :n]


def reverb_comb_g(seconds, d: int, sample_rate: float):
    """Comb feedback gain for RT60 `seconds` (scalar or array): −60 dB
    after `seconds`, i.e. 0.001^(D/(RT60·sr)); exactly 0 where
    seconds <= 0 (the static reverb's branch)."""
    sec = jnp.asarray(seconds, jnp.float32)
    g = jnp.exp(jnp.float32(np.log(0.001))
                * (jnp.float32(d) / (sec * jnp.float32(sample_rate))))
    return jnp.where(sec > 0.0, g, 0.0)


def chorus(x, voices: int, delay_seconds: float, sample_rate: float,
           wet_dry_mix=1.0):
    """Multi-tap chorus. `wet-dry-mix` is a controllable param in the
    reference (automated by projects/demos/effects/chorus.json's trip);
    1.0 = fully wet (the tap sum), 0.0 = dry passthrough."""
    voices = max(1, int(voices))
    total_d = int(round(delay_seconds * sample_rate))
    wet = jnp.zeros_like(x)
    for v in range(voices):
        wet = wet + delay_signal(x, v * total_d // voices)
    wet = wet / voices
    return x * (1.0 - wet_dry_mix) + wet * wet_dry_mix


def chorus_voice_counts(voices_b, max_voices: int):
    """Block-rate `voices` curve -> clamped int tap counts [..., nb].
    max_voices is the HOST-side curve maximum (automation curves are
    compile-time data), which bounds the tap loop."""
    return jnp.clip(
        jnp.round(jnp.asarray(voices_b, jnp.float32)).astype(jnp.int32),
        1, max_voices,
    )


def chorus_curve_max_voices(curve) -> int:
    """HOST-side tap-loop bound for an automated `voices` curve (the curve
    is compile-time data). Shared by both engines so the bound can never
    diverge between the whole-timeline and streamed renders."""
    return int(max(1, round(float(np.max(np.asarray(curve))))))


def chorus_tap_curves(delay_seconds_b, voices, voices_b, max_voices,
                      n: int, sample_rate: float, cblock: int = 64):
    """Shared per-sample tap curves for the automated chorus: returns
    (d_up [n] int32 total-delay samples, v_up [n] int32 tap counts,
    n_taps static loop bound). delay_seconds_b may be a scalar (static
    delay, automated voices). Single source of truth for both
    delayfx.chorus_automated and ops/stream.chorus_stream_automated —
    any change to voice-count rounding or delay quantization must land
    in exactly one place or the two engines' pinned agreement breaks."""
    d_b = jnp.round(jnp.asarray(delay_seconds_b, jnp.float32)
                    * sample_rate).astype(jnp.int32)
    if jnp.ndim(d_b) == 0:
        d_up = jnp.full((n,), d_b, jnp.int32)
    else:
        d_up = upsample_hold(d_b, n, cblock)
    if voices_b is not None:
        v_up = upsample_hold(
            chorus_voice_counts(voices_b, int(max_voices)), n, cblock)
        n_taps = int(max_voices)
    else:
        v_up = jnp.full((n,), max(1, int(voices)), jnp.int32)
        n_taps = max(1, int(voices))
    return d_up, v_up, n_taps


def chorus_automated(x, voices, delay_seconds_b, sample_rate: float,
                     wet_dry_mix=1.0, cblock: int = 64,
                     voices_b=None, max_voices: int | None = None):
    """Automated chorus (`delay-seconds` and/or `voices` trips): the
    total delay D and the tap count V are block-rate curves held for 64
    samples (cf. delay_automated) and each tap is a gather
    y_v[n] = x[n - v*D(block(n))//V(block(n))] masked by v < V; the sum
    scales by 1/V(n). `voices` may be automated even though it is a
    Python loop bound: the loop runs to the CURVE MAXIMUM (host data)
    and inactive taps mask to zero. Out-of-range taps read exact zeros,
    matching chorus's zero-pad history.
    delay_seconds_b may be a scalar (static delay, automated voices)."""
    n = x.shape[-1]
    d_up, v_up, n_taps = chorus_tap_curves(
        delay_seconds_b, voices, voices_b, max_voices, n, sample_rate,
        cblock)
    base = jnp.arange(n, dtype=jnp.int32)
    wet = jnp.zeros_like(x)
    for v in range(n_taps):
        idx = base - (v * d_up) // v_up
        valid = ((idx >= 0) & (v < v_up)).astype(x.dtype)
        wet = wet + jnp.take(x, jnp.clip(idx, 0, n - 1), axis=-1) * valid
    wet = wet / v_up.astype(x.dtype)
    return x * (1.0 - wet_dry_mix) + wet * wet_dry_mix


def reverb_automated(x, attenuation, seconds_b, sample_rate: float,
                     cblock: int = 64):
    """Automated reverb RT60 (`seconds` trip, formerly STATIC_ONLY): the
    comb feedback gains follow the curve at the 64-sample control cadence
    (the reference recomputes params per buffer, orchestrator.rs:631-708)
    — y[n] = x[n-D] + g(n)·y[n-D] per comb, the same one multiply-add per
    sample as the static topology, so the streamed variant
    (ops/stream.reverb_stream_automated) stays segmentation-invariant."""
    n = x.shape[-1]
    sec_s = upsample_hold(jnp.asarray(seconds_b, jnp.float32), n, cblock)
    combs = jnp.zeros_like(x)
    for d_s in COMB_DELAYS_S:
        d = max(1, int(round(d_s * sample_rate)))
        g = reverb_comb_g(sec_s, d, sample_rate)
        combs = combs + comb_feedback_automated(x, d, g)
    y = combs
    for d_s in ALLPASS_DELAYS_S:
        y = allpass(y, max(1, int(round(d_s * sample_rate))))
    return attenuation * y


def reverb(x, attenuation: float, seconds: float, sample_rate: float):
    combs = jnp.zeros_like(x)
    for d_s in COMB_DELAYS_S:
        d = max(1, int(round(d_s * sample_rate)))
        if seconds > 0:
            g = 0.001 ** (d / (seconds * sample_rate))
        else:
            g = 0.0
        combs = combs + comb_feedback(x, d, g)
    y = combs
    for d_s in ALLPASS_DELAYS_S:
        y = allpass(y, max(1, int(round(d_s * sample_rate))))
    return attenuation * y

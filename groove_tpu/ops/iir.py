"""Parallel IIR filtering on TPU.

The reference evaluates biquads sample-serially inside its per-sample entity
loop (orchestration/src/orchestrator.rs:367-470; DSP bodies missing at HEAD,
algorithms specified by doc/Audio-EQ-Cookbook.txt and doc/filters004.txt).
A per-sample Python/XLA loop would be ~10^5 sequential steps; instead we
exploit that a biquad is a *linear* 2-state recurrence:

    state s[n] = A[n] @ s[n-1] + c[n]         (affine map per sample)
    y[n]       = b0[n] x[n] + s1[n-1]         (transposed direct form II)

Affine maps compose associatively, so the whole filter — even with
*per-sample time-varying coefficients* (filter-cutoff automation, Welsh
filter envelopes) — runs as one `jax.lax.associative_scan` over the time
axis: O(n) work, O(log n) depth, pure VPU elementwise ops. This is the
TPU-native replacement for the reference's stateful `transform_audio` chain,
and is exact (same recurrence, reordered floating-point only).

TDF2 state update, derived by substituting y[n] into the canonical form:
    s1[n] = (b1 - a1*b0) x[n] - a1 s1[n-1] + s2[n-1]
    s2[n] = (b2 - a2*b0) x[n] - a2 s1[n-1]
so A[n] = [[-a1, 1], [-a2, 0]], c[n] = [(b1-a1 b0) x, (b2-a2 b0) x].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _affine_combine(e1, e2):
    """Compose affine maps: e2 AFTER e1 (scan order). Elementwise over any
    leading/trailing batch dims."""
    a11, a12, a21, a22, c1, c2 = e1
    b11, b12, b21, b22, d1, d2 = e2
    return (
        b11 * a11 + b12 * a21,
        b11 * a12 + b12 * a22,
        b21 * a11 + b22 * a21,
        b21 * a12 + b22 * a22,
        b11 * c1 + b12 * c2 + d1,
        b21 * c1 + b22 * c2 + d2,
    )


def biquad(x: jax.Array, coefs, axis: int = -1) -> jax.Array:
    """Apply one biquad section along `axis` (zero initial state).

    coefs: tuple (b0, b1, b2, a1, a2), normalized (a0 == 1). Each entry is a
    scalar or an array broadcastable against `x` (per-sample coefficients
    for time-varying filters).
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    b0, b1, b2, a1, a2 = [jnp.asarray(c, x.dtype) for c in coefs]
    ones = jnp.ones_like(x)
    elems = (
        (-a1) * ones,
        ones,
        (-a2) * ones,
        jnp.zeros_like(x),
        (b1 - a1 * b0) * x,
        (b2 - a2 * b0) * x,
    )
    scanned = jax.lax.associative_scan(_affine_combine, elems, axis=-1)
    s1 = scanned[4]
    s1_prev = jnp.pad(s1[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    y = b0 * x + s1_prev
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def one_pole(x: jax.Array, a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """y[n] = a[n] * y[n-1] + b[n] * x[n], zero initial state.

    First-order linear time-varying recurrence via associative scan; used by
    envelope followers and comb/allpass block recurrences.
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    a = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape)
    bx = jnp.asarray(b, x.dtype) * x

    def combine(e1, e2):
        a1_, c1 = e1
        a2_, c2 = e2
        return (a2_ * a1_, a2_ * c1 + c2)

    _, y = jax.lax.associative_scan(combine, (a, bx), axis=-1)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y


# --------------------------------------------------------------------------
# RBJ Audio EQ Cookbook coefficients (doc/Audio-EQ-Cookbook.txt:100-200).
# All functions are vectorized: cutoff/q/... may be arrays (per-block or
# per-sample automation); returns normalized (b0, b1, b2, a1, a2).


def _norm(b0, b1, b2, a0, a1, a2):
    return (b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def _w0(cutoff, sample_rate):
    return 2.0 * jnp.pi * cutoff / sample_rate


def rbj_low_pass(cutoff, q, sample_rate):
    w0 = _w0(cutoff, sample_rate)
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    alpha = sw / (2.0 * q)
    return _norm((1 - cw) / 2, 1 - cw, (1 - cw) / 2, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_high_pass(cutoff, q, sample_rate):
    w0 = _w0(cutoff, sample_rate)
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    alpha = sw / (2.0 * q)
    return _norm((1 + cw) / 2, -(1 + cw), (1 + cw) / 2, 1 + alpha, -2 * cw, 1 - alpha)


def _alpha_bw(w0, bandwidth):
    """alpha for the bandwidth (octaves) parameterization
    (Audio-EQ-Cookbook.txt:86-88)."""
    sw = jnp.sin(w0)
    return sw * jnp.sinh(jnp.log(2.0) / 2.0 * bandwidth * w0 / sw)


def rbj_band_pass(cutoff, bandwidth, sample_rate):
    """Constant 0 dB peak gain variant (cookbook's second BPF form)."""
    w0 = _w0(cutoff, sample_rate)
    cw = jnp.cos(w0)
    alpha = _alpha_bw(w0, bandwidth)
    return _norm(alpha, jnp.zeros_like(alpha), -alpha, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_band_stop(cutoff, bandwidth, sample_rate):
    w0 = _w0(cutoff, sample_rate)
    cw = jnp.cos(w0)
    alpha = _alpha_bw(w0, bandwidth)
    one = jnp.ones_like(alpha)
    return _norm(one, -2 * cw, one, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_all_pass(cutoff, q, sample_rate):
    w0 = _w0(cutoff, sample_rate)
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    alpha = sw / (2.0 * q)
    return _norm(1 - alpha, -2 * cw, 1 + alpha, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_peaking_eq(cutoff, q, db_gain, sample_rate):
    w0 = _w0(cutoff, sample_rate)
    cw, sw = jnp.cos(w0), jnp.sin(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = sw / (2.0 * q)
    return _norm(
        1 + alpha * a, -2 * cw, 1 - alpha * a, 1 + alpha / a, -2 * cw, 1 - alpha / a
    )


def _shelf_alpha(w0, a, slope=1.0):
    sw = jnp.sin(w0)
    return sw / 2.0 * jnp.sqrt((a + 1.0 / a) * (1.0 / slope - 1.0) + 2.0)


def rbj_low_shelf(cutoff, db_gain, sample_rate, slope=1.0):
    w0 = _w0(cutoff, sample_rate)
    cw = jnp.cos(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = _shelf_alpha(w0, a, slope)
    two_sqrt_a_alpha = 2.0 * jnp.sqrt(a) * alpha
    return _norm(
        a * ((a + 1) - (a - 1) * cw + two_sqrt_a_alpha),
        2 * a * ((a - 1) - (a + 1) * cw),
        a * ((a + 1) - (a - 1) * cw - two_sqrt_a_alpha),
        (a + 1) + (a - 1) * cw + two_sqrt_a_alpha,
        -2 * ((a - 1) + (a + 1) * cw),
        (a + 1) + (a - 1) * cw - two_sqrt_a_alpha,
    )


def rbj_high_shelf(cutoff, db_gain, sample_rate, slope=1.0):
    w0 = _w0(cutoff, sample_rate)
    cw = jnp.cos(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = _shelf_alpha(w0, a, slope)
    two_sqrt_a_alpha = 2.0 * jnp.sqrt(a) * alpha
    return _norm(
        a * ((a + 1) + (a - 1) * cw + two_sqrt_a_alpha),
        -2 * a * ((a - 1) + (a + 1) * cw),
        a * ((a + 1) + (a - 1) * cw - two_sqrt_a_alpha),
        (a + 1) - (a - 1) * cw + two_sqrt_a_alpha,
        2 * ((a - 1) - (a + 1) * cw),
        (a + 1) - (a - 1) * cw - two_sqrt_a_alpha,
    )


# --------------------------------------------------------------------------
# 24 dB/oct resonant low-pass: 4th-order Butterworth as a cascade of two
# biquads, bilinear transform with prewarping (doc/filters004.txt). The
# resonance Q divides each section's s-domain b1 (filters004.txt:188-193);
# section b1 constants 0.765367 / 1.847759 (:146-155).

_LP24_B1 = (0.765367, 1.847759)


def lp24_sections(cutoff, q, sample_rate):
    """Returns (gain, [(b0,b1,b2,a1,a2) x2]) for the 24 dB low-pass.

    `cutoff`/`q` may be arrays (per-sample automation). Mirrors
    szxform(): prewarp both polynomials at fc, then bilinear
    (filters004.txt:300-410). Numerator is 1, so prewarping it is a no-op.
    """
    cutoff = jnp.asarray(cutoff, jnp.float32)
    fs = sample_rate
    wp = 2.0 * fs * jnp.tan(jnp.pi * cutoff / fs)
    gain = jnp.ones_like(cutoff)
    sections = []
    for b1s in _LP24_B1:
        # s-domain denominator (1, b1s/q, 1) prewarped: b2/wp^2, b1/wp
        b0s = 1.0
        b1p = (b1s / q) / wp
        b2p = 1.0 / (wp * wp)
        # bilinear (filters004.txt:352-380); numerator a = (1, 0, 0)
        ad = jnp.ones_like(cutoff)
        bd = 4.0 * b2p * fs * fs + 2.0 * b1p * fs + b0s
        gain = gain * ad / bd
        beta1 = (2.0 * b0s - 8.0 * b2p * fs * fs) / bd
        beta2 = (4.0 * b2p * fs * fs - 2.0 * b1p * fs + b0s) / bd
        # z-domain numerator of 1 -> (1, 2, 1) scaled into the global gain?
        # No: bilinear of constant numerator 1 gives alpha1 = 2*1/ad = 2,
        # alpha2 = 1 (the (1+z^-1)^2 factor), with ad = 1.
        alpha1 = 2.0 * jnp.ones_like(cutoff)
        alpha2 = jnp.ones_like(cutoff)
        sections.append(
            (jnp.ones_like(cutoff), alpha1, alpha2, beta1, beta2)
        )
    return gain, sections


def lp24_apply(x, cutoff, q, sample_rate, axis=-1):
    """Run the 24 dB low-pass cascade. cutoff/q broadcast against x."""
    gain, sections = lp24_sections(cutoff, q, sample_rate)
    y = x * gain
    for sec in sections:
        y = biquad(y, sec, axis=axis)
    return y


# --------------------------------------------------------------------------
# NumPy reference implementations (for tests; sample-serial, f64)


def biquad_ref(x: np.ndarray, coefs) -> np.ndarray:
    """Sample-serial TDF2 in float64, for validating `biquad`."""
    b0, b1, b2, a1, a2 = [np.broadcast_to(np.asarray(c, np.float64), x.shape)
                          for c in coefs]
    y = np.zeros_like(x, dtype=np.float64)
    s1 = np.zeros(x.shape[:-1])
    s2 = np.zeros(x.shape[:-1])
    for n in range(x.shape[-1]):
        xn = x[..., n]
        yn = b0[..., n] * xn + s1
        s1 = b1[..., n] * xn - a1[..., n] * yn + s2
        s2 = b2[..., n] * xn - a2[..., n] * yn
        y[..., n] = yn
    return y

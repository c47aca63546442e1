"""Stateful (segment-streaming) variants of the stateful DSP ops.

The engine's streaming renderer (engine/stream.py) renders a song in
fixed-size segments with an explicit carried-state pytree — the TPU-native
equivalent of the reference's incremental tick loop
(orchestration/src/orchestrator.rs:855-877, `tick` over sample slices),
which carries entity state implicitly in the object graph.

Every op here is **segmentation-invariant bit-exactly**: for segment
lengths that are multiples of 64 frames, the float operations applied to
each sample are identical regardless of where segment boundaries fall,
because every recurrence is evaluated on a fixed 64-sample (or
delay-length) grid with strictly serial cross-grid state propagation:

  - biquads run the blocked two-level scheme with block=64 (the
    reference's control cadence), entry/exit state via ops.iir.biquad;
  - feedback combs / all-passes are first-order recurrences in
    delay-length block space, evaluated as a serial lax.scan over blocks
    whose body is elementwise per lane — each output sample is literally
    `x[t-D] + g*y[t-D]` (one multiply-add), so ANY segmentation that
    hands over the last D samples reproduces the same floats;
  - the envelope follower's one-pole runs associative *within* fixed
    64-sample blocks and serial across blocks.

This is what makes "one segment covering the whole song" vs "many small
segments" produce bit-identical audio (tests/test_stream.py), the honest
version of "streamed output must equal the one-shot render".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from groove_tpu.ops import iir

STREAM_BLOCK = 64  # the reference's SAMPLE_BUFFER_SIZE / control cadence


# --------------------------------------------------------------------------
# biquad with state handoff (block = 64, segmentation-invariant)


def biquad_stream(x, coefs, state, serial: bool = False):
    """One biquad section over a segment; x: [..., S] with S % 64 == 0.

    state: (s1, s2) TDF2 state entering the segment (each [...batch]).
    Returns (y, (s1', s2')). serial=True (the HOST-side fidelity decision,
    engine/render.compute_filter_fidelity — in-graph coefficients are
    tracers, so no check here could fire) takes the strictly serial
    per-sample scan for deep near-critical poles — also
    segmentation-invariant since it is fully serial.
    """
    if serial or iir._near_critical_static(coefs):
        return biquad_serial_stream(x, coefs, state)
    y, exit_state, _ = iir.biquad(
        x, coefs, block=STREAM_BLOCK,
        initial_state=state, return_state=True,
    )
    return y, (exit_state[0], exit_state[1])


def biquad_serial_stream(x, coefs, state):
    """Per-sample TDF2 serial scan with entry/exit state (cf.
    iir.biquad_serial, which is the zero-state version). Coefficients may
    be static scalars or per-sample [..., S] arrays (automated filters
    whose residence in the deep-corner band routes them serially —
    engine/render.compute_filter_fidelity)."""
    S = x.shape[-1]
    cs = [jnp.asarray(c, x.dtype) for c in coefs]
    tv = any(c.ndim >= 1 and c.shape[-1] == S for c in cs)
    xt = jnp.moveaxis(x, -1, 0)  # [S, ...]
    s1 = jnp.broadcast_to(jnp.asarray(state[0], x.dtype), xt[0].shape)
    s2 = jnp.broadcast_to(jnp.asarray(state[1], x.dtype), xt[0].shape)

    if tv:
        # per-sample coefficient rows ride the scan; a [..., S] coef with
        # leading batch dims moves its time axis first like x
        cts = tuple(
            jnp.moveaxis(jnp.broadcast_to(c, x.shape), -1, 0)
            if c.ndim > 1 else jnp.broadcast_to(c, (S,))
            for c in cs
        )

        def step_tv(carry, inp):
            xn, b0, b1, b2, a1, a2 = inp
            c1, c2 = carry
            yn = b0 * xn + c1
            n1 = b1 * xn - a1 * yn + c2
            n2 = b2 * xn - a2 * yn
            return (n1, n2), yn

        (s1, s2), yt = jax.lax.scan(step_tv, (s1, s2), (xt,) + cts,
                                    unroll=8)
        return jnp.moveaxis(yt, 0, -1), (s1, s2)

    b0, b1, b2, a1, a2 = cs

    def step(carry, xn):
        c1, c2 = carry
        yn = b0 * xn + c1
        n1 = b1 * xn - a1 * yn + c2
        n2 = b2 * xn - a2 * yn
        return (n1, n2), yn

    (s1, s2), yt = jax.lax.scan(step, (s1, s2), xt, unroll=8)
    return jnp.moveaxis(yt, 0, -1), (s1, s2)


# --------------------------------------------------------------------------
# one-pole with state: associative within fixed 64-blocks, serial across


def one_pole_stream(x, a, b, y0):
    """y[n] = a[n]*y[n-1] + b[n]*x[n] with y[-1] = y0; x: [..., S],
    S % 64 == 0. Returns (y, y_last). Op order is fixed per 64-block, so
    results are segmentation-invariant for 64-multiple segments."""
    B = STREAM_BLOCK
    n = x.shape[-1]
    assert n % B == 0
    nb = n // B
    shape = x.shape[:-1] + (nb, B)
    a = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape).reshape(shape)
    bx = (jnp.asarray(b, x.dtype) * x).reshape(shape)

    def combine(e1, e2):
        a1_, c1 = e1
        a2_, c2 = e2
        return (a2_ * a1_, a2_ * c1 + c2)

    # in-block: prefix (A, C) pairs over the 64 samples of every block
    A, C = jax.lax.associative_scan(combine, (a, bx), axis=-1)
    # cross-block: serial state propagation y_exit[b] = A[b,-1]*y_in + C[b,-1]
    A_blk = jnp.moveaxis(A[..., -1], -1, 0)   # [nb, ...]
    C_blk = jnp.moveaxis(C[..., -1], -1, 0)

    def cross(yc, ac):
        ab, cb = ac
        return ab * yc + cb, yc  # emit the state ENTERING block b

    y0b = jnp.broadcast_to(jnp.asarray(y0, x.dtype), A_blk[0].shape)
    y_last, y_entry = jax.lax.scan(cross, y0b, (A_blk, C_blk))
    y_entry = jnp.moveaxis(y_entry, 0, -1)    # [..., nb]
    y = C + A * y_entry[..., None]
    return y.reshape(x.shape), y_last


# --------------------------------------------------------------------------
# pure delay lines (exact: y[n] = x[n-D])


def delay_stream(x, hist):
    """y[n] = x[n-D] with D = hist.shape[-1] (the carried input tail).
    Returns (y, hist'). Exact at any segmentation."""
    d = hist.shape[-1]
    if d == 0:
        return x, hist
    z = jnp.concatenate([hist, x], axis=-1)
    n = x.shape[-1]
    return z[..., :n], z[..., -d:]


def delay_stream_automated(x, hist, delay_seconds_b, sample_rate: float,
                           cblock: int = STREAM_BLOCK):
    """Automated delay time over a segment: hist carries the last D_max
    input samples; y[n] = history[n - D(block(n))] by pure gather, so
    segmentation is bit-invisible (no arithmetic on the carried values).
    delay_seconds_b: this segment's block-rate curve [S/64]."""
    from groove_tpu.ops.iir import upsample_hold

    d_max = hist.shape[-1]
    n = x.shape[-1]
    z = jnp.concatenate([hist, x], axis=-1)
    d_b = jnp.round(jnp.asarray(delay_seconds_b, jnp.float32)
                    * sample_rate).astype(jnp.int32)
    d_up = jnp.minimum(upsample_hold(d_b, n, cblock), d_max)
    idx = jnp.arange(n, dtype=jnp.int32) + d_max - d_up
    y = jnp.take(z, idx, axis=-1)
    return y, z[..., -d_max:] if d_max else hist


def chorus_stream(x, hist, voices: int, total_delay: int, wet_dry_mix):
    """Multi-tap chorus over a segment (cf. delayfx.chorus): taps at
    v*total_delay//voices, tap 0 dry. hist: [..., total_delay] input tail."""
    voices = max(1, int(voices))
    d = hist.shape[-1]
    z = jnp.concatenate([hist, x], axis=-1)
    n = x.shape[-1]
    wet = jnp.zeros_like(x)
    for v in range(voices):
        dv = v * total_delay // voices
        wet = wet + jax.lax.dynamic_slice_in_dim(z, d - dv, n, axis=-1)
    wet = wet / voices
    y = x * (1.0 - wet_dry_mix) + wet * wet_dry_mix
    return y, (z[..., -d:] if d else hist)


def chorus_stream_automated(x, hist, voices, delay_seconds_b,
                            sample_rate: float, wet_dry_mix,
                            cblock: int = STREAM_BLOCK,
                            voices_b=None, max_voices=None):
    """chorus_stream with an automated total delay and/or tap count (cf.
    delayfx.chorus_automated): hist covers the delay curve's MAXIMUM
    length and every tap is a gather of concat(hist, x) masked by
    v < V(n) — no arithmetic on carried values, so segmentation is
    bit-invisible. delay_seconds_b / voices_b: this segment's block-rate
    curves [S/64] (delay_seconds_b may be a scalar when only `voices`
    is automated)."""
    from groove_tpu.ops.delayfx import chorus_tap_curves

    d = hist.shape[-1]
    n = x.shape[-1]
    z = jnp.concatenate([hist, x], axis=-1)
    d_up, v_up, n_taps = chorus_tap_curves(
        delay_seconds_b, voices, voices_b, max_voices, n, sample_rate,
        cblock)
    base = jnp.arange(n, dtype=jnp.int32) + d
    wet = jnp.zeros_like(x)
    for v in range(n_taps):
        dv = jnp.minimum((v * d_up) // v_up, d)
        active = (v < v_up).astype(x.dtype)
        wet = wet + jnp.take(z, base - dv, axis=-1) * active
    wet = wet / v_up.astype(x.dtype)
    y = x * (1.0 - wet_dry_mix) + wet * wet_dry_mix
    return y, (z[..., -d:] if d else hist)


# --------------------------------------------------------------------------
# feedback comb / all-pass with carried delay-line tails
#
# Chunked evaluation: the segment is processed in chunks of exactly D
# samples (the comb delay). Chunk c's output is elementwise in the lane
# dimension: y[t] = x[t-D] + g*y[t-D], where both operands live in chunk
# c-1 (chunk -1 = the carried history). One multiply-add per sample, in a
# serial lax.scan over ceil(S/D) chunks — identical floats per sample for
# any segmentation.


def _chunked(x, d: int):
    n = x.shape[-1]
    nc = -(-n // d)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, nc * d - n)]
    xp = jnp.pad(x, pad)
    return xp.reshape(x.shape[:-1] + (nc, d)), n


def _tail(hist, y_valid):
    """Last D valid samples: concat(history, segment)[-D:]."""
    d = hist.shape[-1]
    return jnp.concatenate([hist, y_valid], axis=-1)[..., -d:]


def comb_feedback_stream(x, hist_x, hist_y, g):
    """y[n] = x[n-D] + g*y[n-D]; hist_x/hist_y: [..., D] carried tails of
    the input/output. Returns (y, hist_x', hist_y')."""
    d = hist_x.shape[-1]
    xc, n = _chunked(x, d)
    nc = xc.shape[-2]
    # inputs to chunk c are x chunk c-1; chunk 0 uses the carried hist_x
    x_prev = jnp.concatenate(
        [hist_x[..., None, :], xc[..., :-1, :]], axis=-2
    )
    x_prev = jnp.moveaxis(x_prev, -2, 0)  # [nc, ..., d]

    def step(y_prev, xp):
        y = xp + g * y_prev
        return y, y

    _, yc = jax.lax.scan(step, hist_y, x_prev)
    y = jnp.moveaxis(yc, 0, -2).reshape(
        x.shape[:-1] + (nc * d,))[..., :n]
    return y, _tail(hist_x, x), _tail(hist_y, y)


def comb_feedback_stream_automated(x, hist_x, hist_y, g):
    """comb_feedback_stream with a PER-SAMPLE feedback coefficient g
    [..., n] (automated reverb RT60). Still one multiply-add per sample —
    y[n] = x[n-D] + g[n]·y[n-D] — and g comes from the absolute-position
    automation curve, so segmentation stays bit-invisible."""
    d = hist_x.shape[-1]
    g = jnp.broadcast_to(jnp.asarray(g, x.dtype), x.shape)
    xc, n = _chunked(x, d)
    gc, _ = _chunked(g, d)
    nc = xc.shape[-2]
    x_prev = jnp.concatenate(
        [hist_x[..., None, :], xc[..., :-1, :]], axis=-2
    )
    x_prev = jnp.moveaxis(x_prev, -2, 0)  # [nc, ..., d]
    gcs = jnp.moveaxis(gc, -2, 0)

    def step(y_prev, inp):
        xp, gch = inp
        y = xp + gch * y_prev
        return y, y

    _, yc = jax.lax.scan(step, hist_y, (x_prev, gcs))
    y = jnp.moveaxis(yc, 0, -2).reshape(
        x.shape[:-1] + (nc * d,))[..., :n]
    return y, _tail(hist_x, x), _tail(hist_y, y)


def allpass_stream(x, hist_w, g: float):
    """Schroeder all-pass, one-multiply form (cf. delayfx.allpass):
    w[n] = x[n] + g*w[n-D]; y[n] = -g*x[n] + (1-g^2)*w[n-D].
    hist_w: [..., D] carried tail of w. Returns (y, hist_w')."""
    d = hist_w.shape[-1]
    xc, n = _chunked(x, d)
    nc = xc.shape[-2]
    xcs = jnp.moveaxis(xc, -2, 0)  # [nc, ..., d]

    def step(w_prev, xch):
        w = xch + g * w_prev
        y = -g * xch + (1.0 - g * g) * w_prev
        return w, (y, w)

    _, (yc, wc) = jax.lax.scan(step, hist_w, xcs)
    y = jnp.moveaxis(yc, 0, -2).reshape(x.shape[:-1] + (nc * d,))[..., :n]
    w = jnp.moveaxis(wc, 0, -2).reshape(x.shape[:-1] + (nc * d,))[..., :n]
    return y, _tail(hist_w, w)


def reverb_stream(x, state: dict, attenuation, seconds: float,
                  sample_rate: float, prefix: str):
    """Schroeder reverb (delayfx.reverb topology) with carried delay-line
    tails. `state` holds f"{prefix}/comb{i}/x|y" and f"{prefix}/ap{i}/w"
    entries (see stream_state.reverb_state). Returns (y, new_entries)."""
    from groove_tpu.ops.delayfx import ALLPASS_DELAYS_S, ALLPASS_G, COMB_DELAYS_S

    new = {}
    combs = jnp.zeros_like(x)
    for i, d_s in enumerate(COMB_DELAYS_S):
        d = max(1, int(round(d_s * sample_rate)))
        g = 0.001 ** (d / (seconds * sample_rate)) if seconds > 0 else 0.0
        hx = state[f"{prefix}/comb{i}/x"]
        hy = state[f"{prefix}/comb{i}/y"]
        y, hx2, hy2 = comb_feedback_stream(x, hx, hy, g)
        new[f"{prefix}/comb{i}/x"] = hx2
        new[f"{prefix}/comb{i}/y"] = hy2
        combs = combs + y
    y = combs
    for i, d_s in enumerate(ALLPASS_DELAYS_S):
        hw = state[f"{prefix}/ap{i}/w"]
        y, hw2 = allpass_stream(y, hw, ALLPASS_G)
        new[f"{prefix}/ap{i}/w"] = hw2
    return attenuation * y, new


def reverb_stream_automated(x, state: dict, attenuation, seconds_b,
                            sample_rate: float, prefix: str,
                            cblock: int = STREAM_BLOCK):
    """reverb_stream with an automated `seconds` curve (cf.
    delayfx.reverb_automated): comb gains follow the block-rate curve at
    the 64-sample control cadence; the all-pass diffusers keep their
    static g. seconds_b: this segment's block-rate curve [S/64]."""
    from groove_tpu.ops.delayfx import (
        ALLPASS_DELAYS_S, ALLPASS_G, COMB_DELAYS_S, reverb_comb_g,
    )

    n = x.shape[-1]
    sec_s = iir.upsample_hold(
        jnp.asarray(seconds_b, jnp.float32), n, cblock)
    new = {}
    combs = jnp.zeros_like(x)
    for i, d_s in enumerate(COMB_DELAYS_S):
        d = max(1, int(round(d_s * sample_rate)))
        g = reverb_comb_g(sec_s, d, sample_rate)
        hx = state[f"{prefix}/comb{i}/x"]
        hy = state[f"{prefix}/comb{i}/y"]
        y, hx2, hy2 = comb_feedback_stream_automated(x, hx, hy, g)
        new[f"{prefix}/comb{i}/x"] = hx2
        new[f"{prefix}/comb{i}/y"] = hy2
        combs = combs + y
    y = combs
    for i, d_s in enumerate(ALLPASS_DELAYS_S):
        hw = state[f"{prefix}/ap{i}/w"]
        y, hw2 = allpass_stream(y, hw, ALLPASS_G)
        new[f"{prefix}/ap{i}/w"] = hw2
    return attenuation * y, new


# --------------------------------------------------------------------------
# envelope follower / smoothed compressor with state


def max_decay_stream(x, r, y0):
    """Peak hold with exponential release: y[n] = max(x[n], r[n]*y[n-1]),
    y[-1] = y0. x: [..., S], S % 64 == 0; fixed-64-grid op order like
    one_pole_stream, so results are segmentation-invariant. Returns
    (y, y_last)."""
    B = STREAM_BLOCK
    n = x.shape[-1]
    assert n % B == 0
    nb = n // B
    shape = x.shape[:-1] + (nb, B)
    v = x.reshape(shape)
    p = jnp.broadcast_to(jnp.asarray(r, x.dtype), x.shape).reshape(shape)

    def combine(e1, e2):
        v1, p1 = e1
        v2, p2 = e2
        return (jnp.maximum(v2, v1 * p2), p1 * p2)

    V, P = jax.lax.associative_scan(combine, (v, p), axis=-1)
    V_blk = jnp.moveaxis(V[..., -1], -1, 0)   # [nb, ...]
    P_blk = jnp.moveaxis(P[..., -1], -1, 0)

    def cross(yc, vp):
        vb, pb = vp
        return jnp.maximum(vb, pb * yc), yc   # emit the ENTERING state

    y0b = jnp.broadcast_to(jnp.asarray(y0, x.dtype), V_blk[0].shape)
    y_last, y_entry = jax.lax.scan(cross, y0b, (V_blk, P_blk))
    y_entry = jnp.moveaxis(y_entry, 0, -1)    # [..., nb]
    y = jnp.maximum(V, P * y_entry[..., None])
    return y.reshape(x.shape), y_last


def follower_stream(x, attack_s, release_s, sample_rate, st_env, st_peak):
    """Decoupled peak detector (ops/dynamics.envelope_follower semantics)
    with carried states: release-rate peak hold (max_decay_stream), then
    attack-rate one-pole smoothing. attack_s/release_s: scalars or [S]
    arrays. Returns (env, st_env', st_peak')."""
    from groove_tpu.ops.dynamics import _follower_coef

    mag = jnp.abs(x)
    r = _follower_coef(release_s, sample_rate)
    peak, st_peak2 = max_decay_stream(mag, r, st_peak)
    a_att = _follower_coef(attack_s, sample_rate)
    env, st_env2 = one_pole_stream(peak, a_att, 1.0 - a_att, st_env)
    return env, st_env2, st_peak2


def compressor_smoothed_stream(x, threshold, ratio, attack_s, release_s,
                               sample_rate, st_env, st_peak):
    env, st_env2, st_peak2 = follower_stream(
        x, attack_s, release_s, sample_rate, st_env, st_peak
    )
    over = env > threshold
    target = threshold + (env - threshold) * ratio
    g = jnp.where(over, target / jnp.maximum(env, 1e-9), 1.0)
    return x * g, st_env2, st_peak2


# --------------------------------------------------------------------------
# defect-correction refinement, streaming form (ops/iir.biquad_blockrate_
# refined with carried histories — same recurrence/defect algebra, see its
# docstring; segmentation-invariant because the solver runs on the fixed
# 64-grid and the defect is elementwise with exact 2-sample histories)


def refined_state_init(batch_shape, coef_batch=()):
    """Zero state for biquad_stream_refined: solver TDF2 state, correction
    TDF2 state, 2-sample input/output histories, 2-sample histories of the
    (b1, b2, a1, a2) per-sample coefficient streams. coef_batch: leading
    batch dims of the coefficient arrays — () for coefs [S] shared across
    rows (the effect filters), (n,) for per-row coefs [n, S] (the sliced
    welsh cascade, where every note carries its own envelope-driven
    denominators)."""
    z = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    b = tuple(batch_shape)
    return {
        "ss1": z(*b), "ss2": z(*b), "cs1": z(*b), "cs2": z(*b),
        "xh": z(*b, 2), "yh": z(*b, 2), "ch": z(4, *coef_batch, 2),
    }


def _roll_hist(v, hist, k: int):
    """Shift right along the last axis by k, filling from carried history
    (hist[..., -k:] are the k samples immediately before this segment)."""
    return jnp.concatenate([hist[..., -k:], v[..., :-k]], axis=-1)


def biquad_stream_refined(x, coefs, st: dict):
    """One biquad section with per-sample coefficients + the
    defect-correction pass, segment-streamed. x: [..., S]; coefs entries
    [S] (shared across batch rows) or [n, S] (per-row, e.g. per-note
    envelope-driven denominators — pass coef_batch=(n,) to
    refined_state_init); st from refined_state_init. Returns (y, st')."""
    b0, b1, b2, a1, a2 = [jnp.asarray(c, jnp.float32) for c in coefs]
    y0, (ss1, ss2) = biquad_stream(x, coefs, (st["ss1"], st["ss2"]))
    b1s = _roll_hist(b1, st["ch"][0], 1)
    b2s = _roll_hist(b2, st["ch"][1], 2)
    a1s = _roll_hist(a1, st["ch"][2], 1)
    a2s = _roll_hist(a2, st["ch"][3], 2)
    x1 = _roll_hist(x, st["xh"], 1)
    x2 = _roll_hist(x, st["xh"], 2)
    y1v = _roll_hist(y0, st["yh"], 1)
    y2v = _roll_hist(y0, st["yh"], 2)
    e1 = a1s + 2.0   # exact for near-critical a1 (Sterbenz)
    e2 = a2s - 1.0
    second = (y0 - y1v) - (y1v - y2v)
    d = (b0 * x + b1s * x1 + b2s * x2) - second - e1 * y1v - e2 * y2v
    ones = jnp.ones_like(a1)
    zeros = jnp.zeros_like(a1)
    c, (cs1, cs2) = biquad_stream(
        d, (ones, zeros, zeros, a1, a2), (st["cs1"], st["cs2"]))
    st2 = {
        "ss1": ss1, "ss2": ss2, "cs1": cs1, "cs2": cs2,
        "xh": x[..., -2:], "yh": y0[..., -2:],
        "ch": jnp.stack([b1[..., -2:], b2[..., -2:],
                         a1[..., -2:], a2[..., -2:]]),
    }
    return y0 + c, st2

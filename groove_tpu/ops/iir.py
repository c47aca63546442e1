"""Parallel IIR filtering on TPU.

The reference evaluates biquads sample-serially inside its per-sample entity
loop (orchestration/src/orchestrator.rs:367-470; DSP bodies missing at HEAD,
algorithms specified by doc/Audio-EQ-Cookbook.txt and doc/filters004.txt).
A per-sample Python/XLA loop would be ~10^5 sequential steps; instead we
exploit that a biquad is a *linear* 2-state recurrence:

    state s[n] = A[n] @ s[n-1] + c[n]         (affine map per sample)
    y[n]       = b0[n] x[n] + s1[n-1]         (transposed direct form II)

Affine maps compose, so the whole filter — even with *per-sample
time-varying coefficients* (filter-cutoff automation, Welsh filter
envelopes) — runs as a two-level blocked scheme: serial in-block prefix
maps batched over all blocks at once, plus a serial cross-block state
scan (sequential depth block + n/block, not n). A pure
`associative_scan` doubling formulation was measured to DIVERGE in f32
at low cutoffs (see biquad's docstring), which is why both levels stay
serial; fidelity corners additionally route through a per-sample serial
scan or a defect-correction pass (see biquad_best / the `fidelity`
params). This is the TPU-native replacement for the reference's stateful
`transform_audio` chain.

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


BIQUAD_BLOCK = 256


def block_for(n: int, max_block: int = 128) -> int:
    """In-block length for the two-level serial scheme, ~sqrt(n) clamped to
    [16, max_block]: total serial depth is block + n/block. Shared by the
    XLA path (biquad(block=None)) and the Pallas kernels so the two paths
    group the recurrence identically — bit-identical results on TPU."""
    b = 16
    while b < max_block and b * b < n:
        b *= 2
    return b


def biquad(x: jax.Array, coefs, axis: int = -1, block: int | None = None,
           initial_state=None, return_state: bool = False):
    """Apply one biquad section along `axis` (zero initial state).

    coefs: tuple (b0, b1, b2, a1, a2), normalized (a0 == 1). Each entry is a
    scalar or an array broadcastable against `x` (per-sample coefficients
    for time-varying filters).

    Numerics (measured, not hypothetical): computing prefix products of the
    per-sample affine maps with `associative_scan` doubling diverges in f32
    for low cutoffs — each combine amplifies *absolute* error by the range
    product's norm (~1/sin(w0)) in one shot, while a serial recurrence's
    roundoff follows the filter's own contracting dynamics and stays
    bounded (observed: inf for a 25 Hz cutoff over 10^5 samples; -94 dB
    for the serial form below). So both levels run as serial scans, laid
    out for parallel hardware:

      1. *in-block* prefix maps P[j] = A_j...A_0 over `block` samples:
         one lax.scan of `block` steps whose body is elementwise over all
         blocks at once — the time axis is folded into [n/block, block] so
         the sequential length is `block`, not n;
      2. *cross-block* state propagation: lax.scan over n/block steps of a
         2x2 affine map per batch element.

    Total sequential depth: block + n/block (~900 for a 165k-sample song)
    instead of n (~165k) for the naive per-sample loop.

    initial_state: optional (s1, s2) TDF2 state entering sample 0 (each
    broadcastable to x's batch shape) — used for segment/stream handoff
    (time-sharded rendering, parallel/timeshard.py).
    return_state: also return (s1, s2) exiting the last sample, plus the
    segment transition matrix (m11, m12, m21, m22) mapping entry state to
    exit state, so segments compose exactly across devices.
    """
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    if block is None:
        block = block_for(n)
    dtype = x.dtype
    b0, b1, b2, a1, a2 = [
        jnp.broadcast_to(jnp.asarray(c, dtype), x.shape) for c in coefs
    ]
    nb = -(-n // block)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, nb * block - n)]
    xp = jnp.pad(x, pad)
    b0p, a1p, a2p = jnp.pad(b0, pad), jnp.pad(a1, pad), jnp.pad(a2, pad)
    b1p, b2p = jnp.pad(b1, pad), jnp.pad(b2, pad)
    shape = x.shape[:-1] + (nb, block)
    xb = xp.reshape(shape)
    na1 = (-a1p).reshape(shape)
    na2 = (-a2p).reshape(shape)
    c1 = ((b1p - a1p * b0p) * xp).reshape(shape)
    c2 = ((b2p - a2p * b0p) * xp).reshape(shape)

    # 1) in-block prefix maps, serial over the block axis, batched over
    #    [..., nb]: carry (P, cl), stack every step's prefix.
    # derive from the input so scan carries inherit its sharding/vma type
    ones = jnp.ones_like(xb[..., 0])
    zeros = jnp.zeros_like(xb[..., 0])

    def in_block_step(carry, xs):
        p11, p12, p21, p22, q1, q2 = carry
        na1j, na2j, c1j, c2j = xs
        # compose A_j after P: A_j = [[na1j, 1], [na2j, 0]]
        n11 = na1j * p11 + p21
        n12 = na1j * p12 + p22
        n21 = na2j * p11
        n22 = na2j * p12
        r1 = na1j * q1 + q2 + c1j
        r2 = na2j * q1 + c2j
        new = (n11, n12, n21, n22, r1, r2)
        return new, new

    xs = tuple(jnp.moveaxis(t, -1, 0) for t in (na1, na2, c1, c2))
    init = (ones, zeros, zeros, ones, zeros, zeros)
    _, stacked = jax.lax.scan(in_block_step, init, xs, unroll=8)
    # stacked: 6 arrays of [block, ..., nb]
    P11, P12, P21, P22, cl1, cl2 = stacked

    # 2) cross-block state propagation (serial, tiny): S_{b+1} = M_b S_b + C_b
    Mxs = tuple(jnp.moveaxis(t[-1], -1, 0) for t in stacked)  # [nb, ...]

    def cross_step(S, xs_b):
        m11, m12, m21, m22, cb1, cb2 = xs_b
        s1, s2 = S
        n1 = m11 * s1 + m12 * s2 + cb1
        n2 = m21 * s1 + m22 * s2 + cb2
        return (n1, n2), S  # emit the PRE-state (state entering block b)

    zero_state = jnp.zeros_like(Mxs[0][0])
    if initial_state is not None:
        s1_0 = jnp.broadcast_to(jnp.asarray(initial_state[0], dtype),
                                zero_state.shape)
        s2_0 = jnp.broadcast_to(jnp.asarray(initial_state[1], dtype),
                                zero_state.shape)
        entry = (s1_0, s2_0)
    else:
        entry = (zero_state, zero_state)
    (exit1, exit2), S_pre = jax.lax.scan(cross_step, entry, Mxs, unroll=4)
    # S_pre: 2-tuple? lax.scan stacks the emitted tuple -> tuple of [nb, ...]
    S1 = jnp.moveaxis(S_pre[0], 0, -1)  # [..., nb]
    S2 = jnp.moveaxis(S_pre[1], 0, -1)

    # 3) combine: s_prev at local j = P[j-1] S_b + cl[j-1] (identity at j=0)
    def shift_block(arr, fill):  # arr: [block, ..., nb]
        return jnp.concatenate(
            [jnp.full_like(arr[:1], fill), arr[:-1]], axis=0
        )

    Q11 = shift_block(P11, 1.0)
    Q12 = shift_block(P12, 0.0)
    d1 = shift_block(cl1, 0.0)
    s1_prev = Q11 * S1[None] + Q12 * S2[None] + d1       # [block, ..., nb]
    s1_prev = jnp.moveaxis(s1_prev, 0, -1)               # [..., nb, block]
    y = (b0p.reshape(shape) * xb + s1_prev).reshape(xp.shape)[..., :n]
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    if not return_state:
        return y
    # segment transition (homogeneous part): product of block transitions
    assert n % block == 0, "return_state needs n to be a block multiple"

    def mat_step(M, xs_b):
        m11, m12, m21, m22, _, _ = xs_b
        a, b_, c_, d_ = M
        return (m11 * a + m12 * c_, m11 * b_ + m12 * d_,
                m21 * a + m22 * c_, m21 * b_ + m22 * d_), None

    ident = (jnp.ones_like(zero_state), jnp.zeros_like(zero_state),
             jnp.zeros_like(zero_state), jnp.ones_like(zero_state))
    M_seg, _ = jax.lax.scan(mat_step, ident, Mxs, unroll=4)
    return y, (exit1, exit2), M_seg


USE_PALLAS = None  # None = auto (TPU only); True/False to force


def _pallas_available() -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def biquad_serial(x: jax.Array, coefs, axis: int = -1,
                  initial_state=None, return_state: bool = False):
    """Per-sample TDF2 lax.scan in f32 — the numerically safest
    formulation: roundoff follows the filter's own contracting dynamics
    (measured -94 dBFS at the 25 Hz corner over 1e5 samples, vs -84 for
    the blocked two-level scheme whose in-block prefix products of
    near-identity maps lose ~10 dB; -101 dBFS on the automated 25 Hz->
    20 kHz sweep where the blocked scheme reaches only -60). O(n)
    sequential — reserved for near-critical poles, where fidelity beats
    throughput.

    coefs entries may be scalars or per-sample arrays broadcastable to
    x's shape (time-varying coefficients). initial_state/return_state
    carry the TDF2 state across segments exactly."""
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    per_sample = any(jnp.ndim(c) > 0 for c in coefs)
    coefs = [jnp.asarray(c, x.dtype) for c in coefs]
    xt = jnp.moveaxis(x, -1, 0)  # [n, ...]
    zeros = jnp.zeros_like(xt[0])
    if initial_state is not None:
        s1_0 = jnp.broadcast_to(jnp.asarray(initial_state[0], x.dtype),
                                zeros.shape)
        s2_0 = jnp.broadcast_to(jnp.asarray(initial_state[1], x.dtype),
                                zeros.shape)
    else:
        s1_0, s2_0 = zeros, zeros

    if per_sample:
        cb = [jnp.moveaxis(jnp.broadcast_to(c, x.shape), -1, 0)
              for c in coefs]

        def step_tv(carry, xs):
            s1, s2 = carry
            xn, b0, b1, b2, a1, a2 = xs
            yn = b0 * xn + s1
            s1n = b1 * xn - a1 * yn + s2
            s2n = b2 * xn - a2 * yn
            return (s1n, s2n), yn

        (s1e, s2e), yt = jax.lax.scan(
            step_tv, (s1_0, s2_0), (xt, *cb), unroll=8)
    else:
        b0, b1, b2, a1, a2 = coefs

        def step(carry, xn):
            s1, s2 = carry
            yn = b0 * xn + s1
            s1n = b1 * xn - a1 * yn + s2
            s2n = b2 * xn - a2 * yn
            return (s1n, s2n), yn

        (s1e, s2e), yt = jax.lax.scan(step, (s1_0, s2_0), xt, unroll=8)
    y = jnp.moveaxis(yt, 0, -1)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    if return_state:
        return y, (s1e, s2e)
    return y


# Poles this close to z = 1 (cutoff below ~100 Hz at 44.1 kHz) lose ~10 dB
# through the blocked scheme's prefix products; route static cases serial.
_CRITICAL_A1 = -1.98
_CRITICAL_A2 = 0.975
# Plan thresholds are WIDER than the static ones: on the 25 Hz -> 20 kHz
# sweep, flagging only a1 < -1.98 left the just-under-threshold blocks at
# -79.4 dBFS; -1.95/0.95 measures -92.7 (sweep fidelity test).
_PLAN_A1 = -1.95
_PLAN_A2 = 0.95


def _near_critical_static(coefs) -> bool:
    """True when coefficients are compile-time scalars with poles near
    z = 1. Traced values return False (can't branch on them)."""
    try:
        a1 = float(coefs[3])
        a2 = float(coefs[4])
    except Exception:
        return False
    return a1 < _CRITICAL_A1 and a2 > _CRITICAL_A2


def _near_refinable_static(coefs) -> bool:
    """Static poles in the band between the plan thresholds and the
    serial thresholds: high-q resonant filters (measured: 1 kHz q=20 is
    -78.6 dBFS through the blocked scheme — a1 -1.973, a2 0.993 — while
    the serial corner check doesn't fire). These get the parallel
    defect-correction pass instead of the serial scan."""
    try:
        a1 = float(coefs[3])
        a2 = float(coefs[4])
    except Exception:
        return False
    return a1 < _PLAN_A1 and a2 > _PLAN_A2


def biquad_best(x: jax.Array, coefs, axis: int = -1) -> jax.Array:
    """biquad via the Pallas kernel on TPU (bit-identical to the XLA
    blocked scan), the blocked scan elsewhere. Fidelity dispatch for the
    -80 dBFS bar: static near-critical poles (deep corner) take the
    serial scan; the refinable band (high-q resonances) takes the
    parallel defect-correction pass."""
    if _near_critical_static(coefs):
        return biquad_serial(x, coefs, axis=axis)
    if axis == -1 and _near_refinable_static(coefs):
        return biquad_blockrate_refined(x, coefs)
    if axis == -1 and _pallas_available():
        from groove_tpu.ops.pallas_iir import biquad_pallas
        return biquad_pallas(x, coefs)
    return biquad(x, coefs, axis=axis)


CONTROL_BLOCK = 64  # the reference's handle_work cadence (SAMPLE_BUFFER_SIZE)


def upsample_hold(c, n: int, cblock: int = CONTROL_BLOCK):
    """Block-rate values [..., nb] -> per-sample [..., n] by zero-order hold
    (broadcast+reshape — jnp.repeat lowers to a slow gather on TPU)."""
    c = jnp.asarray(c)
    nb = c.shape[-1]
    out = jnp.broadcast_to(c[..., None], c.shape + (cblock,))
    return out.reshape(c.shape[:-1] + (nb * cblock,))[..., :n]


def needs_refinement(a1_b, a2_b) -> bool:
    """Host-side check for an AUTOMATED filter whose block-rate
    denominators are known at compile time (automation curves are host
    data): True when any block's poles are near z = 1, where the blocked
    scheme's f32 prefix products lose accuracy (measured -60 dBFS on the
    25 Hz -> 20 kHz sweep). Such filters add one defect-correction pass
    (biquad_blockrate_refined): -87.8 dBFS on the same sweep, still fully
    parallel. The threshold is WIDER than the static-serial one: flagging
    only a1 < -1.98 left just-under-threshold blocks at -79.4."""
    import numpy as np

    a1 = np.asarray(a1_b, np.float64)
    a2 = np.asarray(a2_b, np.float64)
    return bool(((a1 < _PLAN_A1) & (a2 > _PLAN_A2)).any())


def _roll0(v, k: int):
    """Shift right along the last axis with zero history."""
    if k == 0:
        return v
    pad = [(0, 0)] * (v.ndim - 1) + [(k, 0)]
    return jnp.pad(v, pad)[..., :-k]


def _blockrate_fast(x, coefs_full, cblock: int):
    """The fast block-rate dispatch: Pallas on TPU, the blocked scan with
    identical grouping elsewhere. coefs_full broadcast to
    x.shape[:-1] + (nb,)."""
    n = x.shape[-1]
    if _pallas_available():
        from groove_tpu.ops.pallas_iir import biquad_blockrate_pallas
        return biquad_blockrate_pallas(x, coefs_full, cblock)
    coefs = tuple(upsample_hold(c, n, cblock) for c in coefs_full)
    return biquad(x, coefs, block=max(block_for(n), cblock))


def _solve_chunked(x, coefs_up, chunks: int, block: int):
    """Exact blocked solve with the TIME axis split into `chunks`
    independent rows (row packing): pass 1 solves every chunk from zero
    entry state and returns each chunk's exit state + 2x2 transition
    (biquad return_state); a tiny `chunks`-step scan composes the exact
    entry states; pass 2 re-solves with them. 2x the FLOPs, but the
    serial phases (in-block scan + cross-block scan) shorten by `chunks`
    — the win when few rows leave the dependency chains latency-bound
    (the [2, n] master-bus cascade: measured 4779x realtime fused-kernel
    refined vs 7430x unrefined on the north star; see
    lp24_apply_blockrate).

    x: [..., n]; coefs_up: 5-tuple of [..., n] per-sample arrays.
    n is padded up to a chunks*block multiple (x with zeros, coefficients
    by edge) and the result trimmed."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    L = -(-n // (chunks * block)) * block
    n_pad = chunks * L

    def prep(a, edge):
        a = jnp.broadcast_to(a, lead + (n,)).reshape(R, n)
        if n_pad > n:
            pad_val = a[:, -1:] if edge else jnp.zeros_like(a[:, -1:])
            a = jnp.concatenate(
                [a, jnp.broadcast_to(pad_val, (R, n_pad - n))], axis=-1)
        return a.reshape(R * chunks, L)

    xc = prep(x, edge=False)
    cc = tuple(prep(c, edge=True) for c in coefs_up)
    _, (e1, e2), (m11, m12, m21, m22) = biquad(
        xc, cc, block=block, return_state=True)

    def cr(a):  # [R*chunks] -> [chunks, R]
        return a.reshape(R, chunks).T

    def compose(S, per):
        m11c, m12c, m21c, m22c, c1c, c2c = per
        s1, s2 = S
        return (m11c * s1 + m12c * s2 + c1c,
                m21c * s1 + m22c * s2 + c2c), S  # emit the ENTRY state

    zero = jnp.zeros((R,), x.dtype)
    _, entries = jax.lax.scan(
        compose, (zero, zero),
        tuple(cr(a) for a in (m11, m12, m21, m22, e1, e2)))
    ent1 = entries[0].T.reshape(R * chunks)
    ent2 = entries[1].T.reshape(R * chunks)
    y = biquad(xc, cc, block=block, initial_state=(ent1, ent2))
    return y.reshape(R, n_pad)[:, :n].reshape(lead + (n,))


def biquad_blockrate_refined(x, coefs_b, cblock: int = CONTROL_BLOCK,
                             chunks: int | None = None):
    """Blocked solve + ONE defect-correction pass, for automated filters
    that sweep through near-critical poles.

    The blocked two-level scheme's error at poles near z = 1 comes from
    f32 prefix products of near-identity maps (-60 dBFS on the 25 Hz ->
    20 kHz sweep). Instead of serializing (a 165k-step lax.scan measured
    143 ms on TPU — 400x the whole render), refine: the TDF2 engine with
    time-varying coefficients realizes

        y[n] = b0[n] x[n] + b1[n-1] x[n-1] + b2[n-2] x[n-2]
                         - a1[n-1] y[n-1] - a2[n-2] y[n-2]

    (coefficients indexed at state-ENTRY time — the defect MUST use this
    shifted form, the plain DF1 indexing reads 0.005 of false defect).
    Compute the per-sample defect d of y0 against that recurrence, solve
    L(c) = d with the same fast engine (numerator (1,0,0) keeps it
    block-rate aligned), and return y0 + c. The defect is evaluated in an
    epsilon-regrouped form — second difference of the smooth output plus
    (a1+2)/(a2-1) products — so its f32 rounding stays relative to the
    (tiny) defect rather than to |y|, which a resonant correction filter
    would amplify ~1e5x. Cost: 2x the blocked solve + elementwise, fully
    parallel. Measured -87.8 dBFS on the sweep (tests/test_iir.py)."""
    n = x.shape[-1]
    nb = -(-n // cblock)
    cshape = x.shape[:-1] + (nb,)
    cb_f = tuple(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape)
        for c in coefs_b
    )
    b0u, b1u, b2u, a1u, a2u = (upsample_hold(c, n, cblock) for c in cb_f)
    if chunks:
        # row-packed solves (few-row latency-bound case, _solve_chunked)
        coefs_up = (b0u, b1u, b2u, a1u, a2u)
        y0 = _solve_chunked(x, coefs_up, chunks, cblock)
    else:
        y0 = _blockrate_fast(x, cb_f, cblock)
    b1s, b2s = _roll0(b1u, 1), _roll0(b2u, 2)
    a1s, a2s = _roll0(a1u, 1), _roll0(a2u, 2)
    y1v, y2v = _roll0(y0, 1), _roll0(y0, 2)
    e1 = a1s + 2.0   # exact in f32 for near-critical a1 (Sterbenz)
    e2 = a2s - 1.0
    second = (y0 - y1v) - (y1v - y2v)   # nearly exact: y0 is smooth there
    d = (b0u * x + b1s * _roll0(x, 1) + b2s * _roll0(x, 2)) \
        - second - e1 * y1v - e2 * y2v
    if chunks:
        ones_u = jnp.ones_like(a1u)
        zeros_u = jnp.zeros_like(a1u)
        c = _solve_chunked(d, (ones_u, zeros_u, zeros_u, a1u, a2u),
                           chunks, cblock)
        return y0 + c
    ones_b = jnp.ones(cshape, jnp.float32)
    zeros_b = jnp.zeros(cshape, jnp.float32)
    c = _blockrate_fast(d, (ones_b, zeros_b, zeros_b, cb_f[3], cb_f[4]),
                        cblock)
    return y0 + c


def biquad_blockrate(x: jax.Array, coefs_b, cblock: int = CONTROL_BLOCK,
                     fidelity=None):
    """Biquad with BLOCK-RATE coefficients (held for cblock samples — the
    reference recomputes filter coefficients at 64-frame control
    granularity, orchestrator.rs:631-708). coefs_b entries broadcast
    against x.shape[:-1] + (ceil(n/cblock),). Pallas on TPU; on other
    backends the coefs are upsampled and run through the blocked scan with
    the same grouping, so results are bit-identical.

    fidelity: None | "refine" | "serial" — the HOST-side routing decision
    (engine/render.compute_filter_fidelity). It must be passed in:
    coefficients are tracers inside the compiled program, so the
    `_near_critical_static` checks below can only fire for EAGER calls
    (the ops-level tests); in-graph they are inert by construction."""
    n = x.shape[-1]
    if fidelity == "serial":
        if any(jnp.ndim(c) > 0 for c in coefs_b):
            coefs_b = tuple(
                upsample_hold(jnp.broadcast_to(
                    jnp.asarray(c, jnp.float32),
                    x.shape[:-1] + (-(-n // cblock),)), n, cblock)
                for c in coefs_b)
        return biquad_serial(x, coefs_b)
    if fidelity == "refine":
        return biquad_blockrate_refined(x, coefs_b, cblock)
    if all(jnp.ndim(c) == 0 for c in coefs_b):
        # static filter: no block-rate machinery needed (eager callers
        # also get the fidelity dispatch inside biquad_best)
        return biquad_best(x, coefs_b)
    nb = -(-n // cblock)
    cshape = x.shape[:-1] + (nb,)
    cb_f = tuple(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape)
        for c in coefs_b
    )
    return _blockrate_fast(x, cb_f, cblock)


def lp24_apply_blockrate(x, cutoff_b, q_b, sample_rate,
                         cblock: int = CONTROL_BLOCK, fidelity=None):
    """24 dB cascade with block-rate cutoff/q ([..., ceil(n/cblock)] or
    scalar). The per-sample gain (x * gain) is applied identically on both
    paths; the fused Pallas kernel then runs both sections in VMEM."""
    n = x.shape[-1]
    if jnp.ndim(cutoff_b) == 0 and jnp.ndim(q_b) == 0:
        # static cascade; fidelity is the HOST routing decision (tracer
        # coefficients make the _near_*_static checks inert in-graph —
        # they still serve eager ops-level callers)
        gain_s, secs_s = lp24_sections(cutoff_b, q_b, sample_rate)
        y = x * gain_s
        if fidelity == "serial" \
                or all(_near_critical_static(s) for s in secs_s):
            for sec in secs_s:
                y = biquad_serial(y, sec)
            return y
        if fidelity == "refine" \
                or any(_near_refinable_static(s) for s in secs_s):
            # high-q resonance band: parallel defect correction
            for sec in secs_s:
                y = biquad_blockrate_refined(y, sec, cblock)
            return y
        if _pallas_available():
            from groove_tpu.ops.pallas_iir import lp24_cascade_pallas
            return lp24_cascade_pallas(y, secs_s)
        for sec in secs_s:
            y = biquad(y, sec)
        return y
    nb = -(-n // cblock)
    cshape = x.shape[:-1] + (nb,)
    cutoff_b = jnp.broadcast_to(jnp.asarray(cutoff_b, jnp.float32), cshape)
    gain_b, sections_b = lp24_sections(cutoff_b, q_b, sample_rate)
    return lp24_apply_blockrate_sections(x, gain_b, sections_b,
                                         cblock=cblock, fidelity=fidelity)


def lp24_apply_blockrate_sections(x, gain_b, sections_b,
                                  cblock: int = CONTROL_BLOCK,
                                  fidelity=None):
    """24 dB cascade from PRECOMPUTED block-rate coefficients: gain_b and
    each section coefficient broadcast against x.shape[:-1] + (nb,).

    This is the determinism-critical entry: the engines compute the
    coefficient tables HOST-side in numpy f32 (welsh.host_filter_tables /
    the effect collectors) so the bits are backend-independent data —
    the TPU's traced tan/exp round ~1e-5-relative differently from eager
    evaluation, and near-critical lp24 poles amplify that to -70 dBFS
    song-level (the round-4 on-chip fidelity miss). lp24_apply_blockrate
    delegates here after computing sections from (cutoff, q)."""
    n = x.shape[-1]
    nb = -(-n // cblock)
    cshape = x.shape[:-1] + (nb,)
    gain_b = jnp.broadcast_to(jnp.asarray(gain_b, jnp.float32), cshape)
    sections_b = [tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape)
                        for c in sec)
                  for sec in sections_b]
    y = x * upsample_hold(gain_b, n, cblock)
    if fidelity == "serial" and not _pallas_available():
        # Deep-corner PARKED cascade on the test (non-Pallas) backend:
        # the refined fallback under-converges there (section A's output
        # is f32 noise, section B's resonance amplifies it: measured
        # -24 dBFS vs f64 at 25 Hz q 5.33, while the strict per-sample
        # serial scan reads -79). The fused TPU kernel handles the same
        # corner at -95 and never takes this branch
        # (welsh.filter_fidelity_mode routes host-side).
        for sec in sections_b:
            coefs = tuple(upsample_hold(jnp.broadcast_to(
                jnp.asarray(c, jnp.float32), cshape), n, cblock)
                for c in sec)
            y = biquad_serial(y, coefs)
        return y
    if fidelity in ("refine", "serial"):
        # "serial" with Pallas available: the fused refined kernel is the
        # accuracy reference at the deep corner (-95 dBFS on-chip)
        if _pallas_available():
            rows = int(np.prod(y.shape[:-1])) if y.ndim > 1 else 1
            if rows <= 4 and n >= 16 * 4096:
                # FEW rows (the [2, n] master-bus cascade): the fused
                # kernel's serial phases run latency-bound, so the
                # row-packed two-pass refined solves win (measured: the
                # north star's refined pass cost the headline 7430x ->
                # 4779x; chunking recovers most of it)
                for sec in sections_b:
                    y = biquad_blockrate_refined(y, sec, cblock, chunks=16)
                return y
            # fused kernel: both sections' solve+defect+correction in one
            # launch with the correction reusing the solve prefix rows —
            # the 4-launch XLA formulation measured 2.4x the unrefined
            # cascade on the welsh-heavy SMF workload
            from groove_tpu.ops.pallas_iir import lp24_refined_blockrate_pallas
            return lp24_refined_blockrate_pallas(y, sections_b, cblock)
        for sec in sections_b:
            y = biquad_blockrate_refined(y, sec, cblock)
        return y
    if _pallas_available():
        from groove_tpu.ops.pallas_iir import lp24_blockrate_pallas
        return lp24_blockrate_pallas(y, sections_b, cblock)
    block = max(block_for(n), cblock)
    for sec in sections_b:
        coefs = tuple(upsample_hold(jnp.broadcast_to(
            jnp.asarray(c, jnp.float32), cshape), n, cblock) for c in sec)
        y = biquad(y, coefs, block=block)
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
#
# BACKEND-GENERIC: numpy inputs evaluate with numpy (f32), tracers/jnp
# arrays with jnp. Host-side fidelity planning (compute_filter_fidelity,
# welsh.filter_fidelity_mode) calls these with numpy — on this machine's
# tunnel-attached TPU, eager jnp evaluation cost a remote compile per
# tiny op (~240 s of renderer init for an 8-channel SMF).


def _coef_ns(*vals):
    """numpy for host (numpy/python) inputs, jnp when anything is traced."""
    import numpy as _np
    for v in vals:
        if not isinstance(v, (int, float, _np.ndarray, _np.floating,
                              _np.integer)):
            return jnp
    return _np


def _norm(b0, b1, b2, a0, a1, a2):
    return (b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def _w0(cutoff, sample_rate, ns=jnp):
    return 2.0 * ns.pi * cutoff / sample_rate


def _f32(ns, *vals):
    return tuple(ns.asarray(v, ns.float32) for v in vals)


def rbj_low_pass(cutoff, q, sample_rate):
    ns = _coef_ns(cutoff, q)
    cutoff, q = _f32(ns, cutoff, q)
    w0 = _w0(cutoff, sample_rate, ns)
    cw, sw = ns.cos(w0), ns.sin(w0)
    alpha = sw / (2.0 * q)
    # 1-cos(w0) == 2 sin^2(w0/2): cancellation-free at low cutoffs, where
    # the f32 difference 1-cw loses ~5 digits and audibly shifts the zero.
    one_minus_cw = 2.0 * ns.sin(w0 / 2.0) ** 2
    return _norm(
        one_minus_cw / 2, one_minus_cw, one_minus_cw / 2,
        1 + alpha, -2 * cw, 1 - alpha,
    )


def rbj_high_pass(cutoff, q, sample_rate):
    ns = _coef_ns(cutoff, q)
    cutoff, q = _f32(ns, cutoff, q)
    w0 = _w0(cutoff, sample_rate, ns)
    cw, sw = ns.cos(w0), ns.sin(w0)
    alpha = sw / (2.0 * q)
    one_plus_cw = 2.0 * ns.cos(w0 / 2.0) ** 2
    return _norm(
        one_plus_cw / 2, -one_plus_cw, one_plus_cw / 2,
        1 + alpha, -2 * cw, 1 - alpha,
    )


def _alpha_bw_hz(w0, cutoff, bandwidth_hz, ns=jnp):
    """alpha from a bandwidth given in Hz: Q = cutoff / bandwidth.

    The reference's band filters take `bandwidth` (settings/src/effects.rs)
    with corpus values 2..2000 Hz around a 1000 Hz cutoff
    (projects/demos/effects/filter-band-*_bandwidth-{2,30,2000}.json) —
    clearly Hz, not the cookbook's octaves (2000 octaves overflows)."""
    q = cutoff / ns.maximum(bandwidth_hz, 1e-6)
    return ns.sin(w0) / (2.0 * q)


def rbj_band_pass(cutoff, bandwidth, sample_rate):
    """Constant 0 dB peak gain variant (cookbook's second BPF form)."""
    ns = _coef_ns(cutoff, bandwidth)
    cutoff, bandwidth = _f32(ns, cutoff, bandwidth)
    w0 = _w0(cutoff, sample_rate, ns)
    cw = ns.cos(w0)
    alpha = _alpha_bw_hz(w0, cutoff, bandwidth, ns)
    return _norm(alpha, ns.zeros_like(alpha), -alpha, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_band_stop(cutoff, bandwidth, sample_rate):
    ns = _coef_ns(cutoff, bandwidth)
    cutoff, bandwidth = _f32(ns, cutoff, bandwidth)
    w0 = _w0(cutoff, sample_rate, ns)
    cw = ns.cos(w0)
    alpha = _alpha_bw_hz(w0, cutoff, bandwidth, ns)
    one = ns.ones_like(alpha)
    return _norm(one, -2 * cw, one, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_all_pass(cutoff, q, sample_rate):
    ns = _coef_ns(cutoff, q)
    cutoff, q = _f32(ns, cutoff, q)
    w0 = _w0(cutoff, sample_rate, ns)
    cw, sw = ns.cos(w0), ns.sin(w0)
    alpha = sw / (2.0 * q)
    return _norm(1 - alpha, -2 * cw, 1 + alpha, 1 + alpha, -2 * cw, 1 - alpha)


def rbj_peaking_eq(cutoff, q, db_gain, sample_rate):
    ns = _coef_ns(cutoff, q, db_gain)
    cutoff, q, db_gain = _f32(ns, cutoff, q, db_gain)
    w0 = _w0(cutoff, sample_rate, ns)
    cw, sw = ns.cos(w0), ns.sin(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = sw / (2.0 * q)
    return _norm(
        1 + alpha * a, -2 * cw, 1 - alpha * a, 1 + alpha / a, -2 * cw, 1 - alpha / a
    )


def _shelf_alpha(w0, a, slope=1.0, ns=jnp):
    sw = ns.sin(w0)
    return sw / 2.0 * ns.sqrt((a + 1.0 / a) * (1.0 / slope - 1.0) + 2.0)


def rbj_low_shelf(cutoff, db_gain, sample_rate, slope=1.0):
    ns = _coef_ns(cutoff, db_gain)
    cutoff, db_gain = _f32(ns, cutoff, db_gain)
    w0 = _w0(cutoff, sample_rate, ns)
    cw = ns.cos(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = _shelf_alpha(w0, a, slope, ns)
    two_sqrt_a_alpha = 2.0 * ns.sqrt(a) * alpha
    return _norm(
        a * ((a + 1) - (a - 1) * cw + two_sqrt_a_alpha),
        2 * a * ((a - 1) - (a + 1) * cw),
        a * ((a + 1) - (a - 1) * cw - two_sqrt_a_alpha),
        (a + 1) + (a - 1) * cw + two_sqrt_a_alpha,
        -2 * ((a - 1) + (a + 1) * cw),
        (a + 1) + (a - 1) * cw - two_sqrt_a_alpha,
    )


def rbj_high_shelf(cutoff, db_gain, sample_rate, slope=1.0):
    ns = _coef_ns(cutoff, db_gain)
    cutoff, db_gain = _f32(ns, cutoff, db_gain)
    w0 = _w0(cutoff, sample_rate, ns)
    cw = ns.cos(w0)
    a = 10.0 ** (db_gain / 40.0)
    alpha = _shelf_alpha(w0, a, slope, ns)
    two_sqrt_a_alpha = 2.0 * ns.sqrt(a) * alpha
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
    Backend-generic like the RBJ family (numpy for host inputs).
    """
    ns = _coef_ns(cutoff, q)
    cutoff = ns.asarray(cutoff, ns.float32)
    q = ns.asarray(q, ns.float32)
    fs = sample_rate
    wp = 2.0 * fs * ns.tan(ns.pi * cutoff / fs)
    gain = ns.ones_like(cutoff)
    sections = []
    for b1s in _LP24_B1:
        # s-domain denominator (1, b1s/q, 1) prewarped: b2/wp^2, b1/wp
        b0s = 1.0
        b1p = (b1s / q) / wp
        b2p = 1.0 / (wp * wp)
        # bilinear (filters004.txt:352-380); numerator a = (1, 0, 0)
        ad = ns.ones_like(cutoff)
        bd = 4.0 * b2p * fs * fs + 2.0 * b1p * fs + b0s
        gain = gain * ad / bd
        beta1 = (2.0 * b0s - 8.0 * b2p * fs * fs) / bd
        beta2 = (4.0 * b2p * fs * fs - 2.0 * b1p * fs + b0s) / bd
        # z-domain numerator of 1 -> (1, 2, 1) scaled into the global gain?
        # No: bilinear of constant numerator 1 gives alpha1 = 2*1/ad = 2,
        # alpha2 = 1 (the (1+z^-1)^2 factor), with ad = 1.
        alpha1 = 2.0 * ns.ones_like(cutoff)
        alpha2 = ns.ones_like(cutoff)
        sections.append(
            (ns.ones_like(cutoff), alpha1, alpha2, beta1, beta2)
        )
    return gain, sections


def lp24_apply(x, cutoff, q, sample_rate, axis=-1):
    """Run the 24 dB low-pass cascade. cutoff/q broadcast against x."""
    gain, sections = lp24_sections(cutoff, q, sample_rate)
    y = x * gain
    if axis == -1 and _pallas_available():
        # both sections fused in one kernel: the intermediate stays in VMEM
        from groove_tpu.ops.pallas_iir import lp24_cascade_pallas
        return lp24_cascade_pallas(y, sections)
    for sec in sections:
        y = biquad_best(y, sec, axis=axis)
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

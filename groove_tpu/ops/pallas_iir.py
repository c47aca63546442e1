"""Pallas TPU kernel for biquad filtering.

The XLA implementation (ops/iir.py) expresses the two-level blocked scan as
~500 HLO ops with lax.scan bookkeeping per step. This kernel runs the same
algorithm inside ONE Mosaic kernel with all intermediates in VMEM:

  layout: time folded to [nb, L] blocks; a grid step processes a chunk of
  `cb` blocks as [L, B*cb] tiles (lane-friendly), with the filter state
  carried across grid steps in VMEM scratch (the TPU grid executes
  sequentially, so cross-chunk state propagation is free).

  per chunk:
    phase 1 — in-block prefix affine maps, serial over L (a register loop
              over [B*cb]-wide vectors; same numerics as ops/iir.biquad);
    phase 2 — cross-block state propagation, serial over cb (scalar-ish);
    phase 3 — combine: y = b0*x + s1_prev, vectorized.

Numerics are identical to ops/iir.biquad (same recurrence order); tests
compare against it and the f64 serial reference.

Used for the static- and automated-coefficient effect filters on the TPU
path; falls back to ops/iir.biquad under jit on CPU or when shapes don't
tile (engine picks via ops.iir.biquad_best).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 256  # in-block length (matches ops/iir.BIQUAD_BLOCK)


def _kernel_full(na1_ref, na2_ref, c1_ref, c2_ref, b0x_ref, y_ref,
                 s_ref, p11_s, p12_s, q1_s):
    # grid = (batch, chunks): chunks iterate innermost (sequentially on
    # TPU), so carried state resets at each batch row's first chunk.
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        s_ref[:, :] = jnp.zeros_like(s_ref)

    w = na1_ref.shape[-1]

    # phase 1: serial over L; write the SHIFTED prefix rows (identity at
    # j=0) so phase 3 can form s1_prev = p11*S1 + p12*S2 + q1.
    def in_block(j, carry):
        p11, p12, p21, p22, q1, q2 = carry
        p11_s[j, :] = p11
        p12_s[j, :] = p12
        q1_s[j, :] = q1
        na1 = na1_ref[0, j, :]
        na2 = na2_ref[0, j, :]
        n11 = na1 * p11 + p21
        n12 = na1 * p12 + p22
        n21 = na2 * p11
        n22 = na2 * p12
        r1 = na1 * q1 + q2 + c1_ref[0, j, :]
        r2 = na2 * q1 + c2_ref[0, j, :]
        return (n11, n12, n21, n22, r1, r2)

    ones = jnp.ones((w,), jnp.float32)
    zeros = jnp.zeros((w,), jnp.float32)
    m11, m12, m21, m22, cb1, cb2 = jax.lax.fori_loop(
        0, L, in_block, (ones, zeros, zeros, ones, zeros, zeros)
    )

    # phase 2: cross-block state propagation along the block axis. Columns
    # are block indices (one batch row per grid step), so state chains
    # column k -> k+1. Mosaic forbids single-lane dynamic indexing, so the
    # serial chain is computed as w sweeps of a vectorized recurrence:
    #   V^{t+1} = M * shift(V^t) + C
    # where shift rolls one lane right and injects the carried-in state at
    # lane 0 (static mask — no dynamic indexing). After w sweeps
    # V[k] == exact serial state EXITING block k, with identical operation
    # order to the scalar loop.
    s1_in = s_ref[0, 0]
    s2_in = s_ref[1, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)[0]

    def shift(v, first):
        rolled = pltpu.roll(v.reshape(1, w), 1, 1).reshape(w)
        return jnp.where(lane == 0, first, rolled)

    def sweep(t, carry):
        v1, v2 = carry
        sh1 = shift(v1, s1_in)
        sh2 = shift(v2, s2_in)
        return (
            m11 * sh1 + m12 * sh2 + cb1,
            m21 * sh1 + m22 * sh2 + cb2,
        )

    V1, V2 = jax.lax.fori_loop(0, w, sweep, (cb1, cb2))
    # per-block ENTRY states (what phase 3 needs)
    S1 = shift(V1, s1_in)
    S2 = shift(V2, s2_in)
    # carried state for the next chunk = state exiting the last block
    s_ref[0, :] = jnp.broadcast_to(V1[w - 1], (w,))
    s_ref[1, :] = jnp.broadcast_to(V2[w - 1], (w,))

    # phase 3: combine
    def emit(j, _):
        s1_prev = p11_s[j, :] * S1 + p12_s[j, :] * S2 + q1_s[j, :]
        y_ref[0, j, :] = b0x_ref[0, j, :] + s1_prev
        return 0

    jax.lax.fori_loop(0, L, emit, 0)


def _run_section(x_rows, na1_ref, na2_ref, b0_ref, b1m_ref, b2m_ref,
                 s_ref, srow, p11_s, p12_s, q1_s, y_rows, w, step):
    """One biquad section over a [L, w] chunk held in VMEM.

    x_rows/y_rows: callables j -> [w] read / (j, vals) write. Coefficient
    refs are [1, L, w] tiles; b1m/b2m are (b1 - a1*b0) and (b2 - a2*b0).
    Carried state lives in s_ref rows (srow, srow+1). Same three phases as
    _kernel_full, with the affine c-terms computed in-kernel from x (so a
    cascade can feed section 2 from section 1's VMEM output directly).
    """
    @pl.when(step == 0)
    def _init():
        s_ref[srow, :] = jnp.zeros((w,), jnp.float32)
        s_ref[srow + 1, :] = jnp.zeros((w,), jnp.float32)

    def in_block(j, carry):
        p11, p12, p21, p22, q1, q2 = carry
        p11_s[j, :] = p11
        p12_s[j, :] = p12
        q1_s[j, :] = q1
        na1 = na1_ref[0, j, :]
        na2 = na2_ref[0, j, :]
        xj = x_rows(j)
        c1j = b1m_ref[0, j, :] * xj
        c2j = b2m_ref[0, j, :] * xj
        n11 = na1 * p11 + p21
        n12 = na1 * p12 + p22
        n21 = na2 * p11
        n22 = na2 * p12
        r1 = na1 * q1 + q2 + c1j
        r2 = na2 * q1 + c2j
        return (n11, n12, n21, n22, r1, r2)

    ones = jnp.ones((w,), jnp.float32)
    zeros = jnp.zeros((w,), jnp.float32)
    m11, m12, m21, m22, cb1, cb2 = jax.lax.fori_loop(
        0, L, in_block, (ones, zeros, zeros, ones, zeros, zeros)
    )

    s1_in = s_ref[srow, 0]
    s2_in = s_ref[srow + 1, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)[0]

    def shift(v, first):
        rolled = pltpu.roll(v.reshape(1, w), 1, 1).reshape(w)
        return jnp.where(lane == 0, first, rolled)

    def sweep(_, carry):
        v1, v2 = carry
        sh1 = shift(v1, s1_in)
        sh2 = shift(v2, s2_in)
        return (m11 * sh1 + m12 * sh2 + cb1,
                m21 * sh1 + m22 * sh2 + cb2)

    V1, V2 = jax.lax.fori_loop(0, w, sweep, (cb1, cb2))
    S1 = shift(V1, s1_in)
    S2 = shift(V2, s2_in)
    s_ref[srow, :] = jnp.broadcast_to(V1[w - 1], (w,))
    s_ref[srow + 1, :] = jnp.broadcast_to(V2[w - 1], (w,))

    def emit(j, _):
        s1_prev = p11_s[j, :] * S1 + p12_s[j, :] * S2 + q1_s[j, :]
        y_rows(j, b0_ref[0, j, :] * x_rows(j) + s1_prev)
        return 0

    jax.lax.fori_loop(0, L, emit, 0)


def _kernel_cascade2(x_ref,
                     na1a, na2a, b0a, b1ma, b2ma,
                     na1b, na2b, b0b, b1mb, b2mb,
                     y_ref, s_ref, p11_s, p12_s, q1_s, y1_s):
    """Two biquad sections in one kernel: section 1 from the input tile
    into VMEM scratch, section 2 from scratch into the output tile —
    the intermediate never touches HBM."""
    step = pl.program_id(1)
    w = x_ref.shape[-1]
    _run_section(lambda j: x_ref[0, j, :], na1a, na2a, b0a, b1ma, b2ma,
                 s_ref, 0, p11_s, p12_s, q1_s,
                 lambda j, v: y1_s.__setitem__((j, slice(None)), v), w, step)
    _run_section(lambda j: y1_s[j, :], na1b, na2b, b0b, b1mb, b2mb,
                 s_ref, 2, p11_s, p12_s, q1_s,
                 lambda j, v: y_ref.__setitem__((0, j, slice(None)), v),
                 w, step)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cascade2_pallas_2d(x, coefs_a, coefs_b, interpret: bool = False):
    """Two-section cascade over [B, n]; coefs_*: 5-tuples broadcast to x."""
    B, n = x.shape
    nb = -(-n // L)
    cb = min(CB, max(128, -(-nb // 128) * 128))
    nchunks = -(-nb // cb)
    nbp = nchunks * cb
    pad = [(0, 0), (0, nbp * L - n)]
    xp = jnp.pad(x, pad)

    def cols(v):
        return v.reshape(B, nbp, L).transpose(0, 2, 1)

    def prep(coefs):
        b0, b1, b2, a1, a2 = [
            jnp.pad(jnp.broadcast_to(jnp.asarray(c, jnp.float32), x.shape),
                    pad) for c in coefs
        ]
        return (cols(-a1), cols(-a2), cols(b0),
                cols(b1 - a1 * b0), cols(b2 - a2 * b0))

    tiles = (cols(xp),) + prep(coefs_a) + prep(coefs_b)
    grid = (B, nchunks)
    spec = pl.BlockSpec((1, L, cb), lambda b, i: (b, 0, i),
                        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _kernel_cascade2,
        grid=grid,
        in_specs=[spec] * 11,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, cb), jnp.float32),   # carried state x2 sections
            pltpu.VMEM((L, cb), jnp.float32),   # p11 rows
            pltpu.VMEM((L, cb), jnp.float32),   # p12 rows
            pltpu.VMEM((L, cb), jnp.float32),   # q1 rows
            pltpu.VMEM((L, cb), jnp.float32),   # section-1 output staging
        ],
        interpret=interpret,
    )(*tiles)
    return y.transpose(0, 2, 1).reshape(B, -1)[:, :n]


def cascade2_pallas(x, coefs_a, coefs_b, interpret: bool = False):
    """Fused two-section biquad cascade over [..., n]."""
    shape = x.shape
    flat = x.reshape(1, -1) if x.ndim == 1 else x.reshape(-1, shape[-1])

    def b(coefs):
        return tuple(
            jnp.broadcast_to(jnp.asarray(c, jnp.float32), shape)
            .reshape(flat.shape) for c in coefs
        )

    out = _cascade2_pallas_2d(flat, b(coefs_a), b(coefs_b),
                              interpret=interpret)
    return out.reshape(shape)


CB = 512  # max blocks per grid chunk (VMEM budget: ~9 x L x CB x 4B = 4.7 MB)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _biquad_pallas_2d(x, coefs, interpret: bool = False):
    """x: [B, n]; per-sample or scalar coefficients broadcast to x."""
    B, n = x.shape
    b0, b1, b2, a1, a2 = [
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), x.shape) for c in coefs
    ]
    nb = -(-n // L)
    # chunk width adapts to the signal: short songs shouldn't pay 512
    # cross-block sweep iterations on padding
    cb = min(CB, max(128, -(-nb // 128) * 128))
    nchunks = -(-nb // cb)
    nbp = nchunks * cb
    pad = [(0, 0), (0, nbp * L - n)]
    xp = jnp.pad(x, pad)
    b0p, b1p, b2p = jnp.pad(b0, pad), jnp.pad(b1, pad), jnp.pad(b2, pad)
    a1p, a2p = jnp.pad(a1, pad), jnp.pad(a2, pad)

    def cols(v):
        # [B, nbp*L] -> [B, L, nbp]: block k of batch b in column k
        return v.reshape(B, nbp, L).transpose(0, 2, 1)

    na1 = cols(-a1p)
    na2 = cols(-a2p)
    c1 = cols((b1p - a1p * b0p) * xp)
    c2 = cols((b2p - a2p * b0p) * xp)
    b0x = cols(b0p * xp)

    grid = (B, nchunks)
    spec = pl.BlockSpec((1, L, cb), lambda b, i: (b, 0, i),
                        memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _kernel_full,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, L, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cb), jnp.float32),   # carried state
            pltpu.VMEM((L, cb), jnp.float32),   # p11 rows
            pltpu.VMEM((L, cb), jnp.float32),   # p12 rows
            pltpu.VMEM((L, cb), jnp.float32),   # q1 rows
        ],
        interpret=interpret,
    )(na1, na2, c1, c2, b0x)
    return y.transpose(0, 2, 1).reshape(B, -1)[:, :n]


def biquad_pallas(x, coefs, interpret: bool = False):
    """Pallas biquad over [..., n] with broadcastable coefficients."""
    shape = x.shape
    if x.ndim == 1:
        flat = x.reshape(1, -1)
    else:
        flat = x.reshape(-1, shape[-1])
    coefs_b = tuple(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), shape)
        .reshape(flat.shape) for c in coefs
    )
    out = _biquad_pallas_2d(flat, coefs_b, interpret=interpret)
    return out.reshape(shape)

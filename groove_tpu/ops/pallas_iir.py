"""Pallas TPU kernels for biquad filtering (v2 layout).

The XLA implementation (ops/iir.py) expresses the two-level blocked scan as
~500 HLO ops with lax.scan bookkeeping per step. These kernels run the same
algorithm inside ONE Mosaic kernel with all intermediates in VMEM, laid out
so every serial step is one native (8, 128) VPU register op:

  layout: x[B, n] -> [G, L, 8, cb] tiles — time folded to L-sample blocks,
  8 batch rows in the SUBLANE axis (G = ceil(B/8) groups), cb block-columns
  in the LANE axis. One grid step = one (group, chunk) pair; the TPU grid
  executes sequentially, so filter state carries across chunks in VMEM
  scratch for free.

  per chunk:
    phase 1 — in-block prefix affine maps: serial fori_loop over L, each
              step an [8, cb] vector op covering 8 batch rows at once;
    phase 2 — cross-block state propagation: T lane-roll sweeps of the
              vectorized recurrence V <- M*shift(V) + C, where T is the
              REAL chain length (nb when the call fits one chunk — short
              songs don't pay for padding lanes);
    phase 3 — combine, fully vectorized over the whole [L, 8, cb] tile
              (v1 looped L more serial steps here).

  The in-block length L adapts to the signal: ~sqrt(n), clamped to
  [16, 128], which minimizes (phase-1 + phase-2) serial depth.

Numerics are identical to ops/iir.biquad (same recurrence, same operation
order — see the invariant in CLAUDE.md: NO associative doubling of the 2x2
maps); tests compare against it and the f64 serial reference.

Three entry points, picked by ops/iir dispatchers:
  - biquad_pallas(x, coefs): per-sample or scalar coefficients. Scalar
    coefficients ride in SMEM (one input tile instead of five).
  - lp24_cascade_pallas(x, sections): the filters004 24 dB cascade with
    its constant (1, 2, 1) numerators — both sections fused in one kernel,
    c-terms computed in-register, the intermediate never touches HBM.
  - cascade2_pallas(x, a, b): generic two-section helper (two chained
    biquad_pallas calls), kept for API compatibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128   # max in-block length (adaptive per call, see _pick_l)
CB = 128  # block-columns (lanes) per grid chunk

# Sublane-axis row-pack caps for the BLOCK-RATE kernel families (the
# welsh cascades). R only regroups rows (outputs are bitwise identical —
# verified on-chip at R=8/16/24), and an interleaved A/B at 288 and 762
# rows x 178k samples measured NO time difference either: at hundreds of
# rows these kernels are VPU issue-bound on the phase-1/phase-3 work
# (~0.3-0.4 ns/sample), not grid-latency-bound, so R stops mattering
# once the pipeline is full. Caps are therefore set by VMEM alone: the
# refined kernel's 6 full-tile scratches + double-buffered IO exceed the
# 16 MB scoped VMEM at R=24 (Mosaic rejects the compile), so it stays at
# 16; the plain kernels (4 scratches) fit at 24.
BLK_MAX_R = 24
REFINED_MAX_R = 16

# Tests set True (with ops.iir.USE_PALLAS = True) to route graph-level
# callers (welsh.render_notes_slice, the ops/iir dispatchers — every
# public wrapper below defaults interpret=None -> this flag) through
# these kernels on the CPU backend via the Pallas interpreter: the CI
# suite then asserts the SHIPPED kernel algorithm's numerics, not the
# XLA fallback's (tests/test_pallas_golden.py).
FORCE_INTERPRET = False


def _interp(interpret) -> bool:
    """Resolve a wrapper's interpret arg: None -> FORCE_INTERPRET."""
    return FORCE_INTERPRET if interpret is None else bool(interpret)


def _pick_l(n: int) -> int:
    """In-block length ~sqrt(n). Delegates to ops/iir.block_for so the XLA
    fallback groups the recurrence identically (bit-identical outputs)."""
    from groove_tpu.ops.iir import block_for
    return block_for(n, max_block=L)


def _pick_r(B: int, max_r: int) -> int:
    """Sublane-axis batch rows per grid step. The serial phases are
    latency-bound dependency chains; issuing R/8 VREG ops per dependent
    step (R=16/24 for big note batches) fills the pipeline bubbles with
    independent rows — numerics per row are unchanged. max_r is the
    VMEM-budget cap per kernel family (the 16 MB scoped-vmem limit bounds
    full-tile scratch+IO count x ln x R x cb x 4 B; per-sample-coefficient
    kernels carry 6 full IO tiles and stay at 8)."""
    for r in (max_r, 24, 16, 8):
        if r <= max_r and B > r // 2:
            return r
    return 8


def _geom(B: int, n: int, max_r: int = 8):
    ln = _pick_l(n)
    nb = -(-n // ln)
    cb = CB
    nchunks = -(-nb // cb)
    nbp = nchunks * cb
    R = _pick_r(B, max_r)
    G = -(-B // R)
    # phase-2 sweep count: the longest real chain inside one chunk
    T = nb if nchunks == 1 else cb
    return ln, nb, cb, nchunks, nbp, G, T, R


def _fold(v, G, ln, nbp, R):
    """[G*R, nbp*ln] -> [G, ln, R, nbp]: (g, j, s, k) = v[Rg+s, k*ln+j]."""
    return v.reshape(G, R, nbp, ln).transpose(0, 3, 1, 2)


def _unfold(y, B, n):
    """[G, ln, R, nbp] -> [B, n]."""
    G, ln, R, nbp = y.shape
    return y.transpose(0, 2, 3, 1).reshape(G * R, nbp * ln)[:B, :n]


def _pad_fold(v, B, n, G, ln, nbp, R):
    vp = jnp.pad(v, [(0, G * R - B), (0, nbp * ln - n)])
    return _fold(vp, G, ln, nbp, R)


def _phase1(read_c1c2, ln, w8, p11_s, p12_s, q1_s):
    """In-block prefix maps. Writes SHIFTED prefixes (identity at j=0) to
    scratch rows; returns the whole-block transition (M, C) as [8, cb]s."""

    def in_block(j, carry):
        p11, p12, p21, p22, q1, q2 = carry
        p11_s[j] = p11
        p12_s[j] = p12
        q1_s[j] = q1
        na1, na2, c1j, c2j = read_c1c2(j)
        n11 = na1 * p11 + p21
        n12 = na1 * p12 + p22
        n21 = na2 * p11
        n22 = na2 * p12
        r1 = na1 * q1 + q2 + c1j
        r2 = na2 * q1 + c2j
        return (n11, n12, n21, n22, r1, r2)

    ones = jnp.ones(w8, jnp.float32)
    zeros = jnp.zeros(w8, jnp.float32)
    return jax.lax.fori_loop(
        0, ln, in_block, (ones, zeros, zeros, ones, zeros, zeros)
    )


def _phase2(M, s_ref, srow, T, w8, return_v: bool = False):
    """Serial cross-block chain via T lane-roll sweeps; per sublane row the
    chain is independent (each row is a different batch element). Returns
    per-block ENTRY states S1, S2 and stores the chunk exit state (the
    lane cb-1 EXIT value — only meaningful when the chunk's real chain
    fills every lane; the state kernels export the true exit from the V
    vectors instead, return_v=True)."""
    m11, m12, m21, m22, cb1, cb2 = M
    s1_in = s_ref[srow]
    s2_in = s_ref[srow + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, w8, 1)

    def shift(v, first):
        return jnp.where(lane == 0, first, pltpu.roll(v, 1, 1))

    def sweep(_, carry):
        v1, v2 = carry
        sh1 = shift(v1, s1_in)
        sh2 = shift(v2, s2_in)
        return (m11 * sh1 + m12 * sh2 + cb1,
                m21 * sh1 + m22 * sh2 + cb2)

    V1, V2 = jax.lax.fori_loop(0, T, sweep, (cb1, cb2))
    S1 = shift(V1, s1_in)
    S2 = shift(V2, s2_in)
    w = w8[-1]
    s_ref[srow] = jnp.broadcast_to(V1[:, w - 1:w], w8)
    s_ref[srow + 1] = jnp.broadcast_to(V2[:, w - 1:w], w8)
    if return_v:
        return S1, S2, V1, V2
    return S1, S2


def _make_kernel_ps(ln, T):
    """Per-sample-coefficient single section: tiles na1, na2, c1, c2, b0x."""

    def kernel(na1_ref, na2_ref, c1_ref, c2_ref, b0x_ref, y_ref,
               s_ref, p11_s, p12_s, q1_s):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        w8 = na1_ref.shape[-2:]

        def read(j):
            return (na1_ref[0, j], na2_ref[0, j], c1_ref[0, j], c2_ref[0, j])

        M = _phase1(read, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 0, T, w8)
        # phase 3, vectorized over the full [ln, 8, cb] tile
        y_ref[0] = b0x_ref[0] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

    return kernel


def _make_kernel_scalar(ln, T):
    """Scalar-coefficient section: one x tile + SMEM (na1, na2, b1m, b2m, b0)."""

    def kernel(coef_ref, x_ref, y_ref, s_ref, p11_s, p12_s, q1_s):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        w8 = x_ref.shape[-2:]
        na1 = coef_ref[0]
        na2 = coef_ref[1]
        b1m = coef_ref[2]
        b2m = coef_ref[3]
        b0 = coef_ref[4]

        def read(j):
            xj = x_ref[0, j]
            return (jnp.full(w8, na1), jnp.full(w8, na2), b1m * xj, b2m * xj)

        M = _phase1(read, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 0, T, w8)
        y_ref[0] = b0 * x_ref[0] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

    return kernel


def _make_kernel_lp24(ln, T):
    """filters004 cascade: numerators are the constant (1, 2, 1), so
    c-terms derive in-register from the denominators: b1m = 2 + na1,
    b2m = 1 + na2, b0 = 1. Section 1 stages into VMEM scratch; section 2
    reads it directly — the intermediate never touches HBM."""

    def kernel(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
               s_ref, p11_s, p12_s, q1_s, y1_s):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        w8 = x_ref.shape[-2:]

        def read_a(j):
            na1 = na1a_ref[0, j]
            na2 = na2a_ref[0, j]
            xj = x_ref[0, j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_a, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 0, T, w8)
        y1_s[...] = x_ref[0] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

        def read_b(j):
            na1 = na1b_ref[0, j]
            na2 = na2b_ref[0, j]
            xj = y1_s[j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_b, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 2, T, w8)
        y_ref[0] = y1_s[...] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

    return kernel


def _make_kernel_ps_blk(ln, T, cblock):
    """Per-BLOCK-rate coefficients (the reference's 64-frame control
    cadence): coef tiles hold one row per cblock samples; sample row j
    reads coef row j // cblock. c-terms derive in-register from x."""
    shift = cblock.bit_length() - 1
    lb = ln // cblock

    def kernel(x_ref, na1_ref, na2_ref, b1m_ref, b2m_ref, b0_ref, y_ref,
               s_ref, p11_s, p12_s, q1_s):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        w8 = x_ref.shape[-2:]

        def read(j):
            jb = j >> shift
            xj = x_ref[0, j]
            return (na1_ref[0, jb], na2_ref[0, jb],
                    b1m_ref[0, jb] * xj, b2m_ref[0, jb] * xj)

        M = _phase1(read, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 0, T, w8)
        # emit per coef row (lb is 1-2: static unrolled, fully vectorized)
        for jb in range(lb):
            sl = slice(jb * cblock, (jb + 1) * cblock)
            y_ref[0, sl] = b0_ref[0, jb][None] * x_ref[0, sl] + (
                p11_s[sl] * S1[None] + p12_s[sl] * S2[None] + q1_s[sl]
            )

    return kernel, lb


def _make_kernel_lp24_blk(ln, T, cblock):
    """Block-rate-coefficient fused lp24 cascade (numerators (1, 2, 1))."""
    shift = cblock.bit_length() - 1
    lb = ln // cblock

    def kernel(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
               s_ref, p11_s, p12_s, q1_s, y1_s):
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            s_ref[...] = jnp.zeros_like(s_ref)

        w8 = x_ref.shape[-2:]

        def read_a(j):
            jb = j >> shift
            na1 = na1a_ref[0, jb]
            na2 = na2a_ref[0, jb]
            xj = x_ref[0, j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_a, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 0, T, w8)
        y1_s[...] = x_ref[0] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

        def read_b(j):
            jb = j >> shift
            na1 = na1b_ref[0, jb]
            na2 = na2b_ref[0, jb]
            xj = y1_s[j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_b, ln, w8, p11_s, p12_s, q1_s)
        S1, S2 = _phase2(M, s_ref, 2, T, w8)
        y_ref[0] = y1_s[...] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

    return kernel, lb


def _make_kernel_lp24_blk_state(ln, T, cblock, nchunks, last_lane):
    """lp24 blockrate cascade WITH entry/exit state (the streamed/sliced
    fixed-64-grid contract, ops/stream.biquad_stream): state tiles are
    [1, 4, R] per group — rows (s1a, s2a, s1b, s2b), the TDF2 state
    entering/exiting the call. Identical per-block math to
    _make_kernel_lp24_blk; only the phase-2 chain seed and the final
    state export differ. last_lane: the final REAL block's lane within
    the last chunk ((nb-1) % cb) — the s_ref chunk carry reads lane
    cb-1, which is padding when the last chunk is partial, so the
    export takes phase 2's V vectors at the true exit lane."""
    shift = cblock.bit_length() - 1
    lb = ln // cblock

    def kernel(sin_ref, x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref,
               y_ref, sout_ref, s_ref, p11_s, p12_s, q1_s, y1_s):
        step = pl.program_id(1)
        w8 = x_ref.shape[-2:]

        @pl.when(step == 0)
        def _init():
            # entry state: [4, R] scalars broadcast across the lane axis
            # (phase 2 consumes them at lane 0 of the first chunk)
            for srow in range(4):
                s_ref[srow] = jnp.broadcast_to(
                    sin_ref[0, srow][:, None], w8)

        def read_a(j):
            jb = j >> shift
            na1 = na1a_ref[0, jb]
            na2 = na2a_ref[0, jb]
            xj = x_ref[0, j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_a, ln, w8, p11_s, p12_s, q1_s)
        S1, S2, Va1, Va2 = _phase2(M, s_ref, 0, T, w8, return_v=True)
        y1_s[...] = x_ref[0] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

        def read_b(j):
            jb = j >> shift
            na1 = na1b_ref[0, jb]
            na2 = na2b_ref[0, jb]
            xj = y1_s[j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        M = _phase1(read_b, ln, w8, p11_s, p12_s, q1_s)
        S1, S2, Vb1, Vb2 = _phase2(M, s_ref, 2, T, w8, return_v=True)
        y_ref[0] = y1_s[...] + (
            p11_s[...] * S1[None] + p12_s[...] * S2[None] + q1_s[...]
        )

        @pl.when(step == nchunks - 1)
        def _export():
            for srow, v in ((0, Va1), (1, Va2), (2, Vb1), (3, Vb2)):
                sout_ref[0, srow] = v[:, last_lane]

    return kernel, lb


@functools.partial(jax.jit, static_argnames=("cblock", "interpret"))
def _lp24_blk_state_2d(x, na1a, na2a, na1b, na2b, state, cblock: int,
                       interpret: bool = False):
    """Stateful variant of _lp24_blk_2d. state: [B, 4]. Returns
    (y [B, n], state' [B, 4]). The in-block length is PINNED to cblock
    (64) so the math matches ops/stream.biquad_stream's fixed grid —
    output and exit state are bitwise the XLA streamed path's, and
    therefore segmentation-invariant for any 64-multiple segmenting."""
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom_blk(
        B, n, cblock, max_r=BLK_MAX_R, pin_ln=True)
    kernel, lb = _make_kernel_lp24_blk_state(ln, T, cblock, nchunks,
                                             (nb - 1) % cb)
    nb64 = na1a.shape[-1]
    foldb = lambda v: _pad_fold_blk(v, B, nb64, G, lb, nbp, R)  # noqa: E731
    spec = _spec(ln, R, cb)
    bspec = pl.BlockSpec((1, lb, R, cb), lambda g, i: (g, 0, 0, i),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 4, R), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    sp = jnp.pad(jnp.asarray(state, jnp.float32), [(0, G * R - B), (0, 0)])
    sp = sp.reshape(G, R, 4).transpose(0, 2, 1)  # [G, 4, R]
    y, sout = pl.pallas_call(
        kernel,
        grid=(G, nchunks),
        in_specs=[sspec, spec] + [bspec] * 4,
        out_specs=[spec, sspec],
        out_shape=[jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
                   jax.ShapeDtypeStruct((G, 4, R), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((4, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
        ],
        interpret=interpret,
    )(sp, _pad_fold(x, B, n, G, ln, nbp, R), foldb(na1a), foldb(na2a),
      foldb(na1b), foldb(na2b))
    state_out = sout.transpose(0, 2, 1).reshape(G * R, 4)[:B]
    return _unfold(y, B, n), state_out


def lp24_blockrate_stream_pallas(x, sections_b, state, cblock: int = 64,
                                 interpret: bool | None = None):
    """Fused lp24 cascade with block-rate denominators AND carried TDF2
    state — the kernel form of applying ops/stream.biquad_stream twice.
    x: [..., n]; state: [..., 4] as (s1a, s2a, s1b, s2b).
    n must be a multiple of cblock: the kernel pads n up to the 64-grid
    internally, and an unaligned call would export state contaminated by
    the padded zero samples — breaking the chain-bitwise contract
    silently (ops/stream.biquad_stream documents the same requirement).
    Returns (y, state')."""
    interpret = _interp(interpret)
    shape = x.shape
    if shape[-1] % cblock:
        raise ValueError(
            f"stateful stream kernel needs n % {cblock} == 0, got "
            f"{shape[-1]} (exported state would include padded samples)")
    flat = _flat(x)
    nb64 = -(-shape[-1] // cblock)
    cshape = shape[:-1] + (nb64,)
    na1a, na2a = _denoms_blk(sections_b[0], cshape, flat.shape[0], nb64)
    na1b, na2b = _denoms_blk(sections_b[1], cshape, flat.shape[0], nb64)
    st = jnp.asarray(state, jnp.float32).reshape(flat.shape[0], 4)
    y, st2 = _lp24_blk_state_2d(flat, na1a, na2a, na1b, na2b, st, cblock,
                                interpret=interpret)
    return y.reshape(shape), st2.reshape(shape[:-1] + (4,))


def _spec(ln, R, cb):
    return pl.BlockSpec((1, ln, R, cb), lambda g, i: (g, 0, 0, i),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _biquad_ps_2d(x, coefs, interpret: bool = False):
    """Per-sample coefficients over [B, n]."""
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom(B, n)  # 6 full IO tiles: R=8
    b0, b1, b2, a1, a2 = [
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), x.shape) for c in coefs
    ]
    fold = lambda v: _pad_fold(v, B, n, G, ln, nbp, R)  # noqa: E731
    tiles = (fold(-a1), fold(-a2), fold((b1 - a1 * b0) * x),
             fold((b2 - a2 * b0) * x), fold(b0 * x))
    spec = _spec(ln, R, cb)
    y = pl.pallas_call(
        _make_kernel_ps(ln, T),
        grid=(G, nchunks),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R, cb), jnp.float32),    # carried state
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p11 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p12 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # q1 rows
        ],
        interpret=interpret,
    )(*tiles)
    return _unfold(y, B, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _biquad_scalar_2d(x, coefs, interpret: bool = False):
    """Scalar coefficients over [B, n]; coefs ride in SMEM."""
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom(B, n, max_r=24)
    b0, b1, b2, a1, a2 = [jnp.asarray(c, jnp.float32) for c in coefs]
    smem = jnp.stack([-a1, -a2, b1 - a1 * b0, b2 - a2 * b0, b0])
    spec = _spec(ln, R, cb)
    y = pl.pallas_call(
        _make_kernel_scalar(ln, T),
        grid=(G, nchunks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
        ],
        interpret=interpret,
    )(smem, _pad_fold(x, B, n, G, ln, nbp, R))
    return _unfold(y, B, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lp24_2d(x, na1a, na2a, na1b, na2b, interpret: bool = False):
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom(B, n)
    fold = lambda v: _pad_fold(v, B, n, G, ln, nbp, R)  # noqa: E731
    spec = _spec(ln, R, cb)
    y = pl.pallas_call(
        _make_kernel_lp24(ln, T),
        grid=(G, nchunks),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, R, cb), jnp.float32),    # state x2 sections
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p11 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p12 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # q1 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # section-1 staging
        ],
        interpret=interpret,
    )(fold(x), fold(na1a), fold(na2a), fold(na1b), fold(na2b))
    return _unfold(y, B, n)


def _geom_blk(B: int, n: int, cblock: int, max_r: int = 24,
              pin_ln: bool = False):
    """Geometry for block-rate-coefficient kernels: ln must be a multiple
    of cblock so coef rows tile evenly. pin_ln=True pins ln = cblock —
    the STATEFUL kernels' grid, whose math must match ops/stream's fixed
    64-grid so chained calls are bitwise one long call."""
    from groove_tpu.ops.iir import block_for
    ln = cblock if pin_ln else max(block_for(n, max_block=L), cblock)
    nb = -(-n // ln)
    cb = CB
    nchunks = -(-nb // cb)
    nbp = nchunks * cb
    R = _pick_r(B, max_r)
    G = -(-B // R)
    T = nb if nchunks == 1 else cb
    return ln, nb, cb, nchunks, nbp, G, T, R


def _denoms_blk(sec, cshape, rows: int, nb64: int):
    """Negated denominators of one lp24 section, broadcast/flattened to
    [rows, nb64] kernel rows (the cascade's numerators are the constant
    (1, 2, 1) by construction, so only -a1/-a2 ship to the kernels)."""
    _, _, _, a1, a2 = sec
    return (
        jnp.broadcast_to(jnp.asarray(-a1, jnp.float32), cshape)
        .reshape(rows, nb64),
        jnp.broadcast_to(jnp.asarray(-a2, jnp.float32), cshape)
        .reshape(rows, nb64),
    )


def _pad_fold_blk(vb, B, nb64, G, lb, nbp, R):
    """Block-rate array [B, nb64] -> [G, lb, R, nbp] (same fold, coarser)."""
    vp = jnp.pad(vb, [(0, G * R - B), (0, nbp * lb - nb64)])
    return _fold(vp, G, lb, nbp, R)


@functools.partial(jax.jit, static_argnames=("cblock", "interpret"))
def _biquad_blk_2d(x, coefs_b, cblock: int, interpret: bool = False):
    """x: [B, n]; coefs_b: 5 block-rate arrays [B, ceil(n/cblock)]."""
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom_blk(B, n, cblock,
                                                  max_r=BLK_MAX_R)
    kernel, lb = _make_kernel_ps_blk(ln, T, cblock)
    nb64 = coefs_b[0].shape[-1]
    b0, b1, b2, a1, a2 = [jnp.asarray(c, jnp.float32) for c in coefs_b]
    foldb = lambda v: _pad_fold_blk(v, B, nb64, G, lb, nbp, R)  # noqa: E731
    tiles = (_pad_fold(x, B, n, G, ln, nbp, R),
             foldb(-a1), foldb(-a2),
             foldb(b1 - a1 * b0), foldb(b2 - a2 * b0), foldb(b0))
    spec = _spec(ln, R, cb)
    bspec = pl.BlockSpec((1, lb, R, cb), lambda g, i: (g, 0, 0, i),
                         memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(G, nchunks),
        in_specs=[spec] + [bspec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
        ],
        interpret=interpret,
    )(*tiles)
    return _unfold(y, B, n)


@functools.partial(jax.jit, static_argnames=("cblock", "interpret"))
def _lp24_blk_2d(x, na1a, na2a, na1b, na2b, cblock: int,
                 interpret: bool = False):
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom_blk(B, n, cblock,
                                                  max_r=BLK_MAX_R)
    kernel, lb = _make_kernel_lp24_blk(ln, T, cblock)
    nb64 = na1a.shape[-1]
    foldb = lambda v: _pad_fold_blk(v, B, nb64, G, lb, nbp, R)  # noqa: E731
    spec = _spec(ln, R, cb)
    bspec = pl.BlockSpec((1, lb, R, cb), lambda g, i: (g, 0, 0, i),
                         memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(G, nchunks),
        in_specs=[spec] + [bspec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
        ],
        interpret=interpret,
    )(_pad_fold(x, B, n, G, ln, nbp, R), foldb(na1a), foldb(na2a),
      foldb(na1b), foldb(na2b))
    return _unfold(y, B, n)


def biquad_blockrate_pallas(x, coefs_b, cblock: int = 64,
                            interpret: bool | None = None):
    """Biquad over [..., n] with block-rate coefficients [..., ceil(n/cblock)]
    (held constant within each cblock-sample control block, the reference's
    handle_work cadence)."""
    interpret = _interp(interpret)
    shape = x.shape
    flat = _flat(x)
    nb64 = -(-shape[-1] // cblock)
    cshape = shape[:-1] + (nb64,)
    coefs = tuple(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape)
        .reshape(flat.shape[0], nb64) for c in coefs_b
    )
    out = _biquad_blk_2d(flat, coefs, cblock, interpret=interpret)
    return out.reshape(shape)


def lp24_blockrate_pallas(x, sections_b, cblock: int = 64,
                          interpret: bool | None = None):
    """Fused lp24 cascade with block-rate denominators."""
    interpret = _interp(interpret)
    shape = x.shape
    flat = _flat(x)
    nb64 = -(-shape[-1] // cblock)
    cshape = shape[:-1] + (nb64,)
    na1a, na2a = _denoms_blk(sections_b[0], cshape, flat.shape[0], nb64)
    na1b, na2b = _denoms_blk(sections_b[1], cshape, flat.shape[0], nb64)
    out = _lp24_blk_2d(flat, na1a, na2a, na1b, na2b, cblock,
                       interpret=interpret)
    return out.reshape(shape)


def _flat(x):
    shape = x.shape
    return (x.reshape(1, -1) if x.ndim == 1 else x.reshape(-1, shape[-1]))


def biquad_pallas(x, coefs, interpret: bool | None = None):
    """Pallas biquad over [..., n] with scalar or broadcastable per-sample
    coefficients (b0, b1, b2, a1, a2), a0 == 1."""
    interpret = _interp(interpret)
    shape = x.shape
    flat = _flat(x)
    if all(jnp.ndim(c) == 0 for c in coefs):
        out = _biquad_scalar_2d(flat, tuple(coefs), interpret=interpret)
    else:
        coefs_b = tuple(
            jnp.broadcast_to(jnp.asarray(c, jnp.float32), shape)
            .reshape(flat.shape) for c in coefs
        )
        out = _biquad_ps_2d(flat, coefs_b, interpret=interpret)
    return out.reshape(shape)


def lp24_cascade_pallas(x, sections, interpret: bool | None = None):
    """Fused filters004 24 dB cascade. sections: two (b0, b1, b2, a1, a2)
    tuples from ops/iir.lp24_sections — numerators are the constant
    (1, 2, 1) by construction; only the denominators are shipped. The
    denominators here are PER-SAMPLE (cshape = the full signal shape)."""
    interpret = _interp(interpret)
    shape = x.shape
    flat = _flat(x)
    na1a, na2a = _denoms_blk(sections[0], shape, flat.shape[0], shape[-1])
    na1b, na2b = _denoms_blk(sections[1], shape, flat.shape[0], shape[-1])
    out = _lp24_2d(flat, na1a, na2a, na1b, na2b, interpret=interpret)
    return out.reshape(shape)


def cascade2_pallas(x, coefs_a, coefs_b, interpret: bool | None = None):
    """Generic two-section cascade (two chained kernel calls)."""
    interpret = _interp(interpret)
    return biquad_pallas(
        biquad_pallas(x, coefs_a, interpret=interpret), coefs_b,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused REFINED lp24 cascade (block-rate coefficients): both sections'
# solve + defect + correction in ONE kernel. The naive refined path costs
# 4 single-section kernel launches (2 solves + 2 correction solves) plus
# full-tile defect traffic through HBM; here the correction REUSES the
# solve's in-block prefix rows (p11/p12 — the homogeneous part depends
# only on the denominators, which solve and correction share), so its
# phase 1 is an r-only scan (~60% cheaper), the defect is computed
# in-VMEM, and nothing but x and y touch HBM. Defect algebra matches
# ops/iir.biquad_blockrate_refined (see its docstring for why the
# shifted-coefficient TDF2 form and the epsilon regrouping are load-
# bearing); the numerators here are the cascade's constant (1, 2, 1).


def _corr_phase1(read_nad, ln, w8, q1c_s):
    """r-only in-block scan for the correction filter (numerator (1,0,0)):
    the prefix MAPS are the solve's (same denominators); only the c-term
    accumulation runs. Writes SHIFTED r1 prefixes; returns the block-end
    (r1, r2)."""

    def step(j, carry):
        r1, r2 = carry
        na1, na2, dj = read_nad(j)
        q1c_s[j] = r1
        r1n = na1 * r1 + r2 + na1 * dj
        r2n = na2 * r1 + na2 * dj
        return (r1n, r2n)

    zeros = jnp.zeros(w8, jnp.float32)
    return jax.lax.fori_loop(0, ln, step, (zeros, zeros))


def _make_kernel_lp24_refined_blk(ln, T, cblock, nchunks=None,
                                  last_lane=None, state_io=False):
    """state_io=False: the original zero-state kernel (signature and op
    order unchanged). state_io=True: adds sin/sout refs [1, 20, R] —
    per row and section (A rows 0-9, B rows 10-19): solve TDF2 pair,
    correction TDF2 pair, z lag-1/-2, y lag-1/-2, na1/na2 coefficient
    edges — everything the kernel itself carries across chunks, so
    chaining segment calls through the state is bitwise one long call
    (the sliced streamed welsh contract). Exports read the final REAL
    block's lane (last_lane = (nb-1) %% cb): the in-call chunk carries
    read lane cb-1, which is padding when the last chunk is partial."""
    shift = cblock.bit_length() - 1
    lb = ln // cblock

    def body(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
             s_ref, p11_s, p12_s, q1_s, y0_s, ya_s, d_s, edge_s,
             sin_ref=None, sout_ref=None):
        step = pl.program_id(1)

        if state_io:
            @pl.when(step == 0)
            def _init():
                wq = x_ref.shape[-2:]
                # s_ref rows: 0,1 solve A; 2,3 corr A; 4,5 solve B;
                # 6,7 corr B <- sin rows 0-3 (A) and 10-13 (B)
                for r in range(4):
                    s_ref[r] = jnp.broadcast_to(
                        sin_ref[0, r][:, None], wq)
                    s_ref[4 + r] = jnp.broadcast_to(
                        sin_ref[0, 10 + r][:, None], wq)
                # edge rows: z1, z2, y1, y2, na1, na2 per section
                for r in range(6):
                    edge_s[r] = jnp.broadcast_to(
                        sin_ref[0, 4 + r][:, None], wq)
                    edge_s[8 + r] = jnp.broadcast_to(
                        sin_ref[0, 14 + r][:, None], wq)
        else:
            @pl.when(step == 0)
            def _init():
                s_ref[...] = jnp.zeros_like(s_ref)
                edge_s[...] = jnp.zeros_like(edge_s)

        w8 = x_ref.shape[-2:]
        cb = w8[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, w8, 1)

        def shifted_rows(tile, lag1_edge, lag2_edge):
            """[ln, R, cb] -> (shift-by-1, shift-by-2) along the absolute
            sample order (j fastest, k next, chunks via edges; edge rows
            are [R, cb] lane-broadcasts of the previous chunk's last
            samples, consumed at lane 0)."""
            top1 = jnp.where(lane == 0, lag1_edge,
                             pltpu.roll(tile[ln - 1], 1, 1))
            top2 = jnp.where(lane == 0, lag2_edge,
                             pltpu.roll(tile[ln - 2], 1, 1))
            sh1 = jnp.concatenate([top1[None], tile[:-1]], axis=0)
            sh2 = jnp.concatenate([top2[None], sh1[:-1]], axis=0)
            return sh1, sh2

        def coef_shifted(c_ref, ce_edge):
            """Per-sample-shifted block-rate coefficient rows: value at
            sample i is the coef of block (i-1)>>6. Returns a list of lb+1
            row values: index r covers samples j with (j-1)>>6 == r-1,
            i.e. rows[0] is the j=0 special row."""
            prev = jnp.where(lane == 0, ce_edge,
                             pltpu.roll(c_ref[0, lb - 1], 1, 1))
            return [prev] + [c_ref[0, r] for r in range(lb)]

        def defect_into(d_s, z_tile, y0_tile, na1_ref, na2_ref,
                        ze1, ze2, ye1, ye2, ce1, ce2):
            """d = (z + 2 z1 + z2) - ((y0-y1)-(y1-y2)) - e1 y1 - e2 y2,
            evaluated per coefficient row block to bound VMEM temps.
            e1 = 2 - na1s, e2 = -na2s - 1 (na tiles are negated denoms)."""
            z1, z2 = shifted_rows(z_tile, ze1, ze2)
            y1v, y2v = shifted_rows(y0_tile, ye1, ye2)
            na1_rows = coef_shifted(na1_ref, ce1)
            na2_rows = coef_shifted(na2_ref, ce2)
            for jb in range(lb):
                lo, hi = jb * cblock, (jb + 1) * cblock
                zb = z_tile[lo:hi]
                z1b, z2b = z1[lo:hi], z2[lo:hi]
                y0b, y1b, y2b = y0_tile[lo:hi], y1v[lo:hi], y2v[lo:hi]
                # shifted-coefficient rows: a1 is indexed at sample i-1
                # (block (i-1)>>6: the previous row at exactly j == lo),
                # a2 at sample i-2 (block (i-2)>>6: the previous row for
                # the first TWO rows of the block — and both land in the
                # same previous block, so they share one carried value)
                na1_hold = jnp.broadcast_to(na1_rows[jb + 1][None],
                                            (hi - lo,) + w8)
                na2_hold = jnp.broadcast_to(na2_rows[jb + 1][None],
                                            (hi - lo,) + w8)
                na1s = jnp.concatenate([na1_rows[jb][None],
                                        na1_hold[1:]], axis=0)
                na2s = jnp.concatenate([na2_rows[jb][None],
                                        na2_rows[jb][None],
                                        na2_hold[2:]], axis=0)
                e1 = 2.0 - na1s
                e2 = -na2s - 1.0
                second = (y0b - y1b) - (y1b - y2b)
                d_s[lo:hi] = (zb + 2.0 * z1b + z2b) - second \
                    - e1 * y1b - e2 * y2b

        def solve(read, srow):
            M = _phase1(read, ln, w8, p11_s, p12_s, q1_s)
            S1, S2, V1, V2 = _phase2(M, s_ref, srow, T, w8, return_v=True)
            return M, S1, S2, (V1, V2)

        def correction(M, na1_ref, na2_ref, srow):
            def read_nad(j):
                jb = j >> shift
                return (na1_ref[0, jb], na2_ref[0, jb], d_s[j])

            r1, r2 = _corr_phase1(read_nad, ln, w8, q1_s)
            m11, m12, m21, m22 = M[0], M[1], M[2], M[3]
            S1, S2, V1, V2 = _phase2((m11, m12, m21, m22, r1, r2),
                                     s_ref, srow, T, w8, return_v=True)
            return S1, S2, (V1, V2)

        def export_section(base, Vs, Vc, z_tile, y0_tile,
                           na1_ref, na2_ref):
            """sout rows base..base+9 at the final real block's lane."""
            LL = last_lane
            sout_ref[0, base + 0] = Vs[0][:, LL]
            sout_ref[0, base + 1] = Vs[1][:, LL]
            sout_ref[0, base + 2] = Vc[0][:, LL]
            sout_ref[0, base + 3] = Vc[1][:, LL]
            sout_ref[0, base + 4] = z_tile[ln - 1, :, LL]
            sout_ref[0, base + 5] = z_tile[ln - 2, :, LL]
            sout_ref[0, base + 6] = y0_tile[ln - 1, :, LL]
            sout_ref[0, base + 7] = y0_tile[ln - 2, :, LL]
            sout_ref[0, base + 8] = na1_ref[0, lb - 1, :, LL]
            sout_ref[0, base + 9] = na2_ref[0, lb - 1, :, LL]

        def edge_update(base, z_tile, y0_tile, na1_ref, na2_ref):
            def bc(row):
                return jnp.broadcast_to(row[:, cb - 1:cb], w8)

            edge_s[base + 0] = bc(z_tile[ln - 1])
            edge_s[base + 1] = bc(z_tile[ln - 2])
            edge_s[base + 2] = bc(y0_tile[ln - 1])
            edge_s[base + 3] = bc(y0_tile[ln - 2])
            edge_s[base + 4] = bc(na1_ref[0, lb - 1])
            edge_s[base + 5] = bc(na2_ref[0, lb - 1])

        # ---- section A --------------------------------------------------
        def read_a(j):
            jb = j >> shift
            na1 = na1a_ref[0, jb]
            na2 = na2a_ref[0, jb]
            xj = x_ref[0, j]
            return (na1, na2, (2.0 + na1) * xj, (1.0 + na2) * xj)

        # NOTE the sign convention: the coef tiles hold the POSITIVE
        # denominator feedbacks na = -a; the constant numerators (1,2,1)
        # give c-terms (2 - (-na)) ... == (2 + na), matching the existing
        # lp24 kernels.
        Ma, S1a, S2a, Vsa = solve(read_a, 0)
        y0_s[...] = x_ref[0] + (
            p11_s[...] * S1a[None] + p12_s[...] * S2a[None] + q1_s[...]
        )
        ea = [edge_s[i] for i in range(6)]
        defect_into(d_s, x_ref[0], y0_s[...], na1a_ref, na2a_ref, *ea)
        edge_update(0, x_ref[0], y0_s[...], na1a_ref, na2a_ref)
        S1c, S2c, Vca = correction(Ma, na1a_ref, na2a_ref, 2)
        if state_io:
            # y0_s still holds section A's solve output here (section B
            # overwrites it below)
            @pl.when(step == nchunks - 1)
            def _export_a():
                export_section(0, Vsa, Vca, x_ref[0], y0_s,
                               na1a_ref, na2a_ref)
        ya_s[...] = y0_s[...] + (
            d_s[...] + p11_s[...] * S1c[None] + p12_s[...] * S2c[None]
            + q1_s[...]
        )

        # ---- section B --------------------------------------------------
        def read_b(j):
            jb = j >> shift
            na1 = na1b_ref[0, jb]
            na2 = na2b_ref[0, jb]
            zj = ya_s[j]
            return (na1, na2, (2.0 + na1) * zj, (1.0 + na2) * zj)

        Mb, S1b, S2b, Vsb = solve(read_b, 4)
        y0_s[...] = ya_s[...] + (
            p11_s[...] * S1b[None] + p12_s[...] * S2b[None] + q1_s[...]
        )
        eb = [edge_s[8 + i] for i in range(6)]
        defect_into(d_s, ya_s[...], y0_s[...], na1b_ref, na2b_ref, *eb)
        edge_update(8, ya_s[...], y0_s[...], na1b_ref, na2b_ref)
        S1d, S2d, Vcb = correction(Mb, na1b_ref, na2b_ref, 6)
        if state_io:
            @pl.when(step == nchunks - 1)
            def _export_b():
                export_section(10, Vsb, Vcb, ya_s, y0_s,
                               na1b_ref, na2b_ref)
        y_ref[0] = y0_s[...] + (
            d_s[...] + p11_s[...] * S1d[None] + p12_s[...] * S2d[None]
            + q1_s[...]
        )

    if state_io:
        def kernel(sin_ref, x_ref, na1a_ref, na2a_ref, na1b_ref,
                   na2b_ref, y_ref, sout_ref, s_ref, p11_s, p12_s, q1_s,
                   y0_s, ya_s, d_s, edge_s):
            body(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
                 s_ref, p11_s, p12_s, q1_s, y0_s, ya_s, d_s, edge_s,
                 sin_ref=sin_ref, sout_ref=sout_ref)
    else:
        def kernel(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
                   s_ref, p11_s, p12_s, q1_s, y0_s, ya_s, d_s, edge_s):
            body(x_ref, na1a_ref, na2a_ref, na1b_ref, na2b_ref, y_ref,
                 s_ref, p11_s, p12_s, q1_s, y0_s, ya_s, d_s, edge_s)

    return kernel, lb


@functools.partial(jax.jit, static_argnames=("cblock", "interpret"))
def _lp24_refined_blk_2d(x, na1a, na2a, na1b, na2b, cblock: int,
                         interpret: bool = False):
    B, n = x.shape
    # 6 full-tile scratches + double-buffered IO bound VMEM here
    ln, nb, cb, nchunks, nbp, G, T, R = _geom_blk(B, n, cblock,
                                                  max_r=REFINED_MAX_R)
    kernel, lb = _make_kernel_lp24_refined_blk(ln, T, cblock)
    nb64 = na1a.shape[-1]
    foldb = lambda v: _pad_fold_blk(v, B, nb64, G, lb, nbp, R)  # noqa: E731
    spec = _spec(ln, R, cb)
    bspec = pl.BlockSpec((1, lb, R, cb), lambda g, i: (g, 0, 0, i),
                         memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(G, nchunks),
        in_specs=[spec] + [bspec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, R, cb), jnp.float32),    # 4 state pairs
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p11 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # p12 rows
            pltpu.VMEM((ln, R, cb), jnp.float32),   # q1 rows (solve+corr)
            pltpu.VMEM((ln, R, cb), jnp.float32),   # y0 staging
            pltpu.VMEM((ln, R, cb), jnp.float32),   # refined A staging
            pltpu.VMEM((ln, R, cb), jnp.float32),   # defect staging
            pltpu.VMEM((16, R, cb), jnp.float32),   # chunk-edge carries
        ],
        interpret=interpret,
    )(_pad_fold(x, B, n, G, ln, nbp, R), foldb(na1a), foldb(na2a),
      foldb(na1b), foldb(na2b))
    return _unfold(y, B, n)


def lp24_refined_blockrate_pallas(x, sections_b, cblock: int = 64,
                                  interpret: bool | None = None):
    """Fused lp24 cascade WITH the defect-correction refinement pass
    (cf. ops/iir.biquad_blockrate_refined): one kernel, intermediates in
    VMEM, correction reusing the solve prefix rows."""
    interpret = _interp(interpret)
    shape = x.shape
    flat = _flat(x)
    nb64 = -(-shape[-1] // cblock)
    cshape = shape[:-1] + (nb64,)
    na1a, na2a = _denoms_blk(sections_b[0], cshape, flat.shape[0], nb64)
    na1b, na2b = _denoms_blk(sections_b[1], cshape, flat.shape[0], nb64)
    out = _lp24_refined_blk_2d(flat, na1a, na2a, na1b, na2b, cblock,
                               interpret=interpret)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("cblock", "interpret"))
def _lp24_refined_blk_state_2d(x, na1a, na2a, na1b, na2b, state,
                               cblock: int, interpret: bool = False):
    """Stateful refined cascade. state: [B, 20] (see
    _make_kernel_lp24_refined_blk). In-block length pins to cblock so
    chained calls are bitwise one long call for any 64-multiple
    segmenting. Returns (y [B, n], state' [B, 20])."""
    B, n = x.shape
    ln, nb, cb, nchunks, nbp, G, T, R = _geom_blk(
        B, n, cblock, max_r=REFINED_MAX_R, pin_ln=True)
    kernel, lb = _make_kernel_lp24_refined_blk(
        ln, T, cblock, nchunks=nchunks, last_lane=(nb - 1) % cb,
        state_io=True)
    nb64 = na1a.shape[-1]
    foldb = lambda v: _pad_fold_blk(v, B, nb64, G, lb, nbp, R)  # noqa: E731
    spec = _spec(ln, R, cb)
    bspec = pl.BlockSpec((1, lb, R, cb), lambda g, i: (g, 0, 0, i),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 20, R), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    sp = jnp.pad(jnp.asarray(state, jnp.float32), [(0, G * R - B), (0, 0)])
    sp = sp.reshape(G, R, 20).transpose(0, 2, 1)  # [G, 20, R]
    y, sout = pl.pallas_call(
        kernel,
        grid=(G, nchunks),
        in_specs=[sspec, spec] + [bspec] * 4,
        out_specs=[spec, sspec],
        out_shape=[jax.ShapeDtypeStruct((G, ln, R, nbp), jnp.float32),
                   jax.ShapeDtypeStruct((G, 20, R), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((8, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((ln, R, cb), jnp.float32),
            pltpu.VMEM((16, R, cb), jnp.float32),
        ],
        interpret=interpret,
    )(sp, _pad_fold(x, B, n, G, ln, nbp, R), foldb(na1a), foldb(na2a),
      foldb(na1b), foldb(na2b))
    state_out = sout.transpose(0, 2, 1).reshape(G * R, 20)[:B]
    return _unfold(y, B, n), state_out


def lp24_refined_blockrate_stream_pallas(x, sections_b, state,
                                         cblock: int = 64,
                                         interpret: bool | None = None):
    """Fused refined lp24 cascade with carried state — the kernel form
    of segment-streaming the refinement. x: [..., n]; state: [..., 20]
    (zeros to start). Chaining calls through the state is bitwise one
    long call. n must be a multiple of cblock (see
    lp24_blockrate_stream_pallas: unaligned calls would export state
    contaminated by padded zero samples). Returns (y, state')."""
    interpret = _interp(interpret)
    shape = x.shape
    if shape[-1] % cblock:
        raise ValueError(
            f"stateful stream kernel needs n % {cblock} == 0, got "
            f"{shape[-1]} (exported state would include padded samples)")
    flat = _flat(x)
    nb64 = -(-shape[-1] // cblock)
    cshape = shape[:-1] + (nb64,)
    na1a, na2a = _denoms_blk(sections_b[0], cshape, flat.shape[0], nb64)
    na1b, na2b = _denoms_blk(sections_b[1], cshape, flat.shape[0], nb64)
    st = jnp.asarray(state, jnp.float32).reshape(flat.shape[0], 20)
    y, st2 = _lp24_refined_blk_state_2d(flat, na1a, na2a, na1b, na2b,
                                        st, cblock, interpret=interpret)
    return y.reshape(shape), st2.reshape(shape[:-1] + (20,))

"""Pallas biquad kernel vs the XLA blocked-scan implementation.

Runs in interpreter mode on CPU; same recurrence and association order as
ops/iir.biquad (bit-exact on TPU; within FMA-contraction noise on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from groove_tpu.ops import iir
from groove_tpu.ops.pallas_iir import biquad_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_matches_xla_time_varying(rng):
    n = 3000
    x = rng.standard_normal(n).astype(np.float32)
    cutoff = np.linspace(200.0, 8000.0, n).astype(np.float32)
    coefs = iir.rbj_low_pass(cutoff, 0.707, 44100.0)
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs))
    y_pl = np.asarray(biquad_pallas(jnp.asarray(x), coefs, interpret=True))
    # op-order identical, but backend FMA contraction differs per platform:
    # exact on TPU, ~1e-6 on CPU interpret-vs-XLA
    assert np.max(np.abs(y_pl - y_ref)) < 1e-5


def test_matches_xla_batched_static(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    coefs = iir.rbj_high_pass(500.0, 2.0, 44100.0)  # Q=2: resonant
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs))
    y_pl = np.asarray(biquad_pallas(jnp.asarray(x), coefs, interpret=True))
    err = np.sqrt(np.mean((y_pl - y_ref) ** 2))
    ref = np.sqrt(np.mean(y_ref**2))
    assert 20 * np.log10(err / ref + 1e-20) < -90


def test_multi_chunk_state_carries(rng):
    # longer than CB*L samples forces multiple grid chunks per batch row
    from groove_tpu.ops.pallas_iir import CB, L
    n = CB * L + 5 * L + 3
    x = rng.standard_normal(n).astype(np.float32)
    coefs = iir.rbj_low_pass(300.0, 1.0, 44100.0)
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs))
    y_pl = np.asarray(biquad_pallas(jnp.asarray(x), coefs, interpret=True))
    # f32 FMA/ordering differs between the interpreted kernel and the XLA
    # scan on CPU; 300 Hz poles amplify it. ~-78 dBFS is the honest bound.
    assert np.max(np.abs(y_pl - y_ref)) < 5e-4


def test_scalar_coef_path_matches_xla(rng):
    """Scalar coefficients take the SMEM fast path; same numerics."""
    x = rng.standard_normal((5, 4096)).astype(np.float32)
    coefs = tuple(float(c) for c in
                  np.asarray(iir.rbj_low_pass(800.0, 1.5, 44100.0)))
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs))
    y_pl = np.asarray(biquad_pallas(jnp.asarray(x), coefs, interpret=True))
    # interpret-vs-XLA FMA contraction at Q=1.5 resonance; exact on TPU
    assert np.max(np.abs(y_pl - y_ref)) < 5e-5


def test_lp24_fused_matches_sequential_sections(rng):
    from groove_tpu.ops.pallas_iir import lp24_cascade_pallas

    n = 20000
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    cutoff = np.linspace(100.0, 12000.0, n).astype(np.float32)
    gain, secs = iir.lp24_sections(jnp.asarray(cutoff), 0.8, 44100.0)
    xg = jnp.asarray(x) * gain
    y_ref = iir.biquad(iir.biquad(xg, secs[0]), secs[1])
    y_pl = lp24_cascade_pallas(xg, secs, interpret=True)
    assert float(jnp.max(jnp.abs(y_pl - y_ref))) < 1e-4


def test_batched_many_rows_sublane_packing(rng):
    """B > 8 exercises the 8-rows-per-sublane-group layout."""
    x = rng.standard_normal((19, 3000)).astype(np.float32)
    cutoff = np.linspace(200.0, 6000.0, 3000).astype(np.float32)
    coefs = iir.rbj_low_pass(cutoff, 0.9, 44100.0)
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs))
    y_pl = np.asarray(biquad_pallas(jnp.asarray(x), coefs, interpret=True))
    assert np.max(np.abs(y_pl - y_ref)) < 1e-4


def test_blockrate_biquad_matches_upsampled_xla(rng):
    """Block-rate coefficients (the reference's 64-frame control cadence):
    the Pallas kernel must equal the XLA path fed hold-upsampled coefs."""
    from groove_tpu.ops.iir import block_for, upsample_hold
    from groove_tpu.ops.pallas_iir import biquad_blockrate_pallas

    n = 13000
    nb = -(-n // 64)
    x = rng.standard_normal((3, n)).astype(np.float32)
    cutoff_b = np.linspace(300.0, 9000.0, nb).astype(np.float32)
    coefs_b = iir.rbj_low_pass(cutoff_b, 0.8, 44100.0)
    coefs_ps = tuple(upsample_hold(c, n) for c in coefs_b)
    y_ref = np.asarray(iir.biquad(jnp.asarray(x), coefs_ps,
                                  block=max(block_for(n), 64)))
    y_pl = np.asarray(biquad_blockrate_pallas(jnp.asarray(x), coefs_b,
                                              interpret=True))
    assert np.max(np.abs(y_pl - y_ref)) < 5e-5


def test_blockrate_lp24_matches_xla_fallback(rng):
    """lp24_apply_blockrate: TPU kernel path vs CPU fallback parity is
    checked structurally (the fallback is itself validated against the f64
    serial reference in test_iir); here interpret-mode kernel vs fallback."""
    from groove_tpu.ops import iir as iir_ops
    from groove_tpu.ops.pallas_iir import lp24_blockrate_pallas

    n = 9000
    nb = -(-n // 64)
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    cutoff_b = jnp.asarray(np.linspace(80.0, 11000.0, nb).astype(np.float32))
    gain_b, secs_b = iir_ops.lp24_sections(cutoff_b, 0.9, 44100.0)
    xg = jnp.asarray(x) * iir_ops.upsample_hold(gain_b, n)
    block = max(iir_ops.block_for(n), 64)
    y_ref = xg
    for sec in secs_b:
        coefs = tuple(iir_ops.upsample_hold(
            jnp.broadcast_to(jnp.asarray(c, jnp.float32), (nb,)), n)
            for c in sec)
        y_ref = iir.biquad(y_ref, coefs, block=block)
    y_pl = lp24_blockrate_pallas(xg, secs_b, interpret=True)
    assert float(jnp.max(jnp.abs(y_pl - y_ref))) < 1e-4


def test_cascade2_matches_sequential_sections(rng):
    from groove_tpu.ops.pallas_iir import cascade2_pallas

    n = 20000
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    cutoff = np.linspace(100.0, 12000.0, n).astype(np.float32)
    gain, secs = iir.lp24_sections(jnp.asarray(cutoff), 0.8, 44100.0)
    xg = jnp.asarray(x) * gain
    y_ref = iir.biquad(iir.biquad(xg, secs[0]), secs[1])
    y_pl = cascade2_pallas(xg, secs[0], secs[1], interpret=True)
    assert float(jnp.max(jnp.abs(y_pl - y_ref))) < 1e-4


def test_lp24_refined_kernel_matches_xla_on_sweep(rng):
    """The fused refined cascade (solve + defect + correction per section
    in one kernel) vs the XLA per-section refined path on the north-star
    sweep shapes, multi-chunk, with row padding."""
    from groove_tpu.ops.pallas_iir import lp24_refined_blockrate_pallas

    sr = 44100.0
    cblock = 64
    n = 165376
    B = 3
    nb = -(-n // cblock)
    hz = np.asarray(25.0 * (800.0 ** np.linspace(0, 1, nb)), np.float32)
    x = (rng.standard_normal((B, n)) * 0.3).astype(np.float32)
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(0.707), sr)
    xg = jnp.asarray(x) * iir.upsample_hold(gain_b, n)
    secs_bc = [
        tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32), (B, nb))
              for c in s_)
        for s_ in secs
    ]
    y_ref = xg
    for sec in secs_bc:
        y_ref = iir.biquad_blockrate_refined(y_ref, sec, cblock)
    y_pl = lp24_refined_blockrate_pallas(xg, secs_bc, cblock, interpret=True)
    # both are refined approximations of the same f64 truth (each ~-88
    # dBFS); their mutual difference is of that order
    assert float(jnp.max(jnp.abs(y_pl - y_ref))) < 2e-4


def test_lp24_refined_kernel_beats_bar_on_parked_resonance(rng):
    """The acid-bass operating point (330 Hz at q 4.3 held): the plain
    blocked cascade measures -62 dBFS vs f64; the fused refined kernel
    must clear -80 (measures ~-140)."""
    from groove_tpu.ops.pallas_iir import lp24_refined_blockrate_pallas

    sr = 44100.0
    cblock = 64
    n = 65536
    nb = n // cblock
    hz = np.full(nb, 330.0, np.float32)
    x = (rng.standard_normal(n) * 0.3).astype(np.float32)
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(4.307), sr)
    xg = np.asarray(jnp.asarray(x) * iir.upsample_hold(gain_b, n))

    def serial64(inp, sec):
        cs = [np.asarray(iir.upsample_hold(jnp.broadcast_to(
            jnp.asarray(c, jnp.float32), (nb,)), n), np.float64)
            for c in sec]
        b0, b1, b2, a1, a2 = cs
        y = inp.astype(np.float64)
        out = np.empty(n)
        s1 = s2 = 0.0
        for i in range(n):
            yi = b0[i] * y[i] + s1
            s1 = b1[i] * y[i] - a1[i] * yi + s2
            s2 = b2[i] * y[i] - a2[i] * yi
            out[i] = yi
        return out

    y64 = serial64(serial64(xg, secs[0]), secs[1])
    secs_bc = [
        tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32), (1, nb))
              for c in s_)
        for s_ in secs
    ]
    y_pl = np.asarray(lp24_refined_blockrate_pallas(
        jnp.asarray(xg[None]), secs_bc, cblock, interpret=True))[0]
    db = 20 * np.log10(float(np.abs(y_pl - y64).max()) + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_lp24_refined_kernel_beats_bar_on_deep_corner(rng):
    """The deepest reachable welsh operating point (octave-switch rests
    its cascade at 25 Hz with q 5.33): the fused kernel must clear the
    -80 dBFS bar (measures ~-101; the XLA per-section refined fallback
    converges too slowly here — section A's output sits in f32 noise and
    section B's resonance amplifies it — which is why the TPU kernel is
    the production path and the CPU deviation is documented)."""
    from groove_tpu.ops.pallas_iir import lp24_refined_blockrate_pallas

    sr = 44100.0
    cblock = 64
    n = 8192
    nb = n // cblock
    hz = np.full(nb, 25.0, np.float32)
    x = (rng.standard_normal((1, n)) * 0.3).astype(np.float32)
    gain_b, secs = iir.lp24_sections(jnp.asarray(hz), jnp.float32(5.331), sr)
    xg = np.asarray(jnp.asarray(x) * iir.upsample_hold(gain_b, n))
    secs_bc = [
        tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32), (1, nb))
              for c in s_)
        for s_ in secs
    ]

    def serial64(inp, sec):
        cs = [np.asarray(iir.upsample_hold(jnp.asarray(c[0]), n), np.float64)
              for c in sec]
        b0, b1, b2, a1, a2 = cs
        y = inp.astype(np.float64)
        out = np.empty(n)
        s1 = s2 = 0.0
        for i in range(n):
            yi = b0[i] * y[i] + s1
            s1 = b1[i] * y[i] - a1[i] * yi + s2
            s2 = b2[i] * y[i] - a2[i] * yi
            out[i] = yi
        return out

    y64 = serial64(serial64(xg[0], secs_bc[0]), secs_bc[1])
    y_pl = np.asarray(lp24_refined_blockrate_pallas(
        jnp.asarray(xg), secs_bc, cblock, interpret=True))[0]
    db = 20 * np.log10(float(np.abs(y_pl - y64).max()) + 1e-30)
    assert db <= -80.0, f"{db:.1f} dBFS"


def test_lp24_blockrate_stream_state_kernel_matches_xla_stream():
    """Stateful lp24 kernel (lp24_blockrate_stream_pallas, interpret
    mode): (a) output/exit state track the XLA streamed contract
    (ops/stream.biquad_stream per section at the fixed 64-grid) to the
    blockrate-kernel tolerance — the kernel reads block-rate coefs
    directly, so its groupings differ from the upsampled XLA path like
    the other blockrate kernels (5e-5-ish at benign q; high-q cases are
    routed to refine/serial by the fidelity planner anyway) — and
    (b) chaining two half-length calls through the state is BITWISE one
    full call: the segmentation-invariance the sliced welsh path needs."""
    import jax.numpy as jnp

    from groove_tpu.ops import iir, stream as sops
    from groove_tpu.ops.pallas_iir import lp24_blockrate_stream_pallas

    rng = np.random.default_rng(11)
    B, n, cb = 5, 4096, 64
    nb = n // cb
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    cut = jnp.asarray(200 + 4000 * rng.random((B, nb)), jnp.float32)
    gain_b, secs_b = iir.lp24_sections(cut, jnp.float32(0.8), 44100.0)
    y_in = x * iir.upsample_hold(gain_b, n, cb)
    st0 = jnp.asarray(rng.standard_normal((B, 4)) * 0.1, jnp.float32)

    # XLA streamed reference: two biquad_stream sections, same entry state
    y_ref = y_in
    sts = []
    for i, sec in enumerate(secs_b):
        sec_ps = tuple(iir.upsample_hold(
            jnp.broadcast_to(jnp.asarray(c, jnp.float32), (B, nb)), n, cb)
            for c in sec)
        y_ref, (s1, s2) = sops.biquad_stream(
            y_ref, sec_ps, (st0[:, 2 * i], st0[:, 2 * i + 1]))
        sts += [s1, s2]
    st_ref = jnp.stack(sts, axis=1)

    y_k, st_k = lp24_blockrate_stream_pallas(
        y_in, secs_b, st0, cblock=cb, interpret=True)
    peak = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_k - y_ref).max()) < 1e-4 * max(peak, 1.0)
    # exit states are internal TDF2 quantities (can be ~1e3 at low
    # cutoffs); compare relative to their own scale
    speak = float(jnp.abs(st_ref).max())
    assert float(jnp.abs(st_k - st_ref).max()) < 1e-4 * max(speak, 1.0)

    # chaining: two half calls through the state == one call (bitwise)
    h = n // 2
    secs_h1 = [tuple(jnp.asarray(c)[..., :nb // 2] for c in s)
               for s in secs_b]
    secs_h2 = [tuple(jnp.asarray(c)[..., nb // 2:] for c in s)
               for s in secs_b]
    ya, sa = lp24_blockrate_stream_pallas(
        y_in[:, :h], secs_h1, st0, cblock=cb, interpret=True)
    yb, sb = lp24_blockrate_stream_pallas(
        y_in[:, h:], secs_h2, sa, cblock=cb, interpret=True)
    assert np.array_equal(np.concatenate([ya, yb], axis=1),
                          np.asarray(y_k))
    assert np.array_equal(np.asarray(sb), np.asarray(st_k))


def test_lp24_refined_stream_state_kernel_chaining():
    """Stateful REFINED cascade kernel: zero-state call equals the plain
    refined kernel bitwise (the body refactor is pure code motion; pick n
    so both use the same in-block length), and chaining half-length
    calls through the 20-float state is bitwise one full call."""
    import jax.numpy as jnp

    from groove_tpu.ops import iir
    from groove_tpu.ops.pallas_iir import (
        lp24_refined_blockrate_pallas,
        lp24_refined_blockrate_stream_pallas,
    )

    rng = np.random.default_rng(23)
    B, n, cb = 3, 4096, 64  # block_for(4096) == 64 == cb
    nb = n // cb
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    cut = jnp.asarray(60 + 500 * rng.random((B, nb)), jnp.float32)
    gain_b, secs_b = iir.lp24_sections(cut, jnp.float32(4.0), 44100.0)
    y_in = x * iir.upsample_hold(gain_b, n, cb)

    y_plain = lp24_refined_blockrate_pallas(y_in, secs_b, cb,
                                            interpret=True)
    y_st, st = lp24_refined_blockrate_stream_pallas(
        y_in, secs_b, jnp.zeros((B, 20)), cblock=cb, interpret=True)
    assert np.array_equal(np.asarray(y_st), np.asarray(y_plain)), \
        f"zero-state mismatch {float(jnp.abs(y_st - y_plain).max())}"

    h = n // 2
    secs_h1 = [tuple(jnp.asarray(c)[..., :nb // 2] for c in s)
               for s in secs_b]
    secs_h2 = [tuple(jnp.asarray(c)[..., nb // 2:] for c in s)
               for s in secs_b]
    ya, sa = lp24_refined_blockrate_stream_pallas(
        y_in[:, :h], secs_h1, jnp.zeros((B, 20)), cblock=cb,
        interpret=True)
    yb, sb = lp24_refined_blockrate_stream_pallas(
        y_in[:, h:], secs_h2, sa, cblock=cb, interpret=True)
    assert np.array_equal(np.concatenate([ya, yb], axis=1),
                          np.asarray(y_st)), "chained halves diverge"
    assert np.array_equal(np.asarray(sb), np.asarray(st))

"""Full-song float64 serial reference renderer (VERDICT r2 item 6).

The literal semantics of the reference's per-sample render loop
(orchestration/src/orchestrator.rs:367-470: per-sample DFS from the main
mixer, controllers at 64-frame work granularity) evaluated in numpy
float64 with STRICTLY SERIAL per-sample IIR recurrences — the gold
standard the shipped f32 XLA/Pallas render is measured against at the
song level (tests/test_f64_golden.py: residual ≤ −80 dBFS for the
BASELINE configs). This is the strongest honest substitute for the
reference WAVs the snapshot cannot produce (BASELINE.md fidelity row).

Scope: the device kinds live in the BASELINE configs (welsh, drumkit,
gain, bitcrusher, filter-low-pass-12db, filter-low-pass-24db, mixer) —
raises for anything else, loudly. Semantics mirror the engine exactly
(same reconstruction decisions, same 64-frame control cadence, same
note-window alignment); only the arithmetic precision and the IIR
evaluation ORDER (serial TDF2) differ, which is the point.

Methodology (matching the repo's kernel-level golden tests,
tests/test_iir.py `_tv_serial_ref64`): the reference uses the ENGINE'S OWN
f32 oscillator phases and f32 filter coefficients (computed by the same
eager jnp formulas the jitted program traces), then evaluates everything
downstream — mixing, the IIR recurrences, envelope application, effects —
in exact float64 serial arithmetic. Sharing the f32 controls is load-
bearing, not a shortcut: a 1-ulp difference in an oscillator frequency
flips saw/pulse EDGE samples (full-scale residual at isolated samples),
and f32 coefficient quantization alone shifts long-residence pole
responses by ~-60 dB — neither measures the thing under test, which is
the engine's parallel/blocked/Pallas evaluation of those exact filters
and signals.
"""

from __future__ import annotations

import numpy as np

from groove_tpu.compiler.song import CompiledSong, DeviceIR, MAIN_MIXER_UVID

BLOCK = 64
LN_BASE = np.log(800.0)
LN_COEF = np.log(25.0)
_LP24_B1 = (0.765367, 1.847759)


# ---- primitives (f64 ports of ops/*, formulas identical) -----------------


def _frac(p):
    return p - np.floor(p)


def _wave(kind, phase, width=0.5):
    if kind == "sine" or kind == "triangle-sine":
        return np.sin(2.0 * np.pi * phase)
    if kind == "square":
        return np.where(_frac(phase) < 0.5, 1.0, -1.0)
    if kind == "pulse-width":
        return np.where(_frac(phase) < width, 1.0, -1.0)
    if kind == "sawtooth":
        return 2.0 * _frac(phase) - 1.0
    if kind == "triangle":
        f = _frac(phase)
        return np.where(f < 0.5, 4.0 * f - 1.0, 3.0 - 4.0 * f)
    if kind in ("none", "debug-zero"):
        return np.zeros_like(phase)
    raise NotImplementedError(f"f64 reference: waveform {kind!r}")


def _adsr(t, t_off, a, d, s, r):
    eps = 1e-9
    aa, dd, rr = max(a, eps), max(d, eps), max(r, eps)

    def held(tv):
        v_attack = tv / aa
        v_decay = 1.0 - (1.0 - s) * (tv - a) / dd
        return np.where(tv < a, v_attack, np.where(tv < a + d, v_decay, s))

    rel = held(t_off) * (1.0 - (t - t_off) / rr)
    env = np.where(t < t_off, held(t), rel)
    return np.clip(env, 0.0, 1.0)


def _tdf2_serial(x, coefs_per_sample):
    """Strictly serial TDF2, f64; coefs are per-sample arrays [n]."""
    b0, b1, b2, a1, a2 = coefs_per_sample
    out = np.empty_like(x)
    s1 = s2 = 0.0
    for i in range(len(x)):
        yi = b0[i] * x[i] + s1
        s1 = b1[i] * x[i] - a1[i] * yi + s2
        s2 = b2[i] * x[i] - a2[i] * yi
        out[i] = yi
    return out


def _tdf2_serial_notes(x, coefs_blocks):
    """Serial TDF2 over [notes, span] with per-block coefs held for 64
    samples (the reference's control cadence); vectorized across notes,
    serial over time. coefs_blocks: 5-tuple of [notes, nb]."""
    b0, b1, b2, a1, a2 = coefs_blocks
    n_notes, span = x.shape
    out = np.empty_like(x)
    s1 = np.zeros(n_notes)
    s2 = np.zeros(n_notes)
    for i in range(span):
        b = i // BLOCK
        yi = b0[:, b] * x[:, i] + s1
        s1 = b1[:, b] * x[:, i] - a1[:, b] * yi + s2
        s2 = b2[:, b] * x[:, i] - a2[:, b] * yi
        out[:, i] = yi
    return out


def _upsample(curve, n):
    up = np.repeat(np.asarray(curve, np.float64), BLOCK)
    if len(up) < n:
        up = np.pad(up, (0, n - len(up)), mode="edge")
    return up[:n]


def _pan_gains(pan):
    left = 1.0 - 0.25 * (pan + 1.0) ** 2
    right = 1.0 - (0.5 * pan - 0.5) ** 2
    return left, right


# ---- instruments ----------------------------------------------------------


def _render_welsh(dev: DeviceIR, span: int, sr: float) -> np.ndarray:
    """All notes -> mono [n_notes, span], f64. Mirrors
    models/welsh.render_notes for LFO-none noise-0 patches (the BASELINE
    patch set); raises otherwise. Oscillator phases + filter-control curve
    come from the SAME eager jnp f32 formulas the engine traces (see
    module docstring); mixing/filtering/envelopes evaluate in f64."""
    import jax.numpy as jnp

    from groove_tpu.models.voices import note_freqs
    from groove_tpu.ops import envelope as env_ops
    from groove_tpu.ops import iir as iir_ops

    p = dev.voice
    if p.lfo.routing != "none" and p.lfo.depth != 0.0 and p.lfo.frequency > 0:
        raise NotImplementedError("f64 reference: welsh LFO routings")
    if p.noise > 0.0:
        raise NotImplementedError("f64 reference: welsh noise mix")
    notes = dev.notes
    vels = np.asarray(notes.vels, np.float64)
    gate = (notes.off_frames - notes.on_frames).astype(np.float64)
    n_notes = len(vels)

    # --- f32 controls, engine-identical op sequence ---
    t32 = jnp.asarray(np.arange(span, dtype=np.float32)[None, :]
                      / np.float32(sr))
    base32 = note_freqs(jnp.asarray(notes.keys, jnp.float32))[:, None]
    gate_s32 = jnp.asarray(gate, jnp.float32)[:, None] / sr

    def osc_freq32(osc, fixed_hz):
        if fixed_hz is not None:
            return jnp.full((n_notes, 1), fixed_hz, jnp.float32)
        return base32 * osc.tune_ratio

    f1_32 = jnp.broadcast_to(osc_freq32(p.oscillator_1, None),
                             (n_notes, span))
    f2_32 = jnp.broadcast_to(
        osc_freq32(p.oscillator_2, p.oscillator_2_fixed_hz),
        (n_notes, span))
    ph1_32 = f1_32 * t32
    o1 = p.oscillator_1.waveform.kind != "none"
    o2 = p.oscillator_2.waveform.kind != "none"
    if p.oscillator_2_sync and o1:
        fr = ph1_32 - jnp.floor(ph1_32)
        ph2_32 = fr * (f2_32 / jnp.maximum(f1_32, 1e-6))
    else:
        ph2_32 = f2_32 * t32
    ph1 = np.asarray(ph1_32, np.float64)
    ph2 = np.asarray(ph2_32, np.float64)

    cblock = iir_ops.CONTROL_BLOCK
    nb = -(-span // cblock)
    t_blk32 = (jnp.arange(nb, dtype=jnp.float32) * cblock)[None, :] / sr
    fe = p.filter_envelope
    f_env32 = env_ops.adsr(t_blk32, gate_s32, fe.attack, fe.decay,
                           fe.sustain, fe.release)
    pct32 = jnp.clip(
        p.filter_cutoff_start
        + (p.filter_cutoff_end - p.filter_cutoff_start) * f_env32,
        0.0, 1.0)
    hz32 = jnp.exp(np.float32(LN_COEF) + pct32 * np.float32(LN_BASE))
    gain32, secs32 = iir_ops.lp24_sections(
        jnp.broadcast_to(hz32, (n_notes, nb)),
        jnp.float32(max(p.filter_q, 1e-3)), sr)
    gain_b = np.asarray(gain32, np.float64)
    secs = [tuple(np.asarray(jnp.broadcast_to(c, (n_notes, nb)), np.float64)
                  for c in sec) for sec in secs32]

    # --- f64 signal path ---
    s1 = _wave(p.oscillator_1.waveform.kind, ph1,
               p.oscillator_1.waveform.pulse_width)
    s2 = _wave(p.oscillator_2.waveform.kind, ph2,
               p.oscillator_2.waveform.pulse_width)
    mix = p.oscillator_mix
    if o1 and o2:
        osc_out = mix * s1 + (1.0 - mix) * s2
    elif o1:
        osc_out = s1
    elif o2:
        osc_out = s2
    else:
        osc_out = np.zeros((n_notes, span))

    y = osc_out * np.repeat(gain_b, cblock, axis=1)[:, :span]
    for sec in secs:
        y = _tdf2_serial_notes(y, sec)

    t = np.arange(span, dtype=np.float64)[None, :] / sr
    gate_s = gate[:, None] / sr
    ae = p.amp_envelope
    a_env = _adsr(t, gate_s, ae.attack, ae.decay, ae.sustain, ae.release)
    return y * a_env * (vels[:, None] / 127.0)


def _render_drumkit(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """One-shot sample sum -> stereo [2, n], f64 (same slot/round-robin
    assignment; sample data is the same host table)."""
    table = np.asarray(dev.sample_table.data, np.float64)
    lengths = np.asarray(dev.sample_table.lengths)
    if not all(int(r) == int(sr) for r in dev.sample_table.rates):
        raise NotImplementedError("f64 reference: resampled drumkit")
    out = np.zeros((2, n))
    notes = dev.notes
    for i in range(notes.count):
        slot = int(dev.slots[i])
        if slot < 0:
            continue
        on = int(notes.on_frames[i])
        ln = min(int(lengths[slot]), n - on)
        if ln <= 0:
            continue
        out[:, on:on + ln] += table[slot, :, :ln] \
            * (float(notes.vels[i]) / 127.0)
    return out


# ---- effects --------------------------------------------------------------


def _apply_effect(dev: DeviceIR, x: np.ndarray, n: int, sr: float):
    k = dev.kind

    def P(name, default):
        if name in dev.automation:
            return _upsample(dev.automation[name], n)
        return float(dev.params.get(name, default))

    def PB(name, default):
        if name in dev.automation:
            c = np.asarray(dev.automation[name], np.float64)
            nb = -(-n // BLOCK)
            if len(c) < nb:
                c = np.pad(c, (0, nb - len(c)), mode="edge")
            return c[:nb]
        return np.full(-(-n // BLOCK), float(dev.params.get(name, default)))

    if k in ("mixer", "signal-passthrough-controller"):
        return x
    if k == "gain":
        return x * P("ceiling", 1.0)
    if k == "limiter":
        return np.sign(x) * np.clip(np.abs(x), P("minimum", 0.0),
                                    P("maximum", 1.0))
    if k == "bitcrusher":
        if "bits-to-crush" in dev.automation:
            bits = _upsample(dev.automation["bits-to-crush"], n)
        else:
            bits = float(dev.params.get("bits", 8))
        step = np.exp2(np.floor(bits))
        mag = np.trunc(np.abs(x) * 32767.0)
        return np.sign(x) * (np.trunc(mag / step) * step) / 32767.0
    # filter coefficients come from the ENGINE's f32 formulas (eager jnp,
    # same ops the jitted program traces — see module docstring), then the
    # recurrences evaluate serially in f64
    import jax.numpy as jnp

    from groove_tpu.ops import iir as iir_ops

    if k == "filter-low-pass-12db":
        nb = -(-n // BLOCK)
        coefs32 = iir_ops.rbj_low_pass(
            jnp.asarray(PB("cutoff", 1000.0), jnp.float32),
            jnp.maximum(jnp.asarray(PB("q", 0.707), jnp.float32), 1e-3), sr)
        coefs = tuple(
            _upsample(np.asarray(jnp.broadcast_to(c, (nb,)), np.float64), n)
            for c in coefs32)
        return np.stack([_tdf2_serial(x[0], coefs),
                         _tdf2_serial(x[1], coefs)])
    if k == "filter-low-pass-24db":
        nb = -(-n // BLOCK)
        if "passband-ripple" in dev.automation:
            raise NotImplementedError("f64 reference: automated ripple")
        q = max(float(dev.params.get("passband-ripple", 0.707)), 1e-3)
        gain32, secs32 = iir_ops.lp24_sections(
            jnp.asarray(PB("cutoff", 1000.0), jnp.float32),
            jnp.float32(q), sr)
        y = x * _upsample(
            np.asarray(jnp.broadcast_to(gain32, (nb,)), np.float64), n)[None, :]
        for sec in secs32:
            coefs = tuple(
                _upsample(np.asarray(jnp.broadcast_to(c, (nb,)), np.float64), n)
                for c in sec)
            y = np.stack([_tdf2_serial(y[0], coefs),
                          _tdf2_serial(y[1], coefs)])
        return y
    raise NotImplementedError(f"f64 reference: effect {k!r}")


# ---- graph ---------------------------------------------------------------


def render_f64(compiled: CompiledSong) -> np.ndarray:
    """Whole song -> [n, 2] float64 (the gold standard)."""
    c = compiled
    n = c.n_frames
    sr = float(c.sample_rate)
    if c.sidechain or c.sends:
        raise NotImplementedError("f64 reference: sidechain/sends")
    outputs: dict[str, np.ndarray] = {}
    for uvid in c.order:
        dev = c.devices[uvid]
        if dev.role == "instrument" or dev.kind == "calculator":
            if dev.notes is None or dev.notes.count == 0:
                outputs[uvid] = np.zeros((2, n))
                continue
            if dev.kind == "welsh":
                gate = dev.notes.off_frames - dev.notes.on_frames
                from groove_tpu.models import welsh as welsh_model
                from groove_tpu.models.voices import span_for
                tail = welsh_model.tail_seconds(dev.voice)
                span = span_for(int(gate.max()), tail, c.sample_rate)
                span = min(span, -(-n // 128) * 128)
                mono_notes = _render_welsh(dev, span, sr)
                mono = np.zeros(n + span)
                for i in range(dev.notes.count):
                    on = int(dev.notes.on_frames[i])
                    mono[on:on + span] += mono_notes[i]
                mono = mono[:n]
                lv, rv = _pan_gains(0.0)

                def PP(name, default):
                    if name in dev.automation:
                        return _upsample(dev.automation[name], n)
                    return float(dev.params.get(name, default))

                ls, rs = _pan_gains(PP("pan", 0.0))
                g = PP("gain", 1.0)
                outputs[uvid] = np.stack([mono * lv * ls * g,
                                          mono * rv * rs * g])
            elif dev.kind == "drumkit":
                outputs[uvid] = _render_drumkit(dev, n, sr)
            else:
                raise NotImplementedError(
                    f"f64 reference: instrument {dev.kind!r}")
            continue
        acc = np.zeros((2, n))
        for s in c.sinks.get(uvid, []):
            if s in outputs:
                acc = acc + outputs[s]
        if dev.role == "controller" \
                and dev.kind != "signal-passthrough-controller":
            continue
        outputs[uvid] = _apply_effect(dev, acc, n, sr)
    out = outputs.get(MAIN_MIXER_UVID, np.zeros((2, n)))
    return out.T  # [n, 2]

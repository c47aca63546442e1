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
    if kind == "debug-max":
        return np.ones_like(phase)
    if kind == "debug-min":
        return -np.ones_like(phase)
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
    """All notes -> mono [n_notes, span], f64 — the GENERAL welsh voice:
    every LFO routing, noise mix-in, hard sync, glide, unison.

    Control sharing (module docstring): per-note frequencies, sync/glide
    ratios, and (for LFO-free filters) coefficient tables are the
    engine's HOST numpy f32 constants (welsh.host_osc_constants /
    host_filter_tables — identical bits on every backend). LFO values,
    pitch-modulated phases, glide phases, noise rows, and LFO-driven
    filter coefficients are shared from the SAME jnp formulas the engine
    traces, evaluated eagerly — bitwise the traced values on the CPU
    backend (the suite's), ~1e-6 apart on the TPU (its traced
    transcendentals round differently; see FIDELITY_TPU.md). Everything
    downstream — waveform evaluation, mixing, the serial IIR recurrences,
    envelopes — evaluates in exact f64."""
    import jax.numpy as jnp

    from groove_tpu.models import welsh as welsh_model
    from groove_tpu.ops import iir as iir_ops
    from groove_tpu.ops import oscillator as osc_ops

    p = dev.voice
    # unison triples the RENDERED notes only (the engines' input rule)
    keys, vels_a, on_a, off_a, prev = welsh_model.unison_input_notes(
        dev.notes, p)
    vels = np.asarray(vels_a, np.float64)
    gate_i = (off_a - on_a).astype(np.int64)
    gate = gate_i.astype(np.float64)
    n_notes = len(vels)
    shape = (n_notes, span)

    # --- f32 controls ---
    hc = welsh_model.host_osc_constants(p, keys, prev)
    t32 = np.arange(span, dtype=np.float32)[None, :] / np.float32(sr)
    lfo = p.lfo
    routing = lfo.routing
    lfo_active = (routing != "none" and lfo.frequency > 0.0
                  and lfo.depth != 0.0)
    lfo_value = welsh_model._make_lfo_value(
        lfo, welsh_model._sh_cycles(lfo, span, sr), 0, wrap=False)
    # per-sample LFO value: the engine's HOST table when one ships
    # (host_lfo_table — exact shares), eager formula otherwise
    lvt = welsh_model.host_lfo_table(p, span, sr)
    if lvt is not None:
        lfo_val = np.broadcast_to(lvt["lv"][None, :], (1, span)).astype(
            np.float32)
    else:
        lfo_val = np.asarray(lfo_value(jnp.asarray(t32)), np.float32)
    pitch_mod = lfo_active and routing in ("pitch", "pitch-osc2")
    glide_on = p.glide > 0.0 and prev is not None
    rgl32 = hc.get("rgl")

    def freq32(name, is_osc2):
        f = hc[name][:, None]                                  # [n, 1] f32
        if routing == "pitch" or (routing == "pitch-osc2" and is_osc2):
            f = np.asarray(jnp.asarray(f) * jnp.exp2(jnp.asarray(lfo_val)),
                           np.float32)
        return np.broadcast_to(f, shape).astype(np.float32)

    def phase32(f, glides=True):
        # term-for-term welsh.render_notes_parts.osc_phase, f32 shared
        if pitch_mod:
            if glide_on and glides:
                f = np.asarray(jnp.asarray(f) * welsh_model._glide_factor(
                    jnp.asarray(rgl32[:, None]), p.glide,
                    jnp.asarray(t32)), np.float32)
            return np.asarray(
                osc_ops.phase_from_freq(jnp.asarray(f), sr), np.float32)
        if glide_on and glides:
            return np.asarray(welsh_model._glide_phase(
                jnp.asarray(f), jnp.asarray(rgl32[:, None]), p.glide,
                jnp.asarray(t32)), np.float32)
        # constant per-note frequency: one f32 multiply of host bits —
        # correctly rounded on every backend, numpy reproduces it exactly
        return f * t32

    o1 = p.oscillator_1.waveform.kind != "none"
    o2 = p.oscillator_2.waveform.kind != "none"
    o2_tracks = p.oscillator_2_fixed_hz is None
    php = welsh_model.host_pitch_phases(p, keys, prev, span, sr)
    if php is not None:
        # pitch-LFO phases are the engine's HOST tables — exact shares
        ph1_32 = php["ph1"]
        ph2_32 = php["ph2"]
        ph1 = ph1_32.astype(np.float64)
        ph2 = ph2_32.astype(np.float64)
        return _welsh_tail(dev, p, span, sr, shape, ph1, ph2, routing,
                           lfo_active, lfo_val, lfo_value, gate_i, gate,
                           vels, on_a)
    f1_32 = freq32("f1", False)
    f2_32 = freq32("f2", True)
    ph1_32 = phase32(f1_32)
    if p.oscillator_2_sync and o1:
        ratio = np.broadcast_to(hc["rsync"][:, None], shape
                                ).astype(np.float32)
        if routing == "pitch-osc2" and lfo_active:
            ratio = np.asarray(
                jnp.asarray(ratio) * jnp.exp2(jnp.asarray(lfo_val)),
                np.float32)
        if glide_on and not o2_tracks:
            ratio = np.asarray(
                jnp.asarray(ratio) / welsh_model._glide_factor(
                    jnp.asarray(rgl32[:, None]), p.glide,
                    jnp.asarray(t32)), np.float32)
        fr = ph1_32 - np.floor(ph1_32)
        ph2_32 = fr * ratio
    else:
        ph2_32 = phase32(f2_32, glides=o2_tracks)
    ph1 = np.broadcast_to(ph1_32, shape).astype(np.float64)
    ph2 = np.broadcast_to(ph2_32, shape).astype(np.float64)
    return _welsh_tail(dev, p, span, sr, shape, ph1, ph2, routing,
                       lfo_active, lfo_val, lfo_value, gate_i, gate,
                       vels, on_a)


def _welsh_tail(dev, p, span, sr, shape, ph1, ph2, routing, lfo_active,
                lfo_val, lfo_value, gate_i, gate, vels, on_a):
    """Oscillator-signal -> filter -> amp stage of _render_welsh (shared
    by the host-phase-table and mirrored-phase paths)."""
    import jax.numpy as jnp

    from groove_tpu.models import welsh as welsh_model
    from groove_tpu.ops import iir as iir_ops
    from groove_tpu.ops import oscillator as osc_ops

    n_notes = shape[0]
    note_ids = np.arange(n_notes, dtype=np.int32)
    o1 = p.oscillator_1.waveform.kind != "none"
    o2 = p.oscillator_2.waveform.kind != "none"

    def noise64(which):
        # the engine's exact noise rows (threefry is integer math —
        # identical on every backend), mixed downstream in f64
        import jax
        rows = osc_ops.noise_rows(
            jax.random.fold_in(jax.random.PRNGKey(0), which),
            jnp.asarray(note_ids), span)
        return np.asarray(rows, np.float64)

    # --- f64 signal path ---
    lfo64 = lfo_val.astype(np.float64)

    def sig64(osc, ph, which):
        kind = osc.waveform.kind
        if kind == "none":
            return np.zeros(shape)
        if kind == "pulse-width":
            width = osc.waveform.pulse_width
            if routing == "pulse-width" or routing == f"pw-osc{which}":
                # shared f32 width curve (the edge position control)
                width = np.clip(np.float32(width)
                                + np.float32(0.5) * lfo_val,
                                np.float32(0.01), np.float32(0.99)
                                ).astype(np.float64)
            return _wave("pulse-width", ph, width)
        if kind == "noise":
            return noise64(which)
        return _wave(kind, ph, osc.waveform.pulse_width)

    s1 = sig64(p.oscillator_1, ph1, 1)
    s2 = sig64(p.oscillator_2, ph2, 2)
    mix = p.oscillator_mix
    if o1 and o2:
        osc_out = mix * s1 + (1.0 - mix) * s2
    elif o1:
        osc_out = s1
    elif o2:
        osc_out = s2
    else:
        osc_out = np.zeros(shape)
    if p.noise > 0.0:
        osc_out = osc_out * (1.0 - p.noise) + noise64(3) * p.noise

    # --- filter coefficients ---
    cblock = iir_ops.CONTROL_BLOCK
    nb = -(-span // cblock)
    tabs = welsh_model.host_filter_tables(p, gate_i, span, sr)
    if tabs is not None:
        fidx = tabs["fidx"]
        gain_b = tabs["fgain"][fidx].astype(np.float64)        # [n, nb]
        secs = [tuple(tabs["fsecs"][i, j][fidx].astype(np.float64)
                      for j in range(5)) for i in range(2)]
    else:
        # LFO drives the filter: share the engine's traced formula
        # (eager jnp — bitwise on the CPU backend)
        t_blk32 = (jnp.arange(nb, dtype=jnp.float32) * cblock)[None, :] / sr
        gate_s32 = jnp.asarray(gate, jnp.float32)[:, None] / sr
        cutoff_hz, q = welsh_model._filter_controls(
            p, t_blk32, gate_s32, lfo_value)
        gain32, secs32 = iir_ops.lp24_sections(
            jnp.broadcast_to(cutoff_hz, (n_notes, nb)),
            jnp.broadcast_to(jnp.asarray(q, jnp.float32), (n_notes, nb)),
            sr)
        gain_b = np.asarray(jnp.broadcast_to(gain32, (n_notes, nb)),
                            np.float64)
        secs = [tuple(np.asarray(jnp.broadcast_to(c, (n_notes, nb)),
                                 np.float64) for c in sec)
                for sec in secs32]

    y = osc_out * np.repeat(gain_b, cblock, axis=1)[:, :span]
    for sec in secs:
        y = _tdf2_serial_notes(y, sec)

    # ENVELOPE time bases are the ENGINE'S f32 bits cast to f64 (the host
    # time table + host_gate_seconds rows): a release-0 amp envelope is a
    # STEP at note-off, and f32-vs-f64 time quantization (~2e-6 s at
    # minute scale) would put the cut on different samples — full-scale
    # isolated residuals at every note-off of such patches (jingle_bells
    # measured ±0.44). Sharing the bits pins the knife edge to the same
    # sample; elsewhere the envelope is continuous and the time
    # quantization costs ~ulp(t) * slope.
    t_env = (np.arange(span, dtype=np.float32)
             / np.float32(sr)).astype(np.float64)[None, :]
    gate_s = welsh_model.host_gate_seconds(
        gate_i, sr)["gs"].astype(np.float64)[:, None]
    ae = p.amp_envelope
    a_env = _adsr(t_env, gate_s, ae.attack, ae.decay, ae.sustain, ae.release)
    amp = a_env * (vels[:, None] / 127.0)
    if lfo_active and routing in ("amplitude", "cutoff-amp"):
        amp = amp * (1.0 + lfo64)
    return y * amp, on_a


def _render_drumkit(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """One-shot sample sum -> stereo [2, n], f64 (same slot/round-robin
    assignment; sample data is the same host table). Unity-rate kits sum
    raw rows; mixed-rate kits resample per note (_resampled_notes with
    one-shot gates, the engine's non-unity branch)."""
    notes = dev.notes
    if not all(int(r) == int(sr) for r in dev.sample_table.rates):
        span = _sample_span(dev, n, sr)
        gate_eff = np.full(notes.count, span, np.int64)  # one-shot
        ratios = np.ones(notes.count, np.float32)
        rows = _resampled_notes(dev, ratios, gate_eff, span, sr)
        return _scatter_stereo(rows, notes.on_frames, n)
    table = np.asarray(dev.sample_table.data, np.float64)
    lengths = np.asarray(dev.sample_table.lengths)
    out = np.zeros((2, n))
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


def _sample_span(dev: DeviceIR, n: int, sr: float) -> int:
    """The engine's span rule for sample playback windows."""
    from groove_tpu.models.voices import span_for

    notes = dev.notes
    gate = notes.off_frames - notes.on_frames
    if dev.kind in ("drumkit", "calculator"):
        tail = float(dev.sample_table.lengths.max()) / sr
    else:
        tail = 0.0
    span = span_for(int(gate.max()) if notes.count else 0, tail, int(sr))
    return min(span, -(-n // 128) * 128)


def _resampled_notes(dev: DeviceIR, ratios, gate_eff, span: int,
                     sr: float) -> np.ndarray:
    """f64 mirror of models/sampler.render_notes: playback POSITIONS are
    the engine's f32 values (pos = t_idx * step, one f32 multiply of
    host-computed steps — correctly rounded everywhere, so numpy f32
    reproduces the gather indices and interpolation weights exactly);
    the interpolation itself evaluates in f64."""
    notes = dev.notes
    table = np.asarray(dev.sample_table.data, np.float64)
    lengths = np.asarray(dev.sample_table.lengths)
    rates = np.asarray(dev.sample_table.rates)
    slots = np.asarray(dev.slots, np.int64)
    safe = np.maximum(slots, 0)
    rate_fix = (rates[safe].astype(np.float32) / np.float32(sr))
    step = (np.asarray(ratios, np.float32) * rate_fix)[:, None]   # [n, 1]
    t_idx = np.arange(span, dtype=np.float32)[None, :]
    pos = t_idx * step                                            # f32!
    i0 = np.floor(pos).astype(np.int64)
    frac = (pos - i0.astype(np.float32)).astype(np.float64)[:, None, :]
    length = lengths[safe][:, None]
    valid = (i0 + 1 < length) & (slots[:, None] >= 0)
    gatem = t_idx < np.asarray(gate_eff, np.float32)[:, None]
    mask = (valid & gatem)[:, None, :]
    i0c = np.clip(i0, 0, table.shape[-1] - 2)
    per_note = table[safe]                                 # [n, 2, max_len]
    a = np.take_along_axis(per_note,
                           np.broadcast_to(i0c[:, None, :],
                                           (len(slots), 2, span)), axis=-1)
    b = np.take_along_axis(per_note,
                           np.broadcast_to(i0c[:, None, :] + 1,
                                           (len(slots), 2, span)), axis=-1)
    out = (a * (1.0 - frac) + b * frac) * mask
    return out * (np.asarray(notes.vels, np.float64)[:, None, None] / 127.0)


def _scatter_stereo(rows: np.ndarray, on_frames, n: int) -> np.ndarray:
    """[k, 2, span] note windows summed into a [2, n] timeline."""
    span = rows.shape[-1]
    out = np.zeros((2, n + span))
    for i in range(rows.shape[0]):
        on = int(on_frames[i])
        out[:, on:on + span] += rows[i]
    return out[:, :n]


def _render_sampler(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """Pitched sample playback, f64 (ratio resampling; gate-bounded)."""
    from groove_tpu.models import sampler as sampler_model

    notes = dev.notes
    ratios = sampler_model.sampler_ratios(
        notes.keys, float(dev.params.get("root", 440.0)))
    gate = (notes.off_frames - notes.on_frames).astype(np.int64)
    span = _sample_span(dev, n, sr)
    rows = _resampled_notes(dev, ratios, gate, span, sr)
    return _scatter_stereo(rows, notes.on_frames, n)


def _render_fm(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """Single-operator FM, f64 over the engine's f32 phase arguments
    (host note_freqs carrier rows — fm._voices_at freqs); envelopes and
    the modulation sum evaluate in f64.

    Automated ratio/depth/beta (round-5, VERDICT r4 item 2; params are
    Control targets, settings/src/patches.rs:691-715): the per-note
    block-held curves come from the engine's own fm._note_curve slicing,
    and an automated-ratio modulator phase shares the engine's f32
    64-block regrouped cumsum (fm.modulator_phase, evaluated eagerly);
    the depth/beta curves then scale the modulation sum in f64."""
    import jax.numpy as jnp

    from groove_tpu.models import fm as fm_model
    from groove_tpu.models.voices import note_freqs, span_for

    p = dev.voice
    notes = dev.notes
    gate = (notes.off_frames - notes.on_frames).astype(np.float64)
    span = min(span_for(int(gate.max()), fm_model.tail_seconds(p),
                        int(sr)), -(-n // 128) * 128)
    # per-note block-held automation curves, the engine's own slicing
    # (fm.render_notes cur) — integer gathers of host block data
    cur64: dict[str, np.ndarray] = {}
    cur32: dict[str, np.ndarray] = {}
    for nm in ("ratio", "depth", "beta"):
        if nm in dev.automation:
            c = np.asarray(fm_model._note_curve(
                jnp.asarray(dev.automation[nm], jnp.float32),
                notes.on_frames, span), np.float32)
            cur32[nm] = c
            cur64[nm] = c.astype(np.float64)
    php = None if "ratio" in cur32 else fm_model.host_phases(
        p, notes.keys, span, sr)
    if php is not None:
        # the engine's host mod-1-reduced phase tables — exact shares
        mod_ph32 = php["phm"]
        car_ph32 = php["phc"]
    else:
        f_c = note_freqs(np.asarray(notes.keys))[:, None]   # [n, 1] f32
        t32 = np.arange(span, dtype=np.float32)[None, :] / np.float32(sr)
        # engine formula (fm.modulator_phase), shared eagerly in f32
        mod_ph32 = np.asarray(fm_model.modulator_phase(
            p, jnp.asarray(f_c), jnp.asarray(t32),
            None if "ratio" not in cur32 else jnp.asarray(cur32["ratio"]),
            sr), np.float32)
        car_ph32 = f_c * t32

    t = np.arange(span, dtype=np.float64)[None, :] / sr
    gate_s = gate[:, None] / sr
    me, ce = p.modulator_envelope, p.carrier_envelope
    mod_env = _adsr(t, gate_s, me.attack, me.decay, me.sustain, me.release)
    car_env = _adsr(t, gate_s, ce.attack, ce.decay, ce.sustain, ce.release)
    depth_v = cur64.get("depth", p.depth)
    beta_v = cur64.get("beta", p.beta)
    mod = np.sin(2.0 * np.pi * mod_ph32.astype(np.float64)) \
        * mod_env * depth_v
    carrier = np.sin(2.0 * np.pi * car_ph32.astype(np.float64)
                     + beta_v * mod)
    vels = np.asarray(notes.vels, np.float64)
    rows = carrier * car_env * (vels[:, None] / 127.0)
    mono = np.zeros(n + span)
    for i in range(notes.count):
        on = int(notes.on_frames[i])
        mono[on:on + span] += rows[i]
    mono = mono[:n]

    def PP(name, default):
        if name in dev.automation:
            return _upsample(dev.automation[name], n)
        return float(dev.params.get(name, default))

    left, right = _pan_gains(PP("pan", p.pan))
    g = PP("gain", p.gain)
    return np.stack([mono * left * g, mono * right * g])


def _render_oscillator(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """Always-on oscillator instrument, f64 over the engine's f32 phase
    (host time base — render.py's oscillator branch)."""
    from groove_tpu.models import simple as simple_model
    from groove_tpu.ops import oscillator as osc_ops

    wf, pw = osc_ops.parse_waveform(dev.params)
    freq = float(dev.params.get("frequency", 440.0))
    if "frequency" in dev.automation and str(wf) != "noise":
        phase = np.asarray(simple_model.oscillator_phase_automated(
            dev.automation["frequency"], n, sr), np.float32)
    else:
        t = np.arange(n, dtype=np.float32) / np.float32(sr)
        phase = np.float32(freq) * t
    if str(wf) == "noise":
        import jax

        mono = np.asarray(osc_ops.noise(
            jax.random.PRNGKey(0), (n,)), np.float64)
    else:
        mono = _wave(str(wf), phase.astype(np.float64), pw)
    return np.stack([mono, mono])


def _render_envelope(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """Envelope demo instrument: a sine at note pitch shaped by the
    configured ADSR (models/simple.envelope_instrument) — phase over the
    engine's host f32 frequency bits, tone/envelope in f64."""
    from groove_tpu.models.voices import note_freqs, span_for

    notes = dev.notes
    gate = (notes.off_frames - notes.on_frames).astype(np.float64)
    release = float(dev.params.get("release", 0.0))
    span = min(span_for(int(gate.max()) if notes.count else 0, release,
                        int(sr)), -(-n // 128) * 128)
    t = np.arange(span, dtype=np.float64)[None, :] / sr
    env = _adsr(t, gate[:, None] / sr,
                float(dev.params.get("attack", 0.0)),
                float(dev.params.get("decay", 0.0)),
                float(dev.params.get("sustain", 1.0)), release)
    t32 = np.arange(span, dtype=np.float32)[None, :] / np.float32(sr)
    ph32 = note_freqs(np.asarray(notes.keys))[:, None] * t32
    tone = np.sin(2.0 * np.pi * ph32.astype(np.float64))
    rows = tone * env * (np.asarray(notes.vels, np.float64)[:, None] / 127.0)
    mono = np.zeros(n + span)
    for i in range(notes.count):
        on = int(notes.on_frames[i])
        mono[on:on + span] += rows[i]
    mono = mono[:n]
    return np.stack([mono, mono])


# ---- effects --------------------------------------------------------------


def _comb_feedback64(x: np.ndarray, d: int, g) -> np.ndarray:
    """y[n] = x[n-D] + g[n]*y[n-D], zero history, exact f64. Serial over
    D-sample blocks, vectorized across the D lanes (the engine's own
    block-space view of the recurrence — delayfx.comb_feedback)."""
    n = x.shape[-1]
    nb = -(-n // d)
    xp = np.zeros(x.shape[:-1] + (nb * d,))
    xp[..., :n] = x
    gp = np.zeros_like(xp)
    gp[..., :n] = np.broadcast_to(g, x.shape)
    xb = xp.reshape(x.shape[:-1] + (nb, d))
    gb = gp.reshape(x.shape[:-1] + (nb, d))
    yb = np.zeros_like(xb)
    prev = np.zeros(x.shape[:-1] + (d,))
    prev_x = np.zeros_like(prev)
    for b in range(nb):
        yb[..., b, :] = prev_x + gb[..., b, :] * prev
        prev = yb[..., b, :]
        prev_x = xb[..., b, :]
    return yb.reshape(x.shape[:-1] + (nb * d,))[..., :n]


def _allpass64(x: np.ndarray, d: int, g: float) -> np.ndarray:
    """Schroeder all-pass (one-multiply form), exact f64."""
    n = x.shape[-1]
    nb = -(-n // d)
    xp = np.zeros(x.shape[:-1] + (nb * d,))
    xp[..., :n] = x
    xb = xp.reshape(x.shape[:-1] + (nb, d))
    wb = np.zeros_like(xb)
    prev = np.zeros(x.shape[:-1] + (d,))
    for b in range(nb):
        wb[..., b, :] = xb[..., b, :] + g * prev
        prev = wb[..., b, :]
    w_delayed = np.concatenate(
        [np.zeros_like(wb[..., :1, :]), wb[..., :-1, :]], axis=-2)
    yb = -g * xb + (1.0 - g * g) * w_delayed
    return yb.reshape(x.shape[:-1] + (nb * d,))[..., :n]


def _follower64(mag: np.ndarray, att_s, rel_s, sr: float) -> np.ndarray:
    """Decoupled peak detector (ops/dynamics.envelope_follower), serial
    f64: release-rate peak hold then attack-rate one-pole smoothing.
    att_s/rel_s scalars or per-sample arrays."""
    n = mag.shape[-1]
    att = np.broadcast_to(np.maximum(np.asarray(att_s, np.float64), 1e-6),
                          mag.shape)
    rel = np.broadcast_to(np.maximum(np.asarray(rel_s, np.float64), 1e-6),
                          mag.shape)
    r = np.exp(-1.0 / (rel * sr))
    a = np.exp(-1.0 / (att * sr))
    out = np.empty_like(mag)
    peak = np.zeros(mag.shape[:-1])
    sm = np.zeros(mag.shape[:-1])
    for i in range(n):
        peak = np.maximum(mag[..., i], r[..., i] * peak)
        sm = a[..., i] * sm + (1.0 - a[..., i]) * peak
        out[..., i] = sm
    return out


def _apply_effect(dev: DeviceIR, x: np.ndarray, n: int, sr: float,
                  overrides=None):
    k = dev.kind
    overrides = overrides or {}

    def P(name, default):
        ov = overrides.get((dev.uvid, name))
        if ov is not None:
            return ov
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
        bits = overrides.get((dev.uvid, "bits-to-crush"))
        if bits is None:
            if "bits-to-crush" in dev.automation:
                bits = _upsample(dev.automation["bits-to-crush"], n)
            else:
                bits = float(dev.params.get("bits", 8))
        step = np.exp2(np.floor(bits))
        mag = np.trunc(np.abs(x) * 32767.0)
        return np.sign(x) * (np.trunc(mag / step) * step) / 32767.0
    if k == "toy":
        return -x  # the negator test entity (util.rs:52-78)
    if k == "compressor":
        thr = P("threshold", 1.0)
        ratio = P("ratio", 1.0)
        att = P("attack", 0.0)
        rel = P("release", 0.0)
        from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
        if (dev.uvid, "attack") in overrides:
            att = np.clip(att, 0.0, SIDECHAIN_SECONDS_MAX)
        if (dev.uvid, "release") in overrides:
            rel = np.clip(rel, 0.0, SIDECHAIN_SECONDS_MAX)
        inst = (isinstance(att, float) and isinstance(rel, float)
                and att <= 0.0 and rel <= 0.0)
        if inst:
            mag = np.abs(x)
            comp = np.sign(x) * (thr + (mag - thr) * ratio)
            return np.where(mag > thr, comp, x)
        env = _follower64(np.abs(x), att, rel, sr)
        over = env > thr
        target = thr + (env - thr) * ratio
        g = np.where(over, target / np.maximum(env, 1e-9), 1.0)
        return x * g
    if k == "delay":
        ov = overrides.get((dev.uvid, "delay"))
        if ov is not None or "delay" in dev.automation:
            from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
            if ov is not None:
                d_b = np.clip(ov[::BLOCK], 0.0, SIDECHAIN_SECONDS_MAX)
            else:
                d_b = PB("delay", 0.0)
            # the engine quantizes delay lengths in f32 (delayfx.
            # delay_automated jnp.round of an f32 product) — share that
            d_up = np.repeat(np.round(np.asarray(d_b, np.float32)
                                      * np.float32(sr)).astype(np.int64),
                             BLOCK)[:n]
            idx = np.arange(n) - d_up
            valid = (idx >= 0).astype(np.float64)
            return np.take(x, np.clip(idx, 0, n - 1), axis=-1) * valid
        d = int(round(float(dev.params.get("delay", 0.0)) * sr))
        if d <= 0:
            return x
        out = np.zeros_like(x)
        out[..., d:] = x[..., :n - d]
        return out
    if k == "chorus":
        if any(nm in dev.automation or (dev.uvid, nm) in overrides
               for nm in ("delay-seconds", "voices")):
            # automated taps (round-5, VERDICT r4 item 2; EffectSettings
            # params, settings/src/effects.rs:17-56): mirror
            # delayfx.chorus_tap_curves/chorus_automated — the tap
            # positions are INTEGER math (round of an f32 product, then
            # integer div), exact in numpy; the tap sum runs in f64
            from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
            from groove_tpu.ops.delayfx import chorus_curve_max_voices

            ov_v = overrides.get((dev.uvid, "voices"))
            if ov_v is not None:
                voices_b = np.asarray(ov_v, np.float32)[::BLOCK]
                maxv = max(1, int(dev.params.get("voices", 1)))
            elif "voices" in dev.automation:
                voices_b = np.asarray(PB("voices", 1.0), np.float32)
                maxv = chorus_curve_max_voices(dev.automation["voices"])
            else:
                voices_b, maxv = None, None
            ov_d = overrides.get((dev.uvid, "delay-seconds"))
            if ov_d is not None:
                delay_b = np.clip(np.asarray(ov_d, np.float32)[::BLOCK],
                                  0.0, SIDECHAIN_SECONDS_MAX)
            elif "delay-seconds" in dev.automation:
                delay_b = np.asarray(PB("delay-seconds", 0.0), np.float32)
            else:
                delay_b = np.float32(dev.params.get("delay-seconds", 0.0))
            # chorus_tap_curves' integer curves (np.round == jnp.round:
            # both round half to even)
            d_b = np.round(np.asarray(delay_b, np.float32)
                           * np.float32(sr)).astype(np.int64)
            if d_b.ndim == 0:
                d_up = np.full(n, int(d_b), np.int64)
            else:
                d_up = np.repeat(d_b, BLOCK)[:n]
            if voices_b is not None:
                v_b = np.clip(np.round(voices_b).astype(np.int64), 1, maxv)
                v_up = np.repeat(v_b, BLOCK)[:n]
                n_taps = int(maxv)
            else:
                n_taps = max(1, int(dev.params.get("voices", 1)))
                v_up = np.full(n, n_taps, np.int64)
            base = np.arange(n, dtype=np.int64)
            wet = np.zeros_like(x)
            for v in range(n_taps):
                idx = base - (v * d_up) // v_up
                valid = ((idx >= 0) & (v < v_up)).astype(np.float64)
                wet = wet + np.take(x, np.clip(idx, 0, n - 1),
                                    axis=-1) * valid
            wet = wet / v_up.astype(np.float64)
            wd = P("wet-dry-mix", 1.0)
            return x * (1.0 - wd) + wet * wd
        voices = max(1, int(dev.params.get("voices", 1)))
        total_d = int(round(float(dev.params.get("delay-seconds", 0.0))
                            * sr))
        wet = np.zeros_like(x)
        for v in range(voices):
            d = v * total_d // voices
            shifted = np.zeros_like(x)
            shifted[..., d:] = x[..., :n - d] if d else x
            wet = wet + shifted
        wet = wet / voices
        wd = P("wet-dry-mix", 1.0)
        return x * (1.0 - wd) + wet * wd
    if k == "reverb":
        from groove_tpu.ops.delayfx import (ALLPASS_DELAYS_S, ALLPASS_G,
                                            COMB_DELAYS_S)
        ov = overrides.get((dev.uvid, "seconds"))
        if ov is not None or "seconds" in dev.automation:
            if ov is not None:
                sec_s = np.asarray(ov, np.float64)
            else:
                sec_s = _upsample(PB("seconds", 0.0), n)
            combs = np.zeros_like(x)
            for d_s in COMB_DELAYS_S:
                d = max(1, int(round(d_s * sr)))
                # the engine derives g in f32 (delayfx.reverb_comb_g) —
                # share those bits; the recurrence itself runs f64
                g32 = np.where(
                    sec_s > 0.0,
                    np.exp(np.float32(np.log(0.001))
                           * (np.float32(d)
                              / (sec_s.astype(np.float32)
                                 * np.float32(sr)))).astype(np.float32),
                    np.float32(0.0))
                combs = combs + _comb_feedback64(x, d,
                                                 g32.astype(np.float64))
            y = combs
        else:
            seconds = float(dev.params.get("seconds", 0.0))
            combs = np.zeros_like(x)
            for d_s in COMB_DELAYS_S:
                d = max(1, int(round(d_s * sr)))
                g = 0.001 ** (d / (seconds * sr)) if seconds > 0 else 0.0
                combs = combs + _comb_feedback64(x, d, g)
            y = combs
        for d_s in ALLPASS_DELAYS_S:
            y = _allpass64(y, max(1, int(round(d_s * sr))), ALLPASS_G)
        return P("attenuation", 1.0) * y
    # filter coefficients are the ENGINE'S OWN host numpy f32 bits
    # (engine/render.host_effect_filter_coefs — the same arrays the jitted
    # program consumes as shipped inputs, on every backend), then the
    # recurrences evaluate serially in f64. SIDECHAIN-overridden filters
    # (round-5, VERDICT r4 item 2; a sidechain may target any controllable
    # param, projects/demos/controllers/sidechain.json:113-120) design
    # their coefficients from THIS renderer's own f64-derived control
    # curve cast to f32 (semantics, not shared bits — the engine derives
    # its control from its f32 signals in-trace), mirroring the engine's
    # PB [::BLOCK] block-rate recovery and the same iir design formulas.
    if k.startswith("filter-"):
        from groove_tpu.engine.render import host_effect_filter_coefs
        from groove_tpu.ops import iir as iir_ops

        nb = -(-n // BLOCK)
        ov_names = ("cutoff", "q", "passband-ripple", "bandwidth",
                    "db-gain")
        if any((dev.uvid, nm) in overrides for nm in ov_names):

            def PBf(name, default):
                ov = overrides.get((dev.uvid, name))
                if ov is not None:
                    return np.asarray(ov, np.float32)[::BLOCK]
                if name in dev.automation:
                    c = np.asarray(dev.automation[name], np.float32)
                    if len(c) < nb:
                        c = np.pad(c, (0, nb - len(c)), mode="edge")
                    return c[:nb]
                return np.full((nb,), dev.params.get(name, default),
                               np.float32)

            cutoff = PBf("cutoff", 1000.0)
            if k == "filter-low-pass-24db":
                q = np.maximum(PBf("passband-ripple", 0.707),
                               np.float32(1e-3))
                gain32, secs32 = iir_ops.lp24_sections(cutoff, q, sr)
                y = x * _upsample(
                    np.broadcast_to(np.asarray(gain32, np.float32),
                                    (nb,)).astype(np.float64), n)[None, :]
                for sec in secs32:
                    coefs = tuple(_upsample(
                        np.broadcast_to(np.asarray(c, np.float32),
                                        (nb,)).astype(np.float64), n)
                        for c in sec)
                    y = np.stack([_tdf2_serial(y[0], coefs),
                                  _tdf2_serial(y[1], coefs)])
                return y
            mk = {
                "filter-low-pass-12db": iir_ops.rbj_low_pass,
                "filter-high-pass-12db": iir_ops.rbj_high_pass,
                "filter-all-pass-12db": iir_ops.rbj_all_pass,
            }.get(k)
            if mk is not None:
                co = mk(cutoff, np.maximum(PBf("q", 0.707),
                                           np.float32(1e-3)), sr)
            elif k == "filter-band-pass-12db":
                co = iir_ops.rbj_band_pass(
                    cutoff, np.maximum(PBf("bandwidth", 1.0),
                                       np.float32(1e-3)), sr)
            elif k == "filter-band-stop-12db":
                co = iir_ops.rbj_band_stop(
                    cutoff, np.maximum(PBf("bandwidth", 1.0),
                                       np.float32(1e-3)), sr)
            elif k == "filter-peaking-eq-12db":
                co = iir_ops.rbj_peaking_eq(
                    cutoff, np.maximum(PBf("q", 1.0), np.float32(1e-3)),
                    PBf("db-gain", 0.0), sr)
            elif k == "filter-low-shelf-12db":
                co = iir_ops.rbj_low_shelf(cutoff, PBf("db-gain", 0.0), sr)
            elif k == "filter-high-shelf-12db":
                co = iir_ops.rbj_high_shelf(cutoff, PBf("db-gain", 0.0), sr)
            else:
                raise NotImplementedError(f"f64 reference: effect {k!r}")
            coefs = tuple(_upsample(
                np.broadcast_to(np.asarray(c, np.float32),
                                (nb,)).astype(np.float64), n) for c in co)
            return np.stack([_tdf2_serial(x[0], coefs),
                             _tdf2_serial(x[1], coefs)])
        designed = host_effect_filter_coefs(dev, nb, sr)
        if designed is None:
            raise NotImplementedError(f"f64 reference: effect {k!r}")
        if designed[0] == "lp24":
            y = x * _upsample(designed[1].astype(np.float64), n)[None, :]
            for sec in designed[2]:
                coefs = tuple(_upsample(c.astype(np.float64), n)
                              for c in sec)
                y = np.stack([_tdf2_serial(y[0], coefs),
                              _tdf2_serial(y[1], coefs)])
            return y
        coefs = tuple(_upsample(c.astype(np.float64), n)
                      for c in designed[1])
        return np.stack([_tdf2_serial(x[0], coefs),
                         _tdf2_serial(x[1], coefs)])
    raise NotImplementedError(f"f64 reference: effect {k!r}")


# ---- graph ---------------------------------------------------------------


def _render_instrument(dev: DeviceIR, n: int, sr: float) -> np.ndarray:
    """One instrument -> stereo [2, n] f64 (engine dispatch mirror)."""
    if dev.kind == "oscillator":
        return _render_oscillator(dev, n, sr)
    if dev.kind == "toy-instrument":
        mono = np.full(n, float(dev.params.get("fake-value", 0.0)))
        return np.stack([mono, mono])
    if dev.notes is None or dev.notes.count == 0:
        return np.zeros((2, n))
    if dev.kind in ("welsh", "welsh-raw"):
        from groove_tpu.models import welsh as welsh_model
        from groove_tpu.models.voices import span_for

        gate = dev.notes.off_frames - dev.notes.on_frames
        tail = welsh_model.tail_seconds(dev.voice)
        span = span_for(int(gate.max()), tail, int(sr))
        span = min(span, -(-n // 128) * 128)
        mono_notes, on_frames = _render_welsh(dev, span, sr)
        mono = np.zeros(n + span)
        for i in range(mono_notes.shape[0]):
            on = int(on_frames[i])
            mono[on:on + span] += mono_notes[i]
        mono = mono[:n]
        lv, rv = _pan_gains(0.0)

        def PP(name, default):
            if name in dev.automation:
                return _upsample(dev.automation[name], n)
            return float(dev.params.get(name, default))

        ls, rs = _pan_gains(PP("pan", 0.0))
        g = PP("gain", 1.0)
        return np.stack([mono * lv * ls * g, mono * rv * rs * g])
    if dev.kind == "fm-synthesizer":
        return _render_fm(dev, n, sr)
    if dev.kind in ("drumkit", "calculator"):
        return _render_drumkit(dev, n, sr)
    if dev.kind == "sampler":
        return _render_sampler(dev, n, sr)
    if dev.kind == "envelope":
        return _render_envelope(dev, n, sr)
    raise NotImplementedError(f"f64 reference: instrument {dev.kind!r}")


def render_f64(compiled: CompiledSong) -> np.ndarray:
    """Whole song -> [n, 2] float64 (the gold standard). Mirrors the
    engine's graph walk including BusRoute sends and the one-block-
    delayed sidechain (render.py:_render): the sidechain CONTROL derives
    from this renderer's own f64 signals (semantics, not shared bits),
    converted through the same registry domain maps."""
    from groove_tpu.compiler import params as param_mod

    c = compiled
    n = c.n_frames
    sr = float(c.sample_rate)
    sidechain_by_src: dict = {}
    for src, tgt, pname in c.sidechain:
        sidechain_by_src.setdefault(src, []).append((tgt, pname))
    sends_by_aux: dict = {}
    for src, aux, amount in c.sends:
        sends_by_aux.setdefault(aux, []).append((src, amount))

    outputs: dict[str, np.ndarray] = {}
    overrides: dict[tuple, np.ndarray] = {}
    for uvid in c.order:
        dev = c.devices[uvid]
        if dev.role == "instrument" or dev.kind == "calculator":
            outputs[uvid] = _render_instrument(dev, n, sr)
            continue
        acc = np.zeros((2, n))
        for s in c.sinks.get(uvid, []):
            if s in outputs:
                acc = acc + outputs[s]
        for s, amount in sends_by_aux.get(uvid, []):
            if s in outputs:
                acc = acc + amount * outputs[s]
        if dev.role == "controller" \
                and dev.kind != "signal-passthrough-controller":
            continue
        outputs[uvid] = _apply_effect(dev, acc, n, sr, overrides)
        if uvid in sidechain_by_src:
            # last sample of block b-1 -> control value for block b
            last = acc[:, BLOCK - 1::BLOCK]
            val = np.abs(np.mean(last, axis=0))
            val = np.concatenate([np.zeros(1), val[:-1]])
            per_sample = np.repeat(val, BLOCK)[:n]
            for tgt, pname in sidechain_by_src[uvid]:
                p = param_mod.resolve(c.devices[tgt].kind, pname)
                if p is not None:
                    per_sample_t = np.asarray(
                        param_mod.to_domain_array(p, per_sample),
                        np.float64)
                else:
                    per_sample_t = per_sample
                overrides[(tgt, pname)] = per_sample_t
    out = outputs.get(MAIN_MIXER_UVID, np.zeros((2, n)))
    return out.T  # [n, 2]

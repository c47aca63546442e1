"""Welsh dual-oscillator subtractive voice — the flagship kernel.

The reference WelshVoice (groove-entities, missing at HEAD; parameters
assembled at settings/src/patches.rs:110-169, described in README.md:72-79
as "dual oscillators with a low-pass filter and LFO") renders per sample:

    osc1/osc2 (optional hard sync) -> mix -> 24 dB low-pass whose cutoff is
    driven by the filter envelope (and optionally the LFO) -> amp envelope
    -> DCA

Here the whole voice is one fused tensor program over [n_notes, span]:
closed-form phases, closed-form ADSRs, block-rate-coefficient 24 dB filter
via the two-level blocked IIR engine (ops/iir.py; flagged patches add the
defect-correction fidelity pass), everything VPU-parallel across notes and
samples.

Reconstruction decisions (voice body missing at HEAD; documented for
review):
  - velocity scales amplitude linearly (vel/127);
  - LFO restarts at note-on, bipolar, depth as Normal;
    routings: pitch -> freq * 2^(lfo*depth) (one octave full-scale);
    amplitude -> *(1 + lfo*depth); pulse-width -> width + 0.5*lfo*depth
    (clipped 0.01..0.99); filter-cutoff -> cutoff_pct + lfo*depth;
    extended corpus routings: pitch-osc2 / pw-osc1 / pw-osc2 per-osc,
    resonance -> q*(1+lfo*depth), cutoff-amp -> cutoff + amplitude;
  - oscillator mixing: share `mix` to osc1 vs osc2 when both are active,
    full scale when only one is (patches.rs:123-132 fixes the share);
    noise mixes in at its patch level: out*(1-noise) + noise_osc*noise.
    (Note: the reference's derive drops noise entirely because
    WelshSynthParams has no noise slot — patches.rs:110-169; keeping it is
    a deliberate improvement, flagged here.)
  - filter cutoff percentage = start + (end-start)*filter_env, converted
    through the hearing-range map (25*800^pct), per sample;
  - both the voice DCA and the synth DCA apply (both exist in
    WelshSynthParams, patches.rs:160-168), i.e. 0.75^2 per channel at
    center pan;
  - glide (portamento) and unison are KEPT like the noise mix-in: the
    reference parses both (patches.rs:33-34) but its derive drops them
    (patches.rs:110-169) although 19 shipped patches carry nonzero glide
    and screaming-sync sets unison. Glide = constant-time exponential
    slide from the last played pitch (_glide_factor/_glide_phase,
    closed-form — no cumsum); unison = three copies at +/-UNISON_CENTS
    and vel/3, tripled at render-input time (unison_notes).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from groove_tpu.core import types as T
from groove_tpu.ops import envelope as env_ops
from groove_tpu.ops import oscillator as osc_ops
from groove_tpu.ops import iir as iir_ops
from groove_tpu.project.patches import WelshVoiceParams
from groove_tpu.models.voices import note_freqs

LN_BASE = float(np.log(T.FREQUENCY_TO_LINEAR_BASE))
LN_COEF = float(np.log(T.FREQUENCY_TO_LINEAR_COEFFICIENT))


def _sustained_pole_coeffs(params: WelshVoiceParams,
                           sample_rate: float) -> tuple[np.ndarray, np.ndarray]:
    """Pole coefficients (a1, a2) of the voice's 24 dB cascade at every
    SUSTAINED operating point — resting (env = 0 -> start pct) and held
    (env = sustain level) cutoffs, widened ±LFO depth when the LFO routes
    to the cutoff, and evaluated at q*(1±depth) as well when it routes to
    'resonance' (the render paths boost runtime q up to q*(1+depth), so a
    statically-safe q can still park poles past the thresholds mid-cycle).
    Shared by the fidelity checks below. HOST-only (eager jnp)."""
    fe = params.filter_envelope
    sustained_envs = [0.0, float(fe.sustain)]
    pts = [params.filter_cutoff_start
           + (params.filter_cutoff_end - params.filter_cutoff_start) * e
           for e in sustained_envs]
    if params.lfo.routing in ("filter-cutoff", "cutoff-amp"):
        pts = [p + s * params.lfo.depth for p in pts for s in (-1.0, 1.0)]
    pcts = np.clip(np.asarray(pts, np.float64), 0.0, 1.0)
    hz = np.exp(LN_COEF + pcts * LN_BASE).astype(np.float32)
    q0 = max(params.filter_q, 1e-3)
    qs = [q0]
    if params.lfo.routing == "resonance":
        d = abs(params.lfo.depth)
        # runtime: q = max(q*(1 + lfo*depth), 0.1), lfo bipolar in [-1, 1]
        qs += [max(q0 * (1.0 - d), 0.1), q0 * (1.0 + d)]
    a1s, a2s = [], []
    for q in qs:
        _, secs = iir_ops.lp24_sections(hz, np.float32(q), sample_rate)
        a1s.append(np.stack([np.asarray(s[3]) for s in secs]))
        a2s.append(np.stack([np.asarray(s[4]) for s in secs]))
    return np.concatenate(a1s), np.concatenate(a2s)


def needs_filter_refinement(params: WelshVoiceParams,
                            sample_rate: float = 44100.0) -> bool:
    """Host-side fidelity check for the voice's internal 24 dB cascade:
    the filter envelope can PARK the poles near the unit circle, where
    the blocked f32 scheme misses the -80 dBFS bar (measured: acid-bass
    holds 330 Hz at q 4.3 — a2 0.99 — at -62 dBFS over 1.5 s; the
    defect-correction pass reads -124).

    The flag tests the SUSTAINED operating points (_sustained_pole_coeffs).
    Transient attack/decay extremes are excluded: the blocked error
    accumulates with residence time (the 25 Hz -> 20 kHz sweep passes the
    corner in milliseconds and measures fine; a parked pole does not), and
    flagging on the full transient range taxed nearly every patch with the
    2x refined solve for corners their notes only brush. HOST-only (eager
    jnp): call it at renderer init, never inside a trace."""
    a1, a2 = _sustained_pole_coeffs(params, sample_rate)
    return iir_ops.needs_refinement(a1, a2)


def needs_filter_serial(params: WelshVoiceParams,
                        sample_rate: float = 44100.0) -> bool:
    """Deep-corner test for NON-Pallas backends (the CPU test suite): a
    cascade PARKED at the literal 25 Hz floor with high q (octave-switch:
    q 5.33) under-converges through the XLA refined fallback — section
    A's output sits in f32 noise and section B's resonance amplifies it
    (~-24 dBFS vs f64 at the corner) — while the strictly serial
    per-sample TDF2 scan reads -79 dBFS there (measured; the fused TPU
    Pallas kernel reads -95 on-chip and stays the production path).
    True when any SUSTAINED operating point (_sustained_pole_coeffs)
    crosses the static-serial thresholds (iir._CRITICAL_A1/_CRITICAL_A2).
    HOST-only."""
    a1, a2 = _sustained_pole_coeffs(params, sample_rate)
    return _crosses_serial(a1, a2)


def _crosses_serial(a1: np.ndarray, a2: np.ndarray) -> bool:
    """The static-serial threshold predicate — ONE definition shared by
    needs_filter_serial and filter_fidelity_mode so the standalone flag
    and the engine routing can never disagree."""
    return bool(((a1 < iir_ops._CRITICAL_A1)
                 & (a2 > iir_ops._CRITICAL_A2)).any())


# host_ctl entries that are PER-NOTE rows (axis 0 is the note batch; the
# engines chunk them with note chunks / gather them by segment note index).
# Everything else in a host-ctl dict (coefficient tables) passes through
# whole. ONE definition for both engines (render._chunked_mono and
# stream._hc_seg import this) so a new per-note constant added to
# host_osc_constants/host_filter_tables/host_pitch_phases/fm.host_phases
# cannot be chunked on one path and passed whole on the other. Keys:
# f1/f2/rsync/rgl (host_osc_constants), fidx (host_filter_tables),
# ph1/ph2 (host_pitch_phases), phm/phc (fm.host_phases), gs (host
# gate-seconds rows — see host_gate_seconds).
HOST_CTL_PER_NOTE = ("f1", "f2", "rsync", "rgl", "fidx", "ph1", "ph2",
                     "phm", "phc", "gs")


def host_gate_seconds(gate_frames, sample_rate: float) -> dict:
    """HOST per-note gate-seconds rows {"gs": [n] f32} — np.float32(gate)
    / np.float32(sr), the SAME f32 division that builds the host time
    base t (render_notes_parts), so at note age j == gate the envelope
    comparison t < gate_s sees EXACTLY EQUAL bits. The in-trace divide it
    replaces is the documented hazard: XLA rewrites x/sr into a
    reciprocal multiply under fusion, shifting gate_s one ulp off the
    literal time base — and for release-0 patches the amp envelope is a
    STEP at note-off, so that ulp flips the cut sample between full
    amplitude and zero (jingle_bells measured isolated ±0.44 spikes vs
    the f64 reference at exactly the 64-aligned note-off frames of its
    release-0 GM patches). The f64 reference evaluates its envelope on
    these same f32 bits (cast to f64), so the knife edge lands on the
    same sample in both."""
    return {"gs": (np.asarray(gate_frames, np.float32)
                   / np.float32(sample_rate))}


def host_osc_constants(params: WelshVoiceParams, keys,
                       prev_keys=None) -> dict:
    """Per-note oscillator frequency constants, HOST numpy f32.

    The offline engines precompute these from the (host) note data and
    ship the RESULTS into the jitted program, so the bits are
    backend-independent: the TPU's traced exp2/div round ~1e-6-relative
    differently from eager evaluation, which flips saw/pulse EDGE samples
    (full-scale isolated residuals vs the f64 reference, which shares
    these exact arrays). Keys: f1/f2 [n] post-tune (f2 honors the fixed-Hz
    override), rsync [n] = f2/f1 (hard-sync ratio, present only when the
    patch syncs), rgl [n] = 2^((prev-key)/12) glide source ratio (present
    only when gliding). The LIVE paths keep traced equivalents — their
    keys are dynamic device state."""
    keys = np.asarray(keys, np.float32)
    base = note_freqs(keys)  # numpy path (backend-generic)
    f1 = np.asarray(base * params.oscillator_1.tune_ratio, np.float32)
    if params.oscillator_2_fixed_hz is not None:
        f2 = np.full_like(f1, params.oscillator_2_fixed_hz)
    else:
        f2 = np.asarray(base * params.oscillator_2.tune_ratio, np.float32)
    out = {"f1": f1, "f2": f2}
    if params.oscillator_2_sync \
            and params.oscillator_1.waveform.kind != "none":
        out["rsync"] = np.asarray(f2 / np.maximum(f1, np.float32(1e-6)),
                                  np.float32)
    if params.glide > 0.0 and prev_keys is not None:
        out["rgl"] = np.asarray(
            np.exp2((np.asarray(prev_keys, np.float32) - keys)
                    / np.float32(12.0)), np.float32)
    return out


def _host_wave(kind: str, phase: np.ndarray, width: float) -> np.ndarray:
    """numpy mirror of osc_ops.evaluate for HOST control curves (the LFO
    value feeding host_pitch_phases). Formula-identical; noise is handled
    by the caller (threefry bank)."""
    fr = phase - np.floor(phase)
    if kind in ("sine", "triangle-sine"):
        # mod-1-reduced like osc_ops.sine (exact; keeps formula identity)
        return np.sin(np.float32(2.0 * np.pi) * fr)
    if kind == "square":
        return np.where(fr < 0.5, np.float32(1.0), np.float32(-1.0))
    if kind == "pulse-width":
        return np.where(fr < width, np.float32(1.0), np.float32(-1.0))
    if kind == "sawtooth":
        return np.float32(2.0) * fr - np.float32(1.0)
    if kind == "triangle":
        return np.where(fr < 0.5, np.float32(4.0) * fr - np.float32(1.0),
                        np.float32(3.0) - np.float32(4.0) * fr)
    # full osc_ops table mirror (ADVICE r4): debug-max/-min are constants,
    # so a pitch-LFO voice renders identically whether or not the host
    # phase table shipped
    if kind == "debug-max":
        return np.ones_like(phase)
    if kind == "debug-min":
        return -np.ones_like(phase)
    return np.zeros_like(phase)


def _host_lfo_values(lfo, t, span: int, sample_rate: float,
                     noise_seed: int = 0) -> np.ndarray:
    """HOST numpy-f32 mirror of _make_lfo_value (offline, non-wrapping
    S&H bank) at note-age times t (any shape): the LFO's bipolar value *
    depth. Shared by host_pitch_phases (per-sample t) and
    host_filter_tables (block-rate t) so the two host consumers can never
    drift from each other."""
    lphase = np.float32(lfo.frequency) * t
    if lfo.waveform.kind == "noise":
        n_cycles = _sh_cycles(lfo, span, sample_rate)
        vals = np.asarray(jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(noise_seed), 7),
            (n_cycles,), jnp.float32, -1.0, 1.0))
        cyc = np.clip(np.floor(lphase).astype(np.int64), 0, n_cycles - 1)
        return (vals[cyc] * np.float32(lfo.depth)).astype(np.float32)
    return (_host_wave(lfo.waveform.kind, lphase, lfo.waveform.pulse_width)
            * np.float32(lfo.depth)).astype(np.float32)


#: LFO routings whose value feeds PER-SAMPLE terms (the pulse-width edge
#: position and the amp scale) rather than only phases/coefficients
#: (pitch ships whole phase tables; filter-cutoff/resonance ship
#: coefficient tables — host_pitch_phases / host_filter_tables)
_LFO_SAMPLE_ROUTINGS = ("amplitude", "cutoff-amp", "pulse-width",
                        "pw-osc1", "pw-osc2")


def host_lfo_table(params: WelshVoiceParams, span: int, sample_rate: float,
                   noise_seed: int = 0) -> dict | None:
    """HOST per-sample LFO value table {"lv": [span] f32} for routings
    whose value enters the signal math per sample (amplitude scale,
    pulse-width edge position) — or None when no such routing is active.

    The LFO restarts at note-on, so its value is a function of NOTE AGE
    alone: one [span] row serves every note (the whole-window paths index
    it by the shared time base; the sliced path GATHERS it at absolute
    note ages, like t_full). Why host bits: the traced evaluation fuses
    (width + 0.5*lfo) / (1 + lfo) chains with fma contraction that
    rounds ~1 ulp away from any eager evaluation — a pulse edge landing
    within that ulp of the width FLIPS, and a resonant cascade rings the
    flipped sample up (clouds.mid measured a 5.2 absolute spike vs the
    f64 reference through exactly this path). The f64 reference consumes
    the same table, so the comparison isolates evaluation again."""
    lfo = params.lfo
    if not (lfo.routing in _LFO_SAMPLE_ROUTINGS and lfo.frequency > 0.0
            and lfo.depth != 0.0):
        return None
    t = (np.arange(span, dtype=np.float32)
         / np.float32(sample_rate))[None, :]
    lv = _host_lfo_values(lfo, t, span, sample_rate, noise_seed)
    return {"lv": np.broadcast_to(lv, (1, span))[0].copy()}


#: element cap for shipping host pitch-LFO phase tables ([n, span] f32 —
#: 128 MB at the cap); bigger batches are COMPUTED IN ROW CHUNKS host-side
#: (bounded peak memory), so only truly enormous batches keep the traced
#: cumsum phases
HOST_PHASE_MAX_ELEMS = 32_000_000


def host_pitch_phases(params: WelshVoiceParams, keys, prev_keys,
                      span: int, sample_rate: float,
                      noise_seed: int = 0,
                      max_elems: int = HOST_PHASE_MAX_ELEMS) -> dict | None:
    """HOST (numpy f32) oscillator PHASE tables for pitch-LFO patches.

    Pitch-modulated phases integrate cumsum(f)/sr; the TPU's traced
    parallel-scan cumsum regroups differently from any other evaluation,
    flipping saw/square edge samples (welsh-octave-switch measured
    -30.8 dBFS on-chip vs the f64 reference before this). The phases are
    pure functions of host note data + LFO params, so the engines
    precompute them here (serial f32 cumsum) and ship the tables; the
    f64 reference shares the same arrays. Returns {"ph1","ph2": [n,span]}
    or None (not pitch-routed, or the batch exceeds max_elems — such
    batches keep the traced phases and the f64 tool falls back to eager
    shares). The S&H (noise) LFO bank comes from jax.random — threefry
    is integer math, identical bits on every backend.

    Rows are COMPUTED IN CHUNKS (round-5, VERDICT r4 item 1): every row's
    cumsum is independent, so chunking bounds peak intermediate memory
    (~4 row-chunk-sized arrays) without changing a single bit — the cap
    now only guards the SHIPPED table size."""
    lfo = params.lfo
    routing = lfo.routing
    if not (routing in ("pitch", "pitch-osc2") and lfo.frequency > 0.0
            and lfo.depth != 0.0):
        return None
    keys = np.asarray(keys, np.float32)
    n = len(keys)
    if n == 0 or n * span > max_elems:
        return None
    hc = host_osc_constants(params, keys, prev_keys)
    sr = np.float32(sample_rate)
    t = (np.arange(span, dtype=np.float32) / sr)[None, :]
    lfo_val = _host_lfo_values(lfo, t, span, sample_rate, noise_seed)
    glide_on = params.glide > 0.0 and prev_keys is not None
    rgl = hc.get("rgl")
    o1_active = params.oscillator_1.waveform.kind != "none"
    o2_tracks = params.oscillator_2_fixed_hz is None

    def rows(lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
        m = hi - lo
        rglc = None if rgl is None else rgl[lo:hi]

        def gl_factor():
            u = np.maximum(np.float32(1.0) - t / np.float32(params.glide),
                           np.float32(0.0))
            return np.exp(u * np.log(rglc[:, None])).astype(np.float32)

        def freq(name, is_osc2):
            f = hc[name][lo:hi, None]
            if routing == "pitch" or (routing == "pitch-osc2" and is_osc2):
                f = (f * np.exp2(lfo_val)).astype(np.float32)
            return np.broadcast_to(f, (m, span)).astype(np.float32)

        def phase(f, glides=True):
            if glide_on and glides:
                f = (f * gl_factor()).astype(np.float32)
            inc = f / sr
            ph = np.cumsum(inc, axis=-1, dtype=np.float32)
            return np.concatenate(
                [np.zeros_like(ph[:, :1]), ph[:, :-1]], axis=-1)

        f1 = freq("f1", False)
        ph1 = phase(f1)
        if params.oscillator_2_sync and o1_active:
            ratio = np.broadcast_to(hc["rsync"][lo:hi, None],
                                    (m, span)).astype(np.float32)
            if routing == "pitch-osc2":
                ratio = (ratio * np.exp2(lfo_val)).astype(np.float32)
            if glide_on and not o2_tracks:
                ratio = (ratio / gl_factor()).astype(np.float32)
            ph2 = ((ph1 - np.floor(ph1)) * ratio).astype(np.float32)
        else:
            f2 = freq("f2", True)
            ph2 = phase(f2, glides=o2_tracks)
        return ph1.astype(np.float32), ph2.astype(np.float32)

    rows_per = max(1, 2_000_000 // max(span, 1))
    if rows_per >= n:
        ph1, ph2 = rows(0, n)
        return {"ph1": ph1, "ph2": ph2}
    out1 = np.empty((n, span), np.float32)
    out2 = np.empty((n, span), np.float32)
    for lo in range(0, n, rows_per):
        hi = min(n, lo + rows_per)
        out1[lo:hi], out2[lo:hi] = rows(lo, hi)
    return {"ph1": out1, "ph2": out2}


def host_filter_tables(params: WelshVoiceParams, gate_frames, span: int,
                       sample_rate: float, noise_seed: int = 0) -> dict | None:
    """HOST (numpy f32) block-rate cascade coefficient tables for the
    voice's internal 24 dB filter, deduplicated by gate length (the
    cutoff envelope is a function of note age and gate only, so notes
    sharing a gate share a coefficient row — u unique gates << n notes).

    LFO-driven routings (filter-cutoff / cutoff-amp / resonance) are ALSO
    designed host-side (round-5, VERDICT r4 item 1): the LFO restarts at
    note-on, so its block-rate value is a function of note age alone
    (_host_lfo_values) and the gate dedup still holds — previously these
    kept the traced coefficient path, whose tan/exp rounded ~1e-5 away
    from eager on the TPU (welsh-didgeridoo −79.2 dBFS, F64_MATRIX r4).

    Returns a dict of numpy arrays:
      fidx  [n] int32  — per-note row index into the tables
      fgain [u, nb] f32 — per-block input gain
      fsecs [2, 5, u, nb] f32 — per-section (b0,b1,b2,a1,a2) coefficients

    Formula-identical to _filter_controls + iir.lp24_sections (both
    backend-generic — numpy on host inputs); the engines gather rows on
    device (bit-exact copies), so the whole-window, sliced-stream, and
    f64-reference paths all consume IDENTICAL coefficient bits. See
    host_osc_constants for why host bits matter on the TPU: near-critical
    lp24 poles amplify the traced tan's ~1e-5 eager-vs-jit drift to
    -70 dBFS song-level."""
    lfo = params.lfo
    lfo_active = (lfo.routing != "none" and lfo.frequency > 0.0
                  and lfo.depth != 0.0)
    lfo_filter = lfo_active and lfo.routing in ("filter-cutoff",
                                                "cutoff-amp", "resonance")
    gate = np.asarray(gate_frames, np.int64)
    uniq, fidx = np.unique(gate, return_inverse=True)
    cblock = iir_ops.CONTROL_BLOCK
    nb = -(-span // cblock)
    # same construction as render_notes_parts' t_blk / gate_s (numpy ns)
    t_blk = (np.arange(nb, dtype=np.float32) * cblock)[None, :] \
        / np.float32(sample_rate)
    gate_s = (uniq.astype(np.float32) / np.float32(sample_rate))[:, None]
    fe = params.filter_envelope
    f_env = env_ops.adsr(t_blk, gate_s, fe.attack, fe.decay, fe.sustain,
                         fe.release)
    cutoff_pct = params.filter_cutoff_start + (
        params.filter_cutoff_end - params.filter_cutoff_start) * f_env
    lfo_blk = None
    if lfo_filter:
        # block-rate LFO term, host mirror of _filter_controls' formulas
        lfo_blk = _host_lfo_values(lfo, t_blk, span, sample_rate,
                                   noise_seed)                   # [1, nb]
        if lfo.routing in ("filter-cutoff", "cutoff-amp"):
            cutoff_pct = cutoff_pct + lfo_blk
    cutoff_pct = np.clip(cutoff_pct, 0.0, 1.0)
    cutoff_hz = np.exp(np.float32(LN_COEF)
                       + cutoff_pct * np.float32(LN_BASE)).astype(np.float32)
    if lfo_filter and lfo.routing == "resonance":
        # q = max(q * (1 + lfo*depth), 0.1) — _filter_controls' rule
        q = np.maximum(np.float32(params.filter_q)
                       * (np.float32(1.0) + lfo_blk),
                       np.float32(0.1)).astype(np.float32)       # [1, nb]
        q = np.broadcast_to(q, cutoff_hz.shape)
    else:
        q = np.float32(max(params.filter_q, 1e-3))
    gain, secs = iir_ops.lp24_sections(cutoff_hz, q, sample_rate)
    u = len(uniq)
    fsecs = np.empty((2, 5, u, nb), np.float32)
    for i, sec in enumerate(secs):
        for j, c in enumerate(sec):
            fsecs[i, j] = np.broadcast_to(np.asarray(c, np.float32), (u, nb))
    return {"fidx": fidx.astype(np.int32),
            "fgain": np.broadcast_to(
                np.asarray(gain, np.float32), (u, nb)).copy(),
            "fsecs": fsecs}


def gather_filter_rows(host_ctl: dict):
    """Device-side gather of a note batch's cascade coefficient rows from
    shipped host tables -> (gain_rows [n, nb], secs_rows 2x5-tuple of
    [n, nb]). Pure index copies — the table bits pass through exactly."""
    fidx = jnp.asarray(host_ctl["fidx"], jnp.int32)
    gain_rows = jnp.take(jnp.asarray(host_ctl["fgain"], jnp.float32),
                         fidx, axis=0)
    fs = jnp.asarray(host_ctl["fsecs"], jnp.float32)
    secs_rows = [tuple(jnp.take(fs[i, j], fidx, axis=0) for j in range(5))
                 for i in range(2)]
    return gain_rows, secs_rows


def filter_fidelity_mode(params: WelshVoiceParams,
                         sample_rate: float = 44100.0) -> str | None:
    """Host routing for the voice's internal cascade: 'serial' on
    non-Pallas backends for deep-corner parked cascades (see
    needs_filter_serial), else 'refine' for near-critical sustained
    points, else None (single-pass blocked/Pallas)."""
    a1, a2 = _sustained_pole_coeffs(params, sample_rate)
    if not iir_ops._pallas_available() and _crosses_serial(a1, a2):
        return "serial"
    if iir_ops.needs_refinement(a1, a2):
        return "refine"
    return None


# ---------------------------------------------------------------------------
# Shared voice-formula terms. The four render paths (whole-window
# render_notes_parts, sliced render_notes_slice_pre, live live_window_block
# and live_render_block) differ ONLY in their time bases and phase/state
# carriage; the LFO, oscillator-signal/mix, filter-control and amp-envelope
# FORMULAS are these helpers, so a routing added once applies everywhere.


#: S&H bank size for the LIVE paths' noise LFO: live note ages are
#: unbounded, so the bank wraps (offline banks cover the whole window and
#: clip). threefry is prefix-stable, so the first cycles equal an offline
#: bank drawn from the same key.
_LIVE_SH_CYCLES = 8192

#: Unison detune: the classic +/-7-cent three-voice stack. Unison is a
#: RECONSTRUCTED IMPROVEMENT (the reference derive drops the patch field,
#: patches.rs:110-169) implemented by note TRIPLING at compile time
#: (compiler/song.py): fractional MIDI keys +/-0.07 semitones at vel/3
#: ride every existing render path unchanged.
UNISON_CENTS = 7.0


def unison_notes(keys, vels, on_frames, off_frames, prev_keys=None):
    """Host-side unison TRIPLING for the render engines' note inputs:
    -> (keys f32, vels, on, off, prev) with each note replaced by three
    copies at -/0/+ UNISON_CENTS detune and vel/3 (copies glide in
    parallel when prev_keys is given). dev.notes itself is never tripled
    — it stays the true performance for the MIDI bounce/GUI/save; only
    what the welsh voice renders is stacked."""
    n = len(keys)
    rep = np.repeat(np.arange(n), 3)
    det_semi = np.float32(UNISON_CENTS / 100.0)
    det = np.tile(np.array([-det_semi, 0.0, det_semi], np.float32), n)
    keys3 = np.asarray(keys, np.float32)[rep] + det
    vels3 = (np.asarray(vels, np.float32) / 3.0)[rep]
    on3 = np.asarray(on_frames)[rep]
    off3 = np.asarray(off_frames)[rep]
    prev3 = None if prev_keys is None \
        else np.asarray(prev_keys, np.float32)[rep] + det
    return keys3, vels3, on3, off3, prev3


def unison_input_notes(notes, voice):
    """The ONE place engines turn a device's NoteTensors into render
    input arrays -> (keys, vels, on, off, prev): tripled via unison_notes
    when the voice sets unison, verbatim otherwise (incl. non-welsh
    voices, which have no unison field). Shared by engine/render and
    engine/stream so the whole-vs-streamed tripling policy can never
    drift."""
    k, v, on, off, pv = (notes.keys, notes.vels, notes.on_frames,
                         notes.off_frames, notes.prev_keys)
    if getattr(voice, "unison", False) and len(k):
        return unison_notes(k, v, on, off, pv)
    return k, v, on, off, pv


def _glide_factor(r, T: float, t):
    """Instantaneous glide multiplier g(t) = r^max(1 - t/T, 0): the pitch
    starts at r x the target frequency (r = f_prev/f_target) and slides
    exponentially (linear in log-frequency) to 1 over T seconds —
    constant-TIME portamento. Glide is a RECONSTRUCTED IMPROVEMENT: the
    reference parses the patch field (patches.rs:33) but its derive drops
    it (patches.rs:110-169); 19 shipped patches carry nonzero glide."""
    u = jnp.maximum(1.0 - t / T, 0.0)
    return jnp.exp(u * jnp.log(r))


def _glide_phase(f, r, T: float, t):
    """Closed-form phase of the exponential glide (integral of
    f * _glide_factor): f*T*(r - r^u)/ln r + f*max(t - T, 0) with
    u = max(1 - t/T, 0) and the r -> 1 limit f*t (guarded |ln r|).
    Closed form keeps the no-cumsum rule: f32 phase accumulation drifts
    on multi-second notes (see render_notes_parts.osc_phase)."""
    lr = jnp.log(r)
    safe = jnp.where(jnp.abs(lr) < 1e-6, 1.0, lr)
    u = jnp.maximum(1.0 - t / T, 0.0)
    ph = f * T * (r - jnp.exp(u * safe)) / safe + f * jnp.maximum(t - T, 0.0)
    return jnp.where(jnp.abs(lr) < 1e-6, f * t, ph)


def _make_lfo_value(lfo, n_cycles: int, noise_seed: int, wrap: bool):
    """-> lfo_value(tv): the LFO's bipolar value * depth at times tv
    (seconds since note-on; the LFO restarts at note-on), or [1, 1] zeros
    when the LFO is inert. 'noise' is sample-and-hold at the LFO rate (a
    per-sample white-noise cutoff modulation at high Q measurably blows up
    the time-varying filter: nerd-o-tron-2000 hit 9e37) drawn from a bank
    of n_cycles values; wrap=True indexes mod n_cycles (live), else
    clipped (offline, bank sized to the window)."""
    if not (lfo.routing != "none" and lfo.frequency > 0.0
            and lfo.depth != 0.0):
        return lambda tv: jnp.zeros((1, 1), jnp.float32)

    def lfo_value(tv):
        lfo_phase = lfo.frequency * tv
        if lfo.waveform.kind == "noise":
            vals = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(noise_seed), 7),
                (n_cycles,), jnp.float32, -1.0, 1.0,
            )
            cycle = jnp.floor(lfo_phase).astype(jnp.int32)
            idx = jnp.mod(cycle, n_cycles) if wrap \
                else jnp.clip(cycle, 0, n_cycles - 1)
            return vals[idx] * lfo.depth
        return osc_ops.evaluate(
            lfo.waveform.kind, lfo_phase, lfo.waveform.pulse_width
        ) * lfo.depth

    return lfo_value


def _sh_cycles(lfo, span: int, sample_rate: float) -> int:
    """Offline S&H bank size: cycles covering the whole note window."""
    return int(np.ceil(span * lfo.frequency / sample_rate)) + 2


def _osc_mix(params: WelshVoiceParams, phase1, phase2, routing, lfo_val,
             noise_fn, shape):
    """Oscillator signals -> mixed output [shape]: waveform evaluation
    (with the pulse-width LFO routings), the mix-share rule
    (patches.rs:123-132: share `mix` when both active, full scale when
    one is), and the noise mix-in. noise_fn(which) supplies white noise
    shaped [shape] for oscillator slot `which` (1/2) or the mix-in (3) —
    the one term whose keying differs per path (note-identity rows
    offline, block-keyed live)."""

    def sig(osc, phase, which):
        kind = osc.waveform.kind
        if kind == "none":
            return jnp.zeros(shape, jnp.float32)
        if kind == "pulse-width":
            width = osc.waveform.pulse_width
            if routing == "pulse-width" or routing == f"pw-osc{which}":
                width = jnp.clip(width + 0.5 * lfo_val, 0.01, 0.99)
            return osc_ops.pulse_width(phase, width)
        if kind == "noise":
            return noise_fn(which)
        return osc_ops.evaluate(kind, phase)

    s1 = sig(params.oscillator_1, phase1, 1)
    s2 = sig(params.oscillator_2, phase2, 2)
    o1_active = params.oscillator_1.waveform.kind != "none"
    o2_active = params.oscillator_2.waveform.kind != "none"
    mix = params.oscillator_mix
    if o1_active and o2_active:
        osc_out = mix * s1 + (1.0 - mix) * s2
    elif o1_active:
        osc_out = s1
    elif o2_active:
        osc_out = s2
    else:
        osc_out = jnp.zeros(shape, jnp.float32)
    if params.noise > 0.0:
        osc_out = osc_out * (1.0 - params.noise) + noise_fn(3) * params.noise
    return osc_out


def _filter_controls(params: WelshVoiceParams, t_blk, gate_s, lfo_value):
    """Block-rate filter controls -> (cutoff_hz, q) at control times t_blk:
    cutoff pct driven by the filter envelope (and the cutoff/resonance LFO
    routings), converted through the hearing-range map (25*800^pct).
    Evaluated at the reference's 64-frame CONTROL cadence — coefficients
    are recomputed per handle_work buffer, not per sample
    (orchestrator.rs:631-708; SURVEY §7 'held constant within a block')."""
    fe = params.filter_envelope
    f_env = env_ops.adsr(t_blk, gate_s, fe.attack, fe.decay, fe.sustain,
                         fe.release)
    cutoff_pct = params.filter_cutoff_start + (
        params.filter_cutoff_end - params.filter_cutoff_start
    ) * f_env
    routing = params.lfo.routing
    if routing in ("filter-cutoff", "cutoff-amp"):
        cutoff_pct = cutoff_pct + lfo_value(t_blk)
    cutoff_pct = jnp.clip(cutoff_pct, 0.0, 1.0)
    cutoff_hz = jnp.exp(LN_COEF + cutoff_pct * LN_BASE)  # 25 * 800^pct
    q = params.filter_q
    if routing == "resonance":
        q = jnp.maximum(q * (1.0 + lfo_value(t_blk)), 0.1)
    return cutoff_hz, q


def _amp_env(params: WelshVoiceParams, t, gate_s, vels, routing, lfo_val):
    """Amp envelope * velocity (+ the amplitude LFO routings) at times t."""
    ae = params.amp_envelope
    a_env = env_ops.adsr(t, gate_s, ae.attack, ae.decay, ae.sustain,
                         ae.release)
    amp = a_env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)
    if routing in ("amplitude", "cutoff-amp"):
        amp = amp * (1.0 + lfo_val)
    return amp


def render_notes_parts(
    params: WelshVoiceParams,
    keys,
    vels,
    gate_frames,
    span: int,
    sample_rate: float,
    noise_seed: int = 0,
    note_ids=None,
    prev_keys=None,
    host_ctl=None,
):
    """Everything but the cascade: (osc_out [n, span], filt, amp [n, span])
    where filt tags the cascade controls — ("hz", cutoff_b [n, nb],
    q_b [n, nb]) on the traced-coefficient path, or ("secs",
    gain_rows [n, nb], secs_rows) when host_ctl ships precomputed
    coefficient tables (see host_filter_tables; apply with
    iir.lp24_apply_blockrate_sections).

    host_ctl: optional dict of per-note control constants precomputed
    HOST-side (host_osc_constants / host_filter_tables) and shipped as
    engine inputs — f1/f2/rsync/rgl [n] rows replace the in-trace
    frequency math so the bits are backend-independent (TPU eager-vs-jit
    transcendental drift flips waveform edge samples), and
    fidx/fgain/fsecs route the cascade onto host coefficient tables.

    Split out so the engine can CONCATENATE several welsh devices' note
    batches on the row axis and run ONE fused cascade per span bucket
    (engine/render._render_welsh_merged): the cascade kernel's serial
    phase is a per-launch floor (~8 ms at span 178k on the v5e)
    regardless of row count, so per-device launches pay one floor each
    while a merged launch pays one total. Coefficients and the amp
    envelope are per-row data, so merging never changes a row's math.
    note_ids: [n] per-note identity for noise keying (defaults to
    arange) — callers that batch a SUBSET of an instrument's notes (span
    buckets, per-segment overlap sets) must pass the notes' global
    indices so a note's noise is invariant to how the batch was formed
    (osc_ops.noise_rows). prev_keys: [n] glide-source keys
    (models/voices.glide_prev_keys) — pitch slides from them over
    params.glide seconds when the patch sets glide > 0; None (or
    glide == 0) keeps the exact glide-free graph."""
    keys = jnp.asarray(keys, jnp.float32)
    n_notes = keys.shape[0]
    if note_ids is None:
        note_ids = jnp.arange(n_notes, dtype=jnp.int32)
    # t is a HOST-computed constant: an in-graph arange/sample_rate lets
    # XLA's simplifier rewrite the divide into a reciprocal multiply,
    # shifting phases by ulps BETWEEN jit and eager — which flips
    # saw/pulse EDGE samples (measured -29 dBFS jit-vs-eager on scale-c4).
    # A literal keeps phases identical under any fusion.
    t = jnp.asarray(np.arange(span, dtype=np.float32)[None, :]
                    / np.float32(sample_rate))  # [1, span]
    base_freq = note_freqs(keys)[:, None]  # [n, 1]
    hc0 = host_ctl or {}
    # gate seconds: HOST rows when shipped (host_gate_seconds — the
    # in-trace divide shifts 1 ulp off the literal time base under XLA's
    # reciprocal-multiply rewrite, flipping release-0 cut samples)
    gate_s = jnp.asarray(hc0["gs"], jnp.float32)[:, None] if "gs" in hc0 \
        else jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate

    lfo = params.lfo
    lfo_value = _make_lfo_value(lfo, _sh_cycles(lfo, span, sample_rate),
                                noise_seed, wrap=False)
    routing = lfo.routing

    hc = host_ctl or {}
    # per-sample LFO value: host table when shipped (host_lfo_table —
    # kills the traced fma drift that flips pulse edges), traced else
    lfo_val = jnp.asarray(hc["lv"], jnp.float32)[None, :] if "lv" in hc \
        else lfo_value(t)  # [1, span]
    pitch_modulated = routing in ("pitch", "pitch-osc2")
    glide_on = params.glide > 0.0 \
        and (prev_keys is not None or "rgl" in hc)
    if glide_on:
        if "rgl" in hc:
            r_gl = jnp.asarray(hc["rgl"], jnp.float32)[:, None]
        else:
            # frequency ratio prev/target per note (tune-independent)
            r_gl = jnp.exp2(
                (jnp.asarray(prev_keys, jnp.float32) - keys) / 12.0)[:, None]

    def osc_freq(osc, fixed_hz, is_osc2):
        name = "f2" if is_osc2 else "f1"
        if name in hc:
            f = jnp.asarray(hc[name], jnp.float32)[:, None]
        elif fixed_hz is not None:
            f = jnp.full_like(base_freq, fixed_hz)
        else:
            f = base_freq * osc.tune_ratio
        if routing == "pitch" or (routing == "pitch-osc2" and is_osc2):
            f = f * jnp.exp2(lfo_val)
        return jnp.broadcast_to(f, (n_notes, span))

    def osc_phase(f, glides=True):
        if pitch_modulated:
            if glide_on and glides:
                f = f * _glide_factor(r_gl, params.glide, t)
            return osc_ops.phase_from_freq(f, sample_rate)
        if glide_on and glides:
            # closed-form glide phase (no cumsum, same rule as below)
            return _glide_phase(f, r_gl, params.glide, t)
        # constant per-note frequency: closed-form phase avoids the f32
        # cumsum drift on multi-second notes
        return f * t

    def noise_fn(which):
        # noise rows keyed by note IDENTITY over the full window, so a
        # note draws the same noise whatever batch it lands in
        return osc_ops.noise_rows(
            jax.random.fold_in(jax.random.PRNGKey(noise_seed), which),
            note_ids, span,
        )

    o1_active = params.oscillator_1.waveform.kind != "none"

    f1 = osc_freq(params.oscillator_1, None, False)
    f2 = osc_freq(params.oscillator_2, params.oscillator_2_fixed_hz, True)
    o2_tracks = params.oscillator_2_fixed_hz is None
    if "ph1" in hc:
        # pitch-LFO phases are HOST tables (host_pitch_phases): the traced
        # parallel-scan cumsum regroups per-backend and flips edge samples
        phase1 = jnp.asarray(hc["ph1"], jnp.float32)
        phase2 = jnp.asarray(hc["ph2"], jnp.float32)
        osc_out = _osc_mix(params, phase1, phase2, routing, lfo_val,
                           noise_fn, (n_notes, span))
        return _parts_filter_amp(params, hc, osc_out, t, gate_s, vels,
                                 routing, lfo_val, lfo_value, n_notes,
                                 span, sample_rate)
    phase1 = osc_phase(f1)
    if params.oscillator_2_sync and o1_active:
        # hard sync: osc2 phase resets at each osc1 wrap (closed form)
        if "rsync" in hc:
            # host per-note ratio f2/f1 (pitch LFO scales both, so it
            # cancels; pitch-osc2 scales the numerator only)
            ratio = jnp.broadcast_to(
                jnp.asarray(hc["rsync"], jnp.float32)[:, None],
                (n_notes, span))
            if routing == "pitch-osc2":
                ratio = ratio * jnp.exp2(lfo_val)
        else:
            ratio = f2 / jnp.maximum(f1, 1e-6)
        if glide_on and not o2_tracks:
            # osc2 holds its fixed pitch while osc1 glides underneath
            ratio = ratio / _glide_factor(r_gl, params.glide, t)
        phase2 = osc_ops.hard_sync_phase(phase1, ratio)
    else:
        phase2 = osc_phase(f2, glides=o2_tracks)

    osc_out = _osc_mix(params, phase1, phase2, routing, lfo_val, noise_fn,
                       (n_notes, span))
    return _parts_filter_amp(params, hc, osc_out, t, gate_s, vels,
                             routing, lfo_val, lfo_value, n_notes, span,
                             sample_rate)


def _parts_filter_amp(params, hc, osc_out, t, gate_s, vels, routing,
                      lfo_val, lfo_value, n_notes: int, span: int,
                      sample_rate: float):
    """render_notes_parts' tail (filter controls + amp envelope), shared
    by the traced-phase and host-phase-table paths."""
    if "fgain" in hc:
        gain_rows, secs_rows = gather_filter_rows(hc)
        filt = ("secs", gain_rows, secs_rows)
    else:
        cblock = iir_ops.CONTROL_BLOCK
        nb = -(-span // cblock)
        t_blk = (jnp.arange(nb, dtype=jnp.float32) * cblock)[None, :] \
            / sample_rate
        cutoff_hz, q = _filter_controls(params, t_blk, gate_s, lfo_value)
        q_b = jnp.broadcast_to(jnp.asarray(q, jnp.float32), (n_notes, nb))
        cutoff_b = jnp.broadcast_to(cutoff_hz, (n_notes, nb))
        filt = ("hz", cutoff_b, q_b)

    amp = _amp_env(params, t, gate_s, vels, routing, lfo_val)
    return osc_out, filt, amp


def apply_cascade(osc_out, filt, sample_rate: float, fidelity=None):
    """Run the 24 dB cascade from a render_notes_parts filt value: host
    coefficient tables ("secs") through iir.lp24_apply_blockrate_sections,
    traced controls ("hz") through lp24_apply_blockrate."""
    if filt[0] == "secs":
        return iir_ops.lp24_apply_blockrate_sections(
            osc_out, filt[1], filt[2], fidelity=fidelity)
    return iir_ops.lp24_apply_blockrate(
        osc_out, filt[1], filt[2], sample_rate, fidelity=fidelity)


def render_notes(
    params: WelshVoiceParams,
    keys,
    vels,
    gate_frames,
    span: int,
    sample_rate: float,
    noise_seed: int = 0,
    refine_filter: bool = False,
    note_ids=None,
    prev_keys=None,
    host_ctl=None,
) -> jnp.ndarray:
    """Render all notes -> mono [n_notes, span]. refine_filter: add the
    defect-correction pass to the cascade (host decision via
    needs_filter_refinement; the coefficients here are traced, so the
    in-graph code cannot decide) — may also be a fidelity MODE string
    from filter_fidelity_mode ("serial" routes deep-corner parked
    cascades on non-Pallas backends). See render_notes_parts for the
    note_ids, prev_keys (glide), and host_ctl contracts."""
    osc_out, filt, amp = render_notes_parts(
        params, keys, vels, gate_frames, span, sample_rate,
        noise_seed=noise_seed, note_ids=note_ids, prev_keys=prev_keys,
        host_ctl=host_ctl,
    )
    # fused 24 dB cascade (one Pallas kernel on TPU; blocked scans on CPU)
    fidelity = refine_filter if isinstance(refine_filter, str) \
        else ("refine" if refine_filter else None)
    y = apply_cascade(osc_out, filt, sample_rate, fidelity)
    return y * amp


def tail_seconds(params: WelshVoiceParams) -> float:
    return max(params.amp_envelope.release, 0.0)


# ---------------------------------------------------------------------------
# SLICED rendering: one segment-sized slice of every note's window, with
# the cascade state carried across slices (engine/stream WELSH_SLICED).
#
# The whole-window path (render_notes/_parts above) recomputes a note's
# FULL span for every segment it overlaps (~2x recompute at the default
# segment size) and pays the cascade launch floor per (device, bucket,
# segment). Slicing renders exactly the segment's samples instead. Note
# on-frames are 64-aligned by the compiler (buffer-quantized events, the
# reference's dispatch granularity), so segment cuts (64-multiples)
# always land on note-relative control-block boundaries and the cascade
# streams on the same fixed 64-grid the effect filters already use
# (ops/stream; bitwise segmentation-invariant).
#
# Osc/env/LFO/noise values are BITWISE equal to the whole path at the
# same absolute note ages: time bases are GATHERS of the same host
# constants (t_full/tb_full) rather than re-derived arithmetic, so no
# XLA simplification can shift a saw/pulse edge between the paths. The
# cascade itself regroups (fixed 64-blocks + carried state vs the whole
# window's ~sqrt(span) blocks), so sliced-vs-whole agrees to ~1e-6 —
# the same contract the streamed effect filters have.
#
# The osc/LFO/envelope formulas are the shared helpers above
# (_make_lfo_value/_osc_mix/_filter_controls/_amp_env), so they match
# render_notes_parts term for term by construction.


def can_slice(params: WelshVoiceParams) -> bool:
    """Pitch-modulated phases integrate a cumsum over the whole window
    and cannot be sliced; everything else is closed-form in note age.
    Glide patches also fall back to the unsliced path: the glide phase is
    closed-form in note age but transcendental-heavy (exp/log per
    sample), and per-program fma regrouping of such chains is exactly
    the class of hazard the sliced bitwise contract pins against — the
    unsliced path needs no such proof."""
    lfo = params.lfo
    pitch_mod = (lfo.routing in ("pitch", "pitch-osc2")
                 and lfo.frequency > 0.0 and lfo.depth != 0.0)
    return not pitch_mod and params.glide <= 0.0


def slice_time_bases(span: int, sample_rate: float):
    """Host constants the slice path gathers from: t_full [span] note-age
    seconds (IDENTICAL construction to render_notes_parts' t) and
    tb_full [nb] control-block times."""
    cblock = iir_ops.CONTROL_BLOCK
    nb = -(-span // cblock)
    t_full = np.arange(span, dtype=np.float32) / np.float32(sample_rate)
    tb_full = (np.arange(nb, dtype=np.float32) * cblock
               ) / np.float32(sample_rate)
    return t_full, tb_full


def slice_rows(table, age0, S: int, span: int):
    """Per-row contiguous window fetch: row i gets table[age0_i + j] for
    j in [0, S), with ZERO fill outside [0, span) — the slice path's
    replacement for `table[clip(age, 0, span-1)]` gathers.

    Why: a [rows, S] one-hot gather measured 1174 us on-chip vs 18 us
    for vmapped dynamic_slice out of a zero-padded copy (65x — gathers
    index element-by-element on TPU, slices are contiguous DMA copies);
    the gathers were ~97%% of the forced-sliced step's time
    (DECISIONS.md 'Sliced stream cost attribution').

    Bits: in-window elements are the SAME table entries bit for bit.
    Out-of-window positions read the ZERO padding instead of the old
    clamped-edge values — safe because every consumer masks
    out-of-window samples (`valid` zeroes osc_out before the cascade and
    amp after it), so those values never reach the output."""
    S = int(S)
    table = jnp.asarray(table)
    z = jnp.zeros((S,), table.dtype)
    tp = jnp.concatenate([z, table, z])
    start = jnp.clip(jnp.asarray(age0, jnp.int32), -S, span) + S
    return jax.vmap(lambda a: jax.lax.dynamic_slice(tp, (a,), (S,)))(start)


def slice_state_init(count: int, mode) -> dict:
    """Carried cascade state for `count` note slots plus one SCRATCH slot
    (index `count`) that padded batch rows read/write so they can never
    corrupt a real note's state. mode: None/'serial' -> plain TDF2 pairs
    per section; 'refine' -> sops.refined_state_init per section with
    per-row coefficient histories. Leaves all have the ROW as the leading
    axis (gather/scatter-friendly); the refined 'ch' is stored
    row-major [rows, 4, 2] and transposed around the op.

    On TPU (iir._pallas_available) the cascade runs in the fused stream
    kernels instead, whose carried state is one packed row vector:
    'p4' [rows, 4] for the plain cascade (s1a, s2a, s1b, s2b — bitwise
    ops/stream.biquad_stream's 64-grid), 'p20' [rows, 20] for the refined
    cascade ('serial' routes to refined like the one-shot
    iir.lp24_apply_blockrate dispatch: the fused refined kernel is the
    accuracy reference at the deep corner, −95 dBFS on-chip). The key set
    decides the dispatch in render_notes_slice."""
    from groove_tpu.ops import iir as iir_mod
    from groove_tpu.ops import stream as sops

    rows = count + 1
    st: dict = {}
    if iir_mod._pallas_available():
        if mode in ("refine", "serial"):
            return {"p20": jnp.zeros((rows, 20), jnp.float32)}
        return {"p4": jnp.zeros((rows, 4), jnp.float32)}
    if mode == "refine":
        for i in range(2):
            ref = sops.refined_state_init((rows,), coef_batch=(rows,))
            ref["ch"] = jnp.moveaxis(ref["ch"], 0, 1)  # [rows, 4, 2]
            for k, v in ref.items():
                st[f"rf{i}/{k}"] = v
    else:
        for i in range(2):
            st[f"s{i}/1"] = jnp.zeros((rows,), jnp.float32)
            st[f"s{i}/2"] = jnp.zeros((rows,), jnp.float32)
    return st


def render_notes_slice(
    params: WelshVoiceParams,
    keys,
    vels,
    gate_frames,
    age0,
    S: int,
    sample_rate: float,
    fstate: dict,
    t_full,
    tb_full,
    noise_seed: int = 0,
    note_ids=None,
    fidelity=None,
    host_ctl=None,
):
    """Render note-age slice [age0, age0+S) of each note -> (mono [n, S],
    new fstate). age0: [n] int32, multiples of 64 (negative while the
    note hasn't started; past span while it has died — both masked to
    exact zeros). fstate: per-ROW state (already gathered to the batch),
    see slice_state_init. fidelity: None | 'serial' | 'refine' (the host
    routing from filter_fidelity_mode).

    Composition of three stages (pre / cascade_slices / finish_slice).
    The split would let an engine merge same-length slices across
    devices into one cascade launch per segment — evaluated and NOT
    wired up: on-chip measurement showed sliced streaming loses to the
    whole-window path at the default segment sizes regardless of launch
    count (slice length >> note span renders mostly-masked rows; see
    DECISIONS.md 'Sliced welsh on TPU'), so no engine caller needs the
    stages separately today."""
    y, secs_b, ctx = render_notes_slice_pre(
        params, keys, vels, gate_frames, age0, S, sample_rate,
        t_full, tb_full, noise_seed=noise_seed, note_ids=note_ids,
        host_ctl=host_ctl)
    y, new_state = cascade_slices(y, secs_b, fstate, fidelity)
    return finish_slice(params, y, ctx), new_state


def render_notes_slice_pre(
    params: WelshVoiceParams,
    keys,
    vels,
    gate_frames,
    age0,
    S: int,
    sample_rate: float,
    t_full,
    tb_full,
    noise_seed: int = 0,
    note_ids=None,
    host_ctl=None,
):
    """Everything before the cascade: osc mix + noise + window mask +
    filter-envelope sections + input gain. Returns (y [n, S] gained
    cascade input, secs_b block-rate sections, ctx for finish_slice).
    host_ctl: optional host control constants (see render_notes_parts) —
    frequency rows replace the in-trace math and fgain/fsecs tables (over
    the FULL window's blocks) are gathered at the slice's block indices,
    so sliced and whole-window renders consume IDENTICAL coefficient
    bits."""
    keys = jnp.asarray(keys, jnp.float32)
    n = keys.shape[0]
    if note_ids is None:
        note_ids = jnp.arange(n, dtype=jnp.int32)
    span = t_full.shape[0]
    nb_total = tb_full.shape[0]
    cblock = iir_ops.CONTROL_BLOCK
    nb_seg = S // cblock
    age0 = jnp.asarray(age0, jnp.int32)

    ar = jnp.arange(S, dtype=jnp.int32)
    age = age0[:, None] + ar[None, :]                     # [n, S]
    valid = (age >= 0) & (age < span)
    t = slice_rows(t_full, age0, S, span)                 # [n, S] windows
    bk = (age0 // cblock)[:, None] + jnp.arange(nb_seg)[None, :]
    validb = (bk >= 0) & (bk < nb_total)
    t_blk = jnp.asarray(tb_full)[jnp.clip(bk, 0, nb_total - 1)]

    base_freq = note_freqs(keys)[:, None]                 # [n, 1]
    hc0 = host_ctl or {}
    # host gate-seconds rows when shipped (see render_notes_parts)
    gate_s = jnp.asarray(hc0["gs"], jnp.float32)[:, None] if "gs" in hc0 \
        else jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate

    lfo = params.lfo
    # S&H bank sized from the WHOLE window (slice-invariant)
    lfo_value = _make_lfo_value(lfo, _sh_cycles(lfo, span, sample_rate),
                                noise_seed, wrap=False)
    routing = lfo.routing
    # pitch modulation is excluded by can_slice (cumsum phases)

    hc = host_ctl or {}
    # per-sample LFO value: the host table windowed at absolute note
    # ages when shipped (bitwise the whole path's in-window values —
    # same table, same positions as t above), traced else
    lfo_val = slice_rows(hc["lv"], age0, S, span) if "lv" in hc \
        else lfo_value(t)

    def osc_freq(osc, fixed_hz, name):
        if name in hc:
            f = jnp.asarray(hc[name], jnp.float32)[:, None]
        elif fixed_hz is not None:
            f = jnp.full_like(base_freq, fixed_hz)
        else:
            f = base_freq * osc.tune_ratio
        return jnp.broadcast_to(f, (n, S))

    def noise_fn(which):
        # full id-keyed rows REGENERATED in-graph and sliced at the note
        # age: bitwise the whole path's noise whatever the segmentation.
        # Regeneration is O(n*span) RNG per segment, but it is what keeps
        # the invariance: pre-generated input TABLES were measured to make
        # XLA:CPU contract the downstream noise mix differently at
        # different segment lengths (1-ulp one-seg vs many-seg divergence;
        # DECISIONS.md 'Sliced noise tables').
        nz = osc_ops.noise_rows(
            jax.random.fold_in(jax.random.PRNGKey(noise_seed), which),
            note_ids, span,
        )
        # per-row window via padded dynamic_slice (same 65x gather-vs-
        # slice reasoning as slice_rows; out-of-window zeros are masked)
        z = jnp.zeros((nz.shape[0], S), nz.dtype)
        tp = jnp.concatenate([z, nz, z], axis=1)
        start = jnp.clip(age0, -S, span) + S
        return jax.vmap(
            lambda row, a: jax.lax.dynamic_slice(row, (a,), (S,))
        )(tp, start)

    o1_active = params.oscillator_1.waveform.kind != "none"
    f1 = osc_freq(params.oscillator_1, None, "f1")
    f2 = osc_freq(params.oscillator_2, params.oscillator_2_fixed_hz, "f2")
    phase1 = f1 * t
    if params.oscillator_2_sync and o1_active:
        if "rsync" in hc:
            ratio = jnp.broadcast_to(
                jnp.asarray(hc["rsync"], jnp.float32)[:, None], (n, S))
        else:
            ratio = f2 / jnp.maximum(f1, 1e-6)
        phase2 = osc_ops.hard_sync_phase(phase1, ratio)
    else:
        phase2 = f2 * t

    osc_out = _osc_mix(params, phase1, phase2, routing, lfo_val, noise_fn,
                       (n, S))

    # zero the out-of-window region BEFORE the filter: the cascade state
    # must stay exactly 0 until note-on (the whole path's window starts
    # there), and junk past the window end must not enter the recurrence
    osc_out = jnp.where(valid, osc_out, 0.0)

    del validb  # coefficients outside the window meet zero input/output
    if "fgain" in hc:
        # gather the slice's blocks from the host coefficient tables —
        # bit-identical to the whole-window path's rows (same table)
        fidx = jnp.asarray(hc["fidx"], jnp.int32)
        bkc = jnp.clip(bk, 0, nb_total - 1)
        gain_b = jnp.take_along_axis(
            jnp.take(jnp.asarray(hc["fgain"], jnp.float32), fidx, axis=0),
            bkc, axis=1)                                   # [n, nb_seg]
        fs = jnp.asarray(hc["fsecs"], jnp.float32)
        secs_b = [tuple(jnp.take_along_axis(
            jnp.take(fs[i, j], fidx, axis=0), bkc, axis=1)
            for j in range(5)) for i in range(2)]
    else:
        cutoff_hz, q = _filter_controls(params, t_blk, gate_s, lfo_value)
        q_b = jnp.broadcast_to(jnp.asarray(q, jnp.float32), (n, nb_seg))
        gain_b, secs_b = iir_ops.lp24_sections(
            jnp.broadcast_to(cutoff_hz, (n, nb_seg)), q_b, sample_rate)
    y = osc_out * iir_ops.upsample_hold(
        jnp.broadcast_to(gain_b, (n, nb_seg)), S, cblock)
    return y, secs_b, (t, gate_s, vels, lfo_val, valid, routing)


def cascade_slices(y, secs_b, fstate: dict, fidelity, cblock: int = 64):
    """The sliced cascade stage over any row batch [n, S] (rows may span
    several devices/buckets — the merged engine path concatenates them).
    State layout per slice_state_init; dispatch keys off the state's key
    set. Returns (y, new_state)."""
    from groove_tpu.ops import stream as sops

    n, S = y.shape
    nb_seg = S // cblock
    new_state = dict(fstate)
    if "p4" in fstate or "p20" in fstate:
        # TPU: fused stream kernels (state layout from slice_state_init).
        # The plain kernel's output/exit state are bitwise the XLA
        # 64-grid biquad_stream path's; the refined kernel chains bitwise
        # with itself and matches the one-shot refined kernel at zero
        # state (tests/test_pallas.py).
        from groove_tpu.ops import pallas_iir

        interp = pallas_iir.FORCE_INTERPRET
        secs_full = tuple(
            tuple(jnp.broadcast_to(jnp.asarray(c, jnp.float32),
                                   (n, nb_seg)) for c in sec)
            for sec in secs_b
        )
        if "p20" in fstate:
            y, st2 = pallas_iir.lp24_refined_blockrate_stream_pallas(
                y, secs_full, fstate["p20"], cblock, interpret=interp)
            new_state["p20"] = st2
        else:
            y, st2 = pallas_iir.lp24_blockrate_stream_pallas(
                y, secs_full, fstate["p4"], cblock, interpret=interp)
            new_state["p4"] = st2
        return y, new_state
    for i, sec in enumerate(secs_b):
        sec_ps = tuple(
            iir_ops.upsample_hold(
                jnp.broadcast_to(jnp.asarray(c, jnp.float32), (n, nb_seg)),
                S, cblock)
            for c in sec
        )
        if fidelity == "refine":
            st = {k: fstate[f"rf{i}/{k}"]
                  for k in ("ss1", "ss2", "cs1", "cs2", "xh", "yh")}
            st["ch"] = jnp.moveaxis(fstate[f"rf{i}/ch"], 1, 0)  # [4,n,2]
            y, st2 = sops.biquad_stream_refined(y, sec_ps, st)
            st2["ch"] = jnp.moveaxis(st2["ch"], 0, 1)           # [n,4,2]
            for k, v in st2.items():
                new_state[f"rf{i}/{k}"] = v
        else:
            y, (s1_, s2_) = sops.biquad_stream(
                y, sec_ps, (fstate[f"s{i}/1"], fstate[f"s{i}/2"]),
                serial=(fidelity == "serial"),
            )
            new_state[f"s{i}/1"] = s1_
            new_state[f"s{i}/2"] = s2_
    return y, new_state


def finish_slice(params: WelshVoiceParams, y, ctx):
    """Post-cascade stage: amp envelope/velocity/LFO/window mask (ctx
    from render_notes_slice_pre)."""
    t, gate_s, vels, lfo_val, valid, routing = ctx
    return _slice_finish(params, y, t, gate_s, vels, lfo_val, valid,
                         routing)


def _slice_finish(params, y, t, gate_s, vels, lfo_val, valid, routing):
    """Amp envelope + velocity + LFO amplitude routing + window mask —
    identical on the XLA and Pallas cascade paths (and term-for-term
    render_notes_parts' amp stage)."""
    amp = _amp_env(params, t, gate_s, vels, routing, lfo_val)
    amp = jnp.where(valid, amp, 0.0)
    return y * amp


# ---------------------------------------------------------------------------
# Live (streaming) voice path: block-at-a-time with carried state, for the
# interactive MIDI loop (engine/live.py). The reference's live path is the
# same per-sample voice the offline render uses, pulled by the audio
# callback in 64-frame buffers (legacy/audio_panel.rs:66-98); here each
# block is one jitted call over a fixed voice pool with carried oscillator
# phases and filter state.


@dataclass(frozen=True)
class LiveVoiceState:
    """Per-voice carried state ([V] each)."""

    phase1: jnp.ndarray     # f32, cycles mod 1
    phase2: jnp.ndarray
    s1a: jnp.ndarray        # TDF2 state, filter section A
    s2a: jnp.ndarray
    s1b: jnp.ndarray        # section B
    s2b: jnp.ndarray
    age: jnp.ndarray        # i32 frames since note-on
    release_age: jnp.ndarray  # i32 frame of note-off (2**30 while held)
    keys: jnp.ndarray       # f32 MIDI key
    vels: jnp.ndarray       # f32 0..127 (0 = inactive)
    prev_keys: jnp.ndarray  # f32 glide-source key (last played pitch)


jax.tree_util.register_dataclass(
    LiveVoiceState,
    data_fields=["phase1", "phase2", "s1a", "s2a", "s1b", "s2b",
                 "age", "release_age", "keys", "vels", "prev_keys"],
    meta_fields=[],
)


def live_init_state(n_voices: int) -> LiveVoiceState:
    z = jnp.zeros((n_voices,), jnp.float32)
    zi = jnp.zeros((n_voices,), jnp.int32)
    return LiveVoiceState(z, z, z, z, z, z, zi,
                          jnp.full((n_voices,), 2**30, jnp.int32), z, z, z)


def live_window_state_init(n_voices: int) -> dict:
    """Carried state for live_window_block: oscillator phases + TDF2
    filter states per voice (note bookkeeping stays host-side)."""
    z = jnp.zeros((n_voices,), jnp.float32)
    return {"phase1": z, "phase2": z,
            "s1a": z, "s2a": z, "s1b": z, "s2b": z}


def live_window_block(
    params: WelshVoiceParams,
    fstate: dict,
    keys,
    vels,
    on_abs,
    off_abs,
    t0,
    n: int,
    sample_rate: float,
    prev_keys=None,
) -> tuple[jnp.ndarray, dict]:
    """Live full-graph voice block -> (mono [n], next fstate).

    Unlike live_render_block (which keeps note bookkeeping in device
    state and needs ~10 host->device .at[].set calls per note event —
    ~24 ms each over this machine's tunnel), ALL note data (keys, vels,
    absolute on/off frames) arrives as traced inputs each block and a
    voice whose note STARTS at this block (on == t0; the host allocator
    pins note-ons to block boundaries) has its carried phase/filter state
    reset IN-GRAPH. Note events therefore cost zero device round trips —
    they mutate host numpy mirrors only (engine/livesong.py).

    Envelopes/LFO are closed-form in integer note age; oscillator phases
    integrate per block (carried mod 1, no f32 drift on long holds).
    prev_keys: [V] glide-source keys per voice (the last played pitch,
    host-tracked) — with params.glide > 0 the per-sample oscillator
    frequency is scaled by the glide factor BEFORE the phase integral,
    so the cumsum integrates the slide exactly.
    """
    sr = sample_rate
    keys = jnp.asarray(keys, jnp.float32)
    vels = jnp.asarray(vels, jnp.float32)
    on = jnp.asarray(on_abs, jnp.int32)[:, None]
    off = jnp.asarray(off_abs, jnp.int32)[:, None]
    V = keys.shape[0]
    tj = (jnp.asarray(t0, jnp.int32)
          + jnp.arange(n, dtype=jnp.int32))[None, :]           # [1, n]
    age_i = tj - on                                             # [V, n] i32
    t_abs = jnp.maximum(age_i, 0).astype(jnp.float32) / sr      # note age (s)
    gate_s = (off - on).astype(jnp.float32) / sr
    fresh = (on[:, 0] == jnp.asarray(t0, jnp.int32))            # [V] bool
    active = (vels > 0.0)[:, None]
    base_freq = note_freqs(keys)[:, None]

    lfo = params.lfo
    routing = lfo.routing
    # S&H noise LFO included: fixed wrapping bank (live ages are unbounded)
    lfo_value = _make_lfo_value(lfo, _LIVE_SH_CYCLES, 0, wrap=True)
    lfo_val = lfo_value(t_abs)

    def freq_of(osc, fixed_hz, is_osc2):
        if fixed_hz is not None:
            f = jnp.full((V, 1), fixed_hz, jnp.float32)
        else:
            f = base_freq * osc.tune_ratio
        if routing == "pitch" or (routing == "pitch-osc2" and is_osc2):
            f = f * jnp.exp2(lfo_val)
        return jnp.broadcast_to(f, (V, n))

    f1 = freq_of(params.oscillator_1, None, False)
    f2 = freq_of(params.oscillator_2, params.oscillator_2_fixed_hz, True)
    if params.glide > 0.0 and prev_keys is not None:
        r_gl = jnp.exp2(
            (jnp.asarray(prev_keys, jnp.float32) - keys) / 12.0)[:, None]
        gf = _glide_factor(r_gl, params.glide, t_abs)   # [V, n]
        f1 = f1 * gf
        if params.oscillator_2_fixed_hz is None:
            f2 = f2 * gf
    ph1_0 = jnp.where(fresh, 0.0, fstate["phase1"])[:, None]
    ph2_0 = jnp.where(fresh, 0.0, fstate["phase2"])[:, None]
    # exclusive cumulative phase; samples before note-on don't advance it
    inc1 = f1 / sr * (age_i >= 0)
    inc2 = f2 / sr * (age_i >= 0)
    ph1 = ph1_0 + jnp.cumsum(inc1, axis=1) - inc1
    ph2 = ph2_0 + jnp.cumsum(inc2, axis=1) - inc2
    new_phase1 = jnp.mod(ph1[:, -1] + inc1[:, -1], 1.0)
    new_phase2 = jnp.mod(ph2[:, -1] + inc2[:, -1], 1.0)
    if params.oscillator_2_sync and params.oscillator_1.waveform.kind != "none":
        ph2 = osc_ops.hard_sync_phase(ph1, f2 / jnp.maximum(f1, 1e-6))

    t0i = jnp.asarray(t0, jnp.int32)

    def noise_fn(which):
        # keyed per BLOCK (fold the absolute block origin): a constant
        # key would repeat the same 64-sample pattern every block — a
        # pitched ~689 Hz buzz at 44.1 kHz instead of white noise
        return osc_ops.noise(
            jax.random.fold_in(jax.random.PRNGKey(which), t0i), (V, n))

    osc_out = _osc_mix(params, ph1, ph2, routing, lfo_val, noise_fn, (V, n))

    # filter coefficients at the 64-frame control cadence WITHIN the
    # block: the lookahead play-along mode runs blocks >> 64 on the TPU
    # (engine/livesong block_frames), and coefficients pinned to the
    # block START would degrade the reference's per-handle_work update
    # (orchestrator.rs:631-708). At n == 64 this is exactly the old
    # block-start behavior. n must be 64-aligned (ADVICE r4: the
    # truncating grid would silently drop the tail's coefficients);
    # engine/livesong asserts the same at construction.
    assert n % 64 == 0, f"live welsh block must be a 64-multiple, got {n}"
    nb = max(1, n // 64)
    t_blk = t_abs[:, ::64][:, :nb]
    cutoff_hz, q = _filter_controls(params, t_blk, gate_s, lfo_value)
    gain_b, sections = iir_ops.lp24_sections(cutoff_hz, q, sr)
    cshape = (V, nb)
    y = osc_out * iir_ops.upsample_hold(
        jnp.broadcast_to(gain_b, cshape), n, 64)
    s1a0 = jnp.where(fresh, 0.0, fstate["s1a"])
    s2a0 = jnp.where(fresh, 0.0, fstate["s2a"])
    s1b0 = jnp.where(fresh, 0.0, fstate["s1b"])
    s2b0 = jnp.where(fresh, 0.0, fstate["s2b"])
    sec_ps = [tuple(iir_ops.upsample_hold(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape), n, 64)
        for c in sec) for sec in sections]
    y, (s1a, s2a), _ = iir_ops.biquad(
        y, sec_ps[0], block=n,
        initial_state=(s1a0, s2a0), return_state=True)
    y, (s1b, s2b), _ = iir_ops.biquad(
        y, sec_ps[1], block=n,
        initial_state=(s1b0, s2b0), return_state=True)

    amp = _amp_env(params, t_abs, gate_s, vels, routing, lfo_val) \
        * active * (age_i >= 0)
    mono = jnp.sum(y * amp, axis=0)

    return mono, {"phase1": new_phase1, "phase2": new_phase2,
                  "s1a": s1a, "s2a": s2a, "s1b": s1b, "s2b": s2b}


def live_render_block(
    params: WelshVoiceParams,
    state: LiveVoiceState,
    block: int,
    sample_rate: float,
    t0=0,
) -> tuple[jnp.ndarray, LiveVoiceState]:
    """One streaming block: -> (mono [block], next state).

    Oscillator phases integrate per sample and wrap per block (no f32
    drift on long holds); filter coefficients update at block rate (the
    reference's 64-frame control cadence) with exact TDF2 state carry via
    ops/iir.biquad(initial_state=..., return_state=True). LFO phase is
    derived from voice age, so every routing works in streaming mode.
    t0: absolute session frame of the block start (host counter, traced) —
    keys the noise oscillators per block so their pattern never repeats."""
    sr = sample_rate
    V = state.keys.shape[0]
    j = jnp.arange(block, dtype=jnp.float32)[None, :]
    t_abs = (state.age[:, None].astype(jnp.float32) + j) / sr   # [V, block]
    gate_s = jnp.minimum(
        state.release_age.astype(jnp.float32), 2.0**30) [:, None] / sr
    base_freq = note_freqs(state.keys)[:, None]

    lfo = params.lfo
    routing = lfo.routing
    # S&H noise LFO included: fixed wrapping bank (live ages are unbounded)
    lfo_value = _make_lfo_value(lfo, _LIVE_SH_CYCLES, 0, wrap=True)
    lfo_val = lfo_value(t_abs)

    def freq_of(osc, fixed_hz, is_osc2):
        if fixed_hz is not None:
            f = jnp.full((V, 1), fixed_hz, jnp.float32)
        else:
            f = base_freq * osc.tune_ratio
        if routing == "pitch" or (routing == "pitch-osc2" and is_osc2):
            f = f * jnp.exp2(lfo_val)
        return jnp.broadcast_to(f, (V, block))

    f1 = freq_of(params.oscillator_1, None, False)
    f2 = freq_of(params.oscillator_2, params.oscillator_2_fixed_hz, True)
    if params.glide > 0.0:
        r_gl = jnp.exp2((state.prev_keys - state.keys) / 12.0)[:, None]
        gf = _glide_factor(r_gl, params.glide, t_abs)   # [V, block]
        f1 = f1 * gf
        if params.oscillator_2_fixed_hz is None:
            f2 = f2 * gf
    # exclusive cumulative phase: sample j uses phase BEFORE advancing by f_j
    ph1 = state.phase1[:, None] + (jnp.cumsum(f1, axis=1) - f1) / sr
    ph2 = state.phase2[:, None] + (jnp.cumsum(f2, axis=1) - f2) / sr
    new_phase1 = jnp.mod(ph1[:, -1] + f1[:, -1] / sr, 1.0)
    new_phase2 = jnp.mod(ph2[:, -1] + f2[:, -1] / sr, 1.0)
    if params.oscillator_2_sync and params.oscillator_1.waveform.kind != "none":
        ph2 = osc_ops.hard_sync_phase(ph1, f2 / jnp.maximum(f1, 1e-6))

    t0i = jnp.asarray(t0, jnp.int32)

    def noise_fn(which):
        # keyed per BLOCK (fold the absolute block origin): a constant
        # key would repeat the same pattern every block — a pitched buzz
        return osc_ops.noise(
            jax.random.fold_in(jax.random.PRNGKey(which), t0i), (V, block))

    osc_out = _osc_mix(params, ph1, ph2, routing, lfo_val, noise_fn,
                       (V, block))

    # filter coefficients at the 64-frame control cadence within the
    # block (see live_window_block; same 64-alignment contract)
    assert block % 64 == 0, \
        f"live welsh block must be a 64-multiple, got {block}"
    nb = max(1, block // 64)
    t_blk0 = t_abs[:, ::64][:, :nb]
    cutoff_hz, q = _filter_controls(params, t_blk0, gate_s, lfo_value)
    gain_b, sections = iir_ops.lp24_sections(cutoff_hz, q, sr)
    cshape = (V, nb)
    y = osc_out * iir_ops.upsample_hold(
        jnp.broadcast_to(gain_b, cshape), block, 64)
    sec_ps = [tuple(iir_ops.upsample_hold(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), cshape), block, 64)
        for c in sec) for sec in sections]
    y, (s1a, s2a), _ = iir_ops.biquad(
        y, sec_ps[0], block=block,
        initial_state=(state.s1a, state.s2a), return_state=True)
    y, (s1b, s2b), _ = iir_ops.biquad(
        y, sec_ps[1], block=block,
        initial_state=(state.s1b, state.s2b), return_state=True)

    amp = _amp_env(params, t_abs, gate_s, state.vels, routing, lfo_val)
    mono = jnp.sum(y * amp, axis=0)

    new_state = LiveVoiceState(
        phase1=new_phase1, phase2=new_phase2,
        s1a=s1a, s2a=s2a, s1b=s1b, s2b=s2b,
        age=state.age + block,
        release_age=state.release_age,
        keys=state.keys, vels=state.vels,
        prev_keys=state.prev_keys,
    )
    return mono, new_state

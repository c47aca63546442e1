"""Simple instruments: always-on oscillator, envelope demo instrument,
metronome, and the toy test doubles.

- `oscillator` / `envelope` instrument kinds appear in demo projects but
  not in the reference's InstrumentSettings (SURVEY §7 data quirks;
  projects/demos/instruments/oscillator-sine-a4.json:13-21,
  envelope-adsr-linear.json:14-27). The oscillator instrument plays its
  configured frequency continuously for the whole render; the envelope
  instrument is a fixed-frequency tone shaped by the configured ADSR per
  note.
- Metronome: square-wave clicks, 440 Hz per beat / 880 Hz per measure,
  10 ms long (full source in entities/src/instruments/metronome.rs:43-96;
  disabled in the reference Orchestrator pending its issue #127, so the
  engine only instantiates it on request).
- Toys (groove-toys, missing; contracts from orchestrator tests):
  ToyAudioSource emits a constant `level`; ToyInstrument emits `fake_value`
  with its sign flipping each sample (tests only use the magnitude);
  ToyEffect negates; DebugSynth emits a constant 0.32767.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from groove_tpu.ops import envelope as env_ops
from groove_tpu.ops import oscillator as osc_ops
from groove_tpu.models.voices import note_freqs


def oscillator_instrument(kind: str, frequency: float, n_frames: int,
                          sample_rate: float, noise_seed: int = 0) -> jnp.ndarray:
    """Always-on oscillator -> mono [n]. The time base is a host constant
    so phases are identical under jit and eager (see welsh.render_notes:
    XLA's reciprocal-multiply rewrite otherwise flips square/saw edges)."""
    t = jnp.asarray(np.arange(n_frames, dtype=np.float32)
                    / np.float32(sample_rate))
    phase = frequency * t
    if kind == "noise":
        import jax
        return osc_ops.noise(jax.random.PRNGKey(noise_seed), (n_frames,))
    return osc_ops.evaluate(kind, phase)


def oscillator_phase_automated(freq_b, n_frames: int, sample_rate: float,
                               cblock: int = 64) -> jnp.ndarray:
    """HOST-constant integrated phase for an automated-frequency demo
    oscillator (formerly STATIC_ONLY): phase[j] = Σ_{i<j} f(i)/sr with f
    held per 64-sample control block. Serial numpy cumsum in FLOAT64,
    cast to f32 — a host constant like oscillator_instrument's time
    base, so phases are identical under jit and eager AND between the
    whole-timeline and streamed engines (the stream slices this same
    array). The f64 accumulation matters: an f32 cumsum drifts ~0.3
    cycles over 2 s at 141 Hz (systematic rounding against the growing
    sum), fully decorrelating a constant trip from the static f*t
    phase; in f64 the residual is one f32 ulp of the total phase
    (pinned by test_param_automation's constant-trip parity test).
    freq_b: block-rate Hz curve (host data, dev.automation)."""
    f = np.asarray(freq_b, np.float32)
    nb = -(-int(n_frames) // cblock)
    if f.shape[0] < nb:
        pad = np.full(nb - f.shape[0], f[-1] if f.size else 0.0,
                      np.float32)
        f = np.concatenate([f, pad])
    f_up = np.repeat(f[:nb], cblock)[:n_frames]
    step = f_up.astype(np.float64) / np.float64(sample_rate)
    ph = np.concatenate([
        np.zeros(1, np.float64),
        np.cumsum(step, dtype=np.float64)[:-1],
    ]).astype(np.float32)
    return jnp.asarray(ph)


def envelope_instrument(adsr_seconds, keys, vels, gate_frames, span: int,
                        sample_rate: float, freqs=None) -> jnp.ndarray:
    """Sine at note pitch shaped by the configured ADSR -> [n_notes, span].
    freqs: optional HOST-precomputed Hz [n] (backend-independent bits —
    see welsh.host_osc_constants); defaults to traced note_freqs."""
    a, d, s, r = adsr_seconds
    keys = jnp.asarray(keys, jnp.float32)
    f = jnp.asarray(freqs, jnp.float32) if freqs is not None \
        else note_freqs(keys)
    # HOST time-base literal (see welsh.render_notes_parts' t): keeps the
    # tone phase bits identical across programs/backends
    t = jnp.asarray(np.arange(span, dtype=np.float32)[None, :]
                    / np.float32(sample_rate))
    gate_s = jnp.asarray(gate_frames, jnp.float32)[:, None] / sample_rate
    env = env_ops.adsr(t, gate_s, a, d, s, r)
    # osc_ops.sine range-reduces mod 1: note phases reach ~1000 cycles
    # and the TPU's f32 sin loses precision with argument magnitude
    # (the round-4 envelope-adsr-linear -79.8 dBFS residual)
    tone = osc_ops.sine(f[:, None] * t)
    return tone * env * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)


def envelope_window(adsr_seconds, keys, vels, on_abs, off_abs, t0, n: int,
                    sample_rate: float) -> jnp.ndarray:
    """Live window render of the envelope demo instrument -> [V, n]:
    closed-form in note age, any block offset (engine/livesong.py)."""
    a, d, s, r = adsr_seconds
    keys = jnp.asarray(keys, jnp.float32)
    # integer note age: f32 absolute frames lose sample precision past
    # ~2^24 frames (6 min of session)
    on = jnp.asarray(on_abs, jnp.int32)[:, None]
    off = jnp.asarray(off_abs, jnp.int32)[:, None]
    tj = (jnp.asarray(t0, jnp.int32)
          + jnp.arange(n, dtype=jnp.int32))[None, :]
    t = (tj - on).astype(jnp.float32) / sample_rate
    gate_s = (off - on).astype(jnp.float32) / sample_rate
    env = env_ops.adsr(t, gate_s, a, d, s, r) * (t >= 0.0)
    tone = osc_ops.sine(note_freqs(keys)[:, None] * t)
    active = (jnp.asarray(vels, jnp.float32) > 0.0)[:, None]
    return tone * env * active * (jnp.asarray(vels, jnp.float32)[:, None] / 127.0)


def metronome(n_frames: int, sample_rate: float, bpm: float,
              beats_per_measure: int = 4) -> jnp.ndarray:
    """Square clicks: 880 Hz at measure starts, 440 Hz other beats, 10 ms."""
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    beat_len = 60.0 / bpm
    beat_idx = np.floor(t / beat_len).astype(np.int64)
    in_click = (t - beat_idx * beat_len) < 0.01
    is_measure = (beat_idx % beats_per_measure) == 0
    freq = np.where(is_measure, 880.0, 440.0)
    phase = (t - beat_idx * beat_len) * freq
    sq = np.where((phase - np.floor(phase)) < 0.5, 1.0, -1.0)
    return jnp.asarray((sq * in_click).astype(np.float32))


def toy_audio_source(level: float, n_frames: int) -> jnp.ndarray:
    return jnp.full((n_frames,), level, jnp.float32)


def toy_instrument(fake_value: float, n_frames: int) -> jnp.ndarray:
    return jnp.full((n_frames,), fake_value, jnp.float32)


def toy_effect(x: jnp.ndarray) -> jnp.ndarray:
    """Negator: signal + its toy-effected copy must cancel
    (orchestration/src/util.rs tests :52-78)."""
    return -x

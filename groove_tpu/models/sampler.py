"""Sampler and drumkit: pitched/one-shot sample playback.

Reference Sampler/SamplerVoice and Drumkit (missing at HEAD; schemas at
settings/src/instruments.rs, demo projects/demos/instruments/sampler.json
and drums.json; README.md:81-84 admits plain-ratio resampling artifacts).

  Sampler {filename, root}: plays the WAV pitched by played_freq/root_freq
    (simple index-ratio resampling with linear interpolation). `root` may
    be given in Hz or as a MIDI-note-ish number (sampler.json uses both
    587.33 and 86); values < 128 are treated as MIDI notes. Playback is
    gated by note-off (no release tail) — reconstruction decision.

  Drumkit {name}: GM percussion notes mapped to the kit's one-shot samples
    (assets/samples/elphnt.io/707, 4 round-robins per instrument cycled
    per hit; GM numbers per doc/general-midi-percussion-numbers.csv).
    One-shots play to the end regardless of note-off.

TPU shape: all samples of a kit live in one [slots, 2, max_len] table in
HBM; each note is a gather with per-note slot + per-sample fractional
indices, batched [n_notes, 2, span] — no per-voice loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from groove_tpu.core.types import note_to_frequency
from groove_tpu.io.wav import read_wav
from groove_tpu.project.paths import Paths
from groove_tpu.project.schema import warn

# GM percussion note -> 707 sample base name (general-midi-percussion
# numbers; instrument choice within the kit is a reconstruction).
GM_707_MAP = {
    35: "Kick 1", 36: "Kick 2", 37: "Rim", 38: "Snare 1", 39: "Clap",
    40: "Snare 2", 41: "Tom 3", 42: "Hat Closed", 43: "Tom 3",
    44: "Hat Closed", 45: "Tom 2", 46: "Hat Open", 47: "Tom 2",
    48: "Tom 1", 49: "Crash", 50: "Tom 1", 51: "Ride", 52: "Crash",
    53: "Ride", 54: "Tambourine", 55: "Crash", 56: "Cowbell",
    57: "Crash", 59: "Ride",
}
ROUND_ROBINS = 4


@dataclass
class SampleTable:
    """Host-loaded sample bank -> device tensors."""

    data: np.ndarray     # [slots, 2, max_len] float32
    lengths: np.ndarray  # [slots] int32
    rates: np.ndarray    # [slots] int32 (source sample rates)
    slot_names: list

    @classmethod
    def from_files(cls, files: list) -> "SampleTable":
        waves = []
        rates = []
        for f in files:
            x, rate = read_wav(f)
            if x.shape[1] == 1:
                x = np.repeat(x, 2, axis=1)
            waves.append(x[:, :2].T.astype(np.float32))  # [2, len]
            rates.append(rate)
        max_len = max((w.shape[1] for w in waves), default=1) + 1
        data = np.zeros((len(waves), 2, max_len), np.float32)
        lengths = np.zeros(len(waves), np.int32)
        for i, w in enumerate(waves):
            data[i, :, : w.shape[1]] = w
            lengths[i] = w.shape[1]
        return cls(data, lengths, np.asarray(rates, np.int32), list(files))


def load_drumkit(paths: Paths, name: str) -> tuple[SampleTable, dict]:
    """Returns (table, {midi_note: [slot indices for round robins]})."""
    base = paths.search(Path("samples") / "elphnt.io" / name)
    if base is None:
        raise FileNotFoundError(f"drumkit {name!r} not found under samples/")
    files = []
    note_slots: dict[int, list[int]] = {}
    for note, inst in GM_707_MAP.items():
        slots = []
        for r in range(1, ROUND_ROBINS + 1):
            f = Path(base) / f"{inst} R{r}.wav"
            if f.exists():
                slots.append(len(files))
                files.append(f)
        if slots:
            note_slots[note] = slots
    if not files:
        raise FileNotFoundError(f"no samples found for drumkit {name!r}")
    return SampleTable.from_files(files), note_slots


def load_calculator_kit(paths: Paths) -> SampleTable:
    """The "Pocket Calculator" toy's sample bank
    (assets/samples/pocket-calculator-24/*.wav, cited by
    projects/calculator.json via entities.rs:88-89). Files sorted by name;
    MIDI key k plays slot k mod n — a documented RECONSTRUCTION (the
    Calculator body is missing at HEAD)."""
    base = paths.search(Path("samples") / "pocket-calculator-24")
    if base is None:
        raise FileNotFoundError("pocket-calculator-24 samples not found")
    files = sorted(Path(base).glob("*.wav"))
    if not files:
        raise FileNotFoundError("pocket-calculator-24 directory is empty")
    return SampleTable.from_files(files)


def load_sample(paths: Paths, filename: str) -> SampleTable:
    found = paths.search(Path("samples") / filename) or paths.search(filename)
    if found is None:
        raise FileNotFoundError(f"sample {filename!r} not found")
    return SampleTable.from_files([found])


def root_frequency(root: float) -> float:
    """root < 128 is a MIDI note number, otherwise Hz (sampler.json uses
    both forms)."""
    if root < 128.0:
        return note_to_frequency(root)
    return float(root)


def assign_drum_slots(keys: np.ndarray, note_slots: dict) -> np.ndarray:
    """Per-hit slot assignment with per-instrument round-robin cycling."""
    counters: dict[int, int] = {}
    slots = np.zeros(len(keys), np.int32)
    for i, k in enumerate(keys):
        k = int(k)
        rr = note_slots.get(k)
        if rr is None:
            warn(f"drumkit has no sample for MIDI note {k}; skipping hit")
            slots[i] = -1
            continue
        c = counters.get(k, 0)
        slots[i] = rr[c % len(rr)]
        counters[k] = c + 1
    return slots


def render_notes_aligned(
    table_data: jnp.ndarray,     # [slots, 2, max_len]
    table_lengths: jnp.ndarray,  # [slots]
    slots,                       # [n] int32 (-1 = silent)
    gate_frames,                 # [n] int32 (or big for one-shot)
    vels,                        # [n] float32
    span: int,
) -> jnp.ndarray:
    """Unity-ratio playback (drumkit at matching sample rate): a pure row
    copy instead of a per-sample fractional gather. The general gather path
    costs ~30 ns/element on TPU (measured 230 ms for one drum track); this
    path is a contiguous [n, 2, span] slice + mask, ~1000x cheaper.
    -> stereo [n_notes, 2, span]."""
    slots = jnp.asarray(slots, jnp.int32)
    safe_slots = jnp.maximum(slots, 0)
    max_len = table_data.shape[-1]
    per_note = table_data[safe_slots]  # row gather [n, 2, max_len]
    if max_len >= span:
        out = per_note[:, :, :span]
    else:
        out = jnp.pad(per_note, ((0, 0), (0, 0), (0, span - max_len)))
    j = jnp.arange(span, dtype=jnp.float32)[None, :]
    length = table_lengths[safe_slots][:, None].astype(jnp.float32)
    gate = jnp.asarray(gate_frames, jnp.float32)[:, None]
    mask = (j < length) & (j < gate) & (slots[:, None] >= 0)
    out = out * mask[:, None, :]
    return out * (jnp.asarray(vels, jnp.float32)[:, None, None] / 127.0)


def accumulate_oneshots(
    table_data: jnp.ndarray,     # [slots, 2, max_len]
    table_lengths: jnp.ndarray,  # [slots]
    slots,                       # [n] int32 (-1 = silent)
    on_frames,                   # [n] int32
    gate_frames,                 # [n] int32 (pass max_len for one-shot)
    vels,                        # [n] float32
    n_frames: int,
) -> jnp.ndarray:
    """Unity-ratio hits summed straight into the timeline -> [2, n].

    Fuses the gather and the scatter: one fori_loop iteration per hit reads
    the sample row, masks it, and adds it at the hit offset — no
    [n_notes, 2, span] intermediate at all. Traffic is ~3 x max_len x 2 x 4B
    per hit.
    """
    import jax

    slots = jnp.asarray(slots, jnp.int32)
    on = jnp.asarray(on_frames, jnp.int32)
    gate = jnp.asarray(gate_frames, jnp.float32)
    vels = jnp.asarray(vels, jnp.float32)
    max_len = table_data.shape[-1]
    n_notes = slots.shape[0]
    out0 = (jnp.zeros((2, n_frames + max_len), table_data.dtype)
            + table_data.ravel()[0] * 0)
    j = jnp.arange(max_len, dtype=jnp.float32)[None, :]

    def body(i, out):
        slot = jnp.maximum(slots[i], 0)
        row = jax.lax.dynamic_index_in_dim(
            table_data, slot, axis=0, keepdims=False
        )  # [2, max_len]
        limit = jnp.minimum(table_lengths[slot].astype(jnp.float32), gate[i])
        active = (slots[i] >= 0).astype(table_data.dtype)
        row = row * (j < limit) * (vels[i] / 127.0) * active
        cur = jax.lax.dynamic_slice(out, (0, on[i]), (2, max_len))
        return jax.lax.dynamic_update_slice(out, cur + row, (0, on[i]))

    out = jax.lax.fori_loop(0, n_notes, body, out0)
    return out[:, :n_frames]


def render_notes(
    table_data: jnp.ndarray,     # [slots, 2, max_len]
    table_lengths: jnp.ndarray,  # [slots]
    table_rates: jnp.ndarray,    # [slots]
    slots,                       # [n] int32 (-1 = silent)
    ratios,                      # [n] float32 playback-rate ratio
    gate_frames,                 # [n] int32 (or big for one-shot)
    vels,                        # [n] float32
    span: int,
    sample_rate: float,
) -> jnp.ndarray:
    """-> stereo [n_notes, 2, span]."""
    slots = jnp.asarray(slots, jnp.int32)
    safe_slots = jnp.maximum(slots, 0)
    ratios = jnp.asarray(ratios, jnp.float32)
    # source-rate correction: a sample recorded at 48k played in a 44.1k
    # render must step faster through the table
    rate_fix = table_rates[safe_slots].astype(jnp.float32) / sample_rate
    step = (ratios * rate_fix)[:, None]                       # [n, 1]
    t_idx = jnp.arange(span, dtype=jnp.float32)[None, :]       # [1, span]
    pos = t_idx * step                                         # [n, span]
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - i0.astype(jnp.float32))[:, None, :]          # [n, 1, span]
    length = table_lengths[safe_slots][:, None]                # [n, 1]
    valid = (i0 + 1 < length) & (slots[:, None] >= 0)          # [n, span]
    gate = t_idx < jnp.asarray(gate_frames, jnp.float32)[:, None]
    mask = (valid & gate)[:, None, :]                          # [n, 1, span]
    i0c = jnp.clip(i0, 0, table_data.shape[-1] - 2)
    per_note = table_data[safe_slots]                          # [n, 2, max_len]
    idx = i0c[:, None, :]                                      # [n, 1, span]
    a = jnp.take_along_axis(per_note, jnp.broadcast_to(idx, (idx.shape[0], 2, span)), axis=-1)
    b = jnp.take_along_axis(per_note, jnp.broadcast_to(idx + 1, (idx.shape[0], 2, span)), axis=-1)
    out = a * (1.0 - frac) + b * frac
    out = out * mask
    return out * (jnp.asarray(vels, jnp.float32)[:, None, None] / 127.0)


def render_window(
    table_data: jnp.ndarray,     # [slots, 2, max_len]
    table_lengths: jnp.ndarray,  # [slots]
    table_rates: jnp.ndarray,    # [slots]
    slots,                       # [V] int32 (-1 = silent)
    ratios,                      # [V] float32 playback-rate ratio
    on_abs,                      # [V] absolute note-on frame
    off_abs,                     # [V] absolute note-off frame (big = held)
    vels,                        # [V] float32
    t0,
    n: int,
    sample_rate: float,
) -> jnp.ndarray:
    """Live window render -> stereo [V, 2, n]: the block [t0, t0+n) of
    sample-playback voices. Playback position is a closed-form function
    of note age (pos = age * step), so any block offset renders without
    carried state (engine/livesong.py)."""
    slots = jnp.asarray(slots, jnp.int32)
    safe_slots = jnp.maximum(slots, 0)
    ratios = jnp.asarray(ratios, jnp.float32)
    rate_fix = table_rates[safe_slots].astype(jnp.float32) / sample_rate
    step = (ratios * rate_fix)[:, None]                       # [V, 1]
    # integer note age: f32 absolute frames lose sample precision past
    # ~2^24 frames (6 min of session)
    on = jnp.asarray(on_abs, jnp.int32)[:, None]
    off = jnp.asarray(off_abs, jnp.int32)[:, None]
    tj = (jnp.asarray(t0, jnp.int32)
          + jnp.arange(n, dtype=jnp.int32))[None, :]          # [1, n]
    age = (tj - on).astype(jnp.float32)                        # frames
    pos = age * step
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - i0.astype(jnp.float32))[:, None, :]
    length = table_lengths[safe_slots][:, None]
    valid = (i0 + 1 < length) & (slots[:, None] >= 0) & (age >= 0)
    gated = age < (off - on).astype(jnp.float32)               # note still open
    mask = (valid & gated)[:, None, :]
    i0c = jnp.clip(i0, 0, table_data.shape[-1] - 2)
    per_note = table_data[safe_slots]
    idx = i0c[:, None, :]
    a = jnp.take_along_axis(
        per_note, jnp.broadcast_to(idx, (idx.shape[0], 2, n)), axis=-1)
    b = jnp.take_along_axis(
        per_note, jnp.broadcast_to(idx + 1, (idx.shape[0], 2, n)), axis=-1)
    out = (a * (1.0 - frac) + b * frac) * mask
    return out * (jnp.asarray(vels, jnp.float32)[:, None, None] / 127.0)


def sampler_ratios(keys, root: float) -> np.ndarray:
    """Pure-numpy on purpose: the live note_on handler calls this under
    the engine lock, and eager jnp ops each cost a ~24 ms synchronous
    round trip over this machine's device tunnel (audio dropouts per
    keypress otherwise)."""
    keys = np.asarray(keys, np.float64)
    freqs = 440.0 * np.exp2((keys - 69.0) / 12.0)  # voices.note_freqs
    return (freqs / root_frequency(root)).astype(np.float32)

"""Shared voice-batch utilities."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np



def note_freqs(keys) -> jnp.ndarray:
    """MIDI keys [n] -> Hz [n] (A4=440; patches.rs:8 note_to_frequency)."""
    keys = jnp.asarray(keys, jnp.float32)
    return 440.0 * jnp.exp2((keys - 69.0) / 12.0)


def span_for(max_gate_frames: int, tail_seconds: float, sample_rate: int,
             minimum: int = 256, multiple: int = 128) -> int:
    """Static per-instrument note window length."""
    span = int(max_gate_frames) + int(np.ceil(tail_seconds * sample_rate)) + 1
    span = max(span, minimum)
    return -(-span // multiple) * multiple


def scatter_notes(note_audio: jnp.ndarray, on_frames, n_frames: int) -> jnp.ndarray:
    """Sum per-note windows into the song timeline.

    note_audio: [n_notes, span] (mono) or [n_notes, 2, span] (stereo);
    on_frames: [n_notes] int32 start frames. Returns [n] or [2, n].

    Implemented as a fori_loop of dynamic-slice read-add-writes, which XLA
    keeps in place: an element-indexed scatter-add here measured 64 ms on
    TPU for 44 x 2 x 93k windows vs ~1 ms for the slice loop (notes counts
    are small; windows are long and contiguous).
    """
    import jax

    span = note_audio.shape[-1]
    n_notes = note_audio.shape[0]
    on = jnp.asarray(on_frames, jnp.int32)
    mono = note_audio.ndim == 2
    shape = (n_frames + span,) if mono else (2, n_frames + span)
    # derive the init from the input so shard_map vma types match
    out0 = jnp.zeros(shape, note_audio.dtype) + note_audio.ravel()[0] * 0

    def body(i, out):
        start = on[i]
        if mono:
            cur = jax.lax.dynamic_slice(out, (start,), (span,))
            return jax.lax.dynamic_update_slice(
                out, cur + note_audio[i], (start,)
            )
        cur = jax.lax.dynamic_slice(out, (0, start), (2, span))
        return jax.lax.dynamic_update_slice(
            out, cur + note_audio[i], (0, start)
        )

    out = jax.lax.fori_loop(0, n_notes, body, out0)
    return out[:n_frames] if mono else out[:, :n_frames]


def bucket_notes(need_frames: np.ndarray, cap: int, max_buckets: int = 3,
                 minimum: int = 256):
    """Partition notes into span buckets to bound wasted render work.

    A single per-instrument span is the MAX over notes, so one whole-note
    drone makes every sixteenth render a 300k-sample window (jingle_bells
    ch-0: 410 notes x 299k span = 123M samples for 5.5M frames of audio).
    Buckets group notes by their own need = gate + tail, on a x2 geometric
    grid, then greedily merge the cheapest pairs until <= max_buckets
    remain (each bucket duplicates the voice pipeline in HLO, so the count
    must stay small for the remote compiler).

    need_frames: [n] per-note required window (gate + tail + 1).
    cap: upper clamp (timeline length, rounded up).
    Returns list of (span, indices) with every need <= its bucket span.
    """
    cap128 = -(-cap // 128) * 128
    need = np.minimum(np.maximum(need_frames.astype(np.int64), minimum),
                      cap128)
    # geometric grid: minimum * 2^k, 128-aligned, clamped to the cap
    gvals = []
    g = minimum
    while True:
        gv = min(-(-g // 128) * 128, cap128)
        if not gvals or gv > gvals[-1]:
            gvals.append(gv)
        if g >= cap128:
            break
        g *= 2
    gvals = np.asarray(gvals, np.int64)
    which = np.searchsorted(gvals, need, side="left")
    buckets = {}
    for j in np.unique(which):
        idx = np.nonzero(which == j)[0]
        buckets[int(gvals[j])] = idx
    items = sorted(buckets.items())  # [(span, idx)] ascending
    # merge cheapest adjacent pair until bounded
    while len(items) > max_buckets:
        costs = [
            len(items[i][1]) * (items[i + 1][0] - items[i][0])
            for i in range(len(items) - 1)
        ]
        i = int(np.argmin(costs))
        merged = (items[i + 1][0],
                  np.concatenate([items[i][1], items[i + 1][1]]))
        items[i:i + 2] = [merged]
    return [(int(s), np.sort(idx)) for s, idx in items]


def apply_mono_policy(on: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Monophonic voice policy: a new note-on gates off the previous note.

    Host-side event transform (PolyphonySettings::Mono,
    settings/src/patches.rs:193-200; stealing policy is a documented
    reconstruction — the reference implementation is missing at HEAD).
    Events must be sorted by on_frame. Returns adjusted off frames.
    """
    off = off.copy()
    for i in range(len(on) - 1):
        if off[i] > on[i + 1]:
            off[i] = on[i + 1]
    return off


def apply_multilimit_policy(on: np.ndarray, off: np.ndarray,
                            limit: int) -> np.ndarray:
    """MultiLimit(N) voice stealing: at most N simultaneous voices; a note
    arriving beyond the limit steals the OLDEST sounding voice (gates it
    off at the new note-on).

    Host-side event transform (PolyphonySettings::MultiLimit(u8),
    settings/src/patches.rs:193-200 declares the policy; the voice-store
    implementation is missing at HEAD — oldest-steals is a documented
    RECONSTRUCTION, the most common synth policy). Events must be sorted
    by on frame. Returns adjusted off frames."""
    off = off.copy()
    active: list[int] = []
    for i in range(len(on)):
        active = [j for j in active if off[j] > on[i]]
        if len(active) >= limit > 0:
            oldest = min(active, key=lambda j: (on[j], j))
            active.remove(oldest)
            off[oldest] = on[i]
        active.append(i)
    return off

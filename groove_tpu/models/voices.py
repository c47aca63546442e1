"""Shared voice-batch utilities."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np



def note_freqs(keys):
    """MIDI keys [n] -> Hz [n] (A4=440; patches.rs:8 note_to_frequency).

    BACKEND-GENERIC: numpy/python inputs evaluate with numpy (host f32),
    traced inputs with jnp. The offline engines pass HOST keys so every
    note's frequency is fixed host-side data — the TPU's exp2 rounds
    ~1e-6-relative differently between eager and jitted evaluation, which
    flips saw/pulse EDGE samples (measured -23 dBFS isolated residuals on
    scale-c4-major vs the f64 reference that shares the eager values).
    """
    if isinstance(keys, (np.ndarray, list, tuple, int, float)):
        keys = np.asarray(keys, np.float32)
        return np.float32(440.0) * np.exp2((keys - np.float32(69.0))
                                           / np.float32(12.0))
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
                 minimum: int = 256, launch_rows: int = 16):
    """Partition notes into span buckets to bound wasted render work.

    A single per-instrument span is the MAX over notes, so one whole-note
    drone makes every sixteenth render a 300k-sample window (jingle_bells
    ch-0: 410 notes x 299k span = 123M samples for 5.5M frames of audio).
    Buckets group notes by their own need = gate + tail rounded up to 128
    frames — EXACT spans, not a geometric grid: jingle ch-0's needs
    cluster at ~176k, and a x2 grid rounded every one of its 409 notes to
    262144 (1.65x wasted cascade work song-wide). Unique needs then
    partition into <= max_buckets contiguous segments by an exact
    minimum-cost DP where cost(bucket) = span x (rows + launch_rows):
    the launch_rows term models the PER-LAUNCH overhead of a bucket
    (cascade kernel pipeline fill + one more voice-pipeline instance in
    HLO). An interleaved A/B on the v5e (tools/ab_welsh_layout.py,
    jingle_bells) showed waste dominates: launch_rows=136 (the naive
    floor/marginal ratio from isolated kernel timings) merged ch-0's
    three tight buckets into one wide one and LOST ~15%, so the default
    is a light thumb on the scale that only merges near-equal spans.
    Extending a note's window past its own need appends exact zeros
    (the amp envelope is exactly 0 past gate+release), so bucket spans
    never change audio.

    need_frames: [n] per-note required window (gate + tail + 1).
    cap: upper clamp (timeline length, rounded up).
    Returns list of (span, indices) with every need <= its bucket span.
    """
    cap128 = -(-cap // 128) * 128
    need = np.minimum(np.maximum(need_frames.astype(np.int64), minimum),
                      cap128)
    need = np.minimum(-(-need // 128) * 128, cap128)  # 128-aligned spans
    spans = np.unique(need)                       # [m] ascending
    groups = [np.nonzero(need == v)[0] for v in spans]
    m = len(spans)
    # O(k m^2) DP, vectorized over the split point (cost of segment
    # (a..b-1] = span_{b-1} * (count(a..b) + launch_rows)).
    cnt = np.array([len(g) for g in groups], np.int64)
    C = np.concatenate([[0], np.cumsum(cnt)])            # [m+1]
    INF = np.int64(2**62)
    f = np.full((max_buckets + 1, m + 1), INF)
    arg = np.zeros((max_buckets + 1, m + 1), np.int64)
    f[0][0] = 0
    for k in range(1, max_buckets + 1):
        for b in range(1, m + 1):
            a = np.arange(b)
            cand = f[k - 1][a] + spans[b - 1] * (C[b] - C[a] + launch_rows)
            i = int(np.argmin(cand))
            f[k][b], arg[k][b] = cand[i], a[i]
    k = int(np.argmin(f[:, m]))
    cuts = []
    b = m
    while b > 0:
        a = int(arg[k][b])
        cuts.append((a, b))
        b, k = a, k - 1
    out = []
    for a, b in reversed(cuts):
        idx = np.concatenate(groups[a:b])
        out.append((int(spans[b - 1]), np.sort(idx)))
    return out


def glide_prev_keys(keys: np.ndarray, on: np.ndarray) -> np.ndarray:
    """Per-note glide-source keys: the key of the latest STRICTLY-earlier
    onset on the same device (portamento slides from the last played
    pitch, whether or not it is still sounding — how analog monosynths
    behave). Notes sharing an onset (chords) all glide from the same
    predecessor and never from each other; the first onset group gets its
    own keys (no glide). Host-side (numpy), computed at compile time.

    RECONSTRUCTION: the reference parses glide (patches.rs:33) but its
    derive drops it (patches.rs:110-169), so these are improvement
    semantics, not reference semantics."""
    keys = np.asarray(keys, np.float32)
    on = np.asarray(on)
    prev = keys.copy()
    order = np.argsort(on, kind="stable")
    j, last_key = 0, None
    while j < len(order):
        k = j
        while k < len(order) and on[order[k]] == on[order[j]]:
            k += 1
        if last_key is not None:
            prev[order[j:k]] = last_key
        last_key = keys[order[k - 1]]
        j = k
    return prev


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

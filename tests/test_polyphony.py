"""Polyphony policies (PolyphonySettings, settings/src/patches.rs:193-200)."""

import json

import numpy as np

from groove_tpu.compiler.song import compile_song
from groove_tpu.models.voices import apply_mono_policy
from groove_tpu.project.schema import SongSettings


def test_mono_policy_truncates_overlaps():
    on = np.array([0, 100, 200], np.int32)
    off = np.array([150, 300, 250], np.int32)
    out = apply_mono_policy(on, off)
    assert list(out) == [100, 200, 250]


def test_mono_patch_gets_policy_applied():
    # growling-bass is a Mono-polyphony patch; legato eighth notes must be
    # gated off at each successive note-on
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"instrument": ["i1", {"welsh": [{"midi-in": 0},
                                                     {"name": "growling-bass"}]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "eighth",
                      "notes": [[60, 62, 64, 65]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    notes = c.devices["i1"].notes
    assert c.devices["i1"].voice.polyphony == "mono"
    # each gate ends exactly at the next note's onset
    assert all(
        notes.off_frames[i] <= notes.on_frames[i + 1]
        for i in range(notes.count - 1)
    )


def test_stolen_voice_rings_through_release():
    """A voice gated off by the mono/steal policy must NOT hard-cut: its
    amplitude envelope enters RELEASE at the steal point and rings out
    into the next note (note windows span gate + release tail, so the
    truncated gate still plays its release). Isolate the stolen note by
    linearity: render [60, 62] minus [rest, 62] is note 60's contribution
    alone — nonzero right after the steal, exactly zero past the tail."""
    def mk(notes_row):
        return compile_song(SongSettings.from_json5_str(json.dumps({
            "clock": {"bpm": 120},
            "devices": [{"instrument": ["i1", {"welsh": [
                {"midi-in": 0}, {"name": "growling-bass"}]}]}],
            "patch-cables": [["i1", "main-mixer"]],
            "patterns": [{"id": "p", "note-value": "eighth",
                          "notes": [notes_row]}],
            "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
        })))

    from groove_tpu.engine.render import Renderer

    c = mk([60, 62])
    both = np.asarray(Renderer(c).render())
    other = np.asarray(Renderer(mk([0, 62])).render())  # key 0 = rest
    stolen = both - other
    off0 = int(c.devices["i1"].notes.off_frames[0])  # the steal frame
    w = 2000
    post = float(np.sqrt((stolen[off0:off0 + w] ** 2).mean()))
    far = float(np.abs(stolen[off0 + 20000:off0 + 22000]).max())
    assert post > 1e-3, "stolen voice was hard-cut (no release ring-out)"
    assert far == 0.0, "release tail failed to decay to exact zero"


def test_bucket_notes_exact_spans_cover_needs():
    """Every note's need <= its bucket span; spans are 128-aligned EXACT
    needs (not pow2-rounded), and the <=3-bucket partition is the
    minimal-waste one (checked against brute force)."""
    from itertools import combinations

    from groove_tpu.models.voices import bucket_notes

    import inspect
    LR = inspect.signature(bucket_notes).parameters["launch_rows"].default
    rng = np.random.default_rng(7)
    for trial in range(20):
        need = rng.integers(100, 300_000, size=rng.integers(1, 40))
        cap = int(rng.integers(50_000, 400_000))
        buckets = bucket_notes(need, cap)
        assert 1 <= len(buckets) <= 3
        cap128 = -(-cap // 128) * 128
        seen = np.concatenate([idx for _, idx in buckets])
        assert sorted(seen) == list(range(len(need)))  # partition
        for span, idx in buckets:
            assert span % 128 == 0 and span <= cap128
            assert all(min(max(int(n), 256), cap128) <= span
                       for n in need[idx])
        # minimal cost vs brute-force over contiguous splits of the
        # unique 128-aligned needs; cost(bucket) = span * (rows + LR)
        # (LR models the per-launch overhead; see bucket_notes)
        aligned = np.minimum(
            -(-np.minimum(np.maximum(need, 256), cap128) // 128) * 128,
            cap128)
        uniq = np.unique(aligned)
        cnt = np.array([(aligned == v).sum() for v in uniq])
        best = None
        m = len(uniq)
        for k in range(1, min(3, m) + 1):
            for cuts in combinations(range(1, m), k - 1):
                bounds = [0, *cuts, m]
                tot = sum(
                    int(uniq[b - 1]) * (int(cnt[a:b].sum()) + LR)
                    for a, b in zip(bounds, bounds[1:]))
                best = tot if best is None else min(best, tot)
        got = sum(int(s) * (len(idx) + LR) for s, idx in buckets)
        assert got == best, (got, best, trial)


def test_bucket_notes_no_pow2_waste():
    """The jingle ch-0 pattern: needs clustered at ~176k must NOT round to
    262144 (the round-2 geometric grid did, 1.49x wasted cascade work)."""
    from groove_tpu.models.voices import bucket_notes

    need = np.full(400, 176_000, np.int64)
    (span, idx), = bucket_notes(need, 5_500_000)
    assert span == -(-176_000 // 128) * 128  # 176128, not 262144
    assert len(idx) == 400

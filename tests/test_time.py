"""Time invariants, mirroring the reference's tests.

- Transport invariant (src/mini/transport.rs:157-188): one second of
  per-frame advances at 60 BPM covers exactly UNITS_IN_BEAT units for many
  sample rates including primes.
- Sample-count accounting (orchestration/src/orchestrator.rs:1690-1737,
  1820-1830, 1875-1910).
"""

from fractions import Fraction

from groove_tpu.core.time import (
    BeatValue,
    MusicalTime,
    SampleRate,
    Tempo,
    TimeSignature,
    UNITS_IN_BEAT,
    frames_to_units,
    render_length_frames,
)


def test_transport_invariant_many_sample_rates():
    tempo = Tempo(60.0)
    for rate in [100, 997, 22050, 44100, 48000, 88200, 98689, 100000, 262144]:
        sr = SampleRate(rate)
        covered = 0
        prev = 0
        for frame in range(1, rate + 1):
            units = frames_to_units(tempo, sr, frame)
            covered += units - prev
            prev = units
        assert covered == UNITS_IN_BEAT, rate
        assert frames_to_units(tempo, sr, rate) == UNITS_IN_BEAT


def test_timer_4_beats_240bpm_24khz_is_24000_samples():
    # orchestrator.rs:1722-1737
    n = render_length_frames(
        Tempo(240.0), SampleRate(24000), MusicalTime.from_beats(4)
    )
    assert n == 24000


def test_zero_timer_renders_zero_samples():
    # orchestrator.rs:1690-1703
    n = render_length_frames(
        Tempo(128.0), SampleRate(44100), MusicalTime.from_beats(0)
    )
    assert n == 0


def test_four_beat_pattern_at_128bpm():
    # orchestrator.rs:1820-1830: ceil(4 * 60/128 * 44100) = 82688
    n = render_length_frames(
        Tempo(128.0), SampleRate(44100), MusicalTime.from_beats(4)
    )
    assert n == 82688


def test_beat_value_multipliers():
    ts = TimeSignature(4, 4)
    assert BeatValue.QUARTER.beats(ts) == 1
    assert BeatValue.SIXTEENTH.beats(ts) == Fraction(1, 4)
    assert BeatValue.DOUBLE.beats(ts) == 8
    assert BeatValue.WHOLE.beats(ts) == 4
    assert BeatValue.from_name("sixteenth") is BeatValue.SIXTEENTH


def test_musical_time_units():
    assert MusicalTime.from_beats(1).units == UNITS_IN_BEAT
    assert MusicalTime.from_beats(Fraction(1, 2)).units == UNITS_IN_BEAT // 2

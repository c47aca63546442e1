"""Sequencer/pattern event compilation and MIDI routing.

Reference semantics reproduced:

  - Pattern stamping (PatternProgrammer::insert_pattern_at_cursor, missing
    crate; behavior pinned by orchestrator tests): each pattern's note rows
    are laid out at `note-value` spacing from the track cursor; key 0 is a
    rest (empty_pattern test: a key-0 note produces no events,
    orchestrator.rs:1875-1910); each note's duration is 1.0 x note-value
    (settings/src/lib.rs:66-72 builds Note{velocity: 127, duration: 1.0};
    the random_access test treats duration as multiples of the note value,
    orchestrator.rs:1749-1830); the cursor advances to the next whole
    measure after each pattern (empty_pattern: cursor == 1 measure).

  - Event-to-frame quantization: the reference delivers MIDI during
    handle_work for the 64-frame buffer whose musical-time range contains
    the event (orchestrator.rs:631-683), so a note becomes audible at that
    buffer's first frame. We quantize on/off times to the containing
    buffer start.

  - Render end: performance stops at the first buffer where every
    controller is finished; the beat sequencer is finished at the last
    stamped measure boundary (run loop orchestrator.rs:803-846).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction

from groove_tpu.core.time import (
    SAMPLE_BUFFER_SIZE,
    MusicalTime,
    SampleRate,
    Tempo,
    UNITS_IN_BEAT,
    frames_to_units,
    render_length_frames,
)
from groove_tpu.project.schema import PatternSettings, SongSettings, warn


@dataclass(frozen=True)
class NoteEvent:
    channel: int
    key: int
    velocity: int
    on_beats: Fraction   # absolute song position of note-on
    off_beats: Fraction  # gate end


def stamp_patterns(
    song: SongSettings,
) -> tuple[list[NoteEvent], Fraction]:
    """All tracks' patterns -> note events + sequencer end (beats)."""
    ts = song.clock.time_signature
    patterns = {p.id: p for p in song.patterns}
    seen: set[str] = set()
    deduped: dict[str, PatternSettings] = {}
    for p in song.patterns:
        if p.id in seen:
            warn(f"duplicate pattern ID {p.id}. Skipping all but one!")
            continue
        seen.add(p.id)
        deduped[p.id] = p
    patterns = deduped

    events: list[NoteEvent] = []
    end_beats = Fraction(0)
    beats_per_measure = Fraction(ts.beats_per_measure)
    for track in song.tracks:
        cursor = Fraction(0)  # reset per track (songs.rs:239 reset_cursor)
        for pid in track.pattern_ids:
            pattern = patterns.get(pid)
            if pattern is None:
                warn(f"track {track.id} refers to nonexistent pattern {pid}")
                continue
            note_value = pattern.note_value or ts.beat_value()
            mult = note_value.beats(ts)  # beats per slot
            max_len = max((len(row) for row in pattern.notes), default=0)
            for row in pattern.notes:
                for i, key in enumerate(row):
                    if key == 0:
                        continue  # rest
                    on = cursor + i * mult
                    events.append(
                        NoteEvent(
                            channel=track.midi_channel,
                            key=int(key),
                            velocity=127,
                            on_beats=on,
                            off_beats=on + mult,
                        )
                    )
            # advance cursor to the next whole measure (>= 1 measure)
            pattern_beats = max_len * mult
            measures = -(-pattern_beats // beats_per_measure)  # ceil
            measures = max(measures, 1)
            cursor += measures * beats_per_measure
        end_beats = max(end_beats, cursor)
    return events, end_beats


def beats_to_buffer_start_frame(
    beats: Fraction, tempo: Tempo, sr: SampleRate, buffer: int = SAMPLE_BUFFER_SIZE
) -> int:
    """First frame of the buffer whose musical-time range contains `beats`."""
    target_units = int(beats * UNITS_IN_BEAT)
    # approximate buffer index, then correct using exact integer conversion
    approx_frames = float(beats) * 60.0 / tempo.bpm * sr.value
    b = max(0, int(approx_frames) // buffer)
    while frames_to_units(tempo, sr, (b + 1) * buffer) <= target_units:
        b += 1
    while b > 0 and frames_to_units(tempo, sr, b * buffer) > target_units:
        b -= 1
    return b * buffer


@dataclass(frozen=True)
class FrameNote:
    channel: int
    key: int
    velocity: int
    on_frame: int
    off_frame: int


def quantize_events(
    events: list[NoteEvent], tempo: Tempo, sr: SampleRate
) -> list[FrameNote]:
    out = []
    for e in events:
        on = beats_to_buffer_start_frame(e.on_beats, tempo, sr)
        off = beats_to_buffer_start_frame(e.off_beats, tempo, sr)
        out.append(FrameNote(e.channel, e.key, e.velocity, on, max(off, on)))
    out.sort(key=lambda n: (n.on_frame, n.channel, n.key))
    return out


def song_render_frames(song: SongSettings, sr: SampleRate) -> int:
    _, end_beats = stamp_patterns(song)
    return render_length_frames(
        song.clock.tempo, sr, MusicalTime.from_beats(end_beats)
    )


# --------------------------------------------------------------------------
# Arpeggiator (host-side MIDI -> MIDI transform)


ARP_STEP_NOTE_VALUE_BEATS = Fraction(1, 4)  # sixteenth notes in 4/4
ARP_PATTERN_SEMIS = (0, 4, 7, 12)  # ascending major arpeggio


def arpeggiate(
    notes_in: list[NoteEvent],
    arp_bpm: float,
    song_tempo: Tempo,
    out_channel: int,
) -> list[NoteEvent]:
    """Transform held input notes into an arpeggiated stream.

    RECONSTRUCTION: the reference Arpeggiator's body is missing at HEAD
    (declared at orchestration/src/entities.rs; params {bpm} +
    midi-in/midi-out at settings/src/controllers.rs:101-175). Chosen
    semantics, documented for parity review: while an input note is held,
    emit an ascending major arpeggio (root, +4, +7, +12) as sixteenth
    notes at the arp's own BPM, starting at the input note-on, gated to the
    input note's hold interval. Velocity passes through.
    """
    out: list[NoteEvent] = []
    if arp_bpm <= 0:
        arp_bpm = song_tempo.bpm
    # step length in *song* beats: one sixteenth at arp bpm
    step_song_beats = (
        ARP_STEP_NOTE_VALUE_BEATS
        * Fraction(song_tempo.bpm).limit_denominator(10**9)
        / Fraction(arp_bpm).limit_denominator(10**9)
    )
    for n in notes_in:
        t = n.on_beats
        i = 0
        while t < n.off_beats:
            key = n.key + ARP_PATTERN_SEMIS[i % len(ARP_PATTERN_SEMIS)]
            gate_end = min(t + step_song_beats, n.off_beats)
            if 0 < key < 128:
                out.append(
                    NoteEvent(out_channel, key, n.velocity, t, gate_end)
                )
            t += step_song_beats
            i += 1
    return out

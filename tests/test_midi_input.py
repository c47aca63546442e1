"""Live MIDI input service: byte-stream parsing with running status."""

import io

from groove_tpu.io.midi_input import MidiByteParser, MidiInputService


def _collect(data: bytes):
    events = []
    p = MidiByteParser(lambda ch, kind, d: events.append((ch, kind, d)))
    p.feed(data)
    return events


def test_note_on_off():
    ev = _collect(bytes([0x90, 60, 100, 0x80, 60, 0]))
    assert ev == [(0, "note-on", (60, 100)), (0, "note-off", (60, 0))]


def test_running_status_and_vel0_noteoff():
    # status 0x91 then three data pairs without restating status;
    # velocity 0 note-on is a note-off
    ev = _collect(bytes([0x91, 60, 100, 62, 90, 60, 0]))
    assert ev == [
        (1, "note-on", (60, 100)),
        (1, "note-on", (62, 90)),
        (1, "note-off", (60, 0)),
    ]


def test_realtime_bytes_ignored_mid_message():
    # 0xF8 clock interleaved inside a note-on must not break parsing
    ev = _collect(bytes([0x90, 0xF8, 60, 0xF8, 100]))
    assert ev == [(0, "note-on", (60, 100))]


def test_program_and_cc():
    ev = _collect(bytes([0xC2, 5, 0xB0, 7, 127]))
    assert ev == [(2, "program-change", (5,)),
                  (0, "control-change", (7, 127))]


def test_service_reads_stream():
    events = []
    src = io.BytesIO(bytes([0x99, 36, 127, 38, 127]))
    svc = MidiInputService(src, lambda ch, kind, d: events.append((ch, kind, d)))
    svc._thread.join(timeout=5)
    svc.stop()
    assert events == [(9, "note-on", (36, 127)), (9, "note-on", (38, 127))]

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


def test_sysex_discarded_and_bounded():
    """A SysEx bulk dump must not buffer unboundedly, and its body bytes
    must never be emitted as channel messages (pre-fix, every data byte
    after 0xF0 grew _buf forever)."""
    body = bytes(range(0, 0x70)) * 64  # ~7 KB of data bytes
    ev = _collect(bytes([0xF0]) + body + bytes([0xF7, 0x90, 60, 100]))
    assert ev == [(0, "note-on", (60, 100))]
    p = MidiByteParser(lambda *a: None)
    p.feed(bytes([0xF0]) + body)       # unterminated SysEx
    p.feed(body)                        # more body after a feed boundary
    assert len(p._buf) == 0, "SysEx body must not accumulate"


def test_system_common_cancels_running_status():
    # Song-position (0xF2) between running-status pairs cancels the
    # running status per the MIDI spec: the trailing pair is discarded.
    ev = _collect(bytes([0x90, 60, 100, 0xF2, 0x10, 0x20, 62, 100]))
    assert ev == [(0, "note-on", (60, 100))]


def test_realtime_does_not_cancel_running_status():
    ev = _collect(bytes([0x90, 60, 100, 0xF8, 62, 100]))
    assert ev == [(0, "note-on", (60, 100)), (0, "note-on", (62, 100))]


def test_pipe_partial_message_low_latency():
    """A 3-byte note-on through an os.pipe must be delivered without
    waiting for 64 bytes (fd sources use os.read, not buffered read)."""
    import os
    import time

    r_fd, w_fd = os.pipe()
    reader = os.fdopen(r_fd, "rb")  # DEFAULT buffering on purpose
    events = []
    svc = MidiInputService(reader,
                           lambda ch, kind, d: events.append((ch, kind, d)))
    try:
        os.write(w_fd, bytes([0x90, 60, 100]))
        deadline = time.time() + 5.0
        while time.time() < deadline and not events:
            time.sleep(0.005)
        assert events == [(0, "note-on", (60, 100))]
    finally:
        os.close(w_fd)
        svc.stop()
    assert not svc._thread.is_alive()


def test_stop_unblocks_idle_fd_source():
    """stop() must join the service thread even when the source fd has a
    live-but-silent writer (a blocked blocking read is not interruptible;
    the loop polls with select)."""
    import os
    import time

    r_fd, w_fd = os.pipe()
    reader = os.fdopen(r_fd, "rb", buffering=0)
    svc = MidiInputService(reader, lambda *a: None)
    try:
        time.sleep(0.05)  # thread is parked waiting for bytes
        t0 = time.time()
        svc.stop()
        assert time.time() - t0 < 2.0
        assert not svc._thread.is_alive()
    finally:
        os.close(w_fd)


def test_fifo_survives_writer_close_and_reconnect(tmp_path):
    """A FIFO 'port' must keep delivering after a writer disconnects:
    external MIDI programs open/write/close per session, and FIFO EOF
    only means 'no writer right now' — the read end stays valid for the
    next sender (the web GUI keeps ports mounted across senders and
    reports midi_connected from svc.alive)."""
    import os
    import time

    port = str(tmp_path / "port0")
    os.mkfifo(port)
    fd = os.open(port, os.O_RDONLY | os.O_NONBLOCK)
    reader = os.fdopen(fd, "rb", buffering=0)
    events = []
    svc = MidiInputService(
        reader, lambda ch, kind, d: events.append((ch, kind, d)))
    try:
        for i in range(2):  # two separate writer sessions
            w = os.open(port, os.O_WRONLY)
            os.write(w, bytes([0x90, 60 + i, 100]))
            os.close(w)  # EOF between sessions used to kill the thread
            deadline = time.time() + 5.0
            while time.time() < deadline and len(events) < i + 1:
                time.sleep(0.01)
        assert events == [(0, "note-on", (60, 100)),
                          (0, "note-on", (61, 100))]
        assert svc.alive, "service thread died at writer EOF"
    finally:
        svc.stop()
    assert not svc._thread.is_alive()

"""Live MIDI input service — the MidiPanel/MidiInterfaceService equivalent.

The reference wraps midir hardware ports in a service thread that forwards
incoming messages to the engine as MidiFromExternal events
(src/panels/midi_panel.rs:74-120; orchestrator.rs:599-601 broadcast). This
container has no MIDI hardware, so the transport is a byte stream: a named
pipe / file object / socket file delivering raw MIDI bytes. The parser is
a standard running-status MIDI byte machine; subscribers get
(channel, message) tuples like the reference's MidiPanelEvent::Midi.

Ports: `list_ports` reports stream sources (FIFOs under $GROOVE_MIDI_DIR),
standing in for midir's port enumeration/refresh.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Callable, Optional


class MidiByteParser:
    """Incremental MIDI byte-stream parser with running status."""

    def __init__(self, on_message: Callable[[int, str, tuple], None]):
        self.on_message = on_message
        self._status = 0
        self._buf: list[int] = []

    _LENGTHS = {0x80: 2, 0x90: 2, 0xA0: 2, 0xB0: 2, 0xC0: 1, 0xD0: 1, 0xE0: 2}

    def feed(self, data: bytes) -> None:
        for b in data:
            if b >= 0xF8:
                continue  # realtime messages pass through parsers untouched
            if b & 0x80:
                self._status = b
                self._buf = []
                continue
            if not self._status:
                continue
            self._buf.append(b)
            kind = self._status & 0xF0
            need = self._LENGTHS.get(kind, 0)
            if need and len(self._buf) >= need:
                self._emit(kind, self._status & 0x0F, tuple(self._buf[:need]))
                self._buf = []

    def _emit(self, kind: int, channel: int, data: tuple) -> None:
        if kind == 0x90 and data[1] > 0:
            self.on_message(channel, "note-on", data)
        elif kind == 0x80 or (kind == 0x90 and data[1] == 0):
            self.on_message(channel, "note-off", data)
        elif kind == 0xB0:
            self.on_message(channel, "control-change", data)
        elif kind == 0xC0:
            self.on_message(channel, "program-change", data)
        elif kind == 0xE0:
            self.on_message(channel, "pitch-bend", data)


class MidiInputService:
    """Reads raw MIDI bytes from a file-like source on a service thread."""

    def __init__(self, source, on_message: Callable[[int, str, tuple], None]):
        self._source = source
        self._parser = MidiByteParser(on_message)
        self._running = threading.Event()
        self._running.set()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while self._running.is_set():
            chunk = self._source.read(64)
            if not chunk:
                break
            self._parser.feed(chunk)

    def stop(self):
        self._running.clear()
        try:
            self._source.close()
        except Exception:
            pass
        self._thread.join(timeout=5)


def list_ports(midi_dir: Optional[str] = None) -> list[str]:
    """Enumerate FIFO 'ports' (midir port-listing equivalent)."""
    d = Path(midi_dir or os.environ.get("GROOVE_MIDI_DIR", "/tmp/groove-midi"))
    if not d.is_dir():
        return []
    return sorted(str(p) for p in d.iterdir() if p.is_fifo())

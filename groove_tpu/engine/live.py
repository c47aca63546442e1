"""Live MIDI -> synth -> audio loop (the interactive play path).

The reference routes hardware MIDI into the running engine
(src/bin/groove-egui.rs:350-357 pump -> GrooveInput::MidiFromExternal ->
Orchestrator::broadcast_midi_messages, orchestrator.rs:599-601, 722-754)
and the audio callback pulls 64-frame buffers from the same voices
(legacy/audio_panel.rs:66-98). Here:

  - MIDI bytes arrive from any byte source (FIFO "ports", files, pipes —
    io/midi_input.py) and are parsed on the input service thread;
  - note on/off events update a fixed voice pool (oldest-steal), exactly
    the engine's voice-allocation semantics;
  - a render thread produces 64-frame blocks from ONE jitted streaming
    program (models/welsh.live_render_block: carried oscillator phases +
    filter state) and pushes them into the native ring buffer.

Latency bound = queued blocks ahead (`lead_blocks`) x 64 frames: with the
default 4-block lead the worst case is 256 frames ≈ 5.8 ms at 44.1 kHz
plus the device round trip. On this machine the real TPU sits behind a
~24 ms tunnel, so live mode prefers the CPU backend when one is
registered (a locally-attached TPU runs the same code; only the
default_device choice changes).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import jax
import numpy as np

from groove_tpu.core.time import SAMPLE_BUFFER_SIZE
from groove_tpu.io.midi_input import MidiInputService
from groove_tpu.models import welsh as welsh_model
from groove_tpu.project.patches import WelshPatchSettings
from groove_tpu.project.paths import Paths

BLOCK = SAMPLE_BUFFER_SIZE


def _live_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


class LiveSynth:
    """Fixed-pool streaming synth: note_on/note_off + render_block."""

    def __init__(self, patch: str = "piano", n_voices: int = 8,
                 sample_rate: int = 44100,
                 paths: Optional[Paths] = None):
        self.sample_rate = sample_rate
        self.n_voices = n_voices
        self.params = WelshPatchSettings.by_name(
            paths or Paths(), patch).derive_welsh_voice_params()
        self._device = _live_device()
        with jax.default_device(self._device):
            self.state = welsh_model.live_init_state(n_voices)
        self._fn = jax.jit(
            lambda st, t0: welsh_model.live_render_block(
                self.params, st, BLOCK, float(sample_rate), t0=t0))
        self._lock = threading.Lock()
        # host mirrors for voice allocation (tiny, numpy)
        self._keys = np.zeros(n_voices, np.float32)
        self._vels = np.zeros(n_voices, np.float32)
        self._age = np.zeros(n_voices, np.int64)
        self._held = np.zeros(n_voices, bool)
        # age at note-off (-1 while held / never played); a voice is FREE
        # once its release tail has fully decayed past that point
        self._rel_age = np.full(n_voices, -1, np.int64)
        self._release_samples = int(
            welsh_model.tail_seconds(self.params) * sample_rate) + BLOCK
        self._frames = 0  # absolute session frames (noise block keying)
        self._last_key = None  # glide source: the last played pitch

    # -- MIDI (any thread) -------------------------------------------------

    def note_on(self, key: int, velocity: int) -> None:
        with self._lock:
            # Free = never played, or released long enough ago that the
            # amp envelope's tail is silent. Stealing preference: free ->
            # still-ringing released voice (longest-released first) ->
            # oldest HELD voice. Stealing a sustained pad while silent
            # voices idle (the pre-round-3 bug) is the worst choice.
            released = ~self._held
            rel_elapsed = np.where(
                self._rel_age >= 0, self._age - self._rel_age, 0)
            free = np.nonzero(released & (
                (self._vels == 0) | (rel_elapsed > self._release_samples)))[0]
            if len(free):
                v = int(free[0])
            elif released.any():
                ring = np.where(released, rel_elapsed, -1)
                v = int(np.argmax(ring))
            else:  # all held: steal the oldest
                v = int(np.argmax(self._age))
            # glide source: the last played pitch (or this one, first note)
            prev = self._last_key if self._last_key is not None \
                else float(key)
            self._last_key = float(key)
            self._keys[v] = float(key)
            self._vels[v] = float(velocity)
            self._age[v] = 0
            self._held[v] = True
            self._rel_age[v] = -1
            st = self.state
            self.state = welsh_model.LiveVoiceState(
                phase1=st.phase1.at[v].set(0.0),
                phase2=st.phase2.at[v].set(0.0),
                s1a=st.s1a.at[v].set(0.0), s2a=st.s2a.at[v].set(0.0),
                s1b=st.s1b.at[v].set(0.0), s2b=st.s2b.at[v].set(0.0),
                age=st.age.at[v].set(0),
                release_age=st.release_age.at[v].set(2**30),
                keys=st.keys.at[v].set(float(key)),
                vels=st.vels.at[v].set(float(velocity)),
                prev_keys=st.prev_keys.at[v].set(prev),
            )

    def note_off(self, key: int) -> None:
        with self._lock:
            matches = np.nonzero(self._held & (self._keys == float(key)))[0]
            if not len(matches):
                return
            v = int(matches[0])
            self._held[v] = False
            self._rel_age[v] = self._age[v]
            st = self.state
            self.state = welsh_model.LiveVoiceState(
                phase1=st.phase1, phase2=st.phase2,
                s1a=st.s1a, s2a=st.s2a, s1b=st.s1b, s2b=st.s2b,
                age=st.age,
                release_age=st.release_age.at[v].set(st.age[v]),
                keys=st.keys, vels=st.vels, prev_keys=st.prev_keys,
            )

    def handle_midi(self, channel: int, kind: str, data: tuple) -> None:
        if kind == "note-on":
            self.note_on(data[0], data[1])
        elif kind == "note-off":
            self.note_off(data[0])

    # -- audio (render thread) ----------------------------------------------

    def render_block(self) -> np.ndarray:
        """One 64-frame stereo block [BLOCK, 2]."""
        with self._lock:
            mono, self.state = self._fn(
                self.state, np.int32(self._frames & 0x7FFFFFFF))
            self._age += BLOCK
            self._frames += BLOCK
        m = np.asarray(mono, np.float32)
        return np.stack([m, m], axis=-1)


class LiveMidiService:
    """Wires a MIDI byte source to a LiveSynth and an audio sink.

    `sink(block)` receives [64, 2] float32 frames; by default the native
    ring-buffer audio service paces output at realtime. `lead_blocks`
    bounds how far rendering runs ahead of consumption — the latency
    bound from MIDI byte to audible frame."""

    def __init__(self, synth: LiveSynth, midi_source=None,
                 sink: Optional[Callable[[np.ndarray], None]] = None,
                 lead_blocks: int = 4, midi_echo=None):
        self.synth = synth
        self.lead_blocks = lead_blocks
        self.blocks_rendered = 0
        self._sink = sink
        self._stop = threading.Event()
        self._echo = midi_echo  # io.midi_output.MidiOutputService or None

        def on_midi(channel, kind, data):
            # MIDI thru: echo incoming events to the output port before
            # they hit the synth (MidiToExternal, messages.rs:41-56)
            if self._echo is not None:
                try:
                    self._echo.send(channel, kind, data)
                except Exception:
                    pass  # a closed echo port must not kill the input loop
            synth.handle_midi(channel, kind, data)

        self._midi = (MidiInputService(midi_source, on_midi)
                      if midi_source is not None else None)
        self._audio = None
        self._thread = None
        if sink is None:
            from groove_tpu.io import native
            if native.available():
                self._audio = native.AudioService(
                    sample_rate=synth.sample_rate, buffer_frames=BLOCK,
                    lead_buffers=lead_blocks)
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        # external sinks pace themselves via pump()

    def pump(self, n_blocks: int = 1) -> None:
        """Render n blocks into the sink (test/file-sink pacing)."""
        for _ in range(n_blocks):
            blk = self.synth.render_block()
            self.blocks_rendered += 1
            if self._sink is not None:
                self._sink(blk)

    def _loop(self):
        while not self._stop.is_set():
            if self._audio is not None:
                need = self._audio.needs_frames()
                if need >= BLOCK:
                    self._audio.write(self.synth.render_block())
                    self.blocks_rendered += 1
                else:
                    time.sleep(0.0005)
            else:
                time.sleep(0.01)

    def stop(self):
        # MIDI first (no new events), then the render thread, then the
        # native service. The join can time out while render_block sits in
        # a cold jit compile (~2 min on the axon fallback); AudioService/
        # RingBuffer serialize their native handles against close, so a
        # late write() from the still-running thread degrades to a no-op
        # instead of dereferencing a freed pointer.
        if self._midi is not None:
            self._midi.stop()
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._audio is not None:
            self._audio.stop()

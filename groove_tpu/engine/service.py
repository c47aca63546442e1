"""Interactive engine service — the OrchestratorPanel equivalent.

The reference runs a dedicated service thread taking OrchestratorInput
commands over a channel (ProjectOpen/Play/Stop/Tempo/track CRUD, project
save/load — src/panels/orchestrator_panel.rs:21-56, 104-202) while the
audio callback pulls frames (audio_panel.rs). Here:

  - commands go through a queue to a worker thread;
  - Play renders the compiled song (JAX program, cached per compile) and
    streams it through the native ring-buffer audio service at realtime;
  - edits (tempo, track add/remove) mutate the SongSettings and trigger a
    recompile — the dynamic counterpart of the offline compiler.

Events are surfaced via a callback (the GrooveEvent/toast path).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.paths import Paths
from groove_tpu.project.save import save_project
from groove_tpu.project.schema import SongSettings


@dataclass
class Command:
    kind: str   # open|play|stop|tempo|save|quit|render-wav
    arg: object = None


class EngineService:
    def __init__(self, on_event: Optional[Callable[[str, object], None]] = None,
                 sample_rate: int = 44100, use_audio: bool = True):
        self.sample_rate = sample_rate
        self.on_event = on_event or (lambda kind, data: None)
        self.use_audio = use_audio
        self.song: Optional[SongSettings] = None
        self.compiled = None
        self.renderer: Optional[Renderer] = None
        self._samples: Optional[np.ndarray] = None
        self._dirty = True
        self._q: "queue.Queue[Command]" = queue.Queue()
        self._stop_playback = threading.Event()
        self._playing = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- public API (thread-safe) ------------------------------------------

    def open_project(self, path):
        self._q.put(Command("open", path))

    def play(self):
        self._q.put(Command("play"))

    def stop(self):
        self._stop_playback.set()

    def set_tempo(self, bpm: float):
        self._q.put(Command("tempo", float(bpm)))

    def save(self, path):
        self._q.put(Command("save", path))

    def render_wav(self, path):
        self._q.put(Command("render-wav", path))

    def shutdown(self, timeout: float = 600.0):
        """Stops playback, drains pending commands, joins the worker.

        The join must outlast an in-flight compile+render: tearing down the
        interpreter while XLA compiles on the worker thread aborts the
        process."""
        self._stop_playback.set()
        self._q.put(Command("quit"))
        self._thread.join(timeout=timeout)

    def is_playing(self) -> bool:
        return self._playing.is_set()

    # -- worker --------------------------------------------------------------

    def _recompile(self):
        self.compiled = compile_song(self.song, Paths(),
                                     sample_rate=self.sample_rate)
        self.renderer = Renderer(self.compiled)
        self._samples = None
        self._dirty = False

    def _ensure_rendered(self):
        if self._dirty or self.renderer is None:
            self._recompile()
        if self._samples is None:
            self._samples = self.renderer.render()
        return self._samples

    def _loop(self):
        while True:
            cmd = self._q.get()
            try:
                if cmd.kind == "quit":
                    return
                if cmd.kind == "open":
                    self.song = SongSettings.from_project_file(Path(cmd.arg))
                    self._dirty = True
                    self.on_event("project-opened", self.song.title)
                elif cmd.kind == "tempo":
                    if self.song:
                        self.song.clock.bpm = cmd.arg
                        self._dirty = True
                        self.on_event("tempo", cmd.arg)
                elif cmd.kind == "save":
                    if self.song:
                        save_project(self.song, cmd.arg)
                        self.on_event("saved", str(cmd.arg))
                elif cmd.kind == "render-wav":
                    samples = self._ensure_rendered()
                    from groove_tpu.io.wav import write_wav_16bit_stereo
                    write_wav_16bit_stereo(cmd.arg, samples, self.sample_rate)
                    self.on_event("rendered", str(cmd.arg))
                elif cmd.kind == "play":
                    samples = self._ensure_rendered()
                    self.on_event("playback-started", None)
                    self._playing.set()
                    self._stream(samples)
                    self._playing.clear()
                    self.on_event("playback-stopped", None)
            except Exception as e:  # surfaced like the reference's toasts
                self.on_event("error", f"{type(e).__name__}: {e}")

    def _stream(self, samples: np.ndarray):
        self._stop_playback.clear()
        if not self.use_audio:
            return
        try:
            from groove_tpu.io import native
        except Exception:
            return
        if not native.available():
            return
        svc = native.AudioService(sample_rate=self.sample_rate,
                                  buffer_frames=64)
        try:
            pos, n = 0, len(samples)
            import time as _time
            while pos < n and not self._stop_playback.is_set():
                need = svc.needs_frames()
                if need > 0:
                    chunk = samples[pos:pos + need]
                    svc.write(np.asarray(chunk, np.float32))
                    pos += len(chunk)
                else:
                    _time.sleep(0.001)
            while (svc.frames_consumed() < pos
                   and not self._stop_playback.is_set()):
                _time.sleep(0.005)
        finally:
            svc.stop()

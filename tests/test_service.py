"""Engine service (OrchestratorPanel equivalent) + project save round-trip."""

import time
from pathlib import Path

import numpy as np
import pytest

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.engine.service import EngineService
from groove_tpu.project.save import song_to_dict
from groove_tpu.project.schema import SongSettings

PROJECT = Path("/root/reference/projects/demos/instruments/oscillator-sine-a4.json")


def test_save_roundtrip_renders_identically(tmp_path):
    src = Path("/root/reference/projects/demos/effects/drums-filtered-24db.json")
    song = SongSettings.from_project_file(src)
    resaved = SongSettings.from_json(song_to_dict(song))
    a = compile_song(song)
    b = compile_song(resaved)
    assert a.n_frames == b.n_frames
    assert np.array_equal(
        a.devices["low-pass-1"].automation["cutoff"],
        b.devices["low-pass-1"].automation["cutoff"],
    )
    xa = np.asarray(Renderer(a).render())
    xb = np.asarray(Renderer(b).render())
    assert np.array_equal(xa, xb)


def test_service_open_render_save(tmp_path):
    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(PROJECT)
        svc.render_wav(tmp_path / "out.wav")
        svc.save(tmp_path / "resave.json")
        deadline = time.time() + 120
        while time.time() < deadline:
            kinds = {k for k, _ in events}
            if {"project-opened", "rendered", "saved"} <= kinds:
                break
            time.sleep(0.1)
        kinds = {k for k, _ in events}
        assert "project-opened" in kinds
        assert "rendered" in kinds, events
        assert "saved" in kinds
        assert (tmp_path / "out.wav").stat().st_size > 44
        # resave loads
        SongSettings.from_project_file(tmp_path / "resave.json")
    finally:
        svc.shutdown()


def test_service_tempo_change_recompiles():
    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(PROJECT)
        svc.set_tempo(120.0)
        svc.play()  # renders (no audio device)
        deadline = time.time() + 120
        while time.time() < deadline:
            if ("playback-stopped", None) in events:
                break
            time.sleep(0.1)
        assert ("tempo", 120.0) in events
        # at 120 bpm the 1-measure pattern is 2 s
        assert svc.compiled.n_frames == pytest.approx(2 * 44100, abs=64)
    finally:
        svc.shutdown()


def test_service_loop_bounce(tmp_path):
    """set_loop + render_loop_wav: bounce [0, end) plus N looped passes of
    [start, end) with carried effect state (orchestrator.rs:868-874,
    set_loop at :983)."""
    from groove_tpu.engine.stream import StreamingRenderer
    from groove_tpu.io.wav import read_wav

    src = Path("/root/reference/projects/demos/effects/drums-reverb.json")
    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(src)
        svc.set_loop(4.0, 8.0)
        out = tmp_path / "loop.wav"
        svc.render_loop_wav(out, iterations=2)
        assert svc.sync()
        assert ("loop-set", (4.0, 8.0)) in events
        assert any(k == "rendered" for k, _ in events)
        assert svc.is_loop_enabled and svc.loop_range == (4.0, 8.0)
        # length = le + 2 * (le - ls), on the 64-frame loop grid
        sr_ = StreamingRenderer(svc.compiled)
        ls, le = sr_.loop_frames(4.0, 8.0)
        audio, rate = read_wav(out)
        assert rate == 44100
        assert audio.shape[0] == le + 2 * (le - ls)
        svc.clear_loop()
        assert svc.sync()
        assert not svc.is_loop_enabled and svc.loop_range is None
    finally:
        svc.shutdown()


def test_render_loop_wav_without_range_reports_error(tmp_path):
    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(PROJECT)
        svc.render_loop_wav(tmp_path / "x.wav", iterations=1)
        assert svc.sync()
        assert any(k == "error" and "loop" in str(d) for k, d in events)
        assert not (tmp_path / "x.wav").exists()
    finally:
        svc.shutdown()


def test_control_link_add_remove(tmp_path):
    """GrooveInput::Add/RemoveControlLink (messages.rs:13-38): wiring a
    signal-passthrough source to an effect param at runtime must change
    the render (and save into the song's `controls` section); removing
    it must restore the original audio."""
    import json

    src = tmp_path / "link-song.json"
    src.write_text(json.dumps({
        "clock": {"bpm": 120},
        "devices": [
            {"instrument": ["i1", {"oscillator": {
                "waveform": "sine", "frequency": 220.0}}]},
            {"instrument": ["i2", {"oscillator": {
                "waveform": "sine", "frequency": 3.0}}]},
            {"effect": ["fx", {"gain": {"ceiling": 1.0}}]},
            {"controller": ["sc", {"signal-passthrough-controller": [{}]}]},
        ],
        "patch-cables": [["i1", "fx", "main-mixer"],
                         ["i2", "sc", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(src)
        assert svc.sync()
        base = svc._ensure_rendered().copy()

        svc.add_control_link("sc", "fx", "ceiling")
        assert svc.sync()
        assert ("control-link-added", ("sc", "fx", "ceiling")) in events
        linked = svc._ensure_rendered().copy()
        assert not np.array_equal(base, linked), \
            "control link had no effect on the render"
        # the link must save like a hand-written controls entry
        d = song_to_dict(svc.song)
        assert any(c["source"] == "sc"
                   and c["target"] == {"id": "fx", "param": "ceiling"}
                   for c in d.get("controls", []))

        svc.remove_control_link("sc", "fx", "ceiling")
        assert svc.sync()
        unlinked = svc._ensure_rendered().copy()
        assert np.array_equal(base, unlinked), \
            "removing the link did not restore the original render"

        # bad targets report errors instead of corrupting the song
        svc.add_control_link("sc", "nope", "ceiling")
        svc.add_control_link("sc", "fx", "not-a-param")
        assert svc.sync()
        errs = [d for k, d in events if k == "error"]
        assert len(errs) >= 2
    finally:
        svc.shutdown()


def test_stop_issued_before_playback_still_wins():
    """stop()/shutdown() set the stop flag; play() must be the ONLY place
    that clears it (clearing at stream start erased a stop issued between
    play() and the worker dequeuing it — with a loop range, playback then
    ran forever past 'quit')."""
    svc = EngineService(on_event=lambda k, d: None, use_audio=False)
    try:
        svc.stop()
        assert svc._stop_playback.is_set()
        svc.play()  # a NEW play request supersedes the old stop
        assert not svc._stop_playback.is_set()
        svc.stop()  # stop after play-enqueue must survive stream start
        svc.sync()
        assert svc._stop_playback.is_set()
    finally:
        svc.shutdown()


def test_noop_edit_does_not_mark_dirty():
    """A failed or no-op edit must not force a recompile (2 min cold)."""
    svc = EngineService(on_event=lambda k, d: None, use_audio=False)
    try:
        svc.open_project(PROJECT)
        svc.sync()
        svc._dirty = False
        svc.remove_control_link("nobody", "nothing", "nope")  # 0 matches
        svc.set_device_param("ghost-device", "gain", 1.0)     # no device
        svc.sync()
        assert not svc._dirty, "no-op edits forced a recompile"
        svc.add_device("gain")  # a REAL edit still marks dirty
        svc.sync()
        assert svc._dirty
    finally:
        svc.shutdown()


def test_add_controller_with_distinct_out_channel():
    """The reference's arpeggiator listens on one channel and emits on
    another (demos/controllers/arpeggiator.json: in 1 -> out 0); the
    service API can express that."""
    svc = EngineService(on_event=lambda k, d: None, use_audio=False)
    try:
        svc.new_project()
        svc.add_device("arpeggiator", midi_channel=1, midi_out=0)
        svc.sync()
        dev = next(d for d in svc.song.devices
                   if d.controller is not None
                   and d.controller.kind == "arpeggiator")
        assert dev.controller.midi_in == 1
        assert dev.controller.midi_out == 0
    finally:
        svc.shutdown()


def test_set_automation_preserves_shared_path():
    """Clearing editor automation must not orphan a path some OTHER trip
    still references — even one that shares the editor's path id."""
    from groove_tpu.project.schema import (ControlPathSettings,
                                           ControlStepSettings,
                                           ControlTargetSettings,
                                           ControlTripSettings)
    from groove_tpu.core.time import BeatValue

    svc = EngineService(on_event=lambda k, d: None, use_audio=False)
    try:
        svc.open_project(PROJECT)
        svc.sync()
        song = svc.song
        dev = song.devices[0].uvid if song.devices else "oscillator-1"
        pid = f"auto-{dev}-frequency"
        # a FOREIGN trip (different target, so the editor's REPLACE
        # semantics never remove it) that shares the editor's path id
        song.paths.append(ControlPathSettings(
            pid, BeatValue.from_name("whole"),
            [ControlStepSettings("flat", 0.5, 0.5)]))
        song.trips.append(ControlTripSettings(
            "foreign-trip", ControlTargetSettings(dev, "waveform"), [pid]))
        svc.set_automation(dev, "frequency", [])
        svc.sync()
        assert any(p.id == pid for p in song.paths), \
            "shared path orphaned by set_automation clear"
        # setting NEW values must not duplicate the shared id
        svc.set_automation(dev, "frequency", [0.1, 0.9])
        svc.sync()
        ids = [p.id for p in song.paths]
        assert len(ids) == len(set(ids)), f"duplicate path ids: {ids}"
    finally:
        svc.shutdown()


def test_rendered_samples_and_ensure_compiled_worker_handshakes():
    """GUI front-end handshakes (gui/web.py): ensure_compiled recompiles
    a dirty song ON the worker thread and returns the CompiledSong;
    rendered_samples renders there and returns the same [n, 2] array a
    direct Renderer produces; loop_iterations bounces the loop range."""
    svc = EngineService(use_audio=False)
    try:
        svc.open_project(PROJECT)
        compiled = svc.ensure_compiled()
        assert compiled is not None and compiled.n_frames > 0
        assert compiled is svc.compiled
        got = svc.rendered_samples()
        direct = np.asarray(Renderer(compiled).render())
        assert got is not None and got.shape == direct.shape
        assert np.array_equal(np.asarray(got), direct)
        # an edit marks dirty; ensure_compiled must hand back a FRESH song
        svc.set_tempo(96.0)
        recompiled = svc.ensure_compiled()
        assert recompiled is not compiled
        assert recompiled.n_frames != compiled.n_frames
        # loop bounce through the worker: [0, end) + 2 x [start, end)
        # (_loop_samples), so a (0, 1)-beat range plays 3 one-beat passes
        svc.set_loop(0.0, 1.0)
        looped = svc.rendered_samples(loop_iterations=2)
        assert looped is not None
        spb = recompiled.sample_rate * 60.0 / 96.0
        grid = 64  # loop bounds quantize to the stream grid
        assert abs(len(looped) - 3 * spb) <= 3 * grid
    finally:
        svc.shutdown()


def test_ensure_compiled_returns_none_on_compile_failure(tmp_path):
    """A project that LOADS but fails to compile must not hand the
    previous project's CompiledSong to live-renderer builders (the
    stale-piano bug): ensure_compiled returns None and the error
    surfaces as an event."""
    import json

    events = []
    svc = EngineService(on_event=lambda k, d: events.append((k, d)),
                        use_audio=False)
    try:
        svc.open_project(PROJECT)
        good = svc.ensure_compiled()
        assert good is not None
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({
            "clock": {"bpm": 120},
            "devices": [{"instrument": ["w", {"welsh": {"midi-in": 0}}]}],
            "patch-cables": [["w", "main-mixer"]],
        }))
        svc.open_project(bad)
        assert svc.ensure_compiled() is None
        assert any(k == "error" and "welsh" in str(d) for k, d in events), \
            events
    finally:
        svc.shutdown()


def test_rendered_samples_device_isolation_on_worker():
    """rendered_samples(device=...) isolates one instrument via the
    worker thread; unknown/non-instrument devices re-raise the worker's
    ValueError on the caller thread."""
    svc = EngineService(use_audio=False)
    try:
        svc.open_project(PROJECT)
        compiled = svc.ensure_compiled()
        (uvid, dev), = [(u, d) for u, d in compiled.devices.items()
                        if d.role == "instrument"]
        iso = svc.rendered_samples(device=uvid)
        assert iso is not None and iso.shape[1] == 2
        full = svc.rendered_samples()
        # single-instrument project: isolated == master pre-effects…
        # at least nonzero and same length
        assert len(iso) == len(full)
        assert np.abs(iso).max() > 0
        with pytest.raises(ValueError, match="not an instrument"):
            svc.rendered_samples(device="nope")
    finally:
        svc.shutdown()

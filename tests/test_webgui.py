"""Browser GUI (gui/web.py): the windowed groove-egui analog served over
HTTP. Tests drive the real server through urllib — same surface the
browser page uses."""

import json
import threading
import urllib.request

import pytest

from groove_tpu.gui.web import WebGui, make_server
from tests.test_project import REF


@pytest.fixture()
def server():
    gui = WebGui(use_audio=False)
    srv = make_server(gui, 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, gui
    srv.shutdown()
    gui.model.svc.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=600) as r:
        return json.loads(r.read())


def _cmd(base, cmd, **a):
    a["cmd"] = cmd
    req = urllib.request.Request(base + "/api/cmd",
                                 data=json.dumps(a).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_page_and_state(server):
    base, _ = server
    with urllib.request.urlopen(base + "/", timeout=60) as r:
        html = r.read().decode()
    assert "groove" in html and "api/state" in html
    s = _get(base, "/api/state")
    assert "palette" in s and "welsh" in s["palette"]
    assert s["browser"], "project browser should list reference projects"


def test_open_edit_save_roundtrip(server, tmp_path):
    base, gui = server
    proj = str(REF / "test-data/kitchen-sink.json")
    assert _cmd(base, "open", path=proj)["ok"]
    s = _get(base, "/api/state")
    assert s["title"] and s["tracks"]
    # BPM edit (ControlBar, control_panel.rs:80-173)
    assert _cmd(base, "bpm", value=97)["ok"]
    assert _get(base, "/api/state")["bpm"] == 97
    # param slider: set the first numeric param to full scale
    p = next(p for p in s["params"] if p["cv"] is not None)
    assert _cmd(base, "set_param", uvid=p["uvid"], kind=p["kind"],
                name=p["name"], cv=1.0)["ok"]
    s2 = _get(base, "/api/state")
    p2 = next(q for q in s2["params"]
              if q["uvid"] == p["uvid"] and q["name"] == p["name"])
    assert p2["cv"] == pytest.approx(1.0, abs=1e-6)
    # pattern grid: toggle the selected track's first step to a rest
    if s2["pattern"] and s2["pattern"]["rows"]:
        pid = s2["pattern"]["id"]
        assert _cmd(base, "pattern_step", id=pid, row=0, notes=[])["ok"]
        assert _get(base, "/api/state")["pattern"]["rows"][0] == []
    # save and reload through the same surface
    out = tmp_path / "edited.json"
    assert _cmd(base, "save", path=str(out))["ok"]
    gui.model.svc.sync()
    assert out.exists()
    assert _cmd(base, "open", path=str(out))["ok"]
    assert _get(base, "/api/state")["bpm"] == 97


def test_track_and_device_crud(server):
    base, _ = server
    _cmd(base, "new")
    _cmd(base, "add_track")
    s = _get(base, "/api/state")
    assert len(s["tracks"]) == 1
    tid = s["tracks"][0]["id"]
    _cmd(base, "select_track", id=tid)
    _cmd(base, "add_device", kind="welsh")
    s = _get(base, "/api/state")
    assert any("welsh" in d for d in s["tracks"][0]["devices"])
    uvid = s["tracks"][0]["devices"][0].split(" ")[0]
    _cmd(base, "remove_device", uvid=uvid)
    s = _get(base, "/api/state")
    assert not any(uvid in d for d in s["tracks"][0]["devices"])
    _cmd(base, "dup_track", id=tid)
    assert len(_get(base, "/api/state")["tracks"]) == 2
    _cmd(base, "remove_track", id=tid)
    assert len(_get(base, "/api/state")["tracks"]) == 1


def test_automation_curve_draw_apply_clear(server, tmp_path):
    """The drag-to-draw automation lane: set_automation with ControlValue
    samples creates a slope-step ControlTrip targeting the param (state
    exposes the curve back), the automated render differs from the
    static one, the curve survives save/reload, and clearing removes
    the trip."""
    base, gui = server
    proj = str(REF / "projects/demos/effects/drums-filtered-24db.json")
    assert _cmd(base, "open", path=proj)["ok"]
    s = _get(base, "/api/state")
    # the filter's cutoff param (registry-generated row)
    p = next(q for q in s["params"] if q["name"] == "cutoff")
    w0 = _get(base, "/api/waveform")["peaks"]
    cvs = [0.1, 0.9, 0.1, 0.9, 0.1, 0.9, 0.1, 0.9]
    assert _cmd(base, "set_automation", uvid=p["uvid"], kind=p["kind"],
                name=p["name"], cvs=cvs)["ok"]
    s2 = _get(base, "/api/state")
    p2 = next(q for q in s2["params"]
              if q["uvid"] == p["uvid"] and q["name"] == p["name"])
    assert p2["curve"] is not None and len(p2["curve"]) == len(cvs)
    assert p2["curve"][0] == pytest.approx(0.1, abs=0.02)
    assert p2["curve"][1] == pytest.approx(0.9, abs=0.02)
    w1 = _get(base, "/api/waveform")["peaks"]
    assert w0 != w1, "drawn automation must change the audio"
    # round-trips through save (project/save.py serializes paths+trips)
    out = tmp_path / "autod.json"
    assert _cmd(base, "save", path=str(out))["ok"]
    gui.model.svc.sync()
    assert _cmd(base, "open", path=str(out))["ok"]
    s3 = _get(base, "/api/state")
    p3 = next(q for q in s3["params"]
              if q["uvid"] == p["uvid"] and q["name"] == p["name"])
    assert p3["curve"] is not None and len(p3["curve"]) == len(cvs)
    # clear removes the trip
    assert _cmd(base, "set_automation", uvid=p["uvid"], kind=p["kind"],
                name=p["name"], cvs=[])["ok"]
    s4 = _get(base, "/api/state")
    p4 = next(q for q in s4["params"]
              if q["uvid"] == p["uvid"] and q["name"] == p["name"])
    assert p4["curve"] is None


def test_waveform_endpoint_renders_master(server):
    base, _ = server
    proj = str(REF / "projects/demos/effects/drums-filtered-24db.json")
    assert _cmd(base, "open", path=proj)["ok"]
    w = _get(base, "/api/waveform")
    assert w["frames"] > 0 and len(w["peaks"]) > 0
    assert max(w["peaks"]) > 0.01, "master waveform should not be silent"


def test_per_device_waveform_and_spectrum(server):
    """The focus lane: ?device=UVID isolates one instrument's waveform
    (utils/spectrum's --device path) and /api/spectrum returns log-
    frequency dBFS columns for the canvas analyzer."""
    base, gui = server
    proj = str(REF / "projects/demos/effects/drums-filtered-24db.json")
    assert _cmd(base, "open", path=proj)["ok"]
    s = _get(base, "/api/spectrum")  # forces compile+render
    compiled = gui.model.svc.compiled
    uvid = next(u for u, d in compiled.devices.items()
                if d.role == "instrument")
    w = _get(base, f"/api/waveform?device={uvid}")
    assert w["frames"] > 0 and max(w["peaks"]) > 0.01
    assert len(s["db"]) > 0 and max(s["db"]) > -40.0
    assert s["f_lo"] < 100 < 10000 < s["f_hi"] + 1
    sd = _get(base, f"/api/spectrum?device={uvid}")
    assert len(sd["db"]) > 0 and max(sd["db"]) > -40.0
    # unknown device -> 500 with an error body (the toast path)
    import urllib.error
    try:
        _get(base, "/api/spectrum?device=nope")
        assert False, "expected HTTP 500"
    except urllib.error.HTTPError as e:
        assert e.code == 500


def test_audio_endpoint_wav_bytes(server):
    """VERDICT r3 item 3: Play must be AUDIBLE in the browser. /api/audio
    serves a complete 16-bit stereo WAV whose PCM payload is byte-exact
    the ONE quantization spec (io.wav._chunk_to_i2) applied to the
    service's rendered samples — the same bytes the CLI's --wav writes.
    Match: the reference pumps rendered buffers to the sound card
    (src/panels/audio_panel.rs:75-142)."""
    import struct

    import numpy as np

    from groove_tpu.io.wav import _chunk_to_i2

    base, gui = server
    proj = str(REF / "test-data/kitchen-sink.json")
    assert _cmd(base, "open", path=proj)["ok"]
    with urllib.request.urlopen(base + "/api/audio", timeout=600) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert body[12:16] == b"fmt " and body[36:40] == b"data"
    fmt, nch, rate, _brate, _align, bits = struct.unpack(
        "<HHIIHH", body[20:36])
    assert fmt == 1 and nch == 2 and bits == 16  # PCM, stereo, 16-bit
    svc = gui.model.svc
    assert rate == svc.sample_rate
    svc.sync()
    samples = np.asarray(svc._ensure_rendered())
    expected = _chunk_to_i2(samples).tobytes()
    assert struct.unpack("<I", body[40:44])[0] == len(expected)
    assert body[44:] == expected
    assert any(body[44:]), "audio should not be silent"


def test_audio_endpoint_loop_bounce(server):
    """?loop=N serves the loop-window bounce ([0,end) + N x [start,end),
    state carried across seams — service._loop_samples)."""
    import numpy as np

    from groove_tpu.io.wav import _chunk_to_i2

    base, gui = server
    proj = str(REF / "test-data/kitchen-sink.json")
    assert _cmd(base, "open", path=proj)["ok"]
    assert _cmd(base, "loop_range", start=0, end=1)["ok"]
    assert _cmd(base, "loop_toggle")["ok"]
    with urllib.request.urlopen(base + "/api/audio?loop=2",
                                timeout=600) as r:
        body = r.read()
    expected = _chunk_to_i2(
        np.asarray(gui.model.svc._loop_samples(2))).tobytes()
    assert body[44:] == expected


def test_piano_strip_live_audio(server):
    """The piano strip posts note events through the live-voice path
    (engine/livesong) and /api/audio/live streams the result as a
    chunked WAV: note_on -> the stream carries nonzero samples."""
    import numpy as np

    base, gui = server
    proj = str(REF / "projects/scale-c4-major.json")
    assert _cmd(base, "open", path=proj)["ok"]
    # build the live renderer up front so the stream read is deterministic
    gui.live_renderer()
    assert _cmd(base, "note_on", key=60, velocity=110, channel=0)["ok"]
    req = urllib.request.Request(base + "/api/audio/live")
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        head = r.read(44)
        assert head[:4] == b"RIFF"
        pcm = b""
        while len(pcm) < 4 * 2048 * 3:  # ~3 chunks of 32 blocks
            got = r.read(4096)
            if not got:
                break
            pcm += got
    assert _cmd(base, "note_off", key=60, channel=0)["ok"]
    data = np.frombuffer(pcm, "<i2")
    assert np.abs(data).max() > 0, "live note should be audible"


def test_drag_drop_add_device_to_channel(server):
    """Palette drag-and-drop (VERDICT r3 item 8; palette_panel.rs:30-46):
    dropping onto a track adds the device on THAT track's channel,
    independent of the selection."""
    base, gui = server
    proj = str(REF / "test-data/kitchen-sink.json")
    assert _cmd(base, "open", path=proj)["ok"]
    s = _get(base, "/api/state")
    target = s["tracks"][-1]  # not the selected track
    n_before = len(target["devices"])
    assert _cmd(base, "add_device", kind="welsh",
                channel=target["channel"])["ok"]
    s2 = _get(base, "/api/state")
    t2 = next(t for t in s2["tracks"] if t["id"] == target["id"])
    assert len(t2["devices"]) == n_before + 1
    assert any("welsh" in d for d in t2["devices"])


def test_pattern_note_value_editing(server):
    """Step-duration editing in the pattern grid (VERDICT r3 item 8):
    the note-value selector rewrites PatternSettings.note_value and the
    render length follows (eighth -> quarter doubles the pattern)."""
    base, gui = server
    proj = str(REF / "projects/scale-c4-major.json")
    assert _cmd(base, "open", path=proj)["ok"]
    s = _get(base, "/api/state")
    assert s["pattern"]["note_value"] == "eighth"
    assert "quarter" in s["note_values"]
    svc = gui.model.svc
    svc.sync()
    if svc.compiled is None:
        svc._recompile()
    frames_before = svc.compiled.n_frames
    assert _cmd(base, "pattern_note_value", id=s["pattern"]["id"],
                value="quarter")["ok"]
    s2 = _get(base, "/api/state")
    assert s2["pattern"]["note_value"] == "quarter"
    svc.sync()
    svc._recompile()
    assert svc.compiled.n_frames > frames_before
    # unknown value -> error event, state unchanged
    assert _cmd(base, "pattern_note_value", id=s["pattern"]["id"],
                value="nope")["ok"]
    assert _get(base, "/api/state")["pattern"]["note_value"] == "quarter"


def test_midi_port_panel_lists_and_connects(server, tmp_path,
                                            monkeypatch):
    """MIDI-port panel (VERDICT r3 item 8; midi_panel.rs:94-120): the
    state lists FIFO ports from GROOVE_MIDI_DIR, midi_connect routes the
    port's bytes into the live-voice renderer, midi_disconnect stops."""
    import os
    import time

    base, gui = server
    proj = str(REF / "projects/scale-c4-major.json")
    assert _cmd(base, "open", path=proj)["ok"]
    port = tmp_path / "port-0"
    os.mkfifo(port)
    monkeypatch.setenv("GROOVE_MIDI_DIR", str(tmp_path))
    s = _get(base, "/api/state")
    assert str(port) in s["midi_ports"]
    gui.live_renderer()  # build before the byte arrives (deterministic)
    assert _cmd(base, "midi_connect", port=str(port))["ok"]
    assert _get(base, "/api/state")["midi_connected"] == str(port)
    with open(port, "wb", buffering=0) as w:
        w.write(bytes([0x90, 64, 100]))  # note-on ch0 key 64
        # poll the live pool until the service thread lands the event
        pool = next(iter(gui._live._pools.values()))
        for _ in range(200):
            if (pool["keys"] == 64).any() and (pool["vels"] > 0).any():
                break
            time.sleep(0.01)
        else:
            raise AssertionError("MIDI note never reached the live pool")
    assert _cmd(base, "midi_disconnect")["ok"]
    assert _get(base, "/api/state")["midi_connected"] is None


def test_live_renderer_invalidated_on_project_change(server):
    """Opening another project (or editing the song) must rebuild the
    live renderer: the lazily-built one otherwise keeps playing the
    PREVIOUS project's instruments through the piano strip and any
    connected MIDI port."""
    base, gui = server
    assert _cmd(base, "open",
                path=str(REF / "projects/scale-c4-major.json"))["ok"]
    first = gui.live_renderer()
    assert _cmd(base, "open",
                path=str(REF / "test-data/kitchen-sink.json"))["ok"]
    assert gui._live is None, "project open left a stale live renderer"
    second = gui.live_renderer()
    assert second is not first
    # param edits invalidate too (the live voices read compiled params)
    s = _get(base, "/api/state")
    p = next(p for p in s["params"] if p["cv"] is not None)
    assert _cmd(base, "set_param", uvid=p["uvid"], kind=p["kind"],
                name=p["name"], cv=0.25)["ok"]
    assert gui._live is None, "set_param left a stale live renderer"


def test_live_chunks_single_listener(server):
    """A new /api/audio/live listener supersedes the previous generator
    (a browser reload's zombie connection must stop stealing blocks —
    two pullers made the live clock run double-speed)."""
    base, gui = server
    assert _cmd(base, "open",
                path=str(REF / "projects/scale-c4-major.json"))["ok"]
    g1 = gui.live_chunks(blocks_per_chunk=1)
    next(g1)  # g1 active
    g2 = gui.live_chunks(blocks_per_chunk=1)
    next(g2)  # g2 takes the token
    with pytest.raises(StopIteration):
        next(g1)  # g1 stops at its next chunk boundary
    next(g2)  # g2 keeps streaming
    g2.close()

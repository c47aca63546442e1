"""Automation of the formerly-static params (VERDICT r2 item 10 tail):
reverb `seconds` (per-block comb feedback gains), chorus `delay-seconds`
(per-block gather taps), and the demo oscillator's `frequency`
(host-constant integrated phase). Each gets: a semantics test on the
whole-timeline Renderer (a constant trip matches the static param; a
moving trip changes the render the way the physics says) and a streamed
segmentation-invariance test (one segment == many segments BITWISE, the
ops/stream contract). Chorus `voices` automates too (the tap loop bound
is the curve's host maximum with per-block masking); only
("toy","my-value") remains static-only — the toy is the negator test
double with no DSP use of the value (engine/render.STATIC_ONLY_PARAMS)."""

import json

import numpy as np

from groove_tpu.compiler.song import compile_song
from groove_tpu.core.types import percent_to_frequency
from groove_tpu.engine.render import STATIC_ONLY_PARAMS, Renderer
from groove_tpu.engine.stream import StreamingRenderer
from groove_tpu.project.schema import SongSettings


def _song(effect_kind=None, effect_params=None, trips=None, paths=None,
          osc=None, bpm=120):
    osc = osc or {"waveform": "sine", "frequency": 220.0}
    devices = [{"instrument": ["i1", {"oscillator": osc}]}]
    cable = ["i1", "main-mixer"]
    if effect_kind:
        devices.append({"effect": ["fx", {effect_kind: effect_params}]})
        cable = ["i1", "fx", "main-mixer"]
    d = {
        "clock": {"bpm": bpm},
        "devices": devices,
        "patch-cables": [cable],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }
    if paths:
        d["paths"] = paths
    if trips:
        d["trips"] = trips
    return compile_song(SongSettings.from_json5_str(json.dumps(d)))


def _trip(param, start, end, target="fx"):
    return dict(
        paths=[{"id": "pa", "note-value": "whole",
                "steps": [{"slope": {"start": start, "end": end}}]}],
        trips=[{"id": "tr", "target": {"id": target, "param": param},
                "paths": ["pa"]}],
    )


def _render(c):
    return np.asarray(Renderer(c).render())


def _stream_bitwise(c):
    one_seg = -(-c.n_frames // 64) * 64
    one = StreamingRenderer(c, segment_frames=one_seg).render()
    many = StreamingRenderer(c, segment_frames=4096).render()
    assert np.array_equal(one, many), (
        f"segment seams visible: max diff {np.abs(one - many).max()}"
    )
    return many


# ---- reverb seconds --------------------------------------------------------


def test_reverb_seconds_constant_trip_matches_static():
    static = _song("reverb", {"attenuation": 1.0, "seconds": 0.8})
    auto = _song("reverb", {"attenuation": 1.0, "seconds": 0.0},
                 **_trip("seconds", 0.8, 0.8))
    a, b = _render(static), _render(auto)
    assert float(np.abs(a).max()) > 0.05
    # static g is a python-float power, automated g a device exp/log —
    # equal to f32 rounding, amplified only by the comb recirculation
    assert float(np.abs(a - b).max()) < 1e-3 * float(np.abs(a).max())


def test_reverb_seconds_ramp_changes_decay():
    """RT60 ramping 1.0 -> 0.02 must kill the late tail relative to a
    static RT60 of 1.0 (the feedback gain collapses)."""
    static = _song("reverb", {"attenuation": 1.0, "seconds": 1.0})
    auto = _song("reverb", {"attenuation": 1.0, "seconds": 1.0},
                 **_trip("seconds", 1.0, 0.02))
    a, b = _render(static), _render(auto)
    n = a.shape[0]
    tail = slice(int(n * 0.8), n)
    ra = float(np.sqrt(np.mean(a[tail] ** 2)))
    rb = float(np.sqrt(np.mean(b[tail] ** 2)))
    assert not np.allclose(a, b, atol=1e-5)
    assert rb < ra  # shorter RT60 => less recirculated energy late


def test_reverb_seconds_automation_streams_bitwise():
    c = _song("reverb", {"attenuation": 1.0, "seconds": 1.0},
              **_trip("seconds", 1.0, 0.05))
    streamed = _stream_bitwise(c)
    whole = _render(c)
    peak = max(1.0, float(np.abs(whole).max()))
    # whole path solves the combs by associative scan, stream serially
    assert float(np.abs(whole - streamed).max()) < 1e-4 * peak


# ---- chorus delay-seconds --------------------------------------------------


def test_chorus_delay_constant_trip_matches_static():
    static = _song("chorus", {"voices": 3, "delay-seconds": 0.03})
    auto = _song("chorus", {"voices": 3, "delay-seconds": 0.03},
                 **_trip("delay-seconds", 0.03, 0.03))
    a, b = _render(static), _render(auto)
    assert float(np.abs(a).max()) > 0.05
    # identical tap indices -> identical gathered samples
    assert np.array_equal(a, b)


def test_chorus_delay_ramp_changes_render():
    static = _song("chorus", {"voices": 3, "delay-seconds": 0.005})
    auto = _song("chorus", {"voices": 3, "delay-seconds": 0.005},
                 **_trip("delay-seconds", 0.005, 0.04))
    a, b = _render(static), _render(auto)
    assert not np.allclose(a, b, atol=1e-4)


def test_chorus_delay_automation_streams_bitwise():
    c = _song("chorus", {"voices": 3, "delay-seconds": 0.005},
              **_trip("delay-seconds", 0.005, 0.04))
    streamed = _stream_bitwise(c)
    whole = _render(c)
    peak = max(1.0, float(np.abs(whole).max()))
    assert float(np.abs(whole - streamed).max()) < 1e-5 * peak


def test_chorus_voices_constant_trip_matches_static():
    """`voices` is a Python loop bound, but the curve is HOST data: the
    loop runs to the curve max with per-block masking, so a constant
    trip at 3 equals static voices=3 exactly."""
    static = _song("chorus", {"voices": 3, "delay-seconds": 0.02})
    auto = _song("chorus", {"voices": 1, "delay-seconds": 0.02},
                 **_trip("voices", 3.0, 3.0))
    a, b = _render(static), _render(auto)
    assert float(np.abs(a).max()) > 0.05
    # same gathered taps; the 1/voices scale is a scalar reciprocal
    # multiply in the static path vs an array divide here (1 ulp)
    assert float(np.abs(a - b).max()) < 1e-6 + 1e-6 * float(np.abs(a).max())


def test_chorus_voices_ramp_changes_render():
    static = _song("chorus", {"voices": 1, "delay-seconds": 0.02})
    auto = _song("chorus", {"voices": 1, "delay-seconds": 0.02},
                 **_trip("voices", 1.0, 4.0))
    a, b = _render(static), _render(auto)
    n = a.shape[0]
    # the trip starts at 1 voice: early samples identical (tap 0 = dry)
    assert np.array_equal(a[: n // 16], b[: n // 16])
    assert not np.allclose(a, b, atol=1e-4)


def test_chorus_voices_automation_streams_bitwise():
    c = _song("chorus", {"voices": 1, "delay-seconds": 0.02},
              **_trip("voices", 1.0, 4.0))
    streamed = _stream_bitwise(c)
    whole = _render(c)
    peak = max(1.0, float(np.abs(whole).max()))
    assert float(np.abs(whole - streamed).max()) < 1e-5 * peak


# ---- oscillator frequency --------------------------------------------------


def _zero_crossings(x):
    return int(np.sum(np.signbit(x[:-1]) != np.signbit(x[1:])))


def test_oscillator_frequency_sweep_is_a_chirp():
    """frequency trips map percent -> Hz (25*800^pct); a 0.3 -> 0.7 slope
    sweeps ~187 Hz -> ~2.7 kHz, so late zero-crossing density must be a
    multiple of the early density."""
    c = _song(**_trip("frequency", 0.3, 0.7, target="i1"))
    out = _render(c)[:, 0]
    sr = 44100
    early = _zero_crossings(out[: sr // 2])
    late = _zero_crossings(out[-sr // 2:])
    assert late > 3 * early
    # the ramp is already moving inside the early window: its average
    # frequency must sit between the sweep's value at the window's start
    # and end (2 crossings per cycle over 0.5 s)
    f_avg = early / (2 * 0.5)
    n_seconds = out.shape[0] / sr
    pct_end = 0.3 + 0.4 * (0.5 / n_seconds)
    assert percent_to_frequency(0.3) * 0.9 < f_avg \
        < percent_to_frequency(pct_end) * 1.1


def test_oscillator_frequency_automation_streams_bitwise():
    """Segmentation is bit-invisible (asserted inside _stream_bitwise:
    the stream slices one precomputed host-phase track). Whole-timeline
    agreement is tolerance-only, like the static oscillator: the stream
    evaluates sin() eagerly at plan time, the whole path under jit."""
    c = _song(**_trip("frequency", 0.3, 0.7, target="i1"))
    streamed = _stream_bitwise(c)
    whole = _render(c)
    peak = max(1.0, float(np.abs(whole).max()))
    assert float(np.abs(whole - streamed).max()) < 1e-5 * peak


def test_oscillator_frequency_constant_trip_matches_static():
    """A constant trip must sound the static pitch: the automated path
    integrates a serial f32 cumsum phase instead of the static f*t
    product, so equality is cycle-count-exact and amplitude-tolerant
    (cumsum rounding drifts the phase by ulps over the song)."""
    f = percent_to_frequency(0.5)  # the trip's to_domain image, exactly
    static = _song(osc={"waveform": "sine", "frequency": f})
    auto = _song(osc={"waveform": "sine", "frequency": 440.0},
                 **_trip("frequency", 0.5, 0.5, target="i1"))
    a, b = _render(static)[:, 0], _render(auto)[:, 0]
    assert float(np.abs(a).max()) > 0.5
    assert abs(_zero_crossings(a) - _zero_crossings(b)) <= 2
    assert float(np.abs(a - b).max()) < 0.02  # phase-drift bound


def test_noise_oscillator_frequency_trip_warns(capsys):
    """`frequency` has no effect on the noise waveform; the trip must
    WARN (warn-and-skip policy), not silently no-op."""
    c = _song(osc={"waveform": "noise", "frequency": 220.0},
              **_trip("frequency", 0.3, 0.7, target="i1"))
    _render(c)
    err = capsys.readouterr().err
    assert "noise" in err and "frequency" in err


# ---- sidechain (signal-passthrough) overrides ------------------------------


def _sc_song(effect_kind, effect_params, params):
    """i1 (220 Hz sine) -> fx -> mixer; i2 (3 Hz sine) -> passthrough ->
    mixer, with the passthrough's block-boundary |amplitude| driving the
    listed fx params (a controls link per param)."""
    d = {
        "clock": {"bpm": 120},
        "devices": [
            {"instrument": ["i1", {"oscillator": {
                "waveform": "sine", "frequency": 220.0}}]},
            {"instrument": ["i2", {"oscillator": {
                "waveform": "sine", "frequency": 3.0}}]},
            {"effect": ["fx", {effect_kind: effect_params}]},
            {"controller": ["sc", {"signal-passthrough-controller": [{}]}]},
        ],
        "patch-cables": [["i1", "fx", "main-mixer"],
                         ["i2", "sc", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
        "controls": [
            {"id": f"c-{p}", "source": "sc", "target": {"id": "fx", "param": p}}
            for p in params
        ],
    }
    return compile_song(SongSettings.from_json5_str(json.dumps(d)))


def _assert_sidechain_acts_and_streams(kind, params, targets, tol):
    """The override must change the render vs the no-link song, and the
    streamed engine must agree (same one-block-delayed |mean| semantics,
    same clamp) within tol·peak on top of bitwise segmentation."""
    linked = _sc_song(kind, params, targets)
    unlinked = _sc_song(kind, params, [])
    a, b = _render(linked), _render(unlinked)
    assert not np.allclose(a, b, atol=1e-5), \
        f"sidechain onto {kind}.{targets} had no effect"
    streamed = _stream_bitwise(linked)
    peak = max(1.0, float(np.abs(a).max()))
    assert float(np.abs(a - streamed).max()) < tol * peak


def test_sidechain_drives_reverb_seconds():
    _assert_sidechain_acts_and_streams(
        "reverb", {"attenuation": 1.0, "seconds": 0.0}, ["seconds"], 1e-4)


def test_sidechain_drives_delay_time():
    _assert_sidechain_acts_and_streams(
        "delay", {"delay": 0.0}, ["delay"], 1e-5)


def test_sidechain_drives_chorus_delay():
    _assert_sidechain_acts_and_streams(
        "chorus", {"voices": 3, "delay-seconds": 0.01},
        ["delay-seconds"], 1e-5)


def test_sidechain_drives_chorus_voices():
    """The tap loop bound for a sidechain-driven `voices` is the
    CONFIGURED static count (the override has no host maximum): with
    voices=4 configured and a 3 Hz source, the count breathes 1..1-ish
    (|amplitude| rounds low) — the render must differ from the static
    4-voice chorus."""
    _assert_sidechain_acts_and_streams(
        "chorus", {"voices": 4, "delay-seconds": 0.02}, ["voices"], 1e-5)


def test_sidechain_delay_clamps_to_engine_bound():
    """Amplitudes above SIDECHAIN_SECONDS_MAX seconds clamp (the streamed
    engine sizes its carried tail for the bound host-side); a gain-boosted
    source must still render identically in both engines."""
    from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX

    assert SIDECHAIN_SECONDS_MAX == 1.0
    d = {
        "clock": {"bpm": 120},
        "devices": [
            {"instrument": ["i1", {"oscillator": {
                "waveform": "sine", "frequency": 220.0}}]},
            {"instrument": ["i2", {"oscillator": {
                "waveform": "sine", "frequency": 3.0}}]},
            # boost the source past the clamp: |mean| peaks near 2.5 s
            {"effect": ["g2", {"gain": {"ceiling": 2.5}}]},
            {"effect": ["fx", {"delay": {"delay": 0.0}}]},
            {"controller": ["sc", {"signal-passthrough-controller": [{}]}]},
        ],
        "patch-cables": [["i1", "fx", "main-mixer"],
                         ["i2", "g2", "sc", "main-mixer"]],
        "patterns": [{"id": "p", "notes": [[60]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
        "controls": [{"id": "c", "source": "sc",
                      "target": {"id": "fx", "param": "delay"}}],
    }
    linked = compile_song(SongSettings.from_json5_str(json.dumps(d)))
    a = _render(linked)
    streamed = _stream_bitwise(linked)
    peak = max(1.0, float(np.abs(a).max()))
    assert float(np.abs(a - streamed).max()) < 1e-5 * peak


# ---- what stays static -----------------------------------------------------


def test_static_only_set_is_exactly_the_structural_params():
    assert STATIC_ONLY_PARAMS == {("toy", "my-value")}


def test_sidechain_bits_converts_control_value_to_domain():
    """A sidechain onto bitcrusher bits-to-crush must convert the raw
    Normal through the registry (trunc(v*15)) like every other control
    route — the raw 0..1 value floored to 0 bits and the link was inert
    (round-3 review finding)."""
    linked = _sc_song("bitcrusher", {"bits": 0}, ["bits-to-crush"])
    unlinked = _sc_song("bitcrusher", {"bits": 0}, [])
    a, b = _render(linked), _render(unlinked)
    assert not np.allclose(a, b, atol=1e-5), \
        "sidechain onto bits-to-crush is inert (domain conversion missing)"
    streamed = _stream_bitwise(linked)
    peak = max(1.0, float(np.abs(a).max()))
    assert float(np.abs(a - streamed).max()) < 1e-5 * peak

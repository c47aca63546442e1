"""Native runtime (C++ ring buffer, audio service, WAV fast path)."""

import time

import numpy as np
import pytest

from groove_tpu.io import native
from groove_tpu.io.wav import read_wav, write_wav_16bit_stereo

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_ring_buffer_roundtrip():
    rb = native.RingBuffer(1024)
    x = np.random.default_rng(0).standard_normal((300, 2)).astype(np.float32)
    assert rb.write(x) == 300
    assert rb.readable() == 300
    assert np.allclose(rb.read(300), x)
    # over-capacity writes are truncated, never block
    assert rb.write(np.zeros((5000, 2), np.float32)) == 1024
    rb.close()


def test_underrun_reads_silence():
    rb = native.RingBuffer(64)
    rb.write(np.ones((10, 2), np.float32))
    out = rb.read(20)
    assert np.all(out[:10] == 1.0)
    assert np.all(out[10:] == 0.0)
    rb.close()


def test_audio_service_paces_realtime(tmp_path):
    sink = tmp_path / "stream.f32"
    svc = native.AudioService(sample_rate=44100, buffer_frames=64,
                              sink_path=str(sink))
    try:
        t0 = time.time()
        while time.time() - t0 < 0.25:
            need = svc.needs_frames()
            if need > 0:
                svc.write(np.full((need, 2), 0.25, np.float32))
            time.sleep(0.001)
        consumed = svc.frames_consumed()
    finally:
        svc.stop()
    # ~0.25s of frames at 44.1kHz, +- scheduling slop
    assert 0.15 * 44100 < consumed < 0.5 * 44100
    data = np.fromfile(sink, np.float32)
    assert len(data) == consumed * 2


def test_native_wav_matches_python_writer(tmp_path):
    s = (np.random.default_rng(1).standard_normal((5000, 2)) * 0.8).astype(
        np.float32
    )
    write_wav_16bit_stereo(tmp_path / "py.wav", s, 44100)
    assert native.wav_write_fast(tmp_path / "nat.wav", s, 44100)
    a, ra = read_wav(tmp_path / "py.wav")
    b, rb = read_wav(tmp_path / "nat.wav")
    assert ra == rb == 44100
    assert np.array_equal(a, b)


def test_lead_buffers_sets_needs_frames_target():
    """The NeedsAudio target is lead_buffers x buffer_frames (pre-fix the
    C side hardcoded 4 and LiveMidiService.lead_blocks was dead)."""
    svc = native.AudioService(sample_rate=44100, buffer_frames=64,
                              lead_buffers=8)
    try:
        assert svc.needs_frames() <= 64 * 8
        assert svc.needs_frames() > 64 * 4  # consumer may have drained some
    finally:
        svc.stop()


def test_bad_sink_path_raises():
    with pytest.raises(RuntimeError):
        native.AudioService(sample_rate=44100, buffer_frames=64,
                            sink_path="/nonexistent-dir/stream.f32")


def test_ring_write_rejects_non_stereo():
    rb = native.RingBuffer(64)
    try:
        with pytest.raises(ValueError):
            rb.write(np.zeros(64, np.float32))       # mono [n]
        with pytest.raises(ValueError):
            rb.write(np.zeros((16, 3), np.float32))  # [n, 3]
    finally:
        rb.close()


def test_post_stop_calls_are_safe():
    """A render thread losing the shutdown race must hit no-ops, not freed
    native handles."""
    svc = native.AudioService(sample_rate=44100, buffer_frames=64)
    svc.stop()
    assert svc.needs_frames() == 0
    assert svc.write(np.zeros((64, 2), np.float32)) == 0
    assert svc.frames_consumed() == 0
    svc.stop()  # idempotent
    rb = native.RingBuffer(16)
    rb.close()
    assert rb.write(np.zeros((4, 2), np.float32)) == 0
    assert rb.readable() == 0
    assert np.all(rb.read(4) == 0)
    rb.close()


def test_wav_write_fast_reports_failure():
    s = np.zeros((16, 2), np.float32)
    assert not native.wav_write_fast("/nonexistent-dir/x.wav", s, 44100)

"""WAV read/write.

Write spec matches the reference exactly (orchestration/src/helpers.rs:74-97
and the commented writer in settings/src/patches.rs:806-812): stereo,
16-bit signed int, each float sample scaled by i16::MAX (32767) and cast —
Rust's `as i16` saturates and truncates toward zero, reproduced here.

Read: 16/24/32-bit PCM and float WAVs, normalized to float32 in [-1, 1)
by the type's full scale (hound-compatible: i16 / 32768).
"""

from __future__ import annotations

import struct
import wave
from pathlib import Path

import numpy as np


def _chunk_to_i2(chunk) -> np.ndarray:
    """ONE definition of the output quantization: float chunks scale by
    32767, truncate toward zero and saturate (Rust `as i16` semantics);
    int16 passes through (already quantized on-device —
    quantize_16bit_device is bitwise this spec); mono stacks to stereo."""
    c = np.asarray(chunk)
    if c.dtype == np.int16:
        scaled = c.astype("<i2", copy=False)
    else:
        scaled = np.clip(np.trunc(c.astype(np.float64) * 32767.0),
                         -32768, 32767).astype("<i2")
    if scaled.ndim == 1:
        scaled = np.stack([scaled, scaled], axis=-1)
    return scaled


def write_wav_16bit_stereo(path, samples: np.ndarray, sample_rate: int) -> None:
    """samples: [n, 2] float (or device-quantized int16); spec in
    _chunk_to_i2."""
    write_wav_16bit_stereo_stream(path, [samples], sample_rate)


def write_wav_16bit_stereo_stream(path, chunks, sample_rate: int) -> int:
    """Incremental writer for segment-streamed renders: consumes an
    iterator of [n, 2] float chunks, writing each as it arrives (constant
    memory for unbounded songs; the wave module patches the RIFF sizes on
    close). Quantization spec in _chunk_to_i2. Returns total frames
    written."""
    total = 0
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        for chunk in chunks:
            scaled = _chunk_to_i2(chunk)
            w.writeframes(scaled.tobytes())
            total += len(scaled)
    return total


_QUANTIZE_JIT = None


def quantize_16bit_jit(audio):
    """quantize_16bit_device as a cached SEPARATE jitted program applied
    to a device array. The program boundary matters: fusing the quantizer
    into a render program lets XLA re-fuse the render's tail and shift
    knife-edge samples by 1 ulp (measured 12/496k) — the quantized fetch
    must be bitwise the float path's."""
    global _QUANTIZE_JIT
    if _QUANTIZE_JIT is None:
        import jax

        _QUANTIZE_JIT = jax.jit(quantize_16bit_device)
    return _QUANTIZE_JIT(audio)


def quantize_16bit_device(x):
    """Device-side (jax) 16-bit quantization, BITWISE the host writers'
    spec trunc(float64(x) * 32767) + saturate — halves the bytes crossing
    the host<->device tunnel on streamed renders (the fetch, not the
    compute, bounds streamed throughput on this machine's ~30 MB/s link).

    The host path is exact: an f32 sample widened to f64 and multiplied
    by 32767.0 has a 24x15-bit product < 53 bits. A plain f32 multiply
    may round across an integer boundary, so compute the exact product as
    a double-f32 pair via the power-of-two split (all steps exact by
    Sterbenz):

        hi = x * 32768          (exact: power-of-two scale)
        s  = hi - x             (rounded product x*32767)
        e  = (hi - s) - x       (EXACT rounding error: v = s + e)

    trunc(v) from q = trunc(s): the boundary tests compare (f ± 1) + e
    with f = s - q exact, so each decision reduces to the sign of an
    exactly-representable quantity (rounding near zero preserves sign).
    """
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    hi = x * jnp.float32(32768.0)
    s = hi - x
    e = (hi - s) - x
    q = jnp.trunc(s)
    f = s - q
    pos = s >= 0
    one = jnp.float32(1.0)
    up_pos = ((f - one) + e) >= 0    # v >= q + 1
    dn_pos = (f + e) < 0             # v < q
    dn_neg = ((f + one) + e) <= 0    # v <= q - 1
    up_neg = (f + e) > 0             # v > q
    adj = jnp.where(
        pos,
        up_pos.astype(jnp.float32) - dn_pos.astype(jnp.float32),
        up_neg.astype(jnp.float32) - dn_neg.astype(jnp.float32),
    )
    q = jnp.clip(q + adj, -32768.0, 32767.0)
    return q.astype(jnp.int16)


def read_wav(path) -> tuple[np.ndarray, int]:
    """Returns ([n, channels] float32 in [-1, 1), sample_rate).

    Hand-rolled RIFF parse so 24-bit and float formats work without
    external deps.
    """
    data = Path(path).read_bytes()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body  # kept whole for the EXTENSIBLE GUID below
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real format is a
        # GUID at byte 24 of the fmt body; the first two GUID bytes are the
        # classic format code (1 = PCM, 3 = IEEE float).
        if len(fmt_body) >= 26:
            audio_format = struct.unpack_from("<H", fmt_body, 24)[0]
        else:
            audio_format = 1
    if audio_format == 3 and bits == 32:
        x = np.frombuffer(raw, "<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    elif audio_format == 1 and bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(
            1 << 23
        )
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
    elif audio_format == 3 and bits == 64:
        x = np.frombuffer(raw, "<f8").astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAV format {audio_format}/{bits}")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate

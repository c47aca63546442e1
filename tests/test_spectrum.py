"""Spectrum-analysis tool (utils/spectrum.py) — the reconstruction of the
reference's spectrum-analyzer + visualization debugging surface
(Cargo.toml:41,37,71)."""

import math

import numpy as np
import pytest

from groove_tpu.utils.spectrum import analyze


def _sine(freq, rate=44100, n=8192, amp=1.0):
    t = np.arange(n) / rate
    return amp * np.sin(2 * math.pi * freq * t)


def test_full_scale_sine_reads_0dbfs():
    # bin-centered tone: calibration pins 0 dBFS regardless of FFT length
    for n in (4096, 8192, 16384):
        rate = 44100
        freq = 64 * rate / n  # exactly bin 64
        sp = analyze(_sine(freq, rate, n), rate)
        f, db = sp.peak()
        assert abs(f - freq) < rate / n
        assert abs(db) < 0.01, db


def test_amplitude_tracks_db():
    rate = 44100
    freq = 32 * rate / 8192
    sp = analyze(_sine(freq, rate, 8192, amp=10 ** (-20 / 20)), rate)
    assert abs(sp.peak()[1] + 20.0) < 0.01


def test_peaks_finds_partials_in_order():
    rate = 44100
    n = 16384
    f0 = 100 * rate / n
    x = (_sine(f0, rate, n, 1.0) + _sine(2 * f0, rate, n, 0.25)
         + _sine(3 * f0, rate, n, 0.05))
    got = analyze(x, rate).peaks(3)
    freqs = [f for f, _ in got]
    assert [round(f / f0) for f in freqs] == [1, 2, 3]
    # relative levels: -12 dB and -26 dB
    assert abs((got[1][1] - got[0][1]) + 12.04) < 0.1
    assert abs((got[2][1] - got[0][1]) + 26.02) < 0.1


def test_level_at_and_band():
    rate = 44100
    n = 8192
    freq = 128 * rate / n
    sp = analyze(_sine(freq, rate, n), rate)
    assert abs(sp.level_at(freq)) < 0.01
    assert sp.level_at(freq * 4) < -100
    assert abs(sp.band_db(freq - 50, freq + 50)) < 0.2
    assert sp.band_db(8000, 12000) < -100


def test_stereo_input_accepted():
    rate = 44100
    x = _sine(441 * 100 / 100, rate, 4096)
    st = np.stack([x, x])  # [2, n]
    assert abs(analyze(st, rate).peak()[1]) < 0.1


def test_ascii_plot_shape_and_peak_column():
    rate = 44100
    n = 8192
    sp = analyze(_sine(1000.0, rate, n), rate)
    art = sp.ascii(width=60, height=12)
    lines = art.splitlines()
    assert len(lines) == 14  # 12 rows + axis line + labels
    assert all(len(line) >= 60 for line in lines[:12])
    # the tallest column should sit near 1 kHz on the log axis
    top = next(line for line in lines if "#" in line)
    cols = [i for i, ch in enumerate(top[7:]) if ch == "#"]
    assert cols, art
    f_lo, f_hi = 20.0, rate / 2
    pos = (math.log(1000) - math.log(f_lo)) / (math.log(f_hi) - math.log(f_lo))
    assert abs(cols[0] - pos * 59) <= 2


def test_cli_on_wav(tmp_path):
    from groove_tpu.io.wav import write_wav_16bit_stereo
    from groove_tpu.utils.spectrum import main

    rate = 44100
    x = 0.5 * _sine(441.430664, rate, 8192)  # bin 82 of 8192
    write_wav_16bit_stereo(str(tmp_path / "t.wav"),
                           np.stack([x, x], axis=1), rate)
    rc = main([str(tmp_path / "t.wav"), "--peaks", "1",
               "--band", "300", "600"])
    assert rc == 0


def test_cli_on_project(capsys):
    from groove_tpu.utils.spectrum import main

    rc = main(["/root/reference/projects/scale-c4-major.json", "--peaks", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "peak" in out and "dBFS" in out


def test_device_isolation_rejects_unknown():
    from groove_tpu.utils.spectrum import main

    with pytest.raises(SystemExit):
        main(["/root/reference/projects/scale-c4-major.json",
              "--device", "nope"])

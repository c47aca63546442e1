"""CLI batch behavior: per-file error isolation.

The reference CLI's input loop handles each file independently — a load
error prints and the loop continues with the remaining inputs
(src/bin/groove-cli.rs:68 matches each Err and moves on). A malformed
project in a multi-file invocation must not abort the batch; the exit
code reflects that a failure occurred.
"""

import shutil
from pathlib import Path

import numpy as np

REF = Path("/root/reference")


def test_cli_bad_file_does_not_abort_batch(tmp_path, capsys):
    from groove_tpu.cli import main as cli_main
    from groove_tpu.io.wav import read_wav

    bad = REF / "projects/tests/invalid-project.json"
    good_src = REF / "projects/demos/effects/drums-reverb.json"
    good = tmp_path / "drums-reverb.json"
    shutil.copy(good_src, good)

    rc = cli_main([str(bad), str(good), "--wav", "--quiet",
                   "--out-dir", str(tmp_path)])
    assert rc == 1  # failure reported...
    err = capsys.readouterr().err
    assert "invalid-project" in err
    # ...but the good file still rendered
    audio, rate = read_wav(tmp_path / "drums-reverb.wav")
    assert rate == 44100 and audio.shape[0] > 0
    assert float(np.abs(audio).max()) > 0.0


def test_cli_all_good_returns_zero(tmp_path):
    from groove_tpu.cli import main as cli_main

    good_src = REF / "projects/demos/effects/drums-reverb.json"
    good = tmp_path / "drums-reverb.json"
    shutil.copy(good_src, good)
    assert cli_main([str(good), "--quiet"]) == 0

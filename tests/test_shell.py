"""Scripted end-to-end test of the line shell (python -m groove_tpu.shell):
the reference GUI's command surface, terminal edition. Runs the real
module in a subprocess with commands on stdin (the shell's scriptable
mode), so argument parsing, service wiring, and event printing are all
exercised as a user would."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_shell(script: str, timeout: float = 600.0) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    out = subprocess.run(
        [sys.executable, "-m", "groove_tpu.shell"],
        input=script, text=True, capture_output=True,
        timeout=timeout, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_shell_open_edit_loop_status(tmp_path):
    script = """\
open /root/reference/projects/scale-c4-major.json
tempo 90
tracks
loop 2 6
status
loop off
status
palette
track-new lane-x 5
tracks
save {save}
quit
""".format(save=tmp_path / "resaved.json")
    out = run_shell(script)
    assert "[project-opened]" in out
    assert "[tempo] 90.0" in out
    assert "[loop-set] (2.0, 6.0)" in out
    assert "loop=(2.0, 6.0)" in out
    assert "[loop-cleared]" in out
    assert "welsh" in out          # palette listing
    assert "lane-x  ch5" in out    # new track shown by `tracks`
    assert "[saved]" in out
    assert (tmp_path / "resaved.json").exists()


def test_shell_unknown_command_and_help():
    out = run_shell("frobnicate\nhelp\nquit\n")
    assert "unknown command 'frobnicate'" in out
    assert "bounce-loop" in out    # help text covers the loop commands

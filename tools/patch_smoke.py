"""Audible-energy smoke across the whole Welsh patch corpus.

The reference's `welsh_makes_any_sound_at_all` (settings/src/patches.rs:
925-936) checks one patch; this renders a C4 note through EVERY shipped
patch and records peak/rms — silent patches are flagged (some are silent by
construction, e.g. both oscillators "none" with zero noise).

Usage: python tools/patch_smoke.py [--out PATCHES.md]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PATCH_DIR = Path("/root/reference/assets/patches/welsh")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PATCHES.md")
    args = ap.parse_args()

    import jax.numpy as jnp
    from groove_tpu.models import welsh as welsh_model
    from groove_tpu.project.paths import Paths
    from groove_tpu.project.patches import WelshPatchSettings

    paths = Paths()
    names = sorted(p.stem for p in PATCH_DIR.glob("*.json"))
    span = 16384  # ~0.37 s at 44.1 kHz
    keys = jnp.asarray(np.array([60], np.int32))
    vels = jnp.asarray(np.array([127.0], np.float32))
    gates = jnp.asarray(np.array([12000], np.int32))

    rows = []
    silent = []
    t_all = time.time()
    for name in names:
        params = WelshPatchSettings.by_name(paths, name)\
            .derive_welsh_voice_params()
        out = np.asarray(welsh_model.render_notes(
            params, keys, vels, gates, span, 44100.0,
            refine_filter=welsh_model.needs_filter_refinement(params),
        ))
        peak = float(np.abs(out).max())
        rms = float(np.sqrt((out**2).mean()))
        expected_silent = (
            params.oscillator_1.waveform.kind in ("none", "debug-zero")
            and params.oscillator_2.waveform.kind in ("none", "debug-zero")
            and params.noise == 0.0
        )
        status = "ok" if peak > 1e-4 else (
            "silent-by-construction" if expected_silent else "SILENT?"
        )
        if status == "SILENT?":
            silent.append(name)
        rows.append((name, f"{peak:.4f}", f"{rms:.5f}", status))
        print(f"{name}: peak={peak:.4f} {status}", flush=True)

    with open(args.out, "w") as f:
        f.write("# PATCHES — C4 audible-energy smoke across the Welsh corpus\n\n")
        f.write(f"{len(names)} patches; unexpected-silent: {len(silent)} "
                f"{silent}\n\n")
        f.write("| patch | peak | rms | status |\n|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
    print(f"\nwrote {args.out} ({time.time() - t_all:.0f}s); "
          f"unexpected-silent: {silent}")
    return 1 if silent else 0


if __name__ == "__main__":
    sys.exit(main())

"""Render every project in the reference corpus and record stats.

Usage: python tools/render_corpus.py [--out CORPUS.md]

The coverage artifact: proves every shipped project file (plus the SMF
fixtures) compiles and renders, with basic audio stats per file.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF = Path("/root/reference")
# invalid-project.json and instruments-have-no-inputs.json5 are
# deliberately-invalid fixtures (the loader must REJECT them — covered by
# tests); test.grv is an unrelated binary.
SKIP = {"invalid-project.json", "test.grv", "instruments-have-no-inputs.json5"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="CORPUS.md")
    ap.add_argument("--midi", action="store_true", help="include SMF fixtures")
    ap.add_argument("--golden", default=None, metavar="JSON",
                    help="also write a full-precision {file: [frames, peak, "
                         "rms]} fixture for tests/test_corpus_golden.py")
    args = ap.parse_args()

    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings

    files = []
    for base in [REF / "projects", REF / "test-data"]:
        for p in sorted(base.rglob("*.json")) + sorted(base.rglob("*.json5")):
            if p.name not in SKIP and "midi" not in p.parts:
                files.append(p)
    if args.midi:
        files += sorted((REF / "test-data/midi").glob("*.mid"))

    rows = []
    golden = {}
    failures = 0
    for p in files:
        rel = p.relative_to(REF)
        t0 = time.time()
        try:
            if p.suffix == ".mid":
                compiled = compile_midi_file(p)
            else:
                compiled = compile_song(SongSettings.from_project_file(p))
            out = Renderer(compiled).render()
            dt = time.time() - t0
            bad = int(np.isnan(out).sum() + np.isinf(out).sum())
            peak = float(np.abs(out).max()) if out.size else 0.0
            rms = float(np.sqrt((out**2).mean())) if out.size else 0.0
            status = "ok" if bad == 0 else f"BAD({bad} nan/inf)"
            if bad:
                failures += 1
            rows.append((str(rel), compiled.n_frames,
                         f"{compiled.n_frames / 44100:.2f}",
                         f"{peak:.3f}", f"{rms:.4f}", f"{dt:.1f}", status))
            if bad == 0:
                golden[str(rel)] = [int(compiled.n_frames), peak, rms]
            print(f"{rel}: {status} n={compiled.n_frames} peak={peak:.3f} "
                  f"({dt:.1f}s)", flush=True)
        except Exception as e:
            failures += 1
            rows.append((str(rel), 0, "-", "-", "-", "-",
                         f"FAIL {type(e).__name__}: {e}"))
            print(f"{rel}: FAIL {type(e).__name__}: {e}", flush=True)

    with open(args.out, "w") as f:
        f.write("# CORPUS — render coverage of every reference project\n\n")
        f.write(f"{len(files)} files, {len(files) - failures} ok, "
                f"{failures} failures.\n\n")
        f.write("| file | frames | seconds | peak | rms | wall s | status |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(str(c) for c in r) + " |\n")
    print(f"\nwrote {args.out}: {len(files) - failures}/{len(files)} ok")
    if args.golden:
        import json
        with open(args.golden, "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        print(f"wrote {args.golden}: {len(golden)} golden entries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

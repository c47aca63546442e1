"""On-chip song-level fidelity artifact (VERDICT r3 item 1).

Renders each BASELINE config END-TO-END on the attached TPU (the axon
platform — the same shipped path `groove_tpu.cli --wav` takes: Pallas
kernels, refined defect-correction, per-patch fidelity routing), fetches
the f32 result host-side, and measures the song-level residual against
tools/f64_reference.render_f64 — the strictly serial float64 evaluation
of the reference's per-sample loop semantics
(orchestration/src/orchestrator.rs:367-470).

Methodology note (same as tools/f64_reference.py): the f64 reference
shares the ENGINE'S OWN f32 control constants — per-note oscillator
frequencies, pitch-LFO phase tables, and filter coefficient tables,
all designed HOST-side in numpy f32 and shipped into the jitted
programs as data (welsh.host_osc_constants/host_filter_tables/
host_pitch_phases, render.host_effect_filter_coefs) — so the
comparison isolates the engine's parallel/blocked/Pallas evaluation,
not backend transcendental ulps. As of round 5 EVERY fidelity-
sensitive control family is host-designed (chunked pitch-phase tables
with no size bail-out, LFO-driven filter coefficient tables, per-span
LFO value rows, gate-seconds rows), so no trace-derived control
remains — the round-4 flagged rows (oversize pitch-LFO batches,
LFO-driven coefficients) measured −77.9/−79.2 then and ≤−127 after
the migration (DECISIONS.md "LFO-driven filter coefficients
host-side" / "Sine range reduction").

Writes FIDELITY_TPU.md (human table) and fidelity_tpu.json (machine
row per config: max-abs and rms residual in dBFS relative to the f64
reference's peak). The BASELINE bar is max-abs <= -80 dBFS.

Usage:
    python tools/fidelity_tpu.py [--configs rel1,rel2,...] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

REF = Path("/root/reference")

# BASELINE.json configs + welsh-octave-switch (the deepest-corner welsh
# file in the corpus: its cascade rests at the literal 25 Hz floor with
# q 5.33 — the case the CPU test backend documents as out of reach and
# the TPU Pallas kernel is supposed to nail).
DEFAULT_CONFIGS = [
    "projects/demos/effects/drums-filtered-24db.json",
    "projects/scale-c4-major.json",
    "test-data/kitchen-sink.json",
    "test-data/perf-1.json",
    "projects/demos/instruments/welsh-octave-switch.json",
    # round-5 fidelity tail: the three corpus rows that sat at
    # -77.9/-79.2/-79.8 while pitch-LFO phases and LFO-driven filter
    # coefficients were trace-derived; pinned on-chip post-migration.
    "projects/demos/instruments/welsh-test-lfo-pitch.json",
    "projects/demos/instruments/welsh-didgeridoo.json",
    "projects/demos/instruments/envelope-adsr-linear.json",
]

BAR_DB = -80.0


def measure(rel: str) -> dict:
    from groove_tpu.compiler.song import compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings
    from tools.f64_reference import render_f64

    t0 = time.time()
    c = compile_song(SongSettings.from_project_file(REF / rel))
    r = Renderer(c)
    got = np.asarray(r.render()).astype(np.float64)  # fetch forces completion
    t_render = time.time() - t0

    t0 = time.time()
    ref = render_f64(c)
    t_ref = time.time() - t0

    assert got.shape == ref.shape, (got.shape, ref.shape)
    peak = max(1.0, float(np.abs(ref).max()))
    err = np.abs(got - ref)
    max_db = 20.0 * np.log10(float(err.max()) / peak + 1e-30)
    rms_db = 20.0 * np.log10(
        float(np.sqrt(np.mean(err ** 2))) / peak + 1e-30)
    return {
        "config": rel,
        "frames": int(c.n_frames),
        "audio_seconds": round(c.n_frames / float(c.sample_rate), 3),
        "ref_peak": round(peak, 6),
        "max_abs_dbfs": round(max_db, 1),
        "rms_dbfs": round(rms_db, 1),
        "pass_80": bool(max_db <= BAR_DB),
        "t_render_s": round(t_render, 1),
        "t_f64_s": round(t_ref, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma-separated rel paths under /root/reference")
    ap.add_argument("--out", default=None, help="output markdown path")
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform
    device = str(jax.devices()[0])
    print(f"device: {device} (platform {platform})", file=sys.stderr)

    configs = (args.configs.split(",") if args.configs else DEFAULT_CONFIGS)
    rows = []
    for rel in configs:
        print(f"== {rel}", file=sys.stderr, flush=True)
        try:
            row = measure(rel)
        except NotImplementedError as e:
            row = {"config": rel, "error": f"f64 reference scope: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    repo = Path(__file__).resolve().parent.parent
    art = {"device": device, "platform": platform,
           "bar_dbfs": BAR_DB, "rows": rows}
    (repo / "fidelity_tpu.json").write_text(json.dumps(art, indent=1))

    md = [
        "# FIDELITY_TPU — on-chip song-level residuals vs the f64 reference",
        "",
        f"Device: **{device}** (platform `{platform}`). Each row: the song",
        "rendered end-to-end ON THE CHIP through the shipped path (Pallas",
        "kernels, per-patch fidelity routing), fetched host-side, compared",
        "sample-for-sample against tools/f64_reference.py — the strictly",
        "serial float64 evaluation of the reference's per-sample loop",
        "(orchestration/src/orchestrator.rs:367-470) sharing the engine's",
        "HOST-designed f32 control constants (numpy bits shipped into the",
        "jitted programs as data — identical on every backend).",
        "BASELINE.md fidelity bar: max-abs residual <= -80 dBFS.",
        "",
        "| Config | Audio s | f64 peak | max-abs dBFS | rms dBFS | <=-80? |",
        "|---|---|---|---|---|---|",
    ]
    for row in rows:
        if "error" in row:
            md.append(f"| {row['config']} | — | — | — | — | {row['error']} |")
        else:
            md.append(
                f"| {row['config']} | {row['audio_seconds']} | "
                f"{row['ref_peak']:.3f} | **{row['max_abs_dbfs']}** | "
                f"{row['rms_dbfs']} | "
                f"{'yes' if row['pass_80'] else 'NO'} |")
    md += [
        "",
        "Residual dB are relative to the f64 reference's own peak",
        "(max(1, peak)). `rms` is the whole-song RMS of the residual —",
        "the max-abs row is the BASELINE criterion; rms shows the typical",
        "sample is far below it.",
        "",
    ]
    out = Path(args.out) if args.out else repo / "FIDELITY_TPU.md"
    out.write_text("\n".join(md))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

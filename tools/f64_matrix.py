"""Corpus-wide f64 residual matrix (VERDICT r3 item 2).

Renders a diverse slice of the reference corpus through the shipped
engine AND tools/f64_reference.py (the strictly serial float64
evaluation of the reference's per-sample loop, sharing the engine's
host f32 control constants), and records the song-level residual per
file in F64_MATRIX.md. Covers what the four BASELINE configs don't:
every welsh LFO routing in the shipped patch set, noise mix-ins, hard
sync, glide, the resampled sampler, FM, delays/reverb/chorus/
compressor, sends/sidechain, an SMF import, and dev-loop.json5 (whose
peak 17,849.77 the f64 reference REPRODUCES — the blow-up is the song's
own parked-25-Hz automated-filter semantics, not an engine defect).

Usage: python tools/f64_matrix.py [--configs a,b,...] [--out F64_MATRIX.md]
(tests/test_f64_matrix.py pins a fast subset in CI.)
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

import numpy as np

REF = Path("/root/reference")

DEFAULT_CONFIGS = [
    # welsh patch diversity (LFO routings, sync, noise, filter corners)
    "projects/demos/instruments/welsh-piano.json",
    "projects/demos/instruments/welsh-angels.json",
    "projects/demos/instruments/welsh-cello.json",
    "projects/demos/instruments/welsh-didgeridoo.json",
    "projects/demos/instruments/welsh-harmonica.json",
    "projects/demos/instruments/welsh-octave-switch.json",
    "projects/demos/instruments/welsh-test-lfo-pitch.json",
    # other instruments
    "projects/demos/instruments/sampler.json",
    "projects/demos/instruments/drums.json",
    "projects/demos/instruments/fm-synthesizer.json",
    "projects/demos/instruments/envelope-adsr-linear.json",
    "projects/calculator.json",
    # effects + automation
    "projects/demos/effects/drums-reverb.json",
    "projects/demos/effects/drums-chorus.json",
    "projects/demos/effects/delay.json",
    "projects/demos/effects/compressor.json",
    "projects/demos/effects/bitcrusher_sawtooth_bits-to-crush-13.json",
    "projects/demos/effects/filter-lpf-12db-noise-sweep-down.json",
    ("projects/demos/effects/"
     "filter-low-pass-24db_noise_cutoff-1000_passband-ripple-sweep.json"),
    # controllers / routing
    "projects/demos/controllers/sidechain.json",
    "projects/demos/controllers/stereo-automation.json",
    "projects/demos/controllers/arpeggiator.json",
    # whole songs
    "projects/dev-loop.json5",
    "projects/default.json5",
    "projects/automation-work.json",
    # SMF import (single-channel overlap + a multi-channel file: 4
    # channels -> 4 GM-mapped welsh instruments through the mix bus)
    "test-data/midi/major-scale-overlapping.mid",
    "test-data/midi/multi-channel.mid",
]


# Rows whose CPU max-abs sits above the -80 dBFS bar, with the measured
# root cause. Two classes: (a) DISCONTINUITY KNIFE-EDGES — the engine (f32)
# and the reference (f64) evaluate a step function of nearly-identical
# signals, so an input difference of ~1e-7 at a threshold flips isolated
# samples by the full step height; max-abs is the wrong metric there (the
# rms column shows the typical sample), and both outputs are valid renders
# of the semantics. (b) the deep-corner cascade, where the CPU test
# backend's fallback genuinely floors — the SHIPPED TPU kernel is pinned
# on-chip (FIDELITY_TPU.md) and structurally in CI via the Pallas
# interpreter (tests/test_pallas_golden.py).
NOTES = {
    "projects/demos/effects/limiter_sine_min-0.400_max-0.600.json":
        "knife-edge: limiter sign(x)*clip(|x|,min,max) JUMPS by 2*min "
        "across x=0; a sine sample landing within ~1e-7 of a zero "
        "crossing flips sign between the f32 and f64 evaluations "
        "(isolated samples; rms -41)",
    "projects/demos/effects/limiter_sine_min-0.100_max-0.900.json":
        "knife-edge: same limiter sign discontinuity, smaller min "
        "(isolated samples; rms -53)",
    "projects/demos/controllers/sidechain.json":
        "knife-edge: compressor threshold driven by a sidechain control "
        "derived from each renderer's OWN signal (semantics, not shared "
        "bits); a block-rate crossing flip gates a short region. "
        "On-chip: -129.2 (FIDELITY r4)",
    "projects/default.json5":
        "knife-edge: static compressor threshold crossing flips one "
        "block, gain diverges ~1.7e-4 over the release region (rms -99)",
    "projects/demos/instruments/welsh-octave-switch.json":
        "deep corner: cascade parked at the 25 Hz floor with q 5.33; the "
        "CPU serial fallback floors here, the shipped TPU kernel "
        "measures -81.2 on-chip (FIDELITY_TPU.md)",
}
# Historical (fixed in round 5, kept for the record): the SMF rows
# clouds/-3.7, d-gonnamakeyousweat/-17.8 and jingle_bells/-21.8 were
# isolated full-amplitude spikes at 64-aligned NOTE-OFF frames of
# release-0 GM patches — the amp envelope is a STEP there, and the
# engine's in-trace gate/sr divide sat one ulp off the host time base
# under XLA's reciprocal-multiply rewrite, flipping the cut sample
# between full and zero (welsh.host_gate_seconds now ships the division
# as host bits and the f64 reference evaluates its envelope on the same
# f32 time bits). Measured after the fix: jingle_bells -82.5,
# d-gonnamakeyousweat -106.8.


def corpus_configs() -> list[str]:
    """The FULL corpus: every loadable project file (the golden fixture's
    walk, tests/test_corpus_golden.py) plus every SMF dump — 105 files."""
    skip = {"invalid-project.json", "test.grv",
            "instruments-have-no-inputs.json5"}
    rels: list[str] = []
    for base in [REF / "projects", REF / "test-data"]:
        for p in sorted(base.rglob("*.json")) + sorted(base.rglob("*.json5")):
            if p.name not in skip and "midi" not in p.parts:
                rels.append(str(p.relative_to(REF)))
    rels += [str(p.relative_to(REF))
             for p in sorted((REF / "test-data/midi").glob("*.mid"))]
    return rels


def measure(rel: str) -> dict:
    from groove_tpu.compiler.song import compile_midi_file, compile_song
    from groove_tpu.engine.render import Renderer
    from groove_tpu.project.schema import SongSettings
    from tools.f64_reference import render_f64

    p = REF / rel
    if p.suffix == ".mid":
        c = compile_midi_file(p)
    else:
        c = compile_song(SongSettings.from_project_file(p))
    t0 = time.time()
    got = np.asarray(Renderer(c).render()).astype(np.float64)
    t_render = time.time() - t0
    t0 = time.time()
    ref = render_f64(c)
    t_ref = time.time() - t0
    assert got.shape == ref.shape
    peak = max(1.0, float(np.abs(ref).max()))
    err = np.abs(got - ref)
    max_db = 20.0 * np.log10(float(err.max()) / peak + 1e-30)
    rms_db = 20.0 * np.log10(float(np.sqrt(np.mean(err**2))) / peak + 1e-30)
    return {
        "config": rel,
        "frames": int(c.n_frames),
        "ref_peak": round(float(np.abs(ref).max()), 6),
        "max_abs_dbfs": round(max_db, 1),
        "rms_dbfs": round(rms_db, 1),
        "t_render_s": round(t_render, 1),
        "t_f64_s": round(t_ref, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None)
    ap.add_argument("--all", action="store_true",
                    help="run the FULL corpus (94 projects + 11 SMFs)")
    ap.add_argument("--from-json", default=None,
                    help="re-render the markdown from a prior run's "
                         "checkpoint JSON (no measuring)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.from_json:
        prior = json.loads(Path(args.from_json).read_text())
        platform, preset_rows = prior["platform"], prior["rows"]
    else:
        import jax
        platform = jax.devices()[0].platform
        preset_rows = None
    if args.configs:
        configs = args.configs.split(",")
    elif args.all:
        configs = corpus_configs()
    else:
        configs = DEFAULT_CONFIGS
    rows = preset_rows if preset_rows is not None else []
    jpath = Path(args.out).with_suffix(".json") if args.out \
        else Path(_REPO) / "F64_MATRIX.json"
    for rel in configs if preset_rows is None else []:
        print(f"== {rel}", file=sys.stderr, flush=True)
        try:
            row = measure(rel)
        except NotImplementedError as e:
            row = {"config": rel, "error": f"f64 scope: {e}"}
        except Exception as e:  # keep the matrix going
            row = {"config": rel, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        # incremental checkpoint (full-corpus runs take a while)
        jpath.write_text(json.dumps(
            {"platform": platform, "rows": rows}, indent=1))

    md = [
        "# F64_MATRIX — corpus song-level residuals vs the f64 reference",
        "",
        f"Backend: `{platform}`. Engine render vs tools/f64_reference.py",
        "(serial float64 evaluation of the reference per-sample loop,",
        "sharing the engine's host f32 control constants). dB relative to",
        "the f64 reference's own peak (max(1, peak)).",
        "",
        "| Config | frames | f64 peak | max-abs dBFS | rms dBFS |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            md.append(f"| {r['config']} | — | — | — | {r['error']} |")
        else:
            md.append(f"| {r['config']} | {r['frames']} | {r['ref_peak']} "
                      f"| **{r['max_abs_dbfs']}** | {r['rms_dbfs']} |")
    ok = [r for r in rows if "error" not in r]
    worst = max((r["max_abs_dbfs"] for r in ok), default=0.0)
    over = [r for r in ok if r["max_abs_dbfs"] > -80.0]
    md += [
        "",
        f"**{len(ok)}/{len(rows)} rows measured** "
        f"({len(rows) - len(ok)} errors enumerated above); "
        f"worst max-abs **{worst} dBFS**; rows above the −80 dBFS bar: "
        f"**{len(over)}**.",
        "",
    ]
    noted = [r for r in over if r["config"] in NOTES]
    if noted:
        md += ["## Rows above the bar — measured root causes", ""]
        for r in sorted(noted, key=lambda r: r["max_abs_dbfs"],
                        reverse=True):
            md.append(f"- `{r['config']}` ({r['max_abs_dbfs']} max / "
                      f"{r['rms_dbfs']} rms): {NOTES[r['config']]}")
        md.append("")
    unnoted = [r for r in over if r["config"] not in NOTES]
    if unnoted:
        md += ["## Rows above the bar — UNEXPLAINED", ""]
        for r in unnoted:
            md.append(f"- `{r['config']}`: {r['max_abs_dbfs']} dBFS")
        md.append("")
    out = Path(args.out) if args.out else Path(_REPO) / "F64_MATRIX.md"
    out.write_text("\n".join(md))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

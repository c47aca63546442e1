"""Whole-song rendering.

The reference renders with a per-sample explicit-stack DFS over the entity
graph (orchestration/src/orchestrator.rs:351-470, `gather_audio`) — the
code even notes it should "snapshot it ... and whiz through the snapshot"
(:357-359). This module is that snapshot: the compiled song graph is
traced once into a single XLA program; instruments render as batched note
tensors, effects as vectorized transforms (IIR via associative scans), and
the mix bus as sums. Automation is applied per 64-frame block exactly like
the reference's handle_work cadence, upsampled to per-sample tensors.

Sidechain semantics: the reference's SignalPassthroughController observes
audio during buffer b's gather and emits its control value in the *next*
buffer's handle_work — a one-block delay (orchestrator.rs:631-708 ordering).
Reproduced by shifting the derived per-block curve right by one block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from groove_tpu.compiler.song import CompiledSong, DeviceIR, MAIN_MIXER_UVID
from groove_tpu.core.time import SAMPLE_BUFFER_SIZE
from groove_tpu.models import fm as fm_model
from groove_tpu.models import sampler as sampler_model
from groove_tpu.models import simple as simple_model
from groove_tpu.models import welsh as welsh_model
from groove_tpu.models.voices import (bucket_notes, note_freqs,
                                      scatter_notes, span_for)
from groove_tpu.ops import delayfx, dynamics, effects, iir
from groove_tpu.ops.dca import pan_gains
from groove_tpu.project.schema import warn

BLOCK = SAMPLE_BUFFER_SIZE

# Params the registry lists as controllable (compiler/params.py) but whose
# render reading is static. After round 3 only ONE remains: the toy
# effect's `my-value` has no DSP role at reference HEAD (the toy is the
# negator test entity, util.rs:52-78), so there is nothing for a curve to
# drive; a trip targeting it warns instead of silently pinning the static
# value. Everything else IS automatable: delay time / chorus
# delay-seconds (per-block gather taps), chorus voices (tap loop bound =
# the curve's host maximum, per-block masking), reverb seconds (per-block
# comb feedback gains), FM ratio/depth/beta (per-block coefficients,
# integrated modulator phase), oscillator frequency (host-constant
# integrated phase).
STATIC_ONLY_PARAMS = {
    ("toy", "my-value"),
}

# A sidechain (signal-passthrough) value is a raw ControlValue — the
# source's block-boundary amplitude — with NO compile-time maximum, so
# delay-type seconds it drives clamp to this bound; the streamed engine
# sizes its carried input tails for it host-side. Trip curves are host
# data and keep their exact maxima.
SIDECHAIN_SECONDS_MAX = 1.0


def warn_static_only(dev) -> None:
    for pname in dev.automation:
        if (dev.kind, pname) in STATIC_ONLY_PARAMS:
            warn(f"automation of {dev.kind}.{pname} ({dev.uvid}) is not "
                 f"supported; the static value applies")
    if dev.kind == "oscillator" and "frequency" in dev.automation:
        wf = dev.params.get("waveform", "sine")
        if str(wf) == "noise":
            warn(f"automation of oscillator.frequency ({dev.uvid}) has no "
                 f"effect on the noise waveform; the trip is ignored")


def _upsample_block(curve, n: int):
    """Block-rate curve [n_blocks] -> per-sample [n] by hold.

    broadcast+reshape, NOT jnp.repeat: repeat lowers to a gather on TPU and
    measured ~100 us per call at n=10k — it was the dominant cost of every
    automated parameter in small songs."""
    nb = curve.shape[0]
    out = jnp.broadcast_to(curve[:, None], (nb, BLOCK)).reshape(nb * BLOCK)
    return out[:n]


def host_effect_filter_coefs(dev, nb: int, sr: float):
    """HOST (numpy f32) coefficients of one effect-filter device over nb
    64-frame control blocks, from its static params + trip automation
    curves (both compile-time data). Returns ("lp24", gain, secs) with
    gain [nb] and secs = 2 tuples of 5 [nb] arrays, ("bq", coefs) with a
    5-tuple of [nb] arrays, or None (not a designable filter kind).

    These exact bits feed BOTH the fidelity planner and — for automated
    filters — the render itself (shipped as inputs; see
    iir.lp24_apply_blockrate_sections for why host bits matter on TPU).
    Sidechain-overridden filters never reach this (their cutoffs are
    runtime signals); the caller excludes them.

    Memoized per (DeviceIR instance, nb, sr): the fidelity planner and
    the input collectors of BOTH engines design the same tables at
    startup, and each design evaluates lp24_sections/rbj over [nb]-long
    arrays (tens of thousands of blocks on long songs). Safe because a
    DeviceIR's params/automation are only written during compile_song —
    runtime edits recompile into fresh DeviceIRs."""
    cache = getattr(dev, "_host_coef_cache", None)
    if cache is None:
        cache = {}
        dev._host_coef_cache = cache
    key = (int(nb), float(sr))
    if key not in cache:
        cache[key] = _design_effect_filter_coefs(dev, nb, sr)
    return cache[key]


def _design_effect_filter_coefs(dev, nb: int, sr: float):
    k = dev.kind

    def pb(name, default, d=dev):
        if name in d.automation:
            c = np.asarray(d.automation[name], np.float32)
            if len(c) < nb:
                c = np.pad(c, (0, nb - len(c)), mode="edge")
            return c[:nb]
        return np.full((nb,), d.params.get(name, default), np.float32)

    cutoff = pb("cutoff", 1000.0)
    if k == "filter-low-pass-24db":
        q = np.maximum(pb("passband-ripple", 0.707), np.float32(1e-3))
        gain, secs = iir.lp24_sections(cutoff, q, sr)
        gain = np.broadcast_to(np.asarray(gain, np.float32), (nb,))
        secs = [tuple(np.broadcast_to(np.asarray(c, np.float32), (nb,))
                      for c in sec) for sec in secs]
        return ("lp24", gain, secs)
    mk = {
        "filter-low-pass-12db": iir.rbj_low_pass,
        "filter-high-pass-12db": iir.rbj_high_pass,
        "filter-all-pass-12db": iir.rbj_all_pass,
    }.get(k)
    if mk is not None:
        coefs = mk(cutoff, np.maximum(pb("q", 0.707), np.float32(1e-3)), sr)
    elif k == "filter-band-pass-12db":
        coefs = iir.rbj_band_pass(
            cutoff, np.maximum(pb("bandwidth", 1.0), np.float32(1e-3)), sr)
    elif k == "filter-band-stop-12db":
        coefs = iir.rbj_band_stop(
            cutoff, np.maximum(pb("bandwidth", 1.0), np.float32(1e-3)), sr)
    elif k == "filter-peaking-eq-12db":
        coefs = iir.rbj_peaking_eq(
            cutoff, np.maximum(pb("q", 1.0), np.float32(1e-3)),
            pb("db-gain", 0.0), sr)
    elif k == "filter-low-shelf-12db":
        coefs = iir.rbj_low_shelf(cutoff, pb("db-gain", 0.0), sr)
    elif k == "filter-high-shelf-12db":
        coefs = iir.rbj_high_shelf(cutoff, pb("db-gain", 0.0), sr)
    else:
        return None
    coefs = tuple(np.broadcast_to(np.asarray(c, np.float32), (nb,))
                  for c in coefs)
    return ("bq", coefs)


def compute_filter_fidelity(compiled) -> dict:
    """Host-side fidelity routing for EVERY filter device (the automation
    curves and static params are compile-time data; inside the traced
    program the coefficients are tracers, so `float(a1)`-style checks can
    never fire there — the decision MUST happen here). Returns
    uvid -> "serial" (static deep-corner poles: per-sample scan) or
    "refine" (near-critical poles anywhere on the trajectory, or the
    static high-q resonance band: one parallel defect-correction pass).
    Absent uvids keep the single-pass blocked/Pallas path. Sidechain-
    overridden filters have truly unknowable coefficients and stay on the
    blocked path (documented). Shared by the whole-timeline Renderer and
    the StreamingRenderer."""
    out: dict = {}
    nb = max(1, -(-compiled.n_frames // BLOCK))
    sr = float(compiled.sample_rate)
    sidechain_targets = {tgt for _, tgt, _ in compiled.sidechain}
    for dev in compiled.devices.values():
        k = dev.kind
        if not k.startswith("filter-") or dev.uvid in sidechain_targets:
            continue
        designed = host_effect_filter_coefs(dev, nb, sr)
        if designed is None:
            continue
        if designed[0] == "lp24":
            # OR the two sections per block (leading dims are OR'd by
            # iir.needs_refinement)
            a1 = np.stack([s[3] for s in designed[2]])
            a2 = np.stack([s[4] for s in designed[2]])
        else:
            a1 = np.atleast_1d(designed[1][3])
            a2 = np.atleast_1d(designed[1][4])
        static = not dev.automation
        if static and bool(np.all(a1 < iir._CRITICAL_A1)
                           & np.all(a2 > iir._CRITICAL_A2)):
            out[dev.uvid] = "serial"
        elif iir.needs_refinement(a1, a2):
            out[dev.uvid] = "refine"
            # Residence-based deepening for the NON-Pallas (test) backend:
            # an automated sweep that RESTS in the deep-corner band (the
            # north star's slow-start exponential trip holds ~25 Hz for
            # hundreds of blocks) under-converges through the XLA refined
            # fallback exactly like a parked cascade (-71.6 dBFS measured
            # song-level vs the f64 reference); route it serially when the
            # deep band persists. The fused TPU kernel is accurate there
            # (-95 dBFS on-chip) and keeps the refine path.
            if not iir._pallas_available():
                deep = ((a1 < iir._CRITICAL_A1)
                        & (a2 > iir._CRITICAL_A2)).any(axis=0) \
                    if a1.ndim > 1 else ((a1 < iir._CRITICAL_A1)
                                         & (a2 > iir._CRITICAL_A2))
                run = best = 0
                for d in np.atleast_1d(deep):
                    run = run + 1 if d else 0
                    best = max(best, run)
                if best >= 32:  # >= 46 ms parked in the deep band
                    out[dev.uvid] = "serial"

    return out


class Renderer:
    """Builds and runs the jitted render program for one compiled song."""

    def __init__(self, compiled: CompiledSong):
        self.c = compiled
        self.inputs: dict[str, np.ndarray] = {}
        self._spans: dict[str, int] = {}
        self._buckets: dict[str, list] = {}
        self._filter_modes: dict[str, str] = {}
        self._collect_inputs()
        self._collect_effect_filters()
        self._plan_filters()
        # Pin inputs on-device once; sample tables are tens of MB and must
        # not be re-shipped per render call.
        self.inputs = jax.device_put(self.inputs)
        self._fn = jax.jit(self._render)

    # ---- host-side input collection --------------------------------------

    def _collect_inputs(self) -> None:
        c = self.c
        welsh_devs = []
        for dev in c.devices.values():
            if (dev.role == "instrument" or dev.kind == "calculator") \
                    and dev.notes is not None:
                if dev.kind in ("welsh", "welsh-raw") \
                        and dev.voice is not None and dev.notes.count:
                    welsh_devs.append(dev)
                else:
                    self._collect_instrument(dev)
            warn_static_only(dev)
            for pname, curve in dev.automation.items():
                if dev.kind == "oscillator" and pname == "frequency":
                    # consumed host-side (the integrated-phase constant
                    # in _render_instrument; a no-op for noise) — never
                    # read by the traced program, so don't ship it
                    continue
                self.inputs[f"{dev.uvid}/auto/{pname}"] = curve
        self._collect_welsh_merged(welsh_devs)

    # Welsh merge layout: with WELSH_MERGE_GLOBAL, span buckets are
    # computed over ALL welsh devices' notes together so notes from
    # different instruments share buckets and one cascade launch serves
    # them all; otherwise each device buckets alone (launches never
    # shared). Bucket-count ceilings trade span tightness (wasted
    # samples) against launch floors + HLO size. Interleaved A/B on the
    # v5e (tools/ab_welsh_layout.py, jingle_bells, two rounds): waste
    # dominates — per-device tight buckets beat global sharing (76 ms vs
    # 79-92 ms; global buckets widen every member's span), and a light
    # launch_rows=16 edges out 0 and clearly beats 136 (87 ms). The
    # machinery still renders through the shared packet path so the
    # global mode stays one flag away.
    WELSH_MERGE_GLOBAL = False
    WELSH_GLOBAL_BUCKETS = 12
    WELSH_DEVICE_BUCKETS = 3
    WELSH_LAUNCH_ROWS = 16

    def _collect_welsh_merged(self, devs) -> None:
        """Build the merged-welsh plan (see class attrs above):
        self._wm_plan = [(span, [(uvid, n_rows), ...]), ...]."""
        self._wm_plan: list = []
        if not devs:
            return
        sr = self.c.sample_rate
        if self.WELSH_MERGE_GLOBAL:
            groups, mb = [devs], self.WELSH_GLOBAL_BUCKETS
        else:
            groups, mb = [[d] for d in devs], self.WELSH_DEVICE_BUCKETS
        j = 0
        for grp in groups:
            needs, owner, local, per_dev = [], [], [], {}
            for di, d in enumerate(grp):
                # unison triples the RENDERED notes only (dev.notes stays
                # the true performance — welsh.unison_input_notes)
                k, v, on, off, pv = welsh_model.unison_input_notes(
                    d.notes, d.voice)
                gate = (off - on).astype(np.int64)
                tail = welsh_model.tail_seconds(d.voice)
                needs.append(gate + int(np.ceil(tail * sr)) + 1)
                owner.append(np.full(len(k), di))
                local.append(np.arange(len(k)))
                per_dev[d.uvid] = (k, v, on, gate, pv)
            owner = np.concatenate(owner)
            local = np.concatenate(local)
            buckets = bucket_notes(np.concatenate(needs), self.c.n_frames,
                                   max_buckets=mb,
                                   launch_rows=self.WELSH_LAUNCH_ROWS)
            for span, idx in buckets:
                members = []
                for di, d in enumerate(grp):
                    li = np.sort(local[idx[owner[idx] == di]])
                    if li.size == 0:
                        continue
                    k, v, on, gate, pv = per_dev[d.uvid]
                    b = f"wm/b{j}/{d.uvid}"
                    self.inputs[f"{b}/keys"] = k[li]
                    self.inputs[f"{b}/vels"] = v[li]
                    self.inputs[f"{b}/on"] = on[li]
                    self.inputs[f"{b}/gate"] = gate[li].astype(np.int32)
                    # global note indices within the DEVICE (noise keying
                    # — welsh.render_notes_parts note_ids)
                    self.inputs[f"{b}/ids"] = li.astype(np.int32)
                    if pv is not None:  # glide sources
                        self.inputs[f"{b}/prev"] = pv[li]
                    # HOST control constants (welsh.host_osc_constants /
                    # host_filter_tables): backend-independent bits the
                    # traced program consumes verbatim
                    hc = welsh_model.host_osc_constants(
                        d.voice, k[li], None if pv is None else pv[li])
                    hc.update(welsh_model.host_gate_seconds(gate[li], sr))
                    tabs = welsh_model.host_filter_tables(
                        d.voice, gate[li], int(span), sr)
                    if tabs is not None:
                        hc.update(tabs)
                    php = welsh_model.host_pitch_phases(
                        d.voice, k[li], None if pv is None else pv[li],
                        int(span), sr)
                    if php is not None:
                        hc.update(php)
                    lvt = welsh_model.host_lfo_table(d.voice, int(span), sr)
                    if lvt is not None:
                        hc.update(lvt)
                    for name, arr in hc.items():
                        self.inputs[f"{b}/hc/{name}"] = arr
                    members.append((d.uvid, int(li.size)))
                self._wm_plan.append((int(span), members))
                j += 1

    def _collect_effect_filters(self) -> None:
        """Ship HOST-designed coefficient arrays for every AUTOMATED,
        non-sidechain-overridden effect filter (host_effect_filter_coefs):
        the traced program consumes the numpy f32 bits verbatim instead of
        re-deriving tan/cos on its backend. Static filters already design
        host-side (float params take the numpy path in ops/iir); sidechain
        targets keep the traced path (runtime cutoffs)."""
        nb = max(1, -(-self.c.n_frames // BLOCK))
        sr = float(self.c.sample_rate)
        sidechain_targets = {tgt for _, tgt, _ in self.c.sidechain}
        for dev in self.c.devices.values():
            if not dev.kind.startswith("filter-") or not dev.automation \
                    or dev.uvid in sidechain_targets:
                continue
            designed = host_effect_filter_coefs(dev, nb, sr)
            if designed is None:
                continue
            u = dev.uvid
            if designed[0] == "lp24":
                self.inputs[f"{u}/fc/gain"] = designed[1]
                self.inputs[f"{u}/fc/secs"] = np.stack(
                    [np.stack(sec) for sec in designed[2]])  # [2, 5, nb]
            else:
                self.inputs[f"{u}/fc/coefs"] = np.stack(designed[1])

    def _collect_instrument(self, dev: DeviceIR) -> None:
        notes = dev.notes
        if notes.count == 0:
            return
        sr = self.c.sample_rate
        gate = notes.off_frames - notes.on_frames
        max_gate = int(gate.max()) if notes.count else 0
        if dev.kind in ("welsh", "welsh-raw") and dev.voice is not None:
            tail = welsh_model.tail_seconds(dev.voice)
        elif dev.kind == "fm-synthesizer":
            tail = fm_model.tail_seconds(dev.voice)
        elif dev.kind in ("drumkit", "calculator"):
            # one-shots play to the sample end regardless of gate
            tail = float(dev.sample_table.lengths.max()) / sr
        elif dev.kind == "sampler":
            tail = 0.0
        elif dev.kind == "envelope":
            tail = float(dev.params.get("release", 0.0))
        else:
            tail = 0.0
        span = span_for(max_gate, tail, sr)
        # A note window never usefully exceeds the timeline: everything past
        # n_frames is cropped by scatter_notes. perf-1's piano (release 0.67s)
        # otherwise renders a 30k-sample window into a 10k-frame song.
        span = min(span, -(-self.c.n_frames // 128) * 128)
        self._spans[dev.uvid] = span
        u = dev.uvid
        # welsh devices never reach here (they collect through
        # _collect_welsh_merged); FM keeps per-device span buckets
        if dev.kind == "fm-synthesizer" and dev.voice is not None:
            # span buckets: one drone note must not force every short note
            # to render a full-length window (see voices.bucket_notes)
            need = gate.astype(np.int64) + int(np.ceil(tail * sr)) + 1
            buckets = bucket_notes(need, self.c.n_frames,
                                   launch_rows=self.WELSH_LAUNCH_ROWS)
            self._buckets[u] = [s for s, _ in buckets]
            for j, (bspan, idx) in enumerate(buckets):
                self.inputs[f"{u}/b{j}/keys"] = notes.keys[idx]
                self.inputs[f"{u}/b{j}/vels"] = notes.vels[idx]
                self.inputs[f"{u}/b{j}/on"] = notes.on_frames[idx]
                self.inputs[f"{u}/b{j}/gate"] = gate[idx].astype(np.int32)
                # global note indices: noise keying must be invariant to
                # the bucket partition (welsh.render_notes note_ids)
                self.inputs[f"{u}/b{j}/ids"] = idx.astype(np.int32)
                # HOST carrier frequencies (numpy note_freqs — backend-
                # independent bits; a traced exp2's ulp drifts multi-
                # second FM phases to ~-44 dB; fm._voices_at freqs)
                self.inputs[f"{u}/b{j}/hc/f1"] = np.asarray(
                    note_freqs(np.asarray(notes.keys[idx])), np.float32)
                if "ratio" not in dev.automation:
                    # mod-1-reduced phase tables (fm.host_phases)
                    # per-BUCKET span: render time evaluates bucket j at
                    # self._buckets[u][j], so the phase tables must match
                    # that length, not the device-global span (a drone +
                    # short-note FM song otherwise ships [n, global_span]
                    # tables into a short-bucket render and the traced
                    # mul fails shape checking)
                    php = fm_model.host_phases(
                        dev.voice, notes.keys[idx], int(bspan), float(sr))
                    if php is not None:
                        for nm, arr in php.items():
                            self.inputs[f"{u}/b{j}/hc/{nm}"] = arr
            return
        self.inputs[f"{u}/keys"] = notes.keys
        self.inputs[f"{u}/vels"] = notes.vels
        self.inputs[f"{u}/on"] = notes.on_frames
        self.inputs[f"{u}/gate"] = gate.astype(np.int32)
        if dev.kind == "envelope":
            # host tone frequencies (simple.envelope_instrument freqs)
            self.inputs[f"{u}/hc/f1"] = np.asarray(
                note_freqs(np.asarray(notes.keys)), np.float32)
        if dev.sample_table is not None:
            self.inputs[f"{u}/table"] = dev.sample_table.data
            self.inputs[f"{u}/lengths"] = dev.sample_table.lengths
            self.inputs[f"{u}/rates"] = dev.sample_table.rates
            self.inputs[f"{u}/slots"] = dev.slots
            if dev.kind == "sampler":
                self.inputs[f"{u}/ratios"] = np.asarray(
                    sampler_model.sampler_ratios(
                        notes.keys, float(dev.params.get("root", 440.0))
                    ),
                    np.float32,
                )
            if (dev.kind == "drumkit"
                    and all(int(x) == sr for x in dev.sample_table.rates)):
                from groove_tpu.ops import pallas_drums as pd
                ptable = pd.prepare_table(dev.sample_table.data)
                one_shot = np.full(notes.count, 2**30, np.int64)
                meta = pd.prepare_hits(
                    dev.slots, notes.on_frames, one_shot, notes.vels,
                    dev.sample_table.lengths, self.c.n_frames,
                )
                self.inputs[f"{u}/ptable"] = ptable
                for name, arr in zip(
                    ("hcounts", "hslots", "hstarts", "hshifts", "hlimits",
                     "hvels"),
                    meta,
                ):
                    self.inputs[f"{u}/{name}"] = arr

    # ---- traced render ----------------------------------------------------

    # Cap on notes-per-batch x span elements: bounds peak memory of the
    # voice pipelines (a 1300-note channel of a long MIDI file would
    # otherwise materialize ~0.5 GB per intermediate). On TPU the cap is
    # 12x higher: the fused cascade kernel's serial phase is a per-LAUNCH
    # floor (~8 ms at span 178k) with only ~61 us marginal cost per row,
    # so splitting a bucket into chunks pays one floor per chunk — the
    # cap must admit a whole bucket-x-fidelity group in ONE launch
    # (jingle's merged serial group: 762 rows x 190464 = 145M elems).
    # 192M elems x ~5 live intermediates x 4 B ~= 4 GB, inside the v5e's
    # 16 GB HBM. The CPU (test) backend keeps 16M so golden ulps and
    # host memory stay stable there.
    NOTE_CHUNK_ELEMS = 16_000_000

    @property
    def _note_chunk_elems(self) -> int:
        return (self.NOTE_CHUNK_ELEMS if jax.default_backend() == "cpu"
                else 12 * self.NOTE_CHUNK_ELEMS)

    # host_ctl entries that are PER-NOTE rows (chunk with the note batch);
    # the rest (coefficient tables) pass through whole. Single source of
    # truth lives with the producers (models/welsh.py).
    _CTL_PER_NOTE = welsh_model.HOST_CTL_PER_NOTE

    def _chunked_mono(self, render_fn, keys, vels, gate, on, ids, span: int,
                      n: int, prev=None, ctl=None):
        """Render note batches in chunks and scatter-sum into the timeline.

        Chunks run under lax.scan so the HLO holds ONE voice-pipeline
        instance however many chunks a long song needs (a Python loop
        duplicated the pipeline per chunk and overwhelmed the remote
        compiler on 2,400-note SMF imports). Padding notes are silent
        (velocity 0). render_fn(keys, vels, gate, on, ids, prev, ctl):
        prev (optional glide-source keys) chunks alongside — padded rows
        get prev == keys == 0 (ratio 1, no glide) — and ctl (optional
        host-control dict, welsh.host_osc_constants/host_filter_tables)
        has its per-note rows chunked while coefficient tables pass
        through whole."""
        ctl = dict(ctl) if ctl else None
        count = keys.shape[0]
        per_chunk = max(1, self._note_chunk_elems // max(span, 1))
        if count <= per_chunk:
            return scatter_notes(
                render_fn(keys, vels, gate, on, ids, prev, ctl), on, n)
        n_chunks = -(-count // per_chunk)
        padn = n_chunks * per_chunk - count

        def chunk(c, fill=0):
            pad = [(0, padn)] + [(0, 0)] * (jnp.ndim(c) - 1)
            return jnp.pad(c, pad, constant_values=fill).reshape(
                (n_chunks, per_chunk) + c.shape[1:])

        cols = [chunk(c) for c in (keys, vels, gate, on, ids)]
        cols.append(None if prev is None else chunk(prev))
        ctl_chunked = None
        if ctl:
            # padded rows must keep a glide ratio of 1 (log(0) is -inf)
            ctl_chunked = {name: chunk(ctl.pop(name),
                                       fill=1 if name == "rgl" else 0)
                           for name in self._CTL_PER_NOTE if name in ctl}

        def body(mono, xs):
            k, v, g, o, i, pr, cc = xs
            hc = None
            if cc is not None:
                hc = dict(ctl)  # whole tables (closure constants)
                hc.update(cc)
            notes = render_fn(k, v, g, o, i, pr, hc)
            return mono + scatter_notes(notes, o, n), None

        mono0 = jnp.zeros((n,), jnp.float32)
        mono, _ = jax.lax.scan(body, mono0, tuple(cols) + (ctl_chunked,))
        return mono

    def _render_welsh_merged(self, inputs, n: int, only=None) -> dict:
        """uvid -> mono [n] for every merged welsh device. Per span
        bucket and fidelity group, members pack into packets bounded by
        the chunk element cap; each packet runs its members'
        render_notes_parts, concatenates rows, and pays ONE cascade
        launch. A member too big for any packet falls back to the
        per-device chunked scan (bounded memory, one pipeline in HLO).
        only: restrict to one uvid (per-device profiling breakdowns)."""
        monos: dict = {}
        sr = float(self.c.sample_rate)
        cap = self._note_chunk_elems
        for j, (span, members) in enumerate(self._wm_plan):
            groups: dict = {}
            for uvid, count in members:
                if only is not None and uvid != only:
                    continue
                monos.setdefault(uvid, jnp.zeros((n,), jnp.float32))
                mode = self._welsh_refine.get(uvid, False)
                fid = mode if isinstance(mode, str) \
                    else ("refine" if mode else None)
                # host coefficient tables vs traced controls can't share
                # a cascade launch (different coefficient plumbing), so
                # table presence joins the packet grouping key
                has_tab = f"wm/b{j}/{uvid}/hc/fgain" in inputs
                groups.setdefault((fid, has_tab), []).append((uvid, count))
            for (fid, _has_tab), mem in groups.items():
                packet, rows = [], 0
                for uvid, count in mem:
                    if count * span > cap:
                        # oversize member: per-device chunked fallback
                        b = f"wm/b{j}/{uvid}"
                        dev = self.c.devices[uvid]
                        rf = self._welsh_refine.get(uvid, False)
                        hc = self._hc_for(inputs, b)
                        mono = self._chunked_mono(
                            lambda k, v, g, o, i, pr, hc_, s=span,
                            p=dev.voice, rf_=rf:
                            welsh_model.render_notes(
                                p, k, v, g, s, sr, refine_filter=rf_,
                                note_ids=i, prev_keys=pr, host_ctl=hc_),
                            inputs[f"{b}/keys"], inputs[f"{b}/vels"],
                            inputs[f"{b}/gate"], inputs[f"{b}/on"],
                            inputs[f"{b}/ids"], span, n,
                            prev=inputs.get(f"{b}/prev"), ctl=hc,
                        )
                        monos[uvid] = monos[uvid] + mono
                        continue
                    if rows and (rows + count) * span > cap:
                        self._cascade_packet(
                            inputs, j, span, packet, fid, n, monos)
                        packet, rows = [], 0
                    packet.append((uvid, count))
                    rows += count
                if packet:
                    self._cascade_packet(
                        inputs, j, span, packet, fid, n, monos)
        return monos

    def _hc_for(self, inputs, b: str):
        """Collect a note batch's shipped host-control arrays (see
        welsh.host_osc_constants/host_filter_tables)."""
        prefix = f"{b}/hc/"
        hc = {k[len(prefix):]: inputs[k]
              for k in inputs if k.startswith(prefix)}
        return hc or None

    def _cascade_packet(self, inputs, j: int, span: int, packet, fid,
                        n: int, monos) -> None:
        sr = float(self.c.sample_rate)
        oss, filts, amps, ons = [], [], [], []
        for uvid, _count in packet:
            dev = self.c.devices[uvid]
            b = f"wm/b{j}/{uvid}"
            o, filt, am = welsh_model.render_notes_parts(
                dev.voice, inputs[f"{b}/keys"], inputs[f"{b}/vels"],
                inputs[f"{b}/gate"], span, sr,
                note_ids=inputs[f"{b}/ids"],
                prev_keys=inputs.get(f"{b}/prev"),
                host_ctl=self._hc_for(inputs, b),
            )
            oss.append(o)
            filts.append(filt)
            amps.append(am)
            ons.append(inputs[f"{b}/on"])
        kind = filts[0][0]  # packet members share it (the grouping key)
        if len(oss) == 1:
            osc, filt = oss[0], filts[0]
        else:
            osc = jnp.concatenate(oss)
            if kind == "secs":
                gain = jnp.concatenate([f[1] for f in filts])
                secs = [tuple(jnp.concatenate([f[2][i][c] for f in filts])
                              for c in range(5)) for i in range(2)]
                filt = ("secs", gain, secs)
            else:
                filt = ("hz", jnp.concatenate([f[1] for f in filts]),
                        jnp.concatenate([f[2] for f in filts]))
        y = welsh_model.apply_cascade(osc, filt, sr, fidelity=fid)
        r0 = 0
        for (uvid, count), am, on in zip(packet, amps, ons):
            mono = scatter_notes(y[r0:r0 + count] * am, on, n)
            monos[uvid] = monos[uvid] + mono
            r0 += count

    def _plan_filters(self) -> None:
        self._filter_modes = compute_filter_fidelity(self.c)
        # welsh internal-cascade fidelity modes (host decision: the traced
        # per-note coefficients can't be inspected in-graph). "serial" on
        # non-Pallas backends for deep-corner parked cascades
        # (welsh.filter_fidelity_mode).
        sr = float(self.c.sample_rate)
        self._welsh_refine = {
            dev.uvid: welsh_model.filter_fidelity_mode(dev.voice, sr)
            for dev in self.c.devices.values()
            if dev.kind in ("welsh", "welsh-raw") and dev.voice is not None
        }

    def _param(self, inputs, dev: DeviceIR, name: str, default: float,
               n: int, override=None):
        """Per-sample [n] array if automated/overridden, else a scalar."""
        if override is not None:
            return override
        key = f"{dev.uvid}/auto/{name}"
        if key in inputs:
            return _upsample_block(inputs[key], n)
        return float(dev.params.get(name, default))

    def _render_instrument(self, inputs, dev: DeviceIR, n: int,
                           welsh_monos=None):
        u = dev.uvid
        sr = float(self.c.sample_rate)
        if dev.kind == "oscillator":
            from groove_tpu.ops import oscillator as osc_ops
            wf, pw = osc_ops.parse_waveform(dev.params)
            if "frequency" in dev.automation and wf != "noise":
                # automated frequency: host-constant integrated phase
                phase = simple_model.oscillator_phase_automated(
                    dev.automation["frequency"], n, sr
                )
                if wf == "pulse-width":
                    mono = osc_ops.pulse_width(phase, pw)
                else:
                    mono = osc_ops.evaluate(str(wf), phase)
                return jnp.stack([mono, mono])
            freq = float(dev.params.get("frequency", 440.0))
            if wf == "pulse-width":
                # host time base: keeps edges jit/eager-identical (see
                # welsh.render_notes)
                t = jnp.asarray(np.arange(n, dtype=np.float32)
                                / np.float32(sr))
                mono = osc_ops.pulse_width(freq * t, pw)
            else:
                mono = simple_model.oscillator_instrument(str(wf), freq, n,
                                                          sr)
            return jnp.stack([mono, mono])
        if dev.kind == "toy-instrument":
            mono = simple_model.toy_instrument(
                float(dev.params.get("fake-value", 0.0)), n
            )
            return jnp.stack([mono, mono])

        if dev.notes is None or dev.notes.count == 0:
            return jnp.zeros((2, n), jnp.float32)

        if dev.kind in ("welsh", "welsh-raw", "fm-synthesizer"):
            if dev.voice is None:
                return jnp.zeros((2, n), jnp.float32)
            if dev.kind in ("welsh", "welsh-raw"):
                # rendered by the cross-device merged-cascade stage
                # (_render_welsh_merged), one launch per span bucket
                if welsh_monos is None:  # standalone (profiling breakdowns)
                    welsh_monos = self._render_welsh_merged(inputs, n, only=u)
                mono = welsh_monos.get(u, jnp.zeros((n,), jnp.float32))
            else:
                # ratio/depth/beta automation: per-block coefficients
                # sliced at each note's absolute position (item 10)
                ac = {nm: inputs[f"{u}/auto/{nm}"]
                      for nm in ("ratio", "depth", "beta")
                      if f"{u}/auto/{nm}" in inputs}
                render = (lambda p_, k, v, g, o, i_, s_, sr_, fr_, ph_,
                          ac_=ac:
                          fm_model.render_notes(
                              p_, k, v, g, s_, sr_, on_frames=o,
                              ratio_b=ac_.get("ratio"),
                              depth_b=ac_.get("depth"),
                              beta_b=ac_.get("beta"), freqs=fr_,
                              phases=ph_))
                mono = jnp.zeros((n,), jnp.float32)
                for j, span in enumerate(self._buckets[u]):
                    mono = mono + self._chunked_mono(
                        lambda k, v, g, o, i, pr, hc, s=span:
                        render(dev.voice, k, v, g, o, i, s, sr,
                               None if hc is None else hc.get("f1"),
                               hc if hc and "phm" in hc else None),
                        inputs[f"{u}/b{j}/keys"], inputs[f"{u}/b{j}/vels"],
                        inputs[f"{u}/b{j}/gate"], inputs[f"{u}/b{j}/on"],
                        inputs[f"{u}/b{j}/ids"],
                        span, n,
                        ctl=self._hc_for(inputs, f"{u}/b{j}"),
                    )
            if dev.kind == "fm-synthesizer":
                pan = self._param(inputs, dev, "pan", dev.voice.pan, n)
                g = self._param(inputs, dev, "gain", dev.voice.gain, n)
                left, right = pan_gains(pan)
                return jnp.stack([mono * left * g, mono * right * g])
            # voice DCA (patch-derived gain 1 / pan 0) then synth DCA with
            # possible pan/gain automation (patches.rs:160-168 has both).
            lv, rv = pan_gains(0.0)
            pan = self._param(inputs, dev, "pan", 0.0, n)
            g = self._param(inputs, dev, "gain", 1.0, n)
            ls, rs = pan_gains(pan)
            return jnp.stack([mono * lv * ls * g, mono * rv * rs * g])

        span = self._spans[u]
        keys, vels = inputs[f"{u}/keys"], inputs[f"{u}/vels"]
        on, gate = inputs[f"{u}/on"], inputs[f"{u}/gate"]
        if dev.kind in ("drumkit", "sampler", "calculator"):
            if dev.kind in ("drumkit", "calculator"):
                gate_eff = jnp.full_like(gate, span)  # one-shot
                ratios = inputs.get(f"{u}/ratios")
            else:
                gate_eff = gate
                ratios = inputs[f"{u}/ratios"]
            # fast path: unity-ratio playback at matching sample rate sums
            # hits straight into the timeline (no per-note windows)
            if dev.kind == "drumkit" and all(
                int(r) == self.c.sample_rate for r in dev.sample_table.rates
            ):
                if f"{u}/ptable" in inputs and iir._pallas_available():
                    # chunked-grid kernel: VMEM timeline chunks with DMA'd
                    # sample rows; unbounded song length (halo accumulator
                    # carries rows across chunk edges)
                    from groove_tpu.ops.pallas_drums import (
                        accumulate_oneshots_pallas,
                    )
                    return accumulate_oneshots_pallas(
                        inputs[f"{u}/ptable"], inputs[f"{u}/hcounts"],
                        inputs[f"{u}/hslots"], inputs[f"{u}/hstarts"],
                        inputs[f"{u}/hshifts"], inputs[f"{u}/hlimits"],
                        inputs[f"{u}/hvels"], n_frames=n,
                    )
                return sampler_model.accumulate_oneshots(
                    inputs[f"{u}/table"], inputs[f"{u}/lengths"],
                    inputs[f"{u}/slots"], on, gate_eff, vels, n,
                )
            else:
                if ratios is None:
                    ratios = jnp.ones((dev.notes.count,), jnp.float32)
                stereo_notes = sampler_model.render_notes(
                    inputs[f"{u}/table"], inputs[f"{u}/lengths"],
                    inputs[f"{u}/rates"], inputs[f"{u}/slots"],
                    ratios, gate_eff, vels, span, sr,
                )
            return scatter_notes(stereo_notes, on, n)
        if dev.kind == "envelope":
            adsr = (
                float(dev.params.get("attack", 0.0)),
                float(dev.params.get("decay", 0.0)),
                float(dev.params.get("sustain", 1.0)),
                float(dev.params.get("release", 0.0)),
            )
            mono_notes = simple_model.envelope_instrument(
                adsr, keys, vels, gate, span, sr,
                freqs=inputs.get(f"{u}/hc/f1")
            )
            mono = scatter_notes(mono_notes, on, n)
            return jnp.stack([mono, mono])
        warn(f"unknown instrument kind {dev.kind}; silent")
        return jnp.zeros((2, n), jnp.float32)

    def _apply_effect(self, inputs, dev: DeviceIR, x, n: int, overrides):
        sr = float(self.c.sample_rate)
        k = dev.kind
        P = lambda name, default, ov=None: self._param(  # noqa: E731
            inputs, dev, name, default, n,
            override=overrides.get((dev.uvid, name)) if ov is None else ov,
        )
        if k == "mixer" or k == "signal-passthrough-controller":
            return x
        if k == "gain":
            return effects.gain(x, P("ceiling", 1.0))
        if k == "limiter":
            return effects.limiter(x, P("minimum", 0.0), P("maximum", 1.0))
        if k == "bitcrusher":
            bits = overrides.get((dev.uvid, "bits-to-crush"))
            if bits is None:
                key = f"{dev.uvid}/auto/bits-to-crush"
                if key in inputs:
                    bits = _upsample_block(inputs[key], n)
                else:
                    bits = float(dev.params.get("bits", 8))
            return effects.bitcrusher(x, bits)
        if k == "compressor":
            thr = P("threshold", 1.0)
            ratio = P("ratio", 1.0)
            # attack/release may be automated (registry lists them as
            # controllable); an automated trip yields a per-sample array
            # and drives the time-varying follower in compressor_smoothed.
            # Sidechain-driven SECONDS clamp to the engine bound like the
            # delay-type params (the follower's memory must be boundable
            # host-side for the mesh renderer's relaxation count).
            att = overrides.get((dev.uvid, "attack"))
            att = (jnp.clip(att, 0.0, SIDECHAIN_SECONDS_MAX)
                   if att is not None else P("attack", 0.0))
            rel = overrides.get((dev.uvid, "release"))
            rel = (jnp.clip(rel, 0.0, SIDECHAIN_SECONDS_MAX)
                   if rel is not None else P("release", 0.0))
            if isinstance(att, float) and isinstance(rel, float) \
                    and att <= 0.0 and rel <= 0.0:
                return dynamics.compressor(x, thr, ratio)
            return dynamics.compressor_smoothed(x, thr, ratio, att, rel, sr)
        if k == "delay":
            # a sidechain override is a 64-sample hold, so [::BLOCK]
            # recovers its block-rate curve (cf. the filter PB below);
            # it wins over a trip curve like every other param
            ov = overrides.get((dev.uvid, "delay"))
            if ov is not None:
                return delayfx.delay_automated(
                    x, jnp.clip(ov[::BLOCK], 0.0, SIDECHAIN_SECONDS_MAX),
                    sr)
            key = f"{dev.uvid}/auto/delay"
            if key in inputs:
                # automated delay TIME: per-block gather taps
                # (delayfx.delay_automated; VERDICT r2 item 10)
                return delayfx.delay_automated(x, inputs[key], sr)
            return delayfx.delay(x, float(dev.params.get("delay", 0.0)), sr)
        if k == "chorus":
            dkey = f"{dev.uvid}/auto/delay-seconds"
            vkey = f"{dev.uvid}/auto/voices"
            ov_d = overrides.get((dev.uvid, "delay-seconds"))
            ov_v = overrides.get((dev.uvid, "voices"))
            if ov_d is not None or ov_v is not None \
                    or dkey in inputs or vkey in inputs:
                # automated total delay and/or tap count: per-block
                # gather taps; the tap loop bound is the voices curve's
                # HOST maximum for a trip, the configured static count
                # for a sidechain (its value has no host maximum)
                if ov_v is not None:
                    voices_b = ov_v[::BLOCK]
                    maxv = max(1, int(dev.params.get("voices", 1)))
                elif vkey in inputs:
                    voices_b = inputs[vkey]
                    maxv = delayfx.chorus_curve_max_voices(
                        dev.automation["voices"])
                else:
                    voices_b, maxv = None, None
                if ov_d is not None:
                    delay_b = jnp.clip(
                        ov_d[::BLOCK], 0.0, SIDECHAIN_SECONDS_MAX)
                elif dkey in inputs:
                    delay_b = inputs[dkey]
                else:
                    delay_b = float(dev.params.get("delay-seconds", 0.0))
                return delayfx.chorus_automated(
                    x, int(dev.params.get("voices", 1)), delay_b,
                    sr, wet_dry_mix=P("wet-dry-mix", 1.0),
                    voices_b=voices_b, max_voices=maxv,
                )
            return delayfx.chorus(
                x, int(dev.params.get("voices", 1)),
                float(dev.params.get("delay-seconds", 0.0)), sr,
                wet_dry_mix=P("wet-dry-mix", 1.0),
            )
        if k == "reverb":
            # attenuation is a plain output gain (per-sample); `seconds`
            # drives the comb feedback gains at block cadence when
            # automated (delayfx.reverb_automated) or sidechain-driven
            ov = overrides.get((dev.uvid, "seconds"))
            if ov is not None:
                return delayfx.reverb_automated(
                    x, P("attenuation", 1.0), ov[::BLOCK], sr,
                )
            key = f"{dev.uvid}/auto/seconds"
            if key in inputs:
                return delayfx.reverb_automated(
                    x, P("attenuation", 1.0), inputs[key], sr,
                )
            return delayfx.reverb(
                x, P("attenuation", 1.0),
                float(dev.params.get("seconds", 0.0)), sr,
            )
        if k == "toy":
            return simple_model.toy_effect(x)
        if k.startswith("filter-"):
            # Coefficients at the reference's 64-frame control cadence
            # (orchestrator.rs:631-708): automation curves are block-rate
            # already, so no per-sample upsample or per-sample tan/sin.
            # A sidechain override (per-sample) falls back to upsampling
            # its curve back to block rate via every 64th sample.
            fidelity = self._filter_modes.get(dev.uvid)
            # automated filters: HOST-designed coefficient arrays
            # (_collect_effect_filters) — backend-independent bits
            if f"{dev.uvid}/fc/secs" in inputs:
                fs = inputs[f"{dev.uvid}/fc/secs"]
                return iir.lp24_apply_blockrate_sections(
                    x, inputs[f"{dev.uvid}/fc/gain"],
                    [tuple(fs[i, j] for j in range(5)) for i in range(2)],
                    fidelity=fidelity)
            if f"{dev.uvid}/fc/coefs" in inputs:
                co = inputs[f"{dev.uvid}/fc/coefs"]
                return iir.biquad_blockrate(
                    x, tuple(co[j] for j in range(5)), fidelity=fidelity)

            def PB(name, default):
                ov = overrides.get((dev.uvid, name))
                if ov is not None:
                    # per-sample override is a 64-sample hold: the first
                    # sample of each block recovers the block value, and
                    # [::BLOCK] has exactly ceil(n/BLOCK) entries
                    return ov[::BLOCK]
                key = f"{dev.uvid}/auto/{name}"
                if key in inputs:
                    return inputs[key]
                return float(dev.params.get(name, default))

            def fmax(v, lo):
                # host max for static params keeps the coefficient design
                # on the numpy path (backend-independent bits); traced
                # values (sidechain overrides) stay traced
                return max(v, lo) if isinstance(v, float) \
                    else jnp.maximum(v, lo)

            cutoff = PB("cutoff", 1000.0)
            if k == "filter-low-pass-24db":
                q = PB("passband-ripple", 0.707)
                return iir.lp24_apply_blockrate(
                    x, cutoff, fmax(q, 1e-3), sr, fidelity=fidelity
                )
            if k == "filter-low-pass-12db":
                coefs = iir.rbj_low_pass(cutoff, fmax(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-high-pass-12db":
                coefs = iir.rbj_high_pass(cutoff, fmax(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-all-pass-12db":
                coefs = iir.rbj_all_pass(cutoff, fmax(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-band-pass-12db":
                coefs = iir.rbj_band_pass(
                    cutoff, fmax(PB("bandwidth", 1.0), 1e-3), sr
                )
            elif k == "filter-band-stop-12db":
                coefs = iir.rbj_band_stop(
                    cutoff, fmax(PB("bandwidth", 1.0), 1e-3), sr
                )
            elif k == "filter-peaking-eq-12db":
                coefs = iir.rbj_peaking_eq(
                    cutoff, fmax(PB("q", 1.0), 1e-3), PB("db-gain", 0.0), sr
                )
            elif k == "filter-low-shelf-12db":
                coefs = iir.rbj_low_shelf(cutoff, PB("db-gain", 0.0), sr)
            elif k == "filter-high-shelf-12db":
                coefs = iir.rbj_high_shelf(cutoff, PB("db-gain", 0.0), sr)
            else:
                warn(f"unknown filter kind {k}; passthrough")
                return x
            return iir.biquad_blockrate(x, coefs, fidelity=fidelity)
        warn(f"unknown effect kind {k}; passthrough")
        return x

    def _render(self, inputs):
        c = self.c
        n = c.n_frames
        outputs: dict[str, jnp.ndarray] = {}
        node_input: dict[str, jnp.ndarray] = {}
        overrides: dict[tuple, jnp.ndarray] = {}
        sidechain_by_src = {}
        for src, tgt, pname in c.sidechain:
            sidechain_by_src.setdefault(src, []).append((tgt, pname))
        sends_by_aux = {}
        for src, aux, amount in c.sends:
            sends_by_aux.setdefault(aux, []).append((src, amount))

        welsh_monos = self._render_welsh_merged(inputs, n)
        for uvid in c.order:
            dev = c.devices[uvid]
            if dev.role == "instrument" or dev.kind == "calculator":
                # calculator: controller+instrument hybrid (entities.rs:88-89)
                outputs[uvid] = self._render_instrument(
                    inputs, dev, n, welsh_monos)
                continue
            sources = c.sinks.get(uvid, [])
            acc = jnp.zeros((2, n), jnp.float32)
            for s in sources:
                if s in outputs:
                    acc = acc + outputs[s]
            for s, amount in sends_by_aux.get(uvid, []):
                if s in outputs:
                    acc = acc + amount * outputs[s]  # BusRoute send
            node_input[uvid] = acc
            if dev.role == "controller" and dev.kind != "signal-passthrough-controller":
                continue  # non-audio controllers have no audio output
            outputs[uvid] = self._apply_effect(inputs, dev, acc, n, overrides)
            if uvid in sidechain_by_src:
                # last sample of block b-1 -> control value for block b
                last = acc[:, BLOCK - 1::BLOCK]           # [2, n_blocks]
                val = jnp.abs(jnp.mean(last, axis=0))
                val = jnp.concatenate([jnp.zeros(1, val.dtype), val[:-1]])
                per_sample = _upsample_block(val, n)
                for tgt, pname in sidechain_by_src[uvid]:
                    # ControlValue -> DOMAIN units, like every other
                    # control route (trips/LFO/trigger apply to_domain at
                    # compile; the raw Normal fed 0-bit crushes / 0..1 Hz
                    # cutoffs to non-Identity params)
                    from groove_tpu.compiler import params as param_mod
                    p = param_mod.resolve(self.c.devices[tgt].kind, pname)
                    overrides[(tgt, pname)] = (
                        param_mod.to_domain_array(p, per_sample)
                        if p is not None else per_sample)

        out = outputs.get(MAIN_MIXER_UVID, jnp.zeros((2, n), jnp.float32))
        return out.T  # [n, 2]

    # ---- public -----------------------------------------------------------

    def render(self) -> np.ndarray:
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.float32)
        return np.asarray(self._fn(self.inputs))

    def render_quantized(self) -> np.ndarray:
        """int16 render with the WAV quantization done ON DEVICE
        (io.wav.quantize_16bit_device — bitwise the host writers' spec,
        so the WAV bytes are unchanged). Halves the device->host fetch,
        which dominates end-to-end time on this machine's ~30 MB/s
        tunnel; the CLI uses it for --wav renders. The quantizer runs as
        a SEPARATE program on the float render's device output — fusing
        it into the render program lets XLA re-fuse the tail and shift
        knife-edge samples by 1 ulp (measured: 12/496k samples on the
        delay demo)."""
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.int16)
        from groove_tpu.io.wav import quantize_16bit_jit

        return np.asarray(quantize_16bit_jit(self._fn(self.inputs)))

    def render_device(self) -> jnp.ndarray:
        """Device-resident render (no host copy), for benchmarking."""
        return self._fn(self.inputs)


def render_song(compiled: CompiledSong) -> np.ndarray:
    return Renderer(compiled).render()

"""Streaming segmented render + loop-range playback.

The reference renders incrementally: `Orchestrator::tick` fills one sample
slice at a time, carrying all entity state in the object graph, and — when
a loop range is set — seeks the clock back to the loop start on crossing
the end (orchestration/src/orchestrator.rs:855-877). The whole-timeline
Renderer (engine/render.py) compiles the song into ONE program instead,
which is the fast path but binds device memory to the song length.

StreamingRenderer is the TPU-native tick loop: the song renders in
fixed-size segments through ONE jitted step function with an explicit
carried-state pytree (filter states, delay-line tails, follower states,
the sidechain one-block value). Segment boundaries are invisible in the
output: every stateful op comes from ops/stream.py, whose float schedule
is segmentation-invariant for 64-frame-multiple segments, so rendering the
song as ONE segment and as MANY segments is bit-identical
(tests/test_stream.py) — an unbounded song streams with device memory
bounded by the segment size plus carried state. (Always-on oscillator
tracks are HOST-resident and shipped as per-segment slices in the step's
xs; block-rate automation curves stay device-resident at 1/64 of the
frame count — the one remaining linear-in-length device buffer.)

Loop-range seek rides the same machinery: play [0, loop_end), then
repeatedly [loop_start, loop_end), state (reverb tails, filter ring-out)
carrying ACROSS the seam exactly like the reference's clock seek — loop
boundaries quantize to the 64-frame buffer grid, the reference's own seek
granularity (it checks `clock.beats() >= range.end` once per tick batch).
Notes gated past the loop end truncate at the seam (our events are
precompiled to absolute frames; the reference's live sequencer would
similarly never deliver their note-offs inside the loop — documented in
DECISIONS.md).
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from groove_tpu.compiler.song import CompiledSong, DeviceIR, MAIN_MIXER_UVID
from groove_tpu.core.time import SAMPLE_BUFFER_SIZE, SampleRate, Tempo, beats_to_frames
from groove_tpu.models import fm as fm_model
from groove_tpu.models import sampler as sampler_model
from groove_tpu.models import simple as simple_model
from groove_tpu.models import welsh as welsh_model
from groove_tpu.models.voices import scatter_notes, span_for
from groove_tpu.ops import delayfx, dynamics, effects, iir
from groove_tpu.ops import stream as sops
from groove_tpu.ops.dca import pan_gains
from groove_tpu.project.schema import warn

BLOCK = SAMPLE_BUFFER_SIZE  # 64


def _upsample(curve, n: int):
    nb = curve.shape[0]
    out = jnp.broadcast_to(curve[:, None], (nb, BLOCK)).reshape(nb * BLOCK)
    return out[:n]


def _round_block(frames: int) -> int:
    return -(-int(frames) // BLOCK) * BLOCK


def _copy_to_host_async(audio) -> None:
    """Start the device->host transfer without blocking so it overlaps
    later batches' compute (the tunnel fetch bounds streamed throughput
    on this machine; np.asarray later completes the same transfer)."""
    try:
        audio.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass


def _quantize_device(audio):
    """Device-side int16 WAV quantization as a separate program on the
    step/scan output (io.wav.quantize_16bit_jit — see its docstring for
    why it must NOT fuse into the render program)."""
    from groove_tpu.io.wav import quantize_16bit_jit

    return quantize_16bit_jit(audio)


def channel_symmetric(c: "CompiledSong") -> bool:
    """Conservative static proof that a compiled song renders L == R
    BITWISE, enabling the streamed mono-fold (half the fetch bytes on
    the link-bound tunnel path — ROOFLINE.md).

    Every op in the engine applies identical per-channel math, so the
    only asymmetry sources are (checked per device):
      - a nonzero pan (device param, or the welsh/FM voice's DCA pan
        derived from the patch — all 106 shipped patches are centered);
      - pan under automation (trips/LFO curves land in dev.automation)
        or driven by a sidechain link (compiled.sidechain);
      - a sample table whose stereo WAV data differs between channels
        (mono sources are duplicated at load, SampleTable.from_files).
    Anything not provably centered returns False (stereo fetch). The
    fold additionally ships a device-computed tripwire flag with every
    fetch, so a wrong True here raises instead of corrupting audio."""
    import numpy as np

    for dev in c.devices.values():
        if "pan" in dev.automation:
            return False
        default_pan = getattr(dev.voice, "pan", 0.0) \
            if dev.voice is not None else 0.0
        try:
            if float(dev.params.get("pan", default_pan)) != 0.0:
                return False
        except (TypeError, ValueError):
            return False
        st = getattr(dev, "sample_table", None)
        if st is not None and not np.array_equal(st.data[:, 0],
                                                 st.data[:, 1]):
            return False
    if any(p == "pan" for _, _, p in c.sidechain):
        return False
    return True


@jax.jit
def _fold_mono_f32(audio):
    """[.., 2] f32 -> flat [N+1] mono with a trailing tripwire element
    (1.0 iff any sample pair differed — must be 0 whenever
    channel_symmetric proved the graph). The comparison is on BIT
    patterns, not float equality: identical NaNs on both channels are
    'bitwise symmetric' (the fold emits exactly what the stereo fetch
    would), while `NaN != NaN` would false-trip on a degenerate song
    the stereo path streams fine."""
    a = audio.reshape(-1, 2)
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    flag = jnp.any(bits[:, 0] != bits[:, 1]).astype(a.dtype)
    return jnp.concatenate([a[:, 0], flag[None]])


@jax.jit
def _fold_mono_i16(audio):
    """[.., 2] f32 -> device-quantized flat [N+1] int16 mono + tripwire.
    The tripwire compares the QUANTIZED channels: flag==0 certifies the
    emitted int16 bytes equal the stereo fetch's bytes exactly."""
    from groove_tpu.io.wav import quantize_16bit_jit

    q = quantize_16bit_jit(audio.reshape(-1, 2))
    flag = jnp.any(q[:, 0] != q[:, 1]).astype(jnp.int16)
    return jnp.concatenate([q[:, 0], flag[None]])


def _unfold_mono(arr):
    """Host side of the fold: verify the tripwire, duplicate to [N, 2]."""
    import numpy as np

    if arr[-1]:
        raise RuntimeError(
            "mono-fold tripwire: the device reports channel asymmetry in "
            "a graph channel_symmetric() proved symmetric — analysis bug, "
            "please report (disable with mono_fold=False)")
    mono = arr[:-1]
    return np.repeat(mono[:, None], 2, axis=1)


class StreamingRenderer:
    """Segment-streamed render of one compiled song.

    segment_frames must be a multiple of 64 and at least 64.
    """

    # SLICED welsh mode (opt-in; linear streams only): render exactly the
    # segment's slice of every active note instead of recomputing its
    # whole window per overlapping segment, carrying per-note cascade
    # state in the stream pytree (welsh.render_notes_slice). Removes the
    # ~(span/S + 1)x window recompute and makes every device's per-
    # segment batch share the slice length S. Off by default: the
    # bitwise-pinned default path keeps its round-proven behavior, and
    # the loop/seek drivers (stream_loop) rewind note ages, which a
    # stateful voice cannot follow — they always use the unsliced path.
    #
    # Values: False | True (FORCE every sliceable device — the bitwise
    # test configuration; same mode at every segment size) | "auto"
    # (route per device by the work model in _slice_wins, so the mode
    # never loses to unsliced — the CLI --sliced configuration; the
    # routing depends on the construction-time segment size, so cross-
    # SIZE comparisons are float-close rather than bitwise. Within one
    # renderer the bitwise segmentation invariance is unaffected).
    WELSH_SLICED = False

    # Merge ALL sliced (device, bucket) cascade jobs into ONE stream-
    # kernel launch per segment (_render_sliced_merged). Measured
    # on-chip (jingle_bells, S=16384, forced-sliced): per-device
    # launches 14.7x realtime, merged 9.0x — the concatenate/split/
    # state-scatter traffic around the merged launch costs more than
    # the per-launch serial floors it saves (the kernels were already
    # VPU-issue-bound, not launch-bound, at these row counts). Kept
    # behind this flag with the per-row bitwise guarantee intact
    # (row-batch independence, ops/pallas_iir R sweep) in case a
    # future workload IS launch-bound (hundreds of welsh devices).
    WELSH_SLICE_MERGE = False

    def __init__(self, compiled: CompiledSong, segment_frames: int = 65536):
        assert segment_frames % BLOCK == 0 and segment_frames >= BLOCK
        self.c = compiled
        # live-only subclass (engine/livesong with play_song=False) sets
        # this False BEFORE super().__init__: the sequenced-note machinery
        # (buckets, caps, oscillator tracks) is never read there
        self._seq_notes = getattr(self, "_seq_notes", True)
        self.S = int(segment_frames)
        self.n_segs = max(1, -(-compiled.n_frames // self.S))
        self.plan_frames = self.n_segs * self.S
        self.inputs: dict[str, np.ndarray] = {}
        # per-device SPAN BUCKETS (models/voices.bucket_notes — the same
        # wasted-work bound the whole-song path applies): _spans[u] is a
        # list of bucket spans; _bucket_on[u][j] the bucket's note-on
        # frames; caps are per (device, bucket)
        self._spans: dict[str, list[int]] = {}
        self._bucket_on: dict[str, list[np.ndarray]] = {}
        self._caps: dict[tuple[str, int], int] = {}
        # host-resident whole-plan oscillator tracks, sliced per segment
        # in _seg_xs (device memory stays bounded by the segment size)
        self._osc_tracks: dict[str, np.ndarray] = {}
        from groove_tpu.engine.render import compute_filter_fidelity
        self._filter_modes = compute_filter_fidelity(compiled)
        self._welsh_refine = {
            dev.uvid: welsh_model.filter_fidelity_mode(
                dev.voice, float(compiled.sample_rate))
            for dev in compiled.devices.values()
            if dev.kind in ("welsh", "welsh-raw") and dev.voice is not None
        }
        self._sliced = {
            dev.uvid
            for dev in compiled.devices.values()
            if self.WELSH_SLICED
            and dev.kind in ("welsh", "welsh-raw")
            and dev.voice is not None
            and dev.notes is not None and dev.notes.count
            and welsh_model.can_slice(dev.voice)
            and (self.WELSH_SLICED != "auto" or self._slice_wins(dev))
        }
        # static L==R proof -> the stream drivers fetch MONO (+1 tripwire
        # element) and duplicate host-side: half the bytes over the
        # link-bound tunnel, bitwise-identical output (channel_symmetric)
        self.mono_foldable = channel_symmetric(compiled)
        self._collect_inputs()
        self.inputs = jax.device_put(self.inputs)
        self._state0 = self._init_state()
        self._steps: dict[int, callable] = {}

    # ---- host-side collection ---------------------------------------------

    # Per-sample cost of the sliced stateful kernel RELATIVE to the
    # unsliced whole-window cascade, calibrated per backend (the two
    # estimates in _slice_wins count the same cascade samples, so all
    # other constants cancel). CPU: ~2x (the doubled phase-2 serial
    # rolls; measured win 3-5x at 16384-frame segments matches the
    # model — DECISIONS 'Sliced welsh on TPU'). TPU: ~6x — round 4
    # measured ~24 (forced-sliced S=16384: 10.2x vs unsliced 34.9x),
    # but that cost was the slice MACHINERY, not the kernel (the
    # cascade is ~3% of sliced time — DECISIONS 'Sliced stream cost
    # attribution'): replacing the per-sample one-hot gathers of the
    # host time/LFO/noise tables with padded dynamic-slice windows
    # (welsh.slice_rows; 1174us -> 18us per [10,16384] fetch) made
    # forced-sliced at S=16384 measure 57.4x vs unsliced 33.5x and at
    # S=65536 50.7x vs 75.9x (jingle_bells, on-chip). Fitting the
    # _slice_wins work model to those steady-state ratios gives
    # c_eff = 3.6 (S=16384) / 1.7 (S=65536); 6 adds margin for the
    # per-segment fixed costs the model omits (batch assembly, state
    # traffic) so the router stays conservative toward unsliced and
    # never routes a loss under the tunnel's ~30% run-to-run spread.
    SLICE_COST_TPU = 6.0
    SLICE_COST_CPU = 2.0

    def _slice_cost(self) -> float:
        backend = jax.default_backend()
        return (self.SLICE_COST_TPU if backend not in ("cpu",)
                else self.SLICE_COST_CPU)

    def _slice_wins(self, dev: DeviceIR) -> bool:
        """Per-device ROUTING for the sliced mode (VERDICT r3 item 4):
        slicing renders [active_notes, S] per segment and wins only when
        the segment is SHORT relative to the device's note windows — at
        S >> span it renders mostly-masked zero rows and measured 4.5x
        vs the unsliced path's 22.5x on-chip (DECISIONS.md 'Sliced welsh
        on TPU'). Compare per-segment work: sliced ~ cap * S vs unsliced
        ~ sum over overlapping notes of their full spans; route to the
        cheaper one so `--sliced` is never a loss. Both estimates count
        the same cascade samples, so the constant factors cancel except
        the sliced kernel's relative per-sample cost — calibrated per
        backend in SLICE_COST_* (measured, see the class comment)."""
        on = np.asarray(dev.notes.on_frames, np.int64)
        off = np.asarray(dev.notes.off_frames, np.int64)
        tail = int(np.ceil(self._note_tail(dev) * self.c.sample_rate))
        span = np.minimum((off - on) + tail + 1, self.c.n_frames)
        # expected overlapping-note work per segment (window recompute):
        # each note is re-rendered in ceil((span + S) / S) segments
        unsliced = float(np.sum(span * np.ceil((span + self.S) / self.S)))
        # sliced work: sum over segments of active-note count x S
        # ~= sum over notes of (span + S)  (each note active that long),
        # weighted by the kernel's calibrated relative cost
        sliced = self._slice_cost() * float(np.sum(span + self.S))
        return sliced < unsliced

    def _note_tail(self, dev: DeviceIR) -> float:
        sr = self.c.sample_rate
        if dev.kind in ("welsh", "welsh-raw") and dev.voice is not None:
            return welsh_model.tail_seconds(dev.voice)
        if dev.kind == "fm-synthesizer":
            return fm_model.tail_seconds(dev.voice)
        if dev.kind in ("drumkit", "calculator"):
            return float(dev.sample_table.lengths.max()) / sr
        if dev.kind == "envelope":
            return float(dev.params.get("release", 0.0))
        return 0.0

    def _note_buckets(self, dev: DeviceIR, on=None, off=None) -> list:
        """Span buckets [(span, note_indices)] for one instrument — the
        whole-song path's wasted-work bound (one drone must not force
        every short note to render a drone-length window; in the stream
        it additionally multiplies by the segment-overlap factor). Spans
        crop to the timeline like the whole-song Renderer. on/off
        override the device's note frames (unison-tripled welsh)."""
        from groove_tpu.models.voices import bucket_notes

        notes = dev.notes
        sr = self.c.sample_rate
        on = notes.on_frames if on is None else on
        off = notes.off_frames if off is None else off
        gate = (off - on).astype(np.int64)
        tail = self._note_tail(dev)
        need = gate + int(np.ceil(tail * sr)) + 1
        return bucket_notes(need, self.c.n_frames)

    def _collect_inputs(self) -> None:
        from groove_tpu.engine.render import (host_effect_filter_coefs,
                                              warn_static_only)

        c = self.c
        nb_plan = self.plan_frames // BLOCK
        sidechain_targets = {tgt for _, tgt, _ in c.sidechain}
        for dev in c.devices.values():
            u = dev.uvid
            warn_static_only(dev)
            if dev.kind.startswith("filter-") and dev.automation \
                    and u not in sidechain_targets:
                # HOST-designed whole-plan coefficient tables (see
                # render.host_effect_filter_coefs); the step dynamic-
                # slices the segment's blocks — gathers of the same host
                # constants, so segmentation-invariant by construction
                designed = host_effect_filter_coefs(dev, nb_plan,
                                                    float(c.sample_rate))
                if designed is not None:
                    if designed[0] == "lp24":
                        self.inputs[f"{u}/fc/gain"] = designed[1]
                        self.inputs[f"{u}/fc/secs"] = np.stack(
                            [np.stack(sec) for sec in designed[2]])
                    else:
                        self.inputs[f"{u}/fc/coefs"] = np.stack(designed[1])
            for pname, curve in dev.automation.items():
                if dev.kind == "oscillator" and pname == "frequency":
                    # folded into the host-precomputed {u}/osc track
                    # below (a no-op for noise) — never read by the
                    # traced step, so don't ship it over the tunnel
                    continue
                cv = np.asarray(curve, np.float32)
                if cv.shape[0] < nb_plan:  # hold the final value
                    pad = np.full(nb_plan - cv.shape[0],
                                  cv[-1] if cv.size else 0.0, np.float32)
                    cv = np.concatenate([cv, pad])
                self.inputs[f"{u}/auto/{pname}"] = cv
            if not self._seq_notes:
                # live-only: sequenced buckets, caps and oscillator
                # tracks are never read (the live subclass renders from
                # voice pools and free-runs always-on kinds)
                continue
            if dev.kind == "oscillator":
                # closed-form/noise track precomputed over the whole plan:
                # exact equality with the one-shot path, sliced per segment
                from groove_tpu.ops import oscillator as osc_ops
                wf, pw = osc_ops.parse_waveform(dev.params)
                freq = float(dev.params.get("frequency", 440.0))
                if "frequency" in dev.automation and wf != "noise":
                    # automated frequency: the SAME host-constant phase
                    # the whole-timeline path integrates, so slices are
                    # bitwise equal to the one-shot render
                    phase = simple_model.oscillator_phase_automated(
                        dev.automation["frequency"], self.plan_frames,
                        float(c.sample_rate))
                    if wf == "pulse-width":
                        mono = osc_ops.pulse_width(phase, pw)
                    else:
                        mono = osc_ops.evaluate(str(wf), phase)
                elif wf == "pulse-width":
                    # SAME host time base and op order as the whole-song
                    # path (render.py oscillator branch): (freq*t)/sr vs
                    # freq*(t/sr) reassociates in f32 and flips pulse
                    # EDGE samples (measured 4 flips / 200k at 440 Hz)
                    t = jnp.asarray(
                        np.arange(self.plan_frames, dtype=np.float32)
                        / np.float32(c.sample_rate))
                    mono = osc_ops.pulse_width(freq * t, pw)
                else:
                    mono = simple_model.oscillator_instrument(
                        str(wf), freq, self.plan_frames, float(c.sample_rate)
                    )
                # HOST-resident; _seg_xs ships only the segment's slice,
                # keeping device memory bounded by the segment size for
                # unbounded songs (the module's memory claim) — a 1-hour
                # song would otherwise pin ~635 MB per oscillator device
                self._osc_tracks[u] = np.asarray(mono)
                continue
            if (dev.role != "instrument" and dev.kind != "calculator") \
                    or dev.notes is None or dev.notes.count == 0:
                continue
            if dev.kind == "toy-instrument":
                continue
            if dev.kind in ("welsh", "welsh-raw", "fm-synthesizer") \
                    and dev.voice is None:
                continue  # loader already warned; renders silent
            notes = dev.notes
            # unison triples the RENDERED notes only (dev.notes stays
            # the true performance — welsh.unison_input_notes)
            keys_a, vels_a, on_a, off_a, prev_a = \
                welsh_model.unison_input_notes(notes, dev.voice)
            gate = (off_a - on_a).astype(np.int32)
            buckets = self._note_buckets(dev, on_a, off_a)
            self._spans[u] = [s for s, _ in buckets]
            self._bucket_on[u] = []
            if dev.kind == "sampler":
                ratios = np.asarray(
                    sampler_model.sampler_ratios(
                        notes.keys, float(dev.params.get("root", 440.0))
                    ),
                    np.float32,
                )
            for j, (span, idx) in enumerate(buckets):
                b = f"{u}/b{j}"
                self.inputs[f"{b}/keys"] = keys_a[idx]
                self.inputs[f"{b}/vels"] = vels_a[idx]
                self.inputs[f"{b}/on"] = on_a[idx]
                self.inputs[f"{b}/gate"] = gate[idx]
                # global note indices: noise keying must be invariant to
                # the bucket partition AND the per-segment overlap set
                # (welsh.render_notes note_ids)
                self.inputs[f"{b}/ids"] = idx.astype(np.int32)
                if prev_a is not None:  # glide sources
                    self.inputs[f"{b}/prev"] = prev_a[idx]
                if dev.kind in ("welsh", "welsh-raw"):
                    # HOST control constants (welsh.host_osc_constants /
                    # host_filter_tables — backend-independent bits shared
                    # with the whole-timeline path and the f64 reference)
                    hc = welsh_model.host_osc_constants(
                        dev.voice, keys_a[idx],
                        None if prev_a is None else prev_a[idx])
                    hc.update(welsh_model.host_gate_seconds(
                        gate[idx], float(c.sample_rate)))
                    tabs = welsh_model.host_filter_tables(
                        dev.voice, gate[idx].astype(np.int64), int(span),
                        float(c.sample_rate))
                    if tabs is not None:
                        hc.update(tabs)
                    php = welsh_model.host_pitch_phases(
                        dev.voice, keys_a[idx],
                        None if prev_a is None else prev_a[idx],
                        int(span), float(c.sample_rate))
                    if php is not None:
                        hc.update(php)
                    lvt = welsh_model.host_lfo_table(
                        dev.voice, int(span), float(c.sample_rate))
                    if lvt is not None:
                        hc.update(lvt)
                    for name, arr in hc.items():
                        self.inputs[f"{b}/hc/{name}"] = arr
                elif dev.kind in ("fm-synthesizer", "envelope"):
                    # HOST carrier/tone frequencies (fm._voices_at /
                    # simple.envelope_instrument freqs)
                    from groove_tpu.models.voices import note_freqs
                    self.inputs[f"{b}/hc/f1"] = np.asarray(
                        note_freqs(np.asarray(keys_a[idx])), np.float32)
                    if dev.kind == "fm-synthesizer" \
                            and "ratio" not in dev.automation:
                        php = fm_model.host_phases(
                            dev.voice, keys_a[idx], int(span),
                            float(c.sample_rate))
                        if php is not None:
                            for nm, arr in php.items():
                                self.inputs[f"{b}/hc/{nm}"] = arr
                if dev.uvid in self._sliced:
                    # host time-base constants the slice path gathers
                    # from (bitwise the whole path's t / t_blk values)
                    tf, tbf = welsh_model.slice_time_bases(
                        span, float(self.c.sample_rate))
                    self.inputs[f"{b}/tfull"] = tf
                    self.inputs[f"{b}/tbfull"] = tbf
                    # NOTE: noise rows are REGENERATED in-graph per segment
                    # (welsh.render_notes_slice_pre) rather than passed in
                    # as pre-generated input tables. Tables were built and
                    # measured (round 3): values bitwise-match and the
                    # welsh-level chain stays bitwise, but inside the full
                    # engine program a gather-of-input producer makes
                    # XLA:CPU contract the noise mix differently at
                    # different segment lengths (1-ulp one-seg vs many-seg
                    # divergence under the 8-virtual-device env, even with
                    # an optimization_barrier on the window) — the
                    # in-graph RNG producer is what keeps the mix's fma
                    # decisions identical across programs. See DECISIONS.md
                    # 'Sliced noise tables'.
                if dev.sample_table is not None:
                    self.inputs[f"{b}/slots"] = dev.slots[idx]
                if dev.kind == "sampler":
                    self.inputs[f"{b}/ratios"] = ratios[idx]
                self._bucket_on[u].append(np.asarray(on_a[idx], np.int64))
            if dev.sample_table is not None:
                self.inputs[f"{u}/table"] = dev.sample_table.data
                self.inputs[f"{u}/lengths"] = dev.sample_table.lengths
                self.inputs[f"{u}/rates"] = dev.sample_table.rates
        # per-bucket capacity = max notes overlapping any linear segment.
        # Exception: welsh devices routed to the SERIAL cascade on a
        # NON-PALLAS backend pin cap to the FULL bucket size — the
        # per-sample serial scan's codegen is batch-shape-sensitive at
        # the ulp level (XLA compiles cap=1 and cap=2 batches
        # differently), so bitwise segmentation invariance requires every
        # segmentation of the song to compile the IDENTICAL note-batch
        # shape. Confined to the CPU test backend: on TPU "serial" routes
        # to the refined Pallas kernel, whose output is verified bitwise
        # batch-shape-independent (ops/pallas_iir R sweep), and pinning
        # there would re-render whole buckets every segment.
        from groove_tpu.ops import iir as _iir
        pin_serial = not _iir._pallas_available()
        for u, ons in self._bucket_on.items():
            fixed = pin_serial and self._welsh_refine.get(u) == "serial"
            for j in range(len(ons)):
                if fixed:
                    self._caps[(u, j)] = max(1, len(ons[j]))
                    continue
                # max notes overlapping any linear segment, by interval
                # sweep over segment indices: note i is active in segment
                # k iff on < (k+1)S and on+span > kS, i.e. k in
                # [on//S, (on+span-1)//S]. Identical caps to the old
                # per-segment _overlap loop, but O(m + n_segs) — the loop
                # was n_segs numpy calls per bucket, minutes of startup
                # at segment=64 on long songs (the live engine's cadence)
                on = ons[j]
                span = self._spans[u][j]
                k_min = np.clip(on // self.S, 0, self.n_segs - 1)
                k_max = np.clip((on + span - 1) // self.S, 0,
                                self.n_segs - 1)
                diff = np.zeros(self.n_segs + 1, np.int64)
                np.add.at(diff, k_min, 1)
                np.add.at(diff, k_max + 1, -1)
                self._caps[(u, j)] = max(1, int(np.cumsum(diff).max()))

    def _overlap(self, u: str, j: int, t0: int, seg_len: int) -> np.ndarray:
        on = self._bucket_on[u][j]
        span = self._spans[u][j]
        return np.nonzero((on < t0 + seg_len) & (on + span > t0))[0]

    def _seg_xs(self, t0: int, seg_len: int) -> dict:
        """Per-segment traced inputs: playhead + padded per-bucket note
        index lists (indices are into the bucket's own arrays)."""
        xs = {"t0": np.int32(t0)}
        for u, track in self._osc_tracks.items():
            # the segment's slice of the host-resident oscillator track
            xs[f"{u}/osc"] = track[t0:t0 + seg_len]
        for (u, j), cap in self._caps.items():
            idx = self._overlap(u, j, t0, seg_len)
            if idx.size > cap:
                # loop windows can overlap more notes than any linear
                # segment; widen the capacity (step re-jits once)
                self._caps[(u, j)] = cap = int(idx.size)
                self._steps.clear()
                if getattr(self, "_scans", None):
                    self._scans.clear()
            mask = np.zeros(cap, np.float32)
            mask[: idx.size] = 1.0
            full = np.zeros(cap, np.int32)
            full[: idx.size] = idx
            xs[f"{u}/b{j}/idx"] = full
            xs[f"{u}/b{j}/m"] = mask
        return xs

    # ---- state -------------------------------------------------------------

    def _smoothed_compressor(self, dev: DeviceIR) -> bool:
        att = float(dev.params.get("attack", 0.0))
        rel = float(dev.params.get("release", 0.0))
        if att > 0.0 or rel > 0.0:
            return True
        if "attack" in dev.automation or "release" in dev.automation:
            return True
        return any(tgt == dev.uvid and p in ("attack", "release")
                   for _, tgt, p in self.c.sidechain)

    def _init_state(self) -> dict:
        from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX

        c = self.c
        sr = float(c.sample_rate)
        st: dict[str, jnp.ndarray] = {}
        sc_targets = {(t, p) for _, t, p in c.sidechain}

        def z(*shape):
            return jnp.zeros(shape, jnp.float32)

        for dev in c.devices.values():
            u, k = dev.uvid, dev.kind
            if dev.role == "controller" and k != "signal-passthrough-controller":
                continue
            if k == "compressor" and self._smoothed_compressor(dev):
                st[f"{u}/catt"] = z(2)
                st[f"{u}/crel"] = z(2)
            elif k == "delay":
                if "delay" in dev.automation:
                    # automated delay time: the carried tail covers the
                    # curve's MAXIMUM length (host data)
                    d = int(round(float(np.max(dev.automation["delay"]))
                                  * sr))
                else:
                    d = int(round(float(dev.params.get("delay", 0.0)) * sr))
                if (u, "delay") in sc_targets:
                    # a sidechain value has no host maximum; the tail
                    # covers the engine-wide clamp bound
                    d = max(d, int(round(SIDECHAIN_SECONDS_MAX * sr)))
                if d > 0:
                    st[f"{u}/dl"] = z(2, d)
            elif k == "chorus":
                if "delay-seconds" in dev.automation:
                    # automated delay: the carried tail covers the
                    # curve's MAXIMUM length (host data)
                    d = int(round(float(
                        np.max(dev.automation["delay-seconds"])) * sr))
                else:
                    d = int(round(
                        float(dev.params.get("delay-seconds", 0.0)) * sr))
                if (u, "delay-seconds") in sc_targets:
                    d = max(d, int(round(SIDECHAIN_SECONDS_MAX * sr)))
                if d > 0:
                    st[f"{u}/ch"] = z(2, d)
            elif k == "reverb":
                for i, d_s in enumerate(delayfx.COMB_DELAYS_S):
                    d = max(1, int(round(d_s * sr)))
                    st[f"{u}/comb{i}/x"] = z(2, d)
                    st[f"{u}/comb{i}/y"] = z(2, d)
                for i, d_s in enumerate(delayfx.ALLPASS_DELAYS_S):
                    st[f"{u}/ap{i}/w"] = z(2, max(1, int(round(d_s * sr))))
            elif k == "filter-low-pass-24db":
                if self._filter_modes.get(u) == "refine":
                    for i in range(2):
                        for name, v in sops.refined_state_init((2,)).items():
                            st[f"{u}/rf{i}/{name}"] = v
                else:
                    for i in range(2):
                        st[f"{u}/lp24/{i}/s1"] = z(2)
                        st[f"{u}/lp24/{i}/s2"] = z(2)
            elif k.startswith("filter-"):
                if self._filter_modes.get(u) == "refine":
                    for name, v in sops.refined_state_init((2,)).items():
                        st[f"{u}/rf/{name}"] = v
                else:
                    st[f"{u}/bq/s1"] = z(2)
                    st[f"{u}/bq/s2"] = z(2)
        for src, _, _ in c.sidechain:
            st[f"{src}/sc"] = z()
        # sliced welsh: per-note cascade state, one slot per bucket note
        # plus a scratch slot for padded batch rows (welsh.slice_state_init)
        for u in self._sliced:
            mode = self._welsh_refine.get(u)
            for j, ons in enumerate(self._bucket_on[u]):
                for k, v in welsh_model.slice_state_init(
                        len(ons), mode).items():
                    st[f"{u}/b{j}/wf/{k}"] = v
        return st

    # ---- traced step -------------------------------------------------------

    def _step_for(self, seg_len: int):
        fn = self._steps.get(seg_len)
        if fn is None:
            fn = jax.jit(
                lambda state, xs, inputs, n=seg_len:
                self._step_impl(state, xs, inputs, n)
            )
            self._steps[seg_len] = fn
        return fn

    def _param_seg(self, inputs, dev, name, default, t0, n, override=None):
        if override is not None:
            return override
        key = f"{dev.uvid}/auto/{name}"
        if key in inputs:
            nb = n // BLOCK
            blk = jax.lax.dynamic_slice(inputs[key], (t0 // BLOCK,), (nb,))
            return _upsample(blk, n)
        return float(dev.params.get(name, default))

    # host_ctl entries that are PER-NOTE rows (gathered with the segment's
    # note index list); the rest (coefficient tables) pass through whole.
    # Single source of truth lives with the producers (models/welsh.py).
    _CTL_PER_NOTE = welsh_model.HOST_CTL_PER_NOTE

    def _hc_seg(self, inputs, b: str, idx):
        """The segment note batch's host-control dict: per-note rows
        gathered by idx (padded rows read row 0 — masked at the sum),
        coefficient tables whole."""
        prefix = f"{b}/hc/"
        hc = {}
        for key in inputs:
            if key.startswith(prefix):
                name = key[len(prefix):]
                v = inputs[key]
                hc[name] = jnp.take(v, idx, axis=0) \
                    if name in self._CTL_PER_NOTE else v
        return hc or None

    def _render_instrument_seg(self, inputs, dev: DeviceIR, xs, t0, n: int,
                               state=None, new_state=None,
                               sliced_merged=None):
        # state/new_state are unused here; the live subclass
        # (engine/livesong.LiveSongRenderer) carries per-voice welsh state
        # through them. sliced_merged: {(uvid, bucket) -> mono [n]} from
        # the segment's merged cascade launch (_render_sliced_merged)
        u = dev.uvid
        sr = float(self.c.sample_rate)
        if dev.kind == "oscillator":
            mono = xs[f"{u}/osc"]  # host-sliced per segment (_seg_xs)
            return jnp.stack([mono, mono])
        if dev.kind == "toy-instrument":
            mono = simple_model.toy_instrument(
                float(dev.params.get("fake-value", 0.0)), n
            )
            return jnp.stack([mono, mono])
        if u not in self._spans:
            if dev.role == "instrument" or dev.kind == "calculator":
                return jnp.zeros((2, n), jnp.float32)
            warn(f"unknown instrument kind {dev.kind}; silent")
            return jnp.zeros((2, n), jnp.float32)

        P = lambda name, default: self._param_seg(  # noqa: E731
            inputs, dev, name, default, t0, n)
        out = jnp.zeros((2, n), jnp.float32)
        for j, span in enumerate(self._spans[u]):
            b = f"{u}/b{j}"
            idx = xs[f"{b}/idx"]
            m = xs[f"{b}/m"]
            keys = jnp.take(inputs[f"{b}/keys"], idx, axis=0)
            vels = jnp.take(inputs[f"{b}/vels"], idx, axis=0) * m
            on = jnp.take(inputs[f"{b}/on"], idx, axis=0)
            gate = jnp.take(inputs[f"{b}/gate"], idx, axis=0)
            ids = jnp.take(inputs[f"{b}/ids"], idx, axis=0)
            on_rel = (on - t0 + span).astype(jnp.int32)

            def place(note_audio, m=m, on_rel=on_rel, span=span):
                # padding rows are zeroed via the mask so their scatter
                # adds exact zeros (bit-exact segmentation invariance)
                mshape = (m.shape[0],) + (1,) * (note_audio.ndim - 1)
                note_audio = note_audio * m.reshape(mshape)
                placed = scatter_notes(note_audio, on_rel, n + span)
                return placed[..., span:span + n]

            if dev.kind in ("welsh", "welsh-raw") and u in self._sliced \
                    and state is not None:
                if sliced_merged is not None and (u, j) in sliced_merged:
                    # cascade ran in the segment's MERGED launch
                    # (_render_sliced_merged); state was scattered there
                    mono = sliced_merged[(u, j)]
                    out = out + jnp.stack([mono, mono])
                    continue
                # SLICED: render exactly this segment's slice of every
                # active note, cascade state carried per note. Padded
                # batch rows are remapped to the bucket's scratch state
                # slot so duplicate scatters can never touch a real
                # note's state; their audio is masked at the sum.
                count = len(self._bucket_on[u][j])
                slot = jnp.where(m > 0, idx, count).astype(jnp.int32)
                age0 = (jnp.asarray(t0, jnp.int32) - on).astype(jnp.int32)
                prefix = f"{b}/wf/"
                fst = {k[len(prefix):]: state[k][slot]
                       for k in state if k.startswith(prefix)}
                mono_rows, fst2 = welsh_model.render_notes_slice(
                    dev.voice, keys, vels, gate, age0, n, sr, fst,
                    inputs[f"{b}/tfull"], inputs[f"{b}/tbfull"],
                    note_ids=ids,
                    fidelity=self._welsh_refine.get(u),
                    host_ctl=self._hc_seg(inputs, b, idx),
                )
                for k, v in fst2.items():
                    new_state[prefix + k] = state[prefix + k].at[slot].set(v)
                mono = jnp.sum(mono_rows * m[:, None], axis=0)
                out = out + jnp.stack([mono, mono])  # DCA applied after
            elif dev.kind in ("welsh", "welsh-raw", "fm-synthesizer"):
                if dev.kind == "fm-synthesizer":
                    ac = {nm: inputs[f"{u}/auto/{nm}"]
                          for nm in ("ratio", "depth", "beta")
                          if f"{u}/auto/{nm}" in inputs}
                    fr = jnp.take(inputs[f"{b}/hc/f1"], idx, axis=0) \
                        if f"{b}/hc/f1" in inputs else None
                    hcf = self._hc_seg(inputs, b, idx)
                    ph = hcf if hcf and "phm" in hcf else None
                    render = (lambda p_, k, v, g, o, s_, sr_, ac_=ac,
                              fr_=fr, ph_=ph:
                              fm_model.render_notes(
                                  p_, k, v, g, s_, sr_, on_frames=o,
                                  ratio_b=ac_.get("ratio"),
                                  depth_b=ac_.get("depth"),
                                  beta_b=ac_.get("beta"), freqs=fr_,
                                  phases=ph_))
                else:
                    rf = self._welsh_refine.get(u, False)
                    pv = jnp.take(inputs[f"{b}/prev"], idx, axis=0) \
                        if f"{b}/prev" in inputs else None
                    hc = self._hc_seg(inputs, b, idx)
                    render = (lambda p_, k, v, g, o, s_, sr_, i_=ids,
                              rf_=rf, pv_=pv, hc_=hc:
                              welsh_model.render_notes(p_, k, v, g, s_, sr_,
                                                       refine_filter=rf_,
                                                       note_ids=i_,
                                                       prev_keys=pv_,
                                                       host_ctl=hc_))
                mono = place(render(dev.voice, keys, vels, gate, on,
                                    span, sr))
                out = out + jnp.stack([mono, mono])  # DCA applied after
            elif dev.kind in ("drumkit", "sampler", "calculator"):
                slots = jnp.take(inputs[f"{b}/slots"], idx, axis=0)
                unity = dev.kind in ("drumkit", "calculator") and all(
                    int(r) == self.c.sample_rate
                    for r in dev.sample_table.rates)
                if unity:
                    # aligned row copy (no fractional gather): the general
                    # gather path measured ~30 ns/element on TPU — it was
                    # the dominant cost of streamed drum tracks
                    stereo = sampler_model.render_notes_aligned(
                        inputs[f"{u}/table"], inputs[f"{u}/lengths"],
                        slots, jnp.full_like(gate, span), vels, span,
                    )
                else:
                    if dev.kind == "sampler":
                        gate_eff = gate
                        ratios = jnp.take(inputs[f"{b}/ratios"], idx, axis=0)
                    else:
                        gate_eff = jnp.full_like(gate, span)  # one-shots
                        ratios = jnp.ones((keys.shape[0],), jnp.float32)
                    stereo = sampler_model.render_notes(
                        inputs[f"{u}/table"], inputs[f"{u}/lengths"],
                        inputs[f"{u}/rates"], slots, ratios, gate_eff,
                        vels, span, sr,
                    )
                out = out + place(stereo)
            elif dev.kind == "envelope":
                adsr = (
                    float(dev.params.get("attack", 0.0)),
                    float(dev.params.get("decay", 0.0)),
                    float(dev.params.get("sustain", 1.0)),
                    float(dev.params.get("release", 0.0)),
                )
                fr = jnp.take(inputs[f"{b}/hc/f1"], idx, axis=0) \
                    if f"{b}/hc/f1" in inputs else None
                mono = place(simple_model.envelope_instrument(
                    adsr, keys, vels, gate, span, sr, freqs=fr
                ))
                out = out + jnp.stack([mono, mono])
            else:
                warn(f"unknown instrument kind {dev.kind}; silent")
        if dev.kind in ("welsh", "welsh-raw"):
            lv, rv = pan_gains(0.0)
            ls, rs = pan_gains(P("pan", 0.0))
            g = P("gain", 1.0)
            out = jnp.stack([out[0] * lv * ls * g, out[1] * rv * rs * g])
        elif dev.kind == "fm-synthesizer":
            left, right = pan_gains(P("pan", dev.voice.pan))
            g = P("gain", dev.voice.gain)
            out = jnp.stack([out[0] * left * g, out[1] * right * g])
        return out

    def _apply_effect_seg(self, inputs, dev: DeviceIR, x, t0, n: int,
                          overrides, state, new_state):
        sr = float(self.c.sample_rate)
        k = dev.kind
        u = dev.uvid
        P = lambda name, default, ov=None: self._param_seg(  # noqa: E731
            inputs, dev, name, default, t0, n,
            override=overrides.get((u, name)) if ov is None else ov,
        )
        if k == "mixer" or k == "signal-passthrough-controller":
            return x
        if k == "gain":
            return effects.gain(x, P("ceiling", 1.0))
        if k == "limiter":
            return effects.limiter(x, P("minimum", 0.0), P("maximum", 1.0))
        if k == "bitcrusher":
            bits = overrides.get((u, "bits-to-crush"))
            if bits is None:
                key = f"{u}/auto/bits-to-crush"
                if key in inputs:
                    bits = P("bits-to-crush", 8.0)
                else:
                    bits = float(dev.params.get("bits", 8))
            return effects.bitcrusher(x, bits)
        if k == "compressor":
            thr = P("threshold", 1.0)
            ratio = P("ratio", 1.0)
            if not self._smoothed_compressor(dev):
                return dynamics.compressor(x, thr, ratio)
            # sidechain-driven SECONDS clamp to the engine bound (cf.
            # render.py — keeps the follower memory boundable host-side)
            from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
            att = overrides.get((u, "attack"))
            att = (jnp.clip(att, 0.0, SIDECHAIN_SECONDS_MAX)
                   if att is not None else P("attack", 0.0))
            rel = overrides.get((u, "release"))
            rel = (jnp.clip(rel, 0.0, SIDECHAIN_SECONDS_MAX)
                   if rel is not None else P("release", 0.0))
            y, sa, sr_ = sops.compressor_smoothed_stream(
                x, thr, ratio, att, rel, sr,
                state[f"{u}/catt"], state[f"{u}/crel"],
            )
            new_state[f"{u}/catt"] = sa
            new_state[f"{u}/crel"] = sr_
            return y
        if k == "delay":
            if f"{u}/dl" not in state:
                return x
            ov = overrides.get((u, "delay"))
            key = f"{u}/auto/delay"
            if ov is not None:
                # sidechain-driven delay TIME: the override is this
                # segment's 64-sample hold; clamp like the whole path
                from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
                d_b = jnp.clip(ov[::BLOCK], 0.0, SIDECHAIN_SECONDS_MAX)
                y, h = sops.delay_stream_automated(
                    x, state[f"{u}/dl"], d_b, sr)
            elif key in inputs:
                d_b = jax.lax.dynamic_slice(
                    inputs[key], (t0 // BLOCK,), (n // BLOCK,))
                y, h = sops.delay_stream_automated(
                    x, state[f"{u}/dl"], d_b, sr)
            else:
                y, h = sops.delay_stream(x, state[f"{u}/dl"])
            new_state[f"{u}/dl"] = h
            return y
        if k == "chorus":
            if f"{u}/ch" not in state:
                return x
            total_d = state[f"{u}/ch"].shape[-1]
            dkey = f"{u}/auto/delay-seconds"
            vkey = f"{u}/auto/voices"
            ov_d = overrides.get((u, "delay-seconds"))
            ov_v = overrides.get((u, "voices"))
            if ov_d is not None or ov_v is not None \
                    or dkey in inputs or vkey in inputs:
                from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX
                seg = lambda key: jax.lax.dynamic_slice(  # noqa: E731
                    inputs[key], (t0 // BLOCK,), (n // BLOCK,))
                if ov_v is not None:
                    voices_b = ov_v[::BLOCK]
                    maxv = max(1, int(dev.params.get("voices", 1)))
                elif vkey in inputs:
                    voices_b = seg(vkey)
                    maxv = delayfx.chorus_curve_max_voices(
                        dev.automation["voices"])
                else:
                    voices_b, maxv = None, None
                if ov_d is not None:
                    delay_b = jnp.clip(
                        ov_d[::BLOCK], 0.0, SIDECHAIN_SECONDS_MAX)
                elif dkey in inputs:
                    delay_b = seg(dkey)
                else:
                    delay_b = float(dev.params.get("delay-seconds", 0.0))
                y, h = sops.chorus_stream_automated(
                    x, state[f"{u}/ch"], int(dev.params.get("voices", 1)),
                    delay_b, sr, P("wet-dry-mix", 1.0),
                    voices_b=voices_b, max_voices=maxv,
                )
            else:
                y, h = sops.chorus_stream(
                    x, state[f"{u}/ch"], int(dev.params.get("voices", 1)),
                    total_d, P("wet-dry-mix", 1.0),
                )
            new_state[f"{u}/ch"] = h
            return y
        if k == "reverb":
            ov = overrides.get((u, "seconds"))
            key = f"{u}/auto/seconds"
            if ov is not None:
                y, new = sops.reverb_stream_automated(
                    x, state, P("attenuation", 1.0), ov[::BLOCK], sr, u,
                )
            elif key in inputs:
                sec_b = jax.lax.dynamic_slice(
                    inputs[key], (t0 // BLOCK,), (n // BLOCK,))
                y, new = sops.reverb_stream_automated(
                    x, state, P("attenuation", 1.0), sec_b, sr, u,
                )
            else:
                y, new = sops.reverb_stream(
                    x, state, P("attenuation", 1.0),
                    float(dev.params.get("seconds", 0.0)), sr, u,
                )
            new_state.update(new)
            return y
        if k == "toy":
            return simple_model.toy_effect(x)
        if k.startswith("filter-"):
            def PB(name, default):
                ov = overrides.get((u, name))
                if ov is not None:
                    return ov[::BLOCK]
                key = f"{u}/auto/{name}"
                if key in inputs:
                    return jax.lax.dynamic_slice(
                        inputs[key], (t0 // BLOCK,), (n // BLOCK,))
                return float(dev.params.get(name, default))

            cutoff = PB("cutoff", 1000.0)
            if k == "filter-low-pass-24db":
                q = PB("passband-ripple", 0.707)
                if f"{u}/fc/secs" in inputs:
                    # HOST coefficient table (collection): the segment's
                    # blocks are a dynamic_slice of the same constants
                    # every segmentation reads — invariant by construction
                    nb = n // BLOCK
                    b0 = t0 // BLOCK
                    gain_b = jax.lax.dynamic_slice(
                        inputs[f"{u}/fc/gain"], (b0,), (nb,))
                    fsec = jax.lax.dynamic_slice(
                        inputs[f"{u}/fc/secs"], (0, 0, b0), (2, 5, nb))
                    y = x * _upsample(gain_b, n)
                    secs = [tuple(_upsample(fsec[i, j], n)
                                  for j in range(5)) for i in range(2)]
                elif jnp.ndim(cutoff) == 0 and jnp.ndim(q) == 0:
                    gain_s, secs = iir.lp24_sections(
                        cutoff, max(float(q), 1e-3), sr)
                    y = x * gain_s
                else:
                    nb = n // BLOCK
                    cutoff_b = jnp.broadcast_to(
                        jnp.asarray(cutoff, jnp.float32), (nb,))
                    q_b = jnp.maximum(jnp.asarray(q, jnp.float32), 1e-3)
                    gain_b, secs_b = iir.lp24_sections(cutoff_b, q_b, sr)
                    y = x * _upsample(jnp.broadcast_to(gain_b, (nb,)), n)
                    secs = [
                        tuple(_upsample(jnp.broadcast_to(
                            jnp.asarray(c, jnp.float32), (nb,)), n)
                            for c in sec)
                        for sec in secs_b
                    ]
                refined = self._filter_modes.get(u) == "refine"
                serial = self._filter_modes.get(u) == "serial"
                for i, sec in enumerate(secs):
                    if refined:
                        # defect-correction pass with carried histories
                        # (sops.biquad_stream_refined; flag from the
                        # host-visible curve, engine/render.compute_
                        # refine_filters — same -80 dBFS bar as the
                        # whole-timeline path)
                        sec = tuple(
                            jnp.broadcast_to(jnp.asarray(cf, jnp.float32),
                                             (n,)) for cf in sec)
                        st = {name: state[f"{u}/rf{i}/{name}"]
                              for name in ("ss1", "ss2", "cs1", "cs2",
                                           "xh", "yh", "ch")}
                        y, st2 = sops.biquad_stream_refined(y, sec, st)
                        for name, v in st2.items():
                            new_state[f"{u}/rf{i}/{name}"] = v
                    else:
                        y, (s1, s2) = sops.biquad_stream(
                            y, sec,
                            (state[f"{u}/lp24/{i}/s1"],
                             state[f"{u}/lp24/{i}/s2"]),
                            serial=serial,
                        )
                        new_state[f"{u}/lp24/{i}/s1"] = s1
                        new_state[f"{u}/lp24/{i}/s2"] = s2
                return y
            if f"{u}/fc/coefs" in inputs:
                # HOST coefficient table (see the lp24 branch above)
                nb = n // BLOCK
                co = jax.lax.dynamic_slice(
                    inputs[f"{u}/fc/coefs"], (0, t0 // BLOCK), (5, nb))
                coefs_b = tuple(co[j] for j in range(5))
            # identical coefficient construction to render.py:377-398
            elif k == "filter-low-pass-12db":
                coefs_b = iir.rbj_low_pass(
                    cutoff, jnp.maximum(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-high-pass-12db":
                coefs_b = iir.rbj_high_pass(
                    cutoff, jnp.maximum(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-all-pass-12db":
                coefs_b = iir.rbj_all_pass(
                    cutoff, jnp.maximum(PB("q", 0.707), 1e-3), sr)
            elif k == "filter-band-pass-12db":
                coefs_b = iir.rbj_band_pass(
                    cutoff, jnp.maximum(PB("bandwidth", 1.0), 1e-3), sr)
            elif k == "filter-band-stop-12db":
                coefs_b = iir.rbj_band_stop(
                    cutoff, jnp.maximum(PB("bandwidth", 1.0), 1e-3), sr)
            elif k == "filter-peaking-eq-12db":
                coefs_b = iir.rbj_peaking_eq(
                    cutoff, jnp.maximum(PB("q", 1.0), 1e-3),
                    PB("db-gain", 0.0), sr)
            elif k == "filter-low-shelf-12db":
                coefs_b = iir.rbj_low_shelf(cutoff, PB("db-gain", 0.0), sr)
            elif k == "filter-high-shelf-12db":
                coefs_b = iir.rbj_high_shelf(cutoff, PB("db-gain", 0.0), sr)
            else:
                warn(f"unknown filter kind {k}; passthrough")
                return x
            # block-rate coefficient entries upsample to per-sample; static
            # scalars stay scalar (so the serial near-critical path applies)
            coefs = tuple(
                c if jnp.ndim(c) == 0
                else _upsample(jnp.broadcast_to(
                    jnp.asarray(c, jnp.float32), (n // BLOCK,)), n)
                for c in coefs_b
            )
            if self._filter_modes.get(u) == "refine":
                coefs = tuple(
                    jnp.broadcast_to(jnp.asarray(cf, jnp.float32), (n,))
                    for cf in coefs)
                st = {name: state[f"{u}/rf/{name}"]
                      for name in ("ss1", "ss2", "cs1", "cs2",
                                   "xh", "yh", "ch")}
                y, st2 = sops.biquad_stream_refined(x, coefs, st)
                for name, v in st2.items():
                    new_state[f"{u}/rf/{name}"] = v
                return y
            y, (s1, s2) = sops.biquad_stream(
                x, coefs, (state[f"{u}/bq/s1"], state[f"{u}/bq/s2"]),
                serial=self._filter_modes.get(u) == "serial")
            new_state[f"{u}/bq/s1"] = s1
            new_state[f"{u}/bq/s2"] = s2
            return y
        warn(f"unknown effect kind {k}; passthrough")
        return x

    def _render_sliced_merged(self, inputs, xs, t0, n: int, state,
                              new_state):
        """ONE fused cascade launch per segment for ALL sliced-welsh
        (device, bucket) jobs (VERDICT r4 item 5): the stream kernel's
        serial phases (64-step in-block prefixes + the block chain) are a
        per-LAUNCH floor — Pallas grid steps run sequentially — so
        per-(device, bucket) launches pay it up to devices x buckets
        times per segment (jingle_bells: 8 welsh devices), while one
        merged launch over the concatenated rows pays it once. Rows are
        per-note data: concatenation never changes a row's math, and the
        kernels are verified bitwise batch-shape-independent
        (ops/pallas_iir R sweep), so the per-row bits equal the
        per-device launches'. Pallas backends only — the XLA fallback's
        scan codegen is batch-shape-sensitive at the ulp level (see the
        serial cap pinning above), and CPU is not the path being
        optimized. Jobs group by carried-state layout ('p4' plain /
        'p20' refined — different kernels). Returns {(uvid, bucket) ->
        mono [n]} with per-note state already scattered into new_state,
        or None (nothing sliced / non-Pallas backend)."""
        from groove_tpu.ops import iir as iir_ops

        if not self.WELSH_SLICE_MERGE or not self._sliced or state is None \
                or not iir_ops._pallas_available():
            return None
        sr = float(self.c.sample_rate)
        nb_seg = n // BLOCK
        groups: dict[str, list] = {}
        for u in self.c.order:
            if u not in self._sliced:
                continue
            dev = self.c.devices[u]
            for j in range(len(self._spans[u])):
                b = f"{u}/b{j}"
                idx = xs[f"{b}/idx"]
                m = xs[f"{b}/m"]
                keys = jnp.take(inputs[f"{b}/keys"], idx, axis=0)
                vels = jnp.take(inputs[f"{b}/vels"], idx, axis=0) * m
                on = jnp.take(inputs[f"{b}/on"], idx, axis=0)
                gate = jnp.take(inputs[f"{b}/gate"], idx, axis=0)
                ids = jnp.take(inputs[f"{b}/ids"], idx, axis=0)
                count = len(self._bucket_on[u][j])
                slot = jnp.where(m > 0, idx, count).astype(jnp.int32)
                age0 = (jnp.asarray(t0, jnp.int32) - on).astype(jnp.int32)
                prefix = f"{b}/wf/"
                fst = {k[len(prefix):]: state[k][slot]
                       for k in state if k.startswith(prefix)}
                y, secs_b, ctx = welsh_model.render_notes_slice_pre(
                    dev.voice, keys, vels, gate, age0, n, sr,
                    inputs[f"{b}/tfull"], inputs[f"{b}/tbfull"],
                    note_ids=ids, host_ctl=self._hc_seg(inputs, b, idx))
                layout = "p20" if "p20" in fst else "p4"
                rows = y.shape[0]
                secs_full = tuple(
                    tuple(jnp.broadcast_to(jnp.asarray(cf, jnp.float32),
                                           (rows, nb_seg)) for cf in sec)
                    for sec in secs_b)
                groups.setdefault(layout, []).append(
                    (u, j, dev, m, slot, prefix, y, secs_full, fst, ctx))
        out: dict = {}
        for layout, items in groups.items():
            ycat = jnp.concatenate([it[6] for it in items], axis=0)
            secscat = tuple(
                tuple(jnp.concatenate([it[7][s][cf] for it in items],
                                      axis=0) for cf in range(5))
                for s in range(2))
            stcat = {layout: jnp.concatenate(
                [it[8][layout] for it in items], axis=0)}
            y2, st2 = welsh_model.cascade_slices(
                ycat, secscat, stcat, None)
            lo = 0
            for (u, j, dev, m, slot, prefix, y, _, fst, ctx) in items:
                hi = lo + y.shape[0]
                mono_rows = welsh_model.finish_slice(
                    dev.voice, y2[lo:hi], ctx)
                new_state[prefix + layout] = \
                    state[prefix + layout].at[slot].set(st2[layout][lo:hi])
                out[(u, j)] = jnp.sum(mono_rows * m[:, None], axis=0)
                lo = hi
        return out

    def _step_impl(self, state, xs, inputs, n: int):
        c = self.c
        t0 = xs["t0"]
        new_state = dict(state)
        outputs: dict[str, jnp.ndarray] = {}
        overrides: dict[tuple, jnp.ndarray] = {}
        sidechain_by_src = {}
        for src, tgt, pname in c.sidechain:
            sidechain_by_src.setdefault(src, []).append((tgt, pname))
        sends_by_aux = {}
        for src, aux, amount in c.sends:
            sends_by_aux.setdefault(aux, []).append((src, amount))

        sliced_merged = self._render_sliced_merged(
            inputs, xs, t0, n, state, new_state)
        for uvid in c.order:
            dev = c.devices[uvid]
            if dev.role == "instrument" or dev.kind == "calculator":
                outputs[uvid] = self._render_instrument_seg(
                    inputs, dev, xs, t0, n, state=state, new_state=new_state,
                    sliced_merged=sliced_merged)
                continue
            sources = c.sinks.get(uvid, [])
            acc = jnp.zeros((2, n), jnp.float32)
            for s in sources:
                if s in outputs:
                    acc = acc + outputs[s]
            for s, amount in sends_by_aux.get(uvid, []):
                if s in outputs:
                    acc = acc + amount * outputs[s]
            if dev.role == "controller" \
                    and dev.kind != "signal-passthrough-controller":
                continue
            outputs[uvid] = self._apply_effect_seg(
                inputs, dev, acc, t0, n, overrides, state, new_state)
            if uvid in sidechain_by_src:
                # one-block-delayed |mean| (render.py:437-444), the carried
                # scalar is the value exiting the previous segment
                last = acc[:, BLOCK - 1::BLOCK]
                val = jnp.abs(jnp.mean(last, axis=0))
                shifted = jnp.concatenate(
                    [state[f"{uvid}/sc"][None], val[:-1]])
                new_state[f"{uvid}/sc"] = val[-1]
                per_sample = _upsample(shifted, n)
                for tgt, pname in sidechain_by_src[uvid]:
                    # ControlValue -> DOMAIN units (see render.py's
                    # sidechain site; both engines must share the map)
                    from groove_tpu.compiler import params as param_mod
                    p = param_mod.resolve(self.c.devices[tgt].kind, pname)
                    overrides[(tgt, pname)] = (
                        param_mod.to_domain_array(p, per_sample)
                        if p is not None else per_sample)

        out = outputs.get(MAIN_MIXER_UVID, jnp.zeros((2, n), jnp.float32))
        return new_state, out.T  # [n, 2]

    # ---- drivers -----------------------------------------------------------

    def stream(self, prefetch_segments: int = 4,
               batch_segments: int = 1, quantize: bool = False,
               mono_fold: bool | None = None):
        """Python-loop driver: yields host [seg, 2] arrays covering exactly
        n_frames. Device memory is bounded by one segment + carried state
        regardless of song length.

        The tunnel-attached TPU on this machine costs ~24 ms per
        synchronous host<->device round trip, so the driver PIPELINES:
        JAX dispatch is async and the step's only cross-segment dependency
        is the carried state pytree (which stays on device), so up to
        `prefetch_segments` steps are enqueued ahead and results fetched
        behind — the readback of segment i overlaps the compute of
        i+1..i+k (VERDICT r2 weak #1).

        batch_segments > 1 additionally folds that many segments into ONE
        device program via lax.scan (`_scan_for`), amortizing the
        dispatch+readback RTT pair across the batch. The scan body is the
        same step function, but XLA may fuse a scan body differently from
        a standalone program (~3e-5 observed on welsh transcendentals), so
        the bitwise-segmentation guarantee is stated for batch_segments=1;
        batched streams agree to float tolerance.

        mono_fold (None = auto by channel_symmetric): fetch each segment
        as flat MONO + a device-computed tripwire element and duplicate
        to [seg, 2] host-side — same bytes the stereo fetch would emit
        (bitwise; the tripwire raises otherwise), at HALF the transfer
        size on the link-bound tunnel."""
        fold = self.mono_foldable if mono_fold is None else bool(mono_fold)
        if batch_segments > 1:
            yield from self._stream_batched(batch_segments,
                                            max(1, prefetch_segments),
                                            quantize, fold)
            return
        from collections import deque

        state = self._state0
        pending: deque = deque()  # device audio arrays, dispatch order
        emitted = 0

        def fetch(audio):
            nonlocal emitted
            take = min(self.S, self.c.n_frames - emitted)
            emitted += take
            out = np.asarray(audio)
            if fold:
                out = _unfold_mono(out)
            return out[:take]

        for k in range(self.n_segs):
            t0 = k * self.S
            xs = jax.device_put(self._seg_xs(t0, self.S))
            state, audio = self._step_for(self.S)(state, xs, self.inputs)
            if fold:
                audio = (_fold_mono_i16 if quantize
                         else _fold_mono_f32)(audio)
            elif quantize:
                audio = _quantize_device(audio)
            _copy_to_host_async(audio)
            pending.append(audio)
            if len(pending) > prefetch_segments:
                yield fetch(pending.popleft())
        while pending:
            yield fetch(pending.popleft())

    def _scan_for(self, seg_len: int, k: int):
        """Jitted program rendering k consecutive segments via lax.scan."""
        key = (seg_len, k)
        fn = getattr(self, "_scans", None)
        if fn is None:
            self._scans = {}
        fn = self._scans.get(key)
        if fn is None:
            def run(st, xs_, inputs):
                def body(state, xrow):
                    return self._step_impl(state, xrow, inputs, seg_len)
                return jax.lax.scan(body, st, xs_)

            fn = jax.jit(run)
            self._scans[key] = fn
        return fn

    def _stream_batched(self, k: int, prefetch_batches: int,
                        quantize: bool = False, fold: bool = False):
        """Batched driver: one dispatch + one readback per k segments.
        The final partial batch is PADDED to k with past-the-end segments
        (their audio is discarded) so only ONE scan program ever compiles
        — a fresh XLA compile costs ~2 min over this machine's tunnel.
        Fetches are started ASYNCHRONOUSLY right after dispatch
        (copy_to_host_async) and COMPLETED on a dedicated fetch thread,
        so the dispatch loop never blocks inside np.asarray and the
        device stays fed while a transfer drains the tunnel (the
        blocking completion in the dispatch thread was worth ~25% of
        the link-implied ceiling on this machine — ROOFLINE.md).
        The single worker executes fetches in submission order, which
        keeps the `emitted` tail-trim accounting sequential."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        state = self._state0
        pending: deque = deque()
        emitted = 0

        def fetch(audio):
            nonlocal emitted
            if fold:
                out = _unfold_mono(np.asarray(audio))
            else:
                out = np.asarray(audio).reshape(k * self.S, 2)
            take = min(k * self.S, self.c.n_frames - emitted)
            emitted += take
            return out[:take]

        n_batches = -(-self.n_segs // k)
        ex = ThreadPoolExecutor(max_workers=1)
        try:
            for b in range(n_batches):
                rows = [self._seg_xs((b * k + j) * self.S, self.S)
                        for j in range(k)]
                xs = {key: np.stack([r[key] for r in rows])
                      for key in rows[0]}
                state, audio = self._scan_for(self.S, k)(
                    state, jax.device_put(xs), self.inputs)
                if fold:
                    audio = (_fold_mono_i16 if quantize
                             else _fold_mono_f32)(audio)
                elif quantize:
                    audio = _quantize_device(audio)
                _copy_to_host_async(audio)
                pending.append(ex.submit(fetch, audio))
                if len(pending) > prefetch_batches:
                    yield pending.popleft().result()
            while pending:
                chunk = pending.popleft().result()
                if chunk.shape[0]:
                    yield chunk
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def render(self, batch_segments: int = 1,
               quantize: bool = False) -> np.ndarray:
        """Streamed render concatenated on the host."""
        if self.c.n_frames == 0:
            dt = np.int16 if quantize else np.float32
            return np.zeros((0, 2), dt)
        return np.concatenate(
            list(self.stream(batch_segments=batch_segments,
                             quantize=quantize)), axis=0)

    def render_scan(self) -> np.ndarray:
        """One-shot driver: the SAME step function under lax.scan, entire
        song in one device program (for the bitwise segmentation tests)."""
        rows = [self._seg_xs(k * self.S, self.S) for k in range(self.n_segs)]
        xs = {key: np.stack([r[key] for r in rows]) for key in rows[0]}
        _, segs = self._scan_for(self.S, self.n_segs)(
            self._state0, jax.device_put(xs), self.inputs)
        out = np.asarray(segs).reshape(self.n_segs * self.S, 2)
        return out[: self.c.n_frames]

    # ---- loop-range playback ------------------------------------------------

    def loop_frames(self, start_beats: float, end_beats: float):
        """Loop range beats -> 64-frame-quantized frame window (the
        reference seeks at tick-batch granularity, orchestrator.rs:868-874)."""
        tempo = Tempo(self.c.bpm)
        sr = SampleRate(self.c.sample_rate)
        ls = _round_block(beats_to_frames(tempo, sr, Fraction(start_beats)))
        le = _round_block(beats_to_frames(tempo, sr, Fraction(end_beats)))
        le = min(le, self.plan_frames)
        if le < BLOCK:
            # an empty window would make stream_loop(iterations=None)
            # spin forever yielding nothing (play_window(0, 0))
            raise ValueError(
                f"loop end {end_beats} beats quantizes to an empty window "
                f"(< {BLOCK} frames)")
        ls = max(0, min(ls, le - BLOCK))
        return ls, le

    def stream_loop(self, start_beats: float, end_beats: float,
                    iterations: int | None = None):
        """Loop-range playback: [0, end), then [start, end) repeatedly,
        carried state crossing every seam (the reference's clock seek,
        orchestrator.rs:868-874). iterations=None loops forever; the
        generator yields host [seg, 2] arrays."""
        if self._sliced:
            raise NotImplementedError(
                "sliced welsh is linear-stream only: a seek rewinds note "
                "ages, which the carried per-note cascade state cannot "
                "follow — use WELSH_SLICED=False for loop playback")
        ls, le = self.loop_frames(start_beats, end_beats)
        state = self._state0

        def play_window(state, lo, hi):
            t0 = lo
            while t0 < hi:
                n = min(self.S, hi - t0)  # multiple of 64 by construction
                xs = jax.device_put(self._seg_xs(t0, n))
                state, audio = self._step_for(n)(state, xs, self.inputs)
                yield_chunk = np.asarray(audio)
                t0 += n
                yield state, yield_chunk

        for state, chunk in play_window(state, 0, le):
            yield chunk
        it = 0
        while iterations is None or it < iterations:
            for state, chunk in play_window(state, ls, le):
                yield chunk
            it += 1

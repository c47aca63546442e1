"""Single-song timeline sharding over a device mesh (VERDICT r2 item 3).

The whole-song render of ONE arbitrary song, sharded across chips along
the audio timeline — the missing piece between `parallel/timeshard.py`
(which sharded one biquad) and the render path. The design rides two
proven facts:

  1. The segment-streaming step (engine/stream.StreamingRenderer._step_impl)
     renders ANY song segment given an explicit entry-state pytree, with a
     segmentation-invariant float schedule — so "one device per contiguous
     time shard" is just D streaming segments evaluated in parallel.
     Instruments are embarrassingly parallel: a note overlapping a shard
     renders its window inside that shard exactly as the streamed path
     does (the welsh internal cascade is per-note, never cross-shard).

  2. Every carried effect state forgets exponentially: biquad poles decay
     |p|^n, feedback combs g^(n/D), compressor followers e^(-n/tau),
     delay/chorus lines remember exactly D_line input samples. So the
     cross-shard state dependency resolves by RELAXATION: round 0 renders
     every shard from zero entry state in parallel; each further round
     sends every shard's exit state one hop right over ICI
     (`lax.ppermute`) and re-renders. After K rounds a shard's audio is
     exact up to contributions older than K full shards — decayed by e.g.
     |p|^(K*S): for the deepest corpus pole (25 Hz, q 5.33, |p|~0.9998)
     and one-second shards, that is ~1e-38 after ONE round. The default
     K=2 makes the bound quadratically smaller still.

Cost: (K+1) renders spread over D devices — wall-clock speedup D/(K+1)
on the instrument+effect compute, with only tiny state pytrees crossing
chips. Collectives ride ICI; the host sees one gathered [n, 2] array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from groove_tpu.compiler.song import CompiledSong
from groove_tpu.engine.stream import BLOCK, StreamingRenderer
from groove_tpu.parallel.mesh import make_mesh


def effect_memory_seconds(compiled: CompiledSong) -> float:
    """Upper bound on how long any carried effect state remembers its
    input, to a −100 dBFS contribution: delay/chorus lines remember
    exactly their length; a feedback comb decays 60 dB per RT60 (so
    5/3·RT60 reaches −100 dB); a smoothed follower forgets e^(−t/release)
    (11.5·release for 1e−5); biquad poles — 1.9 s generously covers the
    deepest reachable corpus pole (25 Hz q 5.33: |p| ≈ 1−3.3e−4,
    ln(1e−5)/ln|p| ≈ 0.79 s).

    A time-driven param is bounded by its MAXIMUM over every source the
    engines honor, mirroring StreamingRenderer._init_state's tail sizing:
    the static value, a trip/LFO automation curve's host maximum, and —
    for signal-passthrough (sidechain) links, whose runtime value has no
    compile-time maximum — the engine-wide SIDECHAIN_SECONDS_MAX clamp
    the dispatch sites apply."""
    from groove_tpu.engine.render import SIDECHAIN_SECONDS_MAX

    sc_targets = {(t, p) for _, t, p in compiled.sidechain}

    def pmax(dev, name) -> float:
        v = float(dev.params.get(name, 0.0))
        if name in dev.automation:
            curve = np.asarray(dev.automation[name])
            if curve.size:
                v = max(v, float(np.max(curve)))
        if (dev.uvid, name) in sc_targets:
            v = max(v, SIDECHAIN_SECONDS_MAX)
        return v

    mem = 0.0
    for dev in compiled.devices.values():
        k = dev.kind
        if k == "delay":
            mem = max(mem, pmax(dev, "delay"))
        elif k == "chorus":
            mem = max(mem, pmax(dev, "delay-seconds"))
        elif k == "reverb":
            mem = max(mem, 5.0 / 3.0 * pmax(dev, "seconds") + 0.05)
        elif k == "compressor":
            mem = max(mem, 11.5 * max(pmax(dev, "release"),
                                      pmax(dev, "attack")))
        elif k.startswith("filter-"):
            mem = max(mem, 1.9)
    return mem


class MeshRenderer:
    """Renders one compiled song with its timeline sharded over a mesh.

    iterations: state-relaxation rounds after the zero-state round; each
    round extends exactness one full shard of effect memory back.
    iterations=None (default) derives the count from the song's effect
    memory: ceil(memory / shard_seconds), clamped to [1, 8]. Short songs
    with long reverbs need more rounds (and gain less from sharding);
    long songs converge in one."""

    def __init__(self, compiled: CompiledSong, mesh: Mesh | None = None,
                 iterations: int | None = None, axis: str = "time"):
        self.c = compiled
        self.mesh = mesh or make_mesh(axis=axis)
        self.axis = axis
        d = self.mesh.shape[axis]
        self.n_devices = d
        # shard length: the plan split into d equal 64-frame-multiple spans
        shard = -(-compiled.n_frames // (d * BLOCK)) * BLOCK
        self.S = max(BLOCK, shard)
        if iterations is None:
            mem_frames = int(effect_memory_seconds(compiled)
                             * compiled.sample_rate)
            iterations = min(8, max(1, -(-mem_frames // self.S)))
        self.iterations = int(iterations)
        self.stream = StreamingRenderer(compiled, segment_frames=self.S)
        # the streaming plan covers ceil(n/S) segments; pad the xs rows to
        # exactly d shards (past-the-end shards render silence and their
        # state never flows left)
        self._fn = None

    def _build(self):
        s = self.stream
        d = self.n_devices
        rows = [s._seg_xs(k * self.S, self.S) for k in range(d)]
        xs = {key: np.stack([r[key] for r in rows]) for key in rows[0]}
        state0 = s._state0
        iters = self.iterations
        axis = self.axis
        perm = [(i, i + 1) for i in range(d - 1)]

        def local_fn(xs_row, state_z, inputs):
            # xs_row leaves carry this device's row: leading dim 1
            xs_l = jax.tree_util.tree_map(lambda a: a[0], xs_row)
            # make the zero entry state device-varying so ppermute and the
            # carried pytree type-check under shard_map (timeshard.py:66)
            vary = 0.0 * jnp.sum(xs_l["t0"].astype(jnp.float32))
            entry = jax.tree_util.tree_map(lambda z: z + vary, state_z)
            audio = None
            for _ in range(iters + 1):
                exit_state, audio = s._step_impl(entry, xs_l, inputs, self.S)
                entry = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, axis, perm), exit_state)
            return audio  # [S, 2], concatenated over the mesh axis

        fn = shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(), P()),
            out_specs=P(self.axis),
        )
        jfn = jax.jit(fn)
        self._xs = jax.device_put(xs)
        self._state_z = state0
        self._fn = jfn

    def render(self) -> np.ndarray:
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.float32)
        if self._fn is None:
            self._build()
        out = self._fn(self._xs, self._state_z, self.stream.inputs)
        return np.asarray(out)[: self.c.n_frames]

    def render_quantized(self) -> np.ndarray:
        """int16 fetch (device-side quantization as a separate program —
        see io.wav.quantize_16bit_jit; bitwise the host WAV spec)."""
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.int16)
        if self._fn is None:
            self._build()
        out = self._fn(self._xs, self._state_z, self.stream.inputs)
        from groove_tpu.io.wav import quantize_16bit_jit

        return np.asarray(quantize_16bit_jit(out))[: self.c.n_frames]

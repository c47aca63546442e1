"""Multi-device render of an ARBITRARY compiled song.

parallel/mesh.py shards a uniform track batch SPMD-style (shard_map +
psum) — the right mapping when every shard runs the same program. A real
DAW song is heterogeneous: each chain into the main mixer is a different
little program (different instruments, different effect stacks), so
forcing SPMD would mean padding every chain to the worst case. The
TPU-native answer for heterogeneous graphs is concurrent MPMD dispatch:

  1. partition the song graph into independent COMPONENTS — connected
     components over audio edges, aux sends, and sidechain control edges,
     excluding the global main-mixer sink (a sidechain that observes one
     chain and compresses another welds those chains together, exactly
     like the reference's single-threaded evaluation order would);
  2. compile each component as its own sub-song program, placed
     round-robin over the available devices (jax.jit(device=...));
  3. dispatch all component renders asynchronously (JAX dispatch is
     non-blocking, so D devices compute concurrently), then sum the
     partial mixes on device 0.

Nonlinear effects (compressor, bitcrusher, limiter) make the mix
non-distributive ACROSS a chain — but every nonlinear effect lives inside
one component and sees its full input there; only the final linear mix-bus
sum crosses devices. Output matches the single-device Renderer up to
float-sum reassociation of the mix bus (~1e-6), verified in
tests/test_parallel.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from groove_tpu.compiler.song import MAIN_MIXER_UVID, CompiledSong
from groove_tpu.engine.render import Renderer


def partition_components(c: CompiledSong) -> list[list[str]]:
    """Connected components of the device graph (audio edges + sends +
    sidechain), excluding the main mixer. Returns lists of uvids in the
    compiled topological order; components are ordered by their first
    source's position in the main mix (deterministic partial-mix sum
    order)."""
    parent: dict[str, str] = {}

    def find(a: str) -> str:
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: str, b: str) -> None:
        parent[find(a)] = find(b)

    for u in c.devices:
        if u != MAIN_MIXER_UVID:
            find(u)
    for sink, sources in c.sinks.items():
        for src in sources:
            if sink != MAIN_MIXER_UVID and src != MAIN_MIXER_UVID:
                union(sink, src)
    for src, aux, _ in c.sends:
        union(src, aux)
    for src, tgt, _ in c.sidechain:
        union(src, tgt)

    groups: dict[str, list[str]] = {}
    for u in c.order:
        if u == MAIN_MIXER_UVID or u not in c.devices:
            continue
        groups.setdefault(find(u), []).append(u)
    # deterministic order: by first appearance in the topological order
    return sorted(groups.values(), key=lambda g: c.order.index(g[0]))


def _sub_song(c: CompiledSong, comp: list[str]) -> CompiledSong:
    """A CompiledSong containing one component plus its own main mixer."""
    comp_set = set(comp)
    devices = {u: c.devices[u] for u in comp}
    devices[MAIN_MIXER_UVID] = c.devices[MAIN_MIXER_UVID]
    sinks = {
        sink: [s for s in sources if s in comp_set]
        for sink, sources in c.sinks.items()
        if sink in comp_set or sink == MAIN_MIXER_UVID
    }
    order = [u for u in c.order if u in comp_set or u == MAIN_MIXER_UVID]
    return dataclasses.replace(
        c,
        devices=devices,
        sinks=sinks,
        order=order,
        sidechain=[e for e in c.sidechain if e[0] in comp_set],
        sends=[e for e in c.sends if e[0] in comp_set],
    )


class MultiDeviceRenderer:
    """Concurrent per-component rendering across devices."""

    def __init__(self, compiled: CompiledSong, devices=None):
        self.c = compiled
        self.devices = list(devices if devices is not None else jax.devices())
        comps = partition_components(compiled)
        self.assignments = []  # (component uvids, device, Renderer)
        for i, comp in enumerate(comps):
            dev = self.devices[i % len(self.devices)]
            sub = _sub_song(compiled, comp)
            r = Renderer(sub)
            # committing the inputs to the device places the computation
            # there (jit follows committed operands)
            r.inputs = jax.device_put(r.inputs, dev)
            self.assignments.append((comp, dev, r))

    def _mix_device(self):
        """Async dispatch on every device, then one gather-and-sum to a
        device-0-resident [n, 2] mix."""
        partials = [r._fn(r.inputs) for _, _, r in self.assignments]
        d0 = self.devices[0]
        mix = jax.device_put(jnp.zeros((self.c.n_frames, 2), jnp.float32),
                             d0)
        for p in partials:
            mix = mix + jax.device_put(p, d0)
        return mix

    def render(self) -> np.ndarray:
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.float32)
        return np.asarray(self._mix_device())

    def render_quantized(self) -> np.ndarray:
        """int16 fetch of the mixed render (device-side quantization as a
        separate program — see io.wav.quantize_16bit_jit; bitwise the
        host WAV spec). The CLI --wav --multidevice path uses it."""
        if self.c.n_frames == 0:
            return np.zeros((0, 2), np.int16)
        from groove_tpu.io.wav import quantize_16bit_jit

        return np.asarray(quantize_16bit_jit(self._mix_device()))

"""groove_tpu — a TPU-native rebuild of the Groove DAW engine.

Groove (the reference, sowbug/groove) is a Rust DAW engine that parses
declarative JSON5 "song" project files, instantiates a graph of entities
(instruments, effects, controllers), routes MIDI and control automation
between them, and renders stereo audio sample-by-sample to a WAV file.

groove_tpu keeps the project-file format, entity inventory, and audible
behavior, but replaces the sample-serial dyn-dispatch render loop
(reference: orchestration/src/orchestrator.rs:367-470 `gather_audio`)
with a *compiler*:

    project file -> song IR -> per-block control/event tensors
                 -> one fused XLA program per song -> WAV

Everything dynamic in the reference happens at trace time; everything
per-sample happens inside jit on the TPU's VPU/MXU. Stateful DSP (IIR
filters, delays, envelope followers) becomes block-parallel state-space
recurrences (associative scans), not per-sample loops.

Layout:
    core/      value types, musical time (reference: ensnare-core use sites)
    project/   JSON5 parser + settings schema (reference: settings/)
    compiler/  sequencer/automation/graph compilation (reference:
               orchestration/src/orchestrator.rs + songs.rs, re-designed)
    ops/       JAX DSP kernels (reference: missing groove-core generators +
               groove-entities DSP, reconstructed from doc/ + schemas)
    models/    instruments: Welsh, FM, sampler, drumkit, toys
    engine/    whole-song render programs, mix bus
    parallel/  multi-chip sharding (tracks/chains over a jax Mesh)
    io/        WAV read/write, asset path search
    utils/     profiling, logging
"""

__version__ = "0.1.0"

from groove_tpu.core.time import (  # noqa: F401
    BeatValue,
    MusicalTime,
    SampleRate,
    Tempo,
    TimeSignature,
    UNITS_IN_BEAT,
)

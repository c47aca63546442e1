"""Song compiler: project settings -> static tensors + render plan.

The reference routes MIDI and control events dynamically per 64-frame
buffer (orchestration/src/orchestrator.rs:631-775). For offline rendering
every event time is known before the first sample, so this package
precomputes:

  - note events per instrument (sequencer patterns stamped per track,
    arpeggiator MIDI->MIDI transforms applied host-side),
  - per-block control curves (trips/paths, LFO controllers),
  - the flattened audio graph (patch cables) with a topological schedule
    including sidechain (audio->control) dependencies,
  - the exact render length in frames (buffer-granular, matching the
    reference's handle_work termination).
"""

"""Instrument models.

Each model renders a *batch of note events* for one instrument as a
[n_notes, span] (mono) or [n_notes, 2, span] (stereo) tensor over a fixed
per-instrument span window, entirely data-parallel on the VPU; the engine
scatter-adds note windows into the song timeline. This replaces the
reference's per-voice `tick(1)`/`value()` loop
(orchestration/src/orchestrator.rs:397-410) with one fused XLA program.
"""

"""JAX DSP kernels.

Conventions:
  - audio is float32, time on the LAST axis; stereo is [2, n]; batches of
    voices/notes are leading axes.
  - "block" = 64 frames, the reference's control/event granularity
    (SAMPLE_BUFFER_SIZE, src/bin/groove-cli.rs:11).
  - everything here is jit-safe: static shapes, no Python control flow on
    traced values.
"""

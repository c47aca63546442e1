"""Multi-chip sharding.

The reference is single-process/single-thread (SURVEY §2.3); the TPU-native
analog of parallelism for this workload:
  - within chip: voices x notes x time batched on the VPU (ops/, models/)
  - across chips (ICI): shard tracks/instruments over a Mesh axis and
    psum the mix bus (parallel/mesh.py)
  - across hosts (DCN): embarrassingly-parallel batch rendering of
    independent songs.
"""

"""Chunked-grid drum accumulation kernel vs the XLA dynamic-slice loop.

Interpret mode on CPU; the kernel's chunk-halo carry must reproduce the
XLA path for hits that cross chunk boundaries and for songs longer than
one chunk (the round-1 kernel was gated to timelines that fit VMEM)."""

import numpy as np
import pytest
import jax.numpy as jnp

from groove_tpu.models.sampler import accumulate_oneshots
from groove_tpu.ops import pallas_drums as pd


@pytest.fixture
def table(rng=None):
    r = np.random.default_rng(11)
    data = (r.standard_normal((4, 2, 700)) * 0.5).astype(np.float32)
    lengths = np.array([700, 650, 300, 120], np.int64)
    for s, ln in enumerate(lengths):
        data[s, :, ln:] = 0.0
    return data, lengths


def _run_both(table, lengths, slots, on, vels, n_frames):
    gate = np.full(len(slots), 2**30, np.int64)
    y_ref = np.asarray(accumulate_oneshots(
        jnp.asarray(table), jnp.asarray(lengths), slots, on,
        gate, vels, n_frames,
    ))
    ptable = pd.prepare_table(table)
    meta = pd.prepare_hits(slots, on, gate, vels, lengths, n_frames)
    y_pl = np.asarray(pd.accumulate_oneshots_pallas(
        jnp.asarray(ptable), *[jnp.asarray(m) for m in meta],
        n_frames=n_frames, interpret=True,
    ))
    return y_ref, y_pl


def test_single_chunk_matches_xla(table):
    data, lengths = table
    slots = np.array([0, 1, 2, 3, -1, 0], np.int32)
    on = np.array([0, 128, 192, 1024, 2048, 4096], np.int64)
    vels = np.array([127, 100, 64, 127, 127, 30], np.float32)
    y_ref, y_pl = _run_both(data, lengths, slots, on, vels, 8192)
    assert np.max(np.abs(y_pl - y_ref)) < 1e-6


def test_multi_chunk_and_boundary_crossing(table):
    data, lengths = table
    n = pd.CHUNK * 3 + 5000  # 4 chunks
    # hits straddling every chunk edge (rows extend past the boundary),
    # plus interior hits and one in the final partial chunk
    edges = [pd.CHUNK - 256, pd.CHUNK - 64, 2 * pd.CHUNK - 128,
             3 * pd.CHUNK - 192]
    interior = [512, pd.CHUNK + 960, 2 * pd.CHUNK + 64, 3 * pd.CHUNK + 4096]
    on = np.array(edges + interior, np.int64)
    slots = np.array([0, 1, 0, 1, 2, 3, 2, 0], np.int32)
    vels = np.full(len(on), 110.0, np.float32)
    y_ref, y_pl = _run_both(data, lengths, slots, on, vels, n)
    assert np.max(np.abs(y_pl - y_ref)) < 1e-6


def test_hit_past_end_is_dropped(table):
    data, lengths = table
    n = 4096
    slots = np.array([0, 1], np.int32)
    on = np.array([128, 8192], np.int64)  # second starts past the end
    vels = np.array([127, 127], np.float32)
    y_ref, y_pl = _run_both(data, lengths, slots, on, vels, n)
    assert np.max(np.abs(y_pl - y_ref)) < 1e-6

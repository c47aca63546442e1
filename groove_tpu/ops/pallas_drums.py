"""Pallas kernel for one-shot sample accumulation (drum tracks).

The XLA path (models/sampler.accumulate_oneshots) walks hits with
dynamic-slice read-add-writes over an HBM timeline — measured 0.72 ms of
the north star's 1.3 ms render, and ~31 ms for a 2-minute SMF. Here the
timeline is processed in VMEM-resident CHUNKS (grid over time), so song
length is unbounded:

  - the grid walks chunks of C frames; a [2, C + row_len] VMEM accumulator
    carries across grid steps (TPU grids run sequentially), its halo
    holding rows that spill past the chunk edge;
  - every hit is assigned (host-side — hit times are static) to exactly
    the chunk containing its start; per-chunk hit lists ride in via scalar
    prefetch, padded to the max per-chunk count with a per-chunk COUNT so
    padding costs nothing;
  - each hit's sample row is DMA'd from the HBM-resident table
    (pltpu.make_async_copy with a dynamic slot index) and added in place;
  - hit starts are 64-frame aligned (the engine's buffer quantization);
    Mosaic requires 128-aligned lane offsets, so starts are rounded down
    to 128 and the row is pre-shifted by a static 64 when needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_PAD = 128    # row length padded to a lane multiple (plus shift headroom)
CHUNK = 65536    # timeline frames per grid step (multiple of 128)


def _kernel(counts_ref, slots_ref, starts_ref, shifts_ref, limits_ref,
            vels_ref, table_ref, y_ref, acc_s, row_s, sem):
    c = pl.program_id(0)
    row_len = row_s.shape[-1]
    C = y_ref.shape[-1]

    @pl.when(c == 0)
    def _init():
        acc_s[:, :] = jnp.zeros_like(acc_s)

    @pl.when(c > 0)
    def _carry():
        # slide the window: last chunk's halo becomes this chunk's head
        tail = acc_s[:, C:C + row_len]
        acc_s[:, :] = jnp.zeros_like(acc_s)
        acc_s[:, :row_len] = tail

    def hit(i, _):
        slot = slots_ref[c, i]
        dma = pltpu.make_async_copy(table_ref.at[slot], row_s, sem)
        dma.start()
        dma.wait()
        row = row_s[:, :]
        # mask beyond the sample/gate limit, scale by velocity
        j = jax.lax.broadcasted_iota(jnp.int32, (1, row_len), 1)
        row = row * (j < limits_ref[c, i]).astype(jnp.float32) * (
            vels_ref[c, i] / 127.0
        )
        # hits are 64-aligned; lane offsets must be 128-aligned: shift the
        # row right by a static 64 when the start was an odd 64-multiple
        shifted = jnp.concatenate(
            [jnp.zeros((2, 64), jnp.float32), row[:, :-64]], axis=1
        )
        row = jnp.where(shifts_ref[c, i] > 0, shifted, row)
        local = pl.multiple_of(starts_ref[c, i], 128)  # start - c*C, in [0, C)
        cur = acc_s[:, pl.ds(local, row_len)]
        acc_s[:, pl.ds(local, row_len)] = cur + row
        return 0

    jax.lax.fori_loop(0, counts_ref[c], hit, 0)
    y_ref[:, :] = acc_s[:, :C]


def accumulate_oneshots_pallas(table_padded, counts, slots, starts, shifts,
                               limits, vels, n_frames: int,
                               interpret: bool | None = None):
    """Public wrapper: resolves interpret=None -> pallas_iir's
    FORCE_INTERPRET (the CI suite's route to running the shipped kernels
    through the interpreter on CPU), OUTSIDE the jit cache so a flag flip
    can never serve a stale compile."""
    from groove_tpu.ops.pallas_iir import _interp
    return _accumulate_oneshots_jit(
        table_padded, counts, slots, starts, shifts, limits, vels,
        n_frames=n_frames, interpret=_interp(interpret))


@functools.partial(jax.jit, static_argnames=("n_frames", "interpret"))
def _accumulate_oneshots_jit(
    table_padded,   # [slots, 2, row_len] f32 (row_len = 128-multiple + 64)
    counts,         # [nchunks] int32 hits per chunk
    slots,          # [nchunks, M] int32
    starts,         # [nchunks, M] int32, 128-aligned, chunk-LOCAL
    shifts,         # [nchunks, M] int32, 1 -> +64 frames
    limits,         # [nchunks, M] int32, valid samples in the row
    vels,           # [nchunks, M] float32
    n_frames: int,
    interpret: bool = False,
):
    row_len = table_padded.shape[-1]
    nchunks = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table off-chip
        out_specs=pl.BlockSpec((2, CHUNK), lambda c, *_refs: (0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK + row_len), jnp.float32),
            pltpu.VMEM((2, row_len), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nchunks * CHUNK), jnp.float32),
        interpret=interpret,
    )(counts, slots, starts, shifts, limits, vels, table_padded)
    return y[:, :n_frames]


def prepare_table(table_data: np.ndarray) -> np.ndarray:
    """Pad [slots, 2, max_len] to a 128-multiple row length + 64 headroom."""
    max_len = table_data.shape[-1]
    row_len = -(-max_len // 128) * 128 + 128
    out = np.zeros(table_data.shape[:-1] + (row_len,), np.float32)
    out[..., :max_len] = table_data
    return out


def prepare_hits(slots, on_frames, gate_frames, vels, lengths,
                 n_frames: int):
    """Host-side per-chunk hit lists (hit times are static at compile).

    Returns (counts [nchunks], and [nchunks, M] slot/start/shift/limit/vel
    arrays) with starts chunk-local and 128-aligned; the 64-remainder is
    folded into a row shift."""
    slots = np.asarray(slots, np.int32)
    on = np.asarray(on_frames, np.int64)
    rem = (on % 128).astype(np.int64)
    assert np.all((rem == 0) | (rem == 64)), "hits must be 64-aligned"
    starts = (on - rem).astype(np.int64)
    shifts = (rem // 64).astype(np.int32)
    limit = np.minimum(np.asarray(lengths, np.int64)[np.maximum(slots, 0)],
                       np.asarray(gate_frames, np.int64)).astype(np.int32)
    vels_eff = np.where(slots >= 0, np.asarray(vels, np.float32), 0.0)
    live = (vels_eff > 0) & (limit > 0) & (starts < n_frames)
    chunk_of = (starts // CHUNK).astype(np.int64)
    nchunks = max(1, -(-n_frames // CHUNK))
    counts = np.zeros(nchunks, np.int32)
    order = np.argsort(chunk_of[live], kind="stable")
    idx_live = np.nonzero(live)[0][order]
    for i in idx_live:
        counts[chunk_of[i]] += 1
    M = max(1, int(counts.max()) if len(idx_live) else 1)
    shape = (nchunks, M)
    o_slots = np.zeros(shape, np.int32)
    o_starts = np.zeros(shape, np.int32)
    o_shifts = np.zeros(shape, np.int32)
    o_limits = np.zeros(shape, np.int32)
    o_vels = np.zeros(shape, np.float32)
    fill = np.zeros(nchunks, np.int32)
    for i in idx_live:
        ci = int(chunk_of[i])
        k = fill[ci]
        fill[ci] = k + 1
        o_slots[ci, k] = max(int(slots[i]), 0)
        o_starts[ci, k] = int(starts[i] - ci * CHUNK)
        o_shifts[ci, k] = int(shifts[i])
        o_limits[ci, k] = int(limit[i])
        o_vels[ci, k] = float(vels_eff[i])
    return counts, o_slots, o_starts, o_shifts, o_limits, o_vels

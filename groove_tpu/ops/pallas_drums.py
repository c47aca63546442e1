"""Pallas kernel for one-shot sample accumulation (drum tracks).

The XLA path (models/sampler.accumulate_oneshots) walks hits with
dynamic-slice read-add-writes over an HBM timeline — measured 0.72 ms of
the north star's 1.3 ms render. Here the whole timeline lives in VMEM and
each hit's sample row is DMA'd from the HBM table and added in place:

  - hit metadata (slot, aligned start, 64-sample shift flag, length limit,
    velocity) arrives via scalar prefetch (SMEM);
  - rows are fetched with pltpu.make_async_copy from the HBM-resident
    table (dynamic slot index);
  - hit starts are 64-frame aligned (the engine's buffer quantization);
    Mosaic requires 128-aligned lane offsets, so starts are rounded down
    to 128 and the row is pre-shifted by a static 64 when needed.

Applicability is gated by VMEM: timeline [2, n] plus one row buffer must
fit (~10 MB); the engine falls back to the XLA loop otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_PAD = 128  # row length padded to a lane multiple (plus shift headroom)


def _kernel(slots_ref, starts_ref, shifts_ref, limits_ref, vels_ref,
            table_ref, y_ref, row_s, sem):
    n_hits = slots_ref.shape[0]
    row_len = row_s.shape[-1]

    acc_s = y_ref  # accumulate in the output tile (saves 8 MB of VMEM)
    acc_s[:, :] = jnp.zeros_like(acc_s)

    def hit(i, _):
        slot = slots_ref[i]
        dma = pltpu.make_async_copy(
            table_ref.at[slot], row_s, sem
        )
        dma.start()
        dma.wait()
        row = row_s[:, :]
        # mask beyond the sample/gate limit, scale by velocity
        j = jax.lax.broadcasted_iota(jnp.int32, (1, row_len), 1)
        row = row * (j < limits_ref[i]).astype(jnp.float32) * (
            vels_ref[i] / 127.0
        )
        # hits are 64-aligned; lane offsets must be 128-aligned: shift the
        # row right by a static 64 when the start was an odd 64-multiple
        shifted = jnp.concatenate(
            [jnp.zeros((2, 64), jnp.float32), row[:, :-64]], axis=1
        )
        row = jnp.where(shifts_ref[i] > 0, shifted, row)
        start = pl.multiple_of(starts_ref[i], 128)
        cur = acc_s[:, pl.ds(start, row_len)]
        acc_s[:, pl.ds(start, row_len)] = cur + row
        return 0

    jax.lax.fori_loop(0, n_hits, hit, 0)


@functools.partial(jax.jit, static_argnames=("n_frames", "interpret"))
def accumulate_oneshots_pallas(
    table_padded,   # [slots, 2, row_len] f32 (row_len = 128-multiple + 64)
    slots,          # [h] int32 (silent hits pre-filtered or slot 0 + vel 0)
    starts128,      # [h] int32, 128-aligned start frames
    shifts,         # [h] int32, 1 -> +64 frames
    limits,         # [h] int32, valid samples in the row (post-shift basis)
    vels,           # [h] float32
    n_frames: int,
    interpret: bool = False,
):
    row_len = table_padded.shape[-1]
    n_pad = -(-(n_frames + row_len) // 128) * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table stays off-chip
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, row_len), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, n_pad), jnp.float32),
        interpret=interpret,
    )(slots, starts128, shifts, limits, vels, table_padded)
    return y[:, :n_frames]


def prepare_table(table_data: np.ndarray) -> np.ndarray:
    """Pad [slots, 2, max_len] to a 128-multiple row length + 64 headroom."""
    max_len = table_data.shape[-1]
    row_len = -(-max_len // 128) * 128 + 128
    out = np.zeros(table_data.shape[:-1] + (row_len,), np.float32)
    out[..., :max_len] = table_data
    return out


def prepare_hits(slots, on_frames, gate_frames, vels, lengths):
    """Host-side metadata: align starts to 128, fold the remainder into a
    64-sample row shift, clamp limits."""
    slots = np.asarray(slots, np.int32)
    on = np.asarray(on_frames, np.int64)
    rem = (on % 128).astype(np.int64)
    assert np.all((rem == 0) | (rem == 64)), "hits must be 64-aligned"
    starts = (on - rem).astype(np.int32)
    shifts = (rem // 64).astype(np.int32)
    limit = np.minimum(np.asarray(lengths, np.int64)[np.maximum(slots, 0)],
                       np.asarray(gate_frames, np.int64))
    # limit applies pre-shift; the masked row is then shifted, so express
    # it post-shift: masked length + shift
    limits = (limit).astype(np.int32)
    vels_eff = np.where(slots >= 0, np.asarray(vels, np.float32), 0.0)
    return (np.maximum(slots, 0), starts, shifts, limits,
            vels_eff.astype(np.float32))

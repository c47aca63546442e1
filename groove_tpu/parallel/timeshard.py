"""Time-sharded (sequence-parallel) IIR filtering over a device mesh.

SURVEY §5 frames the audio timeline as this workload's "long context": the
blockwise state-space formulation makes the timeline shardable. Each device
filters its own time segment; the only cross-device data is the 2-value
filter state at segment boundaries, composed EXACTLY via each segment's
affine transition (M_seg, C_seg):

  pass 1 (parallel): every device runs the blocked scan on its segment
          with zero entry state, returning (y0, C_seg, M_seg);
  all_gather of D tiny (M, C) pairs over ICI;
  entry-state composition: device d folds segments 0..d-1 (a D-step scalar
          loop — D is the mesh size, not the signal length);
  pass 2 (parallel): re-run the blocked scan with the exact entry state.

Cost: 2x the single-device filter FLOPs spread over D devices — wall-clock
speedup D/2 with bit-exact results (the recurrence order per sample is
unchanged). This is the context-parallelism analog for audio: no ring
attention needed, just a 48-byte collective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from groove_tpu.ops import iir


def biquad_timesharded(x, coefs, mesh: Mesh, axis_name: str = "time"):
    """Filter a 1-D signal sharded over `axis_name`.

    x: [n] with n divisible by (mesh size * iir.BIQUAD_BLOCK);
    coefs: 5-tuple, each scalar or [n] (per-sample automation).
    """
    n = x.shape[-1]
    d = mesh.shape[axis_name]
    assert n % (d * iir.BIQUAD_BLOCK) == 0, (
        "segment length must be a block multiple"
    )
    coef_arrays = tuple(
        jnp.broadcast_to(jnp.asarray(c, jnp.float32), (n,)) for c in coefs
    )

    def local_fn(x_l, b0, b1, b2, a1, a2):
        local_coefs = (b0, b1, b2, a1, a2)
        _, (c1, c2), (m11, m12, m21, m22) = iir.biquad(
            x_l, local_coefs, block=iir.BIQUAD_BLOCK, return_state=True
        )
        # gather every segment's transition (tiny: 6 scalars per device)
        seg = jnp.stack([m11, m12, m21, m22, c1, c2])        # [6]
        segs = jax.lax.all_gather(seg, axis_name)             # [D, 6]
        idx = jax.lax.axis_index(axis_name)

        def compose(i, S):
            s1, s2 = S
            mi = segs[i]
            n1 = mi[0] * s1 + mi[1] * s2 + mi[4]
            n2 = mi[2] * s1 + mi[3] * s2 + mi[5]
            use = i < idx
            return (jnp.where(use, n1, s1), jnp.where(use, n2, s2))

        # init derived from local data so the carry's sharding/vma type
        # matches the loop body's outputs under shard_map
        zero = jnp.sum(x_l) * 0.0
        entry = jax.lax.fori_loop(0, d, compose, (zero, zero))
        return iir.biquad(x_l, local_coefs, block=iir.BIQUAD_BLOCK,
                          initial_state=entry)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name),) * 6,
        out_specs=P(axis_name),
    )
    return fn(x, *coef_arrays)

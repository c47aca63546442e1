"""Track-sharded rendering over a jax Mesh.

Design (tpu-first, no reference analog — the reference renders serially on
one CPU thread): the mix bus is a sum over track outputs
(orchestration/src/orchestrator.rs:397-459), which maps exactly onto a
`psum` over a 'tracks' mesh axis. Each device renders its shard of tracks
(note batches through the voice kernels + per-track effect chains) locally;
one collective produces the master mix. Collectives ride ICI; nothing else
crosses chips.

Also provides song-batch data parallelism: N independent songs sharded one
per device ('songs' axis), no collectives at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from groove_tpu.models import welsh as welsh_model
from groove_tpu.models.voices import scatter_notes
from groove_tpu.ops import iir


def make_mesh(n_devices: int | None = None, axis: str = "tracks") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(mesh_utils.create_device_mesh((n,), devices=devs[:n]), (axis,))


def sharded_welsh_mix_step(
    voice_params,
    n_frames: int,
    span: int,
    sample_rate: float,
    mesh: Mesh,
):
    """Build a jitted multi-chip render step.

    Inputs (sharded over 'tracks'):
      keys/vels/gates/ons: [n_tracks, notes_per_track]
      gains: [n_tracks] per-track gain-effect ceilings
    Output (replicated): master mix [2, n_frames] = psum over track shards.

    Each shard renders its tracks' Welsh note batches, scatters them into
    the timeline, applies the track's effect (gain + a static low-pass as a
    stand-in chain), and the mix bus is one psum over ICI.
    """

    def render_local(keys, vels, gates, ons, gains):
        # local shard: [tracks_local, notes]
        def one_track(k, v, g, o, gain):
            mono = welsh_model.render_notes(
                voice_params, k, v, g, span, sample_rate
            )
            track = scatter_notes(mono, o, n_frames)
            track = iir.biquad(
                track, iir.rbj_low_pass(8000.0, 0.707, sample_rate)
            )
            return jnp.stack([track, track]) * gain

        tracks = jax.vmap(one_track)(keys, vels, gates, ons, gains)
        local_sum = jnp.sum(tracks, axis=0)  # [2, n]
        return jax.lax.psum(local_sum, "tracks")

    fn = shard_map(
        render_local,
        mesh=mesh,
        in_specs=(P("tracks"), P("tracks"), P("tracks"), P("tracks"),
                  P("tracks")),
        out_specs=P(),
    )
    return jax.jit(fn)


def render_songs_data_parallel(renderers, mesh_axis: str = "songs"):
    """Render independent songs one-per-device (DCN-scale batch mode).

    Songs have different shapes/graphs, so this is host-driven dispatch:
    each song's jitted program is placed on its own device; results are
    gathered on host. (Equivalent of the reference's 'render N projects
    from the CLI' loop, but concurrent across chips.)
    """
    devs = jax.devices()
    futures = []
    for i, r in enumerate(renderers):
        dev = devs[i % len(devs)]
        inputs = jax.device_put(r.inputs, dev)
        with jax.default_device(dev):
            futures.append(jax.jit(r._render)(inputs))
    return [np.asarray(f) for f in futures]

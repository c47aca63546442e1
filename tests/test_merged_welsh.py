"""Cross-instrument merged-cascade machinery (engine/render
_render_welsh_merged / _cascade_packet): every layout knob — per-device
vs global buckets, packet splitting, the oversize chunked fallback —
must render the same audio, because packets only CONCATENATE per-row
data in front of the cascade (welsh.render_notes_parts) and split it
back after."""

import numpy as np

from groove_tpu.compiler.song import compile_midi_file
from groove_tpu.engine.render import Renderer
from tests.test_project import REF


def _compiled():
    # 9 GM welsh channels + drums; multiple welsh devices share buckets
    # under the global layout, which is the interesting case
    return compile_midi_file(REF / "test-data/midi/sound_of_music.mid")


def test_global_merge_matches_per_device():
    c = _compiled()

    class GlobalMerge(Renderer):
        WELSH_MERGE_GLOBAL = True
        WELSH_GLOBAL_BUCKETS = 8

    base = np.asarray(Renderer(c).render())
    merged = np.asarray(GlobalMerge(c).render())
    assert base.shape == merged.shape
    peak = max(1.0, float(np.abs(base).max()))
    # different bucket partitions regroup f32 sums -> ulp-level only
    assert float(np.abs(base - merged).max()) < 1e-4 * peak


def test_packet_split_and_oversize_fallback_match():
    c = _compiled()

    class TinyPackets(Renderer):
        # force multi-packet groups AND the oversize per-device chunked
        # fallback: any member > cap falls back, smaller ones pack
        @property
        def _note_chunk_elems(self):
            return 2_000_000

    base = np.asarray(Renderer(c).render())
    tiny = np.asarray(TinyPackets(c).render())
    peak = max(1.0, float(np.abs(base).max()))
    assert float(np.abs(base - tiny).max()) < 1e-4 * peak


def test_merged_plan_covers_every_note_once():
    c = _compiled()
    r = Renderer(c)
    counts = {}
    for _span, members in r._wm_plan:
        for uvid, n in members:
            counts[uvid] = counts.get(uvid, 0) + n
    for dev in c.devices.values():
        if dev.kind in ("welsh", "welsh-raw") and dev.voice is not None \
                and dev.notes is not None and dev.notes.count:
            assert counts[dev.uvid] == dev.notes.count

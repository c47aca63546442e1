"""Polyphony policies (PolyphonySettings, settings/src/patches.rs:193-200)."""

import json

import numpy as np

from groove_tpu.compiler.song import compile_song
from groove_tpu.models.voices import apply_mono_policy
from groove_tpu.project.schema import SongSettings


def test_mono_policy_truncates_overlaps():
    on = np.array([0, 100, 200], np.int32)
    off = np.array([150, 300, 250], np.int32)
    out = apply_mono_policy(on, off)
    assert list(out) == [100, 200, 250]


def test_mono_patch_gets_policy_applied():
    # growling-bass is a Mono-polyphony patch; legato eighth notes must be
    # gated off at each successive note-on
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"instrument": ["i1", {"welsh": [{"midi-in": 0},
                                                     {"name": "growling-bass"}]}]}],
        "patch-cables": [["i1", "main-mixer"]],
        "patterns": [{"id": "p", "note-value": "eighth",
                      "notes": [[60, 62, 64, 65]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    notes = c.devices["i1"].notes
    assert c.devices["i1"].voice.polyphony == "mono"
    # each gate ends exactly at the next note's onset
    assert all(
        notes.off_frames[i] <= notes.on_frames[i + 1]
        for i in range(notes.count - 1)
    )

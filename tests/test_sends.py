"""Aux-send (BusStation) routing: send_routes math from
src/mini/bus_station.rs tests — an instrument sent to an aux chain at
`amount` contributes amount * signal through the aux's effects."""

import json

import numpy as np

from groove_tpu.compiler.song import compile_song
from groove_tpu.engine.render import Renderer
from groove_tpu.project.schema import SongSettings


def test_send_routes_scale_and_mix():
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"toy-instrument": [{"midi-in": 0},
                                                      {"fake-value": 0.2}]}]},
            {"effect": ["aux-gain", {"gain": {"ceiling": 0.5}}]},
        ],
        "patch-cables": [["i1", "main-mixer"], ["aux-gain", "main-mixer"]],
        "sends": [{"source": "i1", "aux": "aux-gain", "amount": 0.5}],
        "patterns": [{"id": "p", "notes": [[0]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    assert c.sends == [("i1", "aux-gain", 0.5)]
    out = np.asarray(Renderer(c).render())
    # dry 0.2 + (0.2 * send 0.5) * gain 0.5 = 0.25
    assert np.allclose(out, 0.2 + 0.2 * 0.5 * 0.5, atol=1e-6)


def test_sends_survive_save_round_trip():
    """ADVICE round 1: song_to_dict dropped the sends array, breaking the
    save->load identity."""
    from groove_tpu.project.save import song_to_dict

    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"toy-instrument": [{"midi-in": 0},
                                                      {"fake-value": 0.2}]}]},
            {"effect": ["aux-gain", {"gain": {"ceiling": 0.5}}]},
        ],
        "patch-cables": [["i1", "main-mixer"], ["aux-gain", "main-mixer"]],
        "sends": [{"source": "i1", "aux": "aux-gain", "amount": 0.5}],
    }))
    song2 = SongSettings.from_json(song_to_dict(song))
    assert [(s.source, s.aux, s.amount) for s in song2.sends] == [
        ("i1", "aux-gain", 0.5)
    ]


def test_unknown_send_skipped(capsys):
    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 240},
        "devices": [
            {"instrument": ["i1", {"toy-instrument": [{"midi-in": 0},
                                                      {"fake-value": 0.2}]}]},
        ],
        "patch-cables": [["i1", "main-mixer"]],
        "sends": [{"source": "i1", "aux": "nope", "amount": 1.0}],
        "patterns": [{"id": "p", "notes": [[0]]}],
        "tracks": [{"id": "t", "midi-channel": 0, "patterns": ["p"]}],
    }))
    c = compile_song(song)
    assert c.sends == []
    assert "skipping" in capsys.readouterr().err

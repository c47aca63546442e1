"""SMF import, validated against the reference's authoritative text dumps
(test-data/midi/*.mid.txt)."""

from pathlib import Path

import pytest

from groove_tpu.compiler.song import compile_midi_file
from groove_tpu.io.midi_smf import gm_program_to_patch, parse_smf, smf_to_note_events

MIDI_DIR = Path("/root/reference/test-data/midi")

pytestmark = pytest.mark.skipif(
    not MIDI_DIR.is_dir(), reason="reference midi fixtures not mounted"
)


def _dump_note_ons(path: Path) -> int:
    count = 0
    for line in (path.parent / (path.name + ".txt")).read_text().splitlines():
        if "Note On" in line and line.split()[-1] != "0":
            count += 1
    return count


@pytest.mark.parametrize("name", [
    "major-scale", "middle-a-for-six-seconds", "middle-c-for-six-seconds",
    "major-scale-overlapping", "major-scale-spaced-notes",
    "major-scale-spaced-identical-notes", "multi-channel",
    "jingle_bells", "clouds", "sound_of_music", "d-gonnamakeyousweat",
])
def test_note_counts_match_reference_dumps(name):
    path = MIDI_DIR / f"{name}.mid"
    smf = parse_smf(path)
    notes = smf_to_note_events(smf)
    assert len(notes) == _dump_note_ons(path)


def test_tempo_and_division_from_dump():
    smf = parse_smf(MIDI_DIR / "clouds.mid")
    # dump: Division=120, Tempo 588235 us/qn
    assert smf.division == 120
    assert smf.tempo_us_per_qn == 588235
    assert abs(smf.bpm - 102.0) < 0.01


def test_major_scale_events():
    smf = parse_smf(MIDI_DIR / "major-scale.mid")
    notes = smf_to_note_events(smf)
    assert [n.key for n in notes] == [60, 62, 64, 65, 67, 69, 71, 72]
    assert all(n.velocity > 0 for n in notes)
    # quarter notes at division ticks apart
    assert float(notes[1].on_beats - notes[0].on_beats) == 1.0


def test_compile_midi_file_builds_song():
    c = compile_midi_file(MIDI_DIR / "multi-channel.mid")
    assert c.n_frames > 0
    instruments = [d for d in c.devices.values() if d.role == "instrument"]
    assert instruments
    assert sum(d.notes.count for d in instruments) == 32


def test_gm_mapping_total():
    for p in range(128):
        name = gm_program_to_patch(p)
        assert (Path("/root/reference/assets/patches/welsh") / f"{name}.json").exists(), name

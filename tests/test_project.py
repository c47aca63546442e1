"""Project front-end tests: JSON5 parsing, schema, patch corpus.

The headline requirement: every project file in the reference corpus
(projects/ + test-data/, minus the deliberately-invalid fixtures) and all
106 Welsh patches load without error (SURVEY.md §7 step 2).
"""

import math
from pathlib import Path

import pytest

from groove_tpu.core import types as T
from groove_tpu.project import json5
from groove_tpu.project.paths import Paths
from groove_tpu.project.patches import WelshPatchSettings, patch_name_to_settings_name
from groove_tpu.project.schema import ProjectError, SongSettings

REF = Path("/root/reference")


# --------------------------------------------------------------------------
# JSON5


def test_json5_basics():
    assert json5.loads("{a: 1, 'b': 2, \"c\": 3,}") == {"a": 1, "b": 2, "c": 3}
    assert json5.loads("[1, 2, 3,]") == [1, 2, 3]
    assert json5.loads("// hi\n{/* yes */ x: .5, y: 5., z: -0x10 }") == {
        "x": 0.5, "y": 5.0, "z": -16
    }
    assert json5.loads("true") is True
    assert math.isinf(json5.loads("Infinity"))


def test_json5_error_messages_match_reference():
    # settings/src/songs.rs:313-335
    for bad in ["", "da39a3ee5e6b4b0d3255bfef95601890afd80709"]:
        with pytest.raises(ValueError) as e:
            json5.loads(bad)
        assert "expected array, boolean, null, number, object, or string" in str(
            e.value
        )


def test_valid_json_bad_song_fails_with_missing_field():
    with pytest.raises(ProjectError) as e:
        SongSettings.from_json5_str('{"foo": 1}')
    assert "missing field" in str(e.value)


# --------------------------------------------------------------------------
# Corpus


def _project_files():
    skip = {
        "invalid-project.json",  # deliberately invalid fixture
        "test.grv",
    }
    files = []
    for base in [REF / "projects", REF / "test-data"]:
        for p in sorted(base.rglob("*.json")) + sorted(base.rglob("*.json5")):
            if p.name not in skip and "midi" not in p.parts:
                files.append(p)
    return files


@pytest.mark.skipif(not REF.is_dir(), reason="reference corpus not mounted")
def test_all_reference_projects_parse():
    files = _project_files()
    assert len(files) > 80
    for p in files:
        song = SongSettings.from_project_file(p)
        assert song.clock.bpm > 0


@pytest.mark.skipif(not REF.is_dir(), reason="reference corpus not mounted")
def test_all_welsh_patches_derive():
    paths = Paths()
    patch_dir = REF / "assets/patches/welsh"
    names = sorted(p.stem for p in patch_dir.glob("*.json"))
    assert len(names) == 106
    for name in names:
        patch = WelshPatchSettings.by_name(paths, name)
        params = patch.derive_welsh_voice_params()
        assert 0.0 <= params.oscillator_mix <= 1.0
        assert params.filter_q >= 0.707


def test_patch_name_kebab():
    assert patch_name_to_settings_name("Piano") == "piano"
    assert patch_name_to_settings_name("ElectricPiano") == "electric-piano"
    assert patch_name_to_settings_name("digital-bass") == "digital-bass"


def test_welsh_piano_derivation_details():
    paths = Paths()
    p = WelshPatchSettings.by_name(paths, "piano").derive_welsh_voice_params()
    # piano.json: osc1 sawtooth mix .75, osc2 pulse-width .15 tune +1 oct +2
    # semi, sync on, amp env A0 D0.67 S0.25 R0.5 -> release := decay quirk
    assert p.oscillator_1.waveform.kind == "sawtooth"
    assert p.oscillator_2.waveform.kind == "pulse-width"
    assert p.oscillator_2.waveform.pulse_width == pytest.approx(0.15)
    assert p.oscillator_2_sync
    assert p.oscillator_2.tune_ratio == pytest.approx(T.semis_and_cents(14))
    assert p.oscillator_mix == pytest.approx(0.75 / 1.75)
    assert p.amp_envelope.release == pytest.approx(0.67)  # quirk
    assert p.filter_cutoff_start == pytest.approx(T.frequency_to_percent(40.0))
    assert p.filter_cutoff_end == pytest.approx(0.75)


# --------------------------------------------------------------------------
# Value math (patches.rs tests :754-796, util.rs tests :286-318)


def test_semis_and_cents():
    assert T.octaves(1) == pytest.approx(2.0)
    assert T.octaves(-1) == pytest.approx(0.5)
    assert T.semis_and_cents(5) == pytest.approx(1.3348398541700344)
    assert T.semis_and_cents(0, -100.0) == pytest.approx(2.0 ** (-100.0 / 1200.0))
    assert T.semis_and_cents(1, 0) == pytest.approx(T.semis_and_cents(0, 100.0))


def test_mma_transforms():
    c = T.transform_linear_to_mma_concave
    v = T.transform_linear_to_mma_convex
    assert c(0.001) < 0.0002
    assert c(0.01) < 0.019
    assert c(0.1) < 0.02
    assert 0.12 < c(0.5) < 0.13
    assert c(0.9) > 0.40
    assert c(0.99) > 0.83
    assert c(0.995) > 0.95
    assert v(0.995) > 0.999
    assert v(0.9) > 0.98
    assert 0.87 < v(0.5) < 0.88
    assert v(0.01) < 0.17
    assert v(0.001) < 0.0005
    for i in range(101):
        x = i / 100.0
        assert c(x) <= x + 1e-12
        assert v(x) >= x - 1e-12


def test_frequency_percent_roundtrip():
    assert T.percent_to_frequency(0.0) == pytest.approx(25.0)
    assert T.percent_to_frequency(1.0) == pytest.approx(20000.0)
    for hz in [40.0, 440.0, 1000.0, 8000.0]:
        assert T.percent_to_frequency(T.frequency_to_percent(hz)) == pytest.approx(hz)


def test_map_form_controller_keeps_params():
    """A controller written in MAP form (not the [midi, params] tuple)
    must keep its kind params — dropping them silently fired a trigger at
    beat 0 with value 1.0 (review finding)."""
    import json

    song = SongSettings.from_json5_str(json.dumps({
        "clock": {"bpm": 120},
        "devices": [{"controller": ["t", {"trigger": {
            "midi-in": 0, "time": 4.0, "value": 0.5}}]}],
        "patch-cables": [],
    }))
    ctl = song.devices[0].controller
    assert ctl.params.get("time") == 4.0
    assert ctl.params.get("value") == 0.5
    assert ctl.midi_in == 0


def test_malformed_structures_raise_project_error():
    """Structurally malformed projects must raise ProjectError with a
    message, not opaque IndexError/StopIteration/AttributeError."""
    import json

    import pytest

    from groove_tpu.project.schema import (ControlStepSettings,
                                           ProjectError)

    with pytest.raises(ProjectError, match="time-signature"):
        SongSettings.from_json5_str(json.dumps(
            {"clock": {"bpm": 120, "time-signature": [4]}}))
    with pytest.raises(ProjectError, match="device"):
        SongSettings.from_json5_str(json.dumps(
            {"clock": {"bpm": 120}, "devices": [{"effect": "oops"}]}))
    with pytest.raises(ProjectError, match="control step"):
        ControlStepSettings.from_json({})
    with pytest.raises(ProjectError, match="flat"):
        ControlStepSettings.from_json({"flat": 0.5})


def test_json5_error_positions_and_crlf_continuation():
    """Parser robustness: bad numbers / short escapes report line/column
    as Json5Error; backslash-CRLF is a legal line continuation."""
    import pytest

    from groove_tpu.project import json5

    assert json5.loads('{"a": "x\\\r\ny"}') == {"a": "xy"}
    assert json5.loads('{"a": "x\\\ry"}') == {"a": "xy"}
    with pytest.raises(json5.Json5Error, match="number"):
        json5.loads('{"a": 1e+}')
    with pytest.raises(json5.Json5Error, match="escape"):
        json5.loads('{"a": "\\u12"}')


def test_json5_eof_mid_value_is_json5_error():
    """peek() returns '' at EOF and `'' in quote-pair` is True — an input
    truncated before a value crashed parse_string with IndexError."""
    import pytest

    for text in ("{bpm:", "[1,", "{"):
        with pytest.raises(json5.Json5Error):
            json5.loads(text)


def test_fuzzed_projects_fail_closed():
    """Failure-policy fuzz (SURVEY §5): systematic mutations of the widest
    schema user (kitchen-sink.json) — deleted keys, wrong-typed values,
    truncated text — must each either load (the warn-and-skip policy) or
    raise the typed loader errors (ProjectError / Json5Error). Opaque
    KeyError/IndexError/AttributeError escapes are the defect class this
    pins against."""
    import json
    import random

    from groove_tpu.project import json5
    from groove_tpu.project.schema import ProjectError

    src = Path("/root/reference/test-data/kitchen-sink.json").read_text()
    base = json5.loads(src)
    rng = random.Random(0xC0FFEE)

    def mutate(obj, action):
        """One random structural mutation; returns a deep-copied mutant."""
        mutant = json.loads(json.dumps(obj))
        # collect every (container, key) site
        sites = []

        def walk(node):
            if isinstance(node, dict):
                for k in node:
                    sites.append((node, k))
                    walk(node[k])
            elif isinstance(node, list):
                for i in range(len(node)):
                    sites.append((node, i))
                    walk(node[i])

        walk(mutant)
        node, key = sites[rng.randrange(len(sites))]
        if action == "delete":
            del node[key]
        elif action == "retype":
            node[key] = rng.choice([None, True, "bogus", -1, 1e9,
                                    [], {}, [[]], {"x": None}])
        elif action == "negate":
            if isinstance(node[key], (int, float)) and not isinstance(
                    node[key], bool):
                node[key] = -abs(node[key]) - 1
            else:
                node[key] = {"unexpected": [1, 2, 3]}
        return mutant

    import contextlib
    import io

    from groove_tpu.compiler.song import compile_song

    outcomes = {"loaded": 0, "typed-error": 0, "compiled": 0}
    for trial in range(150):
        action = ("delete", "retype", "negate")[trial % 3]
        mutant = mutate(base, action)
        try:
            song = SongSettings.from_json(mutant)
            outcomes["loaded"] += 1
        except (ProjectError, json5.Json5Error):
            outcomes["typed-error"] += 1
            continue
        # loaded mutants must also COMPILE fail-closed (warn-and-skip
        # or ProjectError — e.g. a welsh device whose 'name' was
        # deleted, a negated time-signature bottom)
        try:
            with contextlib.redirect_stdout(io.StringIO()), \
                    contextlib.redirect_stderr(io.StringIO()):
                compile_song(song)
            outcomes["compiled"] += 1
        except ProjectError:
            outcomes["typed-error"] += 1
        except FileNotFoundError:
            # asset resolution (a mutated patch/drumkit/sample name) is
            # a descriptive typed error too — distinct from structural
            # ProjectErrors but equally fail-closed
            outcomes["typed-error"] += 1
        # anything else propagates and fails the test with its traceback
    # truncations exercise the json5 lexer's EOF paths
    for cut in range(1, 40):
        text = src[: len(src) * cut // 40]
        try:
            SongSettings.from_json5_str(text)
            outcomes["loaded"] += 1
        except (ProjectError, json5.Json5Error):
            outcomes["typed-error"] += 1
    # the fuzz is only meaningful if every outcome occurs
    assert outcomes["compiled"] > 0 and outcomes["typed-error"] > 0, outcomes


def test_fuzzed_welsh_patches_fail_closed():
    """Mutated welsh patch JSON must derive, or raise ProjectError naming
    the patch (the module-doc contract: 'the reference panics on bad
    patch JSON; we raise a clean error instead')."""
    import json
    import random

    from groove_tpu.project.patches import WelshPatchSettings
    from groove_tpu.project.schema import ProjectError

    src = json.load(
        open("/root/reference/assets/patches/welsh/piano.json"))
    rng = random.Random(3)
    outcomes = {"ok": 0, "typed": 0}
    for trial in range(200):
        m = json.loads(json.dumps(src))
        sites = []

        def walk(node):
            if isinstance(node, dict):
                for k in node:
                    sites.append((node, k))
                    walk(node[k])
            elif isinstance(node, list):
                for i in range(len(node)):
                    sites.append((node, i))
                    walk(node[i])

        walk(m)
        node, key = sites[rng.randrange(len(sites))]
        a = trial % 3
        if a == 0:
            del node[key]
        elif a == 1:
            node[key] = rng.choice([None, True, "bogus", -1, [], {}])
        else:
            node[key] = {"unexpected": 1}
        try:
            WelshPatchSettings(name="x", raw=m).derive_welsh_voice_params()
            outcomes["ok"] += 1
        except ProjectError:
            outcomes["typed"] += 1
        # anything else propagates and fails with its traceback
    assert outcomes["ok"] > 0 and outcomes["typed"] > 0, outcomes
    # invalid patch file text is typed too
    with pytest.raises(ProjectError, match="invalid JSON"):
        WelshPatchSettings.from_json_str("{{{", "broken")

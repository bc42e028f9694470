"""bench.py artifact-key contract: the floors self-diagnosis gate.

The driver's per-round BENCH_r{N}.json is the only performance record a
round leaves behind, so the gate's three outcomes must be distinguishable
from the artifact alone: `inflated` (per-query noise attribution),
`floors_skipped_scale_mismatch` (floors recorded at a different data
dir), and `floors_skipped_unreadable` (garbled floors file — a parse
failure is NOT a scale mismatch; consumers grep these keys).  No Spark
session: floors_gate is pure.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bench import floors_gate  # noqa: E402


def _write_floors(tmp_path: Path, sf_dir: str, floors: dict) -> Path:
    p = tmp_path / "BENCH_FLOORS.json"
    p.write_text(json.dumps({"sf_dir": sf_dir, "floors": floors}))
    return p


def test_inflation_flags_only_above_2x_and_above_min_floor(tmp_path):
    p = _write_floors(
        tmp_path, str(tmp_path), {"q_a": 1.0, "q_b": 1.0, "q_tiny": 0.1}
    )
    timings = {"q_a": 2.5, "q_b": 1.9, "q_tiny": 5.0, "q_no_floor": 9.0}
    inflated, skipped, unreadable = floors_gate(p, str(tmp_path), timings)
    # q_a: >2x a >=0.2s floor -> flagged with both numbers.
    # q_b: under 2x -> clean.  q_tiny: floor below the 0.2s jitter cut ->
    # never flagged.  q_no_floor: no floor recorded -> never flagged.
    assert inflated == {"q_a": {"suite": 2.5, "floor": 1.0}}
    assert skipped is None and unreadable is None


def test_scale_mismatch_disables_gate_and_says_so(tmp_path):
    other = tmp_path / "other_sf"
    other.mkdir()
    p = _write_floors(tmp_path, str(other), {"q_a": 1.0})
    inflated, skipped, unreadable = floors_gate(p, str(tmp_path), {"q_a": 99.0})
    assert inflated == {}
    assert skipped == {"recorded": str(other), "run": str(tmp_path)}
    assert unreadable is None


def test_realpath_spelling_of_same_dir_keeps_gate_on(tmp_path):
    # a '//' / trailing-slash respelling of the SAME dir must not
    # silently disable the gate
    p = _write_floors(tmp_path, str(tmp_path), {"q_a": 1.0})
    respelled = str(tmp_path) + "//"
    inflated, skipped, unreadable = floors_gate(p, respelled, {"q_a": 3.0})
    assert inflated == {"q_a": {"suite": 3.0, "floor": 1.0}}
    assert skipped is None and unreadable is None


def test_unreadable_floors_reports_under_its_own_key(tmp_path):
    p = tmp_path / "BENCH_FLOORS.json"
    p.write_text("{not json")
    inflated, skipped, unreadable = floors_gate(p, str(tmp_path), {"q_a": 9.0})
    assert inflated == {}
    assert skipped is None, "parse failure must not report as scale mismatch"
    assert unreadable == {"run": str(tmp_path), "error": "JSONDecodeError"}


def test_missing_floors_file_is_silent(tmp_path):
    p = tmp_path / "BENCH_FLOORS.json"
    inflated, skipped, unreadable = floors_gate(p, str(tmp_path), {"q_a": 9.0})
    assert inflated == {} and skipped is None and unreadable is None


def test_valid_json_wrong_shape_reports_not_raises(tmp_path):
    # valid JSON that is not the expected payload shape must degrade to
    # a reported gate-off, never an AttributeError after the suite ran
    p = tmp_path / "BENCH_FLOORS.json"
    p.write_text("[1, 2, 3]")
    inflated, skipped, unreadable = floors_gate(p, str(tmp_path), {"q_a": 9.0})
    assert inflated == {} and skipped is None
    assert unreadable == {"run": str(tmp_path), "error": "bad_shape"}


def test_matching_sf_with_empty_or_nondict_floors_reports_gate_off(tmp_path):
    for floors_val in ({}, [1, 2], None):
        p = tmp_path / "BENCH_FLOORS.json"
        payload = {"sf_dir": str(tmp_path)}
        if floors_val is not None:
            payload["floors"] = floors_val
        p.write_text(json.dumps(payload))
        inflated, skipped, unreadable = floors_gate(p, str(tmp_path), {"q_a": 9.0})
        assert inflated == {} and skipped is None, floors_val
        assert unreadable == {"run": str(tmp_path), "error": "empty_floors"}, floors_val


def test_non_numeric_floor_value_is_skipped_not_fatal(tmp_path):
    p = _write_floors(tmp_path, str(tmp_path), {"q_a": "garbage", "q_b": 1.0})
    inflated, skipped, unreadable = floors_gate(
        p, str(tmp_path), {"q_a": 9.0, "q_b": 9.0}
    )
    assert inflated == {"q_b": {"suite": 9.0, "floor": 1.0}}
    assert skipped is None and unreadable is None


def test_gate_off_markers_ride_the_artifact_tail():
    """The driver's capture keeps only the TAIL of stdout, so the
    gate-off keys must be emitted AFTER the bulky queries map — a
    head-clipped artifact showing n_inflated: 0 must still carry its
    gate-off marker.  Pinned against the source since main() is not
    callable without Spark."""
    src = (REPO / "bench.py").read_text()
    tail = src[src.index('result["queries"] = timings'):]
    assert 'result["floors_skipped_scale_mismatch"]' in tail
    assert 'result["floors_skipped_unreadable"]' in tail
    assert 'result["inflated_names"]' in tail

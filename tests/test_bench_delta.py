"""scripts/bench_delta.py probe-phase regression gate (r9): a probe
ratio above the documented 1.7x ambient band makes the script refuse
(exit 2); within-band deltas and --no-gate keep exit 0. Pure-CLI
tests — no SparkSession."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

_SCRIPT = str(Path(__file__).parent.parent / "scripts" / "bench_delta.py")


def _write(tmp_path, round_no, probe_sec):
    doc = {
        "git": "test",
        "loadavg": [0.0, 0.0, 0.0],
        "queries": {"q_a": 1.0, "q_b": 2.0},
        "extended_queries": {},
        "index_phases": {
            "ivf_build": 2.0,
            "ivf_probe": probe_sec,
            "bm25_probe": 0.5,
        },
    }
    (tmp_path / f"BENCHLOCAL_r{round_no:02d}.json").write_text(json.dumps(doc))


def _run(tmp_path, *extra):
    return subprocess.run(
        [sys.executable, _SCRIPT, "1", "2", "--dir", str(tmp_path), *extra],
        capture_output=True,
        text=True,
    )


def test_probe_within_band_passes(tmp_path):
    _write(tmp_path, 1, probe_sec=1.0)
    _write(tmp_path, 2, probe_sec=1.5)  # 1.5x <= 1.7x band
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PROBE GATE" not in r.stdout


def test_probe_regression_refuses(tmp_path):
    _write(tmp_path, 1, probe_sec=1.0)
    _write(tmp_path, 2, probe_sec=2.0)  # 2.0x > 1.7x band
    r = _run(tmp_path)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "PROBE GATE: ivf_probe regressed 2.00x" in r.stdout


def test_no_gate_downgrades_to_warning(tmp_path):
    _write(tmp_path, 1, probe_sec=1.0)
    _write(tmp_path, 2, probe_sec=2.0)
    r = _run(tmp_path, "--no-gate")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PROBE GATE" in r.stdout


def _write_q(tmp_path, round_no, queries):
    doc = {
        "git": "test",
        "loadavg": [0.0, 0.0, 0.0],
        "queries": queries,
        "extended_queries": {},
    }
    (tmp_path / f"BENCHLOCAL_r{round_no:02d}.json").write_text(json.dumps(doc))


def test_query_regression_refuses(tmp_path):
    # r10: an above-band per-query ratio on unchanged code refuses
    _write_q(tmp_path, 1, {"q_a": 1.0, "q_b": 1.0})
    _write_q(tmp_path, 2, {"q_a": 1.0, "q_b": 2.0})  # 2.0x > 1.7x, 2.0s >= floor
    r = _run(tmp_path)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "QUERY GATE: q_b regressed 2.00x" in r.stdout


def test_query_regression_exempt_when_changed(tmp_path):
    _write_q(tmp_path, 1, {"q_a": 1.0, "q_b": 1.0})
    _write_q(tmp_path, 2, {"q_a": 1.0, "q_b": 2.0})
    r = _run(tmp_path, "--changed", "q_b")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "QUERY GATE" not in r.stdout


def test_query_regression_floor_exempts_noise(tmp_path):
    # sub-floor rows live in the stage-scheduling noise regime
    _write_q(tmp_path, 1, {"q_a": 0.1, "q_b": 1.0})
    _write_q(tmp_path, 2, {"q_a": 0.4, "q_b": 1.0})  # 4x but 0.4s < 0.5s floor
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "QUERY GATE" not in r.stdout


def _write_qc(tmp_path, round_no, queries, calibration):
    doc = {
        "git": "test",
        "loadavg": [0.0, 0.0, 0.0],
        "queries": queries,
        "extended_queries": {},
        "calibration": calibration,
    }
    (tmp_path / f"BENCHLOCAL_r{round_no:02d}.json").write_text(json.dumps(doc))


_CAL_OLD = {"pyloop_sec": 0.4, "smalljob_ms": 50.0, "shuffle_probe_sec": 0.4}


def test_platform_normalization_excuses_uniform_shift(tmp_path):
    # every probe 2x slower on the new box AND every query 2x slower:
    # a pure platform shift — the normalized ratio is 1.0 and the
    # gate must not fire
    _write_qc(tmp_path, 1, {"q_a": 1.0, "q_b": 1.0}, _CAL_OLD)
    _write_qc(
        tmp_path,
        2,
        {"q_a": 2.0, "q_b": 2.0},
        {"pyloop_sec": 0.8, "smalljob_ms": 100.0, "shuffle_probe_sec": 0.8},
    )
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "platform factor (conservative min, floor 1.0): 2.000" in r.stdout
    assert "QUERY GATE" not in r.stdout


def test_platform_normalization_is_conservative_min(tmp_path):
    # probes disagree (smalljob 2x, shuffle 1.2x, pyloop 1.5x): only
    # the MIN (1.2x) is excused, so a 2x query mover still normalizes
    # to 1.67x... just inside the band, while a 2.5x mover (2.08x
    # normalized) still refuses — normalization cannot hide a plan
    # regression bigger than the agreed platform shift
    _write_qc(tmp_path, 1, {"q_a": 1.0, "q_b": 1.0}, _CAL_OLD)
    _write_qc(
        tmp_path,
        2,
        {"q_a": 2.0, "q_b": 2.5},
        {"pyloop_sec": 0.6, "smalljob_ms": 100.0, "shuffle_probe_sec": 0.48},
    )
    r = _run(tmp_path)
    assert r.returncode == 2, r.stdout + r.stderr
    assert "QUERY GATE: q_b" in r.stdout
    assert "QUERY GATE: q_a" not in r.stdout


def test_platform_factor_floored_at_one(tmp_path):
    # a FASTER new box (probes 0.5x) must not tighten the band:
    # factor floors at 1.0, raw ratios gate as before
    _write_qc(tmp_path, 1, {"q_a": 1.0}, _CAL_OLD)
    _write_qc(
        tmp_path,
        2,
        {"q_a": 1.5},
        {"pyloop_sec": 0.2, "smalljob_ms": 25.0, "shuffle_probe_sec": 0.2},
    )
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "platform factor (conservative min, floor 1.0): 1.000" in r.stdout


def test_calibration_on_new_side_only_reports(tmp_path):
    _write_q(tmp_path, 1, {"q_a": 1.0})
    _write_qc(tmp_path, 2, {"q_a": 1.2}, _CAL_OLD)
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "calibration present on the new side only" in r.stdout

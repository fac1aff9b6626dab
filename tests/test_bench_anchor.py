"""Unit tests for bench.py's ambient-calibration anchor math (pure
functions — no SparkSession needed)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _anchor_ratio, _prior_record  # noqa: E402


def test_anchor_ratio_geometric_mean():
    cur = {"range_agg_sec": 0.30, "scan_agg_sec": 0.80}
    prior = {"anchor": {"start": {"range_agg_sec": 0.25, "scan_agg_sec": 0.50}}}
    r = _anchor_ratio(cur, prior)
    assert r == round(math.exp((math.log(0.30 / 0.25) + math.log(0.80 / 0.50)) / 2), 3)


def test_anchor_ratio_none_without_comparable_prior():
    cur = {"range_agg_sec": 0.30}
    assert _anchor_ratio(cur, {}) is None
    assert _anchor_ratio(cur, {"anchor": {"start": {}}}) is None
    assert _anchor_ratio(cur, {"anchor": {"start": {"range_agg_sec": 0}}}) is None
    # non-overlapping probe keys -> no comparable pair -> None
    assert (
        _anchor_ratio(cur, {"anchor": {"start": {"scan_agg_sec": 0.5}}}) is None
    )


def test_anchor_ratio_partial_overlap_uses_shared_keys():
    cur = {"range_agg_sec": 0.50, "scan_agg_sec": 1.0}
    prior = {"anchor": {"start": {"range_agg_sec": 0.25}}}
    assert _anchor_ratio(cur, prior) == 2.0


def test_anchor_ratio_end_probe_participates():
    """Round-8 verdict task: the end probe must enter the geomean, so
    a session that degrades after a fast start reads > 1."""
    prior = {
        "anchor": {
            "start": {"range_agg_sec": 1.0},
            "end": {"range_agg_sec": 1.0},
        }
    }
    cur = {"start": {"range_agg_sec": 1.0}, "end": {"range_agg_sec": 4.0}}
    assert _anchor_ratio(cur, prior) == 2.0  # geomean(1.0, 4.0)
    # halves pair with THEIR OWN half of the prior record
    prior2 = {
        "anchor": {
            "start": {"range_agg_sec": 1.0},
            "end": {"range_agg_sec": 4.0},
        }
    }
    assert _anchor_ratio(cur, prior2) == 1.0
    # end-only prior still adjudicates the end half
    assert (
        _anchor_ratio(
            {"end": {"range_agg_sec": 2.0}},
            {"anchor": {"end": {"range_agg_sec": 1.0}}},
        )
        == 2.0
    )


def test_prior_record_sf_gate(tmp_path):
    p = tmp_path / "BENCH_FULL.json"
    p.write_text('{"sf": 0.1, "queries": {"q": 1.0}}')
    assert _prior_record(str(p), 0.1)["queries"] == {"q": 1.0}
    assert _prior_record(str(p), 0.01) == {}
    assert _prior_record(str(tmp_path / "missing.json"), 0.1) == {}
    p.write_text("not json")
    assert _prior_record(str(p), 0.1) == {}

"""The BENCH self-policing contract (r9 judge ask #1).

bench.py's ``regressions_vs_prev`` block extends the SWEEP median-of-3
remeasure rule to headline bench rows: any row >20% and >0.3 s slower
than the previous round's committed per-query archive
(``bench_history/r{N}.json``, same sf) is flagged in the shipped
payload, and remeasure pins from BENCH_REMEASURED.json ride along.
These tests pin the flag rule and the archive selection without
running Spark.
"""

import json
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _write_history(tmp_path, rnd, sf, queries):
    hist = tmp_path / "bench_history"
    hist.mkdir(exist_ok=True)
    (hist / f"r{rnd:02d}.json").write_text(
        json.dumps({"sf": sf, "queries": queries})
    )


def test_flag_rule_needs_both_ratio_and_absolute(tmp_path):
    _write_history(
        tmp_path, 9, 0.1,
        {"a": 1.0, "b": 0.1, "c": 2.0, "d": 1.0},
    )
    block = bench._regressions_block(
        str(tmp_path), 0.1,
        {
            "a": 1.35,   # +35% and +0.35s -> flagged
            "b": 0.45,   # +350% but... +0.35s -> flagged (both gates pass)
            "c": 2.25,   # +12.5% -> not flagged (ratio gate)
            "d": 1.25,   # +25% but +0.25s -> not flagged (absolute gate)
            "new": 9.9,  # no prev row -> not flagged
        },
    )
    flagged = {r["query"] for r in block["rows"]}
    assert flagged == {"a", "b"}
    assert block["prev_artifact"] == "bench_history/r09.json"
    for r in block["rows"]:
        assert r["ratio"] == round(r["cur"] / r["prev"], 2)


def test_archive_selection_newest_same_sf(tmp_path):
    _write_history(tmp_path, 8, 0.1, {"a": 1.0})
    _write_history(tmp_path, 9, 0.1, {"a": 2.0})
    _write_history(tmp_path, 10, 1.0, {"a": 0.1})  # wrong sf -> skipped
    block = bench._regressions_block(str(tmp_path), 0.1, {"a": 3.0})
    assert block["prev_artifact"] == "bench_history/r09.json"
    assert block["rows"] == [
        {"query": "a", "prev": 2.0, "cur": 3.0, "ratio": 1.5}
    ]


def test_no_archive_returns_none(tmp_path):
    assert bench._regressions_block(str(tmp_path), 0.1, {"a": 1.0}) is None


def test_remeasured_pins_ride_along(tmp_path):
    _write_history(tmp_path, 9, 0.1, {"a": 1.0})
    (tmp_path / "BENCH_REMEASURED.json").write_text(
        json.dumps({"a": {"median": 1.05, "spread": [1.0, 1.1], "n": 3}})
    )
    block = bench._regressions_block(str(tmp_path), 0.1, {"a": 1.5})
    assert block["remeasured"]["a"]["median"] == 1.05


def test_repo_archive_is_seeded_with_r9():
    """The committed archive must carry the r9 driver-run numbers the
    r10 comparison polices against (values from BENCH_DETAILS.json at
    the round-9 close commit)."""
    data = json.loads((REPO / "bench_history" / "r09.json").read_text())
    assert data["sf"] == 0.1
    assert data["queries"]["dedup_lsh_bucket_stats_sampled"] == 4.964
    assert data["queries"]["fuzzy_decontamination"] == 3.781

"""bench.py's round-over-round adjudication plumbing (VERDICT r05 #6).

The timing loop itself runs only in a real bench; what must not rot
silently is the record-keeping — the formatter and the PLAN_AUDIT.md
section rewrite (idempotent, replaces its own tail, never someone
else's content).
"""

from __future__ import annotations

from bench import (
    ADJUDICATION_MARKER,
    _write_adjudications_to_plan_audit,
    format_round_adjudications,
)

DETAIL = {
    "round_baseline": "BENCH_r05.json",
    "round_adjudications": [
        {
            "q": "q294_temporal_reachability",
            "prev": 8.14,
            "first": 9.61,
            "now": 8.2,
            "verdict": "noise",
        },
        {
            "q": "q999_example",
            "prev": 5.0,
            "first": 7.0,
            "now": 6.8,
            "verdict": "regression",
        },
    ],
}


def test_formatter_carries_verdicts_and_numbers():
    s = format_round_adjudications(DETAIL)
    assert ADJUDICATION_MARKER in s
    assert "BENCH_r05.json" in s
    assert "q294_temporal_reachability: prev 8.14s" in s
    assert "NOISE" in s and "REGRESSION" in s
    assert format_round_adjudications({"round_adjudications": []}) == ""


def test_plan_audit_rewrite_is_idempotent(tmp_path):
    audit = tmp_path / "PLAN_AUDIT.md"
    base = "# PLAN AUDIT\n\n- q1: fine\n"
    audit.write_text(base)
    _write_adjudications_to_plan_audit(DETAIL, audit)
    once = audit.read_text()
    assert once.startswith("# PLAN AUDIT")
    assert once.count(ADJUDICATION_MARKER) == 1
    # re-running replaces the section instead of stacking a second copy
    _write_adjudications_to_plan_audit(DETAIL, audit)
    assert audit.read_text().count(ADJUDICATION_MARKER) == 1
    assert "- q1: fine" in audit.read_text()
    # empty adjudication list leaves the file untouched
    before = audit.read_text()
    _write_adjudications_to_plan_audit(
        {"round_adjudications": []}, audit
    )
    assert audit.read_text() == before


class TestLoadRoundBaseline:
    """Round 6: the round check read the driver's BENCH_r{N}.json as if
    it were the bench's own JSON — but the driver wraps that line as
    {n, rc, cpus, sf, tail, parsed: {...}}, so queries read empty and
    the check silently adjudicated NOTHING all of round 5. The loader
    must handle both formats and refuse a different scale factor."""

    def _write(self, tmp_path, name, doc):
        import json

        (tmp_path / name).write_text(json.dumps(doc))

    def test_unwraps_driver_wrapper(self, tmp_path):
        from bench import load_round_baseline

        self._write(
            tmp_path,
            "BENCH_r05.json",
            {
                "n": 5, "rc": 0, "cpus": 32, "sf": 0.1, "tail": "...",
                "parsed": {
                    "sf": 0.1,
                    "queries": {"q315_streaming_rates": 16.8},
                },
            },
        )
        name, qs = load_round_baseline(tmp_path, 0.1)
        assert name == "BENCH_r05.json"
        assert qs == {"q315_streaming_rates": 16.8}

    def test_reads_bare_bench_format(self, tmp_path):
        from bench import load_round_baseline

        self._write(
            tmp_path,
            "BENCH_r04.json",
            {"sf": 0.1, "queries": {"q34_streaming_pipeline": 12.5}},
        )
        name, qs = load_round_baseline(tmp_path, 0.1)
        assert name == "BENCH_r04.json"
        assert qs == {"q34_streaming_pipeline": 12.5}

    def test_newest_round_wins(self, tmp_path):
        from bench import load_round_baseline

        self._write(tmp_path, "BENCH_r02.json", {"sf": 0.1, "queries": {"a": 1.0}})
        self._write(tmp_path, "BENCH_r10.json", {"sf": 0.1, "queries": {"b": 2.0}})
        name, qs = load_round_baseline(tmp_path, 0.1)
        assert name == "BENCH_r10.json" and qs == {"b": 2.0}

    def test_other_sf_refused(self, tmp_path):
        from bench import load_round_baseline

        self._write(
            tmp_path,
            "BENCH_r05.json",
            {"sf": 0.01, "queries": {"a": 1.0}},
        )
        assert load_round_baseline(tmp_path, 0.1) == ("", {})

    def test_missing_or_garbage(self, tmp_path):
        from bench import load_round_baseline

        assert load_round_baseline(tmp_path, 0.1) == ("", {})
        (tmp_path / "BENCH_r01.json").write_text("{not json")
        assert load_round_baseline(tmp_path, 0.1) == ("", {})

    def test_repo_committed_wrapper_actually_loads(self):
        """The real committed BENCH_r{N}.json must resolve to a
        non-empty queries map at the bench sf — the exact condition
        whose silent failure this loader fixes."""
        from pathlib import Path

        from bench import load_round_baseline

        name, qs = load_round_baseline(Path(__file__).resolve().parents[1], 0.1)
        assert name.startswith("BENCH_r") and len(qs) > 0

    def test_falls_past_off_sf_round_to_latest_same_sf(self, tmp_path):
        """One round benched at another scale factor must not silently
        disable the check — the loader falls back to the newest
        same-sf baseline."""
        from bench import load_round_baseline

        self._write(tmp_path, "BENCH_r05.json", {"sf": 0.1, "queries": {"a": 1.0}})
        self._write(tmp_path, "BENCH_r06.json", {"sf": 1.0, "queries": {"b": 2.0}})
        name, qs = load_round_baseline(tmp_path, 0.1)
        assert name == "BENCH_r05.json" and qs == {"a": 1.0}

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

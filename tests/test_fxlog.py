"""Portable fixed-point ln (functions/fxlog.py).

The whole point is CROSS-ENGINE BIT EQUALITY: Spark, DuckDB, and the
pure-Python reference must produce the identical integer for every
input, and that integer must approximate libm ln well. Any divergence
is a broken portability assumption (bin(), 128-bit products, or
truncating division semantics drifting in an engine upgrade) — these
tests exist to catch exactly that.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from kubenetmon_spark.functions.fxlog import (
    LN2_FX,
    SCALE,
    fx_ln_int,
    fx_ln_wrap_sql,
    with_fx_ln,
)


def _sample_inputs() -> list[int]:
    rng = random.Random(20260816)
    vals = [1, 2, 3, 2**40 - 1, 2**40, 2**40 + 1, 2**52, 2**62, 2**63 - 1]
    vals += [rng.randint(1, 2**63 - 1) for _ in range(120)]
    vals += [rng.randint(1, 2**20) for _ in range(60)]
    vals += [2**b + d for b in (10, 39, 41, 51) for d in (-1, 0, 1)]
    return sorted(set(vals))


class TestPythonReference:
    def test_matches_libm_closely(self):
        for v in _sample_inputs():
            got = fx_ln_int(v) / SCALE
            assert got == pytest.approx(math.log(v), abs=1e-9), v

    def test_exact_anchors(self):
        assert fx_ln_int(1) == 0
        assert fx_ln_int(2) == LN2_FX
        assert fx_ln_int(2**52) == 52 * LN2_FX


class TestDuckdbBitEquality:
    def test_every_input_identical_to_python(self):
        vals = _sample_inputs()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE vals AS SELECT * FROM (VALUES "
            + ", ".join(f"({v}::BIGINT)" for v in vals)
            + ") t(v)"
        )
        sql = fx_ln_wrap_sql("SELECT v FROM vals", "v", "lnv")
        got = dict(
            con.sql(
                f"SELECT v, CAST(lnv AS BIGINT) AS lnv FROM {sql} q"
            ).fetchall()
        )
        for v in vals:
            assert got[v] == fx_ln_int(v), v


class TestSparkBitEquality:
    def test_every_input_identical_to_python(self, spark):
        vals = _sample_inputs()
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        out = {
            r.v: r.lnv
            for r in with_fx_ln(df, "v", "lnv").collect()
        }
        for v in vals:
            assert out[v] == fx_ln_int(v), v

    def test_whole_stage_arithmetic_no_udf(self, spark):
        # the ln chain must stay inside codegen: no Python workers, no
        # shuffle introduced by the projection
        df = with_fx_ln(spark.range(1, 100).withColumnRenamed("id", "v"), "v", "lnv")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "ArrowEval" not in plan

"""Engine-portable fixed-point natural logarithm (integer-exact).

The repo's last two rows-only gates (q56 sketches, q113 DSIR/Gumbel)
were un-oracled because ``ln()`` is libm-bound: Spark's ``Math.log``
and DuckDB's C ``log`` can differ in the last ulp, and float SUMS
depend on partition order besides. This module removes the libm
dependency: ``ln(v)`` is computed to fixed point (scale 2^40) using
ONLY integer operations whose semantics both engines share exactly —

- ``length(bin(v))`` for the power-of-two range reduction (both
  engines print minimal binary digits),
- 128-bit products (Spark ``DECIMAL(38,0)``, DuckDB ``HUGEINT``),
- truncating integer division of POSITIVE operands (Spark ``div``,
  DuckDB ``//`` — floor == truncate for positives),
- the atanh series ln z = 2*(t + t^3/3 + t^5/5 + ...) with
  t = (z-1)/(z+1) for z in [1,2), truncated identically term by term.

Because every intermediate is an integer produced by the same sequence
of exact operations, the two engines agree BIT FOR BIT — the result
does not merely approximate ln well (it is within ~1e-10 of libm, see
tests/test_fxlog.py), it is reproducible across engines, partition
layouts, and hardware, which libm doubles are not.

Overflow envelope (why this is safe):
- range reduction puts z in [2^40, 2^41) as an int64;
- the series' largest product is t*S <= 2^80 < 10^38 (DECIMAL(38,0)
  holds ~1.2e38; HUGEINT holds 2^127);
- every division QUOTIENT stays < 2^41 — Spark's ``div`` returns
  BIGINT and silently wraps past 2^63, so quotient bounds are part of
  the design contract here, not an afterthought;
- inputs must be positive BIGINTs (v >= 1); ln values up to
  ln(2^63) ~ 43.7 fit scale 2^40 with 22 integer bits to spare.

Scale posture: the expression is pure whole-stage-codegen arithmetic
(~50 integer ops per ln call), no UDF, no shuffle — it rides whatever
projection invokes it. Fixed-point sums of cnt*ln(ratio) are exact
integer sums: order-independent, so aggregation parallelism never
perturbs results (the property float sums lack at any scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_BITS = 40
SCALE = 1 << SCALE_BITS
# floor(ln(2) * 2^40), pinned as a literal so both dialects share the
# exact same integer regardless of how any engine rounds ln(2).
LN2_FX = int(math.log(2.0) * SCALE)
assert LN2_FX == 762123384785, LN2_FX  # the pinned cross-dialect constant

# atanh series depth: t <= S/3, so term k (t^(2k+1)) <= S/3^(2k+1);
# 3^27 > 2^42 makes the k=13 term land below one fixed-point unit.
_SERIES_TERMS = 13  # k = 1..13 -> powers t^3 .. t^27 beyond the t term


def fx_ln_steps(src: str, out: str, dialect: str) -> list[tuple[str, str]]:
    """Ordered (column_name, sql_expr) steps computing
    ``out = fixed-point ln(src)`` (scale 2^40) for a positive BIGINT
    column/expression ``src``. Each step may reference earlier steps.
    ``dialect`` is ``"spark"`` or ``"duckdb"`` — the emitted operator
    spellings differ, the integer semantics do not.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    sp = dialect == "spark"

    def i128(e: str) -> str:
        return (
            f"CAST({e} AS DECIMAL(38,0))" if sp else f"CAST({e} AS HUGEINT)"
        )

    def idiv(a: str, b: str) -> str:
        return f"(({a}) div ({b}))" if sp else f"(({a}) // ({b}))"

    p = f"_fx_{out}"
    S = SCALE
    v = f"CAST({src} AS BIGINT)"
    steps: list[tuple[str, str]] = []
    # bit length: floor(log2(v)) + 1, exact in both engines
    steps.append((f"{p}_b", f"length(bin({v}))"))
    # z = v * 2^40 / 2^(b-1) in [2^40, 2^41) via exact shifts
    if sp:
        z = (
            f"CASE WHEN {p}_b >= 41 THEN shiftright({v}, {p}_b - 41) "
            f"ELSE shiftleft({v}, 41 - {p}_b) END"
        )
    else:
        z = (
            f"CASE WHEN {p}_b >= 41 THEN ({v} >> ({p}_b - 41)) "
            f"ELSE ({v} << (41 - {p}_b)) END"
        )
    steps.append((f"{p}_z", z))
    # t = (z - S)*S / (z + S) in [0, S/3] — positive by construction
    steps.append(
        (f"{p}_t", idiv(f"{i128(f'{p}_z - {S}')} * {S}", f"{p}_z + {S}"))
    )
    steps.append((f"{p}_t2", idiv(f"{i128(f'{p}_t')} * {p}_t", str(S))))
    prev = f"{p}_t"
    for k in range(1, _SERIES_TERMS + 1):
        steps.append(
            (f"{p}_u{k}", idiv(f"{i128(prev)} * {p}_t2", str(S)))
        )
        prev = f"{p}_u{k}"
    acc = " + ".join(
        [f"{p}_t"]
        + [idiv(f"{p}_u{k}", str(2 * k + 1)) for k in range(1, _SERIES_TERMS + 1)]
    )
    steps.append((out, f"2 * ({acc}) + ({p}_b - 1) * {LN2_FX}"))
    return steps


def with_fx_ln(df: DataFrame, src: str, out: str) -> DataFrame:
    """Append ``out`` = fixed-point ln of positive BIGINT column ``src``
    to ``df`` (Spark side). Intermediates are dropped; Catalyst
    collapses the projection chain into one codegen stage."""
    steps = fx_ln_steps(src, out, "spark")
    for name, expr in steps:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*[n for n, _ in steps if n != out])


def fx_ln_wrap_sql(inner: str, src: str, out: str) -> str:
    """Wrap DuckDB SQL ``inner`` (a relation producing column ``src``)
    in the subquery chain that appends ``out`` = fixed-point ln(src).
    Nested single-step subselects keep each expression small — no
    exponential alias inlining."""
    sql = f"({inner})"
    for name, expr in fx_ln_steps(src, out, "duckdb"):
        sql = f"(SELECT *, {expr} AS {name} FROM {sql})"
    return sql


def fx_ln_int(v: int) -> int:
    """Pure-Python reference of the EXACT same integer algorithm —
    the property tests pin both engines to this, making any engine
    divergence attributable instantly."""
    if v < 1:
        raise ValueError("fx_ln_int requires v >= 1")
    b = v.bit_length()
    z = (v >> (b - 41)) if b >= 41 else (v << (41 - b))
    t = ((z - SCALE) * SCALE) // (z + SCALE)
    t2 = (t * t) // SCALE
    acc = t
    prev = t
    for k in range(1, _SERIES_TERMS + 1):
        prev = (prev * t2) // SCALE
        acc += prev // (2 * k + 1)
    return 2 * acc + (b - 1) * LN2_FX

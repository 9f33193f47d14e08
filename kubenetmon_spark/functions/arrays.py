"""ClickHouse ``arrayReduce('agg', arr)`` — aggregate-name dispatch over
array columns, as pure built-in expressions (no UDF, no shuffle).

Integer semantics throughout (the engine's exactness contract): ``avg``
is floor division, ``median`` is the exact lower-median
(quantileExactLow at p=0.5), matching the definitions pinned in q144.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_REDUCERS = {}


def _reducer(name):
    def deco(fn):
        _REDUCERS[name] = fn
        return fn

    return deco


@_reducer("sum")
def _sum(a):
    return F.aggregate(a, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


@_reducer("min")
def _min(a):
    return F.array_min(a)


@_reducer("max")
def _max(a):
    return F.array_max(a)


@_reducer("count")
def _count(a):
    return F.size(a).cast("bigint")


@_reducer("uniqExact")
def _uniq(a):
    return F.size(F.array_distinct(a)).cast("bigint")


@_reducer("avg")
def _avg(a):
    # integer floor mean; null for empty arrays (ClickHouse's avg yields
    # nan there — null is this engine's convention for undefined)
    return F.when(
        F.size(a) > 0, F.floor(_REDUCERS["sum"](a) / F.size(a))
    ).cast("bigint")


@_reducer("median")
def _median(a):
    s = F.array_sort(a)
    return F.when(
        F.size(a) > 0,
        F.element_at(s, ((F.size(a) + 1) / 2).cast("int")),
    )


def array_reduce(name: str, arr: Column) -> Column:
    """Dispatch ``arrayReduce``: supported reducers are
    sum/min/max/count/uniqExact/avg/median."""
    try:
        return _REDUCERS[name](arr)
    except KeyError:
        raise ValueError(
            f"unsupported reducer {name!r}; have {sorted(_REDUCERS)}"
        ) from None

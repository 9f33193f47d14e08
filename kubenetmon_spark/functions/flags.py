"""connectionFlags canonicalization.

The reference's ``connectionFlags`` map participates in the ClickHouse
ORDER BY, i.e. the aggregation key (reference test/network_flows_0.sql:42);
Go serializes it deterministically because encoding/json sorts map keys
(reference pkg/labeler/labeler.go:69-77). Spark cannot group by a MapType
column, so the canonical group key is the sorted-entries JSON rendering.
See SURVEY.md §4.4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_flags_json(flags: Column | str) -> Column:
    """MapType(string,bool) -> deterministic JSON string usable as a
    group-by key. Entries sorted by key, rendered via to_json."""
    col = F.col(flags) if isinstance(flags, str) else flags
    return F.to_json(
        F.map_from_entries(F.array_sort(F.map_entries(col)))
    )

"""Readable-size formatting, the engine analogue of ClickHouse's
``formatReadableSize`` used by the reference's cookbook query
(reference README.md:180)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_readable_size(num: Column | str) -> Column:
    """Bytes -> '1.23 MiB' style string (ClickHouse formatReadableSize).

    Pure when/otherwise ladder — no UDF, stays in codegen. Two fractional
    digits, 1024 steps, like ClickHouse.
    """
    col = (F.col(num) if isinstance(num, str) else num).cast("double")
    return (
        F.when(col >= 1024.0**6, F.concat(F.format_number(col / 1024.0**6, 2), F.lit(" EiB")))
        .when(col >= 1024.0**5, F.concat(F.format_number(col / 1024.0**5, 2), F.lit(" PiB")))
        .when(col >= 1024.0**4, F.concat(F.format_number(col / 1024.0**4, 2), F.lit(" TiB")))
        .when(col >= 1024.0**3, F.concat(F.format_number(col / 1024.0**3, 2), F.lit(" GiB")))
        .when(col >= 1024.0**2, F.concat(F.format_number(col / 1024.0**2, 2), F.lit(" MiB")))
        .when(col >= 1024.0, F.concat(F.format_number(col / 1024.0, 2), F.lit(" KiB")))
        .otherwise(F.concat(F.format_number(col, 2), F.lit(" B")))
    )

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

    def _r(power: int, unit: str):
        # decimal(38,2) rendering: always two fractional digits, no
        # thousands separators, HALF_UP on exact halves — engine-portable
        # (format_number would insert commas for values in [1000, 1024)).
        scaled = (col / F.lit(1024.0**power)).cast("decimal(38,2)").cast("string")
        return F.concat(scaled, F.lit(" " + unit))

    return (
        F.when(col >= 1024.0**6, _r(6, "EiB"))
        .when(col >= 1024.0**5, _r(5, "PiB"))
        .when(col >= 1024.0**4, _r(4, "TiB"))
        .when(col >= 1024.0**3, _r(3, "GiB"))
        .when(col >= 1024.0**2, _r(2, "MiB"))
        .when(col >= 1024.0, _r(1, "KiB"))
        .otherwise(_r(0, "B"))
    )

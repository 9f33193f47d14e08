"""Scalar function library (the engine's "stdlib").

Everything here is built from JVM-side ``pyspark.sql.functions`` — no
Python UDFs in the hot path — so expressions stay inside whole-stage
codegen.
"""

from kubenetmon_spark.functions.ip import (
    ip_to_long,
    long_to_ip,
    is_private_ip_num,
    py_ip_to_long,
)
from kubenetmon_spark.functions.fmt import format_readable_size
from kubenetmon_spark.functions.flags import canonical_flags_json

__all__ = [
    "ip_to_long",
    "long_to_ip",
    "is_private_ip_num",
    "py_ip_to_long",
    "format_readable_size",
    "canonical_flags_json",
]

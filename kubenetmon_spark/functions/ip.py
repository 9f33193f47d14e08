"""IPv4 helpers as pure Column expressions (no UDFs).

The reference carries IPv4 as big-endian uint32 in the protobuf
(reference pkg/grpc/flow_handler.proto:34, pkg/collector/collector.go:252-255)
and renders dotted-quad at insert time. We keep both forms: dotted string
for readability, numeric long for range joins (LPM).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_to_long(ip: Column | str) -> Column:
    """Dotted-quad string -> numeric (big-endian uint32 as long).

    Pure expression: split + fold, stays in codegen.
    """
    col = F.col(ip) if isinstance(ip, str) else ip
    return F.aggregate(
        F.transform(F.split(col, r"\."), lambda x: x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 256 + x,
    )


def long_to_ip(num: Column | str) -> Column:
    """Numeric -> dotted-quad string."""
    col = F.col(num) if isinstance(num, str) else num
    return F.format_string(
        "%d.%d.%d.%d",
        F.shiftright(col, 24).bitwiseAND(F.lit(255)),
        F.shiftright(col, 16).bitwiseAND(F.lit(255)),
        F.shiftright(col, 8).bitwiseAND(F.lit(255)),
        col.bitwiseAND(F.lit(255)),
    )


def is_private_ip_num(num: Column) -> Column:
    """RFC1918 + loopback + link-local predicate on the numeric form.

    Mirrors the reference's private-IP short-circuit that bypasses the
    cloud-prefix LPM lookup (reference pkg/labeler/remote.go:131-140:
    ``IsPrivate() || IsLocal() || IsLoopback()`` — site-local RFC1918,
    link-local 169.254/16, loopback, and the unspecified address).
    """
    return (
        ((num >= _N("10.0.0.0")) & (num <= _N("10.255.255.255")))
        | ((num >= _N("172.16.0.0")) & (num <= _N("172.31.255.255")))
        | ((num >= _N("192.168.0.0")) & (num <= _N("192.168.255.255")))
        | ((num >= _N("127.0.0.0")) & (num <= _N("127.255.255.255")))
        | ((num >= _N("169.254.0.0")) & (num <= _N("169.254.255.255")))
        | (num == F.lit(0))  # unspecified 0.0.0.0
    )


def py_ip_to_long(ip: str) -> int:
    """Driver-side helper (dimension building, test fixtures)."""
    return int(ipaddress.IPv4Address(ip))


def _N(ip: str) -> Column:
    return F.lit(py_ip_to_long(ip))


def ipv6_pair_to_string(hi, lo):
    """(hi, lo) int64 pair -> full uncompressed lowercase IPv6 string
    ("2001:0db8:0000:..."), for display/joins on the v6 metering path
    (operators/lpm.py::lpm_lookup6). Pure hex/format expressions —
    no UDF; the :: compression is presentation sugar readers don't
    need and engines disagree on, so the canonical form is fixed-width.
    """
    from pyspark.sql import functions as F

    def grp(col, shift):
        return F.lpad(
            F.lower(F.hex(F.shiftrightunsigned(col, shift).bitwiseAND(F.lit(0xFFFF)))),
            4,
            "0",
        )

    parts = [grp(hi, s) for s in (48, 32, 16, 0)] + [
        grp(lo, s) for s in (48, 32, 16, 0)
    ]
    return F.concat_ws(":", *parts)


def is_private_ipv6_pair(hi, lo):
    """v6 analogue of is_private_ip_num (labeler J6 short-circuit,
    reference pkg/labeler/remote.go:131-140): true for ULA fc00::/7,
    link-local fe80::/10, and loopback ::1 — the ranges that must
    bypass the cloud-prefix LPM and classify as INTRA_VPC/local.
    Pure bit tests on the hi64; loopback checks both halves.
    """
    from pyspark.sql import functions as F

    ula = F.shiftrightunsigned(hi, 57) == F.lit(0x7E)    # fc00::/7
    link_local = F.shiftrightunsigned(hi, 54) == F.lit(0x3FA)  # fe80::/10
    loopback = (hi == F.lit(0)) & (lo == F.lit(1))
    return ula | link_local | loopback

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

    Pure expression: split + fold, stays in codegen. Total function:
    non-dotted-quad input (a v6 string in mixed-family streams,
    garbage) yields NULL via try_cast rather than an ANSI cast error —
    the caller's miss/reject path handles null, a thrown cast would
    kill the whole task for one bad row.
    """
    col = F.col(ip) if isinstance(ip, str) else ip
    return F.aggregate(
        F.transform(F.split(col, r"\."), lambda x: x.try_cast("long")),
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


def ipv6_groups(col: Column | str) -> Column:
    """IPv6 string (full or ``::``-compressed) -> validated 8-element
    hex-group array, or NULL for out-of-contract forms (dotted-quad
    tails, zone ids, multi-``::``, wrong group counts).

    ONE whole-string regex per form decides validity (not a per-group
    regex — this expression runs per FACT ROW in the labeler, so the
    regex count is the cost driver), then array ops expand the ``::``.
    Stage this into a real column and feed :func:`ipv6_pair_from_groups`
    so the parse is evaluated once per row, not once per consumer of
    the pair."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    hexg = "[0-9a-f]{1,4}"
    full_ok = c.rlike(f"^{hexg}(:{hexg}){{7}}$")
    comp_ok = c.rlike(f"^({hexg}(:{hexg})*)?::({hexg}(:{hexg})*)?$")
    has_dc = c.contains("::")
    parts = F.split(c, "::")
    left = parts.getItem(0)
    right = F.when(F.size(parts) == 2, parts.getItem(1))
    lg = F.filter(F.split(left, ":"), lambda x: x != "")
    rg = F.filter(F.split(right, ":"), lambda x: x != "")
    pad = F.lit(8) - F.size(lg) - F.size(rg)
    expanded = F.concat(
        lg, F.array_repeat(F.lit("0"), pad.cast("int")), rg
    )
    # pad >= 1: '::' must stand for AT LEAST one zero group
    # ('1:2:3:4:5:6:7::8' is RFC-invalid and must null, not parse)
    return (
        F.when(~has_dc & full_ok, F.split(c, ":"))
        .when(has_dc & comp_ok & (pad >= 1), expanded)
    )


def ipv6_pair_from_groups(groups: Column) -> tuple[Column, Column]:
    """Validated group array (:func:`ipv6_groups`, ideally staged as a
    column) -> signed int64 ``(hi, lo)``. ``conv`` + ``shiftleft`` wrap
    top-bit addresses into the signed int64 exactly like the
    dimension\'s split128; a NULL array yields a NULL pair."""
    g = [F.conv(groups.getItem(i), 16, 10).cast("long") for i in range(8)]
    hi = (
        F.shiftleft(g[0], 48)
        .bitwiseOR(F.shiftleft(g[1], 32))
        .bitwiseOR(F.shiftleft(g[2], 16))
        .bitwiseOR(g[3])
    )
    lo = (
        F.shiftleft(g[4], 48)
        .bitwiseOR(F.shiftleft(g[5], 32))
        .bitwiseOR(F.shiftleft(g[6], 16))
        .bitwiseOR(g[7])
    )
    return hi, lo


def ipv6_string_to_pair(col: Column | str) -> tuple[Column, Column]:
    """IPv6 string (full or ``::``-compressed hex groups) -> signed
    int64 ``(hi, lo)`` pair — the 128-bit form the v6 LPM joins on
    (operators/lpm.py). Pure Column expressions, no UDF.

    Parse contract: hex groups (any case), at most one ``::``;
    dotted-quad tails, zone ids, and malformed group counts yield a
    NULL pair, which the labeler turns into a per-row reject (fail
    loud, never misclassify). Hot paths should stage
    :func:`ipv6_groups` into a column and use
    :func:`ipv6_pair_from_groups` (one parse per row)."""
    return ipv6_pair_from_groups(ipv6_groups(col))

"""Runtime deployment constants stamped onto every row.

The reference reads these from server config and bakes them into each
INSERT (reference pkg/inserter/inserter.go:20-25, cmd/server/main.go:107-134).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RuntimeConfig:
    environment: str = "development"  # development | staging | production
    cloud: str = "aws"
    region: str = "us-west-2"
    cluster: str = "cluster"
    #: Drop UDP flows (default true — reference values.yaml:68: UDP is 1/600
    #: of bytes but 6/8 of connection rate, pkg/labeler/labeler.go:183-188).
    ignore_udp: bool = True
    #: Drop IPv6 flows (default true = reference parity —
    #: pkg/labeler/labeler.go:243-247 filters v6 outright). False turns
    #: on the v6 metering path this engine adds: v6 endpoints parse to
    #: 128-bit pairs, classify through the v6 prefix dimension
    #: (operators/lpm.py::lpm_lookup6), and land in the same flow
    #: schema (the *IPv4 columns carry the v6 string). Pass
    #: ``prefixes6`` to label_flows alongside this flag.
    ignore_ipv6: bool = True

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

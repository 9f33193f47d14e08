"""Standalone ingest-bridge daemon: the agent-facing TCP endpoint on a
landing host (reference deploys run kubenetmon-server as its own
process — cmd/server/main.go; this is the engine's equivalent ops
entrypoint, no Spark required on the landing host).

    python tools/ingest_bridge.py --landing-dir /data/landing \
        --port 50051 --metrics-textfile /var/lib/node_exporter/kubenetmon.prom

Agents push varint-delimited protobuf Observation frames; files land
atomically; counters export in Prometheus text format on every flush
interval (textfile-collector scrape path). SIGTERM/SIGINT drain the
buffer before exit.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kubenetmon_spark.observability import prometheus_render, write_textfile  # noqa: E402
from kubenetmon_spark.sources.bridge import IngestBridge  # noqa: E402


def main(argv: list[str] | None = None, ready: threading.Event | None = None,
         stop: threading.Event | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--landing-dir", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=50051)
    ap.add_argument("--flush-frames", type=int, default=10_000)
    ap.add_argument("--flush-interval-s", type=float, default=1.0)
    ap.add_argument("--metrics-textfile", default=None)
    ap.add_argument("--no-validate", action="store_true",
                    help="skip per-frame decode validation at the door")
    args = ap.parse_args(argv)

    stop = stop or threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, lambda *_: stop.set())
        except ValueError:
            pass  # not the main thread (embedded/test use)

    bridge = IngestBridge(
        args.landing_dir,
        host=args.host,
        port=args.port,
        flush_frames=args.flush_frames,
        flush_interval_s=args.flush_interval_s,
        validate=not args.no_validate,
    )
    host, port = bridge.start()
    print(f"ingest bridge listening on {host}:{port} -> {args.landing_dir}", flush=True)
    if ready is not None:
        bridge_port = port
        main.bound = (host, bridge_port)  # type: ignore[attr-defined]
        ready.set()
    try:
        while not stop.wait(args.flush_interval_s):
            if args.metrics_textfile:
                write_textfile(
                    args.metrics_textfile,
                    prometheus_render(bridge.counter_samples()),
                )
    finally:
        bridge.stop(flush=True)  # drain before exit
        if args.metrics_textfile:
            write_textfile(
                args.metrics_textfile, prometheus_render(bridge.counter_samples())
            )
        print(f"ingest bridge drained: {bridge.stats}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

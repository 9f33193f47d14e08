"""Thin ingest receiver: agents push protobuf ``Observation`` bytes,
the receiver lands them as parquet files a Structured Streaming job
consumes — the process boundary the reference implements as a gRPC
server (reference cmd/server/server.go:61-118,
pkg/grpc/flow_handler.proto:8-13), re-expressed for a Spark engine
whose ingest contract is "observations land in a stream table"
(SURVEY.md §2 S2).

Wire format: ``POST /observations`` with a body of varint-length-
prefixed ``Observation`` messages (the standard protobuf streaming
framing; a single unprefixed message also works via
``?framing=single``). The receiver appends each request's messages to
the landing directory as ONE parquet file with a single binary
``value`` column — exactly the shape
``sources/proto.py::parse_proto_observations`` consumes — written
atomically (tmp + rename) so a running file stream never reads a
partial file.

Scale posture: this example is the EDGE of the system, not the
engine — one instance per ingest zone, stdlib-only, no Spark
dependency at serve time. Each request costs one parquet append;
batching lives in the agent (the reference's batchSize /
batchSendTimeout live client-side there too). Per-message decode
errors are rejected at the door with HTTP 400 and a count, mirroring
the reference server's skip-and-continue accounting
(server.go:100-113); accepted bytes are NOT decoded here — the
streaming job's Arrow-batched decoder does that work on executors.

Deployment notes live in MIGRATION.md ("Ingest boundary").
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def frame_messages(messages: list[bytes]) -> bytes:
    """varint-length-prefix framing (the client half)."""
    out = bytearray()
    for m in messages:
        v = len(m)
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | (0x80 if v else 0))
            if not v:
                break
        out += m
    return bytes(out)


def unframe_messages(body: bytes) -> list[bytes]:
    """Inverse of :func:`frame_messages`; raises ValueError on a
    truncated body (the whole request is rejected — no partial
    accept)."""
    out: list[bytes] = []
    i, n = 0, len(body)
    while i < n:
        shift = v = 0
        while True:
            if i >= n:
                raise ValueError("truncated varint length prefix")
            byte = body[i]
            i += 1
            v |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                break
            if shift > 35:
                raise ValueError("varint length prefix too long")
        if i + v > n:
            raise ValueError("truncated message body")
        out.append(body[i : i + v])
        i += v
    return out


class ObservationReceiver:
    """HTTP landing-dir receiver. Start/stop around a streaming job:

    >>> rx = ObservationReceiver(landing_dir)
    >>> rx.start()            # serves on 127.0.0.1:<port>
    >>> ... agents POST ...
    >>> rx.stop()

    ``stats`` counts accepted/rejected messages and landed files.
    """

    def __init__(self, landing_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.landing_dir = landing_dir
        self.host, self.port = host, port
        self.stats = {"accepted": 0, "rejected": 0, "files": 0}
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    # -- landing ---------------------------------------------------------
    def _land(self, messages: list[bytes]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.landing_dir, exist_ok=True)
        name = f"obs-{time.time_ns()}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.landing_dir, f".{name}.tmp")
        table = pa.table({"value": pa.array(messages, type=pa.binary())})
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.landing_dir, name))
        with self._lock:
            self.stats["accepted"] += len(messages)
            self.stats["files"] += 1

    # -- server ----------------------------------------------------------
    def start(self) -> "ObservationReceiver":
        receiver = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet the test logs
                pass

            def do_POST(self):
                if self.path.split("?")[0] != "/observations":
                    self.send_error(404)
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = self.rfile.read(length)
                    if "framing=single" in self.path:
                        messages = [body] if body else []
                    else:
                        messages = unframe_messages(body)
                    # validate decodability at the door (reject whole
                    # request on any bad message — the agent retries)
                    from kubenetmon_spark.sources.proto import (
                        decode_observation,
                    )

                    for m in messages:
                        decode_observation(m)
                except (ValueError, UnicodeDecodeError) as e:
                    with receiver._lock:
                        receiver.stats["rejected"] += 1
                    self.send_error(400, explain=str(e)[:200])
                    return
                if messages:
                    receiver._land(messages)
                self.send_response(204)
                self.end_headers()

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def read_received_observations(spark, landing_dir: str, max_files_per_trigger=None):
    """The streaming-side counterpart: landing dir -> observation rows
    (OBSERVATION_SCHEMA), ready for start_flow_stream."""
    from kubenetmon_spark.sources.proto import parse_proto_observations

    reader = spark.readStream.schema("value binary")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return parse_proto_observations(reader.parquet(landing_dir))

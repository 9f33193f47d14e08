"""Streaming corpus curation: incremental global dedup over a document
stream.

The batch operator (operators/curation.py::dedup_lines_incremental)
proves the invariant "sequential increments == one whole-corpus pass";
this module is its streaming harness: each micro-batch of documents is
deduplicated against the PERSISTED historical line index, emits its
reassembled survivors to the output table, and appends its new lines to
the index — so a crawl feed flows through `readStream` end to end and
the corpus-wide first-occurrence guarantee still holds across batches
AND restarts (the index is the durable state; the checkpoint guarantees
each batch lands exactly once).

Scale posture: the per-batch cost is the batch's line volume (anti-join
against the index hash-partitions on line text); the index is an
append-only parquet of distinct lines — compact it with
sink.deduplicate on a schedule if re-delivered batches ever double-write
(exactly-once via checkpoint means they normally cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def start_incremental_dedup_stream(
    docs_stream: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
    trigger: dict | None = None,
) -> StreamingQuery:
    """foreachBatch wiring of ``dedup_lines_incremental``: read the
    index (empty on first batch), dedup the micro-batch, append
    survivors to ``out_path`` and new lines to ``index_path``."""
    from kubenetmon_spark.operators.curation import dedup_lines_incremental
    from kubenetmon_spark.streaming.job import _apply_trigger

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(index_path)
        except Exception:
            seen = None
        out, updated = dedup_lines_incremental(
            batch_df, seen, id_col, text_col, line_sep
        )
        out.write.mode("append").parquet(out_path)
        if seen is not None:
            # append only the lines the index does not already hold
            new_lines = updated.join(seen, "line", "left_anti")
        else:
            new_lines = updated
        new_lines.write.mode("append").parquet(index_path)

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    return _apply_trigger(writer, trigger).start()

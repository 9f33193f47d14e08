"""Longest-prefix-match (LPM) join.

The reference resolves a remote IP to the most specific containing cloud
prefix with an in-memory IPv4 trie (`ElementsContaining` ->
`LongestPrefixMatch`, reference pkg/labeler/remote.go:177-186, trie built
at remote.go:23-26). It is the only non-equi join in the reference.

Spark-first design (SURVEY.md §2 J5): instead of a trie, a *banded range
join* —

1. every prefix ``[net_start, net_end]`` is exploded into the /16 "bands"
   it covers (``net_start>>16 .. net_end>>16``); a prefix with
   ``prefix_len >= 16`` lands in exactly one band, a /8 in 256 bands —
   the 43k-prefix dimension (reference README.md:127) stays tiny;
2. probes join the banded dimension **equi** on ``band = ip >> 16`` (a
   broadcast hash join — no nested-loop range join, no shuffle of the
   probe side), then filter ``BETWEEN net_start AND net_end``;
3. the longest prefix wins via ``max_by(struct, prefix_len)`` per probe —
   a map-side-combinable aggregation rather than a row_number window, so
   the only shuffle is the final per-IP reduce.

At 100 TB the probe side should be ``.select(ip).distinct()`` first
(the labeler does exactly that) so the reduce is over distinct IPs, not
fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND_SHIFT = 16

MATCH_COLS = ["prefix", "prefix_len", "cloud", "service", "region"]


def band_prefixes(prefixes: DataFrame) -> DataFrame:
    """Explode the prefix dimension into /16 bands for the equi join."""
    return prefixes.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.shiftright(F.col("net_start"), BAND_SHIFT),
                F.shiftright(F.col("net_end"), BAND_SHIFT),
            )
        ),
    )


def lpm_lookup(
    ips: DataFrame,
    prefixes: DataFrame,
    ip_num_col: str = "ip_num",
    out_prefix: str = "lpm_",
) -> DataFrame:
    """Append the longest-prefix-match columns to ``ips``.

    ``ips`` must carry a numeric IPv4 column ``ip_num_col``; one output row
    per input row; misses yield nulls (the reference treats a trie miss as
    "public internet", reference pkg/labeler/remote.go:177-186).
    """
    banded = F.broadcast(band_prefixes(prefixes))
    probes = ips.select(F.col(ip_num_col).alias("_ip")).distinct()
    cand = probes.join(
        banded,
        (F.shiftright(F.col("_ip"), BAND_SHIFT) == banded["band"])
        & F.col("_ip").between(F.col("net_start"), F.col("net_end")),
        "inner",
    )
    best = cand.groupBy("_ip").agg(
        F.max_by(
            F.struct(*MATCH_COLS),
            # tie-break deterministically on (prefix_len, net_start): equal
            # lengths cannot overlap for real CIDRs, but synthetic dims may.
            F.struct(F.col("prefix_len"), -F.col("net_start")),
        ).alias("_m")
    )
    best = best.select(
        "_ip", *[F.col(f"_m.{c}").alias(out_prefix + c) for c in MATCH_COLS]
    )
    # No broadcast hint on the join-back: `best` is bounded by the number of
    # distinct IPs, which AQE can size at runtime (small -> broadcast anyway;
    # huge at 100 TB -> shuffled hash join is the right call).
    return ips.join(best, ips[ip_num_col] == best["_ip"], "left").drop("_ip")

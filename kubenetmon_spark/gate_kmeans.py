"""Generated-SQL oracle builder for the exact-integer k-means gates
(q89, q219) — see operators/clustering.py::kmeans_fit_exact for the
operator twin."""

from __future__ import annotations


def kmeans_exact_ctes(
    k: int, n_iter: int, dim: int, scale: int, base: str
) -> str:
    """The unrolled exact-integer Lloyd's iteration as DuckDB CTEs —
    the oracle twin of ``kmeans_fit_exact``: int-quantized inputs,
    int64 sums, truncating centroid division (DuckDB ``//`` truncates
    toward zero, exactly like Spark's ``div``), ties to the lowest
    cluster. Produces ``a{n_iter+1}`` = the final assignment (rk = 1
    rows carry (vec_id, cl))."""
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "d -> (q.q[d] - c.c[d]) * (q.q[d] - c.c[d])))"
    )
    parts = [
        f"""q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
      FROM {base}
    )""",
        f"""c0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl,
             q AS c
      FROM q QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {k}
    )""",
    ]
    for i in range(1, n_iter + 2):
        parts.append(
            f"""a{i} AS MATERIALIZED (
      SELECT q.vec_id, q.q, c.cl,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {dist}, c.cl) AS rk
      FROM q, c{i - 1} c
    )"""
        )
        if i == n_iter + 1:
            break  # final assignment only — no further update
        parts.append(
            f"""u{i} AS MATERIALIZED (
      SELECT cl, t.d AS d, SUM(q[t.d]) AS s, COUNT(*) AS cnt
      FROM a{i}, (SELECT UNNEST(range(1, {dim + 1})) AS d) t
      WHERE rk = 1 GROUP BY cl, t.d
    )""",
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
      SELECT cl, list(s // cnt ORDER BY d) AS c FROM u{i} GROUP BY cl
      UNION ALL
      SELECT cl, c FROM c{i - 1}
      WHERE cl NOT IN (SELECT cl FROM u{i})
    )"""
        )
    return ",\n    ".join(parts)



"""As-of join (SURVEY.md §2.3 J8) — the streaming-enrichment join Spark
lacks natively: for each left row, the latest right row with
right_ts <= left_ts per key.

Implementation: union-tag + running `last(ignoreNulls)` window — the
scalable formulation. One shuffle on the key, one sort on
(ts, side, tiebreak); no range join, no per-key collect. DuckDB's
native ASOF JOIN is the oracle. Tie policy: at equal ts the right row
counts (sorts before left), and among right ties the largest tiebreak
wins — the oracle dedupes right rows per (key, ts) accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join; output = left columns + payload_cols from the
    matched right row (NULL when no right row precedes)."""
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = r_tag.unionByName(l_tag).select(
        "__side",
        "__left",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
    )
    out = enriched.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m_{c}").alias(f"right_{c}") for c in payload_cols],
    )
    return out

"""CDC / slowly-changing-dimension operators (ETL-framework surface;
pyspark_guide 'CDC / SCD2': no MERGE INTO without Delta, so emulate
with anti-join + union + interval bookkeeping — all hash-partitioned
DataFrame ops, no driver loops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Upsert: source rows replace target rows on `key`; unmatched
    target rows survive. (The batch emulation of MERGE INTO ...
    WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT.)"""
    keep = target.join(source.select(key), on=key, how="left_anti")
    return keep.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts: Column,
    eff_from: str = "eff_from",
    eff_to: str = "eff_to",
) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension.

    dim: (key, tracked..., eff_from, eff_to) with eff_to NULL marking
    the current row per key. updates: (key, tracked...). Rows whose
    tracked attributes changed (or whose key is new) close the current
    row at `ts` and open a new row [ts, NULL); identical updates are
    no-ops. History rows pass through untouched.
    """
    current = dim.filter(F.col(eff_to).isNull())
    history = dim.filter(F.col(eff_to).isNotNull())

    diff_cond = F.lit(False)
    for c in tracked:
        diff_cond = diff_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    joined = updates.alias("upd").join(
        current.alias("cur"), F.col(f"upd.{key}") == F.col(f"cur.{key}"), "left"
    )
    changed = joined.filter(F.col(f"cur.{key}").isNull() | diff_cond).select(
        *[F.col(f"upd.{c}") for c in [key, *tracked]]
    )

    closing = current.join(changed.select(key), on=key, how="left_semi").withColumn(
        eff_to, ts
    )
    unchanged_current = current.join(changed.select(key), on=key, how="left_anti")
    opened = changed.withColumn(eff_from, ts).withColumn(
        eff_to, F.lit(None).cast(dict(dim.dtypes)[eff_to])
    )
    return history.unionByName(closing).unionByName(unchanged_current).unionByName(opened)

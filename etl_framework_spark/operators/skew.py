"""Skew-mitigation operators (SURVEY.md §4: skew handling).

AQE's skew-join splitting covers joins automatically; for extreme
aggregation skew (one key holding a large share of all rows — e.g. a
mega-cluster in dedup, or a stopword in token counts) the classic
remedy is two-phase salted aggregation: shuffle once on
(key, salt), partially aggregate, then shuffle the S-times-smaller
partials on key alone.

Note Spark's built-in hash aggregation already map-side-combines, so
salting only pays when the per-key *partial* state is large (e.g.
collect-style or distinct-style aggs); for plain sums it is a wash —
the test asserts semantics, SCALE.md records when to reach for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) via two salted phases.

    The salt is a deterministic hash of ``salt_on`` (default: the
    value column) — never rand(), so retries/replays stay stable.
    """
    val = F.col(value) if isinstance(value, str) else value
    salt_src = F.col(salt_on) if salt_on else val
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(val).alias("__psum"), F.count("*").alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias("sum_value"), F.sum("__pcnt").alias("n_rows")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a hot key on the LEFT (fact) side: left
    rows get a deterministic salt in [0, n_salts); the RIGHT (smaller)
    side is replicated n_salts times via an exploded literal range, so
    the join key becomes (key, salt) and the hot key's rows spread
    over n_salts reducers instead of one straggler task.

    Use when AQE skew splitting can't help — e.g. the skew is in a
    shuffle feeding a non-join operator, or the join is shuffled-hash
    on a deliberately partitioned layout. The salt hashes a uniform
    row-local column surrogate (monotonically varying join payload is
    unnecessary: spreading only needs per-ROW variation, so we hash
    the whole left row via all columns).

    Supports inner/left joins (right replication breaks right/full
    null-extension accounting).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lsalted = left.withColumn("__salt", salt)
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = lsalted.join(rrep, [key, "__salt"], how)
    return out.drop("__salt")

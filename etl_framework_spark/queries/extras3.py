"""Third-wave function coverage: bitwise operators + regexp predicates
(F3/F1 widening) and array set operations (F4 widening). Array set-op
results are exposed order-insensitively (sizes/booleans/positions) —
Spark and DuckDB order distinct-union elements differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15 AS band,
           p_size | 16 AS bor,
           xor(p_size, 21) AS bxor,
           p_size << 2 AS shl,
           p_size >> 1 AS shr,
           ~p_size AS bnot,
           CAST(bit_count(p_size) AS INT) AS bcnt,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels
    FROM part
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators + regexp predicates (F3/F1)."""
    prep(spark)
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("p_size & 15").alias("band"),
        F.expr("p_size | 16").alias("bor"),
        F.expr("p_size ^ 21").alias("bxor"),
        F.shiftleft(F.col("p_size"), 2).alias("shl"),
        F.shiftright(F.col("p_size"), 1).alias("shr"),
        F.expr("~p_size").alias("bnot"),
        F.bit_count(F.col("p_size")).alias("bcnt"),
        F.expr("regexp_like(p_name, '[aeiou]{2}')").alias("has_double_vowel"),
        F.expr("regexp_count(p_name, '[aeiou]')").alias("n_vowels"),
    )


@query(
    "fn_array2",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST(len(list_distinct(list_concat(l, ['alpha', 'beta']))) AS INT)
             AS n_union,
           CAST(len(list_filter(list_distinct(l),
                    x -> x NOT IN ('the', 'of', 'and'))) AS INT) AS n_except,
           len(list_intersect(l, ['the', 'of'])) > 0 AS has_common,
           CAST(coalesce(list_position(l, 'the'), 0) AS BIGINT) AS pos_the,
           array_to_string(generate_series(1, CAST(len(l) % 4 + 1 AS INT)), '-')
             AS seq_str,
           array_to_string(list_slice(list_reverse(l), 1, 3), ' ') AS last3_rev
    FROM t
    """,
)
def fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (F4): union/except/overlap/position +
    sequence generation and reversal."""
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("l"))
    return t.select(
        "doc_id",
        F.size(F.array_union("l", F.array(F.lit("alpha"), F.lit("beta")))).alias(
            "n_union"
        ),
        F.size(
            F.array_except("l", F.array(F.lit("the"), F.lit("of"), F.lit("and")))
        ).alias("n_except"),
        F.arrays_overlap("l", F.array(F.lit("the"), F.lit("of"))).alias("has_common"),
        F.array_position("l", "the").alias("pos_the"),
        F.array_join(F.sequence(F.lit(1), F.size("l") % 4 + 1), "-").alias("seq_str"),
        F.array_join(F.slice(F.reverse(F.col("l")), 1, 3), " ").alias("last3_rev"),
    )

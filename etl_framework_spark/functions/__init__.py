"""Column-function library façade (SURVEY.md §7 package layout).

Everything here is a pure Column-in → Column-out expression builder
(JVM-side, codegen-friendly); re-exported from the operator modules
where each family lives with its tests and DuckDB-oracle mirrors.
"""

from etl_framework_spark.operators.dedup import (
    jaccard,
    minhash_signature,
    md5_per_token,
    simhash16,
)
from etl_framework_spark.operators.similarity import (
    cosine,
    dot_fold,
    l2_norm,
    lsh_buckets,
)
from etl_framework_spark.operators.textops import (
    distinct_tokens,
    lang_scores,
    normalize_text,
    shingles,
    stopword_ratio,
    tokens,
)

__all__ = [
    "jaccard",
    "minhash_signature",
    "md5_per_token",
    "simhash16",
    "cosine",
    "dot_fold",
    "l2_norm",
    "lsh_buckets",
    "distinct_tokens",
    "lang_scores",
    "normalize_text",
    "shingles",
    "stopword_ratio",
    "tokens",
]

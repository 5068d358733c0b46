"""Vector similarity primitives (SURVEY.md §2.11 L3/L7).

The folds are written as strict left-to-right float64 accumulation so
the DuckDB oracle (list_reduce over the same element order) produces
bit-identical results: 0.0 + p1 == p1 in IEEE-754, and every
subsequent add associates identically. Rounding at the query edge is
belt-and-braces only.

Scale path: these JVM higher-order functions vectorize per row and
need no shuffle; for massive ANN fan-out use `lsh_buckets` to turn
the O(n·m) scan into bucket-local joins.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_fold(a: Column, b: Column) -> Column:
    """Strict sequential dot product of two float arrays, in float64."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (l2_norm(a) * l2_norm(b))


# DuckDB oracle snippets mirroring the folds above, for reuse in
# oracle SQL strings. {a}/{b} are list-typed SQL expressions.
DUCK_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)
DUCK_NORM = (
    "sqrt(list_reduce(list_transform({a},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))"
)


def duck_cosine(a: str, b: str) -> str:
    dot = DUCK_DOT.format(a=a, b=b)
    na = DUCK_NORM.format(a=a)
    nb = DUCK_NORM.format(a=b)
    return f"({dot}) / (({na}) * ({nb}))"


def ann_params(n_vectors: int) -> tuple[int, int]:
    """Sign-LSH sizing rule shared by the query path and its recall
    tests: P = round(log2(N)/2) planes clamped to [4, 16], so the
    bucket count 2^P tracks ~sqrt(N) — per-query candidate work with
    Hamming-≤1 multiprobe is (P+1)·N/2^P ≈ (P+1)·sqrt(N), sub-linear
    in the corpus. Returns (n_planes, n_buckets)."""
    import math

    p = max(4, min(16, round(math.log2(max(n_vectors, 2)) / 2)))
    return p, 1 << p


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH bucketing."""
    rs = np.random.RandomState(seed)
    return rs.randn(n_planes, dim)


def lsh_buckets(vec: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: bit p = sign(dot(vec, plane_p)).

    O(P·D) per row, JVM-side, no shuffle — the 100 TB path for ANN:
    bucket first (this), then join candidates within buckets instead
    of scanning all n·m pairs.
    """
    bucket = F.lit(0)
    for p, row in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in row])
        bit = (dot_fold(vec, plane) > 0).cast("int")
        bucket = bucket + bit * (1 << p)
    return bucket


def stable_seed(tag: str) -> int:
    """md5-derived integer seed — stable across processes/partitions
    (never Python's salted hash(); SURVEY.md §7 'MinHash determinism')."""
    return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)


def blocked_cosine_pairs(df, block_col: str, tau: float):
    """All within-block pairs (id_a < id_b) with quantized cosine ≥ tau.

    Input columns: (block_col int, vec_id long, embedding array<float>).
    Output: (block_col int, id_a, id_b, cos_sim) — cos_sim quantized
    with the trunc(x·1e6 + sign·0.5)/1e6 formula shared by every
    kernel/oracle in this repo.

    Executed as applyInPandas per block: each block's pairwise cosines
    are a strict dimension-ordered slab fold (acc += one dimension's
    outer-product slab at a time), bit-identical to the JVM
    dot_fold/l2_norm and the DuckDB list_reduce oracle —
    multiplication commutes in IEEE-754, so pair orientation doesn't
    change bits. Row-chunked to bound the n×n slab. One task per
    block: blocking IS the distribution unit (same statement a
    self-join makes); blocks too hot for one task belong in the
    LSH/IVF paths.
    """
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        blk = int(pdf[block_col].iloc[0])
        order = np.argsort(ids)
        V, ids = V[order], ids[order]
        n, dims = V.shape
        acc = np.zeros(n)
        for d in range(dims):  # strict fold: ((0 + p1) + p2) + ...
            acc = acc + V[:, d] * V[:, d]
        nrm = np.sqrt(acc)
        out_a, out_b, out_c = [], [], []
        chunk = 512
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            S = np.zeros((hi - lo, n))
            for d in range(dims):  # same strict fold, slab-vectorized
                S = S + V[lo:hi, d][:, None] * V[None, :, d]
            cos = S / (nrm[lo:hi, None] * nrm[None, :])
            cq = np.trunc(cos * 1e6 + np.sign(cos) * 0.5) / 1e6
            for i in range(lo, hi):
                js = np.nonzero((ids > ids[i]) & (cq[i - lo] >= tau))[0]
                out_a.extend([ids[i]] * len(js))
                out_b.extend(ids[js])
                out_c.extend(cq[i - lo][js])
        return pd.DataFrame(
            {
                block_col: pd.Series([blk] * len(out_a), dtype="int32"),
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "cos_sim": pd.Series(out_c, dtype="float64"),
            }
        )

    return df.groupBy(block_col).applyInPandas(
        fn, schema=f"{block_col} int, id_a long, id_b long, cos_sim double"
    )


_MAX_ANCHOR_COLLECT = 100_000


def anchor_modulus(n_vectors: int, max_anchors: int | None = None) -> int:
    """Deterministic 1-in-m anchor sampling modulus for the anchor_knn
    consumers (VERDICT r7 item 6): the smallest modulus ≥ 5 that keeps
    ~n/m anchors inside the collect guard. Equals 5 through n =
    5·max_anchors = 500k vectors — every oracle-checked SF, so the
    static `vec_id % 5` SQL oracles stay exact there — and grows
    linearly with N past that, pinning the anchor count (the hubness /
    TwoNN estimators only need a bounded sample regardless of corpus
    size). One bounded count() sizes it at build time. ``max_anchors``
    resolves against the module attribute at CALL time so the growth
    branch is exercisable on real data at test scale (r8 item 4)."""
    import math

    if max_anchors is None:
        max_anchors = _MAX_ANCHOR_COLLECT
    return max(5, math.ceil(n_vectors / max_anchors))


_ORACLE_ANCHOR_MOD = 5
ANCHOR_GROWTH_ENV = "SPARK_GRAFT_ALLOW_ANCHOR_GROWTH"


def anchor_modulus_locked(n_vectors: int) -> int:
    """anchor_modulus with the oracle-lockstep guard (ADVICE r8): the
    consumers' registered SQL oracles hard-code ``vec_id % 5``, exact
    through 500k vectors. Past that the Spark side would silently
    diverge from its oracle, so raise LOUDLY — restoring the old
    collect-guard's failure mode — unless the caller explicitly opted
    into the rows-only growth regime (the scale probe and the
    growth-path test set SPARK_GRAFT_ALLOW_ANCHOR_GROWTH=1).

    The opt-in is parsed as a boolean, not truthiness of the raw
    string (ADVICE r9): ``=0``/``=false`` — the natural way to say
    "off" — must keep the guard ARMED."""
    mod = anchor_modulus(n_vectors)
    growth_ok = os.environ.get(ANCHOR_GROWTH_ENV, "").strip().lower() in (
        "1", "true", "yes", "on",
    )
    if mod != _ORACLE_ANCHOR_MOD and not growth_ok:
        raise ValueError(
            f"anchor modulus {mod} (n_vectors={n_vectors}) diverges from "
            f"the static `vec_id % {_ORACLE_ANCHOR_MOD}` SQL oracle; this "
            f"corpus is past the oracle-exact regime — set "
            f"{ANCHOR_GROWTH_ENV}=1 for rows-only scale runs"
        )
    return mod


def anchor_knn(cand_df, anchor_df, k: int, quant: float,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """k nearest candidates per anchor by quantized squared-L2.

    The scale shape for fixed-size anchor sets (TwoNN / hubness
    estimators sample a few thousand anchors regardless of corpus
    size): the anchor matrix is collected once (guarded, M·D·8 B) and
    shipped in the task closure; candidates stream through
    mapInPandas, each Arrow batch computing a (batch × M) distance
    slab with a dimension-SEQUENTIAL numpy fold — acc starts at the
    first diff² and adds one dimension's slab at a time, the exact
    IEEE-754 add order of the JVM
    ``aggregate(slice(diffs,2,..), element_at(diffs,1), +)`` fold and
    the DuckDB list_reduce oracle, so quantized distances are
    bit-identical while running ~50× faster than per-row interpreted
    lambdas. Each batch emits only its local top-k per anchor
    (i ≠ j pairs masked), so the global re-rank sees ≤ batches·M·k
    rows instead of M·N pairs. No shuffle until that tiny re-rank.

    Output columns: i (anchor id), j (candidate id), qd2
    (floor(d2·quant + 0.5) as bigint). Callers re-rank globally with
    row_number over i ordered by (qd2, j).
    """
    import pandas as pd

    rows = anchor_df.select(id_col, vec_col).limit(_MAX_ANCHOR_COLLECT + 1).collect()
    if len(rows) > _MAX_ANCHOR_COLLECT:
        raise ValueError(
            f"anchor_knn: anchor set exceeds {_MAX_ANCHOR_COLLECT}; "
            "grow the sampling modulus so the anchor count stays fixed "
            "(callers pin the modulus statically so their SQL oracle "
            "matches — see the SF-ceiling note at each call site)"
        )
    if not rows:
        raise ValueError(
            "anchor_knn: anchor set is empty — the sampling predicate "
            "matched no rows (ADVICE r6: an empty anchor matrix would "
            "otherwise die in an opaque numpy unpack)"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    A = np.array([r[1] for r in rows], dtype=np.float64)  # (M, D)
    m, dims = A.shape
    sentinel = np.iinfo(np.int64).max

    def gen(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            E = np.array(list(pdf[vec_col]), dtype=np.float64)  # (B, D)
            j = pdf[id_col].to_numpy().astype(np.int64)
            acc = (E[:, 0, None] - A[None, :, 0]) ** 2
            for d in range(1, dims):  # strict fold, slab-vectorized
                acc += (E[:, d, None] - A[None, :, d]) ** 2
            # Clip before the cast: numpy float->int64 overflow yields
            # INT64_MIN (negative — would sort ahead of every real
            # distance and defeat the sentinel mask), whereas the JVM
            # floor-to-bigint this claims parity with saturates at
            # Long.MAX. Clip to 2^63-1024, the largest float64 that is
            # exactly representable AND below Long.MAX (float(Long.MAX)
            # rounds UP to 2^63 and still wraps on cast) — overflowed
            # distances rank last but stay distinct from the sentinel,
            # so they are never silently dropped. Only reachable when
            # d2·quant > ~9.2e18, far outside normalized-embedding
            # range (ADVICE r6).
            q = np.floor(acc * quant + 0.5)
            q = np.clip(q, 0.0, float(2**63 - 2**10)).astype(np.int64)
            q[j[:, None] == ids[None, :]] = sentinel  # exclude i == j
            kk = min(k, len(pdf))
            out_i, out_j, out_q = [], [], []
            for col_idx in range(m):
                col = q[:, col_idx]
                top = np.lexsort((j, col))[:kk]  # ties break on j
                top = top[col[top] != sentinel]
                out_i.append(np.full(len(top), ids[col_idx], dtype=np.int64))
                out_j.append(j[top])
                out_q.append(col[top])
            yield pd.DataFrame(
                {
                    "i": np.concatenate(out_i),
                    "j": np.concatenate(out_j),
                    "qd2": np.concatenate(out_q),
                }
            )

    return cand_df.select(id_col, vec_col).mapInPandas(
        gen, "i bigint, j bigint, qd2 bigint"
    )

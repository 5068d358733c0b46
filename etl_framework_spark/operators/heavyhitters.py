"""Distributed exact heavy hitters via Misra-Gries candidate
generation (SURVEY.md §2.11 L4 widening; the streaming/scale
counterpart to exact top-k vocabulary).

Two-pass shape:

1. Each input partition builds a Misra-Gries summary with ``k``
   counters (bounded memory regardless of partition vocabulary) via
   ``mapInPandas`` — Arrow batches in, one small summary frame out.
2. The union of per-partition candidates is exactly recounted with a
   broadcast semi-join + hash agg, and filtered against a *relative*
   threshold (fraction of total item count).

Correctness: Misra-Gries undercounts any item by at most N_p/(k+1)
per partition, so the summed undercount is ≤ N/(k+1). Any item with
global frequency ≥ frac·N therefore survives pass 1 whenever
frac > 1/(k+1) — pass 2 then makes the final set and counts exact,
which is what lets a sketch-based plan keep an exact SQL oracle.

At 100 TB: pass 1 is a pure map (no shuffle, bounded state), pass 2
shuffles only candidate rows (≤ k per partition) plus one broadcast
of the candidate set to the recount scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_summarize(k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["tok"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:  # decrement-all step; drops ≥1 counter
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"tok": list(counters.keys()), "c": list(counters.values())}
        )

    return fn


def heavy_hitters(toks: DataFrame, frac: float, k: int = 512) -> DataFrame:
    """Items of `toks.tok` with frequency ≥ frac * N, exactly.

    Requires frac > 1/(k+1) for the Misra-Gries survival guarantee
    (asserted); returns (tok, freq) with exact counts.
    """
    if not frac > 1.0 / (k + 1):
        raise ValueError(f"frac={frac} must exceed 1/(k+1)={1.0/(k+1):.6f}")
    cands = (
        toks.mapInPandas(_mg_summarize(k), "tok string, c long")
        .select("tok")
        .distinct()
    )
    n = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("freq") >= F.lit(frac) * F.col("n_total"))
        .select("tok", "freq")
    )

"""Pipeline engine + source/sink connector tests (SURVEY.md §2.1, §3.2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.pipeline import Pipeline, run_pipeline
from etl_framework_spark.sources import read_source, write_sink
from tests.conftest import SF_SMALL

SCRATCH = "/root/repo/.scratch/test_pipeline"


def test_spec_validation_unknown_op():
    with pytest.raises(ValueError, match="unknown op"):
        Pipeline(
            {
                "sources": {"a": {"format": "parquet", "path": "/x"}},
                "steps": [{"name": "b", "input": "a", "op": "nope", "args": {}}],
            }
        )


def test_spec_validation_unknown_input():
    with pytest.raises(ValueError, match="unknown input"):
        Pipeline(
            {
                "sources": {},
                "steps": [{"name": "b", "input": "missing", "op": "filter",
                           "args": {"condition": "1=1"}}],
            }
        )


def test_spec_validation_unknown_sink_input():
    with pytest.raises(ValueError, match="unknown relation"):
        Pipeline({"sources": {}, "steps": [], "sinks": [{"input": "nope", "path": "/x"}]})


def test_pipeline_join_and_sql_steps(spark):
    """Multi-source pipeline: op-join + SQL step + view sink."""
    spec = {
        "sources": {
            "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"},
            "customer": {"format": "parquet", "path": f"{SF_SMALL}/customer.parquet"},
        },
        "steps": [
            {
                "name": "joined",
                "input": "orders",
                "op": "join",
                "args": {
                    "right": "customer",
                    "on": "o_custkey = c_custkey",
                    "how": "inner",
                    "broadcast_right": True,
                },
            },
            {
                "name": "by_segment",
                "sql": "SELECT c_mktsegment, count(*) AS n FROM joined GROUP BY 1",
            },
        ],
        "sinks": [{"input": "by_segment", "format": "view", "name": "seg_counts"}],
    }
    rel = run_pipeline(spark, spec)
    n = rel["by_segment"].agg(F.sum("n")).collect()[0][0]
    assert n == table(spark, SF_SMALL, "orders").count()
    assert spark.table("seg_counts").count() == rel["by_segment"].count()


def test_csv_json_roundtrip(spark):
    """S2/S3/S6: csv + json sinks and schema-on-read sources."""
    df = table(spark, SF_SMALL, "nation")
    write_sink(df, {"format": "csv", "path": f"{SCRATCH}/nation_csv"})
    write_sink(df, {"format": "json", "path": f"{SCRATCH}/nation_json"})
    back_csv = read_source(
        spark,
        {
            "format": "csv",
            "path": f"{SCRATCH}/nation_csv",
            "schema": "n_nationkey int, n_name string, n_regionkey int",
        },
    )
    back_json = read_source(spark, {"format": "json", "path": f"{SCRATCH}/nation_json"})
    base = sorted(map(str, df.collect()))
    assert sorted(map(str, back_csv.collect())) == base
    assert (
        sorted(map(str, back_json.select("n_nationkey", "n_name", "n_regionkey").collect()))
        == base
    )


def test_table_source_sink_roundtrip(spark):
    """Catalog-managed table as a first-class spec vocabulary item
    (VERDICT r5 item 7): write with {"format": "table"} (saveAsTable),
    read back with {"format": "table", "name": ...} via the session
    catalog — the Hive-metastore path at cluster scale."""
    df = table(spark, SF_SMALL, "region")
    write_sink(df, {"format": "table", "name": "rt_region_managed"})
    back = read_source(spark, {"format": "table", "name": "rt_region_managed"})
    assert sorted(r.r_regionkey for r in back.collect()) == sorted(
        r.r_regionkey for r in df.collect()
    )
    # and the spec composes through a full pipeline run
    rel = run_pipeline(
        spark,
        {
            "sources": {"r": {"format": "table", "name": "rt_region_managed"}},
            "steps": [
                {"name": "small", "input": "r", "op": "filter",
                 "args": {"condition": "r_regionkey < 3"}}
            ],
            "sinks": [{"input": "small", "format": "view", "name": "rt_small"}],
        },
    )
    assert rel["small"].count() == 3
    spark.sql("DROP TABLE IF EXISTS rt_region_managed")


def test_table_source_unknown_name(spark):
    with pytest.raises(ValueError, match="not in catalog"):
        read_source(spark, {"format": "table", "name": "no_such_table_xyz"})


def test_jdbc_source_validates_args(spark):
    with pytest.raises(ValueError, match="jdbc source missing"):
        read_source(spark, {"format": "jdbc", "url": "jdbc:postgresql://x/db"})


def test_streaming_source_spec(spark):
    """S8 via spec: stream=True returns a streaming DataFrame."""
    src = read_source(
        spark,
        {
            "format": "parquet",
            "path": f"{SF_SMALL}/nation.*",
            "schema": "n_nationkey int, n_name string, n_regionkey int",
            "stream": True,
        },
    )
    assert src.isStreaming


def test_pipeline_composes_llm_dedup(spark):
    """E1 composing an LLM op: a spec-driven pipeline that normalizes,
    exact-dedups (keep earliest per normalized hash), quality-filters,
    and sinks — the reference-style declarative ETL over the LLM
    operator vocabulary."""
    spec = {
        "sources": {
            "documents": {"format": "parquet", "path": f"{SF_SMALL}/documents.parquet"}
        },
        "steps": [
            {
                "name": "normed",
                "input": "documents",
                "op": "with_columns",
                "args": {
                    "columns": {
                        "norm_hash": (
                            "sha2(regexp_replace(lower(trim(text)), '\\\\s+', ' '), 256)"
                        )
                    }
                },
            },
            {
                "name": "deduped",
                "input": "normed",
                "op": "dedup",
                "args": {"keys": ["norm_hash"], "order_by": ["doc_id"]},
            },
            {
                "name": "quality",
                "input": "deduped",
                "op": "filter",
                "args": {"condition": "n_chars BETWEEN 100 AND 450 AND lang IN ('en','es','de')"},
            },
        ],
        "sinks": [{"input": "quality", "format": "view", "name": "clean_docs"}],
    }
    from etl_framework_spark.pipeline import run_pipeline

    rel = run_pipeline(spark, spec)
    n_docs = rel["documents"].count()
    n_clean = spark.table("clean_docs").count()
    assert 0 < n_clean <= n_docs
    # dedup kept at most one row per hash
    assert (
        spark.table("clean_docs").groupBy("norm_hash").count().filter("count > 1").count()
        == 0
    )


def test_orc_roundtrip(spark):
    """S-family: ORC source/sink round-trip."""
    df = table(spark, SF_SMALL, "region")
    write_sink(df, {"format": "orc", "path": f"{SCRATCH}/region_orc"})
    back = read_source(spark, {"format": "orc", "path": f"{SCRATCH}/region_orc"})
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_pipeline_remaining_ops(spark):
    """Exercise every registered op not covered elsewhere: select,
    with_columns, drop, window, distinct, union, order_by, limit,
    repartition."""
    spec = {
        "sources": {
            "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
        },
        "steps": [
            {"name": "proj", "input": "orders", "op": "select",
             "args": {"exprs": ["o_orderkey", "o_orderstatus", "o_totalprice"]}},
            {"name": "w", "input": "proj", "op": "window",
             "args": {"columns": {"rn": (
                 "row_number() OVER (PARTITION BY o_orderstatus "
                 "ORDER BY o_totalprice DESC, o_orderkey)")}}},
            {"name": "top", "input": "w", "op": "filter",
             "args": {"condition": "rn <= 5"}},
            {"name": "slim", "input": "top", "op": "drop", "args": {"columns": ["rn"]}},
            {"name": "doubled", "input": "slim", "op": "union",
             "args": {"right": "slim"}},
            {"name": "uniq", "input": "doubled", "op": "distinct"},
            {"name": "sorted", "input": "uniq", "op": "order_by",
             "args": {"exprs": ["o_totalprice DESC", "o_orderkey"]}},
            {"name": "limited", "input": "sorted", "op": "limit", "args": {"n": 10}},
            {"name": "parts", "input": "limited", "op": "repartition",
             "args": {"num": 2, "by": ["o_orderstatus"]}},
        ],
    }
    from etl_framework_spark.pipeline import run_pipeline

    rel = run_pipeline(spark, spec)
    assert rel["top"].count() == 15       # 3 statuses × top-5
    assert rel["uniq"].count() == 15      # union-with-self deduped
    assert rel["limited"].count() == 10
    assert rel["parts"].rdd.getNumPartitions() == 2
    # window op produced the same top-5 as a direct window query
    from pyspark.sql import Window as W

    direct = (
        table(spark, SF_SMALL, "orders")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_orderstatus").orderBy(
                    F.col("o_totalprice").desc(), F.col("o_orderkey")
                )
            ),
        )
        .filter("rn <= 5")
        .select("o_orderkey")
    )
    assert {r.o_orderkey for r in rel["top"].collect()} == {
        r.o_orderkey for r in direct.collect()
    }


def test_validation_step_passes_and_is_passthrough(spark):
    from etl_framework_spark.pipeline import run_pipeline

    rel = run_pipeline(
        spark,
        {
            "sources": {
                "orders": {
                    "format": "parquet",
                    "path": f"{SF_SMALL}/orders.parquet",
                }
            },
            "steps": [
                {
                    "name": "checked",
                    "input": "orders",
                    "op": "validate",
                    "args": {
                        "checks": [
                            {"type": "row_count", "min": 1},
                            {"type": "not_null", "columns": ["o_orderkey", "o_custkey"]},
                            {"type": "unique", "columns": ["o_orderkey"]},
                            {
                                "type": "accepted_values",
                                "column": "o_orderstatus",
                                "values": ["F", "O", "P"],
                            },
                            {"type": "expression", "expr": "o_totalprice > 0"},
                        ]
                    },
                }
            ],
        },
    )
    assert rel["checked"].count() == rel["orders"].count()


def test_validation_step_reports_every_failure(spark):
    import pytest as _pytest

    from etl_framework_spark.pipeline import ValidationError, run_pipeline

    with _pytest.raises(ValidationError) as exc:
        run_pipeline(
            spark,
            {
                "sources": {
                    "orders": {
                        "format": "parquet",
                        "path": f"{SF_SMALL}/orders.parquet",
                    }
                },
                "steps": [
                    {
                        "name": "checked",
                        "input": "orders",
                        "op": "validate",
                        "args": {
                            "checks": [
                                {"type": "row_count", "max": 10},
                                {"type": "unique", "columns": ["o_orderstatus"]},
                                {"type": "expression", "expr": "o_totalprice < 0"},
                            ]
                        },
                    }
                ],
            },
        )
    msg = str(exc.value)
    assert "row_count" in msg and "unique" in msg and "expression" in msg


def test_sink_observe_validation_zero_extra_scan(spark, tmp_path):
    """Sink-attached checks ride df.observe: metrics come from the
    write action itself (no second scan). Good data passes; a failing
    gate raises after the write with the sink named."""
    import pytest as _pytest

    from etl_framework_spark.pipeline import ValidationError, run_pipeline

    spec = {
        "sources": {
            "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
        },
        "steps": [
            {
                "name": "recent",
                "input": "orders",
                "op": "filter",
                "args": {"condition": "o_orderdate >= timestamp '1997-01-01'"},
            }
        ],
        "sinks": [
            {
                "input": "recent",
                "format": "parquet",
                "path": str(tmp_path / "ok"),
                "validate": [
                    {"type": "row_count", "min": 1},
                    {"type": "not_null", "columns": ["o_orderkey"]},
                    {"type": "expression", "expr": "o_totalprice > 0"},
                ],
            }
        ],
    }
    run_pipeline(spark, spec)
    assert spark.read.parquet(str(tmp_path / "ok")).count() > 0

    bad = dict(spec)
    bad["sinks"] = [
        {
            "input": "recent",
            "format": "parquet",
            "path": str(tmp_path / "bad"),
            "validate": [{"type": "row_count", "max": 5}],
        }
    ]
    with _pytest.raises(ValidationError, match="recent"):
        run_pipeline(spark, bad)


def test_sink_validation_rejects_view_and_unique(spark, tmp_path):
    import pytest as _pytest

    from etl_framework_spark.pipeline import Pipeline, run_pipeline

    with _pytest.raises(ValueError, match="view sinks"):
        Pipeline(
            {
                "sources": {
                    "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
                },
                "steps": [],
                "sinks": [
                    {
                        "input": "orders",
                        "format": "view",
                        "name": "v",
                        "validate": [{"type": "row_count", "min": 1}],
                    }
                ],
            }
        )
    with _pytest.raises(ValueError, match="unique"):
        run_pipeline(
            spark,
            {
                "sources": {
                    "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
                },
                "steps": [],
                "sinks": [
                    {
                        "input": "orders",
                        "format": "parquet",
                        "path": str(tmp_path / "x"),
                        "validate": [{"type": "unique", "columns": ["o_orderkey"]}],
                    }
                ],
            },
        )


def test_topk_per_group_op(spark):
    spec = {
        "sources": {
            "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
        },
        "steps": [
            {
                "name": "top3",
                "input": "orders",
                "op": "topk_per_group",
                "args": {
                    "keys": ["o_orderstatus"],
                    "order_by": ["o_totalprice DESC", "o_orderkey"],
                    "k": 3,
                },
            }
        ],
    }
    out = run_pipeline(spark, spec)["top3"].toPandas()
    assert (out.groupby("o_orderstatus").size() <= 3).all()
    full = table(spark, SF_SMALL, "orders").toPandas()
    for st, grp in full.groupby("o_orderstatus"):
        want = set(
            grp.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .head(3)
            .o_orderkey
        )
        assert set(out[out.o_orderstatus == st].o_orderkey) == want


def test_sessionize_op_gap_semantics(spark):
    from etl_framework_spark.catalog import table as _t

    ev = _t(spark, SF_SMALL, "events")
    from etl_framework_spark.pipeline import OPS

    out = OPS["sessionize"](ev, key="user_id", ts="ts", gap_minutes=30).toPandas()
    out = out.sort_values(["user_id", "ts"])
    for _, g in out.groupby("user_id"):
        sid = g.session_id.to_numpy()
        assert sid[0] == 1
        assert ((sid[1:] - sid[:-1]) >= 0).all() and ((sid[1:] - sid[:-1]) <= 1).all()
        gaps = (
            g.ts.dt.floor("s").diff().dt.total_seconds().to_numpy()[1:]
        )
        new = sid[1:] != sid[:-1]
        assert (gaps[new] > 30 * 60).all()
        assert (gaps[~new] <= 30 * 60).all()


def test_hash_sample_deterministic_subset(spark):
    from etl_framework_spark.pipeline import OPS

    docs = table(spark, SF_SMALL, "documents")
    a = OPS["hash_sample"](docs, keys=["doc_id"], fraction=0.2).toPandas()
    b = OPS["hash_sample"](docs, keys=["doc_id"], fraction=0.2).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    n = docs.count()
    assert 0.1 * n < len(a) < 0.35 * n  # loose binomial bounds
    # smaller fraction is a strict subset (hash-prefix property)
    c = OPS["hash_sample"](docs, keys=["doc_id"], fraction=0.1).toPandas()
    assert set(c.doc_id) <= set(a.doc_id)


def test_quality_gate_op(spark):
    from etl_framework_spark.pipeline import OPS

    docs = table(spark, SF_SMALL, "documents")
    out = OPS["quality_gate"](
        docs, bounds={"n_chars": [100, 1500]}, allow={"lang": ["en", "de"]}
    ).toPandas()
    assert out.n_chars.between(100, 1500).all()
    assert out.lang.isin(["en", "de"]).all()
    manual = docs.filter(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 1500) & F.col("lang").isin("en", "de")
    ).count()
    assert len(out) == manual


def test_asof_join_op_registered(spark):
    """The declarative asof_join step wires to the J8 operator: enrich
    each purchase with the user's latest earlier view value."""
    from etl_framework_spark.catalog import table as _t
    from etl_framework_spark.pipeline import OPS

    ev = _t(spark, SF_SMALL, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("value").alias("vval"),
        "event_id",
    )
    out = OPS["asof_join"](
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="vts",
        payload_cols=["vval"],
        tiebreak="event_id",  # must exist on both sides
    )
    assert out.count() == left.count()
    assert "right_vval" in out.columns  # payload cols come back prefixed


def test_parquet_zstd_roundtrip(spark):
    """Codec control on the parquet sink: zstd-compressed files round-trip
    exactly and carry the codec in the filename."""
    import os

    df = table(spark, SF_SMALL, "nation")
    path = f"{SCRATCH}/nation_zstd"
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert files and all("zstd" in f for f in files)
    back = spark.read.parquet(path)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_step_materialize_checkpoints_to_parquet(spark):
    """A step with materialize: path writes parquet and downstream
    reads the files (lineage cut for resume/reuse)."""
    import os

    path = f"{SCRATCH}/mat_step"
    spec = {
        "sources": {
            "orders": {"format": "parquet", "path": f"{SF_SMALL}/orders.parquet"}
        },
        "steps": [
            {
                "name": "big",
                "input": "orders",
                "op": "filter",
                "args": {"condition": "o_totalprice > 100000"},
                "materialize": path,
            },
            {
                "name": "by_status",
                "input": "big",
                "op": "aggregate",
                "args": {"group_by": ["o_orderstatus"], "aggs": {"n": "count(*)"}},
            },
        ],
    }
    rel = run_pipeline(spark, spec)
    assert os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    # downstream step scans the materialized files, not the original
    plan = rel["by_status"]._jdf.queryExecution().executedPlan().toString()
    assert "mat_step" in plan
    n = rel["big"].count()
    assert n == spark.read.parquet(path).count()


def test_spec_parameter_substitution(spark):
    """${params.x} placeholders resolve everywhere in the spec; whole-
    string placeholders keep native types; unknown names fail loudly."""
    import pytest
    from etl_framework_spark.pipeline import run_pipeline, substitute_params

    spec = {
        "params": {"sf_dir": SF_SMALL, "min_qty": 40, "status": "A"},
        "sources": {
            "lineitem": {
                "format": "parquet",
                "path": "${params.sf_dir}/lineitem.parquet",
            }
        },
        "steps": [
            {
                "name": "big",
                "input": "lineitem",
                "op": "filter",
                "args": {
                    "condition": "l_quantity >= ${params.min_qty} "
                    "AND l_returnflag = '${params.status}'"
                },
            }
        ],
        "sinks": [{"input": "big", "format": "view", "name": "big_v"}],
    }
    rel = run_pipeline(spark, spec)
    got = rel["big"].count()
    expect = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .filter("l_quantity >= 40 AND l_returnflag = 'A'")
        .count()
    )
    assert got == expect and got > 0
    # typed whole-string placeholder stays an int
    out = substitute_params({"n": "${params.k}"}, {"k": 7})
    assert out["n"] == 7 and isinstance(out["n"], int)
    # caller params override spec params
    rel2 = run_pipeline(spark, spec, params={"min_qty": 45})
    assert rel2["big"].count() <= got
    with pytest.raises(ValueError, match="unknown pipeline parameter"):
        substitute_params({"x": "${params.nope}"}, {})

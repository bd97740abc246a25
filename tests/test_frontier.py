"""Crawl-order parity, wave 0: the Spark plan uniq → uniqueByHost →
orderBy(seq) must reproduce the reference's scheduling order exactly
(SURVEY §2.5 W9; /root/reference/scripts/batch-sample-run.js:281-319),
verified against the pure-Python simulator."""

import pyspark.sql.functions as F

from horseman_article_parser_spark.datagen.frontier import build_seed_frontier, seed_urls
from horseman_article_parser_spark.operators.frontier_ops import (
    build_wave0,
    ordered_zip_with_index,
    slice_frontier,
    uniq,
    unique_by_host,
)
from horseman_article_parser_spark.plans.reference_sim import sim_wave0


def test_uniq_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 1), ("a", 2), ("c", 3), ("b", 4)], ["url", "seq"]
    )
    got = {(r["url"], r["seq"]) for r in uniq(df).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 3)}


def test_unique_by_host_first_per_host_then_limit(spark):
    rows = [
        ("https://h1.x/a", 0),
        ("https://h2.x/a", 1),
        ("https://h1.x/b", 2),  # dropped: h1 already represented
        ("https://h3.x/a", 3),
        ("https://h4.x/a", 4),  # dropped by limit=3
    ]
    df = spark.createDataFrame(rows, ["url", "seq"])
    got = [r["url"] for r in unique_by_host(df, limit=3).orderBy("seq").collect()]
    assert got == ["https://h1.x/a", "https://h2.x/a", "https://h3.x/a"]


def test_slice_positional(spark):
    df = spark.createDataFrame([(f"u{i}", i * 10) for i in range(10)], ["url", "seq"])
    got = [r["url"] for r in slice_frontier(df, 3, 4).orderBy("seq").collect()]
    assert got == ["u3", "u4", "u5", "u6"]


def test_wave0_order_matches_reference_sim(spark):
    for n, limit, uh in [(200, 50, True), (500, 100, True), (200, 60, False)]:
        seeds = seed_urls(n)
        expected = sim_wave0(seeds, limit, unique_hosts=uh)
        df = build_seed_frontier(spark, n)
        got = [
            r["url"]
            for r in build_wave0(df, limit, unique_hosts=uh).orderBy("seq").collect()
        ]
        assert got == expected, f"wave0 mismatch n={n} limit={limit} uh={uh}"


def test_ordered_zip_with_index_is_global_rank(spark):
    df = spark.createDataFrame(
        [(i % 7, float(i % 13), f"u{i}") for i in range(500)], ["a", "b", "url"]
    ).repartition(8)
    got = ordered_zip_with_index(df, ["b", "url"], out_col="idx").collect()
    expect = sorted(got, key=lambda r: (r["b"], r["url"]))
    for rank, row in enumerate(expect):
        assert row["idx"] == rank
    assert sorted(r["idx"] for r in got) == list(range(500))


def test_wave0_plan_has_no_cartesian_or_python_in_hot_path(spark):
    df = build_seed_frontier(spark, 300)
    plan = build_wave0(df, 50)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the wave-0 chain is pure JVM: no Python/pandas evaluation nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    lowered = plan.lower()
    assert "takeordered" in lowered or "sort" in lowered

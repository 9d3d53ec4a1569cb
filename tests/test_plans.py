"""Physical-plan guardrails (SURVEY §4): the properties that make the
operators scale must survive refactors — filter/column pushdown into
scans, broadcast of dims, map-side partial aggregation, one shuffle per
window. Checked via .explain('formatted') text, not execution."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_seen_antijoin_pushdown(spark, sf_dir):
    import __spark_entry__ as e

    p = plan(e.q_crawl_seen_antijoin(spark, sf_dir))
    # column pruning reaches the parquet scan: only the 2 projected + join
    # columns are read, not the whole part table
    assert "p_partkey" in p and "p_retailprice" not in p
    # the seen-set probe is a broadcast anti-join, not a shuffled one
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_point_lookup_filter_pushdown(spark, sf_dir):
    import __spark_entry__ as e

    p = plan(e.q_crawl_point_lookup(spark, sf_dir))
    assert "PushedFilters: [In(o_orderkey" in p


def test_q1_partial_aggregation(spark, sf_dir):
    import __spark_entry__ as e

    p = plan(e.q_tpch_q1_agg(spark, sf_dir))
    # map-side combine: two HashAggregates (partial below the exchange,
    # final above) — exact label text varies with AQE formatting
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p
    assert p.index("HashAggregate") < p.rindex("HashAggregate")


def test_budget_single_host_shuffle(spark):
    from pyspark.sql import functions as F

    from ieps_crawler_spark.operators.politeness import host_delays, select_budget

    fr = spark.createDataFrame(
        [(f"http://h{i % 5}.gov.si/p{i}/", f"h{i % 5}", 0, None, 0, 0, i)
         for i in range(100)],
        "canon_url string, host string, data_type int, ref_url string, "
        "wave int, priority int, enq_seq long",
    )
    sites = spark.createDataFrame(
        [(f"h{i}", None, None) for i in range(5)],
        "host string, robots_content string, sitemap_content string",
    )
    batch, _ = select_budget(fr, host_delays(sites), 0, 60)
    # the window + exchange sit inside the cached relation's build plan —
    # .explain elides it, the full queryExecution string does not
    p = plan(batch) + batch._jdf.queryExecution().toString()
    # politeness isolation: a single hash exchange on host feeding the
    # rank window; the delays dim arrives by broadcast
    assert "hashpartitioning(host" in p
    assert "Window" in p and "BroadcastExchange" in p


def test_fetch_join_no_corpus_shuffle(spark, tmp_path):
    """The fetch join against a bucketed corpus must not exchange the
    corpus side — only the frontier batch shuffles."""
    from pyspark.sql import functions as F

    corpus_rows = spark.range(1000).select(
        F.concat(F.lit("http://h.gov.si/d"), F.col("id")).alias("url"),
        F.encode(F.concat(F.lit("<html>"), F.col("id")), "UTF-8").alias("html"),
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    name = "t_fetch_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        corpus_rows.write.mode("overwrite")
        .option("path", str(tmp_path / "corpus"))
        .bucketBy(4, "url").sortBy("url").saveAsTable(name)
    )
    corpus = spark.table(name).select(F.col("url").alias("canon_url"), "html")
    batch = spark.range(100).select(
        F.concat(F.lit("http://h.gov.si/d"), F.col("id") * 7).alias("canon_url")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(batch.join(corpus, "canon_url", "left"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    import re

    # bucketed side: scan feeds the sort-merge join without an Exchange.
    # one shuffle exchange total = the batch side only
    assert "SortMergeJoin" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "SelectedBucketsCount" in p


def test_pipeline_family_is_pure_jvm(spark, sf_dir):
    """The curation/sampling/pipeline query family claims zero Python
    UDFs (whole plan stays JVM-side) — make the claim executable."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in [
        "pipeline_corpus_select",
        "pipeline_pack_sequences",
        "pipeline_decontaminate",
        "pipeline_source_stats",
        "sample_hash_split",
        "sample_deterministic",
        "text_repetition",
        "text_redact_pii",
        "dedup_cluster_canonical",
        "crawl_host_rank",
        "crawl_wave_cap",
        "crawl_curation_pipeline",
    ]:
        p = plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in p, f"{name} plan runs Python:\n{p}"


def test_decontamination_broadcasts_eval_grams(spark, sf_dir):
    """The eval side of the contamination join must broadcast (the train
    side streams) — a shuffle join here would move every train gram."""
    import __spark_entry__ as e

    p = plan(e.queries()["pipeline_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_round2_additions_pure_jvm_plans(spark, sf_dir):
    """dedup_lines / top_ngrams / refresh / unigram-stats claim pure-JVM
    plans (no Python stage) — make the claim executable; anchor/warc
    queries are pandas-UDF-by-design and excluded."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in [
        "dedup_lines",
        "text_top_ngrams",
        "text_unigram_stats",
        "crawl_refresh_topk",
    ]:
        p = plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in p, f"{name} plan runs Python:\n{p}"
        assert "CartesianProduct" not in p, f"{name} plan goes cartesian:\n{p}"


def test_top_ngrams_uses_take_ordered_not_global_sort(spark, sf_dir):
    """The heavy-hitter top-k must be a TakeOrdered merge, never a full
    global sort of the n-gram aggregate."""
    import __spark_entry__ as e

    p = plan(e.queries()["text_top_ngrams"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p


def test_unigram_scoring_broadcasts_freq_table(spark, sf_dir):
    """The scoring join must broadcast the vocabulary-sized frequency
    table — shuffling the exploded token stream by word would move the
    whole corpus through one shuffle."""
    import __spark_entry__ as e

    p = plan(e.queries()["text_unigram_stats"](spark, sf_dir))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_stats_family_pure_jvm_plans(spark, sf_dir):
    """The sketch/quantile/substring-span queries are built-ins only:
    no Python stage, no cartesian, anywhere in the plan."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in [
        "sketch_hll_users",
        "stats_length_quantiles",
        "dedup_substring_spans",
        "pipeline_mix_sources",
        "events_asof_join",
        "dedup_remove_spans",
        "text_distinctive_terms",
        "sketch_cms_users",
        "sample_per_source",
        "events_range_join",
        "crawl_adaptive_delay",
        "sketch_hdr_lengths",
        "stats_skew_report",
        "crawl_trap_hosts",
        "dedup_containment",
    ]:
        p = plan(qs[name](spark, sf_dir))
        assert "EvalPython" not in p, f"{name} plan runs Python:\n{p}"
        assert "CartesianProduct" not in p, f"{name} plan goes cartesian:\n{p}"


def test_hll_registers_partial_max(spark, sf_dir):
    """The register build must map-side combine (partial max below the
    exchange) — that's what makes the sketch one cheap shuffle of
    (group, bucket) keys instead of a shuffle of every raw key."""
    from pyspark.sql import functions as F

    from ieps_crawler_spark.operators.stats import hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = plan(hll_registers(ev, ["event_type"], F.col("user_id")))
    assert p.count("HashAggregate") >= 2, p
    assert "Exchange" in p, p
    assert p.index("HashAggregate") < p.index("Exchange"), p


def test_disc_quantiles_histogram_before_window(spark, sf_dir):
    """The quantile window must run over the (group, value) histogram
    aggregate, never the raw rows — the property that bounds the window
    sort by distinct-value count. In the formatted plan the histogram
    HashAggregate sits below (after, in print order) the Window."""
    from ieps_crawler_spark.operators.text import token_count

    from ieps_crawler_spark.operators.stats import disc_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", token_count("text").cast("long").alias("v")
    )
    p = plan(disc_quantiles(docs, ["lang"], "v"))
    assert "Window" in p, p
    # formatted explain prints operators leaves-last; the histogram
    # aggregate must be an input of the Window stage
    win_at = p.index("Window")
    assert "HashAggregate" in p[win_at:], p


def test_opic_scores_plan_scale_safe(spark, sf_dir):
    """OPIC: pure-JVM plan (no Python stages, no cartesian/BNLJ —
    the root-share crossJoin is a broadcast of a 1-row aggregate) and
    no global sort (the remainder goes to a precomputed scalar min-id,
    not a window)."""
    import __spark_entry__ as e
    from ieps_crawler_spark.plans.audit import assert_scale_safe, plan_counts

    df = e.q_graph_opic(spark, sf_dir)
    assert_scale_safe(df, allow=("BroadcastNestedLoopJoin",))
    # the only BNLJ-shaped node must be the 1-row root-share broadcast:
    # no CartesianProduct, and zero Python stages
    c = plan_counts(df)
    assert c["python_stages"] == 0
    assert c["global_sorts"] == 0


def test_opic_host_lanes_plan_has_no_global_sort(spark):
    """Lanes come from percentile thresholds, never an unpartitioned
    ntile/rank window (single-task sort over every distinct host)."""
    from pyspark.sql import functions as F

    from ieps_crawler_spark.operators.opic import opic_host_lanes
    from ieps_crawler_spark.plans.audit import plan_counts

    cash = spark.createDataFrame(
        [(f"http://h{i}.si/", 100 + i, 0) for i in range(20)],
        "url string, cash_mu long, history_mu long",
    )
    lanes = opic_host_lanes(
        cash, F.parse_url(F.col("url"), F.lit("HOST")), n_lanes=4
    )
    c = plan_counts(lanes)
    assert c["global_sorts"] == 0 and c["python_stages"] == 0


def test_dsir_weights_plan_scale_safe(spark, sf_dir):
    """DSIR scoring: featurization is codegen (zero Python stages),
    the fit join is a broadcast (bounded by n_buckets), no global
    sort anywhere."""
    import __spark_entry__ as e
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    df = e.q_pipeline_dsir_weights(spark, sf_dir)
    c = assert_scale_safe(df)
    assert c["python_stages"] == 0
    assert c["global_sorts"] == 0
    assert c["broadcast_hash_joins"] >= 1  # the n_buckets-bounded fit join


def test_dsir_resample_plan_is_topk_not_global_sort(spark):
    """Gumbel-top-k must plan as TakeOrderedAndProject, never a
    range-partitioned total sort."""
    from ieps_crawler_spark.operators.dsir import dsir_resample
    from ieps_crawler_spark.plans.audit import plan_text

    w = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, weight double"
    )
    p = plan_text(dsir_resample(w, 5))
    assert "TakeOrderedAndProject" in p


def test_hyperball_plan_scale_safe(spark):
    """HyperBall rounds: pure-JVM register relaxation — zero Python
    stages, no cartesian/BNLJ, no global sort (merge = hash aggregate,
    estimate = hash aggregate). checkpoint_rounds=False so the audit
    sees the FULL round lineage — the default per-round localCheckpoint
    replaces each round with a Scan ExistingRDD, which would make this
    assertion vacuous."""
    from ieps_crawler_spark.operators.hyperball import hyperball
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    edges = spark.range(500).selectExpr(
        "id % 50 as from_id", "(id * 7 + 3) % 50 as to_id"
    )
    hb = hyperball(edges, radius=2, checkpoint_rounds=False)
    c = assert_scale_safe(hb)
    assert c["python_stages"] == 0
    assert c["global_sorts"] == 0

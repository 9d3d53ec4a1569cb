"""tools/crawl_job.py --graph-report: the round's graph analytics are
tool-driven, not only library surfaces."""

import os
import sys

from pyspark.sql import functions as F


def test_graph_report_tool_path(spark, tmp_path):
    sys.path.insert(0, "tools")
    import crawl_job

    from ieps_crawler_spark.corpus import generate_corpus

    c = generate_corpus(40, seed=5)
    c_dir, s_dir = str(tmp_path / "pages"), str(tmp_path / "sites")
    spark.createDataFrame(c["pages"]).write.parquet(c_dir)
    spark.createDataFrame(c["sites"]).write.parquet(s_dir)
    report = str(tmp_path / "report")
    crawl_job.main([
        "--corpus", c_dir, "--sites", s_dir,
        "--seeds", *c["seeds"][:2],
        "--ckpt", str(tmp_path / "ckpt"), "--waves", "3",
        "--graph-report", report,
    ])
    dg = spark.read.parquet(os.path.join(report, "domain_graph"))
    assert dg.count() > 0
    assert set(dg.columns) == {
        "src_pld", "dst_pld", "n_links", "n_src_hosts"
    }
    trust = spark.read.parquet(os.path.join(report, "domain_trust"))
    assert set(trust.columns) == {
        "node_id", "pagerank", "trustrank_scaled", "spam_mass"
    }
    # at least the seed domains carry trust (spam_mass < 1); a report
    # where every domain has full spam mass would mean the trust seeds
    # never reached the graph
    assert trust.filter(F.col("spam_mass") < 1.0).count() > 0


def test_resumed_report_uses_persisted_seeds(spark, tmp_path, capsys):
    """ADVICE r3: a resumed graph report must derive its trust set from
    the seeds persisted at crawl init, not from whatever list the
    resume invocation passes."""
    sys.path.insert(0, "tools")
    import crawl_job

    from ieps_crawler_spark.corpus import generate_corpus

    c = generate_corpus(40, seed=5)
    c_dir, s_dir = str(tmp_path / "pages"), str(tmp_path / "sites")
    spark.createDataFrame(c["pages"]).write.parquet(c_dir)
    spark.createDataFrame(c["sites"]).write.parquet(s_dir)
    ckpt = str(tmp_path / "ckpt")
    crawl_job.main([
        "--corpus", c_dir, "--sites", s_dir,
        "--seeds", *c["seeds"][:2],
        "--ckpt", ckpt, "--waves", "2",
    ])
    report = str(tmp_path / "report")
    # resume with a DIFFERENT (bogus) seed list: the report must ignore
    # it in favor of the checkpoint's persisted list and say so
    crawl_job.main([
        "--corpus", c_dir, "--sites", s_dir,
        "--seeds", "http://bogus.example.com/",
        "--ckpt", ckpt, "--waves", "3", "--resume",
        "--graph-report", report,
    ])
    out = capsys.readouterr().out
    assert "trust seeds from checkpoint-persisted seed list" in out
    assert "--seeds/--seed-table ignored on resume" in out
    trust = spark.read.parquet(os.path.join(report, "domain_trust"))
    assert trust.filter(F.col("spam_mass") < 1.0).count() > 0

"""The unrolled-wave SQL twin of the e2e crawl (the driver oracle for
``crawl_e2e``) must match the engine row-exactly — including under a
budget-BINDING politeness config, where rows carry over between waves as
leftovers and per-host fetch order interleaves multiple enqueue waves.

The driver gate only runs the default config (wave_seconds=600: budgets
never bind at sf scale); this test is what proves the oracle's leftover /
carry-over arithmetic, so a future engine change that breaks politeness
carry-over fails here, not silently in a config the gate never reaches."""

import sys
import tempfile

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from __spark_entry__ import _crawl_e2e_oracle_sql  # noqa: E402
from ieps_crawler_spark.plans.crawl import Crawler  # noqa: E402
from ieps_crawler_spark.webgen import web_from_documents  # noqa: E402

RESULT_COLS = [
    "url", "host", "kind", "page_type", "http_status", "content_hash",
    "wave", "fetch_order",
]


def _norm(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


def _oracle_rows(sf_dir: str, **kw):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(_crawl_e2e_oracle_sql(**kw)).fetchall()


def _engine_rows(spark, sf_dir: str, wave_seconds: int, n_seeds: int,
                 max_waves: int):
    pages, sites, seeds = web_from_documents(spark, sf_dir, n_seeds=n_seeds)
    ckpt = tempfile.mkdtemp(prefix="ieps_e2e_oracle_")
    crawler = Crawler(spark, pages, sites, None, ckpt,
                      wave_seconds=wave_seconds)
    crawler.run(seeds=seeds, max_waves=max_waves)
    return [tuple(r) for r in crawler.results().select(*RESULT_COLS).collect()]


def test_default_config_matches(spark, sf_dir):
    """The exact config the driver gate runs (wave_seconds=600, 3 seeds,
    3 waves) — budgets never bind."""
    got = _engine_rows(spark, sf_dir, wave_seconds=600, n_seeds=3,
                       max_waves=3)
    want = _oracle_rows(sf_dir)
    assert _norm(got) == _norm(want)


def test_budget_binding_config_matches(spark, sf_dir):
    """wave_seconds=2 -> budget 2 on even hosts / 1 on odd hosts: most of
    each wave's frontier becomes leftover, so later waves rank a mixed-wave
    pending set and the (wave, enq_seq) FIFO carry-over is load-bearing."""
    got = _engine_rows(spark, sf_dir, wave_seconds=2, n_seeds=6,
                       max_waves=4)
    want = _oracle_rows(sf_dir, wave_seconds=2, n_seeds=6, max_waves=4)
    assert len(want) > 0
    assert _norm(got) == _norm(want)


@pytest.mark.parametrize("n_seeds,max_waves", [(8, 2)])
def test_wide_seed_config_matches(spark, sf_dir, n_seeds, max_waves):
    """n_seeds > 3 exercises the strided seed arithmetic in both the
    engine (webgen stride) and the oracle's seedrows CTE."""
    got = _engine_rows(spark, sf_dir, wave_seconds=600, n_seeds=n_seeds,
                       max_waves=max_waves)
    want = _oracle_rows(sf_dir, wave_seconds=600, n_seeds=n_seeds,
                        max_waves=max_waves)
    assert _norm(got) == _norm(want)

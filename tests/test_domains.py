"""Registrable-domain (PSL longest-match) extraction: known-host
literals for every rule branch, plan purity, and main-content
(boilerplate-removal) block classification + smoothing semantics."""

from pyspark.sql import functions as F

from ieps_crawler_spark.functions.domains import (
    public_suffix,
    registrable_domain,
)
from ieps_crawler_spark.operators.text import extract_main_text

# (host, expected public suffix, expected registrable domain)
CASES = [
    ("evem.gov.si", "gov.si", "evem.gov.si"),
    ("e-uprava.gov.si", "gov.si", "e-uprava.gov.si"),
    ("www.site.co.uk", "co.uk", "site.co.uk"),
    ("a.b.site.co.uk", "co.uk", "site.co.uk"),       # deep subdomains fold
    ("co.uk", "co.uk", None),                        # bare suffix
    ("site.com", "com", "site.com"),
    ("deep.x.site.ac.jp", "ac.jp", "site.ac.jp"),
    ("weird.zz", None, "weird.zz"),                  # unknown TLD: last 2
    ("a.b.weird.zz", None, "weird.zz"),
    ("single", None, None),                          # one label
    ("com", "com", None),
    ("UPPER.Site.COM", "com", "site.com"),           # case-folded
    ("blog.site.si", "si", "site.si"),               # flat ccTLD
    # IP literals: their own registrable unit, never a 2-label collapse
    ("93.184.216.34", None, "93.184.216.34"),
    ("10.77.216.34", None, "10.77.216.34"),
    ("[2001:db8::1]", None, "[2001:db8::1]"),
    ("0:0:0:0:0:0:0:1", None, "0:0:0:0:0:0:0:1"),
]


def test_known_hosts(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in CASES], "host string")
    got = df.select(
        public_suffix("host").alias("ps"),
        registrable_domain("host").alias("pld"),
    ).collect()
    for (host, want_ps, want_pld), row in zip(CASES, got):
        assert row.ps == want_ps, host
        assert row.pld == want_pld, host


def test_trap_subdomains_collapse_to_one_pld(spark):
    # the use case: 10k fabricated subdomains under one registered
    # domain must share one politeness/trap key
    df = spark.range(0, 10000).select(
        F.concat(F.lit("t"), F.col("id"), F.lit(".trap.site.co.uk")).alias("host")
    )
    n = (
        df.select(registrable_domain("host").alias("pld"))
        .distinct()
        .count()
    )
    assert n == 1


def test_pld_plan_is_pure_codegen(spark):
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    df = spark.range(5).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".gov.si")).alias("host")
    ).select(registrable_domain("host").alias("pld"))
    counts = assert_scale_safe(df)
    assert counts.get("shuffle_exchanges", 0) == 0


# ------------------------------------------------- main-content extraction

def _blocks_df(spark, blocks):
    return spark.createDataFrame([(1, blocks)], ["doc_id", "blocks"])


GOOD = "the data of the corpus and the value is that for every page here"
NAV = "home | about | contact | login"
NEAR = "key notes of the value"          # dense enough, too short for good


def test_main_text_keeps_prose_drops_chrome(spark):
    out = extract_main_text(_blocks_df(spark, [NAV, GOOD, NAV])).first()
    assert out.n_blocks == 3 and out.n_good == 1
    assert out.main_text == GOOD


def test_near_promoted_only_beside_good(spark):
    # near beside good -> promoted; isolated near -> dropped
    out = extract_main_text(
        _blocks_df(spark, [GOOD, NEAR, NAV, NEAR])
    ).first()
    assert out.n_good == 2
    assert out.main_text == GOOD + "\n\n" + NEAR


def test_smoothing_is_single_pass(spark):
    # near-chain: only the near ADJACENT to the original good promotes;
    # the second near must not be rescued by the first's promotion
    out = extract_main_text(_blocks_df(spark, [GOOD, NEAR, NEAR])).first()
    assert out.n_good == 2


def test_short_and_empty_blocks_are_bad(spark):
    out = extract_main_text(_blocks_df(spark, ["", "  ", "a b c", NAV])).first()
    assert out.n_good == 0 and out.main_text == ""


def test_near_first_block_does_not_crash(spark):
    # ANSI regression: element_at/try_element_at both throw
    # INVALID_INDEX_OF_ZERO for index 0 — a 'near' FIRST block must
    # smooth against its right neighbor only, never index 0
    out = extract_main_text(_blocks_df(spark, [NEAR, GOOD])).first()
    assert out.n_good == 2
    out2 = extract_main_text(_blocks_df(spark, [NEAR, NAV])).first()
    assert out2.n_good == 0


def test_empty_block_array(spark):
    # sequence(1, 0) counts DOWN — an empty page must yield an empty
    # result, not an ANSI array-index error
    df = spark.createDataFrame(
        [(1, [])], "doc_id int, blocks array<string>"
    )
    out = extract_main_text(df).first()
    assert out.n_blocks == 0 and out.n_good == 0 and out.main_text == ""


def test_main_text_plan_is_pure_codegen(spark):
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    df = _blocks_df(spark, [GOOD, NEAR])
    assert_scale_safe(extract_main_text(df))

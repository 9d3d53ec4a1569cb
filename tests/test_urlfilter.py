"""UT1-style URL category filtering: literal fast path vs DataFrame
blocklist join agree; subdomain collapse; keyword fallback + precedence;
join-plan shape."""

from pyspark.sql import functions as F

from ieps_crawler_spark.functions.urlfilter import (
    BLOCKED_PLDS,
    classify_urls,
    url_category,
    url_host,
    url_pld,
)

URLS = [
    # (url, expected category)
    ("http://x.badsite.com/page", "adult"),            # subdomain collapse
    ("https://www.casino-x.com/p", "gambling"),
    ("http://deep.a.b.evil-example.com/z", "malware"),
    ("http://clean.example.com/poker/room", "gambling"),  # keyword tier
    ("http://clean.example.com/xxx-archive", "adult"),
    ("http://ok.site.si/about", None),
    ("https://user@host.example.org:8080/casino", "gambling"),  # userinfo+port
]


def _df(spark):
    return spark.createDataFrame([(u,) for u, _ in URLS], "url string")


def test_url_host_strips_userinfo_and_port(spark):
    got = _df(spark).select(url_host("url").alias("h")).collect()
    assert got[-1].h == "host.example.org"
    assert got[0].h == "x.badsite.com"


def test_literal_categories(spark):
    got = _df(spark).select(url_category("url").alias("c")).collect()
    assert [r.c for r in got] == [c for _, c in URLS]


def test_blocklist_join_matches_literal_path(spark):
    bl = spark.createDataFrame(
        [(p, c) for c, ps in sorted(BLOCKED_PLDS.items()) for p in ps],
        ["pld", "category"],
    )
    joined = classify_urls(_df(spark), blocklist=bl).select("url", "category")
    lit = _df(spark).select(
        "url", url_category("url").alias("category")
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, lit.collect())
    )


def test_multi_category_pld_resolves_deterministically(spark):
    # real UT1 lists place one domain under several categories: the
    # join path must resolve to the sorted-first category (matching
    # url_category's precedence), never a partition-order-dependent row
    bl = spark.createDataFrame(
        [("x.com", "gambling"), ("x.com", "adult"), ("x.com", "malware")],
        ["pld", "category"],
    )
    df = spark.createDataFrame([("http://sub.x.com/p",)], "url string")
    assert classify_urls(df, blocklist=bl).first().category == "adult"


def test_protocol_relative_urls_parse(spark):
    # extracted hrefs are often scheme-relative — a blocklisted domain
    # must not bypass the gate by dropping its scheme
    df = spark.createDataFrame(
        [("//x.badsite.com/page",), ("//clean.example.com/casino",)],
        "url string",
    )
    got = [r.c for r in df.select(url_category("url").alias("c")).collect()]
    assert got == ["adult", "gambling"]


def test_domain_match_beats_keyword(spark):
    # blocked domain whose path ALSO carries another category's keyword
    df = spark.createDataFrame(
        [("http://a.badsite.com/casino",)], "url string"
    )
    assert df.select(url_category("url").alias("c")).first().c == "adult"


def test_pld_null_for_bare_suffix(spark):
    df = spark.createDataFrame([("http://com/x",)], "url string")
    row = classify_urls(df).first()
    assert row.pld is None and row.category is None


def test_classify_plan_single_join_no_udf(spark):
    from ieps_crawler_spark.plans.audit import assert_scale_safe

    bl = spark.createDataFrame([("badsite.com", "adult")], ["pld", "category"])
    out = classify_urls(_df(spark), blocklist=bl)
    counts = assert_scale_safe(out)
    assert counts["python_stages"] == 0
    assert counts["nested_loop_joins"] == 0

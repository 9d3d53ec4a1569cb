"""Anchor-text capture (extract_anchors) + per-target aggregation
(anchor_text_stats): nesting/malformed/self-closing cases, canonical
fallback, tie-breaking and bounded sample."""

from ieps_crawler_spark.functions.extract import extract_anchors, extract_text
from ieps_crawler_spark.operators.graph import anchor_text_stats

DOM = "evem.gov.si"


def test_anchor_basic_and_whitespace_collapse():
    html = '<a href="http://evem.gov.si/a">  Click\n  HERE </a>'
    assert extract_anchors(html, DOM) == [
        {"url": "http://evem.gov.si/a/", "anchor": "Click HERE"}
    ]


def test_anchor_root_relative_fallback_and_drop_unparseable():
    html = '<a href="/rel">rel text</a><a href="ht!tp://% %">bad</a>'
    out = extract_anchors(html, DOM)
    assert out == [{"url": "http://evem.gov.si/rel/", "anchor": "rel text"}]


def test_anchor_nested_markup_and_self_closing():
    html = (
        '<a href="http://evem.gov.si/x"><b>bold</b> tail</a>'
        '<a href="http://evem.gov.si/y"/>'
        '<a href="http://evem.gov.si/z">unclosed at eof'
    )
    got = {(r["url"], r["anchor"]) for r in extract_anchors(html, DOM)}
    assert got == {
        ("http://evem.gov.si/x/", "bold tail"),
        ("http://evem.gov.si/y/", ""),
        ("http://evem.gov.si/z/", "unclosed at eof"),
    }


def test_anchor_capture_does_not_change_text_invariant():
    html = '<p>before <a href="http://evem.gov.si/a">mid</a> after</p>'
    assert extract_text(html) == "before mid after"


def test_anchor_text_stats_counts_top_and_sample(spark):
    pairs = spark.createDataFrame(
        [
            ("u1", "alpha"), ("u1", "alpha"), ("u1", "beta"),
            ("u1", "gamma"),
            # u2: tie between two anchors at cnt=1 -> lexicographically
            # greatest wins (partition-order-free)
            ("u2", "aa"), ("u2", "zz"),
        ],
        "url string, anchor string",
    )
    out = {r["url"]: r for r in anchor_text_stats(pairs, k=2).collect()}
    assert out["u1"]["n_refs"] == 4
    assert out["u1"]["n_unique_anchors"] == 3
    assert out["u1"]["top_anchor"] == "alpha"
    assert out["u1"]["anchors_sample"] == "alpha|beta"  # sorted, capped at k
    assert out["u2"]["top_anchor"] == "zz"
    assert out["u2"]["n_refs"] == 2


def test_anchor_text_stats_partition_independent(spark):
    rows = [(f"u{i % 7}", f"anchor {i % 13}") for i in range(200)]
    df = spark.createDataFrame(rows, "url string, anchor string")
    a = sorted(map(tuple, anchor_text_stats(df).collect()))
    b = sorted(map(tuple, anchor_text_stats(df.repartition(11, "anchor")).collect()))
    assert a == b

"""URL param-noise detection: hand-built fetch log with a known
noise param (sid), a known signal param (page), an evidence-less
param (ref), repeated-param composites, and query-less URLs."""

from ieps_crawler_spark.operators.urlnoise import (
    explode_params,
    param_noise,
    strip_params,
)


def _fetch(spark):
    rows = [
        # sid varies, content does not -> noise evidence (two groups)
        ("http://a.si/x?page=1&sid=1", "h1"),
        ("http://a.si/x?page=1&sid=2", "h1"),
        ("http://a.si/x?page=2&sid=3", "h2"),
        ("http://a.si/x?page=2&sid=4", "h2"),
        # page varies WITHOUT sid, content varies -> signal evidence
        ("http://a.si/x?page=1", "h1"),
        ("http://a.si/x?page=2", "h2"),
        # single sighting: no multi-value group, stays unclassified
        ("http://a.si/y?ref=z", "h3"),
        # repeated param folds to ONE composite value
        ("http://a.si/z?t=1&t=2", "h4"),
        # no query string: contributes nothing
        ("http://a.si/plain", "h5"),
        # degenerate queries: bare '?' and '?&k=v' must not fabricate
        # a '' param (split yields empty tokens)
        ("http://a.si/q?", "h6"),
        ("http://a.si/r?&t=1", "h7"),
        # re-crawl of a dynamic page: sid value NEVER varied here, so
        # the hash change is not attributable to sid and must not veto
        # its ignorable verdict (single-value group = no evidence)
        ("http://a.si/w?sid=9", "hw1"),
        ("http://a.si/w?sid=9", "hw2"),
    ]
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_param_noise_verdicts(spark):
    out = {
        (r["host"], r["param"]): r
        for r in param_noise(_fetch(spark)).collect()
    }
    sid = out[("a.si", "sid")]
    assert sid["is_ignorable"] and sid["n_noise_groups"] == 2
    # the /w re-crawl group (1 value, 2 hashes) is NOT signal evidence
    assert sid["n_signal_groups"] == 0

    page = out[("a.si", "page")]
    assert not page["is_ignorable"] and page["n_signal_groups"] >= 1

    ref = out[("a.si", "ref")]
    assert not ref["is_ignorable"]
    assert ref["n_noise_groups"] == 0 and ref["n_signal_groups"] == 0

    assert ("a.si", "t") in out  # repeated param folds to one sighting
    # one group per residue: /z (composite t) and /r (degenerate '?&')
    assert out[("a.si", "t")]["n_groups"] == 2
    # degenerate queries never fabricate a '' param
    assert not [k for k in out if k[1] == ""], sorted(out)


def test_strip_params_applies_learned_list(spark):
    noise = param_noise(_fetch(spark))
    urls = spark.createDataFrame(
        [
            # sid is ignorable on a.si -> stripped, rest kept sorted
            ("http://a.si/x?sid=9&page=3",),
            # only the ignorable param -> query dropped entirely
            ("http://a.si/x?sid=9",),
            # page is signal -> untouched
            ("http://a.si/x?page=3",),
            # no query -> byte-unchanged
            ("http://a.si/plain",),
            # unknown host -> byte-unchanged even with a sid param
            ("http://b.si/x?sid=1&page=2",),
            # fragment survives the rewrite
            ("http://a.si/x?sid=4&page=5#sec",),
        ],
        "url string",
    )
    got = [r["url"] for r in strip_params(urls, noise).collect()]
    assert got == [
        "http://a.si/x?page=3",
        "http://a.si/x",
        "http://a.si/x?page=3",
        "http://a.si/plain",
        "http://b.si/x?sid=1&page=2",
        "http://a.si/x?page=5#sec",
    ]


def test_strip_params_collapses_variants_to_one_key(spark):
    noise = param_noise(_fetch(spark))
    variants = spark.createDataFrame(
        [(f"http://a.si/x?page=1&sid={i}",) for i in range(5)],
        "url string",
    )
    out = strip_params(variants, noise).select("url").distinct().collect()
    assert [r["url"] for r in out] == ["http://a.si/x?page=1"]


def test_explode_params_shapes(spark):
    rows = explode_params(_fetch(spark)).collect()
    # query-less URL contributes nothing
    assert all("plain" not in r["residue"] for r in rows)
    # repeated param folds into one composite, sorted value
    t = sorted(
        (r["value"] for r in rows if r["param"] == "t"), reverse=True
    )
    assert t == ["t=1&t=2", "t=1"]
    # degenerate '?' / '?&' queries contribute no '' param rows
    assert all(r["param"] != "" for r in rows)
    # residue drops the param itself and keeps the rest sorted
    sid1 = [
        r for r in rows if r["param"] == "sid" and r["value"] == "sid=1"
    ][0]
    assert sid1["residue"] == "a.si/x?page=1"
    page_alone = [
        r
        for r in rows
        if r["param"] == "page" and r["residue"] == "a.si/x?"
    ]
    assert len(page_alone) == 2  # the two sid-less page URLs

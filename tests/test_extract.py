"""Golden tests for HTML extraction (ExtractFromHTML.scala:17-122 semantics)."""

from ieps_crawler_spark.functions.extract import (
    con_type,
    extract_all,
    extract_text,
)

HTML = b"""<html><head><title>Naslov strani</title>
<style>p { color: red }</style>
<script>var x = "<a href='http://nope.gov.si/'>";</script>
</head><body>
<h1>Dobrodo\xc5\xa1li</h1>
<p>Prva   vrstica
druga vrstica</p>
<a href="http://evem.gov.si/a">A</a>
<a href="/rel/b">B</a>
<a href="http://EVEM.gov.si/a#frag">A again (dup after canon)</a>
<a href="http://drugam.si/x">non-gov dropped</a>
<a href="http://evem.gov.si/slika.jpg">img-ext dropped</a>
<a href="http://evem.gov.si/doc.pdf">pdf: dropped from PAGE, kept as DATA</a>
<div onclick="http://evem.gov.si/klik">click</div>
<img src="http://evem.gov.si/logo.png">
<img src="/img/rel.png">
<span>konec</span>
</body></html>"""


def test_extract_text_deterministic():
    t = extract_text(HTML)
    assert t == "Naslov strani Dobrodošli Prva vrstica druga vrstica A B A again (dup after canon) non-gov dropped img-ext dropped pdf: dropped from PAGE, kept as DATA click konec"
    # script/style content excluded
    assert "nope" not in t and "color" not in t


def test_extract_all_order_and_filters():
    out = extract_all(HTML, "evem.gov.si")
    pages = [o["url"] for o in out if o["kind"] == "PAGE"]
    data = [o["url"] for o in out if o["kind"] == "DATA"]
    imgs = [o["url"] for o in out if o["kind"] == "IMG"]
    # a[href] doc order, then onclick; canon-dedup first-wins; gov.si filter
    assert pages == [
        "http://evem.gov.si/a/",
        "http://evem.gov.si/rel/b/",  # root-relative via domain fallback
        "http://evem.gov.si/klik/",  # onclick pseudo-link, after hrefs
    ]
    assert data == ["http://evem.gov.si/doc.pdf"]
    assert imgs == ["http://evem.gov.si/logo.png", "http://evem.gov.si/img/rel.png"]
    # positions are the global enqueue order
    assert [o["pos"] for o in out] == list(range(len(out)))


def test_extract_empty_and_none():
    assert extract_all(None, "evem.gov.si") == []
    assert extract_all(b"", "evem.gov.si") == []
    assert extract_text(None) is None
    assert extract_text(b"") == ""


def test_con_type_quirk():
    # normal short URL: extension uppercased
    assert con_type("http://h.si/x.png") == "PNG"
    assert con_type("http://h.si/d.pdf") == "PDF"
    # reference quirk: bound is ord(last char) — long URLs truncate
    long_url = "http://h.si/" + "a" * 150 + ".docx"  # last char 'x' = 120
    assert con_type(long_url) == long_url[long_url.rfind(".") + 1 : 120].upper()
    assert con_type(None) is None


def test_udf_roundtrip(spark):
    import pandas as pd

    from ieps_crawler_spark.functions.extract import (
        extract_links_udf,
        extract_text_udf,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"html": [HTML, None], "host": ["evem.gov.si", "evem.gov.si"]})
    )
    rows = (
        df.select(
            F.explode(extract_links_udf("html", "host")).alias("l"),
            extract_text_udf("html").alias("text"),
        )
        .select("l.url", "l.kind", "l.pos", "text")
        .collect()
    )
    assert len(rows) == len(extract_all(HTML, "evem.gov.si"))
    assert all(r["text"] == extract_text(HTML) for r in rows)


def test_single_pass_extract_page_parity():
    """extract_page (one parse) must equal the extract_text/extract_all
    pair on every fixture, including None and unparsable input."""
    from ieps_crawler_spark.functions.extract import (
        extract_all, extract_page, extract_text,
    )

    for html in (HTML, "", "<p>plain", None, b"<html><body>x</body></html>"):
        t, links = extract_page(html, "evem.gov.si")
        assert t == extract_text(html)
        assert links == extract_all(html, "evem.gov.si")

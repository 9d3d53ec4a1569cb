"""Golden tests for robots.txt semantics (SiteRobotsTxt.scala:11-52 +
crawler-commons/Google-spec matching) and sitemap parsing (SiteMaps.scala)."""

from ieps_crawler_spark.functions.robots import (
    DEFAULT_CRAWL_DELAY_MS,
    delay_ms,
    is_allowed,
    parse_robots,
    sitemaps_of,
)
from ieps_crawler_spark.functions.sitemaps import sitemap_urls

ROBOTS = """# gov.si robots
User-agent: *
Disallow: /private
Allow: /private/public
Crawl-delay: 2
Sitemap: http://evem.gov.si/sitemap.xml

User-agent: googlebot
Disallow:
"""


def test_allow_deny_longest_match():
    r = parse_robots(ROBOTS)
    assert r.is_allowed("http://evem.gov.si/stran/")
    assert not r.is_allowed("http://evem.gov.si/private/x")
    # longest match wins: Allow /private/public beats Disallow /private
    assert r.is_allowed("http://evem.gov.si/private/public/doc")
    # undefined url → False (SiteRobotsTxt.scala:40)
    assert not r.is_allowed(None)


def test_no_robots_allow_all():
    assert is_allowed("http://x.gov.si/anything", None)
    assert not is_allowed(None, None)
    assert delay_ms(None) == DEFAULT_CRAWL_DELAY_MS == 4000


def test_crawl_delay_ms():
    assert delay_ms(ROBOTS) == 2000
    assert delay_ms("User-agent: *\nDisallow: /x\n") == 4000  # unset → default


def test_sitemap_lines():
    assert sitemaps_of(ROBOTS) == ["http://evem.gov.si/sitemap.xml"]
    assert sitemaps_of(None) == []


def test_wildcard_and_anchor():
    r = parse_robots("User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*x\n")
    assert not r.is_allowed("http://h.si/a/b.pdf")
    assert r.is_allowed("http://h.si/a/b.pdfx")
    assert not r.is_allowed("http://h.si/tmp123x")
    assert r.is_allowed("http://h.si/tmp123")


def test_agent_group_selection():
    r = parse_robots(ROBOTS, agent="googlebot")
    # googlebot group: empty Disallow = allow all
    assert r.is_allowed("http://evem.gov.si/private/x")


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://evem.gov.si/p1/</loc><lastmod>2019-04-01</lastmod></url>
<url><loc>http://evem.gov.si/p2/</loc></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>http://evem.gov.si/sm1.xml</loc></sitemap>
<sitemap><loc>http://evem.gov.si/sm2.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_urlset():
    assert sitemap_urls(SITEMAP) == ["http://evem.gov.si/p1/", "http://evem.gov.si/p2/"]


def test_sitemap_index_recursion():
    lookup = {
        "http://evem.gov.si/sm1.xml": SITEMAP,
        "http://evem.gov.si/sm2.xml": """<urlset><url><loc>http://evem.gov.si/p3/</loc></url></urlset>""",
    }
    assert sitemap_urls(SITEMAP_INDEX, lookup) == [
        "http://evem.gov.si/p1/",
        "http://evem.gov.si/p2/",
        "http://evem.gov.si/p3/",
    ]


def test_sitemap_garbage():
    assert sitemap_urls("<not-xml", None) == []
    assert sitemap_urls(None) == []
    assert sitemap_urls("http://evem.gov.si/a/\nnot a url\nhttp://evem.gov.si/b/") == [
        "http://evem.gov.si/a/",
        "http://evem.gov.si/b/",
    ]


def test_robots_udfs(spark):
    import pandas as pd
    from ieps_crawler_spark.functions.robots import (
        robots_allowed_udf,
        robots_delay_udf,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["http://h.si/private/x", "http://h.si/ok", None],
                "robots": [ROBOTS, ROBOTS, None],
            }
        )
    )
    rows = df.select(
        robots_allowed_udf("url", "robots").alias("allowed"),
        robots_delay_udf("robots").alias("delay"),
    ).collect()
    assert [r["allowed"] for r in rows] == [False, True, False]
    assert [r["delay"] for r in rows] == [2000, 2000, 4000]

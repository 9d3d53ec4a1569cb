"""Sitemap XML parsing, matching the reference's crawler-commons
``SiteMapParser`` usage in ``utils/SiteMaps.scala:12-55``
(ghajduk3/ieps-crawler): parse a sitemap body; if it is a
``<sitemapindex>``, recurse into child sitemaps (resolved against a
provided body lookup — the sandbox has no live HTTP, so nested sitemap
bodies live in the same ``sites.sitemap_content`` fixture, keyed by URL);
emit the contained ``<loc>`` URLs as FRONTIER candidates
(FrontierManagerActor.scala:156-170 seeds these at domain first-touch).

Stdlib xml.etree implementation (namespace-tolerant), no code copied.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(
    content: str | None,
    nested_lookup: dict[str, str] | None = None,
    _depth: int = 0,
) -> list[str]:
    """Returns the URL list of a sitemap body; recurses one sitemapindex
    level like SiteMaps.getSiteMapUrls (SiteMaps.scala:27-39)."""
    if not content or _depth > 3:
        return []
    try:
        root = ET.fromstring(content.strip())
    except ET.ParseError:
        return []
    kind = _local(root.tag)
    urls: list[str] = []
    if kind == "sitemapindex":
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            loc = next((c.text for c in sm if _local(c.tag) == "loc" and c.text), None)
            if loc and nested_lookup:
                urls.extend(
                    parse_sitemap(nested_lookup.get(loc.strip()), nested_lookup, _depth + 1)
                )
    elif kind == "urlset":
        for u in root:
            if _local(u.tag) != "url":
                continue
            loc = next((c.text for c in u if _local(c.tag) == "loc" and c.text), None)
            if loc:
                urls.append(loc.strip())
    return urls


_PLAIN_URL = re.compile(r"^https?://\S+$")


def sitemap_urls_udf():
    """Arrow-batched column form of sitemap_urls (XML urlset + TXT; index
    recursion needs the body lookup and stays driver-side in the
    first-touch template build, wave.py)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    def _urls(bodies):
        return pd.Series([sitemap_urls(b) for b in bodies])

    return pandas_udf(_urls, ArrayType(StringType()))


def sitemap_urls(
    sitemap_content: str | None, nested_lookup: dict[str, str] | None = None
) -> list[str]:
    """Tolerates plain-text sitemaps (one URL per line) like the
    crawler-commons TXT format."""
    if not sitemap_content:
        return []
    stripped = sitemap_content.strip()
    if stripped.startswith("<"):
        return parse_sitemap(stripped, nested_lookup)
    return [l.strip() for l in stripped.splitlines() if _PLAIN_URL.match(l.strip())]

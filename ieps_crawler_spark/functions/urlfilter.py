"""URL category filtering (UT1-blocklist-style curation) — the
crawl-side safety pass an LLM webtext pipeline runs before text ever
reaches dedup/quality: drop or tag URLs whose *registrable domain* is
on a category blocklist, or whose path carries category keywords
(RefinedWeb §3.1 and FineWeb both gate on the public UT1 lists this
way). The reference crawls a closed gov.si universe and needs no such
gate; an open-web frontier does.

Two surfaces, one semantics:

- ``url_category(url)`` — a pure-codegen Column for SMALL vendored
  lists (the literal arrays fold into the plan; zero shuffle). Ships
  with a deterministic placeholder list — swap in a real snapshot via
  the parameters.
- ``classify_urls(df, blocklist)`` — the scale path for real lists
  (UT1 adult alone is ~4M domains, far past literal-array territory):
  the blocklist is a DataFrame joined on the PLD key. AQE broadcasts
  it while it fits and falls back to a shuffled hash join on the
  uniform md5-distributed domain key when it doesn't; either way the
  corpus side is scanned once.

Matching is on the REGISTRABLE domain (functions/domains.py), so
``x.badsite.com`` and ``y.badsite.com`` hit a single ``badsite.com``
entry — the same subdomain-collapse argument as trap detection.
Category precedence: domain match beats keyword match; within a tier,
first category in the (deterministically ordered) config wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .domains import registrable_domain

# Deterministic placeholder blocklists (NOT the real UT1 data — inject
# a snapshot via blocked_plds= / blocklist=). Kept tiny on purpose:
# the literal path is for tests and small custom lists only.
BLOCKED_PLDS: dict[str, tuple[str, ...]] = {
    "adult": ("badsite.com", "nsfw-example.net"),
    "gambling": ("casino-x.com", "bet-example.org"),
    "malware": ("evil-example.com",),
}
PATH_KEYWORDS: dict[str, tuple[str, ...]] = {
    "adult": ("xxx", "porn"),
    "gambling": ("casino", "poker"),
}


def url_host(col: str | Column = "url") -> Column:
    """Host of an absolute or protocol-relative URL: lowercased
    authority minus userinfo/port ('' when the URL has no //authority).
    Pure regexp — for full reference-parity canonicalization use
    functions/canon.py; this is the cheap key extractor for filtering
    passes. PRECONDITION for filtering: feed canonicalized URLs (the
    wave gate always sees canon_url, which carries a scheme) — a bare
    schemeless 'badsite.com/x' does NOT parse and would bypass a
    blocklist; '//badsite.com/x' (protocol-relative, common in
    extracted hrefs) does parse."""
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.regexp_extract(
        u, r"^(?:[a-z][a-z0-9+.-]*:)?//(?:[^/@?#]*@)?([^/:?#]+)", 1
    )


def url_pld(col: str | Column = "url") -> Column:
    """Registrable domain of a URL (see functions/domains.py)."""
    return registrable_domain(url_host(col))


def url_category(
    col: str | Column = "url",
    blocked_plds: dict[str, tuple[str, ...]] = BLOCKED_PLDS,
    path_keywords: dict[str, tuple[str, ...]] = PATH_KEYWORDS,
) -> Column:
    """Category tag for a URL, NULL when clean — literal-list fast
    path. Domain tier first (in sorted category order), then keyword
    tier over the lowercased path+query."""
    u = F.lower(F.col(col) if isinstance(col, str) else col)
    pld = url_pld(u)
    path = F.regexp_extract(
        u, r"^(?:[a-z][a-z0-9+.-]*:)?//[^/?#]*([^#]*)", 1
    )

    out = F.lit(None).cast("string")
    # build from the LAST tier backwards so earlier tiers take priority
    for cat in sorted(path_keywords, reverse=True):
        kws = path_keywords[cat]
        hit = F.lit(False)
        for kw in kws:
            hit = hit | path.contains(kw.lower())
        out = F.when(hit, F.lit(cat)).otherwise(out)
    for cat in sorted(blocked_plds, reverse=True):
        arr = F.array(*[F.lit(d.lower()) for d in blocked_plds[cat]])
        out = F.when(F.array_contains(arr, pld), F.lit(cat)).otherwise(out)
    return out


def classify_urls(
    df: DataFrame,
    url_col: str = "url",
    blocklist: DataFrame | None = None,
    path_keywords: dict[str, tuple[str, ...]] = PATH_KEYWORDS,
) -> DataFrame:
    """Scale path: tag every row with (pld, category). ``blocklist`` is
    a DataFrame with columns (pld: string, category: string) — millions
    of rows are fine; the join key is the registrable domain. Keyword
    categories fill rows the domain join left NULL.

    Plan shape: one scan of ``df`` + one equi-join on pld (AQE
    broadcast when the list fits, shuffled hash join otherwise — both
    sides hash-uniform, no skew key exists since one PLD appears once
    in a deduped list). The keyword tier is pure codegen on the same
    scan. No window, no UDF."""
    tagged = df.withColumn("pld", url_pld(url_col))
    if blocklist is not None:
        # a PLD listed under several categories (real UT1 lists do this)
        # must resolve DETERMINISTICALLY and identically to
        # url_category's sorted-first precedence — dropDuplicates would
        # keep a partition-order-dependent row
        bl = (
            blocklist.select(
                F.lower(F.col("pld")).alias("pld"), F.col("category")
            )
            .groupBy("pld")
            .agg(F.min("category").alias("_dom_cat"))
        )
        tagged = tagged.join(bl, "pld", "left")
    else:
        tagged = tagged.withColumn("_dom_cat", F.lit(None).cast("string"))
    kw_cat = url_category(
        url_col, blocked_plds={}, path_keywords=path_keywords
    )
    return tagged.withColumn(
        "category", F.coalesce(F.col("_dom_cat"), kw_cat)
    ).drop("_dom_cat")

"""URL query-parameter noise detection — find params whose value never
changes content (session ids, tracking codes like utm_*), per host.

Why a crawler needs this: the reference's URL universe is whatever its
extractor emits (SpiderWorker.scala link handling) — every ``?sid=``
variant is a distinct frontier row, so a session-id param multiplies
the crawl of a site by the number of sessions observed. Production
crawlers (Google's URL-Parameters tool, Heritrix canonicalization
rules) learn which params are ignorable FROM FETCH EVIDENCE and strip
them at discovery time. This operator produces that evidence table
from a fetch log of (url, content_hash); feed the ignorable set to a
``frontier_gate`` (plans/wave.py) or a canonicalization rule.

The rule, per (host, param):
- For every fetched URL carrying the param, build the RESIDUE — the
  url with all occurrences of that param removed and the remaining
  query sorted. URLs sharing a residue differ ONLY in that param.
- A residue group with >= 2 distinct param values and exactly 1
  distinct content hash is noise evidence (the value varied, content
  did not). A group with >= 2 distinct VALUES and >= 2 distinct hashes
  is signal evidence (within the group nothing else varies, so content
  differences co-occurring with value differences are attributable to
  the param). A single-value group with hash variance is NEITHER — the
  param never varied there, so the content change (a re-crawl of a
  dynamic page) cannot be pinned on it and must not veto a verdict.
- A param is ``ignorable`` iff it has at least one noise-evidence
  group and zero signal-evidence groups. Params with no multi-value
  groups stay unclassified (is_ignorable false, n_noise_groups 0) —
  'no evidence' must not read as 'safe to strip'.

Scale posture (100 TB): one explode (per distinct param name per URL —
bounded by query-string arity, typically < 10), then two hash
aggregates with map-side combine; no joins, no windows, no Python.
The parse is all whole-stage-codegen (``parse_url`` + array lambdas).
Hot-host skew lands on (host, param, residue) keys, which subdivide a
host by its URL space — finer than the politeness salt needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pname(x: Column) -> Column:
    return F.substring_index(x, "=", 1)


def explode_params(
    df: DataFrame, url_col: str = "url", hash_col: str = "content_hash"
) -> DataFrame:
    """One row per (url, distinct param name): host, param, its
    combined value (all occurrences, sorted, '&'-joined — a repeated
    ``p=1&p=2`` is ONE composite value), and the residue key. URLs
    without a query string contribute nothing."""
    # drop empty tokens: a bare trailing '?' or '?&a=1' yields '' items
    # from split, which would otherwise fabricate a '' param
    qarr = F.filter(
        F.split(F.parse_url(F.col(url_col), F.lit("QUERY")), "&"),
        lambda x: x != "",
    )
    base = F.concat(
        F.parse_url(F.col(url_col), F.lit("HOST")),
        F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
    )
    parsed = df.select(
        F.col(hash_col).alias("_h"),
        F.parse_url(F.col(url_col), F.lit("HOST")).alias("host"),
        base.alias("_base"),
        qarr.alias("_q"),
    ).filter(F.col("_q").isNotNull() & (F.size("_q") > 0))

    exploded = parsed.select(
        "_h",
        "host",
        "_base",
        "_q",
        F.explode(F.array_distinct(F.transform(F.col("_q"), _pname))).alias(
            "param"
        ),
    )
    mine = F.array_sort(
        F.filter(F.col("_q"), lambda x: _pname(x) == F.col("param"))
    )
    others = F.array_sort(
        F.filter(F.col("_q"), lambda x: _pname(x) != F.col("param"))
    )
    return exploded.select(
        "host",
        "param",
        F.array_join(mine, "&").alias("value"),
        F.concat(F.col("_base"), F.lit("?"), F.array_join(others, "&")).alias(
            "residue"
        ),
        F.col("_h").alias("content_hash"),
    )


def param_noise(
    df: DataFrame, url_col: str = "url", hash_col: str = "content_hash"
) -> DataFrame:
    """Evidence table (host, param, n_groups, n_noise_groups,
    n_signal_groups, is_ignorable) from a fetch log — see module
    docstring for the rule. ``df`` should carry first-fetch rows (the
    same input contract as ``politeness.detect_traps``): re-crawl rows
    of the same URL would add same-value/same-hash noise but cannot
    flip a verdict (they never create a signal group by themselves)."""
    grouped = (
        explode_params(df, url_col, hash_col)
        .groupBy("host", "param", "residue")
        .agg(
            F.count_distinct("value").alias("_nv"),
            F.count_distinct("content_hash").alias("_nh"),
        )
    )
    noise = (F.col("_nv") >= 2) & (F.col("_nh") == 1)
    signal = (F.col("_nv") >= 2) & (F.col("_nh") >= 2)
    return (
        grouped.groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(noise.cast("long")).alias("n_noise_groups"),
            F.sum(signal.cast("long")).alias("n_signal_groups"),
        )
        .withColumn(
            "is_ignorable",
            (F.col("n_noise_groups") >= 1) & (F.col("n_signal_groups") == 0),
        )
    )


def strip_params(
    df: DataFrame, noise: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply a learned strip-list: rewrite ``url_col`` with every
    ignorable param (per ``param_noise``'s host-scoped verdicts)
    removed and the surviving query sorted — the canonical-collapse a
    frontier gate runs at discovery time so ``?sid=`` variants stop
    multiplying the URL space. URLs on hosts with no ignorable params,
    and URLs with no query string, pass through byte-unchanged.

    Scale posture: the strip-list aggregates to ONE small row per host
    (collect_set of ignorable params — arity-bounded, never value-
    bounded) and broadcasts; the rewrite is a codegen array filter.
    Composable as ``frontier_gate=lambda cand: strip_params(cand,
    noise, "canon_url")`` (plans/wave.py applies gates before the
    in-batch first-wins dedup, so collapsed URLs dedup for free)."""
    strip = (
        noise.filter(F.col("is_ignorable"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("_strip"))
    )
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    out = df.join(F.broadcast(strip), host == strip["host"], "left").drop(
        strip["host"]
    )
    qarr = F.filter(
        F.split(F.parse_url(F.col(url_col), F.lit("QUERY")), "&"),
        lambda x: x != "",
    )
    kept = F.array_sort(
        F.filter(
            qarr, lambda x: ~F.array_contains(F.col("_strip"), _pname(x))
        )
    )
    base = F.substring_index(F.col(url_col), "?", 1)
    # fragments live after the query: re-attach so the rewrite never
    # mutates the URL beyond param removal/sorting
    ref = F.parse_url(F.col(url_col), F.lit("REF"))
    frag = F.when(
        ref.isNotNull(), F.concat(F.lit("#"), ref)
    ).otherwise(F.lit(""))
    rewritten = F.concat(
        F.when(
            F.size(kept) > 0,
            F.concat(base, F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(base),
        frag,
    )
    return out.withColumn(
        url_col,
        F.when(
            F.col("_strip").isNull()
            | F.parse_url(F.col(url_col), F.lit("QUERY")).isNull(),
            F.col(url_col),
        ).otherwise(rewritten),
    ).drop("_strip")

"""Registrable-domain (pay-level-domain) extraction — pure
whole-stage-codegen Column builders, no Python execution.

Why the crawler needs this: the reference keys politeness and its
site table on the raw host (Canonical.scala:61-67 ``extractDomain``),
so ``a.blogspot.com`` and ``b.blogspot.com`` — or ten thousand
subdomains a crawler trap fabricates under one registered domain —
each get an independent politeness budget. At 10^10-URL frontier
scale the unit of ownership (and of courtesy) is the *registrable*
domain: one label below the public suffix ("site.co.uk" under
"co.uk", "evem.gov.si" under "gov.si"). These builders give the
politeness/trap layers that key.

Algorithm (standard Public Suffix List longest-match, re-derived from
the published PSL algorithm — https://publicsuffix.org/list/):
  1. split the host into labels;
  2. the public suffix is the LONGEST suffix of the label list that
     appears in the suffix set (exact entries only — this vendored
     subset carries no wildcard/exception rules; ``suffixes=`` accepts
     a fuller expansion where those rules are pre-flattened);
  3. the registrable domain is the public suffix plus one more label;
  4. edge cases: host == a public suffix → NULL (nothing registrable);
     no suffix matches → fall back to the last two labels (the PSL
     "prevailing rule is '*'" clause), single-label host → NULL;
  5. IP literals (IPv4 dotted-quad, or anything with ':' — IPv6) are
     excluded from the PSL algorithm entirely: the registrable domain
     IS the full address (two unrelated servers 93.184.216.34 and
     10.77.216.34 must NOT collapse into one '216.34' politeness/
     blocklist key) and the public suffix is NULL.

Everything is array/lambda expressions over a literal array, so the
suffix set is folded into the plan: zero shuffle, zero Python, and the
same expression works inside any politeness groupBy at 100 TB.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

# A deterministic, documented SUBSET of the Public Suffix List: the
# generic TLDs plus the country registries (and their second-level
# registrations) a gov.si-seeded crawl actually meets. Not the full
# ~9k-entry list — pass ``suffixes=`` to swap in a complete snapshot.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    # generic
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "dev", "app", "eu",
    # ccTLDs on the crawl path
    "si", "at", "de", "fr", "it", "hr", "hu", "uk", "us", "jp", "au",
    # second-level registries (flattened wildcard expansions)
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    # Slovenian public registrations: .si is flat in the real PSL, but
    # the reference's gov.si universe treats ministries as independent
    # sites; keeping gov.si as a suffix makes e.g. "evem.gov.si" the
    # registrable unit, matching how the reference seeds them.
    "gov.si",
)


def _is_ip_literal(host: Column) -> Column:
    return host.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$") | host.contains(":")


def _suffix_candidates(host: Column) -> Column:
    """Array of all label-suffixes of ``host``, shortest first:
    'a.b.co.uk' -> ['uk', 'co.uk', 'b.co.uk', 'a.b.co.uk']."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
    )


def public_suffix(
    col: str | Column = "host",
    suffixes: Iterable[str] = PUBLIC_SUFFIXES,
) -> Column:
    """Longest public suffix of the host, NULL when none matches."""
    host = F.lower(F.col(col) if isinstance(col, str) else col)
    lit_set = F.array(*[F.lit(s) for s in sorted(set(suffixes))])
    matched = F.filter(
        _suffix_candidates(host), lambda s: F.array_contains(lit_set, s)
    )
    # candidates are ordered shortest -> longest, so last match wins;
    # IP literals have no public suffix by definition
    return F.when(
        ~_is_ip_literal(host) & (F.size(matched) > 0),
        F.element_at(matched, -1),
    )


def registrable_domain(
    col: str | Column = "host",
    suffixes: Iterable[str] = PUBLIC_SUFFIXES,
) -> Column:
    """Registrable (pay-level) domain of the host: public suffix + one
    label. NULL for a bare public suffix or a single-label host; hosts
    under an unknown TLD fall back to their last two labels (PSL '*'
    prevailing rule); an IP literal is its own registrable unit (the
    full address, never a two-label collapse)."""
    host = F.lower(F.col(col) if isinstance(col, str) else col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ps = public_suffix(host, suffixes)
    ps_labels = F.size(F.split(ps, r"\."))
    take = F.coalesce(ps_labels, F.lit(1)) + F.lit(1)
    return F.when(_is_ip_literal(host), host).otherwise(
        F.when(
            (n >= take) & (n >= 2),
            F.array_join(F.slice(labels, n - take + 1, take), "."),
        )
    )

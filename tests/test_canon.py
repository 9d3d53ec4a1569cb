"""Golden + property tests for the URL canonicalizer.

Goldens cover every branch of the reference algorithm
(/root/reference/src/main/scala/com/ieps/crawler/utils/Canonical.scala:15-67),
hand-derived from the transcription (SURVEY §5.1: reference behavior
transcribed, not executed — the invariant is defined over these fixtures).
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ieps_crawler_spark.functions.canon import (
    extract_domain,
    get_canonical,
)

# (raw, expected canonical or None, expected domain)
GOLDEN = [
    # scheme default-prepend (Canonical.scala:22-24)
    ("evem.gov.si", "http://evem.gov.si/", "evem.gov.si"),
    ("evem.gov.si/stran", "http://evem.gov.si/stran/", "evem.gov.si"),
    ("https://evem.gov.si", "https://evem.gov.si/", "evem.gov.si"),
    # host lowercasing (:29)
    ("http://EVEM.GOV.SI/Stran", "http://evem.gov.si/Stran/", "evem.gov.si"),
    ("http://MixedCase.gov.si", "http://mixedcase.gov.si/", "mixedcase.gov.si"),
    # path case is PRESERVED (only host is lowered)
    ("http://e-uprava.gov.si/PodStran/X", "http://e-uprava.gov.si/PodStran/X/", "e-uprava.gov.si"),
    # fragment strip (:32-34)
    ("http://evem.gov.si/a#sekcija", "http://evem.gov.si/a/", "evem.gov.si"),
    ("http://evem.gov.si/#top", "http://evem.gov.si/", "evem.gov.si"),
    # fragment with regex metachars does NOT match replaceAll → survives (:33)
    ("http://evem.gov.si/p#a+b", "http://evem.gov.si/p#a+b/", "evem.gov.si"),
    # index-page removal (:37-41)
    ("http://evem.gov.si/dir/index.html", "http://evem.gov.si/dir/", "evem.gov.si"),
    ("http://evem.gov.si/index.php", "http://evem.gov.si/", "evem.gov.si"),
    ("http://evem.gov.si/default.asp", "http://evem.gov.si/", "evem.gov.si"),
    ("http://evem.gov.si/home.htm", "http://evem.gov.si/", "evem.gov.si"),
    # ordered-contains quirk: 'index.php' shadows 'index.php5' → trailing '5'
    ("http://evem.gov.si/dir/index.php5", "http://evem.gov.si/dir5/", "evem.gov.si"),
    # trailing slash appended when original path lacks one (:42-44)
    ("http://evem.gov.si", "http://evem.gov.si/", "evem.gov.si"),
    ("http://evem.gov.si/a/b", "http://evem.gov.si/a/b/", "evem.gov.si"),
    ("http://evem.gov.si/a/b/", "http://evem.gov.si/a/b/", "evem.gov.si"),
    # quirk preserved: slash appended AFTER the query when query present
    ("http://evem.gov.si/a?b=1", "http://evem.gov.si/a?b=1/", "evem.gov.si"),
    ("http://evem.gov.si/a/?b=1", "http://evem.gov.si/a/?b=1", "evem.gov.si"),
    # BasicURLNormalizer: default port removal, dot segments, escapes (:45)
    ("http://evem.gov.si:80/a/", "http://evem.gov.si/a/", "evem.gov.si"),
    ("https://evem.gov.si:443/a/", "https://evem.gov.si/a/", "evem.gov.si"),
    ("http://evem.gov.si:8080/a/", "http://evem.gov.si:8080/a/", "evem.gov.si"),
    ("http://evem.gov.si/a/../b/./c", "http://evem.gov.si/b/c/", "evem.gov.si"),
    ("http://evem.gov.si/sl%7Ea", "http://evem.gov.si/sl~a/", "evem.gov.si"),
    ("http://evem.gov.si/a b", "http://evem.gov.si/a%20b/", "evem.gov.si"),
    ("http://evem.gov.si/a%2fb", "http://evem.gov.si/a%2Fb/", "evem.gov.si"),
    # extension-keyed strip of the appended slash (:49-53)
    ("http://evem.gov.si/doc.pdf", "http://evem.gov.si/doc.pdf", "evem.gov.si"),
    ("http://evem.gov.si/p.HTML", "http://evem.gov.si/p.HTML", "evem.gov.si"),
    ("http://evem.gov.si/x.tar.gz", "http://evem.gov.si/x.tar.gz", "evem.gov.si"),
    ("http://evem.gov.si/slika.JPG", "http://evem.gov.si/slika.JPG", "evem.gov.si"),
    ("http://evem.gov.si/stran.aspx", "http://evem.gov.si/stran.aspx", "evem.gov.si"),
    # ...but a real directory ending '/' stays (extension not at end)
    ("http://evem.gov.si/pdfs/", "http://evem.gov.si/pdfs/", "evem.gov.si"),
    # www strip quirk (:61-67): startsWith('www') strips 4 chars
    ("http://www.evem.gov.si/x", "https-no", "evem.gov.si"),
    ("http://www2.evem.gov.si/x", "https-no", ".evem.gov.si"),
    ("http://wwwx.gov.si/x", "https-no", ".gov.si"),
    # parse failures → None / '' (:55-58,66)
    ("http://evem.gov.si:notaport/", None, ""),
    ("http://exa mple.gov.si/x", None, ""),
    ("", None, ""),
    ("http://", None, ""),
]


@pytest.mark.parametrize("raw,canon,domain", GOLDEN)
def test_golden(raw, canon, domain):
    got = get_canonical(raw)
    if canon != "https-no":  # domain-only rows
        assert got == canon, f"{raw!r}: {got!r} != {canon!r}"
    assert extract_domain(raw) == domain


def test_canonical_idempotent_on_goldens():
    """Idempotence holds for query/fragment-free URLs. For URLs with a
    query or surviving fragment the REFERENCE algorithm itself is
    non-idempotent (Canonical.scala:42-44 keys the trailing-slash append
    on getPath, which never ends in '/' when a query follows — each pass
    appends another '/'); that quirk is preserved, so those are excluded."""
    for raw, canon, _ in GOLDEN:
        if canon in (None, "https-no") or "?" in canon or "#" in canon:
            continue
        assert get_canonical(canon) == canon, canon


url_strategy = st.one_of(
    st.text(max_size=50),
    st.builds(
        lambda scheme, host, path, frag: f"{scheme}{host}.gov.si{path}{frag}",
        st.sampled_from(["", "http://", "https://"]),
        st.text(alphabet="abcz-AB.w", min_size=1, max_size=12),
        st.text(alphabet="abc/._%20-?=#", max_size=20),
        st.sampled_from(["", "#x", "#sek"]),
    ),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_total_and_idempotent(u):
    """canon never throws; canon(canon(u)) == canon(u) (SURVEY §5.5)."""
    c = get_canonical(u)
    if c is not None and "?" not in c and "#" not in c:
        c2 = get_canonical(c)
        assert c2 == c
    assert isinstance(extract_domain(u), str)


def test_pandas_udf_matches_pure(spark):
    from ieps_crawler_spark.functions.canon import (
        canonicalize_udf,
        extract_domain_udf,
    )

    raws = [g[0] for g in GOLDEN]
    df = spark.createDataFrame(pd.DataFrame({"url": raws}))
    rows = (
        df.select("url", canonicalize_udf("url").alias("canon"),
                  extract_domain_udf("url").alias("host"))
        .collect()
    )
    for r in rows:
        assert r["canon"] == get_canonical(r["url"])
        assert r["host"] == extract_domain(r["url"])

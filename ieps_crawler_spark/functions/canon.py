"""URL canonicalization — faithful Python transcription of the reference's
``utils/Canonical.scala:15-67`` (ghajduk3/ieps-crawler), exposed as
Arrow-batched pandas UDFs.

The reference chains: default-scheme prepend (Canonical.scala:22-24),
java.net.URL parse (:26), host lowercasing via String.replace (:29),
fragment removal via String.replaceAll — i.e. the fragment is treated as a
REGEX (:32-34), default-index-page removal with an ordered ``contains``
loop (:37-41, note ``index.php`` shadows ``index.php5``), trailing-slash
append keyed on the ORIGINAL path (:42-44, which appends after the query
string when a query is present — quirk preserved), crawler-commons
BasicURLNormalizer (:19,45 — re-derived below from the public
crawler-commons semantics, not copied), URI 7-arg reconstruction (:46-48),
and extension-keyed trailing-slash strip (:49-53). Any error → None (:55-58).

``extract_domain`` transcribes Canonical.scala:61-67 including the quirk
that ``host.startsWith("www")`` also matches ``www2...`` and strips 4 chars
unconditionally.

Behavior is pinned by the golden table in tests/test_canon.py (computed by
hand from the transcription, per SURVEY §5.1 — the invariant is defined
over our fixtures).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Canonical.scala:12
INDEX_PAGES = [
    "index.html", "index.htm", "index.shtml", "index.php", "default.html",
    "default.htm", "home.html", "home.htm", "index.php5", "index.php4",
    "index.cgi", "index.php3", "placeholder.html", "default.asp",
]

# Canonical.scala:13 (duplicates .ppt/.asp preserved — harmless but faithful)
EXTENSIONS = [
    ".html", ".htm", ".php", ".ppt", ".pdf", ".doc", ".docx", ".ppt",
    ".pptx", ".php5", ".php4", ".cgi", ".php3", ".asp", ".jpg", ".png",
    ".jpeg", ".svg", ".tiff", ".gif", ".jsp", ".jspx", ".asp", ".aspx",
    ".zip", ".gz", ".tar.gz", ".tar",
]

_URL_RE = re.compile(r"^(https?)://([^/?#]*)((?:[^?#])*)(?:\?([^#]*))?(?:#(.*))?$", re.S)

# registered-name chars the Java URI multi-arg constructor accepts in host
_HOST_RE = re.compile(r"^[A-Za-z0-9._~\-]*$")

_DEFAULT_PORTS = {"http": 80, "https": 443}

# RFC 3986 unreserved + sub-delims + pchar extras — octets that a percent
# escape may be safely decoded to inside a path/query (BasicURLNormalizer's
# "unescape what need not be escaped" rule).
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_SAFE_PATH = _UNRESERVED | set("!$&'()*+,;=:@/")
_SAFE_QUERY = _SAFE_PATH | set("?")


class _Malformed(ValueError):
    pass


def _parse(u: str):
    """java.net.URL-style split for http/https URLs.

    Returns (scheme, userinfo, host, port, path, query, ref); query/ref are
    None when their separator is absent (matching URL.getQuery/getRef null).
    Raises _Malformed like MalformedURLException (e.g. non-numeric port).
    """
    m = _URL_RE.match(u)
    if not m:
        raise _Malformed(u)
    scheme, authority, path, query, ref = m.groups()
    userinfo = None
    hostport = authority
    if "@" in authority:
        userinfo, hostport = authority.rsplit("@", 1)
    host, port = hostport, -1
    if not hostport.startswith("[") and ":" in hostport:
        host, p = hostport.rsplit(":", 1)
        if p:
            if not p.isdigit():
                raise _Malformed(u)
            port = int(p)
    return scheme, userinfo, host, port, path, query, ref


def _unparse(scheme, userinfo, host, port, path, query, ref) -> str:
    """java.net.URL.toString / URI(7-arg).toString shape."""
    s = scheme + "://"
    if userinfo:
        s += userinfo + "@"
    s += host
    if port != -1:
        s += f":{port}"
    s += path
    if query is not None:
        s += "?" + query
    if ref is not None:
        s += "#" + ref
    return s


def _norm_escapes(s: str, safe: set) -> str:
    """Percent-encoding normalization (BasicURLNormalizer semantics):
    decode escapes of characters that need no escaping, uppercase the hex
    of remaining escapes, and escape characters that are illegal raw."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1 and re.match(r"%[0-9A-Fa-f]{2}", s[i : i + 3]):
            octet = chr(int(s[i + 1 : i + 3], 16))
            if octet in _UNRESERVED:
                out.append(octet)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        elif c in safe:
            out.append(c)
            i += 1
        elif c == "%":  # bare percent
            out.append("%25")
            i += 1
        else:
            out.append("".join(f"%{b:02X}" for b in c.encode("utf-8")))
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 (what BasicURLNormalizer applies to paths)."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
                if not output:
                    output = [""]
            continue
        output.append(seg)
    # preserve a trailing slash produced by '.'/'..' final segments
    if path.endswith(("/.", "/..")) and (not output or output[-1] != ""):
        output.append("")
    res = "/".join(output)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def basic_normalize(url: str) -> str:
    """Re-derivation of crawler-commons BasicURLNormalizer.filter for
    http(s) URLs (public semantics; no code copied): trim + strip inner
    whitespace, lowercase scheme/host, drop trailing host dot, remove
    default port, empty path → '/', normalize percent escapes, remove
    dot segments, drop an empty trailing '?'."""
    u = url.strip().replace("\t", "").replace("\r", "").replace("\n", "")
    scheme, userinfo, host, port, path, query, ref = _parse(u)
    scheme = scheme.lower()
    host = host.lower().rstrip(".")
    if port == _DEFAULT_PORTS.get(scheme):
        port = -1
    if not path:
        path = "/"
    path = _remove_dot_segments(_norm_escapes(path, _SAFE_PATH))
    if query is not None:
        query = _norm_escapes(query, _SAFE_QUERY) or None
    return _unparse(scheme, userinfo, host, port, path, query, ref)


def get_canonical(novi_url: str | None) -> str | None:
    """Transcription of Canonical.getCanonical (Canonical.scala:15-59)."""
    if novi_url is None:
        return None
    try:
        wild = novi_url
        if not (wild.startswith("http://") or wild.startswith("https://")):
            wild = "http://" + wild  # :22-24

        scheme, userinfo, host, port, path, query, ref = _parse(wild)  # :26
        url1 = _unparse(scheme, userinfo, host, port, path, query, ref)
        # :29 — Java String.replace = replace ALL literal occurrences
        if host:
            url1 = url1.replace(host, host.lower())
        # :32-34 — Java String.replaceAll treats the fragment as a REGEX
        if ref is not None:
            url1 = re.sub("#" + ref, "", url1)
        # :37-41 — ordered contains/replace loop (index.php shadows .php5)
        for i in INDEX_PAGES:
            if i in url1:
                url1 = url1.replace("/" + i, "")
        # :42-44 — keyed on the ORIGINAL path; appends after query if present
        if path[-1:] != "/":
            url1 = url1 + "/"
        c = basic_normalize(url1)  # :45
        # :46-48 — URL reparse + URI 7-arg reconstruction. The Java URI
        # constructor rejects illegal authority characters (spaces etc.)
        # with URISyntaxException → caught → None; mirror that here.
        s2, ui2, h2, p2, pa2, q2, r2 = _parse(c)
        if not h2 or not _HOST_RE.match(h2):
            raise _Malformed(h2)
        urii = _unparse(s2, ui2, h2, p2, pa2, q2, r2)
        # :49-53 — strip the appended '/' when ending in a known extension
        for i in EXTENSIONS:
            if urii.lower().endswith(i + "/"):
                urii = urii[:-1]
        return urii
    except Exception:
        return None  # :55-58


def extract_domain(url_str: str | None) -> str:
    """Transcription of Canonical.extractDomain (Canonical.scala:61-67):
    host of the canonical URL; startsWith('www') strips 4 chars (so
    'www2.x.si' → '.x.si' — quirk preserved); '' on any failure."""
    try:
        canon = get_canonical(url_str)
        domain = _parse(canon)[2]
        if domain is None:
            return ""
        if domain.startswith("www"):
            return domain[4:]
        return domain
    except Exception:
        return ""


# ---------------------------------------------------------------- Spark UDFs
# Arrow-batched (pandas) UDFs — the engine's only Python execution surface.


def _canon_series(s: pd.Series) -> pd.Series:
    return s.map(get_canonical)


def _domain_series(s: pd.Series) -> pd.Series:
    return s.map(extract_domain)


canonicalize_udf = pandas_udf(_canon_series, StringType())
extract_domain_udf = pandas_udf(_domain_series, StringType())

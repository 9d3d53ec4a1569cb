"""Unicode text normalization for webtext corpora — the cleanup pass
every Common-Crawl-derived training set runs before dedup/quality
(CCNet, RefinedWeb, Dolma all normalize before hashing: un-normalized
'Café' vs 'Café' defeats exact and MinHash dedup alike).

The reference stores extracted text raw (DBCrud.scala page inserts);
this module is the Spark-native normalization surface layered on top:

  1. control-char strip           — JVM regexp (keeps \t and \n);
     runs FIRST so a stray control byte between a base char and its
     combining mark cannot block composition;
  2. Unicode NFC composition      — Python (no JVM builtin), ONE
     Arrow-vectorized stage via ``pandas Series.str.normalize`` —
     never row-at-a-time;
  3. horizontal-whitespace fold   — JVM regexp ([ \t]+ -> one space,
     space runs around newlines dropped);
  4. trim.

Steps 1, 3 and 4 are plain codegen expressions; the SQL twin replays
the whole chain verbatim and in the same order in DuckDB
(regexp_replace + nfc_normalize + the same regexes), so the driver
oracle covers the full pipeline.

Optional (OFF in the oracle query, pytest-golden-tested): ftfy-lite
mojibake repair — the single-pass cp1252/latin-1 -> utf-8 round-trip
that undoes the most common double-encoding ('Ã©' -> 'é',
'â€™' -> '’'), folded into the SAME Arrow stage as NFC so the repair
costs no extra Python hop.

Scale posture: one ArrowEvalPython stage (string in / string out,
Arrow batches), zero shuffles, zero joins — pipelines into whatever
scan or dedup stage surrounds it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# markers that only appear when utf-8 bytes were mis-decoded as a
# single-byte codepage: 'Ã'/'Â' (latin-1 lead bytes) and 'â€' (the
# cp1252 rendering of utf-8 punctuation like ' " –)
_MOJIBAKE_MARKERS = ("Ã", "Â", "â€")

# control chars except \t (x09) and \n (x0A); \r (x0D) is stripped so
# CRLF corpora normalize to bare \n. Same pattern string is valid in
# Java regex (Spark) and RE2 (DuckDB) — keep them byte-identical.
CONTROL_RE = r"[\x00-\x08\x0B-\x1F\x7F]"
HSPACE_RE = r"[ \t]+"
EDGE_SPACE_RE = r" ?\n ?"


def _repair_one(s):
    if s is None:
        return None
    if not any(m in s for m in _MOJIBAKE_MARKERS):
        return s
    for enc in ("cp1252", "latin-1"):
        try:
            return s.encode(enc).decode("utf-8")
        except UnicodeError:
            continue
    return s


def _nfc_pd(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def _repair_nfc_pd(s: pd.Series) -> pd.Series:
    return s.map(_repair_one, na_action="ignore").str.normalize("NFC")


# DataType objects, not DDL strings: workers re-import this module and
# a DDL-string pandas_udf needs an active session to parse (canon.py
# precedent)
_nfc_series = pandas_udf(_nfc_pd, StringType())
_repair_nfc_series = pandas_udf(_repair_nfc_pd, StringType())


def nfc(col: str | Column, fix_mojibake: bool = False) -> Column:
    """NFC-composed text (optionally mojibake-repaired first) — one
    Arrow stage."""
    c = F.col(col) if isinstance(col, str) else col
    return _repair_nfc_series(c) if fix_mojibake else _nfc_series(c)


def strip_controls(col: str | Column) -> Column:
    """JVM-side control strip — runs BEFORE NFC: a stray control byte
    between a base char and its combining mark (broken extractors emit
    these) would otherwise block composition, splitting the dedup key
    this pass exists to unify."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, CONTROL_RE, "")


def clean_whitespace(col: str | Column) -> Column:
    """JVM-side trailing steps: horizontal-space fold + edge trim.
    Composable after nfc() or standalone over already-NFC text."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, HSPACE_RE, " ")
    c = F.regexp_replace(c, EDGE_SPACE_RE, "\n")
    return F.trim(c)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    fix_mojibake: bool = False,
) -> DataFrame:
    """Append ``out_col`` = fully normalized text (control strip + NFC
    + whitespace fold + trim; optional mojibake repair). Control strip
    precedes NFC so combining marks separated from their base char by a
    control byte still compose (NFC cannot compose across intervening
    characters)."""
    return df.withColumn(
        out_col,
        clean_whitespace(nfc(strip_controls(text_col), fix_mojibake)),
    )


def duck_normalize_sql(expr: str) -> str:
    """The DuckDB scalar-expression twin of normalize_text's pipeline
    (mojibake OFF) over SQL expression ``expr`` — used by the driver
    oracle so Spark and DuckDB replay the identical regex chain in the
    identical order (controls stripped BEFORE nfc_normalize)."""
    e = f"regexp_replace({expr}, '{CONTROL_RE}', '', 'g')"
    e = f"nfc_normalize({e})"
    e = f"regexp_replace({e}, '{HSPACE_RE}', ' ', 'g')"
    e = f"regexp_replace({e}, '{EDGE_SPACE_RE}', chr(10), 'g')"
    return f"trim({e})"

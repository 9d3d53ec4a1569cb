"""Unicode normalization pass (operators/normalize.py): NFC via one
Arrow stage, JVM regex chain, optional ftfy-lite mojibake repair.

Every non-ASCII fixture is constructed from escape sequences so no
editor/tool can silently NFC-compose or re-encode it: the source file
is pure ASCII.
"""

from ieps_crawler_spark.operators.normalize import (
    _repair_one,
    normalize_text,
)
from ieps_crawler_spark.plans.audit import plan_counts

E_ACUTE = "\u00e9"        # precomposed e-acute
COMBINING = "e\u0301"     # decomposed pair; NFC-composes to E_ACUTE
# utf-8 bytes of e-acute (C3 A9) mis-decoded as latin-1:
MOJI_E = "\u00c3\u00a9"
# utf-8 of RIGHT SINGLE QUOTE U+2019 (E2 80 99) mis-decoded as cp1252:
MOJI_RSQ = "\u00e2\u20ac\u2122"
# utf-8 of EN DASH U+2013 (E2 80 93) mis-decoded as cp1252:
MOJI_DASH = "\u00e2\u20ac\u201c"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _norm(spark, rows, **kw):
    out = normalize_text(_df(spark, rows), **kw)
    return [r.norm_text for r in out.orderBy("doc_id").collect()]


def test_nfc_composes_combining_marks(spark):
    got = _norm(spark, ["Caf" + COMBINING, "Caf" + E_ACUTE])
    assert got == ["Caf" + E_ACUTE, "Caf" + E_ACUTE]


def test_control_strip_keeps_newlines(spark):
    got = _norm(spark, ["a\x07b\x00c\nd\re"])
    assert got == ["abc\nde"]  # BEL/NUL/CR out, LF stays


def test_whitespace_fold_and_trim(spark):
    got = _norm(spark, ["  a \t\t b  \n   c  "])
    assert got == ["a b\nc"]


def test_null_and_empty_pass_through(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    got = [r.norm_text for r in
           normalize_text(df).orderBy("doc_id").collect()]
    assert got == [None, ""]


def test_mojibake_repair_goldens():
    assert _repair_one("Caf" + MOJI_E) == "Caf" + E_ACUTE
    assert _repair_one("don" + MOJI_RSQ + "t") == "don\u2019t"
    assert (_repair_one(MOJI_DASH + "dash" + MOJI_DASH)
            == "\u2013dash\u2013")
    # clean text is returned untouched (markers absent -> no round-trip)
    clean = "Caf" + E_ACUTE + " fine"
    assert _repair_one(clean) == clean
    # un-repairable marker text survives unmodified (lone utf-8 lead
    # byte round-trips to an invalid sequence under both codepages)
    assert _repair_one("\u00c3") == "\u00c3"
    assert _repair_one(None) is None


def test_mojibake_flag_in_pipeline(spark):
    got = _norm(spark, ["Caf" + MOJI_E + "  ok"], fix_mojibake=True)
    assert got == ["Caf" + E_ACUTE + " ok"]
    # flag off: markers survive (only whitespace folds)
    got = _norm(spark, ["Caf" + MOJI_E + "  ok"], fix_mojibake=False)
    assert got == ["Caf" + MOJI_E + " ok"]


def test_single_arrow_stage_no_shuffle(spark):
    df = _df(spark, ["x"] * 4)
    from ieps_crawler_spark.plans.audit import plan_text

    out = normalize_text(df, fix_mojibake=True)
    c = plan_counts(out)
    # NFC+repair fused into ONE ArrowEvalPython stage (the census
    # counts it twice: once for the EvalPython substring)
    assert plan_text(out).count("ArrowEvalPython") == 1
    assert c["python_stages"] == 2
    assert c["shuffle_exchanges"] == 0
    assert c["sort_merge_joins"] + c["broadcast_hash_joins"] == 0


def test_control_byte_between_base_and_mark_still_composes(spark):
    # a control byte separating base char from combining mark must not
    # block NFC composition (controls are stripped BEFORE NFC)
    got = _norm(spark, ["Cafe\x07" + "\u0301" + " x"])
    assert got == ["Caf" + E_ACUTE + " x"]


# --- property tests: the repair round-trip is exact whenever it fires ---

from hypothesis import given, settings
from hypothesis import strategies as st

_text_st = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        min_codepoint=0x20,
    ),
    min_size=0,
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(_text_st)
def test_repair_never_raises_and_is_identity_without_markers(s):
    out = _repair_one(s)
    assert isinstance(out, str)
    if not any(m in s for m in ("\u00c3", "\u00c2", "\u00e2\u20ac")):
        assert out == s


@settings(max_examples=200, deadline=None)
@given(_text_st)
def test_repair_roundtrips_latin1_mojibake(s):
    """If s's utf-8 bytes are mis-decoded as latin-1 and the result
    shows a marker, repair must reconstruct s exactly: every latin-1
    char maps to the same byte under cp1252 when cp1252 can encode it
    at all, so whichever codepage the repair picks re-yields the
    original utf-8 bytes."""
    corrupt = s.encode("utf-8").decode("latin-1")
    if any(m in corrupt for m in ("\u00c3", "\u00c2", "\u00e2\u20ac")):
        assert _repair_one(corrupt) == s


@settings(max_examples=200, deadline=None)
@given(_text_st)
def test_repair_roundtrips_cp1252_mojibake(s):
    try:
        corrupt = s.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return  # bytes hit a cp1252 hole; not a representable corruption
    if any(m in corrupt for m in ("\u00c3", "\u00c2", "\u00e2\u20ac")):
        assert _repair_one(corrupt) == s

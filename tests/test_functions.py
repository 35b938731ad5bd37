"""Scalar function tests: date-precision cascade (F6), fingerprint (F3),
transliteration (F2), wikibase literals."""

from pyspark.sql import functions as F

from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.dates import (
    parse_date_multi,
    wikibase_time,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import (
    clean_string,
    fingerprint,
    remove_lang,
    transliterate,
)


def test_date_precision_cascade(spark):
    """The reference's messy archival formats (`15-chronik-events.R:56-123`)."""
    cases = [
        ("1.10.2000", "2000-10-01", 11),
        ("12.5.1982", "1982-05-12", 11),
        ("Februar 2003", "2003-02-01", 10),
        ("1999", "1999-01-01", 9),
        ("1970er", "1970-01-01", 8),
        ("garbage", None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _, _ in cases], ["raw"])
    out = df.select(
        "raw",
        parse_date_multi(F.col("raw")).alias("p"),
        wikibase_time(parse_date_multi(F.col("raw"))).alias("wb"),
    ).collect()
    got = {r.raw: (str(r.p.instant) if r.p.instant else None, r.p.precision) for r in out}
    for raw, instant, prec in cases:
        assert got[raw] == (instant, prec), raw
    wb = {r.raw: r.wb for r in out}
    assert wb["12.5.1982"] == "+1982-05-12T00:00:00Z/11"  # `13-books.R:104` shape
    assert wb["garbage"] is None


def test_transliterate_german(spark):
    df = spark.createDataFrame([("Müller Straße äöü ÄÖÜ ß é",)], ["s"])
    got = df.select(transliterate(F.col("s")).alias("t")).first().t
    assert got == "Mueller Strasse aeoeue AeOeUe ss e"


def test_clean_string_and_fingerprint(spark):
    df = spark.createDataFrame([("  Gustl   ANGSTMANN ",), ("Angstmann, gustl!",)], ["s"])
    out = df.select(
        clean_string(F.col("s")).alias("c"), fingerprint(F.col("s")).alias("f")
    ).collect()
    assert out[0].c == "gustl angstmann"
    # fingerprint collapses order + punctuation differences
    assert out[0].f == out[1].f == "angstmann gustl"


def test_remove_lang(spark):
    df = spark.createDataFrame([('"München"@de',), ("plain",)], ["s"])
    got = [r.o for r in df.select(remove_lang(F.col("s")).alias("o")).collect()]
    assert got == ["München", "plain"]


def test_isbn_validate_known_isbns(spark):
    """The canonical ISBN examples: both forms of 3-16-148410-X
    canonicalize to the same ISBN-13; a flipped check digit fails."""
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import (
        isbn_parts)

    df = spark.createDataFrame(
        [("978-3-16-148410-0",), ("3-16-148410-X",), ("0-306-40615-2",),
         ("978-0-306-40615-7",), ("978-0-306-40615-8",), ("garbage",)],
        ["raw"])
    clean, fmt, valid, isbn13 = isbn_parts(F.col("raw"))
    got = {r.raw: (r.f, r.v, r.c13) for r in df.select(
        "raw", fmt.alias("f"), valid.alias("v"),
        isbn13.alias("c13")).collect()}
    assert got["978-3-16-148410-0"] == ("isbn13", True, "9783161484100")
    assert got["3-16-148410-X"] == ("isbn10", True, "9783161484100")
    assert got["0-306-40615-2"] == ("isbn10", True, "9780306406157")
    assert got["978-0-306-40615-7"] == ("isbn13", True, "9780306406157")
    assert got["978-0-306-40615-8"] == ("invalid", False, None)
    assert got["garbage"] == ("invalid", False, None)


def test_transliterate_full_table_alignment(spark):
    """Every accented char maps to ITS OWN base letter — the two
    parallel string literals once drifted one position apart mid-table
    and silently mapped ù→o, ý→u, and all uppercase accents wrong
    (round-6 review finding)."""
    cases = [
        ("ùúûū", "uuuu"), ("ýÿ", "yy"), ("òóôõøō", "oooooo"),
        ("ÀÁÂÃÅĀ", "AAAAAA"), ("Ç", "C"), ("ÈÉÊËĒ", "EEEEE"),
        ("ÌÍÎÏĪ", "IIIII"), ("Ñ", "N"), ("ÒÓÔÕØŌ", "OOOOOO"),
        ("ÙÚÛŪ", "UUUU"), ("Ý", "Y"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = {r.s: r.t for r in df.select(
        "s", transliterate(F.col("s")).alias("t")).collect()}
    for src, want in cases:
        assert got[src] == want, (src, got[src], want)


def test_strip_markers_escapes_regex_metacharacters(spark):
    """Markers are literal strings: dotted forms ('e.v.') must not
    match arbitrary chars, '(' must not break the pattern, and a
    marker ending in '.' still strips before a space/end (lookaround
    boundaries, not \\b)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.strings import (
        strip_markers,
    )

    df = spark.createDataFrame(
        [("verein e.v. münchen",),   # dotted marker, mid-string
         ("exvy stays",),            # would be eaten if '.' were a wildcard
         ("club (reg) name",)],      # parenthesized marker
        ["s"])
    out = [r.o for r in df.select(strip_markers(
        F.col("s"), ["e.v.", "(reg)"]).alias("o")).collect()]
    assert out == ["verein münchen", "exvy stays", "club name"]


def test_pdf_classifier_ninth_branch_and_guards(spark):
    """Round-13 review: the reference classifier's ninth branch
    (round(font_size,2)==7.16 & Univers -> image_caption_direction,
    themengeschichtspfad.R:46) was missing — 7.16pt words classified
    'none'; and an empty rules tuple must refuse, not AttributeError."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.operators.pdf_layout import (
        classify_layout,
    )

    words = spark.createDataFrame(
        [(1, 1, "Richtung", 7.1600001, "AAAAAC+Univers"),
         (1, 2, "caption", 7.0, "AAAAAC+Univers"),
         (1, 3, "dem", 9.9, "Whatever")],
        "page long, pos long, word string, font_size double,"
        " font_name string")
    got = {r.word: r.format for r in classify_layout(words).collect()}
    assert got == {"Richtung": "image_caption_direction",
                   "caption": "image_caption", "dem": "none"}
    with pytest.raises(ValueError, match="non-empty"):
        classify_layout(words, rules=())


def test_parse_date_multi_german_range_circa(spark):
    """Round-13 review: German day form, day ranges (FROM side), and
    circa years parse instead of returning a null struct."""
    from pyspark.sql import functions as F

    from remove_na_lgbtiq_queer_knowledge_graph_spark.functions.dates import (
        parse_date_multi,
        wikibase_time,
    )

    df = spark.createDataFrame(
        [(1, "1. Mai 1982"), (2, "12. – 14. Mai 1982"), (3, "um 1935"),
         (4, "ca. 1940"), (5, "garbage")],
        "id long, raw string")
    p = parse_date_multi(F.col("raw"))
    got = {r.id: r.lit for r in df.select("id", wikibase_time(p)
                                          .alias("lit")).collect()}
    assert got[1] == "+1982-05-01T00:00:00Z/11"
    assert got[2] == "+1982-05-12T00:00:00Z/11"   # range FROM side
    assert got[3] == "+1935-01-01T00:00:00Z/9"
    assert got[4] == "+1940-01-01T00:00:00Z/9"
    assert got[5] is None

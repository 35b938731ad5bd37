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

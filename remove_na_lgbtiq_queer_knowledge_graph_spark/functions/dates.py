"""Date parsing with precision (reference family F6, SURVEY.md §2.9).

The reference parses messy archival dates ("1.10.2000", "Februar 2003",
"1970er", "12. – 14. Mai 1982") into Wikibase time literals carrying a
precision digit (9=year, 10=month, 11=day):
``data-publishing/factgrid/entities/15-chronik-events.R:56-123``.

We model that as a ``struct{instant: date, precision: int}`` built from a
``coalesce`` cascade of ``to_date`` attempts — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_GERMAN_MONTHS = {
    "Januar": "01", "Februar": "02", "März": "03", "April": "04",
    "Mai": "05", "Juni": "06", "Juli": "07", "August": "08",
    "September": "09", "Oktober": "10", "November": "11", "Dezember": "12",
}


def _normalize_german(col: Column) -> Column:
    out = col
    for name, num in _GERMAN_MONTHS.items():
        out = F.regexp_replace(out, name, num)
    return out


def parse_date_multi(col: Column) -> Column:
    """Multi-format cascade → struct(instant: date, precision: int).

    Handles: ``d.M.yyyy`` and German ``d. Monthname yyyy`` (day,
    precision 11), ``M yyyy`` / ``Monthname yyyy`` (month, 10), bare
    ``yyyy`` and circa ``um yyyy`` (year, 9), decade ``yyyy er`` (8),
    and day ranges ``12. – 14. Mai 1982`` (the FROM side carries the
    instant, day precision — the reference's from/to splitter's first
    half).  Mirrors the case_when cascade at
    ``15-chronik-events.R:56-123``; the German-day/range/circa forms
    were round-13 review gaps (they returned a null struct).
    """
    s0 = F.trim(col)
    # circa prefix: 'um 1935' / 'ca. 1935' parse as the year
    s0 = F.regexp_replace(s0, r"^(um|ca\.?)\s+", "")
    s = _normalize_german(s0)
    # range 'd. – d. <month> yyyy' → keep the FROM day ('$1. rest')
    s = F.regexp_replace(
        s, r"^([0-9]{1,2})\.\s*[–—-]\s*[0-9]{1,2}\.\s*", "$1. ")
    day = F.coalesce(
        F.try_to_date(s, "d.M.yyyy"),
        # normalized German day form: '1. Mai 1982' → '1. 05 1982'
        F.try_to_date(s, "d. M yyyy"))
    month = F.coalesce(F.try_to_date(s, "M yyyy"), F.try_to_date(s, "M.yyyy"))
    year = F.when(s.rlike(r"^[0-9]{4}$"), F.to_date(F.concat(s, F.lit("-01-01"))))
    decade = F.when(
        s.rlike(r"^[0-9]{4}er$"),
        F.to_date(F.concat(F.substring(s, 1, 4), F.lit("-01-01"))),
    )
    instant = F.coalesce(day, month, year, decade)
    precision = (
        F.when(day.isNotNull(), F.lit(11))
        .when(month.isNotNull(), F.lit(10))
        .when(year.isNotNull(), F.lit(9))
        .when(decade.isNotNull(), F.lit(8))
        .otherwise(F.lit(None).cast("int"))
    )
    return F.struct(instant.alias("instant"), precision.alias("precision"))


def wikibase_time(parsed: Column) -> Column:
    """Render the precision struct as a Wikibase time literal
    ``+1982-05-12T00:00:00Z/11`` (``15-chronik-events.R:109-123``)."""
    return F.when(
        parsed["instant"].isNotNull(),
        F.concat(
            F.lit("+"),
            F.date_format(parsed["instant"], "yyyy-MM-dd"),
            F.lit("T00:00:00Z/"),
            parsed["precision"].cast("string"),
        ),
    )

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

    Handles: ``d.M.yyyy`` (day, precision 11), ``M yyyy`` / ``Monthname
    yyyy`` (month, 10), bare ``yyyy`` (year, 9), decade ``yyyy er``
    (8).  Mirrors the case_when cascade at ``15-chronik-events.R:56-123``.
    """
    s = _normalize_german(F.trim(col))
    day = F.try_to_date(s, "d.M.yyyy")
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

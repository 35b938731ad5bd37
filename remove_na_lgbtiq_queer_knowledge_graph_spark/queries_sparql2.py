"""Second batch of verbatim reference ``.rq`` queries (SURVEY.md §2.11,
§3.2) with DuckDB oracles.

Round 2 closes the remaining named reference queries:
``get_wiki_sitelinks.rq`` (grouped property path + 5 independent
OPTIONAL sitelink blocks), ``get_gnd_from_fg_and_wd.rq`` (single-quoted
strings, OPTIONAL *inside* SERVICE federation),
``get_all_properties_with_corresponding_prop.rq``
(``wikibase:propertyType`` property dimension + LIMIT).  Query texts are
verbatim copies of ``/root/reference/data-publishing/factgrid/queries/``
files; the oracles derive the same answers straight from the relational
star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.r2rml import Template, TriplesMap, materialize
from .plans.sparql import compile_sparql
from .queries_sparql import (
    FG,
    FGT,
    RDFS_LABEL,
    WD,
    WDT,
    factgrid_kg,
    wikidata_service,
)
from .spec import QuerySpec, t
from .spec import materialize as _cache

WIKIBASE_PTYPE = "http://wikiba.se/ontology#propertyType"
_PTYPE_ITEM = "http://wikiba.se/ontology#WikibaseItem"
_PTYPE_EXT = "http://wikiba.se/ontology#ExternalId"


def _property_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-entity triples for the properties-mapping query: one
    FactGrid property item per nation row, carrying its corresponding
    Wikidata property id (``fgt:P343``), a ``wikibase:propertyType``,
    and an optional ``fgt:P8`` (part of) group."""
    n = t(spark, sf_dir, "nation").select(
        "n_name",
        (F.lit(1000) + F.col("n_nationkey")).alias("pid"),
        F.concat(F.lit("P"),
                 (F.lit(2000) + F.col("n_nationkey")).cast("string"))
         .alias("wd_pid"),
        F.when(F.col("n_nationkey") % 2 == 0, F.lit(_PTYPE_ITEM))
         .otherwise(F.lit(_PTYPE_EXT)).alias("ptype"),
        F.when(F.col("n_nationkey") % 2 == 0, F.lit(FG + "Q100632"))
         .alias("part_of"),
    )
    maps = [
        TriplesMap("props", Template(FG + "P", "pid"), [
            (FGT + "P343", "wd_pid"),
            (WIKIBASE_PTYPE, "ptype"),
            (FGT + "P8", "part_of"),
            (RDFS_LABEL, "n_name", "de"),
            (RDFS_LABEL, "n_name", "en"),
        ]),
    ]
    return materialize({"props": n}, maps)


def _extended_kg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cache(
        factgrid_kg(spark, sf_dir).unionByName(_property_items(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# Verbatim reference query texts
# ---------------------------------------------------------------------------

def _ref_rq(name: str) -> str:
    """Load the reference query text verbatim at call time — the engine
    runs the exact bytes the reference ships."""
    with open("/root/reference/data-publishing/factgrid/queries/" + name) as f:
        return f.read()


def sparql_sitelinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim ``get_wiki_sitelinks.rq``: organisations via the grouped
    ``(fgt:P2/fgt:P3*)`` path, then five independent OPTIONAL sitelink
    lookups (wikidata + 4 Wikipedia languages), each a left join against
    a different ``schema:isPartOf`` slice."""
    return compile_sparql(_ref_rq("get_wiki_sitelinks.rq"),
                          factgrid_kg(spark, sf_dir))


_SITELINKS_SQL = f"""
SELECT '{FG}Q' || CAST(600000 + s_suppkey AS VARCHAR) AS fg_item,
       s_name AS "fg_itemLabel",
       CASE WHEN s_suppkey % 2 = 0
            THEN '{WD}Q' || CAST(800000 + s_suppkey AS VARCHAR) END AS wd_item,
       CASE WHEN s_suppkey % 3 = 0 THEN 'de-' || s_name END AS "Sdewiki",
       CASE WHEN s_suppkey % 4 = 0 THEN 'en-' || s_name END AS "Senwiki",
       CASE WHEN s_suppkey % 5 = 0 THEN 'fr-' || s_name END AS "Sfrwiki",
       CASE WHEN s_suppkey % 7 = 0 THEN 'es-' || s_name END AS "Seswiki"
FROM supplier
"""


def sparql_gnd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim ``get_gnd_from_fg_and_wd.rq``: GND ids from both ends —
    required ``fgt:P76`` + sitelink on the FactGrid side, OPTIONAL
    ``wdt:P227`` *inside* the federated SERVICE block (the left join
    must happen against the outer bindings), plus the single-quoted
    ``CONCAT('"', ...)`` BIND."""
    return compile_sparql(
        _ref_rq("get_gnd_from_fg_and_wd.rq"),
        factgrid_kg(spark, sf_dir),
        services={"https://query.wikidata.org/sparql":
                  wikidata_service(spark, sf_dir)},
    )


_GND_SQL = f"""
SELECT '{FG}Q' || CAST(500000 + c_custkey AS VARCHAR) AS fg_item,
       c_name AS "fg_itemLabel",
       'gnd-' || CAST(c_custkey AS VARCHAR) AS fg_gnd,
       CASE WHEN c_custkey % 4 = 0
            THEN 'wd-gnd-' || CAST(c_custkey AS VARCHAR) END AS wd_gnd,
       '{WD}Q' || CAST(900000 + c_custkey AS VARCHAR) AS wd_item,
       '{FG}Q7' AS instance,
       'human' AS "instanceLabel"
FROM customer
WHERE c_custkey % 2 = 0 AND c_custkey % 3 <> 0
"""


def sparql_properties_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim ``get_all_properties_with_corresponding_prop.rq``: the
    FactGrid→Wikidata property-mapping dimension —
    ``wikibase:propertyType``, OPTIONAL part-of group, and the
    ``BIND(IRI(CONCAT(STR(wdt:), ...)))`` property-IRI rewrite."""
    return compile_sparql(
        _ref_rq("get_all_properties_with_corresponding_prop.rq"),
        _extended_kg(spark, sf_dir),
    )


_PROPERTIES_SQL = f"""
SELECT '{FG}P' || CAST(1000 + n_nationkey AS VARCHAR) AS fg_property,
       n_name AS "fg_propertyLabel",
       CASE WHEN n_nationkey % 2 = 0 THEN '{_PTYPE_ITEM}'
            ELSE '{_PTYPE_EXT}' END AS fg_property_type,
       CAST(NULL AS VARCHAR) AS "fg_propertyDescription",
       '{WDT}P' || CAST(2000 + n_nationkey AS VARCHAR) AS wd_property,
       CASE WHEN n_nationkey % 2 = 0 THEN '{FG}Q100632' END AS fg_part_of,
       CASE WHEN n_nationkey % 2 = 0 THEN 'property group' END
           AS "fg_part_ofLabel"
FROM nation
"""


SPECS: dict[str, QuerySpec] = {
    "sparql_sitelinks": QuerySpec(
        sparql_sitelinks, _SITELINKS_SQL,
        "verbatim get_wiki_sitelinks.rq (grouped path + 5 OPTIONAL "
        "sitelink blocks)"),
    "sparql_gnd": QuerySpec(
        sparql_gnd, _GND_SQL,
        "verbatim get_gnd_from_fg_and_wd.rq (OPTIONAL inside SERVICE "
        "federation)"),
    "sparql_properties_mapping": QuerySpec(
        sparql_properties_mapping, _PROPERTIES_SQL,
        "verbatim get_all_properties_with_corresponding_prop.rq "
        "(property dimension + LIMIT)"),
}

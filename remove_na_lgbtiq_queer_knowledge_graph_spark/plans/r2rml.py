"""R2RML-style triple materialization (SURVEY.md §2.11 G19, §3.3).

The reference materializes its KG from relational tables through
YARRRML/R2RML mappings (``data-modeling/mappings/kg_v1.yml:28-83``, run by
kglab/morph-kgc at ``data-modeling/create-rdf.py:8-21``).  A mapping is:
logical source (table/query) + subject template + predicate-object pairs
(constants, columns, or *referencing object maps with join conditions* —
``kg_v1.yml:46-51``).

Spark-first: each triples-map row-set is a ``select`` with a
``format_string`` subject template; referencing maps become DataFrame
joins; the graph is the ``unionByName`` of all maps.  One declarative
plan — Catalyst prunes the source scans per map and the union is
partition-parallel at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Template:
    """IRI template ``prefix + column`` (e.g. ``ex_book:$(book_id)``,
    ``kg_v1.yml:31``)."""

    prefix: str
    column: str

    def expr(self) -> Column:
        return F.concat(F.lit(self.prefix), F.col(self.column).cast("string"))


@dataclass(frozen=True)
class RefObjectMap:
    """Referencing object map: object = other map's subject, linked by a
    join condition (``kg_v1.yml:46-51``).

    ``parent_table`` may be a single table name or a TUPLE of names —
    a YARRRML mapping with multiple sources emits its subjects from
    every source, so a reference to it joins against the UNION of the
    per-source frames (round 11; previously a loud
    NotImplementedError).

    ``function`` selects the join predicate (YARRRML condition
    functions; round 11 — previously only ``equal``):

    - ``equal`` — equi-join on the raw keys (Catalyst picks
      broadcast/sort-merge; the scale-correct default).
    - ``equal_ignoring_case`` — equi-join on ``lower()`` of both keys;
      STILL an equi-join, so shuffle/broadcast strategies apply
      unchanged.
    - ``not_equal`` — theta-join ``child <> parent``.
    - ``contains`` — theta-join ``child LIKE '%'||parent||'%'``
      (RML's grel:string_contains / idlab-fn
      stringContainsOtherString).

    The two theta functions cannot be hash joins; in R2RML practice the
    parent map is a small vocabulary/dimension table, so ``materialize``
    broadcasts the parent side for them (a broadcast-nested-loop over a
    bounded dim — the only distributed plan a non-equi predicate
    admits)."""

    parent_table: str | tuple[str, ...]
    parent_subject: Template
    child_key: str
    parent_key: str
    function: str = "equal"


@dataclass(frozen=True)
class TriplesMap:
    source: str                       # table name in `tables`
    subject: Template
    po: list[tuple] = field(default_factory=list)
    # (predicate, obj) or (predicate, obj, lang_or_None, dtype_or_None);
    # obj: Template (IRI), Column-producing str (column name),
    # ("const", value), or RefObjectMap


def materialize(tables: dict[str, DataFrame], maps: list[TriplesMap]) -> DataFrame:
    """Materialize all triples maps into one
    ``(subject, predicate, object, lang, dtype)`` DataFrame (SURVEY §1.1
    — language-tagged literals like ``"text"@de`` carry ``lang``, typed
    literals carry ``dtype``, IRIs carry neither) — strings throughout,
    nulls dropped (a null column produces no triple, matching R2RML
    semantics).

    All non-referencing PO pairs of ALL maps over the same logical
    source are emitted from ONE scan of that source (explode over an
    array of (subject, predicate, object, lang, dtype) structs) — a
    per-map or per-pair union would scan the source once per map (the
    FactGrid fixture has 13 maps over 5 sources; merging cut its
    materialization ~2×).  Referencing object maps stay separate joins.
    """
    null_s = F.lit(None).cast("string")
    parts: list[DataFrame] = []
    by_source: dict[str, list[Column]] = {}
    for m in maps:
        subj = m.subject.expr()
        for entry in m.po:
            pred, obj = entry[0], entry[1]
            lang = entry[2] if len(entry) > 2 else None
            dtype = entry[3] if len(entry) > 3 else None
            lang_c = F.lit(lang).cast("string") if lang else null_s
            dtype_c = F.lit(dtype).cast("string") if dtype else null_s
            if isinstance(obj, RefObjectMap):
                ptabs = (obj.parent_table
                         if isinstance(obj.parent_table, (list, tuple))
                         else (obj.parent_table,))
                if not ptabs:
                    raise ValueError(
                        "RefObjectMap with empty parent_table "
                        f"(child key {obj.child_key!r})")
                # multi-source parent: union the per-source frames
                # BEFORE the join — selecting first aligns the schemas
                # and keeps the union two narrow columns wide
                pframes = [
                    tables[pt].select(
                        F.col(obj.parent_key).alias("__pk"),
                        obj.parent_subject.expr().alias("__obj"),
                    )
                    for pt in ptabs
                ]
                parent = pframes[0]
                for extra in pframes[1:]:
                    parent = parent.unionByName(extra)
                fn = obj.function  # dataclass default 'equal'
                child_c = F.col(obj.child_key)
                if fn == "equal":
                    cond = child_c == F.col("__pk")
                elif fn == "equal_ignoring_case":
                    # equi-join on the lowered keys — Catalyst still
                    # sees an equality, so hash strategies survive
                    cond = F.lower(child_c.cast("string")) == F.lower(
                        F.col("__pk").cast("string"))
                elif fn == "not_equal":
                    cond = child_c != F.col("__pk")
                    parent = F.broadcast(parent)
                elif fn == "contains":
                    cond = child_c.cast("string").contains(
                        F.col("__pk").cast("string"))
                    parent = F.broadcast(parent)
                else:
                    raise NotImplementedError(
                        f"join condition function {fn!r}")
                parts.append(
                    tables[m.source]
                    .join(parent, cond)
                    .select(subj.alias("subject"),
                            F.lit(pred).alias("predicate"),
                            F.col("__obj").alias("object"),
                            lang_c.alias("lang"), dtype_c.alias("dtype"))
                    .filter(F.col("object").isNotNull()
                            & F.col("subject").isNotNull())
                )
                continue
            if isinstance(obj, Template):
                oc = obj.expr()
            elif isinstance(obj, tuple) and obj[0] == "const":
                oc = F.lit(obj[1]).cast("string")
            else:
                oc = F.col(obj).cast("string")
            by_source.setdefault(m.source, []).append(
                F.struct(subj.alias("subject"),
                         F.lit(pred).alias("predicate"),
                         oc.cast("string").alias("object"),
                         lang_c.alias("lang"), dtype_c.alias("dtype"))
            )
    for source, structs in by_source.items():
        parts.append(
            tables[source]
            .select(F.explode(F.array(*structs)).alias("t"))
            .select("t.subject", "t.predicate", "t.object", "t.lang",
                    "t.dtype")
            # a null SUBJECT (null key column in a template) produces
            # no triple either — same R2RML rule as null objects
            .filter(F.col("object").isNotNull()
                    & F.col("subject").isNotNull())
        )
    if not parts:
        raise ValueError(
            "materialize() got no predicate-object pairs: maps is empty "
            "or every map's po list is empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def star_schema_maps() -> list[TriplesMap]:
    """The driver star schema as a KG: customers/suppliers → nations →
    regions (FIXTURES.md §10 graph fixture)."""
    return [
        TriplesMap(
            "customer", Template("c:", "c_custkey"),
            [("type", ("const", "Customer")),
             ("name", "c_name"),
             ("segment", "c_mktsegment"),
             ("inNation", Template("n:", "c_nationkey"))],
        ),
        TriplesMap(
            "supplier", Template("s:", "s_suppkey"),
            [("type", ("const", "Supplier")),
             ("name", "s_name"),
             ("inNation", Template("n:", "s_nationkey"))],
        ),
        TriplesMap(
            "nation", Template("n:", "n_nationkey"),
            [("name", "n_name"),
             ("inRegion", Template("r:", "n_regionkey"))],
        ),
        TriplesMap(
            "region", Template("r:", "r_regionkey"),
            [("name", "r_name")],
        ),
    ]

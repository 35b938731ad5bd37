"""YARRRML mapping loader (SURVEY.md §3.3, G19).

The reference drives RDF materialization from a YARRRML YAML document
(``data-modeling/mappings/kg_v1.yml``): ``prefixes``, ``sources``
(tables or SQL queries, :11-25), ``mappings`` with subject templates
``ex_book:$(book_id)`` (:31), constant/column predicate-object pairs
(:32-35), and referencing object maps with equal-join conditions
(:36-51).  This loader parses that document shape into the engine's
:mod:`plans.r2rml` ``TriplesMap`` plan objects, so
``materialize(tables, load_yarrrml(text).maps)`` runs the whole mapping
as one Catalyst plan.

Supported po forms::

    - [a, schema:Book]            # rdf:type constant
    - [schema:name, $(title)]     # column-valued object
    - [schema:name, $(title), de~lang]   # language-tagged literal
    - p: schema:author            # referencing object map
      o:
      - mapping: AuthorMapping
        condition:
          function: equal
          parameters:
            - [str1, $(book_id)]  # child column
            - [str2, $(book_id)]  # parent column

Terms ``pfx:$(col)`` are IRI templates, ``$(col)`` column references,
``pfx:name`` expanded constants, anything else a plain string constant.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .r2rml import RefObjectMap, Template, TriplesMap

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TEMPLATE_RE = re.compile(r"^([A-Za-z_][\w-]*):\$\((\w+)\)$")
_COLUMN_RE = re.compile(r"^\$\((\w+)\)$")

# YARRRML condition functions → RefObjectMap.function (round 11; the
# strict-mode NotImplementedError previously covered everything but
# ``equal``).  Keys are normalized: prefix (``idlab-fn:`` / ``grel:`` /
# a full IRI) stripped, lowered, underscores removed — so
# ``idlab-fn:stringContainsOtherString``, ``grel:string_contains`` and
# ``stringContainsOtherString`` all resolve to ``contains``.
_JOIN_FUNCTIONS = {
    "equal": "equal",
    "notequal": "not_equal",
    "stringcontainsotherstring": "contains",
    "stringcontains": "contains",
    "contains": "contains",
    "equalignoringcase": "equal_ignoring_case",
    "toolowercaseequal": "equal_ignoring_case",
}


def _normalize_fn(fn) -> str:
    """Normalize a YARRRML condition-function name: default ``equal``,
    strip any prefix/IRI namespace, lower-case, drop underscores."""
    if fn is None:
        return "equal"
    name = str(fn)
    for sep in ("#", "/", ":"):
        if sep in name:
            name = name.rsplit(sep, 1)[1]
    return name.lower().replace("_", "")
_PNAME_RE = re.compile(r"^([A-Za-z_][\w-]*):(\S*)$")


@dataclass
class YarrrmlDoc:
    prefixes: dict[str, str]
    sources: dict[str, dict]          # name -> {"table": ...} | {"query": ...}
    maps: list[TriplesMap] = field(default_factory=list)


def _subject_template(s: str, prefixes: dict[str, str]) -> Template:
    m = _TEMPLATE_RE.match(s)
    if not m:
        raise ValueError(f"unsupported subject template {s!r}")
    pfx, col = m.groups()
    if pfx not in prefixes:
        raise ValueError(f"undeclared prefix {pfx!r} in subject {s!r}")
    return Template(prefixes[pfx], col)


def _object_term(o: str, prefixes: dict[str, str]):
    m = _TEMPLATE_RE.match(o)
    if m:
        if m.group(1) not in prefixes:
            # the $(col) syntax is unambiguous intent — emitting the
            # template TEXT as a per-row constant (the old fallthrough)
            # silently poisons every object; mirror the subject path
            raise ValueError(f"undeclared prefix {m.group(1)!r} in "
                             f"object template {o!r}")
        return Template(prefixes[m.group(1)], m.group(2))
    m = _COLUMN_RE.match(o)
    if m:
        return m.group(1)             # column reference
    m = _PNAME_RE.match(o)
    if m and m.group(1) in prefixes:
        if "$(" in m.group(2):
            # ex:$(book-id): the narrow \w+ regexes rejected the
            # hyphenated column and the pname fallback would have
            # emitted the TEMPLATE TEXT as a constant — the same
            # silent poisoning the undeclared-prefix guard refuses
            raise ValueError(
                f"unsupported template syntax in object {o!r} — "
                "column names must match \\w+")
        return ("const", prefixes[m.group(1)] + m.group(2))
    if "$(" in o:
        raise ValueError(
            f"unsupported template syntax in object {o!r} — "
            "column names must match \\w+")
    return ("const", o)


def _predicate(p: str, prefixes: dict[str, str]) -> str:
    if p == "a":
        return RDF_TYPE
    m = _PNAME_RE.match(p)
    if m and m.group(1) in prefixes:
        return prefixes[m.group(1)] + m.group(2)
    return p


def load_yarrrml(text: str) -> YarrrmlDoc:
    """Parse a YARRRML document into TriplesMap plan objects.

    Referencing object maps are resolved in a second pass (a mapping may
    reference one declared later).  ``sources`` entries are returned
    as-is — the caller materializes each named source into a DataFrame
    (table scan or ``spark.sql`` for query-typed sources) and passes the
    dict to :func:`plans.r2rml.materialize`, keyed by SOURCE name.
    """
    import yaml

    doc = yaml.safe_load(text)
    prefixes = doc.get("prefixes", {}) or {}
    sources = doc.get("sources", {}) or {}
    mappings = doc.get("mappings", {}) or {}

    # pass 1: subject template + source list per mapping (for
    # references).  A list of sources means the mapping's triples are
    # emitted from EVERY source, not silently just the first.
    heads: dict[str, tuple[list[str], Template]] = {}
    for name, m in mappings.items():
        src = m["sources"]
        srcs = list(src) if isinstance(src, list) else [src]
        if not srcs:
            # an empty sources list silently emitted NO TriplesMap
            # (and () parent_table crashed r2rml with a bare
            # IndexError) — refuse with the mapping named
            raise ValueError(f"mapping {name!r} has empty sources")
        heads[name] = (srcs, _subject_template(m["s"], prefixes))

    out = YarrrmlDoc(prefixes, sources)
    for name, m in mappings.items():
        srcs, subj = heads[name]
        po: list[tuple] = []
        for entry in m.get("po", []):
            if isinstance(entry, dict):
                if isinstance(entry["p"], list):
                    raise NotImplementedError(
                        f"list-valued predicate not supported: "
                        f"{entry['p']!r}")
                pred = _predicate(str(entry["p"]), prefixes)
                objs = entry["o"]
                if not isinstance(objs, list):
                    # a scalar (str/dict) object wraps to a one-item
                    # list — iterating a bare string looped over its
                    # CHARACTERS and emitted one garbage constant
                    # triple per char (round-13 review)
                    objs = [objs]
                for obj in objs:
                    if isinstance(obj, dict) and "mapping" not in obj:
                        # YARRRML's expanded object form:
                        # {value: $(col), language: en} / {value: ...,
                        # datatype: xsd:date}.  str(obj) used to emit
                        # the Python dict REPR as a literal constant.
                        if "value" not in obj:
                            raise ValueError(
                                f"unsupported object form {obj!r} in "
                                f"{name}.{pred} (need 'value' or "
                                "'mapping')")
                        dt = obj.get("datatype")
                        po.append((
                            pred,
                            _object_term(str(obj["value"]), prefixes),
                            obj.get("language"),
                            _predicate(str(dt), prefixes) if dt else None,
                        ))
                        continue
                    if not isinstance(obj, dict):
                        po.append((pred, _object_term(str(obj), prefixes)))
                        continue
                    parent = obj["mapping"]
                    cond = obj.get("condition", {})
                    fn = _JOIN_FUNCTIONS.get(
                        _normalize_fn(cond.get("function")))
                    if fn is None:
                        raise NotImplementedError(
                            f"join condition {cond.get('function')!r}")
                    child_key = parent_key = None
                    for pname, pval in cond.get("parameters", []):
                        col = _COLUMN_RE.match(str(pval))
                        if not col:
                            raise ValueError(
                                f"condition parameter {pval!r} must be $(col)")
                        if pname == "str1":
                            child_key = col.group(1)
                        elif pname == "str2":
                            parent_key = col.group(1)
                    if child_key is None or parent_key is None:
                        raise ValueError(
                            f"join condition of {name}.{pred} needs "
                            "str1/str2 parameters")
                    if parent not in heads:
                        raise ValueError(
                            f"{name}.{pred} references undeclared "
                            f"mapping {parent!r}")
                    p_srcs, p_subj = heads[parent]
                    # a multi-source parent joins against the UNION of
                    # its per-source frames (plans.r2rml materializes
                    # the tuple form); single source stays a plain name
                    po.append((pred, RefObjectMap(
                        parent_table=(p_srcs[0] if len(p_srcs) == 1
                                      else tuple(p_srcs)),
                        parent_subject=p_subj,
                        child_key=child_key, parent_key=parent_key,
                        function=fn)))
                continue
            if isinstance(entry[0], list) or isinstance(entry[1], list):
                # list-valued shorthand p/o would stringify to the
                # Python list REPR and emit it as one constant triple
                # (the dict-repr bug class, round-13 review) — refuse
                raise NotImplementedError(
                    f"list-valued shorthand p/o not supported: {entry!r}")
            pred = _predicate(str(entry[0]), prefixes)
            lang = dtype = None
            if len(entry) > 2:
                tag = str(entry[2])
                if tag.endswith("~lang"):
                    lang = tag[: -len("~lang")]
                else:
                    dtype = _predicate(tag, prefixes)
            po.append((pred, _object_term(str(entry[1]), prefixes), lang,
                       dtype))
        for src in srcs:
            out.maps.append(TriplesMap(src, subj, po))
    return out

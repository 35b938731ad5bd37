"""YARRRML loader tests — incl. parsing the reference's own mapping
document verbatim (`data-modeling/mappings/kg_v1.yml`)."""

from __future__ import annotations

from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.r2rml import (
    RefObjectMap,
    Template,
)
from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.yarrrml import (
    RDF_TYPE,
    load_yarrrml,
)


def test_reference_kg_v1_parses_verbatim():
    with open("/root/reference/data-modeling/mappings/kg_v1.yml") as f:
        doc = load_yarrrml(f.read())
    by_src = {m.source: m for m in doc.maps}
    assert set(by_src) == {"books", "entities", "publishers", "posters"}

    books = by_src["books"]
    assert books.subject == Template("http://example.com/book/", "book_id")
    preds = [po[0] for po in books.po]
    assert preds[0] == RDF_TYPE                      # `a` keyword
    assert "https://schema.org/name" in preds        # prefixed predicate

    # referencing object map with join condition (kg_v1.yml:36-51)
    ref = next(po[1] for po in books.po
               if po[0] == "https://schema.org/publisher")
    assert isinstance(ref, RefObjectMap)
    assert ref.parent_table == "publishers"
    assert ref.child_key == "book_id"
    assert ref.parent_key == "publisher_book_id"
    assert ref.parent_subject == Template(
        "http://example.com/publisher/", "id")

    # query-typed logical source survives (kg_v1.yml:20-25)
    assert "query" in doc.sources["publishers"]


def test_lang_tag_and_constants(spark):
    doc = load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  t:
    table: t
mappings:
  M:
    sources: t
    s: ex:$(id)
    po:
      - [ex:label, $(name), de~lang]
      - [ex:kind, ex:Thing]
""")
    (m,) = doc.maps
    assert m.po[0] == ("http://ex.org/label", "name", "de", None)
    assert m.po[1] == ("http://ex.org/kind", ("const", "http://ex.org/Thing"),
                       None, None)

    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.r2rml import (
        materialize,
    )

    src = spark.createDataFrame([(1, "eins")], "id int, name string")
    rows = {(r.predicate, r.object, r.lang)
            for r in materialize({"t": src}, doc.maps).collect()}
    assert rows == {
        ("http://ex.org/label", "eins", "de"),
        ("http://ex.org/kind", "http://ex.org/Thing", None),
    }


def test_multi_source_mapping_emits_from_every_source():
    """sources: [a, b] must produce the mapping's triples from BOTH
    sources — src[0]-only silently dropped half the graph."""
    doc = load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  a: {table: a}
  b: {table: b}
mappings:
  M:
    sources: [a, b]
    s: ex:$(id)
    po:
      - [ex:name, $(name)]
""")
    assert sorted(m.source for m in doc.maps) == ["a", "b"]
    assert doc.maps[0].po == doc.maps[1].po


def test_expanded_object_form_value_language():
    """{value: $(col), language: en} is YARRRML's expanded object form;
    it used to be stringified into a Python-dict-repr literal."""
    doc = load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  t: {table: t}
mappings:
  M:
    sources: t
    s: ex:$(id)
    po:
      - p: ex:name
        o:
          value: $(title)
          language: en
""")
    (po,) = doc.maps[0].po
    assert po[0] == "http://ex.org/name"
    assert po[1] == "title"          # column reference, not a repr string
    assert po[2] == "en" and po[3] is None


def test_undeclared_prefix_in_object_template_raises():
    import pytest

    with pytest.raises(ValueError, match="undeclared prefix"):
        load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  t: {table: t}
mappings:
  M:
    sources: t
    s: ex:$(id)
    po:
      - [ex:nation, x:$(nk)]
""")


def test_null_key_columns_emit_no_triples(spark):
    """R2RML: a NULL column in the SUBJECT template produces no triple
    (the object-only filter let (NULL, type, X) rows through)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.r2rml import (
        materialize,
    )

    doc = load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  t: {table: t}
mappings:
  M:
    sources: t
    s: ex:$(id)
    po:
      - [a, ex:Thing]
      - [ex:name, $(name)]
""")
    t = spark.createDataFrame(
        [("1", "x"), (None, "y"), ("3", None)], "id string, name string")
    rows = {(r.subject, r.predicate, r.object)
            for r in materialize({"t": t}, doc.maps).collect()}
    assert rows == {
        ("http://ex.org/1", RDF_TYPE, "http://ex.org/Thing"),
        ("http://ex.org/1", "http://ex.org/name", "x"),
        ("http://ex.org/3", RDF_TYPE, "http://ex.org/Thing"),
    }


def test_multi_source_referenced_mapping_joins_union(spark):
    """Round 11: a referencing object map whose PARENT mapping has
    multiple sources joins against the UNION of the parent's
    per-source frames (previously NotImplementedError)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.r2rml import (
        materialize,
    )

    doc = load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  child: {table: child}
  p1: {table: p1}
  p2: {table: p2}
mappings:
  Child:
    sources: child
    s: ex:$(cid)
    po:
      - p: ex:owner
        o:
        - mapping: Parent
          condition:
            function: equal
            parameters:
              - [str1, $(pref)]
              - [str2, $(pid)]
  Parent:
    sources: [p1, p2]
    s: ex:$(pid)
    po:
      - [ex:kind, ex:Parent]
""")
    ref = next(po[1] for m in doc.maps if m.source == "child"
               for po in m.po if isinstance(po[1], RefObjectMap))
    assert ref.parent_table == ("p1", "p2")

    child = spark.createDataFrame(
        [("c1", "a"), ("c2", "b"), ("c3", "zz")], "cid string, pref string")
    p1 = spark.createDataFrame([("a",)], "pid string")
    p2 = spark.createDataFrame([("b",)], "pid string")
    rows = {(r.subject, r.predicate, r.object)
            for r in materialize(
                {"child": child, "p1": p1, "p2": p2}, doc.maps).collect()
            if r.predicate == "http://ex.org/owner"}
    # c1 resolves through p1, c2 through p2, c3 matches neither source
    assert rows == {
        ("http://ex.org/c1", "http://ex.org/owner", "http://ex.org/a"),
        ("http://ex.org/c2", "http://ex.org/owner", "http://ex.org/b"),
    }


def test_join_condition_functions(spark):
    """Round 11: non-`equal` condition functions — notEqual, string
    contains, case-insensitive equal — execute as the right join
    predicates (previously NotImplementedError in strict mode)."""
    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.r2rml import (
        materialize,
    )

    def build(fn):
        return load_yarrrml(f"""
prefixes:
  ex: "http://ex.org/"
sources:
  child: {{table: child}}
  parent: {{table: parent}}
mappings:
  Child:
    sources: child
    s: ex:$(cid)
    po:
      - p: ex:rel
        o:
        - mapping: Parent
          condition:
            function: {fn}
            parameters:
              - [str1, $(ckey)]
              - [str2, $(pkey)]
  Parent:
    sources: parent
    s: ex:$(pid)
    po:
      - [ex:kind, ex:Parent]
""")

    child = spark.createDataFrame(
        [("c1", "Alpha"), ("c2", "beta-Alpha")], "cid string, ckey string")
    parent = spark.createDataFrame(
        [("1", "alpha"), ("2", "Alpha"), ("3", "beta")],
        "pid string, pkey string")
    tables = {"child": child, "parent": parent}

    def rels(fn):
        doc = build(fn)
        return {(r.subject, r.object)
                for r in materialize(tables, doc.maps)
                .filter("predicate = 'http://ex.org/rel'").collect()}

    # exact equal: only c1/Alpha ↔ p2/Alpha
    assert rels("equal") == {("http://ex.org/c1", "http://ex.org/2")}
    # case-insensitive: c1 matches both alpha spellings
    assert rels("idlab-fn:equal_ignoring_case") == {
        ("http://ex.org/c1", "http://ex.org/1"),
        ("http://ex.org/c1", "http://ex.org/2"),
    }
    # notEqual: everything except the exact-equal pair
    assert rels("notEqual") == {
        ("http://ex.org/c1", "http://ex.org/1"),
        ("http://ex.org/c1", "http://ex.org/3"),
        ("http://ex.org/c2", "http://ex.org/1"),
        ("http://ex.org/c2", "http://ex.org/2"),
        ("http://ex.org/c2", "http://ex.org/3"),
    }
    # contains: child key contains parent key as a substring
    assert rels("grel:string_contains") == {
        ("http://ex.org/c1", "http://ex.org/2"),
        ("http://ex.org/c2", "http://ex.org/2"),
        ("http://ex.org/c2", "http://ex.org/3"),
    }


def test_unknown_join_condition_function_still_raises():
    import pytest

    with pytest.raises(NotImplementedError, match="reverseDns"):
        load_yarrrml("""
prefixes:
  ex: "http://ex.org/"
sources:
  child: {table: child}
  parent: {table: parent}
mappings:
  Child:
    sources: child
    s: ex:$(cid)
    po:
      - p: ex:rel
        o:
        - mapping: Parent
          condition:
            function: grel:reverseDns
            parameters:
              - [str1, $(ckey)]
              - [str2, $(pkey)]
  Parent:
    sources: parent
    s: ex:$(pid)
    po:
      - [ex:kind, ex:Parent]
""")


def test_scalar_string_object_is_one_triple():
    """Round-13 review: a scalar string in the dict po form used to be
    iterated CHARACTER-BY-CHARACTER (one garbage constant triple per
    char); it must wrap to a single column-valued pair."""
    doc = load_yarrrml("""
prefixes: {ex: "http://ex/"}
sources: {t: {table: t}}
mappings:
  m:
    sources: t
    s: ex:$(id)
    po:
      - p: ex:name
        o: $(title)
""")
    (tm,) = doc.maps
    assert len(tm.po) == 1 and tm.po[0][1] == "title"


def test_malformed_templates_and_lists_refuse_loudly():
    import pytest

    base = """
prefixes: {ex: "http://ex/"}
sources: {t: {table: t}}
mappings:
  m:
    sources: %s
    s: ex:$(id)
    po:
      - %s
"""
    # hyphenated column in a prefixed template: silent constant before
    with pytest.raises(ValueError, match="template syntax"):
        load_yarrrml(base % ("t", "[ex:name, ex:$(book-id)]"))
    with pytest.raises(ValueError, match="template syntax"):
        load_yarrrml(base % ("t", "[ex:name, $(book-id)]"))
    # list-valued shorthand object / predicate: was Python list repr
    with pytest.raises(NotImplementedError, match="list-valued"):
        load_yarrrml(base % ("t", '["ex:name", ["$(a)", "$(b)"]]'))
    with pytest.raises(NotImplementedError, match="list-valued"):
        load_yarrrml(base % ("t", "{p: [ex:a, ex:b], o: $(x)}"))
    # empty sources: the mapping used to vanish silently
    with pytest.raises(ValueError, match="empty sources"):
        load_yarrrml(base % ("[]", "[ex:name, $(x)]"))
    # undeclared parent mapping: bare KeyError before
    with pytest.raises(ValueError, match="undeclared mapping"):
        load_yarrrml(base % (
            "t",
            "{p: ex:rel, o: [{mapping: Nope, condition: {function: equal,"
            " parameters: [[str1, $(a)], [str2, $(b)]]}}]}"))


def test_rtemplate_scan_bounded_and_comment_aware(tmp_path):
    """Round-13 review: (a) a template-less function must not silently
    extract a LATER function's paste0; (b) quotes/parens inside R
    comments must not corrupt the balance tracking."""
    import pytest

    from remove_na_lgbtiq_queer_knowledge_graph_spark.plans.rtemplate import (
        load_r_query_template,
    )

    src = tmp_path / "q.R"
    src.write_text(
        "query_a <- function(x) sprintf('no template %s', x)\n"
        "query_b <- function(y) paste0('SELECT ', y)\n")
    with pytest.raises(ValueError, match="no paste0"):
        load_r_query_template(str(src), "query_a")
    assert load_r_query_template(str(src), "query_b") == "SELECT {y}"

    src2 = tmp_path / "q2.R"
    src2.write_text(
        "q <- function(item) paste0(\n"
        "  'SELECT ?s WHERE { ?s ?p ', # user's favourite (really)\n"
        "  item,  # another ( comment\n"
        "  ' }'\n"
        ")\n")
    assert load_r_query_template(str(src2), "q") \
        == "SELECT ?s WHERE {{ ?s ?p {item} }}"

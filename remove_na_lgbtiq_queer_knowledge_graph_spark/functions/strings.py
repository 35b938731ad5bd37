"""Scalar string helpers (reference family F1-F4, F8-F9 in SURVEY.md §2.9).

Everything here is a *column expression* built from JVM-side builtins so
it stays inside whole-stage codegen — the reference's vectorized R string
helpers (``kabrutils::clean_string``, ``extract_id``, ``remove_lang``,
OpenRefine fingerprint at
``data-gathering/analysis/open-refine-fingerprint.R:15-23``) map 1:1.

Only transliteration (stringi ``de-ASCII; Latin-ASCII``) needs more than
builtins; we cover the reference's actual character inventory (German
umlauts + common Latin diacritics) with ``translate``/``regexp_replace``
chains, which keeps it codegen'd instead of dropping to a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# German-specific first (ä→ae per de-ASCII), then generic Latin-ASCII.
_DE_MAP = [("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("Ä", "Ae"), ("Ö", "Oe"), ("Ü", "Ue"), ("ß", "ss")]
# Built from explicit (accented, ascii) pairs — two parallel string
# literals once drifted one char apart mid-table and silently mapped
# ù→o, ý→u, and every uppercase accent to the wrong letter.
_LATIN_MAP = [
    ("àáâãåā", "a"), ("ç", "c"), ("èéêëē", "e"), ("ìíîïī", "i"),
    ("ñ", "n"), ("òóôõøō", "o"), ("ùúûū", "u"), ("ýÿ", "y"),
]
_LATIN_MAP += [(srcs.upper(), dst.upper()) for srcs, dst in _LATIN_MAP]
_SRC = "".join(srcs for srcs, _ in _LATIN_MAP)
_DST = "".join(dst * len(srcs) for srcs, dst in _LATIN_MAP)
assert len(_SRC) == len(_DST)


def lower_simple(col: Column) -> Column:
    """Cross-engine-deterministic lowercase: Unicode SIMPLE (1:1
    codepoint) mapping on both engines.

    Java's ``toLowerCase`` (behind ``F.lower``) applies the FULL
    mappings from SpecialCasing.txt — contextual final sigma
    (``'ΟΔΟΣ'`` → ``'οδος'``) and the dotted capital I expansion
    (``'İ'`` → ``'i' + U+0307``, one char becomes two) — while
    DuckDB's utf8proc ``lower`` maps 1:1 (``'οδοσ'``, ``'i'``;
    verified live, round-13 review).  Any md5/shingle/fingerprint
    built on ``F.lower`` therefore hash-diverges from its oracle on
    text containing Σ or İ — routine in a multilingual crawl corpus,
    invisible on ASCII fixtures (the Java-vs-RE2 ``\\x0b`` class).
    Pre-translating exactly those two codepoints (the only lowercase
    FULL-mapping entries in SpecialCasing.txt; locale rules don't
    apply in root locale) makes Java's remaining 1:1 path equal
    utf8proc's.  Parity pinned in tests/test_llm_ops.py."""
    return F.lower(F.translate(col, "Σİ", "σi"))


def transliterate(col: Column) -> Column:
    """de-ASCII; Latin-ASCII transliteration as codegen'd expressions.

    Reference: ``stri_trans_general(x, "de-ASCII; Latin-ASCII")``
    (``open-refine-fingerprint.R:22``, ``book-authors-viaf.R:21``).
    """
    out = col
    for src, dst in _DE_MAP:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return F.translate(out, _SRC, _DST)


def clean_string(col: Column) -> Column:
    """Normalize a name: trim, collapse whitespace, lower, transliterate.

    Reference: ``kabrutils::clean_string`` used at
    ``entity-resolution/entities/01-within-entities.R:25``.
    """
    out = lower_simple(F.trim(col))
    out = transliterate(out)
    return F.regexp_replace(out, r"[ \t\n\x0b\f\r]+", " ")


def fingerprint(col: Column) -> Column:
    """OpenRefine key-collision fingerprint.

    trim → lower → strip punctuation/digits → transliterate → split on
    whitespace → unique → sort → rejoin.  Reference:
    ``open-refine-fingerprint.R:15-23``.
    """
    out = lower_simple(F.trim(col))
    out = transliterate(out)
    out = F.regexp_replace(out, r"[^\p{L} ]", "")
    toks = F.array_sort(F.array_distinct(F.split(F.trim(F.regexp_replace(out, r"[ \t\n\x0b\f\r]+", " ")), " ")))
    return F.array_join(F.filter(toks, lambda t: t != F.lit("")), " ")


def remove_lang(col: Column) -> Column:
    """Strip a SPARQL language tag: ``"Name"@de`` → ``Name``.

    Reference: ``remove_lang`` at
    ``data-publishing/wikidata/entities/create-persons.R:23``.
    """
    return F.regexp_replace(F.regexp_replace(col, r"@[a-zA-Z-]+$", ""), r'^"|"$', "")


def extract_id(col: Column, pattern: str = r"[QP][0-9]+") -> Column:
    """Extract a Wikibase Q/P id from an IRI.

    Reference: ``extract_id`` used at ``analysis/network/01-get-data.R:22``.
    """
    return F.regexp_extract(col, f"({pattern})", 1)


def strip_markers(col: Column, markers: list[str]) -> Column:
    """Remove org-form markers ("verlag", "gmbh", …) anywhere in a name.

    Reference: marker strip at
    ``entity-resolution/entities/03-within-entities-v2-incl-chronik.R:32-34``
    with the blocklist in ``static/string-mapping.yml:82-96``.
    """
    if not markers:
        return col
    import re

    # escape each marker (the reference blocklist has dotted forms like
    # "e.v." — unescaped, '.' matches anything and '(' would be a regex
    # error) and bound with lookarounds rather than \b: for a marker
    # ending in '.', \b would demand a word char AFTER the dot.  For
    # plain-word markers the lookarounds are exactly \b.
    alternation = "|".join(re.escape(m) for m in markers)
    out = F.regexp_replace(col, rf"(?i)(?<!\w)({alternation})(?!\w)", "")
    return F.trim(F.regexp_replace(out, r"[ \t\n\x0b\f\r]+", " "))


def clean_letters(col: Column) -> Column:
    """The char-gram cleaning step (lowercase, letters only) — split
    out of :func:`char_ngrams` so callers can BIND it once in a
    projection before gramming (r13 optimization): an expression
    referenced inside a higher-order-function lambda is copied into
    every element evaluation, so the inline form re-ran this
    regexp chain once per GRAM (measured 0.42 s → 0.23 s median for
    the part-name gram explode at sf0.1 after pre-binding)."""
    return F.regexp_replace(lower_simple(col), r"[^a-z]", "")


def char_ngrams_clean(s: Column, n: int = 2) -> Column:
    """Char n-gram array over an ALREADY-CLEANED column (a bound
    reference to :func:`clean_letters` output — pass ``F.col(...)``,
    not the cleaning expression itself, or the per-element re-eval
    this split exists to avoid comes right back)."""
    # sequence(1, len-n+1) → substr(s, i, n); empty array when too short
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(col: Column, n: int = 2) -> Column:
    """Character n-gram array (letters only), the reference's shingling.

    Reference: ``tokens(what="character") %>% tokens_keep("[A-Za-z]") %>%
    tokens_ngrams(n=2)`` (``01-within-entities.R:40-44``).  Expressed with
    higher-order functions so it stays JVM-side: strip non-letters, then
    slide a window of ``n`` over the char sequence.

    NOTE (r13): the cleaning chain embedded here re-evaluates once per
    gram inside the transform lambda; hot paths should project
    :func:`clean_letters` into a column first and call
    :func:`char_ngrams_clean` on the bound reference.
    """
    return char_ngrams_clean(clean_letters(col), n)


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram (shingle) array over whitespace-tokenized text."""
    toks = F.split(F.trim(F.regexp_replace(lower_simple(col), r"[ \t\n\x0b\f\r]+", " ")), " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def isbn_parts(col: Column) -> tuple[Column, Column, Column, Column]:
    """ISBN normalization + checksum validation + ISBN-13 canonical form
    (the identifier hygiene behind `data-linking/check-isbn-in-lobid.R`
    — the reference trusts its `isbn` column; at corpus scale you
    validate before spending API calls on it).

    Returns ``(clean, format, valid, isbn13)`` columns: hyphen/space
    stripped uppercase form; 'isbn10' / 'isbn13' / 'invalid'; checksum
    verdict (ISBN-10 weighted mod 11 with X=10, ISBN-13 alternating
    1/3 mod 10); and the canonical ISBN-13 (978-prefixed re-checksummed
    for valid 10s, the cleaned string for valid 13s, NULL otherwise).
    All pure codegen expressions — no UDF.
    """
    clean = F.regexp_replace(F.upper(col), r"[^0-9X]", "")
    digit = lambda i: F.substring(clean, i, 1).cast("int")  # noqa: E731
    is13_shape = (F.length(clean) == 13) & clean.rlike(r"^[0-9]{13}$")
    is10_shape = (F.length(clean) == 10) & clean.rlike(r"^[0-9]{9}[0-9X]$")

    sum13 = F.aggregate(
        F.sequence(F.lit(1), F.lit(12)),
        F.lit(0),
        lambda acc, i: acc + F.substring(clean, i, 1).cast("int")
        * F.when(i % 2 == 1, 1).otherwise(3),
    )
    valid13 = is13_shape & (F.pmod(10 - F.pmod(sum13, F.lit(10)), F.lit(10))
                            == digit(13))

    last10 = F.when(F.substring(clean, 10, 1) == "X", F.lit(10)) \
              .otherwise(F.substring(clean, 10, 1).cast("int"))
    sum10 = F.aggregate(
        F.sequence(F.lit(1), F.lit(9)),
        F.lit(0),
        lambda acc, i: acc + F.substring(clean, i, 1).cast("int") * (11 - i),
    ) + last10
    valid10 = is10_shape & (F.pmod(sum10, F.lit(11)) == 0)

    core12 = F.concat(F.lit("978"), F.substring(clean, 1, 9))
    sum_new = F.aggregate(
        F.sequence(F.lit(1), F.lit(12)),
        F.lit(0),
        lambda acc, i: acc + F.substring(core12, i, 1).cast("int")
        * F.when(i % 2 == 1, 1).otherwise(3),
    )
    isbn13_from10 = F.concat(
        core12,
        F.pmod(10 - F.pmod(sum_new, F.lit(10)), F.lit(10)).cast("string"),
    )

    fmt = (F.when(valid13, "isbn13").when(valid10, "isbn10")
           .otherwise("invalid"))
    valid = valid13 | valid10
    isbn13 = (F.when(valid13, clean).when(valid10, isbn13_from10)
              .otherwise(F.lit(None).cast("string")))
    return clean, fmt, valid, isbn13


# Tracking parameters every canonicalizer strips (the Common-Crawl /
# trafilatura convention: utm_* campaign tags plus the Facebook/Google
# click ids and the bare "ref" referrer).  Kept as ONE pattern so the
# Spark kernel and the DuckDB oracle mirror can share it verbatim.
# Case-insensitive and value-optional: recrawl variants carry
# "UTM_SOURCE=x" and bare valueless "?fbclid" — both must collide with
# the clean URL (review finding; the first version required lowercase
# and a literal '=').
TRACKING_PARAM_RE = r"(?i)^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonical_url(col: Column) -> Column:
    """Canonical form of an http(s) URL — the key a 100 TB crawl
    pipeline dedupes on BEFORE any content hashing (URL-level dedupe
    removes the bulk of recrawl duplicates for the cost of a string
    kernel; cf. the CCNet/RefinedWeb preprocessing stacks).

    Steps (RFC 3986 §6 normalization subset, ASCII URLs):

    - scheme and host lowercase;
    - default port stripped (``:443`` for https, ``:80`` for http —
      non-default ports are significant and kept);
    - fragment dropped (never sent to the server);
    - tracking query params dropped (:data:`TRACKING_PARAM_RE`),
      the rest sorted bytewise and re-joined (param order is
      almost-always insignificant; sorting makes ``?a=1&id=2`` and
      ``?id=2&a=1`` collide);
    - trailing slashes stripped from a non-root path; an empty path
      becomes ``/``.

    Userinfo (``user:pw@host``) keeps its case — RFC 3986 §6.2.2.1
    case-normalizes only scheme and host; lowercasing a credential
    would both merge distinct resources and corrupt the credential for
    any consumer that reuses the canonical URL (review finding).

    Pure column expression — regexp/split/array_sort/filter all stay
    inside whole-stage codegen; zero UDFs, zero shuffles.  NULL in →
    NULL out, and a string with no ``scheme://`` prefix (relative or
    malformed URL) also yields NULL: ``regexp_extract`` returns ``''``
    on no match, so without the guard every scheme-less input would
    collapse to the shared degenerate key ``:///…`` and keep-first
    dedup would silently merge unrelated documents (review finding).
    """
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    userinfo = F.regexp_extract(auth, r"^([^@]*@)", 1)  # case-SENSITIVE
    hostport = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    host = F.when(
        ((scheme == "https") & hostport.endswith(":443"))
        | ((scheme == "http") & hostport.endswith(":80")),
        F.regexp_replace(hostport, r":[0-9]+$", ""),
    ).otherwise(hostport)
    raw_path = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    # anchored BEFORE the fragment: a '?' inside '#/view?tab=1' is part
    # of the fragment, not a query (review finding — the unanchored
    # r"\?([^#]*)" parsed SPA fragment-queries as real queries)
    qs = F.regexp_extract(col, r"^[^#]*\?([^#]*)", 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.array_join(F.array_sort(kept), "&")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme, F.lit("://"), userinfo, host, path,
            F.when(query == "", F.lit(""))
             .otherwise(F.concat(F.lit("?"), query)),
        ))

"""Extract SPARQL query templates from the reference's R query-builder
functions.

The reference Shiny apps build their SPARQL text at runtime by string
concatenation (``apps/companions/queries.R:3`` ``query_companions <-
function(fg_item) paste0('...', fg_item, '...')``;
``apps/compare-factgrid-wikidata/queries.R:5`` ``query_items``), with
function parameters spliced between quoted chunks.  This module reads
those R sources and rebuilds the same template: quoted chunks become
literal text, spliced identifiers become ``{name}`` placeholders, and
:func:`render` substitutes parameter values exactly like R's ``paste0``
— so the engine runs the app's *actual* query text, loaded from the
reference file at call time, parameterized the same way the app
parameterizes it.

Only the tiny R subset those files use is understood: a ``<- function``
assignment whose body is a single ``paste0(...)`` call over string
literals and bare parameter names.  Anything else raises, loudly.
"""

from __future__ import annotations


def _find_paste0(src: str, func_name: str) -> str:
    """Return the argument text of the ``paste0(...)`` call inside
    ``func_name <- function(...)``, parens balanced, quote- and
    escape-aware.  Anchors on the ASSIGNMENT (``name <- function``),
    not the first substring occurrence — a comment mentioning the name
    or a longer name sharing the prefix must not redirect extraction
    to a different function's body."""
    import re

    m = re.search(rf"(?<![\w.]){re.escape(func_name)}\s*<-\s*function\b",
                  src)
    if not m:
        raise ValueError(
            f"{func_name!r} <- function not found in R source")
    # bound the scan at the NEXT top-level function assignment: without
    # the bound, a template-less body silently extracted a LATER
    # function's paste0 (round-13 review — violates the fail-loud
    # contract)
    nxt = re.search(r"(?<![\w.])[\w.]+\s*<-\s*function\b",
                    src[m.end():])
    limit = m.end() + nxt.start() if nxt else len(src)
    start = src.find("paste0(", m.end(), limit)
    if start < 0:
        raise ValueError(f"no paste0( call in the body of {func_name!r}")
    i = start + len("paste0(")
    depth = 1
    quote: str | None = None
    out = []
    while i < len(src):
        ch = src[i]
        if quote:
            if ch == "\\" and i + 1 < len(src):
                # R escape inside a string — keep both chars, never
                # let \' or \" end the quote tracking
                out.append(ch)
                i += 1
                ch = src[i]
            elif ch == quote:
                quote = None
        elif ch == "#":
            # R comment to end-of-line: a quote or paren inside it must
            # not enter the balance tracking (round-13 review), and the
            # comment text must not leak into the template args
            j = src.find("\n", i)
            i = len(src) if j < 0 else j
            continue
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return "".join(out)
        out.append(ch)
        i += 1
    raise ValueError(f"unbalanced parens in paste0 of {func_name!r}")


def load_r_query_template(path: str, func_name: str) -> str:
    """Rebuild the SPARQL template produced by an R ``paste0`` query
    builder as a Python format string with ``{param}`` placeholders."""
    with open(path) as f:
        src = f.read()
    args = _find_paste0(src, func_name)
    parts: list[str] = []
    i, n = 0, len(args)
    while i < n:
        ch = args[i]
        if ch in " \t\r\n,":
            i += 1
            continue
        if ch in "'\"":
            j = i + 1
            while j < n and args[j] != ch:
                if args[j] == "\\":  # escaped char never closes the string
                    j += 1
                j += 1
            if j >= n:
                raise ValueError("unterminated string in paste0 args")
            chunk = args[i + 1:j]
            # decode R escapes the way R's parser would — a chunk with
            # \n must contribute a NEWLINE to the query text, and \'/\"
            # the bare quote, not two literal characters
            chunk = (chunk.replace("\\\\", "\x00")
                     .replace("\\n", "\n").replace("\\t", "\t")
                     .replace("\\r", "\r")
                     .replace("\\'", "'").replace('\\"', '"'))
            if "\\" in chunk:
                # \x.., \u.., \0 etc: passing the two characters
                # through silently diverges from R's parser — refuse
                raise ValueError(
                    f"unsupported R escape in paste0 string: {chunk!r}")
            chunk = chunk.replace("\x00", "\\")
            # { } escaped so the chunk survives str.format untouched
            parts.append(chunk.replace("{", "{{").replace("}", "}}"))
            i = j + 1
            continue
        # bare identifier → placeholder
        j = i
        while j < n and (args[j].isalnum() or args[j] in "._"):
            j += 1
        name = args[i:j]
        if not name.isidentifier():
            raise ValueError(f"unsupported paste0 argument at {args[i:i+30]!r}")
        parts.append("{" + name + "}")
        i = j
    return "".join(parts)


def render(template: str, **params: str) -> str:
    """``paste0`` semantics: substitute every placeholder; a missing
    parameter is an error (R would splice NULL and silently corrupt the
    query — fail instead)."""
    try:
        return template.format(**params)
    except KeyError as e:
        raise ValueError(f"missing template parameter {e.args[0]!r}") from None

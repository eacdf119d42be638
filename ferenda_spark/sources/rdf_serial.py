"""RDF serialization: a distributed N-Triples writer/reader and a
driver-side Turtle-subset reader for tiny ontology (TBox) files.

N-Triples is the reference's bulk interchange format — its
triplestore dumps and loads graphs as ``format="nt"`` throughout
(``triplestore.py:127`` get_serialized, ``:1855`` add_serialized_file
on relate-all, ``:1868`` get_serialized_file dumps, and
``documentrepository.py:1948`` writes distilled dumps with
``g.serialize(format="nt")``).  The format is strictly line-based,
which makes it the rare RDF syntax that is PERFECT for Spark: one
row per triple, serialization and parsing are pure column
expressions (whole-stage codegen, zero Python in the hot path), a
100 TB dump splits on line boundaries, and text-source compression
(.gz per file) composes for free.

Turtle is what the reference's shipped vocabularies use
(``res/vocab/*.ttl``, loaded at ``documentrepository.py:450-469``).
Those files are TBoxes — tiny by definition — so the reader here is
deliberately a DRIVER-side parser returning a local relation (the
same asymmetry as operators/infer.py's ClosedSchema): prefixes,
``;``/``,`` continuations, the ``a`` keyword, plain and
triple-quoted literals with ``@lang`` / ``^^type``.  Out-of-subset
constructs (blank-node property lists, collections) raise loudly
rather than mis-parse.

Escape contract (both directions): ``\\`` ``\"`` ``\n`` ``\r``
``\t`` — the escapes the writer emits.  The parser flags any OTHER
backslash escape (``\\uXXXX`` etc.) as an error row instead of
silently passing a wrong string through.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# the store vocabulary's namespaces (the reference's shipped-vocab
# set) — what the export/load tools expand and contract against
STD_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "dcterms": "http://purl.org/dc/terms/",
    "bibo": "http://purl.org/ontology/bibo/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "prov": "http://www.w3.org/ns/prov#",
}

# ---------------------------------------------------------------- CURIEs

def expand_curies(c: Column, prefixes: dict[str, str]) -> Column:
    """CURIE → IRI through a prefix map (longest prefix wins); values
    that match no prefix pass through unchanged."""
    out = c
    for pfx, iri in sorted(prefixes.items(), key=lambda kv: -len(kv[0])):
        out = F.when(c.startswith(pfx + ":"),
                     F.concat(F.lit(iri),
                              F.substring(c, len(pfx) + 2, 2**30))
                     ).otherwise(out)
    return out


def contract_iris(c: Column, prefixes: dict[str, str]) -> Column:
    """IRI → CURIE, the inverse of :func:`expand_curies` (longest
    namespace wins); unmatched IRIs pass through unchanged.

    The when-chain is built shortest-namespace-FIRST: each iteration
    wraps the previous expression, so the last (longest) namespace
    becomes the outermost, first-evaluated branch — iterating
    longest-first would invert the precedence and a namespace that
    prefixes another (e.g. a --base-iri above dcterms) would swallow
    its sub-namespaces' terms."""
    out = c
    for pfx, iri in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        out = F.when(c.startswith(iri),
                     F.concat(F.lit(pfx + ":"),
                              F.substring(c, len(iri) + 1, 2**30))
                     ).otherwise(out)
    return out


# ------------------------------------------------------------ N-Triples

# literal escapes the writer emits and the parser accepts; \x00 is the
# unescape sentinel (control chars are not legal unescaped in
# N-Triples, so it cannot occur in valid input)
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t")]
_SENTINEL = "\x00"


def _escape_lit(c: Column) -> Column:
    for raw, esc in _ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def _unescape_lit(c: Column) -> Column:
    c = F.replace(c, F.lit("\\\\"), F.lit(_SENTINEL))
    for raw, esc in _ESCAPES[1:]:
        c = F.replace(c, F.lit(esc), F.lit(raw))
    return F.replace(c, F.lit(_SENTINEL), F.lit("\\"))


_RESOURCE_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s\"]+$"


def format_ntriples(triples: DataFrame,
                    prefixes: dict[str, str] | None = None,
                    graph_col: str | None = None) -> DataFrame:
    """One N-Triples ``line`` per input triple.

    Input columns: ``subj``, ``pred``, ``obj``, plus (optionally)
    ``obj_is_literal`` / ``obj_lang`` / ``obj_datatype`` — the
    pipeline's triple shape (operators/graph.py:513).  Without
    ``obj_is_literal`` the writer falls back to a documented
    heuristic: a whitespace-free ``scheme:rest`` object is a
    resource, anything else a literal.  ``prefixes`` expands CURIE
    terms to IRIs first (the store convention is CURIEs; N-Triples
    requires absolute IRIs).  ``_:`` subjects/objects stay blank
    nodes.  Pure column expressions end-to-end.
    """
    cols = set(triples.columns)
    subj, pred = F.col("subj"), F.col("pred")
    obj = obj_res = F.col("obj")
    if prefixes:
        subj = expand_curies(subj, prefixes)
        pred = expand_curies(pred, prefixes)
        # only RESOURCE objects expand — a literal that happens to
        # start with "dcterms:" must stay verbatim
        obj_res = expand_curies(obj_res, prefixes)
    if "obj_is_literal" in cols:
        is_lit = F.coalesce(F.col("obj_is_literal"), F.lit(True))
    else:
        # blank nodes fail the scheme:rest test but are resources
        is_lit = ~(F.col("obj").rlike(_RESOURCE_RE)
                   | F.col("obj").startswith("_:"))
    lang = F.col("obj_lang") if "obj_lang" in cols else F.lit(None)
    dtype = F.col("obj_datatype") if "obj_datatype" in cols \
        else F.lit(None)
    if prefixes:
        dtype = expand_curies(dtype, prefixes)

    def term(c: Column) -> Column:
        return F.when(c.startswith("_:"), c) \
            .otherwise(F.concat(F.lit("<"), c, F.lit(">")))

    lit_term = F.concat(
        F.lit('"'), _escape_lit(obj), F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
        .when(dtype.isNotNull(),
              F.concat(F.lit("^^<"), dtype, F.lit(">")))
        .otherwise(F.lit("")))
    obj_term = F.when(is_lit, lit_term).otherwise(term(obj_res))
    if graph_col is not None:
        # N-Quads: the optional graph label before the terminator; a
        # NULL graph row degrades to a plain triple statement (legal
        # N-Quads — the default graph)
        gc = F.col(graph_col)
        if prefixes:
            gc = expand_curies(gc, prefixes)
        tail = F.when(gc.isNotNull(),
                      F.concat(F.lit(" "), term(gc), F.lit(" ."))) \
            .otherwise(F.lit(" ."))
    else:
        tail = F.lit(" .")
    return triples.select(
        F.concat(term(subj), F.lit(" "), term(pred), F.lit(" "),
                 obj_term, tail).alias("line"))


# blank-node labels per the N-Triples grammar (letters, digits,
# underscore, '-', interior '.'; must not END with '.' — the
# statement terminator needs to stay unambiguous)
_NT_BNODE = r"_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?"
_NT_S = rf"(<[^>]*>|{_NT_BNODE})"
_NT_P = r"(<[^>]*>)"
_NT_O = (rf"(<[^>]*>|{_NT_BNODE}|"
         r'"((?:[^"\\]|\\.)*)"'
         r"(?:@([A-Za-z][A-Za-z0-9-]*))?(?:\^\^<([^>]*)>)?)")
_NT_LINE = rf"^[ \t]*{_NT_S}[ \t]+{_NT_P}[ \t]+{_NT_O}[ \t]*\.[ \t\r]*$"
# N-Quads: the same statement with an optional graph label (group 7)
_NQ_LINE = (rf"^[ \t]*{_NT_S}[ \t]+{_NT_P}[ \t]+{_NT_O}"
            rf"(?:[ \t]+(<[^>]*>|{_NT_BNODE}))?[ \t]*\.[ \t\r]*$")


def parse_ntriples(lines: DataFrame,
                   prefixes: dict[str, str] | None = None,
                   line_col: str = "line",
                   quads: bool = False) -> DataFrame:
    """Distributed N-Triples parser: one anchored regex classifies
    each line (column-side; no Python).  Comment / blank lines are
    dropped per spec; anything else that does not parse — including a
    literal carrying an escape outside the writer's contract — comes
    back as an ``error`` row with the offending line, never a task
    failure (the WARC reader's error-row discipline).  ``prefixes``
    contracts parsed IRIs back to the store's CURIE vocabulary.

    Output: (subj, pred, obj, obj_is_literal, obj_lang, obj_datatype,
    error) — plus ``graph`` when ``quads=True``, which accepts the
    N-Quads grammar (optional graph label per statement; a plain
    triple line parses with a NULL graph).  With ``quads=False`` a
    quad line is an error row, per the N-Triples grammar.
    """
    c = F.col(line_col)
    pattern = _NQ_LINE if quads else _NT_LINE
    g = [F.regexp_extract(c, pattern, i)
         for i in range(8 if quads else 7)]
    parsed = (lines
              .filter(~c.rlike(r"^[ \t]*(#|$)"))
              .withColumn("_m", c.rlike(pattern))
              .withColumn("_s", g[1]).withColumn("_p", g[2])
              .withColumn("_o", g[3]).withColumn("_lit", g[4])
              .withColumn("_lang", g[5]).withColumn("_dt", g[6]))
    is_res = F.col("_o").startswith("<") | F.col("_o").startswith("_:")
    raw_lit = F.when(~is_res, F.col("_lit"))
    # escapes outside the contract (e.g. \uXXXX) survive the \\ fold
    # as a lone backslash — flag, don't mangle
    bad_escape = raw_lit.isNotNull() & F.replace(
        raw_lit, F.lit("\\\\"), F.lit(_SENTINEL)).rlike(
            r"\\[^\"nrt]|\\$")

    def strip_iri(col: Column) -> Column:
        out = F.regexp_replace(col, r"^<|>$", "")
        return contract_iris(out, prefixes) if prefixes else out

    obj = F.when(is_res, strip_iri(F.col("_o"))) \
        .otherwise(_unescape_lit(raw_lit))
    err = F.when(~F.col("_m"),
                 F.concat(F.lit("unparseable line: "), c)) \
        .when(bad_escape,
              F.concat(F.lit("unsupported escape: "), c))
    out_cols = [
        F.when(err.isNull(), strip_iri(F.col("_s"))).alias("subj"),
        F.when(err.isNull(), strip_iri(F.col("_p"))).alias("pred"),
        F.when(err.isNull(), obj).alias("obj"),
        F.when(err.isNull(), ~is_res).alias("obj_is_literal"),
        F.when(err.isNull() & (F.col("_lang") != ""),
               F.col("_lang")).alias("obj_lang"),
        F.when(err.isNull() & (F.col("_dt") != ""),
               strip_iri(F.col("_dt"))).alias("obj_datatype"),
    ]
    if quads:
        parsed = parsed.withColumn("_g", g[7])
        out_cols.append(
            F.when(err.isNull() & (F.col("_g") != ""),
                   strip_iri(F.col("_g"))).alias("graph"))
    return parsed.select(*out_cols, err.alias("error"))


def write_ntriples(triples: DataFrame, path: str,
                   prefixes: dict[str, str] | None = None,
                   compression: str | None = None) -> None:
    """Dump a triple table as N-Triples text files — the
    ``get_serialized_file(..., format="nt")`` analog; ``.gz`` via
    ``compression="gzip"`` composes with the splittable-per-file
    text source on read."""
    w = format_ntriples(triples, prefixes).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_ntriples(spark: SparkSession, path: str,
                  prefixes: dict[str, str] | None = None) -> DataFrame:
    """Load an N-Triples dump (possibly thousands of files / .gz
    members) as a parsed triple table with per-line error capture."""
    return parse_ntriples(
        spark.read.text(path).withColumnRenamed("value", "line"),
        prefixes)


def write_nquads(quads: DataFrame, path: str,
                 prefixes: dict[str, str] | None = None,
                 graph_col: str = "graph",
                 compression: str | None = None) -> None:
    """N-Quads dump (RDF 1.1 N-Quads): the triple shape plus a
    ``graph`` column; NULL-graph rows emit plain triple statements
    (the default graph).  The quad-store interchange format the
    reference's context-aware triplestores speak."""
    w = format_ntriples(quads, prefixes,
                        graph_col=graph_col).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_nquads(spark: SparkSession, path: str,
                prefixes: dict[str, str] | None = None) -> DataFrame:
    """Load an N-Quads dump: N-Triples output columns plus ``graph``
    (NULL for default-graph statements), per-line error capture."""
    return parse_ntriples(
        spark.read.text(path).withColumnRenamed("value", "line"),
        prefixes, quads=True)


# ------------------------------------------------------- Turtle (TBox)

class TurtleSubsetError(ValueError):
    """A construct outside the declared Turtle subset."""


def _ttl_tokens(text: str):
    """Tokenizer for the subset: IRIs, CURIEs/keywords, literals
    (plain + triple-quoted, with @lang / ^^type suffixes attached),
    and the ``. ; ,`` punctuation.  Comments run to end of line."""
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n":
            i += 1
        elif ch == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif ch == "<":
            j = text.index(">", i)
            yield ("iri", text[i + 1:j])
            i = j + 1
        elif ch == '"':
            if text.startswith('"""', i):
                j = text.index('"""', i + 3)
                val, i = text[i + 3:j], j + 3
            else:
                j = i + 1
                buf = []
                while text[j] != '"':
                    if text[j] == "\\":
                        buf.append(text[j:j + 2])
                        j += 2
                    else:
                        buf.append(text[j])
                        j += 1
                val, i = "".join(buf), j + 1
                # same sentinel fold as _unescape_lit: '\\\\' first,
                # or an escaped backslash followed by n/r/t/" would
                # decode as a control character
                val = val.replace("\\\\", _SENTINEL)
                for raw, esc in _ESCAPES[1:]:
                    val = val.replace(esc, raw)
                val = val.replace(_SENTINEL, "\\")
            lang = dtype = None
            if text.startswith("@", i):
                j = i + 1
                while j < n and (text[j].isalnum() or text[j] == "-"):
                    j += 1
                lang, i = text[i + 1:j], j
            elif text.startswith("^^", i):
                i += 2
                if text[i] == "<":
                    j = text.index(">", i)
                    dtype, i = text[i + 1:j], j + 1
                else:
                    j = i
                    while j < n and text[j] not in " \t\r\n;,.":
                        j += 1
                    dtype, i = text[i:j], j
            yield ("lit", (val, lang, dtype))
        elif ch in ".;,":
            yield ("punct", ch)
            i += 1
        elif ch in "[]()":
            raise TurtleSubsetError(
                f"blank-node property lists / collections ('{ch}') are "
                "outside the Turtle subset — pre-flatten the ontology "
                "or load it as N-Triples")
        else:
            j = i
            while j < n and text[j] not in " \t\r\n;,<\"#":
                # a trailing statement dot: CURIE local names in the
                # subset never end with '.', so '.'+whitespace/EOF
                # terminates the token
                if text[j] == "." and (j + 1 >= n
                                       or text[j + 1] in " \t\r\n"):
                    break
                j += 1
            yield ("word", text[i:j])
            i = j


def parse_turtle_tbox(text: str) -> list[tuple]:
    """Driver-side Turtle-subset parser for tiny ontology files — the
    shape of the reference's ``res/vocab/*.ttl`` (loaded via rdflib at
    ``documentrepository.py:450-469``): ``@prefix`` directives, then
    ``subj pred obj (, obj)* (; pred obj ...)* .`` statements with the
    ``a`` keyword.  Returns (subj, pred, obj, obj_is_literal,
    obj_lang, obj_datatype) tuples with CURIEs expanded through the
    file's own prefix map.  A TBox is tiny by definition; parsing it
    on the driver and broadcasting the local relation is the same
    asymmetry ClosedSchema exploits (operators/infer.py)."""
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    prefixes: dict[str, str] = {}

    def resolve(tok) -> str:
        kind, val = tok
        if kind == "iri":
            return val
        if kind != "word":
            raise TurtleSubsetError(f"expected a term, got {tok}")
        if val == "a":
            return RDF_TYPE
        pfx, _, local = val.partition(":")
        if pfx in prefixes:
            return prefixes[pfx] + local
        raise TurtleSubsetError(f"unknown prefix in '{val}'")

    toks = list(_ttl_tokens(text))
    out: list[tuple] = []
    i = 0
    while i < len(toks):
        if toks[i] == ("word", "@prefix"):
            pfx = toks[i + 1][1].rstrip(":")
            if toks[i + 2][0] != "iri" or toks[i + 3] != ("punct", "."):
                raise TurtleSubsetError("malformed @prefix directive")
            prefixes[pfx] = toks[i + 2][1]
            i += 4
            continue
        subj = resolve(toks[i])
        i += 1
        while True:
            pred = resolve(toks[i])
            i += 1
            while True:
                kind, val = toks[i]
                if kind == "lit":
                    lit, lang, dtype = val
                    if dtype is not None and ":" in dtype \
                            and not dtype.startswith("http"):
                        p, _, loc = dtype.partition(":")
                        if p in prefixes:
                            dtype = prefixes[p] + loc
                    out.append((subj, pred, lit, True, lang, dtype))
                else:
                    out.append((subj, pred, resolve(toks[i]),
                                False, None, None))
                i += 1
                if toks[i] != ("punct", ","):
                    break
                i += 1
            if toks[i] == ("punct", ";"):
                i += 1
                # a dangling ';' before '.' is legal Turtle
                if toks[i] == ("punct", "."):
                    break
                continue
            break
        if toks[i] != ("punct", "."):
            raise TurtleSubsetError(
                f"expected '.' to end the statement, got {toks[i]}")
        i += 1
    return out


def read_turtle_tbox(spark: SparkSession, path: str) -> DataFrame:
    """Parse a Turtle ontology file into a LOCAL-relation triple
    DataFrame ready for ``close_schema`` / ``rdfs_materialize``."""
    with open(path, encoding="utf-8") as fp:
        rows = parse_turtle_tbox(fp.read())
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, "
              "obj_is_literal boolean, obj_lang string, "
              "obj_datatype string")


# ------------------------------------------------------- skolemization

SKOLEM_SEGMENT = "/.well-known/genid/"


def skolemize(triples: DataFrame,
              base_iri: str = "https://example.org",
              scope: str | None = None) -> DataFrame:
    """Replace blank nodes with skolem IRIs (RDF 1.1 §3.5,
    ``/.well-known/genid/``) — the standard answer to the problem a
    distributed store cannot avoid: a blank node's identity is scoped
    to one serialization, so rows naming ``_:b0`` in two partitions
    (or two dump files) may or may not mean the same node.  Minting
    ``<base/.well-known/genid/b0>`` makes the identity global and
    join-stable while staying recognizably anonymous (deskolemizable).

    A blank label is only unique WITHIN one serialization: two dump
    files each using ``_:b0`` for unrelated nodes must not collide
    after skolemization (RDF 1.1 §3.5 wants globally unique minted
    IRIs).  Pass a per-source ``scope`` (e.g. the dump's file name)
    to namespace the minted IRIs — ``genid/<scope>/b0`` — and pass
    the SAME scope to :func:`deskolemize` to invert.

    Pure column expressions; labels pass through unchanged inside the
    IRI, so skolemize/deskolemize (with matching scopes) are exact
    inverses.  Literal objects are untouched (``obj_is_literal``
    respected when present, the ``_:`` prefix test used otherwise — a
    literal that merely starts with ``_:`` is only at risk in schemas
    without the flag)."""
    prefix = _skolem_prefix(base_iri, scope)

    def sk(c: Column) -> Column:
        return F.when(c.startswith("_:"),
                      F.concat(F.lit(prefix),
                               F.substring(c, 3, 2**30))).otherwise(c)

    cols = set(triples.columns)
    obj_ok = F.col("obj_is_literal") if "obj_is_literal" in cols \
        else F.lit(None).cast("boolean")
    obj = F.when(F.coalesce(obj_ok, F.lit(False)), F.col("obj")) \
        .otherwise(sk(F.col("obj")))
    out = triples.withColumn("subj", sk(F.col("subj"))) \
        .withColumn("obj", obj)
    return out


def deskolemize(triples: DataFrame,
                base_iri: str = "https://example.org",
                scope: str | None = None) -> DataFrame:
    """Exact inverse of :func:`skolemize` (same ``scope``): skolem
    IRIs under the base's ``/.well-known/genid/`` collapse back to
    ``_:`` labels (foreign skolem IRIs — other bases or other scopes —
    are left alone, per spec: they are real IRIs to everyone but
    their minter).  Literal objects are untouched, mirroring
    skolemize: a string literal that merely spells a skolem IRI must
    not be corrupted into a blank-node label."""
    prefix = _skolem_prefix(base_iri, scope)

    def unsk(c: Column) -> Column:
        return F.when(c.startswith(prefix),
                      F.concat(F.lit("_:"),
                               F.substring(c, len(prefix) + 1, 2**30))
                      ).otherwise(c)

    cols = set(triples.columns)
    obj_lit = F.col("obj_is_literal") if "obj_is_literal" in cols \
        else F.lit(None).cast("boolean")
    obj = F.when(F.coalesce(obj_lit, F.lit(False)), F.col("obj")) \
        .otherwise(unsk(F.col("obj")))
    return triples.withColumn("subj", unsk(F.col("subj"))) \
        .withColumn("obj", obj)


def _skolem_prefix(base_iri: str, scope: str | None) -> str:
    prefix = base_iri.rstrip("/") + SKOLEM_SEGMENT
    if scope:
        prefix += scope.strip("/") + "/"
    return prefix

"""Mini-SPARQL: compile the reference's annotation-query subset to
DataFrame plans over the (subj, pred, obj, …) edge table.

The reference constructs per-document annotation graphs by running
SPARQL CONSTRUCT queries against its triplestore
(/root/reference/ferenda/documentrepository.py:1829-1891
``construct_annotations`` loads ``res/sparql/annotations.rq`` and
interpolates ``%(uri)s``; sources ship their own, e.g.
``sources/tech/res/sparql/rfc-annotations.rq``).  This module gives
the Spark engine the same query surface WITHOUT a triplestore server:
a query string in the subset those files use is parsed and compiled
into a DataFrame plan over any edge DataFrame.

Supported subset (everything the reference's .rq files exercise):

* ``PREFIX`` declarations; ``SELECT [DISTINCT] ?v…`` and
  ``CONSTRUCT { template }`` forms.
* Basic graph patterns with variables in any position,
  ``;`` predicate-object list continuation, ``.`` separators.
* ``{ … } UNION { … }`` (n-ary), nested groups, ``OPTIONAL { … }``
  (left join, the describe-with-subdocs.rq / sfs_changes.rq shape),
  ``GRAPH <g> { … }`` (filters a ``graph`` column when the store has
  one; a single-graph store treats the clause as the whole store —
  the keyword_dv.rq context shape).
* Property paths ``pred*`` / ``pred+`` (fixed predicate; var–var
  ``*`` takes its zero-length arm from the graph's node universe).
* ``FILTER(…)`` with ``= != && || !``, ``?x IN (a, b)``,
  ``isUri(?v)``, ``strstarts(str(?v), "…")``, parentheses.
* ``BIND(?x as ?y)``.
* ``%(name)s`` parameter interpolation (the reference's convention,
  documentrepository.py:1861).

Compilation is Spark-first, not an interpreter:

* each triple pattern is ONE scan of the edge DataFrame with every
  constant position pushed down as an equality filter — a
  pred-partitioned/bucketed edge table at 100 TB prunes to the one
  predicate's files before the join;
* a group joins its patterns on shared variables (plain shuffled
  equi-joins Catalyst/AQE can reorder and broadcast);
* UNION arms align by name with nulls for vars an arm doesn't bind
  (SPARQL unbound semantics); CONSTRUCT drops template rows with
  any unbound slot, per the spec;
* ``p*``/``p+`` compile to the bounded iterative closure
  (analytics.transitive_closure — one shuffle per depth over a
  persisted base), seeded from the constant end.

Restriction (documented, not silent): joining two sub-plans on a
variable that one side may bind to NULL (an unbound var flowing out
of a UNION) uses Spark join semantics (null never matches) rather
than SPARQL's "unbound is compatible" — none of the reference's
queries hit this shape (their post-UNION joins are always on vars
every arm binds).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Term:          # IRI <…>, CURIE prefix:local, or literal "…"
    value: str
    is_literal: bool = False


@dataclass
class Pattern:
    s: object
    p: object
    o: object
    path: str | None = None     # None | '*' | '+'


@dataclass
class Filter:
    expr: object


@dataclass
class Bind:
    src: object                  # Var
    dst: str                     # new var name


@dataclass
class Group:
    items: list = field(default_factory=list)


@dataclass
class Union:
    arms: list = field(default_factory=list)


@dataclass
class Optional_:
    group: Group


@dataclass
class GraphScope:
    name: object                 # Term (named graph IRI) or Var
    group: Group


@dataclass
class Query:
    form: str                    # 'select' | 'construct'
    select_vars: list | None
    distinct: bool
    template: list | None        # list[Pattern] for construct
    where: Group


# filter-expression nodes
@dataclass
class BinOp:
    op: str                      # '=' '!=' '&&' '||'
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class InList:
    var: object
    items: list


@dataclass
class IsUri:
    var: object


@dataclass
class StrStarts:
    var: object
    prefix: str


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    (?P<comment>\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<iri><[^>\s]*>)
  | (?P<var>\?[A-Za-z_][\w]*)
  | (?P<name>[A-Za-z_][\w.-]*(?::[\w./#-]*)?)
  | (?P<op>&&|\|\||!=|[{}().;,=!*+])
  | (?P<ws>\s+)
""", re.VERBOSE)

_PARAM_RE = re.compile(r"%\((\w+)\)s")


def _tokenize(text: str) -> list[str]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"sparql: cannot tokenize at …{text[i:i+30]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("comment", "ws"):
            continue
        toks.append(m.group())
    return toks


class _Parser:
    def __init__(self, toks: list[str], prefixes: dict[str, str]):
        self.toks = toks
        self.i = 0
        self.prefixes = prefixes

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("sparql: unexpected end of query")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t.lower() != tok.lower():
            raise ValueError(f"sparql: expected {tok!r}, got {t!r}")

    # -- terms ------------------------------------------------------------
    def term(self):
        t = self.next()
        if t.startswith("?"):
            return Var(t[1:])
        if t.startswith("<"):
            return Term(t[1:-1])
        if t.startswith('"'):
            return Term(t[1:-1].replace('\\"', '"'), is_literal=True)
        if t == "a":                       # rdf:type shorthand
            return Term("rdf:type")
        if not t[0].isalpha() and t[0] != "_":
            # punctuation can never be a term — fail loudly instead of
            # silently mis-parsing a keyword the grammar missed
            raise ValueError(f"sparql: expected a term, got {t!r}")
        return Term(t)                     # CURIE kept compact

    # -- query ------------------------------------------------------------
    def query(self) -> Query:
        while self.peek() and self.peek().lower() == "prefix":
            self.next()
            name = self.next()             # 'dcterms:' parses as one name
            iri = self.next()
            self.prefixes[name.rstrip(":")] = iri.strip("<>")
        head = self.next().lower()
        if head == "select":
            distinct = False
            if self.peek() and self.peek().lower() == "distinct":
                self.next()
                distinct = True
            sel = []
            while self.peek() and self.peek().startswith("?"):
                sel.append(self.next()[1:])
            self.expect("where")
            return Query("select", sel, distinct, None, self.group())
        if head == "construct":
            self.expect("{")
            template = self.pattern_list(stop="}")
            self.expect("}")
            self.expect("where")
            return Query("construct", None, False, template, self.group())
        raise ValueError(f"sparql: unsupported query form {head!r}")

    # -- groups -----------------------------------------------------------
    def group(self) -> Group:
        self.expect("{")
        items: list = []
        while True:
            t = self.peek()
            if t is None:
                raise ValueError("sparql: unterminated group")
            if t == "}":
                self.next()
                return Group(items)
            if t == "{":
                arms = [self.group()]
                while self.peek() and self.peek().lower() == "union":
                    self.next()
                    arms.append(self.group())
                items.append(Union(arms) if len(arms) > 1 else arms[0])
                continue
            low = t.lower()
            if low == "union":
                # pattern_list would return [] without consuming the
                # token and this loop would never advance — fail loudly
                raise ValueError("sparql: UNION without a left-hand "
                                 "group")
            if low == "optional":
                self.next()
                items.append(Optional_(self.group()))
                if self.peek() == ".":
                    self.next()
                continue
            if low == "graph":
                self.next()
                name = self.term()
                items.append(GraphScope(name, self.group()))
                if self.peek() == ".":
                    self.next()
                continue
            if low == "filter":
                self.next()
                self.expect("(")
                items.append(Filter(self.or_expr()))
                self.expect(")")
                if self.peek() == ".":
                    self.next()
                continue
            if low == "bind":
                self.next()
                self.expect("(")
                src = self.term()
                self.expect("as")
                dst = self.next()
                self.expect(")")
                if not dst.startswith("?"):
                    raise ValueError("sparql: BIND target must be a var")
                items.append(Bind(src, dst[1:]))
                if self.peek() == ".":
                    self.next()
                continue
            items.extend(self.pattern_list(stop="}"))

    def pattern_list(self, stop: str) -> list[Pattern]:
        """subject (pred-obj (';' pred-obj)*) '.' — until stop/FILTER/…"""
        out: list[Pattern] = []
        while True:
            t = self.peek()
            if (t is None or t == stop or t == "{"
                    or t.lower() in ("filter", "bind", "union",
                                     "optional", "graph")):
                return out
            subj = self.term()
            while True:
                pred = self.term()
                path = None
                if self.peek() in ("*", "+") and isinstance(pred, Term):
                    path = self.next()
                obj = self.term()
                out.append(Pattern(subj, pred, obj, path))
                t = self.peek()
                if t == ";":
                    self.next()
                    continue
                if t == ".":
                    self.next()
                break

    # -- filter expressions (precedence: ! > =/!=/in > && > ||) -----------
    def or_expr(self):
        e = self.and_expr()
        while self.peek() == "||":
            self.next()
            e = BinOp("||", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.cmp_expr()
        while self.peek() == "&&":
            self.next()
            e = BinOp("&&", e, self.cmp_expr())
        return e

    def cmp_expr(self):
        t = self.peek()
        if t is None:
            raise ValueError("sparql: unexpected end of FILTER "
                             "expression")
        if t == "!":
            self.next()
            return Not(self.cmp_expr())
        if t == "(":
            self.next()
            e = self.or_expr()
            self.expect(")")
            return e
        if t.lower() == "isuri":
            self.next()
            self.expect("(")
            v = self.term()
            self.expect(")")
            return IsUri(v)
        if t.lower() == "strstarts":
            self.next()
            self.expect("(")
            if self.peek().lower() == "str":    # str(?v) coercion
                self.next()
                self.expect("(")
                v = self.term()
                self.expect(")")
            else:
                v = self.term()
            self.expect(",")
            pfx = self.term()
            self.expect(")")
            if not isinstance(pfx, Term):
                raise ValueError("sparql: strstarts prefix must be constant")
            return StrStarts(v, pfx.value)
        left = self.term()
        op = self.peek()
        if op in ("=", "!="):
            self.next()
            return BinOp(op, left, self.term())
        if op and op.lower() == "in":
            self.next()
            self.expect("(")
            items = [self.term()]
            while self.peek() == ",":
                self.next()
                items.append(self.term())
            self.expect(")")
            return InList(left, items)
        raise ValueError(f"sparql: unsupported filter at {op!r}")


def parse_sparql(text: str, params: dict[str, str] | None = None) -> Query:
    """Parse a query string (after ``%(name)s`` interpolation)."""
    if params:
        text = _PARAM_RE.sub(lambda m: str(params[m.group(1)]), text)
    p = _Parser(_tokenize(text), {})
    q = p.query()
    if p.peek() is not None:
        # solution modifiers (ORDER BY/LIMIT/GROUP BY) are outside the
        # subset — dropping them silently would return wrong results
        raise ValueError(f"sparql: unsupported tokens after the WHERE "
                         f"group, starting at {p.peek()!r}")
    return q


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

_META = ("obj_is_literal", "obj_datatype", "obj_lang")


def _lit(term: Term):
    return F.lit(term.value)


class _Plan:
    """A compiled sub-plan: df columns = one per bound var, plus hidden
    ``__lit__v``/``__dt__v``/``__lang__v`` metadata for vars bound in
    object position (so isUri() and CONSTRUCT literal flags work)."""

    def __init__(self, df: DataFrame, vars_: set[str], objvars: set[str]):
        self.df = df
        self.vars = vars_
        self.objvars = objvars      # vars with __lit__/__dt__/__lang__ cols


def _pattern_plan(edges: DataFrame, pat: Pattern, max_depth: int) -> _Plan:
    if pat.path:
        return _path_plan(edges, pat, max_depth)
    df = edges
    vars_: set[str] = set()
    objvars: set[str] = set()
    first_pos: dict[str, str] = {}
    sel = []
    for pos, node in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
        if isinstance(node, Var):
            if node.name in vars_:
                # repeated var within one pattern (?s ?p ?s): equality
                # between this position and the var's first position
                df = df.filter(F.col(pos) == F.col(first_pos[node.name]))
            else:
                sel.append(F.col(pos).alias(node.name))
                vars_.add(node.name)
                first_pos[node.name] = pos
                if pos == "obj":
                    objvars.add(node.name)
                    sel += [F.col("obj_is_literal").alias(f"__lit__{node.name}"),
                            F.col("obj_datatype").alias(f"__dt__{node.name}"),
                            F.col("obj_lang").alias(f"__lang__{node.name}")]
        else:
            df = df.filter(F.col(pos) == _lit(node))
            if pos == "obj":
                df = df.filter(F.col("obj_is_literal") ==
                               F.lit(node.is_literal))
    return _Plan(df.select(*sel) if sel else df.select(), vars_, objvars)


def _path_plan(edges: DataFrame, pat: Pattern, max_depth: int) -> _Plan:
    """``?x pred* C`` / ``C pred* ?x`` / ``?x pred+ C`` …

    Seeded from the closure: descendant —pred→ … —pred→ ancestor.
    ``*`` adds the depth-0 identity row for the constant end.
    """
    from ferenda_spark.operators.analytics import transitive_closure
    if not isinstance(pat.p, Term):
        raise ValueError("sparql: property path needs a constant predicate")
    rel = (edges.filter((F.col("pred") == _lit(pat.p))
                        & ~F.col("obj_is_literal"))
           .select("subj", "obj"))
    clo = transitive_closure(rel, max_depth=max_depth,
                             child_col="subj", parent_col="obj")
    if isinstance(pat.s, Var) and isinstance(pat.o, Term):
        out = clo.filter(F.col("ancestor") == _lit(pat.o)) \
                 .select(F.col("descendant").alias(pat.s.name))
        if pat.path == "*":
            one = rel.sparkSession.createDataFrame(
                [(pat.o.value,)], f"{pat.s.name} string")
            out = out.unionByName(one).distinct()
        return _Plan(out, {pat.s.name}, set())
    if isinstance(pat.s, Term) and isinstance(pat.o, Var):
        out = clo.filter(F.col("descendant") == _lit(pat.s)) \
                 .select(F.col("ancestor").alias(pat.o.name))
        if pat.path == "*":
            one = rel.sparkSession.createDataFrame(
                [(pat.s.value,)], f"{pat.o.name} string")
            out = out.unionByName(one).distinct()
        return _Plan(out, {pat.o.name}, set())
    if isinstance(pat.s, Var) and isinstance(pat.o, Var):
        out = clo.select(F.col("descendant").alias(pat.s.name),
                         F.col("ancestor").alias(pat.o.name))
        if pat.path == "*":
            # zero-length arm: identity over the graph's node universe
            # (per spec; one distinct over the edge table — the join
            # with an already-bound side prunes it in practice)
            nodes = (edges.select(F.col("subj").alias("n"))
                     .unionByName(
                         edges.filter(~F.col("obj_is_literal"))
                         .select(F.col("obj").alias("n")))
                     .distinct())
            out = out.unionByName(
                nodes.select(F.col("n").alias(pat.s.name),
                             F.col("n").alias(pat.o.name))).distinct()
        return _Plan(out, {pat.s.name, pat.o.name}, set())
    # both constant: boolean — empty or unit pattern; keep as filter df
    hit = clo.filter((F.col("descendant") == _lit(pat.s))
                     & (F.col("ancestor") == _lit(pat.o)))
    return _Plan(hit.select(), set(), set())


def _join(a: _Plan, b: _Plan, how: str = "inner") -> _Plan:
    shared = sorted(a.vars & b.vars)
    # drop duplicate hidden metadata from the right side
    dup_meta = [c for v in (b.objvars & a.objvars)
                for c in (f"__lit__{v}", f"__dt__{v}", f"__lang__{v}")]
    bdf = b.df.drop(*dup_meta) if dup_meta else b.df
    if shared:
        df = a.df.join(bdf, shared, how)
    elif how == "left":
        # OPTIONAL sharing no vars: every left row pairs with every
        # optional solution, but left rows survive an EMPTY optional
        df = a.df.join(bdf, F.lit(True), "left")
    else:
        df = a.df.crossJoin(bdf)
    return _Plan(df, a.vars | b.vars, a.objvars | b.objvars)


def _filter_col(expr, plan: _Plan):
    if isinstance(expr, BinOp):
        if expr.op == "&&":
            return _filter_col(expr.left, plan) & _filter_col(expr.right, plan)
        if expr.op == "||":
            return _filter_col(expr.left, plan) | _filter_col(expr.right, plan)
        left = _value_col(expr.left, plan)
        right = _value_col(expr.right, plan)
        return (left == right) if expr.op == "=" else (left != right)
    if isinstance(expr, Not):
        return ~_filter_col(expr.expr, plan)
    if isinstance(expr, InList):
        return _value_col(expr.var, plan).isin(
            *[t.value for t in expr.items])
    if isinstance(expr, IsUri):
        v = expr.var.name
        if v in plan.objvars:
            return ~F.col(f"__lit__{v}")
        return F.lit(v in plan.vars)   # subj/pred bindings are IRIs
    if isinstance(expr, StrStarts):
        return _value_col(expr.var, plan).startswith(expr.prefix)
    raise ValueError(f"sparql: unsupported filter node {expr!r}")


def _value_col(node, plan: _Plan):
    if isinstance(node, Var):
        if node.name not in plan.vars:
            raise ValueError(f"sparql: FILTER references unbound "
                             f"?{node.name}")
        return F.col(node.name)
    return _lit(node)


def _group_plan(edges: DataFrame, grp, max_depth: int) -> _Plan:
    if isinstance(grp, Union):
        arms = [_group_plan(edges, a, max_depth) for a in grp.arms]
        vars_ = set().union(*[a.vars for a in arms])
        objvars = set().union(*[a.objvars for a in arms])
        dfs = []
        for a in arms:
            df = a.df
            for v in sorted(vars_ - a.vars):
                df = df.withColumn(v, F.lit(None).cast("string"))
            for v in sorted(objvars):
                if v not in a.objvars:
                    # a var bound at subject/pred position in this arm
                    # IS an IRI (lit flag False); only a var the arm
                    # does not bind at all gets NULL metadata (unbound
                    # — isUri() then nulls out, filtering the row, per
                    # SPARQL error-on-unbound semantics)
                    lit_flag = (F.lit(False) if v in a.vars
                                else F.lit(None).cast("boolean"))
                    df = (df.withColumn(f"__lit__{v}", lit_flag)
                          .withColumn(f"__dt__{v}",
                                      F.lit(None).cast("string"))
                          .withColumn(f"__lang__{v}",
                                      F.lit(None).cast("string")))
            dfs.append(df)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return _Plan(out, vars_, objvars)
    # Group: join patterns/subgroups left-to-right, then filters, binds
    plan: _Plan | None = None
    filters = []
    binds = []
    for item in grp.items:
        if isinstance(item, Filter):
            filters.append(item)
            continue
        if isinstance(item, Bind):
            binds.append(item)
            continue
        if isinstance(item, Optional_):
            sub = _group_plan(edges, item.group, max_depth)
            if plan is None:
                raise ValueError("sparql: OPTIONAL cannot open a group")
            plan = _join(plan, sub, how="left")
            continue
        if isinstance(item, GraphScope):
            # named-graph scoping: a quad store carries a `graph`
            # column — filter it; a single-graph edge table (this
            # engine's default) treats the clause as the whole store
            scoped = edges
            if isinstance(item.name, Term) and "graph" in edges.columns:
                scoped = edges.filter(F.col("graph") == _lit(item.name))
            sub = _group_plan(scoped, item.group, max_depth)
            plan = sub if plan is None else _join(plan, sub)
            continue
        sub = (_pattern_plan(edges, item, max_depth)
               if isinstance(item, Pattern)
               else _group_plan(edges, item, max_depth))
        plan = sub if plan is None else _join(plan, sub)
    if plan is None:
        raise ValueError("sparql: empty group")
    for b in binds:
        if not isinstance(b.src, Var) or b.src.name not in plan.vars:
            raise ValueError("sparql: BIND source must be a bound var")
        plan.df = plan.df.withColumn(b.dst, F.col(b.src.name))
        plan.vars.add(b.dst)
        if b.src.name in plan.objvars:
            for h in ("__lit__", "__dt__", "__lang__"):
                plan.df = plan.df.withColumn(f"{h}{b.dst}",
                                             F.col(f"{h}{b.src.name}"))
            plan.objvars.add(b.dst)
    for f in filters:
        plan.df = plan.df.filter(_filter_col(f.expr, plan))
    return plan


def _construct_out(plan: _Plan, template: list[Pattern]) -> DataFrame:
    outs = []
    for t in template:
        cols = []
        guards = []
        for pos, node in (("subj", t.s), ("pred", t.p)):
            if isinstance(node, Var):
                cols.append(F.col(node.name).alias(pos))
                guards.append(F.col(node.name).isNotNull())
            else:
                cols.append(_lit(node).alias(pos))
        if isinstance(t.o, Var):
            v = t.o.name
            cols.append(F.col(v).alias("obj"))
            guards.append(F.col(v).isNotNull())
            if v in plan.objvars:
                cols += [F.coalesce(F.col(f"__lit__{v}"), F.lit(False))
                         .alias("obj_is_literal"),
                         F.col(f"__dt__{v}").alias("obj_datatype"),
                         F.col(f"__lang__{v}").alias("obj_lang")]
            else:
                cols += [F.lit(False).alias("obj_is_literal"),
                         F.lit(None).cast("string").alias("obj_datatype"),
                         F.lit(None).cast("string").alias("obj_lang")]
        else:
            cols += [_lit(t.o).alias("obj"),
                     F.lit(t.o.is_literal).alias("obj_is_literal"),
                     F.lit(None).cast("string").alias("obj_datatype"),
                     F.lit(None).cast("string").alias("obj_lang")]
        df = plan.df
        for g in guards:
            df = df.filter(g)
        outs.append(df.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # CONSTRUCT produces a GRAPH — set semantics, one row per triple
    return out.distinct()


def sparql_query(edges: DataFrame, text: str,
                 params: dict[str, str] | None = None,
                 max_depth: int = 8) -> DataFrame:
    """Run a SELECT/CONSTRUCT query (the reference's .rq subset) over
    an edge DataFrame with schema (subj, pred, obj, obj_is_literal,
    obj_datatype, obj_lang).

    SELECT returns one column per projected var; CONSTRUCT returns the
    six-column triple schema (a graph, distinct rows).  ``max_depth``
    bounds property-path closures (section nesting / citation chains
    are shallow; raise for deep hierarchies).
    """
    q = parse_sparql(text, params)
    plan = _group_plan(edges, q.where, max_depth)
    if q.form == "construct":
        return _construct_out(plan, q.template)
    missing = [v for v in q.select_vars if v not in plan.vars]
    if missing:
        raise ValueError(f"sparql: SELECT of unbound vars {missing}")
    out = plan.df.select(*q.select_vars)
    return out.distinct() if q.distinct else out


def construct_annotations(edges: DataFrame, uri: str,
                          max_depth: int = 8) -> DataFrame:
    """The reference's default annotation graph for one document
    (res/sparql/annotations.rq, interpolated with %(uri)s): every
    triple about the document or its parts, plus isReferencedBy
    back-links from citing resources (documentrepository.py:1829-1891).
    """
    return sparql_query(edges, ANNOTATIONS_RQ, {"uri": uri}, max_depth)


#: the reference's res/sparql/annotations.rq shape (same semantics,
#: compact CURIEs matching this engine's edge vocabulary)
ANNOTATIONS_RQ = """
CONSTRUCT
{
   ?part dcterms:isReferencedBy ?s .
   ?s ?p ?o .
}
WHERE
{
  ?s ?p ?o .
  {
    ?s dcterms:isPartOf* <%(uri)s> .
  }
  UNION
  {
    ?part dcterms:isPartOf* <%(uri)s> .
    ?s dcterms:references ?part .
  }
}
"""

#: the reference's sources/tech/res/sparql/rfc-annotations.rq shape
RFC_ANNOTATIONS_RQ = """
CONSTRUCT {?s ?p ?o .
           <%(uri)s> rfc:isObsoletedBy ?obsoleter .
           <%(uri)s> rfc:isUpdatedBy ?updater .
           <%(uri)s> dcterms:isReferencedBy ?referencer .
          }
WHERE
{
   { ?s ?p ?o .
     FILTER(?s = <%(uri)s> && !isUri(?o))
   }
   UNION
   { ?s dcterms:references+ <%(uri)s> ;
        ?p ?o .
     BIND(?s as ?referencer)
     FILTER(?p != dcterms:references || strstarts(str(?o), "%(uri)s"))
   }
   UNION
   { ?s ?x <%(uri)s> ;
        ?p ?o .
     FILTER(?x in (rfc:updates, rfc:obsoletes) && ?p != dcterms:references)
   }
   UNION { ?obsoleter rfc:obsoletes <%(uri)s> . }
   UNION { ?updater   rfc:updates   <%(uri)s> . }
}
"""

"""Distributed BPE tokenizer training and encoding.

A training-data pipeline doesn't just *count* tokens (textstats.py's
``bpe_ish_tokens`` proxy) — it TRAINS the tokenizer on the corpus it
curated (Sennrich et al. 2016, the GPT-2/BERT vocabulary recipe) and
then encodes every document with it.  Both halves live here,
Spark-first:

**Training** (``bpe_train``) runs the classic merge loop on the
DISTINCT-WORD table, never the corpus:

1. one corpus-wide pass builds ``(word, wcount)`` — a single
   map-side-combinable groupBy (the only place document text is
   touched; Heaps' law makes this table orders of magnitude smaller
   than the corpus — ~10^8 distinct words at 10^12 documents, a
   comfortably distributed DataFrame);
2. each merge round computes adjacent-symbol-pair counts with one
   exploded groupBy over that word table (map-side partials absorb
   hot pairs — ``(t,h)`` appearing in millions of words combines
   per-partition), picks the argmax pair with a deterministic
   total order (count desc, then lexicographic left, right — a
   TakeOrdered of ONE row, no global window), and applies the merge
   to every word's symbol array with a pure-column ``aggregate``
   fold — greedy leftmost, the exact classic semantics;
3. lineage is truncated with ``localCheckpoint`` every few rounds
   (the pagerank/components idiom), so thousand-merge training runs
   don't accumulate thousand-deep plans.

Applying each rule exhaustively in rank order is exact, not an
approximation: a merge can only create pairs involving its NEW
token, and every rule mentioning that token has a higher rank by
construction (the token had to exist when the rule was learned), so
processing rules in rank order never misses an occurrence.  One
greedy left-to-right pass per rule is likewise exhaustive, because
``left+right`` can never equal ``left`` or ``right``.

**Encoding** (``bpe_encode``) broadcasts the ranked merge table and
applies it in one Arrow ``mapInPandas`` pass with a per-batch
word→tokens cache (documents repeat words; the cache makes encoding
effectively per-DISTINCT-word) — embarrassingly parallel, no
shuffle.  ``bpe_apply_merges_col`` is the pure-column twin for
SMALL merge lists: the word is rendered as a ``\\x1f``-delimited
symbol string (``\\x1fl\\x1f\\x1fr\\x1f`` per boundary) and each
merge becomes ONE literal ``replace`` — left-to-right
non-overlapping, provably the same greedy pass — which keeps the
whole encode inside codegen AND gives the DuckDB oracle an exact
SQL restatement (the bpe_encode_docs gate).

Pre-tokenization is deliberately simple and engine-portable
(identical semantics in Spark's Java regex, DuckDB's RE2, and
Python ``re``): lowercased ASCII letter runs, digit runs, and
single non-space-non-alnum characters.  Real byte-level BPE
pre-tokenizes even less; anything fancier (Unicode categories)
diverges across the three engines the tests triangulate.

Reference analog: the reference counts and segments text per
document (documentrepository.py's text analysis hooks, wordcount
analytics); vocabulary TRAINING has no reference counterpart — it
is part of the §2.12 LLM-training-data surface this engine adds.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: engine-portable pre-tokenizer (see module docstring)
PRE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
_PRE_TOKEN_RE = re.compile(PRE_TOKEN_PATTERN)

#: symbol separator for the column-twin encoding (US control char:
#: cannot appear in pre-tokens, which are printable by construction)
SEP = "\x1f"


# ---- pre-tokenization ----------------------------------------------------

def pre_tokens(text: Column) -> Column:
    """text → array<string> of pre-tokens (order preserved)."""
    return F.regexp_extract_all(F.lower(text),
                                F.lit(PRE_TOKEN_PATTERN), 0)


def _rule(m: tuple) -> tuple:
    """(left, right) from either a bare pair or a full
    (rank, left, right, freq) row."""
    return (m[1], m[2]) if len(m) == 4 else (m[0], m[1])


def pre_tokens_py(text: str) -> list[str]:
    """Pure-Python twin of :func:`pre_tokens`."""
    return _PRE_TOKEN_RE.findall((text or "").lower())


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): corpus word frequencies — ONE exploded
    map-side-combinable groupBy; the only corpus-wide pass in
    training."""
    return (docs
            .select(F.explode(pre_tokens(F.col(text_col)))
                    .alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wcount")))


# ---- training ------------------------------------------------------------

def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost application of one merge rule to a symbol
    array, as a pure-column aggregate fold (no UDF)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == left) & (s == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def _bpe_train_driver(syms_list: list[list[str]],
                      wcounts: list[int], n_merges: int,
                      min_pair_freq: int) -> list[tuple]:
    """In-memory merge loop over a collected (syms, wcount) table —
    bit-identical to the distributed loop (same pair counting
    including overlaps, same (cnt desc, left asc, right asc)
    argmax, same greedy-leftmost fold), but incremental: pair counts
    update only for the words a merge touches, and the argmax is a
    lazy-invalidation heap instead of a corpus-wide sort.  This is
    the shape every real BPE trainer uses — one pass to count, then
    driver-side rounds at microseconds per merge instead of one
    Spark job per merge."""
    import heapq
    from collections import defaultdict

    pair_counts: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    for idx, syms in enumerate(syms_list):
        wc = wcounts[idx]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += wc
            pair_words[p].add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            # stale heap entries (count changed since push) skip;
            # (-cnt, (l, r)) tuple order IS the distributed
            # orderBy(desc cnt, asc l, asc r) total order
            if pair_counts.get(p, 0) == -negc and negc < 0:
                best = (p, -negc)
                break
        if best is None or best[1] < min_pair_freq:
            break
        (left, right), cnt = best
        merges.append((rank, left, right, int(cnt)))
        merged = left + right
        touched = pair_words.pop((left, right), set())
        changed: set = set()
        for idx in sorted(touched):
            syms = syms_list[idx]
            wc = wcounts[idx]
            out: list[str] = []
            hit = False
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                    hit = True
                else:
                    out.append(s)
            if not hit:        # stale index: word changed earlier
                continue
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= wc
                changed.add(p)
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += wc
                pair_words[p].add(idx)
                changed.add(p)
            syms_list[idx] = out
        for p in changed:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                pair_counts.pop(p, None)
        pair_counts.pop((left, right), None)
    return merges


def bpe_train(docs_or_words: DataFrame, n_merges: int,
              text_col: str = "text", min_pair_freq: int = 2,
              checkpoint_every: int = 8,
              driver_threshold: int = 10_000_000) -> list[tuple]:
    """Train ``n_merges`` BPE merges on the corpus; returns
    ``[(rank, left, right, freq), ...]`` in learned order.

    ``docs_or_words`` is either a document table (``text_col`` is
    pre-tokenized and counted) or an existing ``(word, wcount)``
    table.  Stops early — loudly, by returning fewer rows — when the
    best remaining pair's frequency falls under ``min_pair_freq``
    (merging hapax pairs memorizes the corpus instead of compressing
    it).  Determinism: ties on frequency break by lexicographic
    (left, right), so reruns and the SQL oracle agree bit-for-bit.

    When the distinct-word table has at most ``driver_threshold``
    rows it is collected ONCE and the merge loop runs in memory
    (:func:`_bpe_train_driver`) — the components()/scc() driver
    fast-path precedent.  Heaps' law keeps even a 10^12-document
    corpus's distinct-word table around 10^8 rows, so real trainings
    are one corpus pass + one collect, not ``n_merges`` sequential
    Spark jobs; the distributed loop below remains the contract for
    tables above the threshold (or ``driver_threshold=0``)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    cols = set(docs_or_words.columns)
    words = (docs_or_words if {"word", "wcount"} <= cols
             else word_counts(docs_or_words, text_col))
    words = words.select(
        "wcount",
        F.filter(F.split("word", ""), lambda c: c != "").alias("syms"))
    words = words.persist()
    if driver_threshold > 0 and words.count() <= driver_threshold:
        try:
            rows = words.collect()
        finally:
            words.unpersist()
        return _bpe_train_driver([list(r["syms"]) for r in rows],
                                 [r["wcount"] for r in rows],
                                 n_merges, min_pair_freq)
    merges: list[tuple] = []
    try:
        for rank in range(n_merges):
            pairs = words.select(
                "wcount",
                F.explode(F.expr(
                    "transform(slice(syms, 1, size(syms) - 1), "
                    "(x, i) -> struct(x AS l, "
                    "element_at(syms, i + 2) AS r))")).alias("p"))
            counts = (pairs.groupBy("p.l", "p.r")
                      .agg(F.sum("wcount").alias("cnt")))
            best = (counts.orderBy(F.desc("cnt"), F.asc("l"),
                                   F.asc("r"))
                    .limit(1).collect())
            if not best or best[0]["cnt"] < min_pair_freq:
                break
            left, right, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
            merges.append((rank, left, right, int(cnt)))
            nxt = words.select(
                "wcount", _merge_fold(F.col("syms"), left, right)
                .alias("syms"))
            if (rank + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            nxt = nxt.persist()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    """The trained merge table as a DataFrame (the persisted
    artifact an encode job broadcasts)."""
    return spark.createDataFrame(
        merges, "rank int, left string, right string, freq long")


# ---- encoding ------------------------------------------------------------

def encode_word(word: str, merges: list[tuple]) -> list[str]:
    """Pure-Python twin: one pre-token → BPE symbols under the
    ranked merge list (each rule one greedy leftmost pass, in rank
    order — see the module docstring for why that is exact)."""
    syms = list(word)
    for m in merges:
        left, right = _rule(m)
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_apply_merges_col(word: Column, merges: list[tuple]) -> Column:
    """Column twin for SMALL merge lists: word → array<string> of
    BPE symbols via one literal ``replace`` per merge over the
    ``\\x1f``-delimited symbol string — all codegen, and the exact
    shape the DuckDB oracle restates."""
    s = F.concat(F.lit(SEP),
                 F.array_join(F.filter(F.split(word, ""),
                                       lambda c: c != ""),
                              SEP + SEP),
                 F.lit(SEP))
    for m in merges:
        left, right = _rule(m)
        s = F.replace(s, F.lit(SEP + left + SEP + SEP + right + SEP),
                      F.lit(SEP + left + right + SEP))
    return F.split(s.substr(F.lit(2), F.length(s) - 2), SEP + SEP)


def bpe_encode(docs: DataFrame, merges: list[tuple],
               text_col: str = "text",
               id_cols: tuple = ("url",)) -> DataFrame:
    """docs → (id_cols..., tokens array<string>, n_tokens): encode
    every document with the trained merges — one Arrow pass,
    broadcast merge table, per-batch word cache, no shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast([_rule(m) for m in merges])
    ids = list(id_cols)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rules = [(0, l, r, 0) for (l, r) in bc.value]
        cache: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            for w in pre_tokens_py(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, rules)
                toks.extend(got)
            return toks

        for pdf in it:
            out = pdf[ids].copy()
            tokens = [enc(t) for t in pdf[text_col]]
            out["tokens"] = tokens
            out["n_tokens"] = [len(t) for t in tokens]
            yield out

    schema = ", ".join(
        f"{c} {dict(docs.dtypes)[c]}" for c in ids
    ) + ", tokens array<string>, n_tokens long"
    return docs.select(*ids, text_col).mapInPandas(batches,
                                                   schema=schema)

"""Python UDTF surface (SURVEY §2.11): table-valued functions.

The reference's closest analog is the paragraph chunker feeding
FSMParser (/root/reference/ferenda/textreader.py getiterator +
``ferenda/fsmparser.py`` parse stream): one document value expands
into many ordered fragment rows.  Spark 4 exposes exactly this shape
as a Python UDTF usable from SQL with ``LATERAL`` — completing the
extension-point inventory next to pandas UDFs (vectorized scalar),
GROUPED_AGG (UDAF) and mapInPandas/applyInPandasWithState.

UDTFs run row-at-a-time in Python, so they are for *cardinality-
changing* expansion where each input row is cheap to expand — never
for per-row scalar math (use pandas UDFs) and never in a 100 TB hot
path where a Column ``explode(split(...))`` can express the same
expansion JVM-side.  ``chunk_words`` is deliberately also expressible
as Column ops; the pytest asserts the UDTF and the Column form agree,
documenting the trade."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="frag_no int, fragment string")
class ChunkWords:
    """text → (frag_no, fragment) rows of ``size`` words each."""

    def eval(self, text: str, size: int):
        words = [w for w in (text or "").split(" ") if w]
        for i in range(0, len(words), size):
            yield (i // size, " ".join(words[i:i + size]))


def register(spark) -> None:
    spark.udtf.register("chunk_words", ChunkWords)


def chunk_words_col(docs: DataFrame, size: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The JVM-side Column equivalent (the form a hot path should
    use): slice/transform/posexplode, no Python."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n_chunks = F.ceil(F.size(words) / F.lit(size)).cast("int")
    # guard n_chunks=0: F.sequence(0, -1) DESCENDS to [0, -1] (the
    # dedup.shingles trap) — word-less text must yield zero rows,
    # matching the UDTF
    chunks = F.when(
        F.size(words) == 0, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(words, i * size + 1, size), " ")))
    return (docs.select(id_col, F.posexplode(chunks)
                        .alias("frag_no", "fragment")))

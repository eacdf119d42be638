"""Python/Column implementation-pair equivalence for scalar functions."""

import pandas as pd
from pyspark.sql import functions as F

from ferenda_spark.functions.text import (
    natural_sort_key,
    natural_sort_key_col,
    normalize_space,
    normalize_space_col,
    slugify,
    slugify_col,
    strip_backspace,
    strip_backspace_col,
)

SAMPLES = [
    "  a\xa0b\t c \n\nd  ",
    "plain",
    "", "\xa0\xa0", "x  y",
    "M\x08MU\x08US\x08ST\x08T be",
    "2 § and 10 § and 6 a",
    "Best Current Practice",
    "Återkommande Öl & bröd",
]


def _run_pair(spark, py_fn, col_fn):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = [r["o"] for r in
           df.select(col_fn(F.col("s")).alias("o")).collect()]
    want = [py_fn(s) for s in SAMPLES]
    assert got == want


def test_normalize_space_pair(spark):
    _run_pair(spark, normalize_space, normalize_space_col)


def test_strip_backspace_pair(spark):
    _run_pair(spark, strip_backspace, strip_backspace_col)


def test_slugify_pair(spark):
    _run_pair(spark, slugify, slugify_col)


def test_natural_sort_key_orders_numerically(spark):
    vals = ["2 §", "10 §", "6 a", "6 b", "1.2.10", "1.2.2"]
    want = sorted(vals, key=natural_sort_key)
    df = spark.createDataFrame(pd.DataFrame({"s": vals}))
    got = [r["s"] for r in
           df.orderBy(natural_sort_key_col(F.col("s"))).collect()]
    assert got == want
    assert want.index("2 §") < want.index("10 §")
    assert want.index("1.2.2") < want.index("1.2.10")


def test_sanitize_term_pair(spark):
    """P7 sanitize_term (keyword.py:169-177): py/Column twins agree
    on accepts, rejects (short/long/bad start/bad end), and the
    whitespace-normalizing accept path."""
    from ferenda_spark.functions.text import (
        sanitize_term, sanitize_term_col)
    cases = [
        "  hello   world ", "ok.term", "x", "", ".dot", "/slash",
        ":colon", "end.", "end,", "a" * 100, "a" * 101, "ab",
        "term\xa0nbsp", "  .lead-after-trim", "keep-this,not.",
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": cases}))
    got = [r["o"] for r in
           df.select(sanitize_term_col(F.col("s")).alias("o")).collect()]
    want = [sanitize_term(s) for s in cases]
    assert got == want
    assert sanitize_term("  hello   world ") == "hello world"
    assert sanitize_term("a" * 101) is None
    assert sanitize_term(".dot") is None
    assert sanitize_term("end,") is None


# ------------------------------------------------ unicode normalization

def test_nfc_and_strip_accents_twins(spark):
    from pyspark.sql import functions as F
    from ferenda_spark.functions.text import (nfc, nfc_col,
                                              strip_accents,
                                              strip_accents_col)
    samples = ["cafe\u0301", "caf\u00e9", "a\u030agang", "\u00e5",
               "nai\u0308ve \u00f8 \u00df", "plain ascii", None]
    # decomposed and precomposed spell the SAME NFC string
    assert nfc(samples[0]) == nfc(samples[1]) == "café"
    assert strip_accents(samples[0]) == "cafe"
    assert strip_accents("åäö") == "aao"
    assert nfc(None) is None and strip_accents(None) is None
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = df.select(nfc_col(F.col("t")).alias("n"),
                    strip_accents_col(F.col("t")).alias("f")).collect()
    for row, s in zip(got, samples):
        assert row["n"] == nfc(s)
        assert row["f"] == strip_accents(s)

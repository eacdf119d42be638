"""Triple parity: P/R vs the by-construction golden set (the
reference's graph-compare method, testutil.py:58-117, as set ops)."""

from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import (
    entities_df,
    golden_triples_df,
    pages_df,
)
from ferenda_spark.operators.metadata import assert_required_predicates
from ferenda_spark.pipeline import build_triples

N_DOCS = 150
KEY = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype", "obj_lang"]


def _canon(df):
    return df.select(*KEY).na.fill("~null~",
                                   ["obj_datatype", "obj_lang"]).distinct()


def test_triple_precision_recall(spark):
    pages = pages_df(spark, N_DOCS, partitions=4)
    golden = _canon(golden_triples_df(spark, N_DOCS, partitions=4))
    got = _canon(build_triples(pages, entities_df(spark)))

    n_golden = golden.count()
    n_got = got.count()
    tp = got.intersect(golden).count()
    precision = tp / n_got
    recall = tp / n_golden
    assert precision >= 0.95, (precision, got.exceptAll(golden).take(10))
    assert recall >= 0.95, (recall, golden.exceptAll(got).take(10))
    # by construction the pipeline should be exact on this corpus
    assert precision == 1.0 and recall == 1.0


def test_required_predicates(spark):
    pages = pages_df(spark, 60, partitions=2)
    triples = build_triples(pages, entities_df(spark))
    missing = assert_required_predicates(triples)
    assert missing.count() == 0


def test_citation_skew_exists(spark):
    """The corpus must exhibit head-entity skew (zipf targets)."""
    golden = golden_triples_df(spark, 200, partitions=4)
    counts = (golden.filter(F.col("pred") == "dcterms:references")
              .groupBy("obj").count().orderBy(F.desc("count")))
    top = [r["count"] for r in counts.take(5)]
    med = counts.approxQuantile("count", [0.5], 0.01)[0]
    assert top[0] >= 10 * med

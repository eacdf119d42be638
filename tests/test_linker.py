"""Entity linking: exact → fuzzy(0.8) → unlinkable semantics
(reference lookup_resource, documentrepository.py:500-547)."""

import pandas as pd
from pyspark.sql import functions as F

from ferenda_spark.fixtures.pages import entities_df
from ferenda_spark.operators.linker import link_labels


def test_link_exact_fuzzy_and_miss(spark):
    ents = entities_df(spark).filter(F.col("kind") == "publisher")
    mentions = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3, 4],
        "label": [
            "Network Working Group",              # exact
            "Internet Enginering Task Force",     # fuzzy >= 0.8
            "W3 Consortium Publishing House",     # < 0.8 → no link
            "network working group",              # case differs → fuzzy hit
        ],
    }))
    got = {r["id"]: r["entity_uri"]
           for r in link_labels(mentions, ents).collect()}
    assert got[1] == "https://example.org/res/org/network-working-group"
    assert got[2] == "https://example.org/res/org/internet-engineering-task-force"
    assert got[3] is None
    assert got[4] == "https://example.org/res/org/network-working-group"


def test_link_passthrough_columns(spark):
    ents = entities_df(spark).filter(F.col("kind") == "publisher")
    mentions = spark.createDataFrame(pd.DataFrame({
        "extra": ["keepme"], "label": ["Network Working Group"]}))
    row = link_labels(mentions, ents).collect()[0]
    assert row["extra"] == "keepme" and row["entity_uri"] is not None

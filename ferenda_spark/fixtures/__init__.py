from ferenda_spark.fixtures.pages import (  # noqa: F401
    entities_pandas,
    gen_corpus_pandas,
    gen_doc,
    golden_text_df,
    golden_triples_df,
    pages_df,
    entities_df,
)

from ferenda_spark.sources.testdata import (  # noqa: F401
    DOC_PAGE_URL_RE,
    load_table,
    pages_from_documents,
)

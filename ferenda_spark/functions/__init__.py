from ferenda_spark.functions.text import (  # noqa: F401
    clean_xml_chars,
    natural_sort_key,
    natural_sort_key_col,
    normalize_space,
    normalize_space_col,
    slugify,
    slugify_col,
    strip_backspace,
    strip_backspace_col,
)

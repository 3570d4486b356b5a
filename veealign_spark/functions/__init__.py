from veealign_spark.functions.text_norm import (  # noqa: F401
    camel_split_col,
    cosine_expr,
    norm_label_col,
    normalize_term,
    underscore_split_col,
)

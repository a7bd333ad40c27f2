from ting_data_etl_spark.functions.cleaning import (  # noqa: F401
    NULL_SENTINELS,
    clean_nulls,
    ensure_col,
    fmt_pct,
    guarded_ratio,
    parse_month,
    sum_exact,
    to_number,
    yoy_ratio,
)
from ting_data_etl_spark.functions.text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint_md5,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from ting_data_etl_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    quantize_vec,
)

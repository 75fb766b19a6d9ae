"""Column-level function library (scalar expressions, no shuffles).

The reference has no scalar function library (SURVEY.md §2.7) — on
Spark these come free via pyspark.sql.functions. This module collects
the engine-specific column builders added by plateau_spark so users
have one import surface.
"""

from plateau_spark.operators.similarity import (
    cosine_sim_col,
    dot_col,
    hyperplane_bucket_col,
    norm_col,
)
from plateau_spark.operators.text import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id_col,
    punct_ratio_col,
    quality_score_col,
    stopword_ratio_col,
    token_count_col,
    winnow_fingerprints,
    winnow_fingerprints_col,
)
from plateau_spark.operators.dedup import shingles_col, tokens_col
from plateau_spark.operators.text import normalize_text_col_udf


__all__ = [
    "cosine_sim_col",
    "dot_col",
    "hyperplane_bucket_col",
    "norm_col",
    "bpe_ish_token_count_col",
    "fingerprint_col",
    "lang_id_col",
    "punct_ratio_col",
    "quality_score_col",
    "stopword_ratio_col",
    "token_count_col",
    "winnow_fingerprints",
    "winnow_fingerprints_col",
    "shingles_col",
    "tokens_col",
    "normalize_text_col_udf",
]

"""Public column-function namespace (all JVM-side, no Python UDFs).

``from spark_df_profiling_spark import functions as PF`` mirrors how
``pyspark.sql.functions`` is used: every export is a Column-expression
builder that composes inside ``select``/``agg``/``where`` and stays in
whole-stage codegen (the higher-order ones run interpreted but remain
JVM-side — no Python crossing).  These are re-exports of the kernels the
operators are built from, so pipelines can mix them with their own
expressions without importing operator modules individually.

>>> df.select(PF.lang_id("text"), PF.quality_score("text"))
>>> df.select(PF.simhash64("text").alias("sig"))
>>> df.where(PF.cosine("emb_a", "emb_b") > 0.9)
"""

from __future__ import annotations

from spark_df_profiling_spark.operators.clustering import (
    kmeans_assign_expr,
)
from spark_df_profiling_spark.operators.drift import (
    chi2_sf_expr,
    ks_sf_expr,
)
from spark_df_profiling_spark.operators.dedup import (
    char_qgram_expr,
    content_hash,
    simhash64,
)
from spark_df_profiling_spark.operators.sampling import (
    hash_bucket,
    poisson_weight,
)
from spark_df_profiling_spark.operators.similarity import (
    cosine,
    dot,
    ivf_probe_expr,
    l2_norm,
)
from spark_df_profiling_spark.operators.frequency import (
    cms_positions,
    format_pattern_expr,
    hll_position,
)
from spark_df_profiling_spark.operators.text import (
    alpha_ratio,
    canonical_url,
    extract_urls,
    normalize_text,
    registered_domain,
    url_host,
    avg_token_len,
    digit_ratio,
    dup_ngram_ratio,
    fingerprint_min_shingle,
    lang_id,
    lang_scores,
    n_chars,
    n_tokens_bpe,
    n_tokens_ws,
    pii_count,
    punct_ratio,
    quality_score,
    readability_score,
    rolling_hash,
    space_ratio,
    top_token_ratio,
    type_token_ratio,
    upper_ratio,
    winnow_fingerprints,
)

__all__ = [
    "alpha_ratio", "avg_token_len", "canonical_url", "char_qgram_expr",
    "chi2_sf_expr", "ks_sf_expr", "ivf_probe_expr",
    "cms_positions", "content_hash", "hll_position",
    "cosine", "digit_ratio", "dot", "dup_ngram_ratio", "extract_urls",
    "fingerprint_min_shingle", "format_pattern_expr", "hash_bucket",
    "kmeans_assign_expr", "l2_norm", "lang_id",
    "lang_scores", "n_chars", "n_tokens_bpe", "n_tokens_ws",
    "normalize_text", "pii_count", "punct_ratio", "quality_score",
    "readability_score",
    "poisson_weight",
    "registered_domain", "rolling_hash", "simhash64", "space_ratio",
    "top_token_ratio", "type_token_ratio", "upper_ratio", "url_host",
    "winnow_fingerprints",
]

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H-Q1-style pricing summary) at
sf0.001.  ``queries()`` / ``oracle_sql()`` — the declared-query catalog
from SURVEY.md §2.8, implemented in
``consume_kafka_avro_data_spark/queries/`` and registered via
``consume_kafka_avro_data_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from consume_kafka_avro_data_spark.registry import all_queries  # noqa: E402

# Driver-exposure ordering (round 2).  The correctness driver evaluates a
# ~50-query prefix of ``queries()`` in dict order; round 1 covered the first
# 50 registered queries.  This list front-loads every query WITHOUT a green
# CORRECTNESS_r01 row — the §2.8 declared-contract queries first, then the
# U5/U6 dedup/similarity family, U8 multimodal, then the remaining unchecked
# tail — so round 2 produces driver-side evidence for them.  Queries already
# green in r01 fall to the back (they remain pytest/rehearse-covered).
_EXPOSURE_PRIORITY: list[str] = [
    # §2.8 declared contract, previously unchecked (17)
    "q_scan_project", "q_rename_cast", "q_filter_predicates", "q_string_funcs",
    "q_date_funcs", "q_math_case", "q_json_extract", "q_array_explode",
    "q_window_rank", "q_window_running", "q_lag_lead", "q_topk_global",
    "q_union_except", "q_tumbling_window", "q_session_like", "q_text_tokens",
    "q_similarity_topk",
    # U5/U6 dedup + similarity family (15)
    "q_similarity_ann", "q_similarity_ivf", "q_embedding_norms",
    "q_minhash_est", "q_minhash_neardup", "q_simhash_neardup",
    "q_simhash_signatures", "q_ngram_jaccard", "q_containment",
    "q_embedding_neardup", "q_neardup_lsh", "q_dedup_clusters",
    "q_dedup_pipeline", "q_winnow_fingerprints",
    "q_label_centroids", "q_sq_quantize", "q_minhash_est_fast",
    # U8 multimodal
    "q_multimodal_features", "q_frame_sample", "q_wav_features",
    "q_ppm_features",
    # newly oracled approx sketches (were rows-only in r01)
    "q_approx_distinct", "q_approx_percentile",
    # round-2 additions: TPC-H-pattern multi-join analytics + PQ/ADC ANN
    "q_shipping_priority", "q_local_supplier_volume", "q_returned_items",
    "q_pq_codes", "q_pq_adc", "q_trade_triangles", "q_zorder_layout",
    "q_asof_tolerance",
    # remaining unchecked queries, unique-operator coverage first
    "q_supply_chain_reach", "q_interval_count_binned", "q_interval_histogram",
    "q_unpivot",
    "q_full_outer", "q_first_last", "q_posexplode", "q_regr_agg",
    "q_null_semantics", "q_fuzzy_match", "q_map_funcs",
    "q_higher_order_arrays", "q_sliding_window", "q_calendar_densify",
    "q_intersect", "q_ntile_buckets", "q_range_frame", "q_mad", "q_skyline",
    "q_id_gaps", "q_doc_fingerprint", "q_lang_stats", "q_text_quality",
    "q_doc_chunks", "q_train_split", "q_sentiment", "q_tfidf_topterms",
    "q_dedup_keep_canonical", "q_repetition_stats", "q_pii_scrub",
    "q_token_len_histogram", "q_bm25_rank", "q_lang_id",
    "q_quality_features", "q_bpe_tokens", "q_quality_score",
]


def _ordered_queries():
    qs = all_queries()
    # priority names in list position order, the rest keep registration order
    prioritized = [n for n in _EXPOSURE_PRIORITY if n in qs]
    tail = [n for n in qs if n not in set(prioritized)]
    return {n: qs[n] for n in prioritized + tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q_groupby_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible query.

    Queries registered with ``oracle=None`` (approx sketches, tie-prone
    top-k, codec roundtrips) are intentionally omitted → rows-only check.
    """
    out = {}
    for name, q in _ordered_queries().items():
        text = q.oracle_text()
        if text is not None:
            out[name] = text
    return out

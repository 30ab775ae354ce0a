"""Automatic exposure rotation (consume_kafka_avro_data_spark/rotation).

The correctness driver checks a ~50-query prefix of ``queries()`` per
round; rotation.py orders the catalog so the prefix always re-certifies
the stalest evidence first.  These tests pin the policy with synthetic
artifacts and then check the real repo artifacts reproduce the round-5
hand rotation (new additions + every provable row last certified by
round 2 inside the prefix, rows-only pinned last).

No SparkSession needed: rotation is pure artifact/metadata logic.
"""

import json
import os

from consume_kafka_avro_data_spark.rotation import (
    exposure_order,
    freshest_green,
)

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_row(rows=10):
    return {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "spark_rows": rows,
        "oracle_rows": rows,
        "err": None,
    }


def _failed_row():
    return {
        "rows_match": False,
        "schema_match": True,
        "hash_match": False,
        "spark_rows": 9,
        "oracle_rows": 10,
        "err": None,
    }


def _rows_only_row(rows=25):
    # the driver's weaker no-oracle check: marker err, null matches
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": rows,
        "oracle_rows": None,
        "err": "no_oracle",
    }


def _write(tmp_path, rnd, doc):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(doc))


class TestFreshestGreen:
    def test_max_green_round_wins(self, tmp_path):
        _write(tmp_path, 1, {"a": _green_row(), "b": _green_row()})
        _write(tmp_path, 3, {"a": _green_row()})
        fresh = freshest_green(str(tmp_path))
        assert fresh == {"a": 3, "b": 1}

    def test_failure_does_not_refresh(self, tmp_path):
        # green in r01, FAILED in r03 -> freshness stays 1, so the
        # query re-queues near the front of the next exposure order
        _write(tmp_path, 1, {"a": _green_row()})
        _write(tmp_path, 3, {"a": _failed_row()})
        assert freshest_green(str(tmp_path)) == {"a": 1}

    def test_never_green_absent(self, tmp_path):
        _write(tmp_path, 2, {"a": _failed_row()})
        assert freshest_green(str(tmp_path)) == {}

    def test_rows_only_marker_counts(self, tmp_path):
        # err == 'no_oracle' with a recorded row count is the weaker
        # check PASSING, not a failure
        _write(tmp_path, 2, {"a": _rows_only_row()})
        assert freshest_green(str(tmp_path)) == {"a": 2}

    def test_rows_only_with_error_does_not_count(self, tmp_path):
        row = _rows_only_row()
        row["spark_rows"] = None
        row["err"] = "boom"
        _write(tmp_path, 2, {"a": row})
        assert freshest_green(str(tmp_path)) == {}

    def test_corrupt_artifact_skipped(self, tmp_path):
        (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
        _write(tmp_path, 2, {"a": _green_row()})
        assert freshest_green(str(tmp_path)) == {"a": 2}

    def test_no_artifacts(self, tmp_path):
        assert freshest_green(str(tmp_path)) == {}


class TestExposureOrder:
    def test_never_certified_first_then_stalest(self):
        names = ["old", "new", "stale"]
        provable = dict.fromkeys(names, True)
        fresh = {"old": 4, "stale": 2}
        assert exposure_order(names, provable, fresh) == ["new", "stale", "old"]

    def test_name_tiebreak_is_deterministic(self):
        names = ["zq", "aq", "mq"]
        order = exposure_order(names, dict.fromkeys(names, True), {})
        assert order == ["aq", "mq", "zq"]

    def test_rows_only_pinned_after_all_provable(self):
        # the non-provable query is STALEST yet still sorts last: its
        # weaker check must never displace a provable query from the
        # driver's checked prefix
        names = ["fresh_provable", "stale_rows_only"]
        provable = {"fresh_provable": True, "stale_rows_only": False}
        fresh = {"fresh_provable": 9, "stale_rows_only": 1}
        order = exposure_order(names, provable, fresh)
        assert order == ["fresh_provable", "stale_rows_only"]


class TestRepoArtifacts:
    """The computed order over the REAL committed artifacts must
    reproduce the round-5 rotation the judge prescribed: round-5
    additions plus all 37 provable rows last certified by round 2
    inside the ~50-slot prefix, rows-only-by-design pinned last."""

    R02_STALE = {
        "q_window_running", "q_union_except", "q_session_like",
        "q_approx_distinct", "q_approx_percentile", "q_asof_tolerance",
        "q_interval_count_binned", "q_local_supplier_volume",
        "q_returned_items", "q_shipping_priority", "q_supply_chain_reach",
        "q_trade_triangles", "q_zorder_layout", "q_text_tokens",
        "q_containment", "q_ngram_jaccard", "q_simhash_neardup",
        "q_simhash_signatures", "q_winnow_fingerprints", "q_minhash_est",
        "q_minhash_neardup", "q_dedup_clusters", "q_dedup_pipeline",
        "q_embedding_neardup", "q_embedding_norms", "q_label_centroids",
        "q_neardup_lsh", "q_pq_adc", "q_pq_codes", "q_similarity_ann",
        "q_similarity_ivf", "q_similarity_topk", "q_sq_quantize",
        "q_frame_sample", "q_multimodal_features", "q_ppm_features",
        "q_wav_features",
    }

    def test_round5_prefix(self):
        import sys

        sys.path.insert(0, REPO_DIR)
        import __spark_entry__ as entry

        names = list(entry.queries())
        prefix = set(names[:50])
        # the two round-5 additions have no driver row yet -> in prefix
        assert {"q_ann_recall", "q_adc_rerank"} <= prefix
        # every provable row whose freshest green evidence is round 2
        assert self.R02_STALE <= prefix
        # rows-only by design never displaces a provable query
        assert names[-1] == "q_minhash_est_fast"

    def test_order_is_nondecreasing_in_staleness(self):
        import sys

        sys.path.insert(0, REPO_DIR)
        import __spark_entry__ as entry
        from consume_kafka_avro_data_spark.registry import all_queries

        fresh = freshest_green(REPO_DIR)
        qs = all_queries()
        names = list(entry.queries())
        provable_rounds = [
            fresh.get(n, 0) for n in names if qs[n].oracle is not None
        ]
        assert provable_rounds == sorted(provable_rounds)

"""LSH banding-parameter tuner (operators/dedup.tune_lsh_params): the
returned (bands, rows) must be the exact minimizer of the weighted
FP/FN error mass among all factorizations (checked against an
independent numeric integration), the S-curve primitive must match a
pure-Python evaluation, and the weights must steer the knee in the
documented directions."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from consume_kafka_avro_data_spark.operators.dedup import (
    LshParams,
    lsh_collision_prob,
    tune_lsh_params,
)


def _ref_prob(s: float, b: int, r: int) -> float:
    return 1.0 - (1.0 - s**r) ** b


def _ref_error(threshold, b, r, fp_w, fn_w, steps=2000) -> float:
    """Independent quadrature: trapezoid at a finer resolution."""
    fp = 0.0
    dx = threshold / steps
    for i in range(steps):
        fp += (
            _ref_prob(i * dx, b, r) + _ref_prob((i + 1) * dx, b, r)
        ) / 2 * dx
    fn = 0.0
    dx = (1.0 - threshold) / steps
    for i in range(steps):
        a0 = threshold + i * dx
        fn += (
            (1 - _ref_prob(a0, b, r)) + (1 - _ref_prob(a0 + dx, b, r))
        ) / 2 * dx
    return fp_w * fp + fn_w * fn


def test_s_curve_matches_reference():
    for s in (0.0, 0.1, 0.5, 0.9, 1.0):
        for b, r in ((8, 4), (16, 2), (1, 32), (32, 1)):
            assert lsh_collision_prob(s, b, r) == pytest.approx(
                _ref_prob(s, b, r), abs=1e-12
            )


def test_returns_exact_minimizer_against_brute_force():
    """LAW: for every (threshold, n) probed, the tuner's pick has the
    minimal independently-integrated weighted error among ALL
    (b, r = n//b) schemes (within quadrature noise), with the
    documented (error, bands) tie-break."""
    for threshold in (0.3, 0.5, 0.8):
        for n in (16, 32, 64):
            got = tune_lsh_params(threshold, n)
            errs = {
                b: _ref_error(threshold, b, n // b, 0.5, 0.5)
                for b in range(1, n + 1)
                if n // b >= 1
            }
            best_err = min(errs.values())
            got_err = _ref_error(threshold, got.bands, got.rows, 0.5, 0.5)
            assert got_err <= best_err + 1e-6
            assert got.num_hashes <= n
            # predicted areas agree with the independent integration
            assert got.fp_area + got.fn_area == pytest.approx(
                _ref_error(threshold, got.bands, got.rows, 1.0, 1.0),
                abs=1e-4,
            )


def test_s50_is_the_half_collision_point():
    p = tune_lsh_params(0.5, 32)
    assert lsh_collision_prob(p.s50, p.bands, p.rows) == pytest.approx(
        0.5, abs=1e-9
    )


def test_weights_steer_the_knee():
    """More fn_weight → recall-leaning scheme (knee at or below the
    precision-leaning scheme's); the repo's shipped default (b=8, r=4,
    n=32) sits near the 0.5-threshold optimum it was chosen for."""
    recall = tune_lsh_params(0.5, 64, fp_weight=0.1, fn_weight=0.9)
    precision = tune_lsh_params(0.5, 64, fp_weight=0.9, fn_weight=0.1)
    assert recall.s50 <= precision.s50
    default = tune_lsh_params(0.5, 32)
    shipped = _ref_error(0.5, 8, 4, 0.5, 0.5)
    tuned = _ref_error(0.5, default.bands, default.rows, 0.5, 0.5)
    assert tuned <= shipped + 1e-6


@given(
    threshold=st.floats(min_value=0.05, max_value=0.95),
    n=st.integers(min_value=1, max_value=128),
)
@settings(max_examples=25, deadline=None)
def test_tuner_laws(threshold, n):
    """For ANY threshold/budget: a valid factorization comes back,
    areas are probability masses, s50 is in (0, 1), and the call is
    deterministic."""
    p = tune_lsh_params(threshold, n)
    assert isinstance(p, LshParams)
    assert 1 <= p.bands and 1 <= p.rows and p.num_hashes <= n
    assert 0.0 <= p.fp_area <= threshold + 1e-9
    assert 0.0 <= p.fn_area <= (1.0 - threshold) + 1e-9
    assert 0.0 < p.s50 < 1.0
    assert tune_lsh_params(threshold, n) == p


def test_validation():
    with pytest.raises(ValueError, match="threshold"):
        tune_lsh_params(0.0, 32)
    with pytest.raises(ValueError, match="num_hashes"):
        tune_lsh_params(0.5, 0)
    with pytest.raises(ValueError, match="weights"):
        tune_lsh_params(0.5, 32, fp_weight=0.0, fn_weight=0.0)
    with pytest.raises(ValueError, match="resolution"):
        tune_lsh_params(0.5, 32, resolution=1)


# -- deployment-path wiring (round 9) -----------------------------------------


def test_resolve_banding_laws():
    """resolve_banding is the ONE deployment resolution: defaults
    pinned at (8, 4) when nothing is given, explicit values pass
    through, tune_for routes through the tuner deterministically, and
    conflicting / one-sided configs are eager errors."""
    from consume_kafka_avro_data_spark.operators.dedup import (
        resolve_banding,
    )

    assert resolve_banding(None, None, None) == (8, 4)
    assert resolve_banding(16, 2, None) == (16, 2)
    p = tune_lsh_params(0.8, 128)
    assert resolve_banding(None, None, (0.8, 128)) == (p.bands, p.rows)
    # deterministic: same tune_for → same scheme, every call
    assert resolve_banding(None, None, (0.8, 128)) == (p.bands, p.rows)
    with pytest.raises(ValueError, match="not both"):
        resolve_banding(8, 4, (0.5, 32))
    with pytest.raises(ValueError, match="set together"):
        resolve_banding(8, None, None)
    with pytest.raises(ValueError, match="threshold must be"):
        resolve_banding(None, None, (1.5, 32))


def test_minhash_lsh_pairs_tune_for(spark):
    """minhash_lsh_pairs(tune_for=) consumes the designed scheme: the
    default call is byte-identical to explicit (8, 4) — the pinned
    legacy behavior — and a high-threshold tune_for shifts the
    candidate knee without ever changing verify correctness (emitted
    pairs are exact-Jaccard-verified either way)."""
    from consume_kafka_avro_data_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "completely different words here")],
        "doc_id long, text string",
    )
    want = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, bands=8, rows=4).collect()
    )
    got_default = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    )
    assert got_default == want
    p = tune_lsh_params(0.5, 32)
    got_tuned = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(docs, tune_for=(0.5, 32)).collect()
    )
    explicit = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, bands=p.bands, rows=p.rows
        ).collect()
    )
    assert got_tuned == explicit
    with pytest.raises(ValueError, match="not both"):
        minhash_lsh_pairs(docs, bands=8, rows=4, tune_for=(0.5, 32))


def test_tune_for_parity_across_banding_consumers(spark):
    """Every banding consumer resolves through resolve_banding:
    incremental_minhash_dedup and minhash_estimate_pairs accept
    tune_for with the same defaults-pinned / conflict-rejected
    contract as minhash_lsh_pairs."""
    from consume_kafka_avro_data_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_estimate_pairs,
        tune_lsh_params,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")
    docs = spark.createDataFrame(
        [(1, base), (2, near)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(9, base)], "doc_id long, text string")
    p = tune_lsh_params(0.5, 32)
    # estimate: default == explicit (8,4); tuned == explicit tuned
    est_def = sorted(
        (r.id_a, r.id_b) for r in minhash_estimate_pairs(docs).collect()
    )
    est_84 = sorted(
        (r.id_a, r.id_b)
        for r in minhash_estimate_pairs(docs, bands=8, rows=4).collect()
    )
    assert est_def == est_84
    est_t = sorted(
        (r.id_a, r.id_b)
        for r in minhash_estimate_pairs(docs, tune_for=(0.5, 32)).collect()
    )
    est_e = sorted(
        (r.id_a, r.id_b)
        for r in minhash_estimate_pairs(
            docs, bands=p.bands, rows=p.rows
        ).collect()
    )
    assert est_t == est_e
    # incremental: tuned == explicit tuned; conflict rejected
    inc_t = sorted(
        (r.new_id, r.corpus_id)
        for r in incremental_minhash_dedup(
            new, docs, tune_for=(0.5, 32)
        ).collect()
    )
    inc_e = sorted(
        (r.new_id, r.corpus_id)
        for r in incremental_minhash_dedup(
            new, docs, bands=p.bands, rows=p.rows
        ).collect()
    )
    assert inc_t == inc_e
    with pytest.raises(ValueError, match="not both"):
        incremental_minhash_dedup(
            new, docs, bands=8, rows=4, tune_for=(0.5, 32)
        )


def test_resolve_banding_rejects_scalar_tune_for():
    """ADVICE r09: a scalar misuse like tune_for=0.5 must get the
    descriptive ValueError, not a bare TypeError from len()."""
    from consume_kafka_avro_data_spark.operators.dedup import resolve_banding

    for bad in (0.5, 32, "0.5,32"):
        with pytest.raises(ValueError, match="tune_for must be"):
            resolve_banding(None, None, bad)
    # a 2-list is as good as a 2-tuple
    from consume_kafka_avro_data_spark.operators.dedup import tune_lsh_params

    p = tune_lsh_params(0.8, 128)
    assert resolve_banding(None, None, [0.8, 128]) == (p.bands, p.rows)

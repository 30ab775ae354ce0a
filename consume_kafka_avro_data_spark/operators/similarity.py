"""Similarity search over embedding columns (charter U6/J8).

Two paths, both pure JVM expressions (no UDF in the hot loop):

* **Brute-force top-k** — exact cosine against literal query vectors;
  the baseline.  Plan shape: map-only score projection + TakeOrdered
  (per-partition heaps, k-row driver merge) — no global sort, no
  shuffle of the corpus.  Right answer up to ~10⁷×small-k; at 100 TB it
  is still the per-bucket verifier.

* **SRP-LSH (signed random projections)** — the scale path: bucket by
  the sign-bit pattern of ``nbits`` random hyperplane projections,
  repeated over ``ntables`` independent tables to boost recall
  (P[same bucket] = (1-θ/π)^nbits per table).  Candidates = bucket
  collisions only; exact cosine re-ranks.  Equivalent in spirit to
  MLlib's BucketedRandomProjectionLSH but kept as plain DataFrame ops so
  the plan stays inspectable and codegen-able end to end.

Dot products accumulate in double (float32 inputs upcast exactly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ, strict left-to-right float64 fold.

    With ``dim`` given, the fold is UNROLLED into a fixed left-assoc
    expression over element_at — bit-identical to the lambda fold
    (IEEE: 0.0 + x == x, then the same addition order) but fully
    whole-stage-codegen'd, where lambda HOFs are interpreted (~20 µs per
    element — the dominant cost of every all-pairs cosine before this).
    Without ``dim`` (variable-length arrays) it falls back to the HOF
    fold, same values."""
    if dim is not None:
        e = F.element_at(a, 1).cast("double") * F.element_at(b, 1).cast("double")
        for i in range(2, dim + 1):
            e = e + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
        return e
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        e = F.element_at(a, 1).cast("double") * F.element_at(a, 1).cast("double")
        for i in range(2, dim + 1):
            x = F.element_at(a, i).cast("double")
            e = e + x * x
        return F.sqrt(e)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for one query vector (ties broken by id so the
    result is a deterministic total order).  The score unrolls to a
    codegen'd expression (dim is known from the literal query vector)."""
    q = _lit_vec(query_vec)
    scored = corpus.select(
        F.col(id_col),
        cosine(F.col(vec_col), q, dim=len(list(query_vec))).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Brute-force k-NN join: broadcast the (small) query side over the
    corpus, score, keep top-k per query via ranked window (Spark ≥3.5
    compiles the rank≤k filter to WindowGroupLimit — per-partition
    partial top-k before the shuffle, so only ~k rows per partition per
    query cross the exchange).

    Norms are precomputed per side BEFORE the crossJoin (same trick as
    ``embedding_neardup_pairs``): inlining ``cosine()`` into the joined
    select recomputes each corpus norm once per query and each query
    norm once per corpus row — |Q|× redundant arithmetic in the dominant
    stage.  The score is dot ÷ (n_corpus·n_query), numerically identical
    to ``cosine()`` (same fold, same operand order).

    ``dim`` is accepted for signature compatibility but the score always
    uses the length-agnostic HOF fold: a column×column crossJoin plans
    as BroadcastNestedLoopJoin, which whole-stage codegen does NOT
    support, so the projection is interpreted either way — and an
    interpreted 64-term unrolled expression tree is ~2× slower per row
    (deep per-node recursion, per-element bounds checks) plus ~1.4 s of
    extra Catalyst analysis for the giant tree (measured at sf0.1).
    Unrolling only pays inside codegen'd projections (literal-vector
    scoring after a scan or hash join — ``brute_force_topk``,
    ``embedding_neardup_pairs``)."""
    from pyspark.sql import Window

    del dim  # see docstring: BNLJ projections never codegen
    c = corpus.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col), dim=None).alias("_cn")
    )
    q = queries.select(
        F.col(query_id),
        F.col(query_vec),
        l2_norm(F.col(query_vec), dim=None).alias("_qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(query_vec), dim=None)
            / (F.col("_cn") * F.col("_qn"))
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# SRP-LSH
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, nbits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((nbits, dim))


def _seq_dot(a, b) -> float:
    """Strict left-to-right float64 dot — the SAME fold order as Spark's
    F.aggregate and DuckDB's list_dot_product, so sign decisions agree
    bit-for-bit across all three (numpy's pairwise summation does not)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def srp_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign-bit pattern of the hyperplane projections.

    Deliberately uses the HOF fold (dim=None), NOT the unrolled dot:
    nbits × dim unrolled literal-vector products per row overflow the
    codegen method limit, and the interpreted fallback then rebuilds
    each literal plane array per evaluation — measured 10× SLOWER than
    the lambda fold here.  Unrolling pays off only for column-column
    dots (the pair-verify cosine), not many-literal-plane sweeps."""
    bits = [
        F.when(dot(vec, _lit_vec(p)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def srp_lsh_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    dim: int = 64,
    nbits: int = 12,
    ntables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of exact-rescored bucket collisions
    across ``ntables`` SRP tables.  The corpus-side bucket ids are
    map-only projections; only colliding rows are scored."""
    cand = None
    for t in range(ntables):
        planes = _hyperplanes(dim, nbits, t, seed)
        q_bucket = int(
            sum((1 << i) for i, p in enumerate(planes) if _seq_dot(query_vec, p) > 0)
        )
        hits = corpus.where(srp_bucket(F.col(vec_col), planes) == F.lit(q_bucket))
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates([id_col])
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic coarse quantizer: Lloyd's k-means on a driver-side
    sample (first ``sample`` ids — deterministic, no RNG over the data),
    unit-normalized so assignment-by-max-cosine == assignment-by-min-L2.

    At 100 TB the sample stays driver-sized (k·dim floats broadcast back
    into the plan as literals); the expensive part — assigning every
    corpus row — runs as a pure JVM expression, one map-only pass that a
    real deployment computes once and persists as a partition column.
    """
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return lloyd_unit_kmeans(x, k=k, iters=iters, seed=seed)


def lloyd_unit_kmeans(
    x: np.ndarray, k: int = 16, iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Pure-numpy Lloyd's iteration over unit-normalized vectors —
    shared by the Spark path (sample collected via DataFrame) and the
    DuckDB oracle (same sample loaded straight from parquet), so both
    derive bit-identical centroids and the IVF query is fully
    oracle-checkable despite k-means being iterative."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sim = x @ cent.T
        assign = sim.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def ivf_assign(
    corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``_ivf_cell`` = argmax-cosine centroid id (1-based).  The
    centroids are unit vectors, so plain dot is cosine up to the row
    norm, which argmax ignores.  Map-only; in production written once as
    a partition/bucket column so probes prune at the file level."""
    # HOF fold on purpose — see srp_bucket: many-literal-vector sweeps
    # overflow codegen and interpret WORSE unrolled than as lambda folds
    scores = F.array(*[dot(F.col(vec_col), _lit_vec(c)) for c in centroids])
    return corpus.withColumn(
        "_ivf_cell", F.array_position(scores, F.array_max(scores)).cast("int")
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` cells whose centroids are
    nearest the query, exact-rescore only their members.  Scan cost drops
    to ~nprobe/n_centroids of the corpus (file-level pruning when the
    cell id is a partition column)."""
    if centroids is None:
        centroids = kmeans_centroids(corpus, k=n_centroids, id_col=id_col, vec_col=vec_col, seed=seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qv = qv / max(np.linalg.norm(qv), 1e-12)
    order = np.argsort(-(centroids @ qv))[:nprobe]
    probe_cells = [int(c) + 1 for c in order]  # 1-based (array_position)
    cand = ivf_assign(corpus, centroids, vec_col).where(
        F.col("_ivf_cell").isin(probe_cells)
    )
    return brute_force_topk(cand.drop("_ivf_cell"), query_vec, k, id_col, vec_col)


def cell_centroids(
    assigned: DataFrame,
    cell_col: str = "_ivf_cell",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell mean unit vector via a GROUPED_AGG pandas UDF — the
    UDAF surface (SURVEY §2.7 U2).  Each cell's vectors arrive as one
    Arrow batch; note grouped-agg UDFs ship the WHOLE group to one
    reducer (no partial combine), so this is right when cells fit a
    task.  For the partial-aggregating scale path use
    ``cell_centroids_jvm``, which this is tested equal to."""
    from pyspark.sql.types import ArrayType, DoubleType

    # explicit GROUPED_AGG: the type-hint path can't express a
    # Series → array-scalar aggregate signature
    @F.pandas_udf(ArrayType(DoubleType()), F.PandasUDFType.GROUPED_AGG)
    def mean_vec(vecs):
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]).mean(axis=0)
        return (m / max(float(np.linalg.norm(m)), 1e-12)).tolist()

    # pandas aggregates cannot mix with JVM aggregates in one agg(),
    # so the member count is a pandas aggregate too
    @F.pandas_udf("long", F.PandasUDFType.GROUPED_AGG)
    def n_vec(vecs):
        return len(vecs)

    return assigned.groupBy(cell_col).agg(
        mean_vec(F.col(vec_col)).alias("centroid"),
        n_vec(F.col(vec_col)).alias("n_members"),
    )


def cell_centroids_jvm(
    assigned: DataFrame,
    cell_col: str = "_ivf_cell",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Partial-agg centroid refresh, no Python: per-component avg over
    the vector column (one ``avg(vec[i])`` per dimension), normalized.
    Tungsten computes map-side partials, so the shuffle carries only
    |cells| × dim running sums per partition — the M-step shape a
    100 TB distributed k-means needs (the E-step is ``ivf_assign``)."""
    comps = [
        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"_m{i}")
        for i in range(dim)
    ]
    agged = assigned.groupBy(cell_col).agg(*comps, F.count(F.lit(1)).alias("n_members"))
    mean = F.array(*[F.col(f"_m{i}") for i in range(dim)])
    norm = F.sqrt(
        F.aggregate(
            F.transform(mean, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return agged.select(
        cell_col,
        F.transform(mean, lambda x: x / F.greatest(norm, F.lit(1e-12))).alias(
            "centroid"
        ),
        "n_members",
    )


def kmeans_distributed(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Full-corpus Lloyd's k-means for the IVF quantizer, distributed:
    E-step = ``ivf_assign`` (pure JVM map-only projection over every
    row), M-step = ``cell_centroids_jvm`` (per-component averages with
    map-side partials).  Only the k×dim centroid matrix round-trips
    through the driver per iteration — the scale-correct shape when the
    corpus outgrows ``kmeans_centroids``'s driver-side sample.

    Deterministic: init = the first k rows by id (no RNG over data),
    iteration order fixed, empty cells keep their previous centroid.
    """
    seed_rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cent = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assigned = ivf_assign(corpus, cent, vec_col)
        got = {
            r["_ivf_cell"]: r["centroid"]
            for r in cell_centroids_jvm(assigned, dim=dim).collect()
        }
        cent = np.array(
            [got.get(c + 1, cent[c]) for c in range(len(cent))], dtype=np.float64
        )
    return cent


def embedding_neardup_pairs(
    corpus: DataFrame,
    cosine_threshold: float = 0.95,
    dim: int = 64,
    nbits: int = 14,
    ntables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup (the dedup-family member over vectors):
    pairs colliding in any SRP table, verified by exact cosine ≥ τ.
    High-cosine pairs collide with probability (1-θ/π)^nbits per table,
    so a handful of tables suffices at τ ≥ 0.95."""
    # norm precomputed once per vector (see queries/similarity.py
    # q_embedding_neardup): the pair stage then evaluates only the
    # unrolled dot + a divide, which stays inside codegen's 64 KB limit
    base = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col), dim=dim).alias("_n"),
    )
    pairs = None
    for t in range(ntables):
        planes = _hyperplanes(dim, nbits, t, seed)
        bucketed = base.select(
            "_id", "_v", "_n", srp_bucket(F.col("_v"), planes).alias("_b")
        )
        a, b = bucketed.alias("a"), bucketed.alias("b")
        p = a.join(
            b, (F.col("a._b") == F.col("b._b")) & (F.col("a._id") < F.col("b._id"))
        ).select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("_va"), F.col("_vb"), dim=dim)
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= cosine_threshold)
    )

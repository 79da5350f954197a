"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the full corpus, ranked per query. The dot products run as
JVM-side `zip_with`/`aggregate` higher-order functions inside codegen — no
Python, no UDF.

Scale path: sign-bit LSH bucketing (axis-aligned hyperplanes here; swap the
projection matrix for random hyperplanes in production). Candidates are
restricted to the query's bucket, turning the all-pairs scan into a
hash-partitioned equi-join on the bucket code — the IVF-style recipe that
holds at billions of vectors. Both variants avoid any driver-side loop.

Determinism: all arithmetic is promoted to double and folded sequentially
(array order), so cosine values are bit-identical across engines; ranking
tie-breaks on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _with_norm(df: DataFrame, vec_col: str = "v") -> DataFrame:
    return df.withColumn(
        "nrm", F.sqrt(F.expr(DOT.format(a=vec_col, b=vec_col)))
    )


def prepare(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Normalise schema: (vec_id, v: array<double>, nrm) with norms precomputed
    once — never recomputed inside the pair join."""
    return _with_norm(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank).

    ``corpus``/``queries`` are `prepare`d frames. The query side is broadcast
    (queries << corpus); ranking is a per-query window over the scored pairs.
    """
    # consolidated F.expr spellings (same Catalyst trees, one py4j
    # round-trip per expression instead of ~5 — SCALE.md r13
    # decomposition); the window rides inside the select expr
    q = queries.selectExpr(
        "vec_id AS query_id", "v AS qv", "nrm AS qn"
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.expr("vec_id != query_id"))
        .withColumn(
            "cos",
            F.expr(f"({DOT.format(a='v', b='qv')}) / (nrm * qn)"),
        )
    )
    return (
        scored.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "ROW_NUMBER() OVER (PARTITION BY query_id"
                " ORDER BY cos DESC, vec_id) AS rank"
            ),
        )
        .filter(F.expr(f"rank <= {int(k)}"))
    )


def signbit_bucket(vec_col: str = "v", n_bits: int = 8) -> F.Column:
    """LSH bucket code: sign bits of the first ``n_bits`` components."""
    code = None
    for i in range(n_bits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code.cast("int")


def random_hyperplanes(
    n_bits: int = 8, dim: int = 64, seed: int = 42
) -> list[list[int]]:
    """Seeded Rademacher (±1) hyperplanes for sign-projection LSH.

    ±1 weights make the projection an exact signed sum of components —
    the same left-associated IEEE-double fold in Spark and in generated
    DuckDB SQL, so bucket codes are bit-identical across engines (a
    gaussian matrix would also work but ±1 keeps the oracle exact and is
    the standard SRP variant). Fixed seed = deterministic plans.
    """
    import random

    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_bits)]


def hyperplane_bucket(
    vec_col: str = "v", n_bits: int = 8, dim: int = 64, seed: int = 42
) -> F.Column:
    """LSH bucket code from seeded random-hyperplane sign projections —
    the production replacement for axis-aligned `signbit_bucket` (which
    only looks at the first n_bits components).

    Round-14 (guide §1 driver-cost class, SCALE.md r13 decomposition):
    built as ONE F.expr string instead of ~n_bits*dim nested Column
    operations — the old spelling cost ~1100 py4j round-trips of pure
    driver time PER CALL (e02 measured 63s at sf0.001, almost all plan
    construction). The parsed tree is the same left-associated
    double-precision sum, so bucket codes are bit-identical."""
    bits = []
    for k, w in enumerate(random_hyperplanes(n_bits, dim, seed)):
        terms = " + ".join(
            f"(element_at({vec_col}, {i + 1}) * {float(wi)}D)"
            for i, wi in enumerate(w)
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0D THEN {1 << k} ELSE 0 END)")
    return F.expr("CAST(" + " + ".join(bits) + " AS INT)")


def hyperplane_bucket_sql(
    vec: str = "v", n_bits: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """DuckDB SQL mirror of :func:`hyperplane_bucket` (same seed → same
    weights → identical buckets)."""
    bits = []
    for k, w in enumerate(random_hyperplanes(n_bits, dim, seed)):
        terms = " + ".join(f"{vec}[{i + 1}] * ({w[i]}.0)" for i in range(dim))
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(bits)


def band_codes(corpus: DataFrame, n_bits: int = 4, dim: int = 64) -> DataFrame:
    """Banded sign-bit LSH: (vec_id, band_idx, band_val).

    The sign bits of the ``dim`` components are split into ``dim // n_bits``
    bands; two vectors are near-dup *candidates* iff they agree on at least
    one whole band (the MinHash-LSH banding trick applied to SRP bits).
    For cos >= 0.45 and 16 bands of 4 bits, per-band collision
    p = (1 - acos(0.45)/pi)^4 ~ 0.18 -> candidate recall ~ 0.96, while the
    candidate count stays near-linear instead of quadratic.
    """
    n_bands = dim // n_bits
    # ONE F.expr string for the whole banded-code array (round-14): the
    # nested-Column spelling cost ~n_bands*n_bits py4j round-trips of
    # driver-side plan construction per call; the parsed tree (same
    # left-associated bit sum, same comparisons) is identical.
    structs = ", ".join(
        "named_struct('band_idx', {j}, 'band_val', CAST({bits} AS INT))".format(
            j=j,
            bits=" + ".join(
                f"(CASE WHEN element_at(v, {j * n_bits + i + 1}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
                for i in range(n_bits)
            ),
        )
        for j in range(n_bands)
    )
    return corpus.select(
        "vec_id", F.expr(f"explode(array({structs}))").alias("bd")
    ).select("vec_id", "bd.band_idx", "bd.band_val")


def neardup_pairs(
    corpus: DataFrame, threshold: float = 0.45, n_bits: int = 4, dim: int = 64
) -> DataFrame:
    """Candidates-then-verify near-duplicate pairs: (a, b, cos).

    Candidate generation is a per-band *equi-join* on (band_idx, band_val) —
    a hash-partitioned shuffle join, never an all-pairs cross product — and
    the exact cosine only runs on surviving candidates. This is the plan
    that holds at corpus scale; an all-pairs a<b theta-join is quadratic.
    """
    bands = band_codes(corpus, n_bits=n_bits, dim=dim)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    na = corpus.select(
        F.col("vec_id").alias("a"), F.col("v").alias("av"), F.col("nrm").alias("an")
    )
    nb = corpus.select(
        F.col("vec_id").alias("b"), F.col("v").alias("bv"), F.col("nrm").alias("bn")
    )
    cos = F.expr(DOT.format(a="av", b="bv")) / (F.col("an") * F.col("bn"))
    return (
        cand.join(na, "a")
        .join(nb, "b")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def quantize_int8(corpus: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: (vec_id, qv:
    array<int>, qn: double). ``q_i = floor(v_i / maxabs * 127 + 0.5)`` —
    the faiss-SQ8-style compression that cuts the candidate-scan bandwidth
    4x (int8 vs float32) at ~1% recall cost. FLOOR(+0.5) instead of
    round() keeps the arithmetic formula identical (and therefore
    bit-identical) across Spark and the DuckDB oracle; int products and
    sums are exact, so quantized scores are fully deterministic."""
    maxabs = F.expr("array_max(transform(v, x -> abs(x)))")
    qv = F.expr("transform(v, x -> CAST(floor(x / _maxabs * 127D + 0.5D) AS INT))")
    qnorm_sq = F.expr(
        "aggregate(zip_with(qv, qv, (x, y) -> CAST(x AS BIGINT) * y), 0L, (acc, x) -> acc + x)"
    )
    return (
        corpus.withColumn("_maxabs", maxabs)
        .filter(F.col("_maxabs") > 0)
        .withColumn("qv", qv)
        .withColumn("qn", F.sqrt(qnorm_sq.cast("double")))
        .drop("_maxabs")
    )


_QDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * y), "
    "0L, (acc, x) -> acc + x)"
)


def quantized_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, n_candidates: int = 50
) -> DataFrame:
    """Quantize-then-rerank ANN: (query_id, neighbor_id, rank).

    Stage 1 scores ALL pairs with the int8 dot product (exact integer
    arithmetic — the cheap scan a real deployment runs over the compressed
    index) and keeps ``n_candidates`` per query; stage 2 re-ranks only the
    candidates with the exact double-precision cosine. At corpus scale the
    stage-1 scan reads 4x less than float and the stage-2 exact work is
    O(queries x n_candidates), independent of corpus size."""
    qc = quantize_int8(corpus)
    q = quantize_int8(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("qn").alias("q_qn"),
    )
    qcos = (
        F.expr(_QDOT.format(a="qv", b="q_qv")).cast("double")
        / (F.col("qn") * F.col("q_qn"))
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("vec_id")
    )
    candidates = (
        qc.select("vec_id", "qv", "qn")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("qcos", qcos)
        .withColumn("crank", F.row_number().over(cand_w))
        .filter(F.col("crank") <= n_candidates)
        .select("query_id", "vec_id")
    )
    nb = corpus.select("vec_id", "v", "nrm")
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("exact_qv"),
        F.col("nrm").alias("exact_qn"),
    )
    cos = F.expr(DOT.format(a="v", b="exact_qv")) / (
        F.col("nrm") * F.col("exact_qn")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        candidates.join(nb, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    hyperplane_seed: int | None = None,
) -> DataFrame:
    """Approximate top-k within the query's LSH bucket: (query_id,
    neighbor_id, rank). The bucket equi-join replaces the cross join —
    candidate count drops ~2^n_bits-fold. With ``hyperplane_seed`` set,
    buckets come from seeded random-hyperplane projections (production
    SRP); otherwise from the axis-aligned sign bits (test baseline)."""
    if hyperplane_seed is not None:
        bucket = hyperplane_bucket("v", n_bits, seed=hyperplane_seed)
        c = corpus.withColumn("bucket", bucket)
        q = queries.withColumn("bucket", bucket).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "bucket",
        )
        scored = (
            c.join(F.broadcast(q), "bucket")
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "cos", F.expr(DOT.format(a="v", b="qv")) / (F.col("nrm") * F.col("qn"))
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
        )
    c = corpus.withColumn("bucket", signbit_bucket("v", n_bits))
    q = queries.withColumn("bucket", signbit_bucket("v", n_bits)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.expr(DOT.format(a="v", b="qv")) / (F.col("nrm") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def kmeans_assign(e: "DataFrame", c: "DataFrame") -> "DataFrame":
    """Nearest-centroid assignment — THE shared primitive of e07 (one
    Lloyd step), d12 (SemDeDup blocking) and kmeans_train's loop, kept in
    one place so the distance formula and tie-break (d2 asc, cid asc)
    cannot drift between them.

    ``e``: (vec_id, v, vv, ...extras); ``c``: (cid, cv, cc) — tiny,
    broadcast. Returns e's rows plus (cid, d2) for the nearest centroid.
    The d2 association order (vv - 2*dot + cc) is part of the float
    determinism contract with the DuckDB oracles."""
    d2 = (
        F.col("vv")
        - 2 * F.expr(DOT.format(a="v", b="cv"))
        + F.col("cc")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        e.crossJoin(F.broadcast(c))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "cv", "cc")
    )


def kmeans_train(
    corpus: DataFrame, k: int = 8, n_iter: int = 5
) -> tuple[list[list[float]], list[float]]:
    """Iterative Lloyd k-means over an embedding corpus — the IVF coarse
    quantizer's training loop (each e03-style index build runs this once).

    Returns (final centroids, per-iteration inertia history). Per
    iteration: centroids broadcast to the executors, nearest-centroid
    assignment is a map-side cross join + per-vector top-1, and the
    centroid update aggregates per (cluster, dimension) via posexplode —
    one shuffle of k*dim partial sums. Only O(k*dim) rows ever reach the
    driver (the centroids themselves), never vector data; corpus size only
    affects the distributed stages, so the loop runs unchanged at any
    scale. Seeding is deterministic (first k vectors by id), making runs
    reproducible.
    """
    from pyspark.sql import Window as W

    spark = corpus.sparkSession
    # cached: every iteration re-reads the corpus projection otherwise
    e = corpus.select("vec_id", "v").withColumn(
        "vv", F.expr(DOT.format(a="v", b="v"))
    ).persist()
    seed_rows = (
        e.orderBy("vec_id").limit(k).select("v").collect()
    )
    centroids = [list(r["v"]) for r in seed_rows]
    history: list[float] = []
    for _ in range(n_iter):
        c_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], ["cid", "cv"]
        ).withColumn("cc", F.expr(DOT.format(a="cv", b="cv")))
        assigned = kmeans_assign(e, c_df).select("vec_id", "cid", "d2", "v")
        assigned = assigned.persist()
        # inertia from a tiny per-cluster aggregate (k rows) — NOT smuggled
        # through the posexplode shuffle, which would replicate each d2
        # value dim times
        inertia = sum(
            r["sd2"]
            for r in assigned.groupBy("cid").agg(F.sum("d2").alias("sd2")).collect()
        )
        stats = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assigned.unpersist()
        dim = len(centroids[0])
        new_c = {cid: list(c) for cid, c in enumerate(centroids)}
        for r in stats:
            new_c.setdefault(r["cid"], [0.0] * dim)
            new_c[r["cid"]][r["pos"]] = r["sx"] / r["n"]
        history.append(float(inertia))
        centroids = [new_c[i] for i in sorted(new_c)]
    e.unpersist()
    return centroids, history


# --- exact-integer Lloyd k-means (SemDeDup production blocking) -------------
# Float Lloyd (kmeans_train above) is the right production trainer, but its
# centroid means are order-dependent float sums, so an external engine can
# never replay the assignment bit-for-bit. For the oracle-gated SemDeDup
# path (d13) we train in EXACT integer arithmetic instead: vectors are
# quantized to bigints (scale 256), centroid updates use integer sums and a
# deterministic floor division, and every intermediate stays integer-valued
# and far below 2^53 — so Spark's bigint aggregates and DuckDB's double
# arithmetic produce identical centroids, identical assignments, identical
# blocks. Quantization costs nothing for BLOCKING quality (clustering is a
# heuristic partitioner here; the dedup decision itself uses the exact
# float cosine on the raw vectors).
#
# Scale posture: centroids never leave the executors (the update is a
# posexplode groupBy re-broadcast, k*dim rows); assignment is a broadcast
# cross join (O(n*k) distance evals, the inherent Lloyd cost); the only
# driver value is the corpus count for choosing k. k scales with the corpus
# (k = n / target_cluster_size, the Abbas et al. SemDeDup regime), holding
# mean cluster size — and therefore the within-cluster pair cost (n/k)^2 —
# constant as the corpus grows.

IDOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
KQ_SCALE = 256


def _kmeans_exact_quantize(e: DataFrame) -> DataFrame:
    """(vec_id, v, ...) -> + vq (bigint, scale 256), aq (= vq*256, the
    vector at centroid scale), aa (= aq·aq, reused by every assignment)."""
    return (
        e.withColumn(
            "vq",
            F.expr(f"transform(v, x -> CAST(FLOOR(x * {KQ_SCALE}) AS BIGINT))"),
        )
        .withColumn("aq", F.expr(f"transform(vq, x -> x * {KQ_SCALE})"))
        .withColumn("aa", F.expr(IDOT.format(a="aq", b="aq")))
    )


def _kmeans_exact_assign(eq: DataFrame, c: DataFrame) -> DataFrame:
    """Nearest-centroid under exact integer distance; ties -> lowest cid.
    ``c``: (cid, cq: array<bigint> at scale 256^2, cc = cq·cq) — tiny,
    broadcast.

    The argmin is ``min(struct(d2, cid))`` — lexicographic struct MIN is
    exactly ORDER BY d2, cid — NOT a row_number window: the window form
    shuffles all n*k scored rows (wide, carrying the vectors) into a
    per-vector sort, which at production k (k ∝ n/64) is an O(n²/64)
    shuffle. The aggregate form reduces map-side inside the broadcast
    cross-join stage, so only n narrow (vec_id, cid) rows shuffle, then
    one n-row equi-join re-attaches the vector columns."""
    d2 = F.col("aa") - 2 * F.expr(IDOT.format(a="aq", b="cq")) + F.col("cc")
    best = (
        eq.select("vec_id", "aq", "aa")
        .crossJoin(F.broadcast(c))
        .select(
            "vec_id",
            F.struct(d2.alias("d2"), F.col("cid").alias("cid")).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(F.min("sc").alias("sc"))
        .select("vec_id", F.col("sc.cid").alias("cid"))
    )
    return eq.join(best, "vec_id")


# Above ~this many centroids the per-row expression arithmetic (k array
# dot products per vector, interpreted inside codegen) loses to an
# Arrow-batched int64 matmul by orders of magnitude — the 25x probe
# measured the expression form's O(n*k) term at ~100s wall for n=50k,
# k=782. Both paths produce IDENTICAL assignments (exact integer
# arithmetic; np.argmin's first-minimum = lowest cid after sorting
# columns by cid), asserted by tests/test_components.py.
KMEANS_NP_THRESHOLD = 32


def _kmeans_exact_assign_np(eq: DataFrame, c_rows) -> DataFrame:
    """Numpy twin of :func:`_kmeans_exact_assign` for large k: centroids
    (O(k*dim) bigints — the one sanctioned driver round-trip, same class
    as kmeans_train's stats) are closed over; each Arrow batch computes
    D2 = -2*A@C.T + cc (the per-row ``aa`` term is constant across
    centroids, so it cannot change the argmin) in exact int64 and emits
    (vec_id, cid)."""
    import numpy as np
    import pandas as pd

    rows = sorted(c_rows, key=lambda r: r["cid"])
    C = np.array([list(r["cq"]) for r in rows], dtype=np.int64)
    cids = np.array([r["cid"] for r in rows], dtype=np.int64)
    cc = (C * C).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:  # np.stack needs at least one array
                continue
            A = np.stack(pdf["aq"].to_numpy()).astype(np.int64)
            d2 = -2 * (A @ C.T) + cc[None, :]
            idx = d2.argmin(axis=1)  # first minimum = lowest cid
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cid": cids[idx]}
            )

    best = eq.select("vec_id", "aq").mapInPandas(
        assign, "vec_id long, cid long"
    )
    return eq.join(best, "vec_id")


def kmeans_plan_k(n: int, target_cluster: int = 64) -> int:
    """The ONE sizing formula: k = max(8, ceil(n / target_cluster)).
    Shared by the trainer and the gates that report k, so the reported
    value can never drift from the k actually trained."""
    import math

    return max(8, math.ceil(n / target_cluster))


def kmeans_exact_train(
    e: DataFrame,
    target_cluster: int = 64,
    n_iter: int = 2,
    k: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train k-means in exact integer arithmetic and return the final
    ``(assignment, centroids)`` pair — assignment is the input columns +
    cid; centroids is the tiny (cid, cq, cc) frame the persisted-index
    build writes as its side file.

    k defaults to :func:`kmeans_plan_k` — production SemDeDup sizing
    (cluster count grows with the corpus so block sizes stay constant);
    callers that already counted the corpus pass ``k`` to skip the scan.
    Seeds are the k lowest vec_ids at centroid scale; each Lloyd update is
    sum/count per (cid, dim) with centroid component floor(sum*256/n) —
    floor of an exactly-representable ratio, deterministic in IEEE double
    and equal to the bigint result. Empty clusters are dropped (their
    members re-home next assignment), identically on both engines.
    """
    if k is None:
        k = kmeans_plan_k(e.count(), target_cluster)
    eq = _kmeans_exact_quantize(e).persist()
    seeds = eq.select("vec_id", "aq").orderBy("vec_id").limit(k)
    c = (
        seeds.withColumn(
            "cid", F.row_number().over(Window.orderBy("vec_id")) - 1
        )
        .select("cid", F.col("aq").alias("cq"))
        .withColumn("cc", F.expr(IDOT.format(a="cq", b="cq")))
    )
    # large k: collect the (tiny) centroid frame once per pass and assign
    # via exact int64 matmul in Arrow batches; small k stays pure-JVM so
    # the oracle gate (k=8 at driver scale) exercises the expression path
    # while the cross-path equality test covers the numpy path
    def assign(frame, cents):
        if k > KMEANS_NP_THRESHOLD:
            return _kmeans_exact_assign_np(frame, cents.collect())
        return _kmeans_exact_assign(frame, cents)

    for _ in range(n_iter):
        a = assign(eq, c)
        c = (
            a.select("cid", F.posexplode("vq").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "cval",
                F.floor(
                    F.col("sx").cast("double") * KQ_SCALE / F.col("cnt")
                ).cast("long"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cq")
            )
            .withColumn("cc", F.expr(IDOT.format(a="cq", b="cq")))
        )
    # materialise the final assignment compactly, then release the wide
    # quantized cache — without this every gate run leaves a corpus-sized
    # (v + vq + aq + aa) frame resident for the session (the cache-pressure
    # class the round-5 probe diagnosed); the checkpoint also stops the
    # gate's pair SELF-join from re-executing the whole training DAG once
    # per side. localCheckpoint blocks are GC-released with the frame.
    # The centroid frame is checkpointed too (k rows) so returning it does
    # not keep the n_iter-deep training DAG alive past eq.unpersist().
    c = c.localCheckpoint(eager=True)
    out = assign(eq, c).drop("vq", "aq", "aa").localCheckpoint(eager=True)
    eq.unpersist()
    return out, c


def kmeans_exact_train_assign(
    e: DataFrame,
    target_cluster: int = 64,
    n_iter: int = 2,
    k: int | None = None,
) -> DataFrame:
    """:func:`kmeans_exact_train` returning only the assignment — the
    SemDeDup-shaped callers (d13) that never need the centroids back."""
    return kmeans_exact_train(e, target_cluster, n_iter, k)[0]


# --- persisted IVF index (build -> parquet partitioned by cell -> query) ----
# The index LIFECYCLE the in-query IVF gates (e03/e05) skip: centroids
# assign every vector to a cell, the index is WRITTEN as parquet
# partitioned by cell id, and a query reads back ONLY its nprobe nearest
# cells — on disk that is partition pruning (Spark's dynamic partition
# pruning once the probe side is a join), the storage-level analogue of
# the reference's index_scan. Assignment reuses the exact-integer
# distance (scale-256 quantization) so an external oracle replays the
# cell layout bit-for-bit.


def ivf_persist_build(
    corpus: DataFrame,
    path: str,
    n_cells: int = 8,
    train_iters: int = 1,
    payload: DataFrame | None = None,
) -> None:
    """Assign each vector to its nearest centroid (exact integer distance,
    ties -> lowest cid) and write the index partitioned by cell (one
    directory per cell, prunable at scan) plus a tiny ``<path>_seeds``
    side file holding the centroids — the query must never scan the whole
    index just to rediscover them.

    ``train_iters`` (default 1) runs that many exact-integer Lloyd
    iterations (:func:`kmeans_exact_train`) so the cells follow the
    ACTUAL key distribution — the production path since e10's
    certification (measured at sf0.1: max/mean cell size 1.18 untrained
    -> 1.06 trained), the same reason the reference builds its indexes
    from the stored key distribution (`components/index/`,
    `services/index/btree_index_disk.cpp`). ``train_iters=0`` is the
    legacy first-``n_cells``-vec_ids seed layout, kept ONLY for gates
    whose oracles replay that exact layout (e09/e12/e13 pin it
    explicitly); new callers should not pass 0.

    ``payload`` (optional): extra filterable attributes keyed by vec_id
    (label, language, license, ...) stored IN the index rows — the
    filtered-vector-search pattern (Milvus/pgvector attribute filtering):
    a metadata predicate at query time then prunes inside the parquet
    scan of the probed cells instead of post-filtering reranked results
    (which silently returns < k hits). One equi-join on vec_id at build
    time; the query path is unchanged except the pushed filter."""
    if train_iters > 0:
        assigned, c = kmeans_exact_train(corpus, n_iter=train_iters, k=n_cells)
        c.coalesce(1).write.mode("overwrite").parquet(path + "_seeds")
        assigned = assigned.select("vec_id", "v", "nrm", "cid")
    else:
        eq = _kmeans_exact_quantize(corpus)
        c = (
            eq.filter(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cid"), F.col("aq").alias("cq"))
            .withColumn("cc", F.expr(IDOT.format(a="cq", b="cq")))
        )
        c.coalesce(1).write.mode("overwrite").parquet(path + "_seeds")
        assigned = _kmeans_exact_assign(eq, c).select(
            "vec_id", "v", "nrm", "cid"
        )
    if payload is not None:
        assigned = assigned.join(payload, "vec_id")
    _ivf_persist_write(assigned, path)


def _ivf_persist_write(assigned: DataFrame, path: str) -> None:
    if assigned.isEmpty():
        # partitionBy over zero rows writes no schema-bearing files and the
        # read side then cannot infer a schema; an UNPARTITIONED empty file
        # keeps the lifecycle total (queries return empty, like the oracle)
        assigned.coalesce(1).write.mode("overwrite").parquet(path)
        return
    (
        assigned.repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )


def _read_live_index(
    spark, path: str, pre_filter: F.Column | str | None = None
) -> DataFrame:
    """Read the persisted IVF index with the delete contract applied:
    ``pre_filter`` (if any) goes first so it reaches the parquet reader as
    a pushed filter inside the probed cells, then the tombstone side file
    (:func:`ivf_persist_delete`) is excluded with one broadcast anti-join.
    EVERY query path over the persisted layout must read through this
    helper — the index layout is shared, so a path that skips the
    anti-join resurrects deleted vectors (the bug class this factoring
    removes: ivf_quantized_query originally read the raw path)."""
    import os

    idx = spark.read.parquet(path)
    if pre_filter is not None:
        idx = idx.filter(pre_filter)
    tomb = path + "_tombstones"
    if os.path.isdir(tomb):
        idx = idx.join(
            F.broadcast(spark.read.parquet(tomb).select("vec_id")),
            "vec_id",
            "left_anti",
        )
    return idx


def ivf_persist_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    pre_filter: F.Column | str | None = None,
) -> DataFrame:
    """Top-k through the persisted index: each query probes its ``nprobe``
    nearest cells (same exact-integer distance as the build), the index
    scan joins on the PARTITION column (dynamic partition pruning — only
    probed cell directories are read), and the exact cosine reranks
    within the candidates. Returns (query_id, neighbor_id, rank).

    ``pre_filter``: optional metadata predicate over index columns (see
    ``ivf_persist_build(payload=...)``), applied to the index scan BEFORE
    the distance compute — it reaches the parquet reader as a pushed
    filter inside the probed cells, and the top-k ranks only qualifying
    vectors (pre-filtering, not the lossy post-filter)."""
    qq = _kmeans_exact_quantize(queries)
    # centroids come from the build-time side file — scanning the index
    # for its seed ROWS would touch every cell directory on every query,
    # eroding exactly the pruning benefit the layout exists for
    idx = _read_live_index(spark, path, pre_filter)
    seeds = spark.read.parquet(path + "_seeds")
    d2 = F.col("aa") - 2 * F.expr(IDOT.format(a="aq", b="cq")) + F.col("cc")
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    probes = (
        qq.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cid").alias("probe_cid"),
        )
    )
    cand = idx.join(
        probes, idx["cid"] == probes["probe_cid"]
    ).filter(F.col("vec_id") != F.col("query_id"))
    cos = F.expr(DOT.format(a="v", b="qv")) / (F.col("nrm") * F.col("qn"))
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def ivf_persist_add(
    spark, path: str, delta: DataFrame, payload: DataFrame | None = None
) -> None:
    """Incrementally add vectors to a persisted IVF index: assign the
    delta against the STORED centroids (the ``<path>_seeds`` side file —
    cells never move on add, the invariant that keeps the operation
    O(delta) and existing cell directories untouched) and APPEND to the
    partitioned layout. Periodic re-training/re-build handles drift, the
    same split the reference makes between index insert and index
    rebuild (`services/index/`, `components/index/`)."""
    seeds = spark.read.parquet(path + "_seeds")
    eq = _kmeans_exact_quantize(delta)
    assigned = _kmeans_exact_assign(eq, seeds).select(
        "vec_id", "v", "nrm", "cid"
    )
    if payload is not None:
        # a payload-bearing index must be appended WITH its payload —
        # a bare append would null the attribute columns for new rows
        assigned = assigned.join(payload, "vec_id")
    if assigned.isEmpty():
        return
    from otterbrix_spark.operators.dml import table_write_lock

    with table_write_lock(path):
        (
            assigned.repartition("cid")
            .write.mode("append")
            .partitionBy("cid")
            .parquet(path)
        )
        # a re-added vec_id must become visible again: clear any
        # matching tombstone, or the anti-join in _read_live_index
        # hides the new row forever (self-review r13 pass 3)
        import os as _os

        tomb = path + "_tombstones"
        if _os.path.exists(tomb):
            tombs = spark.read.parquet(tomb)
            kept = tombs.join(
                assigned.select("vec_id").distinct(), "vec_id", "left_anti"
            )
            if kept.count() < tombs.count():
                pinned = kept.localCheckpoint(eager=True)
                pinned.write.mode("overwrite").parquet(tomb)


def ivf_persist_delete(spark, path: str, ids: DataFrame) -> None:
    """Delete vectors from a persisted IVF index by TOMBSTONE: append the
    ids to the ``<path>_tombstones`` side file — an O(delta) metadata
    write, the partitioned cell layout is untouched. ``ivf_persist_query``
    anti-joins the tombstones (broadcast — the side file stays tiny
    relative to the index) so deleted vectors can never be returned;
    space is reclaimed at the next full rebuild, the same
    delete-as-tombstone / compact-on-rebuild split every LSM-ish index
    makes (reference: index drop/modify in `services/index/`,
    `components/index/` — the disk layouts there also defer physical
    reclamation)."""
    from otterbrix_spark.operators.dml import table_write_lock

    with table_write_lock(path):
        ids.select("vec_id").write.mode("append").parquet(
            path + "_tombstones"
        )


def ivf_quantized_query(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 12,
) -> DataFrame:
    """The production ANN stack COMPOSED: partition-pruned IVF candidate
    generation (ivf_persist_query's probe path) -> int8 quantized
    stage-1 scoring over the probed cells (quantize_int8's SQ8 scheme,
    4x less candidate bandwidth) -> exact-cosine rerank of the
    ``shortlist`` survivors. At 100 TB this is the shape that matters:
    the float vectors are touched only for shortlist x queries rows;
    everything corpus-sized moves through int8 products inside pruned
    cell directories. Deterministic end-to-end (integer dots, single
    divisions), so the whole composition is exactly oracle-replayable."""
    qq = _kmeans_exact_quantize(queries)
    idx = _read_live_index(spark, path)
    seeds = spark.read.parquet(path + "_seeds")
    d2 = F.col("aa") - 2 * F.expr(IDOT.format(a="aq", b="cq")) + F.col("cc")
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    probes = (
        qq.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("query_v"),
            F.col("nrm").alias("query_nrm"),
            F.col("cid").alias("probe_cid"),
        )
    )
    # SQ8 both sides (identical FLOOR(+0.5) formula as quantize_int8)
    qprobes = (
        quantize_int8(
            probes.select(
                F.col("query_id").alias("vec_id"),
                F.col("query_v").alias("v"),
            ).distinct()
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("query_qv"),
            F.col("qn").alias("query_qn"),
        )
    )
    qidx = quantize_int8(idx.select("vec_id", "v", "nrm", "cid"))
    cand = (
        qidx.join(probes, qidx["cid"] == probes["probe_cid"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qprobes), "query_id")
    )
    qcos = F.expr(_QDOT.format(a="qv", b="query_qv")).cast("double") / (
        F.col("qn") * F.col("query_qn")
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("vec_id")
    )
    short = (
        cand.withColumn("qcos", qcos)
        .withColumn("crank", F.row_number().over(ws))
        .filter(F.col("crank") <= shortlist)
    )
    cos = F.expr(DOT.format(a="v", b="query_v")) / (
        F.col("nrm") * F.col("query_nrm")
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        short.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


# --- product quantization (PQ) ------------------------------------------------
# The memory-compression leg of the ANN stack (Jégou et al. 2011, the
# reference's vector-index family: components/index/): vectors are split
# into n_sub subspaces, each subspace gets its own small codebook
# (exact-integer k-means — the d13 trainer's arithmetic), and a vector is
# stored as n_sub one-byte codes. Query-time ranking is the asymmetric
# distance (ADC): a per-query lookup table of (subspace, code) -> d2 —
# n_sub*k_codes entries, broadcast — summed over each stored vector's
# codes, so the scored stream is (vec_id, m, code) integers, never raw
# vectors. All arithmetic is exact integer (scale-256 quantization,
# floor-division centroid updates), so an external engine replays
# training, encoding, and ADC ranking bit-for-bit.


def pq_subvectors(e: DataFrame, n_sub: int, sub_dim: int) -> DataFrame:
    """(vec_id, m, svq, saq, ss): per-subspace quantized slices at the
    trainer's scales (svq = floor(v*256) slice, saq = svq*256,
    ss = saq·saq)."""
    eq = e.withColumn(
        "vq",
        F.expr(f"transform(v, x -> CAST(FLOOR(x * {KQ_SCALE}) AS BIGINT))"),
    )
    sub = eq.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(mi).alias("m"),
                        F.expr(
                            f"slice(vq, {mi * sub_dim + 1}, {sub_dim})"
                        ).alias("svq"),
                    )
                    for mi in range(n_sub)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.svq")
    return sub.withColumn(
        "saq", F.expr(f"transform(svq, x -> x * {KQ_SCALE})")
    ).withColumn("ss", F.expr(IDOT.format(a="saq", b="saq")))


def _pq_assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest codebook entry per (vec_id, m); ties -> lowest code. Same
    min(struct) argmin as _kmeans_exact_assign — only narrow
    (vec_id, m, code) rows shuffle."""
    d2 = (
        F.col("ss")
        - 2 * F.expr(IDOT.format(a="saq", b="cq"))
        + F.col("cc")
    )
    best = (
        sub.join(F.broadcast(cb), "m")
        .select(
            "vec_id",
            "m",
            F.struct(d2.alias("d2"), F.col("code").alias("code")).alias("sc"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("sc").alias("sc"))
        .select("vec_id", "m", F.col("sc.code").alias("code"))
    )
    return sub.join(best, ["vec_id", "m"])


def pq_train_encode(
    e: DataFrame, n_sub: int = 4, k_codes: int = 8, n_iter: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns ``(codes, codebook)``: codes = (vec_id, m, code) — the stored
    compressed representation, n_sub small ints per vector; codebook =
    (m, code, cq, cc) — n_sub * k_codes rows, broadcastable everywhere.
    Seeds are the k_codes lowest vec_ids' subvectors (identically per
    subspace); each Lloyd update is the d13 floor-division integer mean.
    Empty codes drop out and re-home next assignment, as in the trainer.
    """
    dim = len(e.select("v").first()["v"])
    sub_dim = dim // n_sub
    if sub_dim * n_sub != dim:
        raise ValueError(f"PQ: dim {dim} not divisible by n_sub {n_sub}")
    sub = pq_subvectors(e, n_sub, sub_dim).persist()
    seeds = (
        sub.select("vec_id").distinct().orderBy("vec_id").limit(k_codes)
        .withColumn(
            "code", F.row_number().over(Window.orderBy("vec_id")) - 1
        )
    )
    cb = (
        sub.join(seeds, "vec_id")
        .select("m", "code", F.col("saq").alias("cq"))
        .withColumn("cc", F.expr(IDOT.format(a="cq", b="cq")))
    )
    for _ in range(n_iter):
        a = _pq_assign(sub, cb)
        cb = (
            a.select("m", "code", F.posexplode("svq").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "cval",
                F.floor(
                    F.col("sx").cast("double") * KQ_SCALE / F.col("cnt")
                ).cast("long"),
            )
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cq")
            )
            .withColumn("cc", F.expr(IDOT.format(a="cq", b="cq")))
        )
    cb = cb.localCheckpoint(eager=True)
    codes = (
        _pq_assign(sub, cb)
        .select("vec_id", "m", "code")
        .localCheckpoint(eager=True)
    )
    sub.unpersist()
    return codes, cb


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries_sub: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: (q_id, rank, vec_id, adc).

    The per-query LUT (q_id, m, code, d2) has |queries| * n_sub * k_codes
    rows — broadcast; stored codes join it on (m, code) and sum to the
    ADC, so the ranking never touches a raw corpus vector: that is the
    PQ memory contract (n_sub bytes + one LUT lookup per subspace per
    candidate at 100 TB scale)."""
    d2 = (
        F.col("ss")
        - 2 * F.expr(IDOT.format(a="saq", b="cq"))
        + F.col("cc")
    )
    lut = (
        queries_sub.select(F.col("vec_id").alias("q_id"), "m", "saq", "ss")
        .join(codebook, "m")
        .select("q_id", "m", "code", d2.alias("d2"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2").alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy("adc", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", F.col("adc").cast("long").alias("adc"))
    )


def ivf_persist_compact(spark, path: str) -> dict:
    """Fold the tombstone side file into the cell layout — the LSM-style
    compaction :func:`ivf_persist_delete` defers: rewrite ONLY the cell
    directories holding tombstoned vectors (Spark's DYNAMIC partition
    overwrite replaces exactly the partitions present in the written
    frame), remove directories whose every vector was deleted, then
    truncate the side file. Cost is O(affected cells), never O(index);
    the surviving cells' files are not touched (asserted by the e16
    gate's mtime audit). The kept rows are checkpointed BEFORE the
    overwrite so the job never reads the directories it is replacing.

    Returns {"cells_rewritten", "ids_removed"} — driver-side metadata
    scalars only."""
    import os
    import shutil

    from otterbrix_spark.operators.dml import table_write_lock

    tomb = path + "_tombstones"
    if not os.path.exists(tomb):
        return {"cells_rewritten": 0, "ids_removed": 0}
    # serialize against concurrent add/delete: a delete landing between
    # the tombstone read and the truncate below would be LOST, silently
    # resurrecting its vector (self-review r13 pass 3)
    with table_write_lock(path):
        return _ivf_compact_locked(spark, path, tomb, os, shutil)


def _ivf_compact_locked(spark, path: str, tomb: str, os, shutil) -> dict:
    tombs = spark.read.parquet(tomb).select("vec_id").distinct()
    n_removed = tombs.count()
    if n_removed == 0:
        return {"cells_rewritten": 0, "ids_removed": 0}
    idx = spark.read.parquet(path)
    affected = [
        r["cid"]
        for r in idx.join(tombs, "vec_id", "left_semi")
        .select("cid")
        .distinct()
        .collect()  # O(#cells) metadata scalars
    ]
    if affected:
        keep = (
            idx.filter(F.col("cid").isin(affected))
            .join(F.broadcast(tombs), "vec_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        surviving = {
            r["cid"] for r in keep.select("cid").distinct().collect()
        }
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                keep.repartition("cid")
                .write.mode("overwrite")
                .partitionBy("cid")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        for cid in affected:
            if cid not in surviving:
                shutil.rmtree(
                    os.path.join(path, f"cid={cid}"), ignore_errors=True
                )
    spark.range(0).select(F.col("id").alias("vec_id")).write.mode(
        "overwrite"
    ).parquet(tomb)
    return {"cells_rewritten": len(affected), "ids_removed": n_removed}

"""Connected-components (dedup clustering) unit tests — the alternating
large-star/small-star algorithm must converge in few rounds even on
chain-shaped graphs (the worst case for plain min-label propagation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otterbrix_spark.llm.dedup import connected_components


def test_chain_graph_converges(spark):
    nodes = spark.range(12).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], "a: long, b: long")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {**{i: 0 for i in range(11)}, 11: 11}


def test_two_components_and_isolates(spark):
    nodes = spark.range(10).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(5, 3), (3, 1), (8, 9), (9, 7)], "a: long, b: long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got[5] == got[3] == got[1] == 1
    assert got[8] == got[9] == got[7] == 7
    assert got[0] == 0 and got[2] == 2 and got[4] == 4 and got[6] == 6


def test_duplicate_and_reversed_edges(spark):
    nodes = spark.range(4).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3)], "a: long, b: long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1}


def test_long_chain_bounded_rounds(spark):
    # a 60-node chain: min-label propagation would need ~60 rounds; the
    # star algorithm must finish inside the default max_iter=16
    nodes = spark.range(60).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([(i, i + 1) for i in range(59)], "a: long, b: long")
    got = connected_components(nodes, edges, max_iter=16)
    assert {r["cluster_id"] for r in got.collect()} == {0}


def test_kmeans_train_converges(spark, sf_dir):
    from otterbrix_spark.llm import similarity
    from otterbrix_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = similarity.prepare(emb)
    centroids, history = similarity.kmeans_train(corpus, k=4, n_iter=3)
    assert len(centroids) == 4 and len(centroids[0]) == 64
    # Lloyd's algorithm never increases inertia
    assert all(b <= a * (1 + 1e-9) for a, b in zip(history, history[1:]))


def test_decontaminate_flags_known_overlap(spark):
    # a train doc sharing a 13-gram with the eval doc is flagged; one with
    # no shared gram is not; a doc shorter than 13 words cannot be flagged
    from pyspark.sql import functions as F

    from otterbrix_spark.llm import text as text_ops

    shared = " ".join(f"w{i}" for i in range(13))
    rows = [
        (1, "A", f"prefix {shared} suffix"),
        (2, "A", " ".join(f"x{i}" for i in range(20))),
        (3, "B", "too short to ever match"),
    ]
    train = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    eval_docs = spark.createDataFrame(
        [(99, "E", f"lead-in {shared} tail words here")],
        ["doc_id", "source", "text"],
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in text_ops.decontaminate(train, eval_docs, n=13).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_cross_doc_duplicate_chunks_marks_shared_paragraph(spark):
    from otterbrix_spark.llm import dedup

    para = " ".join(f"p{i}" for i in range(10))
    other = " ".join(f"q{i}" for i in range(10))
    rows = [
        (1, "A", f"{para} {other}"),   # chunk 1 shared, chunk 2 unique
        (2, "B", f"{para} extra word"),  # chunk 1 shared (tail dropped)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    marked = dedup.cross_doc_duplicate_chunks(
        docs, chunk_words=10, carry=("source",)
    ).collect()
    dup_by_doc = {}
    for r in marked:
        dup_by_doc.setdefault(r["doc_id"], []).append(r["dup"])
    assert sorted(dup_by_doc[1]) == [0, 1]  # shared + unique chunk
    assert dup_by_doc[2] == [1]


def test_kmeans_assign_numpy_path_equals_expression_path(spark, sf_dir):
    """The Arrow/numpy assignment (large-k fast path) must produce the
    IDENTICAL (vec_id, cid) mapping as the JVM expression path — exact
    integer arithmetic on both sides, ties to lowest cid."""
    from pyspark.sql import functions as F

    from otterbrix_spark.llm import similarity
    from otterbrix_spark.llm.similarity import (
        _kmeans_exact_assign,
        _kmeans_exact_assign_np,
        _kmeans_exact_quantize,
    )
    from otterbrix_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    eq = _kmeans_exact_quantize(similarity.prepare(emb))
    # duplicate centroids force distance ties: the tie-break must agree
    seeds = eq.orderBy("vec_id").limit(40)
    from pyspark.sql import Window

    c = (
        seeds.withColumn(
            "cid", F.row_number().over(Window.orderBy("vec_id")) - 1
        )
        .select("cid", F.col("aq").alias("cq"))
        .withColumn("cc", F.expr(similarity.IDOT.format(a="cq", b="cq")))
    )
    dup = c.filter(F.col("cid") == 0).select(
        (F.col("cid") + 40).alias("cid"), "cq", "cc"
    )
    c = c.unionByName(dup)
    jvm = {
        (r["vec_id"], r["cid"])
        for r in _kmeans_exact_assign(eq, c).select("vec_id", "cid").collect()
    }
    np_ = {
        (r["vec_id"], r["cid"])
        for r in _kmeans_exact_assign_np(eq, c.collect())
        .select("vec_id", "cid")
        .collect()
    }
    assert jvm == np_


def test_quantized_query_respects_tombstones(spark, sf_dir, tmp_path):
    """Every query path over ONE persisted index layout must apply the
    tombstone anti-join (ADVICE r7: ivf_quantized_query read the raw
    path, so deleted vectors could resurface through the quantized
    stack)."""
    import os

    from otterbrix_spark.llm import similarity
    from otterbrix_spark.sources.registry import load_table

    corpus = similarity.prepare(load_table(spark, str(sf_dir), "embeddings"))
    path = os.path.join(str(tmp_path), "ivf_idx")
    similarity.ivf_persist_build(corpus, path, n_cells=8, train_iters=1)
    queries = corpus.filter(F.col("vec_id") < 3)
    before = {
        r["neighbor_id"]
        for r in similarity.ivf_quantized_query(
            spark, path, queries, k=5, nprobe=2
        ).collect()
    }
    assert before, "quantized query returned nothing"
    # delete every neighbor the quantized path just returned
    similarity.ivf_persist_delete(
        spark, path, corpus.filter(F.col("vec_id").isin([*before]))
    )
    after = {
        r["neighbor_id"]
        for r in similarity.ivf_quantized_query(
            spark, path, queries, k=5, nprobe=2
        ).collect()
    }
    assert not (after & before), (
        "tombstoned vectors resurfaced through the quantized path"
    )

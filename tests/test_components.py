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


def test_decontaminate_api_matches_gate_counts(spark, sf_dir):
    # the library decontaminate() must agree with the t10 gate's
    # per-source contamination counts (same gram arithmetic, same split)
    from pyspark.sql import functions as F

    from otterbrix_spark.llm import text as text_ops
    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.workload import load_all

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("t10:"), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 100
    )
    base = docs.withColumn("is_eval", bucket < 10)
    flagged = text_ops.decontaminate(
        base.filter(~F.col("is_eval")), base.filter(F.col("is_eval")), n=13
    )
    api = {
        (r["source"]): (r["n"], r["c"])
        for r in flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("contaminated").cast("int")).alias("c"),
        )
        .collect()
    }
    gate = {
        r["source"]: (r["n_train_docs"], r["n_contaminated"])
        for r in load_all()["t10_decontamination"].spark_fn(spark, sf_dir).collect()
    }
    assert api == gate and len(gate) > 0


def test_paragraph_dedup_api_matches_gate_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from otterbrix_spark.llm import dedup
    from otterbrix_spark.sources.registry import load_table
    from otterbrix_spark.workload import load_all

    docs = load_table(spark, sf_dir, "documents")
    marked = dedup.cross_doc_duplicate_chunks(docs, chunk_words=10)
    api = marked.agg(
        F.count(F.lit(1)).alias("n_chunks"), F.sum("dup").alias("n_dup")
    ).collect()[0]
    gate_rows = load_all()["d11_paragraph_dedup"].spark_fn(spark, sf_dir).collect()
    gate_chunks = sum(r["n_chunks"] for r in gate_rows)
    gate_dup = sum(r["n_dup_chunks"] for r in gate_rows)
    assert (api["n_chunks"], api["n_dup"]) == (gate_chunks, gate_dup)

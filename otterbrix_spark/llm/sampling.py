"""Deterministic corpus sampling: train/val/test splits and weighted
source mixing for training-data pipelines.

The assignment primitive is a content-addressed bucket — `md5(doc_id)`'s
first 15 hex chars as a 60-bit int, mod 100 — NOT `rand()`. Three
properties matter at 100 TB:

* **reproducible**: re-running the pipeline (or re-reading a lost
  partition, or running the same split on another cluster) assigns every
  document to the same split. `rand()` cannot promise any of that under
  task retry.
* **join-free**: the split label is a pure projection; no membership
  table to build, persist, or broadcast.
* **cross-engine checkable**: DuckDB reproduces the exact buckets
  (`('0x' || SUBSTR(md5(...), 1, 15))::BIGINT % 100`), so the oracle gate
  verifies assignments bit-for-bit — same trick as the minhash family
  (llm/dedup.py).

Reference anchor: the reference has no sampling operators (its scope is
query execution, SURVEY.md §2); these belong to the training-data-pipeline
layer the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 100


def hash_bucket(col: Column) -> Column:
    """Deterministic [0, 100) bucket from the md5 of a column's string form."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return (h.cast("long") % N_BUCKETS).alias("bucket")


def hash_bucket_sql(expr: str) -> str:
    """DuckDB expression reproducing :func:`hash_bucket` bit-for-bit."""
    return (
        f"(('0x' || SUBSTR(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {N_BUCKETS})"
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Label each row train/val/test by its hash bucket (train+val+test=100).

    Buckets [0, train) -> train, [train, train+val) -> val, rest -> test.
    A pure narrow projection: no shuffle, no state, safe under retry.
    """
    b = hash_bucket(F.col(id_col))
    label = (
        F.when(b < train, "train")
        .when(b < train + val, "val")
        .otherwise("test")
    )
    return df.withColumn("split", label)


def weighted_keep(
    df: DataFrame, id_col: str, rate_col: Column
) -> DataFrame:
    """Keep each row with probability `rate_col`/100, deterministically.

    `rate_col` is an integer percentage column (may vary per row — per-source
    mixing weights). A row survives iff its hash bucket < rate: re-running
    always keeps the same rows, and the realised rate converges to the
    target as corpus size grows (exactly the up/down-sampling primitive a
    domain-mixture recipe needs).
    """
    return df.filter(hash_bucket(F.col(id_col)) < rate_col)

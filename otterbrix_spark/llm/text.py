"""Text analysis for training-data pipelines: tokenisation, language ID,
quality scoring, fingerprinting.

Design rules:
  - pure `pyspark.sql.functions` expressions — whole-stage-codegen'd, no UDFs;
  - deterministic arithmetic only (integer counts, ratios, single IEEE ops) so
    results are reproducible across engines and cluster topologies — no
    transcendental functions in any emitted value;
  - every transformer is a narrow map over the documents table: embarrassingly
    parallel, no shuffle, scales linearly to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WORD_SPLIT = r"\s+"
# BPE-ish surface tokeniser: word runs or single non-space punctuation
TOKEN_PATTERN = r"\w+|[^\w\s]"

# tiny deterministic stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "und", "das", "ist"),
}


def words(col: Column) -> Column:
    return F.split(col, WORD_SPLIT)


def token_count(col: Column) -> Column:
    """Count of BPE-ish surface tokens (regex word-runs + punctuation)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0))


def whitespace_token_count(col: Column) -> Column:
    return F.size(words(col))


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit counts + predicted language.

    Heuristic language ID: score each language by stopword hits over the
    token stream; argmax with a fixed tie-break order (en > es > de) keeps
    the prediction deterministic.
    """
    df = df.withColumn("_w", words(F.col(text_col)))
    for lang in STOPWORDS:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        df = df.withColumn(f"score_{lang}", F.expr(f"size(filter(_w, x -> x IN ({lst})))"))
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es")) & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when(F.col("score_es") >= F.col("score_de"), "es")
        .otherwise("de")
    )
    return df.withColumn("pred_lang", pred).drop("_w")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + a deterministic [0,1] score.

    Components: lexical diversity (unique/total words) and non-stopword
    ratio, combined 50/50. All-integer counts and double divisions only.
    """
    df = df.withColumn("_w", words(F.col(text_col)))
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    df = (
        df.withColumn("n_words", F.size("_w"))
        .withColumn("n_unique", F.size(F.array_distinct("_w")))
        .withColumn("n_stop", F.expr(f"size(filter(_w, x -> x IN ({en})))"))
        .withColumn(
            "sum_word_len",
            F.expr("aggregate(transform(_w, x -> octet_length(x)), 0, (a, x) -> a + x)"),
        )
    )
    diversity = F.col("n_unique") / F.col("n_words")
    non_stop = 1 - F.col("n_stop") / F.col("n_words")
    return (
        df.withColumn("avg_word_len", F.col("sum_word_len") / F.col("n_words"))
        .withColumn("quality", diversity * 0.5 + non_stop * 0.5)
        .drop("_w")
    )


def fingerprint(col: Column) -> Column:
    """Normalised document fingerprint: md5 over lowercased,
    whitespace-collapsed text. Identical fingerprints == exact duplicates
    modulo case/whitespace."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), WORD_SPLIT, " ")))


def ngram_hashes(df: DataFrame, n: int = 13, text_col: str = "text") -> DataFrame:
    """Explode each document into 60-bit md5 hashes of its word-level
    ``n``-grams: (doc_id, h). Documents shorter than ``n`` words produce no
    rows. The hash is engine-portable (md5 prefix), so gram sets can be
    compared across systems."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit("[^ ]+"), 0)
    return (
        df.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {n - 1}), i -> "
                    "CAST(conv(substr(md5(concat_ws(' ', slice(toks, i, "
                    f"{n}))), 1, 15), 16, 10) AS BIGINT))"
                )
            ).alias("h"),
        )
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, n: int = 13
) -> DataFrame:
    """GPT-3-style eval-set decontamination: flag every training document
    sharing any word-level ``n``-gram with the eval corpus.

    Returns ``train`` plus a boolean ``contaminated`` column. The eval
    gram set is distinct-reduced and broadcast (eval corpora are tiny
    next to training corpora); the train side explodes streamingly into a
    broadcast LEFT SEMI join — no all-pairs comparison, no driver
    collect, the shape that holds at 100 TB of training text."""
    eval_grams = ngram_hashes(eval_docs, n=n).select("h").distinct()
    bad = (
        ngram_hashes(train, n=n)
        .join(F.broadcast(eval_grams), "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_contaminated", F.lit(True))
    )
    return train.join(bad, "doc_id", "left").withColumn(
        "contaminated", F.coalesce(F.col("_contaminated"), F.lit(False))
    ).drop("_contaminated")

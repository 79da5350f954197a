"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All candidate generation is join-based (hash-partitioned on shingle / band /
signature keys) — the classic shuffle-then-verify shape that scales to
cluster-sized corpora. Nothing collects to the driver.

Determinism: the hash family is built from `md5` (identical hex output in
Spark and DuckDB, so the correctness oracle can replay the exact algorithm).
MinHash minima are taken over hex strings — lexicographic MIN over fixed-
width hex equals numeric MIN, and stays engine-portable.

Scale notes (100 TB posture):
  - shingle explosion is a flatMap (no shuffle); the per-doc signature is one
    hash-partitioned groupBy (map-side partial MIN);
  - LSH banding turns the O(n²) pair space into per-band hash joins on the
    band value — the standard approach for web-scale near-dedup;
  - the final Jaccard verification joins only candidate pairs, and the
    shingle-match join is pre-filtered by a semi-join against candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from otterbrix_spark.llm.text import WORD_SPLIT

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2
HASH_PREFIX_LEN = 8  # first 8 hex chars of md5 are plenty for minima


def _fan_out(df: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    """(id, text) fanned out across the cluster for the CPU-heavy explode
    passes below: a corpus that fits in one 128MB scan split would
    otherwise run the entire shingle+hash pipeline in a single task
    (measured 40x slowdown). At real scale the input arrives in many
    splits and the guard repartition is a no-op shuffle of small rows.

    When the input is already hash-clustered on ``id_col`` at or above
    the target width — the ``persist_clustered`` warm-cache layout stamps
    ``_otx_clustered_key`` — the guard shuffle is skipped outright: the
    clustered cache already satisfies the distribution, and because its
    plan is compiled AQE-off the downstream per-id groupBy elides its
    exchange too (round-13 optimization pass; the signature path then
    runs shuffle-free end to end)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    clustered = getattr(df, "_otx_clustered_key", None)
    sel = df.select(id_col, *extra, text_col)
    if clustered is not None and clustered[0] == id_col and clustered[1] >= target:
        return sel
    return sel.repartition(target, F.col(id_col))


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """k-word shingles per document: (id_col, shingle).

    ``distinct=True`` (the set view) is required for Jaccard counts;
    MIN-based minhash signatures are unaffected by duplicates, so the
    signature path passes ``distinct=False`` and saves a whole shuffle.
    """
    # Build the complete shingle array INSIDE one array expression and only
    # then explode: rows after the Generate carry just (id, shingle). The
    # naive alternative — explode positions, then index into the word array —
    # drags the whole array through every exploded row and measured 18x
    # slower at 10x scale. The CASE-null + filter guards docs shorter than
    # k words (sequence(0, negative) would produce a *descending* range).
    terms = ", ".join(f"_w[i + {j}]" for j in range(k))
    shingle_array = (
        f"filter(transform(sequence(0, size(_w) - 1), "
        f"i -> CASE WHEN i <= size(_w) - {k} THEN concat_ws(' ', {terms}) END), "
        f"x -> x IS NOT NULL)"
    )
    # Fan the documents out across the cluster BEFORE the explode (or reuse
    # the clustered-cache layout when it already provides the distribution
    # — see _fan_out).
    docs = _fan_out(df, id_col, text_col)
    out = (
        docs.withColumn("_w", F.split(F.col(text_col), WORD_SPLIT))
        .select(F.col(id_col), F.explode(F.expr(shingle_array)).alias("shingle"))
    )
    if not distinct:
        return out
    # Round-14 (guide §5): PIN the distinct shingle set. Every
    # distinct=True consumer (jaccard/containment/LSH gates) references
    # the frame from 3-6 subtrees and Spark reuses none of them (plan
    # audit: d03 ran the tokenize+md5 explode SIX times, zero
    # ReusedExchange); the localCheckpoint materialises the already-
    # shuffled distinct output once. 100 TB caveat: checkpoint blocks
    # live on executors unreplicated — a production pipeline would
    # checkpoint() shingle sets to reliable storage (VERDICT r13 #4).
    return out.distinct().localCheckpoint(eager=False)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash window: every row annotated with its
    group's canonical (minimum) id and group size.

    Round-14 (guide §2.4): one window over the fingerprint replaces the
    former groupBy + join-back diamond — that shape scanned the input
    twice and joined on fp, and at corpus scale the group table has ~one
    row per document (content hashes are near-unique), so the join-back
    could never broadcast and cost a second full shuffle + sort. The
    window is ONE shuffle on fp and one pass; identical output for any
    non-NULL text. (One deliberate edge improvement: rows with NULL
    ``text_col`` hash to a NULL fingerprint and now form their own group
    — the old inner join-back silently dropped them. No tested corpus
    contains NULL text; documented for API callers.)"""
    w = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .select(
            id_col,
            F.min(id_col).over(w).alias("canonical_id"),
            F.count(F.lit(1)).over(w).alias("group_size"),
        )
    )


# XOR-permutation constants (fixed 60-bit values); h_i = base_hash XOR XC[i]
# gives num_hashes independent min-wise permutations from ONE md5 per
# shingle — 8x less hashing than per-seed md5 with identical LSH behaviour.
XOR_CONSTANTS = (
    0x243F6A8885A308D,  # digits of pi — arbitrary, fixed, engine-portable
    0x13198A2E0370734,
    0xA4093822299F31D,
    0x082EFA98EC4E6C8,
    0x452821E638D0137,
    0xBE5466CF34E90C6,
    0xC0AC29B7C97C50D,
    0x3F84D5B5B547091,
)


def minhash_signatures(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Per-document MinHash signature columns h0..h{n-1} from a shingle frame.

    base = first 15 hex chars of md5(shingle) as a 60-bit int;
    h_i(doc) = MIN over shingles of (base XOR XOR_CONSTANTS[i]) — one md5 per
    shingle, one groupBy, map-side-combinable integer MINs.
    """
    # single-F.expr forms of the base hash and each MIN aggregate: the
    # Catalyst trees are identical to the Column-op spelling, but each
    # expression costs ONE py4j round-trip instead of ~5 (driver-side
    # construction is a visible slice of per-query latency; SCALE.md
    # round-13 decomposition)
    hashed = sh.withColumn(
        "_h",
        F.expr("CAST(CONV(SUBSTRING(MD5(shingle), 1, 15), 16, 10) AS BIGINT)"),
    )
    aggs = [
        F.expr(f"MIN(_h ^ {XOR_CONSTANTS[i]}L) AS h{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_signature_str(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(id, signature) where signature concatenates all minima — identical
    signatures are near-duplicate candidates at band-size = num_hashes."""
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cols = ", ".join(f"CAST(h{i} AS STRING)" for i in range(num_hashes))
    return sigs.select(
        id_col, F.expr(f"CONCAT_WS(':', {cols}) AS signature")
    )


def lsh_bands(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """(id, band_idx, band_val) rows — each document's LSH band values
    (concatenations of `band_size` consecutive minhash values). The band
    frame is both the self-join input of :func:`lsh_candidate_pairs` and
    the PERSISTED state of an incremental dedup index (d15): stored
    bucketed on the band value, a delta batch's bands join it with no
    shuffle on the index side."""
    if num_hashes % band_size != 0:
        # a remainder would silently DROP hashes (paid for in the
        # signature, never banded), lowering recall below what the
        # (num_hashes, band_size) parameters imply; band_size >
        # num_hashes would yield ZERO bands and an empty candidate set
        # with no error (self-review r13 pass 3)
        raise ValueError(
            f"band_size {band_size} must evenly divide "
            f"num_hashes {num_hashes}"
        )
    sigs = minhash_signatures(sh, id_col, num_hashes)
    n_bands = num_hashes // band_size
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"h{b * band_size + j}").cast("string")
                                for j in range(band_size)
                            ],
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")


def lsh_candidate_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one LSH band.

    The pair space is generated by a self-equi-join on (band_index,
    band_value) — a hash-partitioned shuffle join, never a cross join.
    """
    # pin the band frame: both self-join sides consume it, and without the
    # checkpoint the signature aggregation + band explode run twice
    # (round-14; same unreplicated-blocks caveat as the shingles pin)
    bands = lsh_bands(sh, id_col, num_hashes, band_size).localCheckpoint(
        eager=False
    )
    left = bands.select(
        F.col(id_col).alias("a"), F.col("band_idx"), F.col("band_val")
    )
    right = bands.select(
        F.col(id_col).alias("b"), F.col("band_idx"), F.col("band_val")
    )
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
    with_union: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (all shared-shingle
    pairs when ``candidates`` is None): (a, b, common, jaccard >= threshold).

    ``max_df`` caps the document frequency of JOIN shingles (a posting-list
    cap — standard web-scale practice): a stop-word-like shingle shared by
    df documents contributes O(df²) join rows while carrying no near-dup
    signal, so without the cap the all-pairs form is quadratic in hot-shingle
    frequency at corpus scale. Jaccard denominators (per-doc set sizes)
    always use the FULL shingle sets, so surviving pairs keep exact scores;
    pairs whose only shared shingles are hot are dropped (they are far below
    any useful threshold anyway). The df filter is one map-side-combined
    groupBy plus a semi-join on the same key as the pair join."""
    join_sh = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        join_sh = sh.join(rare, "shingle", "left_semi")
    a = join_sh.select(F.col(id_col).alias("a"), "shingle")
    b = join_sh.select(F.col(id_col).alias("b"), "shingle")
    if candidates is not None:
        # Round-14 (guide §2.3/§3): intersect per CANDIDATE pair instead
        # of enumerating every shared-shingle pair in the corpus and
        # semi-joining candidates after the aggregate. The former shape
        # was the uncapped all-pairs join — O(df²) rows per hot shingle —
        # run in full only to be filtered; this one is linear in the
        # candidate set (the LSH output): candidates pick up a-side
        # shingles by doc, then match b-side rows on (b, shingle). The
        # per-pair common counts are identical; pairs without a shared
        # join-shingle drop out of the inner join exactly as they dropped
        # out of the grouped all-pairs form. The guards reproduce the old
        # path's insensitivity to malformed candidate input (a >= b rows
        # could never match an a < b pair; duplicates must not double
        # common).
        cand = (
            candidates.select("a", "b")
            .filter(F.col("a") < F.col("b"))
            .distinct()
        )
        common = (
            cand.join(a, "a")
            .join(b, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        common = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    out = (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("common"))
        .withColumn("jaccard", F.col("common") / F.col("uni"))
        .filter(F.col("jaccard") >= threshold)
    )
    # ``with_union`` exposes the exact integer denominator so callers can
    # compare Jaccard against a threshold by cross-multiplication
    # (100*common >= pct*uni) instead of a float ratio (d19)
    cols = ["a", "b", "common"] + (["uni"] if with_union else []) + ["jaccard"]
    return out.select(*cols)


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Per-document SimHash over the distinct word set.

    Word hash = first ceil(bits/4) hex chars of md5 (bits wide, max 60 so
    the value stays positive in a signed int64); each bit contributes
    ±1 to its position's balance; the sign of the balance sets the output
    bit (ties -> 0). Returns (id, simhash). 16 bits is the d06 legacy
    width; the PAIRING gate (d20) uses 60 bits — band cardinality, and
    with it the pigeonhole join's collision rate, scales with width
    (Manku et al. use 64-bit fingerprints for exactly this reason).
    """
    if bits > 60:
        raise ValueError("simhash: bits > 60 overflows a signed int64")
    hex_chars = (bits + 3) // 4
    wrds = (
        _fan_out(df, id_col, text_col)  # same single-split guard as shingles()
        .withColumn("_w", F.split(F.col(text_col), WORD_SPLIT))
        .select(F.col(id_col), F.explode("_w").alias("word"))
        .distinct()
        .withColumn(
            "hv",
            F.conv(
                F.substring(F.md5("word"), 1, hex_chars), 16, 10
            ).cast("long"),
        )
    )
    balance_aggs = [
        F.sum(
            (F.shiftright(F.col("hv"), j).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    balances = wrds.groupBy(id_col).agg(*balance_aggs)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return balances.select(F.col(id_col), sim.cast("long").alias("simhash"))


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 16,
) -> DataFrame:
    """Cluster assignment over a similarity graph: every node labelled with
    the minimum reachable node id (its connected component / dedup cluster).

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round is two
    groupBy+join passes over the edge set, and the round count is
    O(log² n) — *independent of graph diameter*, unlike plain min-label
    propagation whose O(diameter) rounds degrade on chain-shaped duplicate
    clusters. Per round:

      - large-star: every node connects its strictly-larger neighbours to
        the minimum of its neighbourhood (including itself);
      - small-star: every node connects its smaller-or-equal neighbours
        (and itself) to its minimum smaller neighbour.

    At the fixpoint the edge set is a forest of stars rooted at each
    component's minimum id. `localCheckpoint` truncates lineage between
    rounds (same driver-fixpoint machinery as the recursive-CTE operator);
    the convergence probe is two `exceptAll` emptiness jobs per round.

    ``edges`` is (a, b) pairs; symmetry/self-loops handled here. Returns
    (id_col, cluster_id).
    """
    e = (
        edges.select(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("g"))
        .filter(F.col("s") != F.col("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        # large-star
        sym = e.select(F.col("s").alias("u"), F.col("g").alias("v")).unionByName(
            e.select(F.col("g").alias("u"), F.col("s").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("s"), F.greatest("v", "m").alias("g"))
            .filter(F.col("s") != F.col("g"))
            .distinct()
        )
        # small-star over (g -> s) directed-down edges
        down = ls.select(F.col("g").alias("u"), F.col("s").alias("v"))
        mins2 = down.groupBy("u").agg(F.min("v").alias("mn"))
        ss = (
            down.join(mins2, "u")
            .select(F.col("v").alias("n"), F.col("mn"))
            .unionByName(mins2.select(F.col("u").alias("n"), F.col("mn")))
            .select(F.least("n", "mn").alias("s"), F.greatest("n", "mn").alias("g"))
            .filter(F.col("s") != F.col("g"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # convergence probe: counts first (cheap — most rounds change the
        # edge count); when equal, ONE exceptAll suffices (|A| = |B| and
        # A\B = {} imply A = B for the distinct edge sets)
        n_new = ss.count()
        converged = n_new == n_edges and ss.exceptAll(e).isEmpty()
        e, n_edges = ss, n_new
        if converged:
            break
    comp = (
        e.select(F.col("g").alias("node"), F.col("s").alias("label"))
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("label", F.col("node")).alias("cluster_id"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS algorithm): hash every positioned k-gram, slide a window of
    ``window`` consecutive hashes, keep each window's minimum; the distinct
    kept hashes are the fingerprint set. Guarantee: documents sharing any
    run of >= window + k - 1 words share at least one fingerprint.

    Plan: one explode + two window functions over (doc, position) — a
    single hash-partitioned shuffle on the doc id; no UDF, no pair join.
    Returns (id_col, fingerprint).
    """
    terms = ", ".join(f"_w[i + {j}]" for j in range(k))
    gram_array = (
        f"filter(transform(sequence(0, size(_w) - 1), "
        f"i -> CASE WHEN i <= size(_w) - {k} THEN concat_ws(' ', {terms}) END), "
        f"x -> x IS NOT NULL)"
    )
    docs = _fan_out(df, id_col, text_col)
    grams = (
        docs.withColumn("_w", F.split(F.col(text_col), WORD_SPLIT))
        .select(F.col(id_col), F.posexplode(F.expr(gram_array)).alias("pos", "gram"))
        .withColumn(
            "hv", F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast("long")
        )
    )
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(window - 1), 0)
    seq = Window.partitionBy(id_col).orderBy("pos")
    cnt = Window.partitionBy(id_col)
    return (
        grams.withColumn("fp", F.min("hv").over(win))
        .withColumn("rn", F.row_number().over(seq))
        .withColumn("n", F.count(F.lit(1)).over(cnt))
        # robust-winnowing short-doc rule: a document with fewer than
        # `window` k-grams still emits ONE fingerprint (the global min)
        # — otherwise exact duplicates of short documents can never
        # match (self-review r13 pass 3)
        .filter(
            (F.col("rn") >= window)
            | ((F.col("n") < window) & (F.col("rn") == F.col("n")))
        )
        .select(F.col(id_col), F.col("fp").alias("fingerprint"))
        .distinct()
    )


def paragraph_chunks(
    df: DataFrame, chunk_words: int = 10, text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Aligned ``chunk_words``-word chunk hashes per document — the
    paragraph proxy for Lee-et-al.-style substring-level dedup:
    (doc_id, *carry, h). Tail words short of a full chunk are dropped;
    ``carry`` columns ride along so downstream aggregations need no join
    back to the document table."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit("[^ ]+"), 0)
    return (
        _fan_out(df, "doc_id", text_col, *carry)  # single-split guard (round-13)
        .select("doc_id", *carry, toks.alias("toks"))
        .filter(F.size("toks") >= chunk_words)
        .select(
            "doc_id", *carry,
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST(size(toks) / {chunk_words} "
                    "AS INT) - 1), "
                    "k -> CAST(conv(substr(md5(concat_ws(' ', "
                    f"slice(toks, k * {chunk_words} + 1, {chunk_words}))), "
                    "1, 15), 16, 10) AS BIGINT))"
                )
            ).alias("h"),
        )
    )


def cross_doc_duplicate_chunks(
    df: DataFrame, chunk_words: int = 10, text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Chunk hashes duplicated across >= 2 DISTINCT documents, at the
    (doc_id, h) grain: (doc_id, *carry, h, cnt, dup) where ``cnt`` is the
    number of instances of chunk ``h`` inside the document.

    Round-13 optimization (guide §2.3/§2.4): the former shape consumed the
    chunk frame twice (a groupBy-by-h branch and a join-back branch), so
    the CPU-heavy tokenize+md5 explode ran TWICE per query and the join
    shuffled every chunk instance. Now: one pre-aggregation to the
    (h, doc_id) grain (map-side combinable; within-doc duplicate instances
    collapse to a count) and one count window over h replace the
    self-join diamond — the explode runs once and only grain rows ever
    shuffle. ``dup`` is unchanged: h appears in >= 2 distinct documents
    (grain rows per h ARE distinct documents).

    INVARIANT (ADVICE r13): every ``carry`` column must be functionally
    dependent on ``doc_id`` (document metadata, one value per document).
    A doc_id appearing with two carry values would split into two grain
    rows and mark its own chunks dup; all in-tree callers pass per-doc
    columns, and new callers must too."""
    chunks = paragraph_chunks(
        df, chunk_words=chunk_words, text_col=text_col, carry=carry
    )
    grain = chunks.groupBy("h", "doc_id", *carry).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return grain.withColumn(
        "dup", (nd > 1).cast("int")
    )


def containment_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """One-sided CONTAINMENT near-dup pairs: (a, b, common, containment)
    where containment = |A ∩ B| / min(|A|, |B|).

    Jaccard under-scores subset duplicates: a document fully embedded in a
    much larger one has |A∩B|/|A∪B| ≈ |A|/|B| (arbitrarily small) but
    containment 1.0 — the quote/boilerplate-inclusion case (Lee et al.
    "Deduplicating Training Data..." track both). Mechanics are d03's
    df-capped shared-shingle equi-join with a different scoring
    denominator; the same posting-list cap bounds hot shingles."""
    join_sh = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        join_sh = sh.join(rare, "shingle", "left_semi")
    a = join_sh.select(F.col(id_col).alias("a"), "shingle")
    b = join_sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return (
        common.join(
            sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a"
        )
        .join(
            sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b"
        )
        .withColumn(
            "containment", F.col("common") / F.least("na", "nb")
        )
        .filter(F.col("containment") >= threshold)
        .select("a", "b", "common", "containment")
    )

"""Deduplication operators for training-data pipelines.

Four dedup families over a ``(doc_id BIGINT, text STRING)`` corpus, all
expressed as declarative DataFrame programs over JVM built-ins — the only
shuffles are the keyed groupBys/joins listed per operator, every one of
them on a bounded or salt-splittable key, so the plans survive a 100×
scale-up:

- exact:          hash-groupBy on md5(text); one shuffle on the 128-bit
                  hash (uniform — no skew by construction).
- MinHash + LSH:  shingle → h32 → K permuted mins (one hash-aggregate) →
                  band keys → self-join per band (shuffle key =
                  (band_id, 4-minhash band key): near-uniform) → exact
                  Jaccard verification of candidates only.
- n-gram Jaccard: inverted shingle join; shuffle key = shingle.
                  ``max_shingle_df`` caps Zipf-head shingles — the DEFAULT
                  ("auto") derives the cap from the corpus's shingle-df
                  histogram, because a df=d head shingle contributes d²
                  candidate rows; exact mode (None) is opt-in.
- SimHash:        32-bit tf-weighted fingerprint in ONE hash-aggregate
                  (32 conditional sums — no explode-by-bit), byte-banded
                  candidate join, Hamming-distance filter.

The reference has no dedup (single-container vector index); these extend
the engine per the training-pipeline brief.  Hash spec: functions/hashing.py
(pinned, versioned — the reference pins meaning via its model file the
same way, /root/reference/llama.go:20-36).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..functions.hashing import (
    MINHASH_BANDS,
    MINHASH_ROWS,
    h32_col,
    minhash_perm_col,
)

NGRAM_W = 3          # shingle width (tokens)
JACCARD_T = 0.5      # near-dup threshold (pairs at/above are dups)
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 2  # true near-dups sit at 0-2; background starts ≥3 (measured)
#: band groups larger than this are dropped from candidate generation — an
#: all-duplicates flood would otherwise form ONE quadratic join group (those
#: rows are exact-dedup's job, and they'd already be caught there)
MAX_BAND_SIZE = 1024
#: auto shingle-df cap: smallest df covering this fraction of distinct
#: shingles (the Zipf head above it is dropped from candidate generation)
SHINGLE_DF_QUANTILE = 0.995
#: floor for the auto cap — on mostly-unique corpora (≥ quantile of distinct
#: shingles at df=1, the norm for w-gram shingles over natural text) the raw
#: quantile degenerates to 1, which would exclude every REPEATED shingle and
#: silently find zero pairs.  df ≤ 8 contributes ≤ 64 candidate rows per
#: shingle — nowhere near the quadratic head the cap exists to cut.
SHINGLE_DF_CAP_MIN = 8


# -- shared shingling -------------------------------------------------------

def shingles_col(tokens: Column, w: int = NGRAM_W) -> Column:
    """Distinct w-token shingles (space-joined).  Guarded so short docs
    yield [] (Spark's ``sequence`` would otherwise count *down*)."""
    mk = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(w - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, w)),
    )
    return F.array_distinct(
        F.when(F.size(tokens) >= w, mk).otherwise(F.array().cast("array<string>"))
    )


def doc_shingles(docs: DataFrame, w: int = NGRAM_W) -> DataFrame:
    """(doc_id, shingle) exploded-distinct, plus per-doc set size."""
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"), w)).alias("shingle")
    )
    return sh


def shingle_set_sizes(sh: DataFrame) -> DataFrame:
    return sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))


# -- 1. exact dedup ---------------------------------------------------------

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Per-doc annotation: (doc_id, text_md5, keeper_id, is_dup).

    keeper = min(doc_id) within each md5(text) group; is_dup marks rows a
    pipeline would drop.  One shuffle, keyed on the uniform 128-bit hash.
    """
    h = docs.withColumn("text_md5", F.md5(F.col("text").cast("string")))
    w = Window.partitionBy("text_md5")
    return h.select(
        "doc_id",
        "text_md5",
        F.min("doc_id").over(w).alias("keeper_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


# -- 2. MinHash + LSH -------------------------------------------------------

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mhK-1): K permuted minima in one hash-aggregate.

    The input explode is the only wide stage; the aggregate does map-side
    partial mins, so the shuffle carries ≤ K longs per (mapper, doc).
    """
    h = sh.withColumn("h", h32_col(F.col("shingle")))
    perms = [minhash_perm_col(F.col("h"), j).alias(f"p{j}") for j in range(16)]
    ph = h.select("doc_id", *perms)
    return ph.groupBy("doc_id").agg(
        *[F.min(f"p{j}").alias(f"mh{j}") for j in range(16)]
    )


def band_guard(df: DataFrame, keys: list[str], max_band_size: int) -> DataFrame:
    """Drop rows of band groups larger than ``max_band_size`` (count window
    over ``keys``) — THE shared guard for every banded self-join in the
    engine (MinHash, SimHash, embedding LSH): the join's shuffle key is the
    band key, so this bounds any join group at ``max_band_size``² pairs
    regardless of how degenerate the corpus is."""
    w = Window.partitionBy(*keys)
    return df.withColumn("band_n", F.count("*").over(w)).filter(
        F.col("band_n") <= max_band_size
    )


def _guarded_band_pairs(banded: DataFrame, max_band_size: int) -> DataFrame:
    """Self-join a (doc_id, band_id, band_key) table into candidate pairs
    behind :func:`band_guard`."""
    kept = band_guard(banded, ["band_id", "band_key"], max_band_size)
    a = kept.alias("a")
    bb = kept.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


def lsh_candidates(sig: DataFrame, max_band_size: int = MAX_BAND_SIZE) -> DataFrame:
    """Banded self-join: pairs sharing ≥1 of MINHASH_BANDS band keys."""
    bands = []
    for b in range(MINHASH_BANDS):
        cols = [f"mh{b * MINHASH_ROWS + r}" for r in range(MINHASH_ROWS)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band_id"),
                F.concat_ws("_", *[F.col(c).cast("string") for c in cols]).alias("band_key"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    return _guarded_band_pairs(banded, max_band_size)


def _verified_pairs(pairs: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs; output (a_id, b_id, jacc_micro).

    Candidates are SIZE-PRUNED before the expensive common-shingle join:
    J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so pairs whose set sizes differ by
    more than the threshold ratio cannot qualify — an exact necessary
    condition (results identical, oracles unchanged) that drops the bulk
    of loose candidates cheaply (two equi-joins on doc ids vs the
    per-shared-shingle join it replaces)."""
    sizes = shingle_set_sizes(sh)
    sized = (
        pairs.join(
            sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("set_size", "sa"),
            "a_id",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("set_size", "sb"),
            "b_id",
        )
        .filter(
            F.least("sa", "sb").cast("double")
            >= F.lit(threshold) * F.greatest("sa", "sb").cast("double")
        )
    )
    # exact common-shingle count via double equi-join on (pair, shingle)
    a_sh = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    jacc = (
        sized.join(a_sh, "a_id")
        .join(b_sh, ["b_id", "shingle"])
        .groupBy("a_id", "b_id", "sa", "sb")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jacc",
            F.col("common").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jacc") >= F.lit(threshold))
    )
    return jacc.select(
        "a_id", "b_id", F.round(F.col("jacc") * 1e6).cast("bigint").alias("jacc_micro")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_T,
    w: int = NGRAM_W,
    max_band_size: int = MAX_BAND_SIZE,
    cache_handle: list | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidates + exact verification.

    ``cache_handle``: pass a list to persist the shingle table across its
    consumers (signatures + size prune + exact verify re-derive it ~5×
    otherwise — measured ~2× wall at sf0.1); the caller unpersists the
    appended handles after materializing the result (the pack_sequences
    cache_handle contract)."""
    sh = doc_shingles(docs, w)
    if cache_handle is not None:
        sh = sh.persist()
        cache_handle.append(sh)
    cand = lsh_candidates(minhash_signatures(sh), max_band_size)
    return _verified_pairs(cand, sh, threshold)


# -- 3. exact n-gram Jaccard (inverted-index join) --------------------------

def auto_shingle_df_cap(sh: DataFrame, quantile: float = SHINGLE_DF_QUANTILE) -> int:
    """Derive the Zipf-head cutoff FROM CORPUS STATS: the smallest df value
    covering ≥ ``quantile`` of distinct shingles.

    Computed from the df *histogram* (distinct df values — thousands of
    rows at any corpus size), collected to the driver: an exact integer
    order statistic both engines reproduce bit-for-bit (the DuckDB oracle
    uses the equivalent cume_dist window — oracle_sql_pipeline.py).
    """
    dfs = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    hist = sorted(
        (int(r["sdf"]), int(r["n"]))
        for r in dfs.groupBy("sdf").agg(F.count("*").alias("n")).collect()
    )
    total = sum(n for _, n in hist)
    acc = 0
    for sdf, n in hist:
        acc += n
        if acc >= quantile * total:
            return max(sdf, SHINGLE_DF_CAP_MIN)
    return max(hist[-1][0], SHINGLE_DF_CAP_MIN) if hist else SHINGLE_DF_CAP_MIN


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_T,
    w: int = NGRAM_W,
    max_shingle_df: int | None | str = "auto",
    cache_handle: list | None = None,
) -> DataFrame:
    """All pairs with Jaccard ≥ threshold, via self-join on shingle.

    ``max_shingle_df`` drops Zipf-head shingles from *candidate generation*
    (pairs sharing only ultra-common shingles are skipped — the standard
    scale approximation); verification stays exact over all shingles.
    The DEFAULT ``"auto"`` derives the cap from the corpus's shingle-df
    distribution (:func:`auto_shingle_df_cap`) — a df=d head shingle
    contributes d² candidate rows to the inverted join, so the uncapped
    exact mode (``None``) is opt-in for small corpora / verification only.
    """
    sh = doc_shingles(docs, w)
    if cache_handle is not None:
        # the shingle table feeds the auto-cap df histogram, both sides of
        # the inverted candidate join, the size prune and the exact verify
        # — persist once (cache_handle contract: caller unpersists)
        sh = sh.persist()
        cache_handle.append(sh)
    cand_sh = sh
    if max_shingle_df == "auto":
        max_shingle_df = auto_shingle_df_cap(sh)
    if max_shingle_df is not None:
        # Broadcast the OVER-cap head set and anti-join: the head is the
        # Zipf tip (thousands of shingles by construction — it's the ≤
        # (1-quantile) tail of the distinct-shingle distribution), while
        # the under-cap side is ~all distinct shingles and would OOM every
        # executor as a broadcast at corpus scale.  Semantics identical to
        # the inner join on (sdf <= cap): every shingle has sdf >= 1, so
        # NOT-in-head == sdf <= cap.
        dfs = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        head = dfs.filter(F.col("sdf") > max_shingle_df).select("shingle")
        cand_sh = sh.join(F.broadcast(head), "shingle", "left_anti")
    a = cand_sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = cand_sh.select(F.col("doc_id").alias("b_id"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verified_pairs(pairs, sh, threshold)


# -- 4. SimHash -------------------------------------------------------------

def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): 32-bit tf-weighted SimHash.

    One explode + ONE hash-aggregate with 32 conditional sums — no
    per-bit explode, so the shuffle is |docs|×|distinct terms| rows in,
    |docs| rows of 32 longs out (map-side partial sums apply).
    """
    tf = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("h", h32_col(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tf.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    max_band_size: int = MAX_BAND_SIZE,
    cache_handle: list | None = None,
) -> DataFrame:
    """Candidate pairs whose byte-banded SimHashes collide, filtered by
    Hamming distance ≤ max_hamming.  Output (a_id, b_id, hamming INT).
    Band groups above ``max_band_size`` are dropped (a corpus of identical
    fingerprints would otherwise form one unbounded join group).

    ``cache_handle``: persist the fingerprint aggregate across the four
    band branches + both self-join sides (cache_handle contract — the
    caller unpersists after materializing)."""
    fps = simhash_fingerprints(docs)
    if cache_handle is not None:
        fps = fps.persist()
        cache_handle.append(fps)
    bands = []
    for i in range(4):
        bands.append(
            fps.select(
                "doc_id",
                "simhash",
                F.lit(i).alias("band_id"),
                F.shiftright(F.col("simhash"), i * 8).bitwiseAND(F.lit(255)).alias("band_key"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    kept = band_guard(banded, ["band_id", "band_key"], max_band_size)
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

"""Resumable distributed index build (SURVEY.md §3.2, §7.1 M2-M4).

The reference's build is a sequential in-memory loop: embed → normalize →
append → serialize (/root/reference/index.go:44-50, index_codec.go:16-43).
The distributed re-expression is three phases, each a checkpointed Spark
job, so a killed build resumes where it stopped (north_rule "resumable from
per-partition checkpoints with lineage"):

P0  stage    assign stable doc_ids (operators/docids.py), tokenize for dl,
             write the docs table partitioned into work units; record
             global stats (n_docs, avgdl) — the build-time precomputation
             that makes queries cheap (the reference's normalize-at-insert
             pattern, /root/reference/index.go:88-101).
P1  segments per pending unit: retokenize → explode → partial-agg tf →
             ONE shuffle keyed on (term, doc_bucket) → applyInPandas
             encodes sorted posting runs into delta+varint blocks.
             ``doc_bucket = doc_id // doc_bucket_size`` is the *salt*: a
             Zipf-head term ("the") is split across buckets, so no reducer
             ever sees more than one bucket's postings for one term — and
             because the salt is a doc-range, bucket runs concatenate in
             global docID order with no re-sort (SURVEY.md §7.4).
             Checkpoint row per unit after its files land.
P2  finalize dictionary (df/cf/idf per term) + per-unit metrics (terms,
             postings, bytes, skew factor — north_star) computed purely
             from block *metadata* (no payload decode), snapshot commit
             with lineage.

Scale notes (the 10^12-turn story):
- The only full-data shuffles are the tf groupBy and the (term, doc_bucket)
  encode — both keyed on bounded groups (≤ doc_bucket_size postings).
- The dictionary is never broadcast or collected: block upper bounds are
  stored idf-free (codec.make_blocks) and idf applies at query time.
- Unit count bounds resume granularity; a unit is one Spark job whose
  output commits atomically via the checkpoint ledger.
"""

from __future__ import annotations

import time
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec
from ..analyzer import tokens_col
from ..functions.bm25 import idf_col
from ..sources.index_store import IndexStore
from .docids import assign_doc_ids

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_bucket", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_ids_delta", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        T.StructField("block_min_dl", T.IntegerType(), False),
        T.StructField("block_max_raw", T.DoubleType(), False),
        T.StructField("cf_block", T.LongType(), False),
    ]
)


def stage_docs(spark: SparkSession, transcripts: DataFrame, store: IndexStore, n_units: int) -> dict:
    """P0: stable docIDs + dl, written per unit.  Returns staged stats."""
    cache_handle: list = []
    docs = assign_doc_ids(transcripts, cache_handle=cache_handle)
    # NULL text must count as dl=0, not be silently excluded from avgdl —
    # the oracle tokenizes None to [] and counts the doc (rank identity
    # depends on both engines seeing the same avgdl)
    docs = docs.withColumn("dl", F.coalesce(F.size(tokens_col("text")), F.lit(0)))
    docs = docs.withColumn(
        "doc_bucket", (F.col("doc_id") / store.doc_bucket_size).cast("int")
    ).withColumn("unit", F.pmod(F.col("doc_bucket"), F.lit(n_units)).cast("int"))
    # corpus stats observed DURING the staging write — the re-read
    # aggregation job this replaces re-scanned the entire staged corpus
    # (text included) purely for three scalars
    obs = Observation("stage_stats")
    docs = docs.observe(
        obs, F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"), F.sum("dl").alias("total")
    )
    docs.write.mode("overwrite").partitionBy("unit").parquet(store.docs_path())
    for cached in cache_handle:
        cached.unpersist()

    row = obs.get
    if int(row["n"]) == 0:
        raise ValueError(
            "stage_docs: input corpus is empty — nothing to index "
            "(0 rows after docID assignment)"
        )
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"] or 0.0),
        "total_tokens": int(row["total"] or 0),
        "doc_bucket_size": store.doc_bucket_size,
        "term_buckets": store.term_buckets,
        "n_units": n_units,
    }
    store.write_stats(stats)
    store.mark_docs_staged(stats["n_docs"], n_units)
    store.commit_snapshot("stage_docs", {"n_docs": stats["n_docs"], "n_units": n_units})
    return stats


def _python_width(spark: SparkSession) -> int:
    """Target concurrency for the build's PYTHON (Arrow) stages.

    Defaults to the cluster parallelism — on a multi-executor cluster every
    executor has its own memory bus and the Arrow stages scale with cores.
    ``SPARK_GRAFT_PY_WIDTH`` overrides it for SINGLE-HOST local mode, where
    the tokenize/factorize kernels are memory-bandwidth-bound and one
    shared bus saturates well below the thread count (measured on the
    sandbox VM: memory-bound numpy throughput peaks at 8-16 workers and
    DEGRADES at 32 — 34.4 → 31.8 ops/s — while ALU-bound work scales to
    2.7×; running 32 concurrent Arrow tasks burned 2.3× the CPU-seconds of
    the 8-wide run for identical output).  This is a host-shape knob, not
    a data-size knob: it caps concurrent Python tasks, never partition
    sizing, so correctness and the 10^12-row plan shape are unchanged.
    """
    import os

    env = os.environ.get("SPARK_GRAFT_PY_WIDTH")
    if env:
        return max(2, int(env))
    par = spark.sparkContext.defaultParallelism
    if spark.sparkContext.master.startswith("local"):
        # single shared memory bus: steal-free sweep on the sandbox's
        # 32-core host found width 8-16 fastest (units phase 22.7s at 12
        # vs 29.4s at 32, identical output); 12 is the midpoint default
        return min(par, 12)
    return par


#: REFERENCE tf-row schema (pandas/JVM semantic twins below + property
#: tests).  The PRODUCTION exchange uses TF_TID_SCHEMA — see _tf_arrow_fn.
TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("doc_bucket", T.IntegerType(), False),
    ]
)

#: PRODUCTION tf exchange schema — dictionary-encoded: the shuffle ships a
#: fixed 24 bytes of payload per posting (term-id hash, doc_id, packed
#: tf|dl) plus the term STRING exactly once per (term, doc_bucket, map
#: batch) in the mostly-NULL ``term`` column; doc_bucket is derived from
#: doc_id on the reduce side, never shipped.  Measured at 140k turns
#: (BENCH.md r5): tf-exchange shuffle-write 42.2 → 36.9 MB (−12.6%) vs
#: the string-per-posting schema, with the exchange sort now on longs;
#: combined with the zstd shuffle codec (scripts/bench session default)
#: total build shuffle-write drops 698 → 360 bytes/turn (−48%) — the
#: build phase is memory-bus/network-bound at scale, so exchange bytes
#: are the lever.
TF_TID_SCHEMA = T.StructType(
    [
        T.StructField("tid", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tfdl", T.LongType(), False),
        T.StructField("term", T.StringType(), True),
    ]
)


def _tf_batches(batches):
    """mapInPandas tf computation (the build's hot stage).

    Grouping runs on INTEGER keys, not object strings: tokens factorize to
    codes (one C hash pass), then (doc, term) pairs collapse via
    ``np.unique`` on the composite int64 key ``doc_idx·|vocab| + code`` —
    measured 1.6× the whole stage (2.5× the non-tokenize part) vs the
    previous pandas object-groupby, same output (order-insensitive; the
    encoder re-sorts after its shuffle anyway).  Overflow-safe: doc_idx <
    batch rows (~10⁴) and |vocab| < flat token count, so the product stays
    far below 2^63 at any Arrow batch size."""
    import numpy as np

    from ..analyzer import tokenize_pandas

    for pdf in batches:
        toks = tokenize_pandas(pdf["text"])
        lens = toks.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            continue
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        codes, uniques = pd.factorize(flat, sort=False)
        doc_idx = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
        key = doc_idx * len(uniques) + codes
        uk, tf = np.unique(key, return_counts=True)
        u_doc = uk // len(uniques)
        u_code = uk % len(uniques)
        yield pd.DataFrame(
            {
                "term": uniques.take(u_code),
                "doc_id": pdf["doc_id"].to_numpy()[u_doc],
                "tf": tf.astype("int32"),
                "dl": lens[u_doc].astype("int32"),
                "doc_bucket": pdf["doc_bucket"].to_numpy()[u_doc].astype("int32"),
            }
        )


def _tf_arrow_fn(doc_base: int, bucket_base: int, doc_bucket_size: int):
    """mapInArrow tf stage factory — the build's hot stage (Arrow-native),
    emitting the dictionary-encoded TF_TID_SCHEMA rows.

    Semantics equal :func:`_tf_batches` (property-tested via the
    reconstruction in tests/test_property_fuzz.py) but the tokenize→count
    pipeline stays in Arrow C++ buffers — ``tokenize_arrow`` (lower →
    regex split → flatten → filter), ``dictionary_encode`` for integer
    term codes, then the composite-key ``np.unique`` trick to collapse
    (doc, term) pairs (overflow note: doc_idx·|vocab| stays far below
    2^63 at any Arrow batch size).

    Exchange-payload design (the build is memory-bus-bound; bytes through
    the shuffle are the measured lever):

    - ``tid``: a 64-bit hash of the term (vectorized ``pd.util
      .hash_array`` over the batch vocabulary — deterministic across
      executor processes, INTERNAL to one job: it is the shuffle/run key
      only, never persisted; the on-disk format keeps the term string and
      the layout keeps xxhash64 term_bucket).
    - ``tfdl``: tf and dl packed into one long (both < 2^31).
    - ``term``: NULL except on the FIRST row of each (term, doc_bucket)
      pair of the batch — every reducer-side (tid, bucket) run therefore
      receives the string at least once (each contributing map batch
      names it), and the encoder labels runs from these rows.  A tid
      collision inside one (tid, bucket) run is DETECTED there (two
      distinct labels) and raises — ~n²/2⁶⁴ probability per bucket
      group; correctness is never silently at risk.
    - ``doc_bucket`` is NOT shipped: it is the affine function
      ``(doc_id - doc_base) // doc_bucket_size + bucket_base`` (batch
      path: 0/0; stream path: the reserved-range offsets), derived on the
      reduce side and monotone in doc_id, so sorting by (tid, doc_id)
      keeps bucket runs contiguous for free.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..analyzer import tokenize_arrow

    def gen(batches):
        for rb in batches:
            n_rows = rb.num_rows
            if not n_rows:
                continue
            flat, par = tokenize_arrow(rb.column(rb.schema.get_field_index("text")))
            if not len(flat):
                continue
            enc = pc.dictionary_encode(flat)
            codes = np.asarray(enc.indices, dtype=np.int64)
            vocab = enc.dictionary
            doc_idx = np.asarray(par, dtype=np.int64)
            dl = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
            # TERM-major composite (code · n_rows + doc): np.unique then
            # yields rows grouped by term, so shuffle compression sees
            # runs of equal tids (a hash is incompressible scattered,
            # cheap grouped) — same cost as the doc-major composite it
            # replaces.  Overflow-safe: code < flat tokens, doc_idx <
            # batch rows, product far below 2^63.
            key = codes * np.int64(n_rows) + doc_idx
            uk, tf = np.unique(key, return_counts=True)
            u_code = uk // n_rows
            u_doc = uk % n_rows
            doc_ids = np.asarray(
                rb.column(rb.schema.get_field_index("doc_id")), dtype=np.int64
            )
            d = doc_ids[u_doc]
            vocab_np = np.asarray(vocab, dtype=object)
            vh = pd.util.hash_array(vocab_np, categorize=False).view(np.int64)
            tfdl = (tf.astype(np.int64) << np.int64(32)) | dl[u_doc]
            bucket = (d - doc_base) // doc_bucket_size + bucket_base
            # name the first row of each (term, bucket) pair in this batch
            bmin = int(bucket.min())
            span = int(bucket.max()) - bmin + 1
            pk = u_code * span + (bucket - bmin)
            _, first_idx = np.unique(pk, return_index=True)
            term_col = np.full(uk.shape[0], None, dtype=object)
            term_col[first_idx] = vocab_np[u_code[first_idx]]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vh[u_code], type=pa.int64()),
                    pa.array(d, type=pa.int64()),
                    pa.array(tfdl, type=pa.int64()),
                    pa.array(term_col, type=pa.string()),
                ],
                names=["tid", "doc_id", "tfdl", "term"],
            )

    return gen


def tf_triples(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl, doc_bucket) — pure JVM, shuffle-free VARIANT.

    A document's tokens live entirely in its own row, so term frequencies
    are a PER-ROW computation: for each distinct token, count it in the
    token array (higher-order functions, ~|distinct| × |tokens| comparisons
    per doc).  MEASURED on local[32] over 1.4M turns this was 5× SLOWER
    than the Arrow/pandas `_tf_batches` path (3.8k vs 20.7k turns/s) — the
    nested array HOFs allocate per-token objects and GC dominates at high
    thread counts — so `_tf_batches` is the hot path and this stays as the
    cross-checked JVM reference (kept because on a real multi-executor
    cluster with separate heaps the trade-off may invert; re-measure there).
    """
    toks = tokens_col("text")
    tf_pairs = F.transform(
        F.array_distinct("tokens"),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(F.col("tokens"), lambda x: x == t)).cast("int").alias("tf"),
        ),
    )
    return (
        docs.withColumn("tokens", toks)
        .withColumn("dl", F.size("tokens").cast("int"))
        .filter(F.col("dl") > 0)
        .select(
            "doc_id",
            "doc_bucket",
            "dl",
            F.explode(tf_pairs).alias("p"),
        )
        .select(
            F.col("p.term").alias("term"),
            "doc_id",
            F.col("p.tf").alias("tf"),
            "dl",
            F.col("doc_bucket").cast("int").alias("doc_bucket"),
        )
    )


def _encode_partition(avgdl: float, doc_base: int, bucket_base: int, doc_bucket_size: int):
    """mapInPandas encoder over a hash-partitioned, sorted tf stream.

    Input partitions are hash-partitioned by (tid, derived doc_bucket) and
    sorted by (tid, doc_id) — the bucket is the affine doc_id function
    shared with :func:`_tf_arrow_fn`, so sorting by doc_id keeps bucket
    runs contiguous — but an Arrow batch may SPLIT a run, so the trailing
    run of every batch is carried into the next.  Run boundaries are found
    vectorized (numpy change detection); each run's TERM STRING comes from
    its named rows (≥1 per contributing map batch), with a hard error on
    the astronomically-unlikely tid collision inside one run.  Encoding
    cost is O(postings) numpy work (codec.encode_runs, byte-identical to
    per-run make_blocks — property-tested in tests/test_codec.py).
    """
    import numpy as np

    def encode(batches):
        carry: pd.DataFrame | None = None

        def bucket_of(d: np.ndarray) -> np.ndarray:
            return (d - doc_base) // doc_bucket_size + bucket_base

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            tid = pdf["tid"].to_numpy()
            d = pdf["doc_id"].to_numpy()
            bucket = bucket_of(d)
            tfdl = pdf["tfdl"].to_numpy()
            tf = tfdl >> np.int64(32)
            dl = tfdl & np.int64(0xFFFFFFFF)
            change = (tid[1:] != tid[:-1]) | (bucket[1:] != bucket[:-1])
            run_id = np.concatenate(([0], np.cumsum(change)))
            n_runs = int(run_id[-1]) + 1
            nn = pdf["term"].notna().to_numpy()
            rids = run_id[nn]
            terms_nn = pdf["term"].to_numpy()[nn]
            uniq_rid, first_pos = np.unique(rids, return_index=True)
            if uniq_rid.shape[0] != n_runs:
                raise RuntimeError(
                    "index encode: posting run without a named term row — "
                    "tf stage naming invariant broken"
                )
            run_label = np.empty(n_runs, dtype=object)
            run_label[uniq_rid] = terms_nn[first_pos]
            if not (terms_nn == run_label[rids]).all():
                raise RuntimeError(
                    "index encode: term-id collision inside one "
                    "(tid, doc_bucket) run — two distinct terms hashed to "
                    "the same 64-bit id in the same doc bucket (~n²/2⁶⁴ "
                    "odds).  The hash is a deterministic function of the "
                    "corpus (no per-build salt), so a plain rebuild WILL "
                    "fail identically; recover by bumping doc_bucket_size/"
                    "term_buckets (moves one colliding term to another "
                    "bucket) or report it — a fleet-wide salt knob is the "
                    "format change this error is the tripwire for"
                )
            cols = codec.encode_runs(run_id, bucket, d, tf, dl, avgdl)
            cols["term"] = run_label[cols["term"].astype(np.int64)]
            cols["doc_bucket"] = cols["doc_bucket"].astype("int32")
            return pd.DataFrame(cols)[[f.name for f in POSTING_SCHEMA.fields]]

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            tid_np = pdf["tid"].to_numpy()
            b_np = bucket_of(pdf["doc_id"].to_numpy())
            tail_first = int(np.argmax((tid_np == tid_np[-1]) & (b_np == b_np[-1])))
            carry = pdf.iloc[tail_first:]
            head = pdf.iloc[:tail_first]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    return encode


def build_unit(
    spark: SparkSession,
    store: IndexStore,
    unit: int,
    avgdl: float,
    tf_partitions: int | None = None,
) -> dict:
    """P1 for one unit: docs → local tf → one (term, doc_bucket) shuffle →
    sorted vectorized block encode → parquet + checkpoint."""
    t0 = time.perf_counter()
    import os

    if not os.path.exists(store.docs_path(unit)):
        # unit holds no doc buckets at this corpus size — trivially complete
        info = {"seconds": 0.0}
        store.mark_unit_done(unit, info)
        return info
    docs = spark.read.parquet(store.docs_path(unit)).select("doc_id", "text")
    # The tf stage is Python-per-byte work, but maxPartitionBytes packs a
    # small unit's files into one or two scan tasks — at test scale that
    # serialized the most expensive stage onto <= n_units cores (measured:
    # 3-11 of 32 cores busy).  Split BELOW the byte-based packing when the
    # natural partitioning is coarser than the cluster; at real scale the
    # unit has plenty of files and this is a no-op.
    if tf_partitions and docs.rdd.getNumPartitions() < tf_partitions:
        docs = docs.repartition(tf_partitions)
    dbs = store.doc_bucket_size
    tf_local = docs.mapInArrow(_tf_arrow_fn(0, 0, dbs), schema=TF_TID_SCHEMA)
    # explicit partition count: AQE would coalesce this small-at-test-scale
    # exchange to one task and serialize the encode; at 10^12 scale the same
    # expression sizes the shuffle to the cluster.  Partition key = (tid,
    # derived doc_bucket) — the doc-range SALT (see module docstring) as an
    # expression, so the bucket never rides the exchange payload; sort key
    # (tid, doc_id) suffices because the bucket is monotone in doc_id.
    n_enc = max(2, _python_width(spark) // 2)
    encoded = (
        tf_local.repartition(
            n_enc, F.col("tid"), F.expr(f"CAST(doc_id DIV {dbs} AS INT)")
        )
        .sortWithinPartitions("tid", "doc_id")
        .mapInPandas(_encode_partition(avgdl, 0, 0, dbs), schema=POSTING_SCHEMA)
    )
    encoded = encoded.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int")
    )
    # consolidate ENCODED blocks by term_bucket before the write: without
    # this, partitionBy splits every encode task's output across all term
    # buckets, so the file count is n_enc × term_buckets PER UNIT — it
    # grows with cluster parallelism (measured 2048 files at local[32] vs
    # 512 at local[8] on the same corpus) and the listing/open overhead
    # lands on every later read.  The blocks are delta+varint compressed —
    # a fraction of the tf shuffle that produced them — so this extra
    # exchange is cheap, and each term_bucket lands in exactly one task →
    # ≤ term_buckets files per unit at ANY core count.  (Skew-safe: the
    # doc_bucket salt already bounded per-term block volume upstream.)
    encoded.repartition(store.term_buckets, "term_bucket").write.mode("overwrite").partitionBy(
        "term_bucket"
    ).parquet(store.postings_path(unit))
    # post-compaction stores track covered segments explicitly — a newly
    # built unit must register to be visible (no-op on legacy stores, and
    # registration precedes the done-mark so a crash between the two is
    # recovered by the idempotent unit re-run, never an invisible unit)
    store.add_segment(f"postings/unit={unit}")

    # no recount scan here: per-unit posting/byte metrics are computed once
    # in finalize from block metadata (a fixed extra job per unit measurably
    # flattened the build's core-count scaling)
    info = {"seconds": round(time.perf_counter() - t0, 3)}
    store.mark_unit_done(unit, info)
    return info


def finalize(spark: SparkSession, store: IndexStore) -> dict:
    """P2: dictionary + metrics from block metadata only; snapshot commit.

    The dictionary aggregates over the store's COVERED postings
    (snapshot-aware loader) so a build onto a previously compacted store
    counts the compacted layout too; per-unit metrics read the batch unit
    dirs directly (unit provenance only exists there).  If the store also
    holds STREAM segments (batch build onto a streaming store), the
    dictionary/stats recompute delegates to the hybrid full path so df and
    N cover the same document set — aggregating stream postings against
    batch-only stats would skew every idf, and leave those batches to be
    double-folded later."""
    posts = spark.read.option("basePath", store.postings_path()).parquet(store.postings_path())

    dict_obs: dict | None = None
    if store.checkpoints().get("stream_batches"):
        from ..streaming.ingest import finalize_stream

        finalize_stream(spark, store, incremental=False)
        stats = store.stats()
    else:
        stats = store.stats()
        dictionary = (
            store.load_postings_df(spark).groupBy("term")
            .agg(
                F.sum("n_docs").alias("df"),
                F.sum("cf_block").alias("cf"),
                F.max("block_max_tf").alias("max_tf"),
                F.max("block_max_raw").alias("max_raw"),
            )
            .withColumn("idf", idf_col(F.lit(stats["n_docs"]), F.col("df")))
            # query-side needs the term's partition; storing it here makes the
            # dictionary lookup the ONLY pre-scan job per query batch
            .withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int"),
            )
        )
        # partitioned by term_bucket: the per-query dictionary lookup prunes
        # to the query's buckets (driver-side xxhash64 twin) instead of
        # scanning the whole vocabulary — at 10^12-doc scale the dictionary
        # is billions of terms and an unpartitioned lookup scan would
        # dominate query latency.  Consolidated to one task per bucket
        # before the write (same file-count argument as build_unit's
        # postings write), and vocab/total observed DURING the write job —
        # the re-read job this replaces was pure fixed overhead.
        obs = Observation("dict_stats")
        dictionary = dictionary.observe(
            obs, F.count(F.lit(1)).alias("vocab"), F.sum("df").alias("total")
        )
        # sorted by term within each bucket: parquet row-group min/max
        # stats then bound any term-range scan (prefix expansion,
        # operators/prefix.py) to the groups that can contain the range
        dictionary.repartition(store.term_buckets, "term_bucket").sortWithinPartitions(
            "term"
        ).write.mode("overwrite").partitionBy("term_bucket").parquet(
            store.dictionary_path
        )
        dict_obs = obs.get

    payload_bytes = (
        F.octet_length("doc_ids_delta") + F.octet_length("tfs") + F.octet_length("dls")
    )
    per_term_unit = posts.groupBy("unit", "term").agg(
        F.sum("n_docs").alias("tp"), F.sum(payload_bytes).alias("tb")
    )
    metrics = (
        per_term_unit.groupBy("unit")
        .agg(
            F.count("*").alias("terms"),
            F.sum("tp").alias("postings"),
            F.sum("tb").alias("bytes"),
            (F.max("tp") / F.avg("tp")).alias("skew_factor"),
        )
        .withColumnRenamed("unit", "partition_id")
        .withColumn("build_ts", F.current_timestamp())
    )
    m = store.manifest()
    lineage = f"snapshot_parent={m['current_snapshot']}"
    metrics = metrics.withColumn("lineage", F.lit(lineage))
    metrics.write.mode("overwrite").parquet(store.metrics_path)

    if dict_obs is not None:
        # observed during the dictionary write job — no extra scan at all
        vocab = int(dict_obs["vocab"])
        total_postings = int(dict_obs["total"] or 0)
    else:
        # hybrid/stream path wrote the dictionary inside finalize_stream:
        # read the written dictionary back (tiny parquet — re-deriving from
        # `posts` would re-scan all postings instead)
        dict_written = spark.read.parquet(store.dictionary_path)
        row = dict_written.agg(
            F.count("*").alias("vocab"), F.sum("df").alias("total")
        ).collect()[0]
        vocab = int(row["vocab"])
        total_postings = int(row["total"] or 0)
    stats.update({"vocab": vocab, "n_postings": total_postings})
    store.write_stats(stats)
    sid = store.commit_snapshot("finalize", {"vocab": vocab, "n_postings": total_postings})
    return {"vocab": vocab, "n_postings": total_postings, "snapshot_id": sid}


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    store: IndexStore,
    n_units: int = 1,
    fail_after_units: int | None = None,
    unit_parallelism: int = 4,
) -> dict:
    """Full resumable build.  Re-running after an interruption (or with
    ``fail_after_units`` set, the test hook that simulates one) skips every
    completed phase/unit via the checkpoint ledger and produces an index
    byte-identical in content to an uninterrupted build (tests/test_resume.py).

    Unit jobs are submitted from ``unit_parallelism`` driver threads —
    concurrent Spark jobs keep the scheduler saturated when any single
    unit's stages can't fill the cluster (small units, stragglers, the tail
    of the build).  Units stay independent atomic checkpoints either way.
    ``fail_after_units`` forces the sequential path so the failure point is
    deterministic.
    """
    store.init()
    cp = store.checkpoints()
    if cp.get("docs_staged"):
        stats = store.stats()
        n_units = cp.get("n_units", n_units)
    else:
        stats = stage_docs(spark, transcripts, store, n_units)

    done = store.completed_units()
    pending = [u for u in range(n_units) if u not in done]
    # size per-unit tf parallelism so concurrent units together saturate the
    # PYTHON-stage width (cluster parallelism unless the single-host
    # memory-bus cap applies — see _python_width)
    tf_parts = max(2, _python_width(spark) * 2 // max(1, unit_parallelism))
    if fail_after_units is not None or unit_parallelism <= 1:
        built = 0
        for u in pending:
            if fail_after_units is not None and built >= fail_after_units:
                raise RuntimeError(f"simulated failure after {built} units")
            build_unit(spark, store, u, stats["avgdl"], tf_partitions=tf_parts)
            built += 1
    elif pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(unit_parallelism, len(pending))) as ex:
            futures = [
                ex.submit(build_unit, spark, store, u, stats["avgdl"], tf_parts)
                for u in pending
            ]
            for f in futures:
                f.result()  # propagate the first failure
    return finalize(spark, store)

"""Structured Streaming ingest: micro-batch segments, exactly-once replay,
and rank-identity of a streamed index vs the oracle over the same rows."""

from __future__ import annotations

import os

import pytest

from search_spark.corpus import generate_pandas
from search_spark.oracle import OracleIndex
from search_spark.sources.index_store import IndexStore
from search_spark.streaming.ingest import (
    STREAM_DOC_BASE,
    _ingest_one_batch,
    finalize_stream,
    start_ingest,
)


@pytest.fixture(scope="module")
def streamed_store(spark, tmp_path_factory):
    """Two parquet files dropped into a source dir → availableNow ingest
    with maxFilesPerTrigger=1 → ≥2 micro-batch segments."""
    root = tmp_path_factory.mktemp("stream")
    src = root / "src"
    src.mkdir()
    pdf = generate_pandas(60)
    # split by conversation so file order == (conv_id, turn_idx) order
    half = pdf[pdf["conv_id"] < "conv-000030"]
    rest = pdf[pdf["conv_id"] >= "conv-000030"]
    spark.createDataFrame(half).coalesce(1).write.parquet(str(src / "part1"))
    spark.createDataFrame(rest).coalesce(1).write.parquet(str(src / "part2"))

    store = IndexStore(str(root / "idx"), doc_bucket_size=512, term_buckets=4)
    q = start_ingest(
        spark,
        f"{src}/part*",
        store,
        checkpoint_dir=str(root / "cp"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    finalize_stream(spark, store)
    return store, pdf


def test_stream_creates_multiple_segments(streamed_store):
    store, pdf = streamed_store
    cp = store.checkpoints()
    batches = cp.get("stream_batches", {})
    assert len(batches) >= 2
    assert cp["stream_doc_offset"] == len(pdf)
    for b in batches.values():
        assert b["status"] == "done"


def test_stream_rank_identity_vs_oracle(spark, streamed_store):
    """Streamed index answers rank-identically to the numpy oracle over the
    same corpus; stream doc_ids are STREAM_DOC_BASE + stable rank."""
    from search_spark.operators.wand import IndexReader

    store, pdf = streamed_store
    ordered = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ordered["doc_id"] = range(len(ordered))
    oracle = OracleIndex.build(ordered)
    reader = IndexReader(spark, store)
    for q in ["the fast", "needle1", "w0003 w0010", "the w0100 w0007"]:
        got = [
            (r["doc_id"], round(r["score"] * 1e6))
            for r in reader.batch_search([("q", q)], 10).collect()
        ]
        want = [
            (STREAM_DOC_BASE + doc, round(score * 1e6))
            for doc, score in oracle.search(q, 10)
        ]
        assert got == want, q


def test_doc_source_excludes_unacked_stream_batch(spark, streamed_store):
    """Crash-window coherence for dense/flat scans: stream docs land on
    disk BEFORE their postings commit, so a batch=N dir whose ledger entry
    never reached status=done (live or crashed micro-batch) must be
    invisible to doc_source — the flat dense verify and the posting
    candidate path see the same corpus at every crash point."""
    import shutil

    from search_spark.operators.wand import IndexReader

    store, pdf = streamed_store
    sdocs = os.path.join(store.root, "stream_docs")
    acked_dirs = sorted(d for d in os.listdir(sdocs) if d.startswith("batch="))
    phantom = os.path.join(sdocs, "batch=999")
    # simulate the crash window: docs written, ledger never marked done
    shutil.copytree(os.path.join(sdocs, acked_dirs[0]), phantom)
    try:
        reader = IndexReader(spark, store)
        src = reader.doc_source()
        assert src.count() == len(pdf)  # phantom rows filtered out
        batches = {
            r["batch"]
            for r in spark.read.option("basePath", sdocs)
            .parquet(sdocs)
            .select("batch")
            .distinct()
            .collect()
        }
        assert 999 in batches  # the dir IS on disk and readable…
        # …and no doc_id appears twice (the phantom duplicates batch 0's
        # ids — an unfiltered union would double them)
        assert src.select("doc_id").distinct().count() == len(pdf)
    finally:
        shutil.rmtree(phantom, ignore_errors=True)


def test_finalize_full_recompute_excludes_unacked_stream_batch(spark, streamed_store):
    """The SECOND flat consumer of the stream_docs layout: finalize_stream's
    full recompute must apply the same crash-window rule as doc_source
    (store.acked_stream_batches — one shared helper).  A phantom batch dir
    (docs on disk, ledger never marked done) has NO postings, so folding it
    into n_docs/avgdl/total_tokens would skew every term's idf vs the
    postings the index actually serves."""
    import shutil

    from search_spark.streaming.ingest import finalize_stream

    store, pdf = streamed_store
    sdocs = os.path.join(store.root, "stream_docs")
    acked_dirs = sorted(d for d in os.listdir(sdocs) if d.startswith("batch="))
    phantom = os.path.join(sdocs, "batch=998")
    shutil.copytree(os.path.join(sdocs, acked_dirs[0]), phantom)
    try:
        before = store.stats()
        out = finalize_stream(spark, store, incremental=False)
        after = store.stats()
        assert out["n_docs"] == len(pdf)  # phantom docs NOT counted
        assert after["n_docs"] == before["n_docs"]
        assert after["total_tokens"] == before["total_tokens"]
        assert abs(after["avgdl"] - before["avgdl"]) < 1e-9
    finally:
        shutil.rmtree(phantom, ignore_errors=True)


def test_stream_replay_is_idempotent(spark, streamed_store):
    """Re-delivering a committed batch_id (crash replay) changes nothing."""
    store, pdf = streamed_store
    before = store.checkpoints()
    some_batch = int(sorted(before["stream_batches"])[0])
    sdf = spark.createDataFrame(pdf.head(10))
    _ingest_one_batch(store, sdf, some_batch, avgdl_hint=30.0)
    after = store.checkpoints()
    assert after["stream_doc_offset"] == before["stream_doc_offset"]
    assert after["stream_batches"].keys() == before["stream_batches"].keys()


def test_stream_segments_on_disk(streamed_store):
    store, _ = streamed_store
    segs = os.listdir(os.path.join(store.root, "stream_postings"))
    assert len(segs) >= 2 and all(s.startswith("batch=") for s in segs)


def test_incremental_finalize_matches_full_recompute(spark, tmp_path):
    """Two-phase ingest: finalize after each phase (1st = full bootstrap,
    2nd = incremental fold of only the new batches).  The resulting
    dictionary + stats must be IDENTICAL to a one-shot full recompute over
    the same data — the associativity contract of the term stats."""
    pdf = generate_pandas(40)
    a = pdf[pdf["conv_id"] < "conv-000020"]
    b = pdf[pdf["conv_id"] >= "conv-000020"]

    def ingest(store_root, cp, src, frames, finalize_each):
        store = IndexStore(store_root, doc_bucket_size=256, term_buckets=4)
        outs = []
        for i, f in enumerate(frames):
            spark.createDataFrame(f).coalesce(1).write.mode("append").parquet(src)
            q = start_ingest(spark, src, store, checkpoint_dir=cp, available_now=True)
            q.awaitTermination(300)
            if finalize_each or i == len(frames) - 1:
                outs.append(finalize_stream(spark, store))
        return store, outs

    s_inc, outs_inc = ingest(
        str(tmp_path / "inc"), str(tmp_path / "cp_inc"), str(tmp_path / "src_inc"),
        [a, b], finalize_each=True,
    )
    s_full, outs_full = ingest(
        str(tmp_path / "full"), str(tmp_path / "cp_full"), str(tmp_path / "src_full"),
        [a, b], finalize_each=False,
    )
    # path check: first finalize bootstraps full, second folds incrementally
    assert outs_inc[0]["incremental"] is False
    assert outs_inc[1]["incremental"] is True

    d_inc = sorted(
        tuple(r)
        for r in spark.read.parquet(s_inc.dictionary_path)
        .select("term", "df", "cf", "max_tf", "idf", "term_bucket")
        .collect()
    )
    d_full = sorted(
        tuple(r)
        for r in spark.read.parquet(s_full.dictionary_path)
        .select("term", "df", "cf", "max_tf", "idf", "term_bucket")
        .collect()
    )
    assert d_inc == d_full
    assert s_inc.stats()["n_docs"] == s_full.stats()["n_docs"]
    assert abs(s_inc.stats()["avgdl"] - s_full.stats()["avgdl"]) < 1e-12

    # and the served results agree
    from search_spark.operators.wand import IndexReader

    ri = IndexReader(spark, s_inc).batch_search([("q", "the w0003 needle1")], 10).collect()
    rf = IndexReader(spark, s_full).batch_search([("q", "the w0003 needle1")], 10).collect()
    assert [tuple(r) for r in ri] == [tuple(r) for r in rf]


def test_stream_batches_record_build_metrics(spark, streamed_store):
    """Every non-empty stream batch writes a metrics row (terms, postings,
    bytes, skew) — the same observability contract as batch units."""
    import os

    store, pdf = streamed_store
    mdir = os.path.join(store.root, "metrics_stream")
    rows = spark.read.parquet(mdir).collect()
    batches = {
        int(b)
        for b, v in store.checkpoints()["stream_batches"].items()
        if v["n_docs"] > 0
    }
    assert {r["partition_id"] for r in rows} >= batches
    for r in rows:
        assert r["terms"] > 0 and r["postings"] > 0 and r["bytes"] > 0
        assert r["skew_factor"] >= 1.0


def test_crashed_incremental_fold_does_not_double_count(spark, tmp_path, monkeypatch):
    """Crash between the dictionary install and the ledger fold-mark, then
    re-run: the fold marker riding inside the installed dictionary must
    stop the re-run from folding the same batches twice (df would double)."""
    from search_spark.corpus import generate_pandas as gen
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=256, term_buckets=4)
    pdf = gen(30)
    a = pdf[pdf["conv_id"] < "conv-000015"]
    b = pdf[pdf["conv_id"] >= "conv-000015"]

    spark.createDataFrame(a).coalesce(1).write.mode("append").parquet(str(src))
    q = start_ingest(spark, str(src), store, checkpoint_dir=str(tmp_path / "cp"), available_now=True)
    q.awaitTermination(300)
    finalize_stream(spark, store)  # bootstrap

    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(str(src))
    q = start_ingest(spark, str(src), store, checkpoint_dir=str(tmp_path / "cp"), available_now=True)
    q.awaitTermination(300)

    # crash AFTER install, BEFORE the ledger mark
    class Boom(RuntimeError):
        pass

    real_mark = IndexStore.mark_batches_folded

    def crash_mark(self, ids):
        raise Boom("crash before fold-mark")

    monkeypatch.setattr(IndexStore, "mark_batches_folded", crash_mark)
    import pytest as _pytest

    with _pytest.raises(Boom):
        finalize_stream(spark, store)
    monkeypatch.setattr(IndexStore, "mark_batches_folded", real_mark)

    # ledger still lists the batch as unfolded, but the installed
    # dictionary already contains it — the re-run must reconcile, not
    # re-fold
    finalize_stream(spark, store)
    total_df = spark.read.parquet(store.dictionary_path).agg(F.sum("df")).collect()[0][0]
    posts_total = store.load_postings_df(spark).agg(F.sum("n_docs")).collect()[0][0]
    assert total_df == posts_total  # no double count


def test_compaction_during_live_stream_conserves_everything(spark, tmp_path):
    """Chaos test: run compaction TWICE while a continuous stream is
    actively ingesting.  Whatever the interleaving, the maintenance gate
    must guarantee the invariants: no posting lost or double-counted
    (dictionary df == postings total), all docs searchable, and results
    rank-identical to a one-shot batch build over the same rows."""
    import time as _time

    from pyspark.sql import functions as F

    from search_spark.operators.compact import compact_index
    from search_spark.operators.wand import IndexReader

    pdf = generate_pandas(60)
    chunks = [
        pdf[pdf["conv_id"] < "conv-000020"],
        pdf[(pdf["conv_id"] >= "conv-000020") & (pdf["conv_id"] < "conv-000040")],
        pdf[pdf["conv_id"] >= "conv-000040"],
    ]
    src = tmp_path / "src"
    src.mkdir()
    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=256, term_buckets=4)

    spark.createDataFrame(chunks[0]).coalesce(1).write.mode("append").parquet(str(src))
    q = start_ingest(
        spark, str(src), store, checkpoint_dir=str(tmp_path / "cp"),
        available_now=False, max_files_per_trigger=1,
    )
    try:
        # wait for batch 0, then interleave file drops with compactions
        deadline = _time.time() + 120
        while not store.checkpoints().get("stream_batches") and _time.time() < deadline:
            _time.sleep(0.5)
        spark.createDataFrame(chunks[1]).coalesce(1).write.mode("append").parquet(str(src))
        compact_index(spark, store)
        spark.createDataFrame(chunks[2]).coalesce(1).write.mode("append").parquet(str(src))
        deadline = _time.time() + 120
        while (
            sum(v["n_docs"] for v in store.checkpoints().get("stream_batches", {}).values())
            < len(pdf)
            and _time.time() < deadline
        ):
            _time.sleep(0.5)
        compact_index(spark, store)
    finally:
        q.stop()
    finalize_stream(spark, store)

    # invariant 1: every ingested doc is accounted for
    assert store.stats()["n_docs"] == len(pdf)
    # invariant 2: dictionary df == total postings (no loss, no double fold)
    total_df = spark.read.parquet(store.dictionary_path).agg(F.sum("df")).collect()[0][0]
    posts_total = store.load_postings_df(spark).agg(F.sum("n_docs")).collect()[0][0]
    assert total_df == posts_total
    # invariant 3: rank identity vs the numpy oracle over the same rows
    ordered = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = OracleIndex.build(
        ordered.assign(doc_id=lambda d: STREAM_DOC_BASE + d.index)[["doc_id", "text"]]
    )
    reader = IndexReader(spark, store)
    for qtext in ["the fast", "needle1 needle2", "w0003 w0050 the"]:
        got = [
            (r["doc_id"], round(r["score"] * 1e6))
            for r in reader.batch_search([("q", qtext)], 10).orderBy("rank").collect()
        ]
        want = [(d, round(s * 1e6)) for d, s in oracle.search(qtext, 10)]
        assert got == want, (qtext, got, want)


def test_rehydrate_on_stream_only_store(spark, streamed_store):
    """A stream-only store has NO batch docs dir: rehydrate must source
    stream_docs/batch=* (it used to read only store.docs_path() and raise;
    on hybrid stores streamed hits silently rehydrated to NULL text)."""
    from search_spark.operators.wand import IndexReader

    store, pdf = streamed_store
    reader = IndexReader(spark, store)
    res = reader.batch_search([("q", "the fast")], 5)
    hyd = reader.rehydrate(res).collect()
    assert len(hyd) == 5
    ordered = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for r in hyd:
        assert r["text"] is not None and r["conv_id"] is not None
        src = ordered.iloc[r["doc_id"] - STREAM_DOC_BASE]
        assert r["text"] == src["text"]  # per-turn text-equality invariant


def test_repl_e2e_over_streamed_store(spark, tmp_path):
    """VERDICT r3 #7: the interactive REPL (subprocess, own SparkSession)
    against a STREAM-ONLY store — queries must hit and rehydrate streamed
    docs, and ``:refresh`` must pick up segments ingested WHILE the REPL
    is running (the serving story for a continuously-fed index)."""
    import subprocess
    import sys
    import threading
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = tmp_path / "src"
    src.mkdir()
    pdf = generate_pandas(40)  # needles planted at convs 0, 17, 34
    part1 = pdf[pdf["conv_id"] < "conv-000020"]
    part2 = pdf[pdf["conv_id"] >= "conv-000020"]
    spark.createDataFrame(part1).coalesce(1).write.parquet(str(src / "part1"))

    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=512, term_buckets=4)
    q = start_ingest(
        spark, f"{src}/part*", store,
        checkpoint_dir=str(tmp_path / "cp"), available_now=True,
    )
    q.awaitTermination(300)
    finalize_stream(spark, store)

    proc = subprocess.Popen(
        [
            sys.executable, "-u", os.path.join(repo, "scripts", "repl.py"),
            "--store", store.root, "-k", "3", "--master", "local[4]",
        ],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, bufsize=1,
        env={**os.environ, "PYTHONPATH": repo},
    )
    buf: list[str] = []
    lock = threading.Lock()

    def _pump():
        while True:
            ch = proc.stdout.read(1)
            if not ch:
                return
            with lock:
                buf.append(ch)

    t = threading.Thread(target=_pump, daemon=True)
    t.start()

    def ask(line: str, timeout: float = 240.0) -> str:
        """Send one line, return output up to the NEXT ``search>`` prompt."""
        with lock:
            start = len(buf)
        proc.stdin.write(line + "\n")
        proc.stdin.flush()
        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            with lock:
                chunk = "".join(buf[start:])
            if "search>" in chunk:
                return chunk
            _time.sleep(0.2)
        proc.kill()
        raise AssertionError(f"REPL never prompted after {line!r}: {chunk!r}")

    try:
        # wait for the initial prompt
        deadline = _time.monotonic() + 300
        while _time.monotonic() < deadline:
            with lock:
                if "search>" in "".join(buf):
                    break
            _time.sleep(0.2)
        else:
            proc.kill()
            raise AssertionError("REPL never printed its first prompt")

        # conv 17 — in the streamed part1.  The needle doc's text exceeds
        # the REPL's 96-char display truncation, so assert the hit + that
        # a non-empty streamed text was rehydrated (vocab words shown),
        # not the needle token itself.
        hit1 = ask("needle1")
        assert "★" in hit1 and "(no hits)" not in hit1
        miss = ask("needle2")  # conv 34 — not ingested yet
        assert "(no hits)" in miss

        # ingest part2 WHILE the REPL is live, then :refresh
        spark.createDataFrame(part2).coalesce(1).write.parquet(str(src / "part2"))
        q2 = start_ingest(
            spark, f"{src}/part*", store,
            checkpoint_dir=str(tmp_path / "cp"), available_now=True,
        )
        q2.awaitTermination(300)
        finalize_stream(spark, store)

        refreshed = ask(":refresh")
        assert f"refreshed: {len(pdf)} docs" in refreshed
        hit2 = ask("needle2")
        assert "★" in hit2 and "(no hits)" not in hit2

        proc.stdin.write(":quit\n")
        proc.stdin.flush()
        rc = proc.wait(timeout=120)
        assert rc == 0, proc.stderr.read()[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()

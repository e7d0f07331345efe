"""Posting-block codec: delta + LEB128 varint, with block-max skip metadata.

The reference persists its index as a versioned, flate-compressed byte
stream (/root/reference/index_codec.go:16-43, :98-114) — generic byte-level
compression over row records.  Posting lists admit a much better,
*posting-aware* encoding (the standard IR result): sorted docIDs become
small gaps; gaps and term frequencies become 1-2 byte varints.  Parquet
page compression (zstd/snappy) still applies on top, like the reference's
flate wraps its records.

All encode/decode paths are vectorized numpy — no per-value Python in the
hot loop (the "SIMD of the Python world"; the reference's equivalent concern
is its AVX kernels, /root/reference/internal/cosine/simd/simd.go:33-44).

Block layout (BLOCK_SIZE = 128 postings, mirroring standard block-max
index designs; SURVEY.md §7 M2):

    first_doc     int64   absolute docID of the first posting
    n_docs        int32   postings in this block
    doc_ids_delta binary  varint stream: [doc0 - first_doc(=0), gaps...]
    tfs           binary  varint stream of term frequencies
    block_max_tf  int32
    block_max_score double  exact max of the BM25 term score over the block
                            (computed at build with true dl/avgdl/idf →
                            a *safe and tight* WAND upper bound)

Round-trip identity is property-tested in tests/test_codec.py, the analogue
of the reference's codec round-trip test (/root/reference/index_test.go:44-76).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
FORMAT_VERSION = 1


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return b""
    buf = np.zeros((n, 10), dtype=np.uint8)
    tmp = v.copy()
    lengths = np.zeros(n, dtype=np.int64)
    for bpos in range(10):
        byte = (tmp & np.uint64(0x7F)).astype(np.uint8)
        tmp >>= np.uint64(7)
        more = tmp > 0
        buf[:, bpos] = byte | (more.astype(np.uint8) << 7)
        newly_done = (lengths == 0) & ~more
        lengths[newly_done] = bpos + 1
        if not more.any():
            break
    mask = np.arange(10) < lengths[:, None]
    return buf[mask].tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Decode an LEB128 stream back to uint64 (vectorized)."""
    if not data:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8)
    ends = np.flatnonzero((arr & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    runlen = ends - starts + 1
    pos = np.arange(arr.shape[0], dtype=np.uint64) - np.repeat(starts, runlen).astype(np.uint64)
    contrib = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * pos)
    return np.add.reduceat(contrib, starts)


def encode_doc_ids(doc_ids: np.ndarray, first_doc: int) -> bytes:
    """Delta+varint encode a sorted docID run relative to ``first_doc``."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(d)
    deltas[0] = d[0] - first_doc
    deltas[1:] = np.diff(d)
    return varint_encode(deltas)


def decode_doc_ids(data: bytes, first_doc: int, n: int) -> np.ndarray:
    deltas = varint_decode(data)[:n].astype(np.int64)
    return first_doc + np.cumsum(deltas)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.int64))


def decode_tfs(data: bytes, n: int) -> np.ndarray:
    return varint_decode(data)[:n].astype(np.int64)


def decode_dls(data: bytes, n: int) -> np.ndarray:
    """Doc-length payload decode — THE one implementation every consumer
    (scorers, compaction, tests) must share."""
    return varint_decode(data)[:n].astype(np.int64)


def make_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Split one term's sorted posting run into encoded block rows.

    Per-posting document lengths (``dls``) are *stored in the block* so
    query-time scoring needs no doclens join — the same inline-the-payload
    pattern as the reference's entry rows (/root/reference/index.go:15-18).

    ``block_max_raw`` is the idf-independent part of the BM25 upper bound:
        max over the block of  tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    idf is a positive per-term constant, so ``idf * block_max_raw`` is an
    exact, tight block-max score — and the build never has to join the
    dictionary (idf isn't known until global df is, and at 10^12-doc scale
    the dictionary is not broadcastable).  Query time multiplies by the idf
    of each query term (a handful of scalars).

    Inputs must be sorted by doc_id ascending.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    raw = t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
    blocks = []
    for off in range(0, d.shape[0], block_size):
        sl = slice(off, off + block_size)
        bd, bt, bdl, braw = d[sl], t[sl], dl[sl], raw[sl]
        first = int(bd[0])
        blocks.append(
            {
                "first_doc": first,
                "last_doc": int(bd[-1]),
                "n_docs": int(bd.shape[0]),
                "doc_ids_delta": encode_doc_ids(bd, first),
                "tfs": encode_tfs(bt),
                "dls": varint_encode(bdl.astype(np.uint64)),
                "block_max_tf": int(bt.max()),
                "block_min_dl": int(bdl.min()),
                "block_max_raw": float(braw.max()),
                "cf_block": int(bt.sum()),
            }
        )
    return blocks


def block_upper_bound(
    max_tf: np.ndarray,
    min_dl: np.ndarray,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    """Safe idf-free block score bound for the CURRENT avgdl.

    The per-posting score is increasing in tf and decreasing in dl, so
    raw(max_tf, min_dl, avgdl) ≥ raw(tf_i, dl_i, avgdl) for every posting
    in the block — for ANY avgdl.  ``block_max_raw`` (the exact max at
    encode time) is only a valid bound for the avgdl it was encoded with;
    in an incremental index avgdl drifts as documents arrive, and pruning
    against a stale bound is UNSAFE (found as a real rank error in the
    streaming-ingest tests).  Query-time pruning therefore always derives
    its bound from (block_max_tf, block_min_dl) with the live avgdl.
    """
    t = np.asarray(max_tf, dtype=np.float64)
    dl = np.asarray(min_dl, dtype=np.float64)
    return t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * dl / avgdl))


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls) for a block row (mapping with the block fields)."""
    n = int(row["n_docs"])
    doc_ids = decode_doc_ids(row["doc_ids_delta"], int(row["first_doc"]), n)
    tfs = decode_tfs(row["tfs"], n)
    dls = decode_dls(row["dls"], n)
    return doc_ids, tfs, dls

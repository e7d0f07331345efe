"""Mini query language dispatching to the engine's operators.

The reference's example app feeds the raw line to one search call
(/root/reference/example/main.go:35-41); with more operators available a
serving layer needs a routing syntax.  Lucene-flavored, deliberately
small and total (any line parses to SOMETHING):

- ``"exact phrase"``        → phrase search (operators/phrase.py)
- ``"terms near"~3``        → proximity with slop 3
- ``+must -not other``      → boolean (``+`` must, ``-`` must_not,
                              bare = should) when any +/- is present
- ``pref*``                 → prefix search (single-token query)
- ``term~`` / ``term~2``    → fuzzy, edit distance 1 / 2 (single-token)
- ``term^2 other``          → BM25 with per-term boosts (idf scaling)
- anything else             → standard BM25 top-k

All routes return a normalized ``(doc_id, score)`` DataFrame ordered
(score DESC, doc_id ASC), so callers (REPL, serving) render uniformly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PHRASE_RE = re.compile(r'^"(?P<body>[^"]*)"(?:~(?P<slop>\d+))?$')
_FUZZY_RE = re.compile(r"^(?P<body>[^\s~*]+)~(?P<dist>\d+)?$")
_PREFIX_RE = re.compile(r"^(?P<body>[^\s~*]+)\*$")
_BOOST_RE = re.compile(r"^(?P<body>[^\s~*^]+)\^(?P<w>\d+(?:\.\d+)?)$")


@dataclass
class ParsedQuery:
    op: str  # bm25 | phrase | near | boolean | prefix | fuzzy
    text: str = ""
    slop: int = 0
    dist: int = 1
    must: str = ""
    should: str = ""
    must_not: str = ""
    clauses: dict = field(default_factory=dict)


def parse_query(line: str) -> ParsedQuery:
    """Total parser: every line maps to exactly one operator route."""
    line = line.strip()
    m = _PHRASE_RE.match(line)
    if m:
        body = m.group("body")
        if m.group("slop") is not None:
            return ParsedQuery(op="near", text=body, slop=int(m.group("slop")))
        return ParsedQuery(op="phrase", text=body)
    toks = line.split()
    if any(t.startswith(("+", "-")) and len(t) > 1 for t in toks):
        must = " ".join(t[1:] for t in toks if t.startswith("+") and len(t) > 1)
        mnot = " ".join(t[1:] for t in toks if t.startswith("-") and len(t) > 1)
        should = " ".join(t for t in toks if not t.startswith(("+", "-")))
        return ParsedQuery(op="boolean", must=must, should=should, must_not=mnot)
    if len(toks) == 1:
        m = _PREFIX_RE.match(toks[0])
        if m:
            return ParsedQuery(op="prefix", text=m.group("body"))
        m = _FUZZY_RE.match(toks[0])
        if m:
            return ParsedQuery(
                op="fuzzy", text=m.group("body"), dist=int(m.group("dist") or 1)
            )
    if any(_BOOST_RE.match(t) for t in toks):
        from .analyzer import tokenize as _tok

        # boost keys are ANALYZER tokens (a multi-token body like
        # "data-base^3" boosts each of its tokens) and non-positive
        # weights fall back to 1.0 — the parser stays total, never
        # producing input batch_search would reject
        boosts: dict[str, float] = {}
        bare = []
        for t in toks:
            m = _BOOST_RE.match(t)
            if m:
                w = float(m.group("w"))
                for term in _tok(m.group("body")):
                    if w > 0:
                        boosts[term] = w
                bare.append(m.group("body"))
            else:
                bare.append(t)
        if not boosts:
            return ParsedQuery(op="bm25", text=" ".join(bare))
        return ParsedQuery(op="boosted", text=" ".join(bare), clauses=boosts)
    return ParsedQuery(op="bm25", text=line)


def run_query(reader, line: str, k: int = 10) -> DataFrame:
    """Parse + dispatch + normalize to (doc_id, score), (score DESC,
    doc_id ASC)."""
    q = parse_query(line)
    if q.op == "phrase":
        from .operators.phrase import phrase_search

        res = phrase_search(reader, q.text, k).select("doc_id", "score")
    elif q.op == "near":
        from .operators.phrase import near_search

        res = near_search(reader, q.text, q.slop, k).select("doc_id", "score")
    elif q.op == "boolean":
        from .operators.boolean import boolean_search

        res = boolean_search(reader, q.must, q.should, q.must_not, k).select(
            "doc_id", "score"
        )
    elif q.op == "prefix":
        from .operators.prefix import prefix_search

        res = prefix_search(reader, q.text, k).select("doc_id", "score")
    elif q.op == "fuzzy":
        from .operators.prefix import fuzzy_search

        res = fuzzy_search(reader, q.text, q.dist, k).select("doc_id", "score")
    elif q.op == "boosted":
        res = reader.batch_search([("q", q.text)], k, boosts=q.clauses).select(
            "doc_id", "score"
        )
    else:
        res = reader.batch_search([("q", q.text)], k).select("doc_id", "score")
    return res.orderBy(F.desc("score"), F.asc("doc_id"))

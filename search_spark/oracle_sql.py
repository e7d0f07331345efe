"""ANSI-SQL (DuckDB) oracle generators for the driver's correctness gate.

Every query exposed in ``__spark_entry__.queries()`` gets an equivalent SQL
string built here, over the driver's pre-registered parquet views.  The SQL
reuses the exact frozen analyzer fragment (analyzer.sql_tokens) and BM25
formula fragments (functions.bm25.sql_*) so engine and oracle share one
spec.

Float-output convention: scores are emitted as integer micro-units
(``CAST(round(score * 1e6) AS BIGINT)``) on BOTH sides — the driver
compares order-insensitive value hashes, and double rounding paths differ
across engines at the last ulp, so integers are the only safe wire format.
Ranks are computed over the *rounded* score (+ doc_id tiebreak) so they are
deterministic across engines too.
"""

from __future__ import annotations

from .analyzer import sql_tokens, tokenize
from .functions.bm25 import sql_idf, sql_term_score

DOCS_SQL = "SELECT doc_id, text FROM documents"


def _values_terms(terms: list[str]) -> str:
    rows = ", ".join(f"('{t}')" for t in terms)
    return f"(VALUES {rows}) AS qt(term)"


def bm25_corpus_ctes(docs_sql: str = DOCS_SQL) -> str:
    """Shared CTE bodies: tok, dl, stats, tf, dft (named to avoid keywords)."""
    return f"""
  docs AS ({docs_sql}),
  tok AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM docs),
  dl  AS (SELECT doc_id, len(toks) AS dl FROM tok),
  stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
  tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
    GROUP BY doc_id, term),
  dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term)"""


def bm25_topk_sql(query_text: str, k: int, docs_sql: str = DOCS_SQL) -> str:
    """Top-k BM25 for one query string; output (doc_id, rank, score_micro)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, CAST(NULL AS BIGINT) AS score_micro WHERE false"
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (SELECT term FROM {_values_terms(terms)}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def more_like_this_sql(
    seed_doc: int, k: int, max_terms: int = 8, docs_sql: str = DOCS_SQL
) -> str:
    """Find-similar twin (operators/keywords.more_like_this): the seed
    doc's top ``max_terms`` terms by micro-rounded tf·idf (ties term ASC)
    score as a disjunctive BM25 query, seed excluded."""
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  kw AS (
    SELECT tf.term
    FROM tf JOIN dft USING (term) CROSS JOIN stats
    WHERE tf.doc_id = {int(seed_doc)}
    ORDER BY CAST(round(tf.tf * {idf} * 1e6) AS BIGINT) DESC, tf.term
    LIMIT {max_terms}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN kw USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    WHERE tf.doc_id != {int(seed_doc)}
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def bm25_topk_excluding_sql(
    query_text: str, k: int, excluded_pred: str, docs_sql: str = DOCS_SQL
) -> str:
    """Logical-delete twin (tombstones, pre-purge): BM25 scored with the
    FULL corpus's stats (N, avgdl, df) but docs matching ``excluded_pred``
    (a SQL boolean over ``doc_id``, e.g. ``doc_id % 7 = 3`` or
    ``doc_id IN (...)``) removed from the ranking — exactly what a
    tombstoned index serves until a compaction physically purges."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, CAST(NULL AS BIGINT) AS score_micro WHERE false"
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    pred = excluded_pred.replace("doc_id", "tf.doc_id")
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (SELECT term FROM {_values_terms(terms)}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    WHERE NOT ({pred})
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def docs_sql_excluding(excluded_pred: str) -> str:
    """Docs view minus rows matching ``excluded_pred`` — the physical-
    purge twin: feed to bm25_topk_sql so N/avgdl/df are recomputed over
    the reduced corpus, exactly what a compaction purge leaves behind."""
    return f"SELECT doc_id, text FROM documents WHERE NOT ({excluded_pred})"


def phrase_topk_sql(phrase_text: str, k: int, docs_sql: str = DOCS_SQL) -> str:
    """Top-k BM25 phrase search (operators/phrase.py twin): the phrase is
    one pseudo-term with tf = exact (overlap-counting) occurrence count
    via a positional scan over the token list, df = docs containing it;
    output (doc_id, rank, score_micro, ptf)."""
    terms = tokenize(phrase_text)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro, 0 AS ptf WHERE false"
        )
    w = len(terms)
    conds = " AND ".join(
        f"toks[i+{j}] = '{t}'" if j else f"toks[i] = '{t}'"
        for j, t in enumerate(terms)
    )
    idf = sql_idf("stats.n_docs", "pdf.df")
    score = sql_term_score("hits.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH docs AS ({docs_sql}),
  tok AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM docs),
  dl  AS (SELECT doc_id, len(toks) AS dl FROM tok),
  stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
  ptf AS (
    SELECT doc_id,
           len(list_filter(range(1, greatest(len(toks) - {w} + 2, 1)),
                           i -> {conds})) AS tf
    FROM tok),
  hits AS (SELECT doc_id, tf FROM ptf WHERE tf >= 1),
  pdf AS (SELECT count(*) AS df FROM hits),
  scored AS (
    SELECT hits.doc_id, hits.tf AS ptf, {score} AS score
    FROM hits JOIN dl ON dl.doc_id = hits.doc_id
    CROSS JOIN stats CROSS JOIN pdf),
  rounded AS (
    SELECT doc_id, ptf, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro,
       CAST(ptf AS INT) AS ptf
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def near_topk_sql(
    query_text: str, slop: int, k: int, docs_sql: str = DOCS_SQL
) -> str:
    """Top-k BM25 proximity search (operators/phrase.near_search twin):
    pseudo-term tf = number of start offsets whose window of
    |distinct terms| + slop tokens contains every query term in any
    order; output (doc_id, rank, score_micro, ptf)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro, 0 AS ptf WHERE false"
        )
    w = len(terms) + slop
    terms_list = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    # window clamped to the doc (engine's w_eff), so short docs containing
    # every term still match on their single whole-doc window
    weff = f"least({w}, len(toks))"
    cond = f"list_has_all(list_slice(toks, i, i + {weff} - 1), {terms_list})"
    idf = sql_idf("stats.n_docs", "pdf.df")
    score = sql_term_score("hits.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH docs AS ({docs_sql}),
  tok AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM docs),
  dl  AS (SELECT doc_id, len(toks) AS dl FROM tok),
  stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
  ptf AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= {len(terms)} THEN
             len(list_filter(range(1, greatest(len(toks) - {weff} + 2, 1)),
                             i -> {cond}))
           ELSE 0 END AS tf
    FROM tok),
  hits AS (SELECT doc_id, tf FROM ptf WHERE tf >= 1),
  pdf AS (SELECT count(*) AS df FROM hits),
  scored AS (
    SELECT hits.doc_id, hits.tf AS ptf, {score} AS score
    FROM hits JOIN dl ON dl.doc_id = hits.doc_id
    CROSS JOIN stats CROSS JOIN pdf),
  rounded AS (
    SELECT doc_id, ptf, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro,
       CAST(ptf AS INT) AS ptf
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def phrase_count_sql(phrase_text: str, docs_sql: str = DOCS_SQL) -> str:
    """(n_docs, n_occurrences) of the exact phrase across the corpus."""
    terms = tokenize(phrase_text)
    if not terms:
        return (
            "SELECT CAST(0 AS BIGINT) AS n_docs, CAST(0 AS BIGINT) AS n_occurrences"
        )
    w = len(terms)
    conds = " AND ".join(
        f"toks[i+{j}] = '{t}'" if j else f"toks[i] = '{t}'"
        for j, t in enumerate(terms)
    )
    return f"""
WITH docs AS ({docs_sql}),
  tok AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM docs),
  ptf AS (
    SELECT doc_id,
           len(list_filter(range(1, greatest(len(toks) - {w} + 2, 1)),
                           i -> {conds})) AS tf
    FROM tok),
  hits AS (SELECT doc_id, tf FROM ptf WHERE tf >= 1)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(tf), 0) AS BIGINT) AS n_occurrences
FROM hits"""


def prefix_topk_sql(
    prefix: str,
    k: int,
    max_expansions: int = 64,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Prefix search (operators/prefix.py twin): expand the prefix to the
    top ``max_expansions`` corpus terms by (df DESC, term ASC), then
    disjunctive BM25 over the expansions; output (doc_id, rank,
    score_micro)."""
    toks = tokenize(prefix)
    if not toks:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro WHERE false"
        )
    norm = toks[0]
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (
    SELECT term FROM dft WHERE starts_with(term, '{norm}')
    ORDER BY df DESC, term LIMIT {max_expansions}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def snippet_topk_sql(
    query_text: str, k: int, width: int = 5, docs_sql: str = DOCS_SQL
) -> str:
    """Snippet enrichment (operators/snippet.py twin): top-k BM25 plus the
    2*width+1-token window centred on the first query-term occurrence
    (analyzed token stream); output (doc_id, rank, score_micro,
    match_pos, snippet)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro, 0 AS match_pos, "
            "CAST(NULL AS VARCHAR) AS snippet WHERE false"
        )
    positions = ", ".join(f"list_position(toks, '{t}')" for t in terms)
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (SELECT term FROM {_values_terms(terms)}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored),
  top AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
           score_micro
    FROM rounded
    ORDER BY score_micro DESC, doc_id
    LIMIT {k}),
  enriched AS (
    SELECT top.doc_id, top.rank, top.score_micro,
           CAST(coalesce(list_min(list_filter([{positions}],
                                              x -> x > 0)), 0) AS INT)
             AS match_pos
    FROM top JOIN tok ON tok.doc_id = top.doc_id)
SELECT enriched.doc_id, rank, score_micro, match_pos,
       array_to_string(
         list_slice(toks,
                    greatest(match_pos - {width}, 1),
                    greatest(match_pos - {width}, 1) + {2 * width}),
         ' ') AS snippet
FROM enriched JOIN tok ON tok.doc_id = enriched.doc_id
ORDER BY rank"""


def suggest_terms_sql(prefix: str, n: int = 8, docs_sql: str = DOCS_SQL) -> str:
    """Autocomplete twin (operators/prefix.suggest_terms): top-n corpus
    terms under the prefix by (df DESC, term ASC) with their df."""
    toks = tokenize(prefix)
    if not toks:
        return "SELECT CAST(NULL AS VARCHAR) AS term, CAST(0 AS BIGINT) AS df WHERE false"
    return f"""
WITH {bm25_corpus_ctes(docs_sql)}
SELECT term, CAST(df AS BIGINT) AS df FROM dft
WHERE starts_with(term, '{toks[0]}')
ORDER BY df DESC, term
LIMIT {n}"""


def fuzzy_topk_sql(
    query_text: str,
    max_dist: int = 1,
    k: int = 10,
    max_expansions: int = 16,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Fuzzy search (operators/prefix.fuzzy_search twin): each query token
    expands to its Levenshtein-distance-``max_dist`` corpus-term
    neighborhood capped per token at (df DESC, term ASC); the distinct
    union scores disjunctively; output (doc_id, rank, score_micro)."""
    toks = sorted(set(tokenize(query_text)))
    if not toks:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro WHERE false"
        )
    per_tok = "\n    UNION ALL\n".join(
        f"""(SELECT term FROM dft
      WHERE abs(length(term) - {len(t)}) <= {max_dist}
        AND levenshtein(term, '{t}') <= {max_dist}
      ORDER BY df DESC, term LIMIT {max_expansions})"""
        for t in toks
    )
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (SELECT DISTINCT term FROM ({per_tok})),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def fuzzy_batch_sql(
    pairs: list[tuple[str, str]],
    max_dist: int = 1,
    k: int = 10,
    max_expansions: int = 16,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Batch twin of :func:`fuzzy_topk_sql` (operators/prefix.fuzzy_batch):
    UNION ALL of per-query fuzzy oracles with a query_id column — the
    engine amortizes the dictionary/posting scans, the SEMANTICS are
    per-query identical."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro FROM "
        f"({fuzzy_topk_sql(text, max_dist, k, max_expansions, docs_sql)})"
        for qid, text in pairs
    ]
    return "\nUNION ALL\n".join(parts)


def prefix_batch_sql(
    pairs: list[tuple[str, str]],
    k: int = 10,
    max_expansions: int = 64,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Batch twin of :func:`prefix_topk_sql` (operators/prefix.prefix_batch):
    UNION ALL of per-query prefix oracles with a query_id column — the
    engine shares one dictionary-expansion scan and one posting scan, the
    SEMANTICS are per-query identical."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro FROM "
        f"({prefix_topk_sql(text, k, max_expansions, docs_sql)})"
        for qid, text in pairs
    ]
    return "\nUNION ALL\n".join(parts)


def bm25_page_sql(
    query_text: str, offset: int, size: int, docs_sql: str = DOCS_SQL
) -> str:
    """Pagination twin (wand.IndexReader.search_page): absolute ranks
    offset+1 .. offset+size of the standard BM25 ordering."""
    inner = bm25_topk_sql(query_text, offset + size, docs_sql)
    return f"""
SELECT doc_id, rank, score_micro FROM ({inner})
WHERE rank > {offset}
ORDER BY rank"""


def bm25_boosted_sql(
    query_text: str,
    boosts: dict[str, float],
    k: int,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Boosted BM25 twin (wand.batch_search boosts): each term's idf is
    scaled by its positive weight (idf * boost computed first, exactly
    the engine's float order); output (doc_id, rank, score_micro)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, CAST(NULL AS BIGINT) AS score_micro WHERE false"
    rows = ", ".join(f"('{t}', {float(boosts.get(t, 1.0))!r})" for t in terms)
    idf = f"({sql_idf('stats.n_docs', 'dft.df')} * qt.boost)"
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  q AS (SELECT term, boost FROM (VALUES {rows}) AS v(term, boost)),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN q AS qt USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def boolean_topk_sql(
    must: str = "",
    should: str = "",
    must_not: str = "",
    k: int = 10,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Filtered BM25 top-k (operators/boolean.py twin): docs containing
    ALL must terms (or ≥1 should term when must is empty) and NO must_not
    term, scored over the distinct must ∪ should terms present; output
    (doc_id, rank, score_micro).  A term in both must and must_not is
    treated as must (the engine's clause-precedence rule)."""
    must_t = sorted(set(tokenize(must)))
    should_t = sorted(set(tokenize(should)))
    mnot_t = sorted(set(tokenize(must_not)) - set(must_t))
    scoring = sorted(set(must_t) | set(should_t))
    if k <= 0 or not scoring:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, 1 AS rank, "
            "CAST(NULL AS BIGINT) AS score_micro WHERE false"
        )
    if must_t:
        matched = f"""
    SELECT doc_id FROM tf JOIN (SELECT term FROM {_values_terms(must_t)}) mq USING (term)
    GROUP BY doc_id HAVING count(*) = {len(must_t)}"""
    else:
        matched = f"""
    SELECT DISTINCT doc_id FROM tf JOIN (SELECT term FROM {_values_terms(should_t)}) sq USING (term)"""
    excl = (
        f"""AND doc_id NOT IN (
      SELECT DISTINCT doc_id FROM tf JOIN (SELECT term FROM {_values_terms(mnot_t)}) nq USING (term))"""
        if mnot_t
        else ""
    )
    idf = sql_idf("stats.n_docs", "dft.df")
    score = sql_term_score("tf.tf", "dl.dl", "stats.avgdl", idf)
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  matched AS ({matched}),
  cand AS (SELECT doc_id FROM matched WHERE true {excl}),
  scored AS (
    SELECT tf.doc_id, sum({score}) AS score
    FROM tf
    JOIN (SELECT term FROM {_values_terms(scoring)}) q USING (term)
    JOIN dft USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN cand ON cand.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id),
  rounded AS (
    SELECT doc_id, CAST(round(score * 1000000) AS BIGINT) AS score_micro
    FROM scored)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       score_micro
FROM rounded
ORDER BY score_micro DESC, doc_id
LIMIT {k}"""


def boolean_batch_sql(
    clauses: list[tuple[str, str, str, str]],
    k: int = 10,
    docs_sql: str = DOCS_SQL,
) -> str:
    """Batched boolean retrieval (operators/boolean.boolean_batch twin):
    per-clause boolean_topk_sql results unioned under their query_id —
    (query_id, doc_id, rank, score_micro)."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro\n"
        f"FROM ({boolean_topk_sql(must, should, must_not, k, docs_sql)})"
        for qid, must, should, must_not in clauses
    ]
    return "\nUNION ALL\n".join(parts)


def phrase_batch_sql(
    pairs: list[tuple[str, str]], k: int = 10, docs_sql: str = DOCS_SQL
) -> str:
    """Batched phrase search (operators/phrase.phrase_batch twin):
    per-phrase phrase_topk_sql results unioned under their query_id —
    (query_id, doc_id, rank, score_micro, ptf)."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro, ptf\n"
        f"FROM ({phrase_topk_sql(text, k, docs_sql)})"
        for qid, text in pairs
    ]
    return "\nUNION ALL\n".join(parts)


def near_batch_sql(
    triples: list[tuple[str, str, int]], k: int = 10, docs_sql: str = DOCS_SQL
) -> str:
    """Batched proximity search (operators/phrase.near_batch twin):
    per-query near_topk_sql results unioned under their query_id —
    (query_id, doc_id, rank, score_micro, ptf)."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro, ptf\n"
        f"FROM ({near_topk_sql(text, slop, k, docs_sql)})"
        for qid, text, slop in triples
    ]
    return "\nUNION ALL\n".join(parts)


def facet_counts_sql(
    query_text: str,
    facet_expr: str,
    k: int = 10,
    mode: str = "any",
    docs_sql: str = DOCS_SQL,
) -> str:
    """Facet the query's match set (operators/boolean.facet_counts twin):
    (facet_value, n_docs) top-k by (n_docs DESC, facet_value ASC NULLS
    LAST).  ``facet_expr`` is a SQL expression over ``docs`` columns
    (transcript facets derive from doc_id — corpus.SQL_TRANSCRIPTS_FROM_
    DOCUMENTS assigns role/tool as pure functions of doc_id)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return "SELECT CAST(NULL AS VARCHAR) AS facet_value, CAST(0 AS BIGINT) AS n_docs WHERE false"
    if mode == "all":
        matched = f"""
    SELECT doc_id FROM tf JOIN (SELECT term FROM {_values_terms(terms)}) q USING (term)
    GROUP BY doc_id HAVING count(*) = {len(terms)}"""
    else:
        matched = f"""
    SELECT DISTINCT doc_id FROM tf JOIN (SELECT term FROM {_values_terms(terms)}) q USING (term)"""
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  matched AS ({matched})
SELECT CAST({facet_expr} AS VARCHAR) AS facet_value,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matched JOIN docs USING (doc_id)
GROUP BY 1
ORDER BY n_docs DESC, facet_value ASC NULLS LAST
LIMIT {k}"""


def bm25_batch_sql(pairs: list[tuple[str, str]], k: int, docs_sql: str = DOCS_SQL) -> str:
    """Batch top-k: UNION ALL of per-query oracles with a query_id column."""
    parts = [
        f"SELECT '{qid}' AS query_id, doc_id, rank, score_micro FROM ({bm25_topk_sql(text, k, docs_sql)})"
        for qid, text in pairs
    ]
    return "\nUNION ALL\n".join(parts)


def dictionary_sql(limit: int = 100, docs_sql: str = DOCS_SQL) -> str:
    """Top terms by (df DESC, term ASC): (term, df, cf)."""
    return f"""
WITH {bm25_corpus_ctes(docs_sql)},
  agg AS (
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM tf GROUP BY term)
SELECT term, df, cf FROM agg
ORDER BY df DESC, term
LIMIT {limit}"""


def corpus_stats_sql(docs_sql: str = DOCS_SQL) -> str:
    """(n_docs, total_tokens, avgdl_micro, vocab, postings)."""
    return f"""
WITH {bm25_corpus_ctes(docs_sql)}
SELECT (SELECT count(*) FROM dl) AS n_docs,
       (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS total_tokens,
       (SELECT CAST(round(avg(dl) * 1000000) AS BIGINT) FROM dl) AS avgdl_micro,
       (SELECT count(*) FROM dft) AS vocab,
       (SELECT count(*) FROM tf) AS postings"""


def doclens_sql(docs_sql: str = DOCS_SQL) -> str:
    return f"""
WITH {bm25_corpus_ctes(docs_sql)}
SELECT doc_id, CAST(dl AS INT) AS dl FROM dl"""


def transcripts_docs_sql() -> str:
    """Transcript-shaped corpus derived from `documents`, with doc_id
    re-assigned as the dense rank under (conv_id, turn_idx) — mirrors
    operators.docids.assign_doc_ids."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS

    return f"""SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id, text
  FROM ({SQL_TRANSCRIPTS_FROM_DOCUMENTS})"""


def _pack_ctes(budget: int) -> str:
    """Shared CTEs for the packing oracles (operators/packing.py twin):
    transcript order (conv_id, turn_idx), analyzer token counts, exclusive
    prefix sum, integer-division sequence assignment."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS

    return f"""
  tr AS ({SQL_TRANSCRIPTS_FROM_DOCUMENTS}),
  t AS (SELECT conv_id, turn_idx,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
        FROM tr),
  c AS (SELECT conv_id, turn_idx, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                 ORDER BY conv_id, turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS start_offset
        FROM t),
  assigned AS (
    SELECT conv_id, turn_idx, n_tokens, start_offset,
           start_offset // {budget} AS seq_id,
           (n_tokens > 0 AND
            (start_offset + n_tokens - 1) // {budget} != start_offset // {budget})
             AS spans_boundary
    FROM c)"""


def pack_assignments_sql(budget: int) -> str:
    """Per-turn packing assignment: (conv_id, turn_idx, n_tokens,
    start_offset, seq_id, spans_boundary)."""
    return f"""
WITH {_pack_ctes(budget)}
SELECT conv_id, turn_idx, n_tokens, start_offset,
       CAST(seq_id AS BIGINT) AS seq_id, spans_boundary
FROM assigned"""


def pack_summary_sql(budget: int) -> str:
    """Per-sequence rollup: (seq_id, n_turns, seq_tokens, n_spanning)."""
    return f"""
WITH {_pack_ctes(budget)}
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       CAST(sum(CASE WHEN spans_boundary THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
FROM assigned
GROUP BY seq_id"""


def _split_case_sql(key_expr: str, weights: dict[str, float], salt: str) -> str:
    """CASE expression mirroring operators/splits.split_col exactly:
    h32(salt||key) against integer thresholds floor(cum_weight * 2^32)."""
    from .functions.hashing import h32_sql
    from .operators.splits import _thresholds

    h = h32_sql(f"'{salt}' || CAST({key_expr} AS VARCHAR)")
    ths = _thresholds(weights)
    whens = "\n         ".join(
        f"WHEN {h} < {t} THEN '{name}'" for name, t in ths
    )
    return f"CASE {whens} END"


def split_summary_sql(weights: dict[str, float], salt: str) -> str:
    """(split, n_convs, n_turns, n_tokens) over the transcript corpus,
    keyed on conv_id (operators/splits.assign_splits twin)."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS

    case = _split_case_sql("conv_id", weights, salt)
    return f"""
WITH tr AS ({SQL_TRANSCRIPTS_FROM_DOCUMENTS}),
  assigned AS (
    SELECT conv_id, {case} AS split,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
    FROM tr)
SELECT split,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split"""


def split_assignments_sql(weights: dict[str, float], salt: str) -> str:
    """(conv_id, split) — one row per conversation."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS

    case = _split_case_sql("conv_id", weights, salt)
    return f"""
WITH tr AS ({SQL_TRANSCRIPTS_FROM_DOCUMENTS})
SELECT DISTINCT conv_id, {case} AS split FROM tr"""


def hash_sample_sql(rate: float, salt: str) -> str:
    """Sampled (conv_id, turn_idx) rows (operators/splits.hash_sample
    twin): h32(salt||conv_id) < floor(rate * 2^32)."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS
    from .functions.hashing import h32_sql

    h = h32_sql(f"'{salt}' || CAST(conv_id AS VARCHAR)")
    return f"""
WITH tr AS ({SQL_TRANSCRIPTS_FROM_DOCUMENTS})
SELECT conv_id, turn_idx FROM tr WHERE {h} < {int(rate * 2**32)}"""


def _materialize_ctes(
    budget: int,
    min_quality_micro: int,
    weights: dict[str, float],
    salt: str,
) -> str:
    """Shared CTEs mirroring operators/materialize.py end to end:
    quality → filter → dedup keeper → split → per-split packing."""
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS
    from .functions.textstats import quality_sql, quality_sql_lateral

    case = _split_case_sql("conv_id", weights, salt)
    return f"""
  tr AS ({SQL_TRANSCRIPTS_FROM_DOCUMENTS}),
  helpers AS (
    SELECT conv_id, turn_idx, text, {quality_sql_lateral('text')}
    FROM tr),
  scoredq AS (
    SELECT conv_id, turn_idx, text, {quality_sql('text')}
    FROM helpers),
  kept AS (
    SELECT conv_id, turn_idx, text, quality_micro FROM scoredq
    WHERE quality_micro >= {min_quality_micro}),
  uniq AS (
    SELECT conv_id, turn_idx, text, quality_micro FROM (
      SELECT *, row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY conv_id, turn_idx) AS rn
      FROM kept)
    WHERE rn = 1),
  assigned AS (
    SELECT conv_id, turn_idx, quality_micro, {case} AS split,
           CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
    FROM uniq),
  packed AS (
    SELECT conv_id, turn_idx, split, n_tokens, quality_micro,
           CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY split ORDER BY conv_id, turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS start_offset
    FROM assigned)"""


def materialize_sql(
    budget: int,
    min_quality_micro: int,
    weights: dict[str, float],
    salt: str,
) -> str:
    """Per-turn materialization assignment: (conv_id, turn_idx, split,
    seq_id, n_tokens, quality_micro)."""
    return f"""
WITH {_materialize_ctes(budget, min_quality_micro, weights, salt)}
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, split,
       CAST(start_offset // {budget} AS BIGINT) AS seq_id,
       n_tokens, quality_micro
FROM packed"""


def materialize_summary_sql(
    budget: int,
    min_quality_micro: int,
    weights: dict[str, float],
    salt: str,
) -> str:
    """Audit rollup per split: (split, n_seqs, n_turns, n_tokens)."""
    return f"""
WITH {_materialize_ctes(budget, min_quality_micro, weights, salt)}
SELECT split,
       CAST(count(DISTINCT start_offset // {budget}) AS BIGINT) AS n_seqs,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM packed
GROUP BY split"""


def doc_ids_stable_sql() -> str:
    from .corpus import SQL_TRANSCRIPTS_FROM_DOCUMENTS

    return f"""
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS doc_id
FROM ({SQL_TRANSCRIPTS_FROM_DOCUMENTS})"""

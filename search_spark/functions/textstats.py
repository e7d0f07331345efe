"""Text-analysis functions for training-data pipelines — spec v1.

Four operator families over the ``documents`` corpus, each implemented
twice from one frozen spec: a Spark Column expression (pure JVM built-ins,
whole-stage codegen — no Python UDFs) and a DuckDB SQL fragment for the
driver's correctness oracle.  Float outputs cross the comparison boundary
as integer micro-units (see oracle_sql.py module docstring).

- token counting: whitespace tokens, analyzer tokens, and a BPE-ish
  subword estimate (ceil(len/4) pieces per analyzer token — a documented,
  deterministic stand-in for a real BPE vocab, which isn't shippable as a
  frozen cross-engine spec).
- language ID: marker-word voting over a fixed per-language stopword
  table; argmax with lexicographic tie-break, 'und' when no marker hits.
- quality scoring: length/stopword/alpha-ratio composite in [0, 1].
- document fingerprinting: rolling hash over the token stream
  (functions/hashing.py).

The reference has no text analytics (its text processing is one opaque
embedding call, /root/reference/llama.go:55-59); these are the
training-pipeline extensions required by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analyzer import sql_tokens, tokenize, tokens_col

TEXTSTATS_VERSION = 1

#: marker words per language — frozen spec table (votes, not linguistics).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "with", "for"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour", "sur"),
    "de": ("der", "die", "und", "das", "ist", "mit", "von", "ein"),
}

#: stopword list for quality scoring (a subset of the 'en' markers plus
#: corpus-frequent function words; frozen).
STOPWORDS: tuple[str, ...] = ("the", "and", "of", "to", "in", "is", "a", "on")

WS_TOKEN_RE = r"\S+"


# -- token counting ---------------------------------------------------------

def ws_token_count_col(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(WS_TOKEN_RE), 0)).cast("int")


def ws_token_count_sql(expr: str) -> str:
    return rf"CAST(len(regexp_extract_all({expr}, '\S+')) AS INT)"


def bpe_count_col(tokens: Column) -> Column:
    """Σ ceil(len(tok)/4) — integer fold, order-free (sum)."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) + F.lit(3)) / F.lit(4)).cast("long"),
    ).cast("int")


def bpe_count_sql(tokens_expr: str) -> str:
    return (
        f"CAST(COALESCE(list_sum(list_transform({tokens_expr}, "
        f"t -> (len(t) + 3) // 4)), 0) AS INT)"
    )


def bpe_count_py(tokens: list[str]) -> int:
    return sum((len(t) + 3) // 4 for t in tokens)


# -- language ID ------------------------------------------------------------

def _lang_vote_col(tokens: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def lang_id_col(tokens: Column) -> Column:
    """argmax of marker votes; ties → lexicographically first language;
    zero votes → 'und'.  Expressed as a sort over (−votes, lang) structs —
    pure JVM array ops."""
    pairs = F.array(
        *[
            F.struct(
                (-_lang_vote_col(tokens, m)).cast("long").alias("neg"),
                F.lit(lang).alias("lang"),
                _lang_vote_col(tokens, m).alias("votes"),
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_sort(pairs)[0]
    return F.when(best["votes"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id_sql(tokens_expr: str) -> str:
    votes = {
        lang: (
            f"len(list_filter({tokens_expr}, t -> t IN ("
            + ", ".join(f"'{w}'" for w in m)
            + ")))"
        )
        for lang, m in sorted(LANG_MARKERS.items())
    }
    # same argmax: sort (−votes, lang) pairs, take first
    struct_list = ", ".join(f"(-({v}), '{k}', ({v}))" for k, v in votes.items())
    return (
        f"(CASE WHEN (list_sort([{struct_list}])[1])[3] > 0 "
        f"THEN (list_sort([{struct_list}])[1])[2] ELSE 'und' END)"
    )


def lang_id_py(tokens: list[str]) -> str:
    best = min(
        (
            (-sum(1 for t in tokens if t in set(m)), lang)
            for lang, m in sorted(LANG_MARKERS.items())
        ),
    )
    return best[1] if -best[0] > 0 else "und"


# -- quality scoring --------------------------------------------------------

def quality_cols(text: Column, tokens: Column) -> dict[str, Column]:
    """Component columns + composite; every ratio is micro-rounded at the
    output boundary, the composite is computed on the *unrounded* doubles
    (identically on the SQL side)."""
    n_tok = F.size(tokens).cast("long")
    safe_n = F.greatest(n_tok, F.lit(1)).cast("double")
    tok_chars = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_len = tok_chars / safe_n
    stop_n = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS))).cast("double")
    stop_ratio = stop_n / safe_n
    n_chars = F.length(text).cast("double")
    alpha_ratio = tok_chars / F.greatest(n_chars, F.lit(1).cast("double"))
    # composite: in-range-length band × (1 − excess-stopword penalty) × alpha
    len_score = F.when((n_tok >= 5) & (n_tok <= 1000), F.lit(1.0)).otherwise(F.lit(0.2))
    quality = len_score * (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))) * alpha_ratio
    return {
        "n_tokens": n_tok.cast("int"),
        "mean_tok_len_micro": F.round(mean_len * 1e6).cast("bigint"),
        "stop_ratio_micro": F.round(stop_ratio * 1e6).cast("bigint"),
        "alpha_ratio_micro": F.round(alpha_ratio * 1e6).cast("bigint"),
        "quality_micro": F.round(quality * 1e6).cast("bigint"),
    }


def quality_sql(text_expr: str) -> str:
    """SELECT-list fragment (without doc_id) mirroring quality_cols."""
    toks = sql_tokens(text_expr)
    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
  CAST(len({toks}) AS INT) AS n_tokens,
  CAST(round(tok_chars / safe_n * 1e6) AS BIGINT) AS mean_tok_len_micro,
  CAST(round(stop_n / safe_n * 1e6) AS BIGINT) AS stop_ratio_micro,
  CAST(round(tok_chars / greatest(CAST(len({text_expr}) AS DOUBLE), 1.0) * 1e6) AS BIGINT) AS alpha_ratio_micro,
  CAST(round(
    (CASE WHEN len({toks}) BETWEEN 5 AND 1000 THEN 1.0 ELSE 0.2 END)
    * (1.0 - least(stop_n / safe_n * 2, 1.0))
    * (tok_chars / greatest(CAST(len({text_expr}) AS DOUBLE), 1.0)) * 1e6) AS BIGINT) AS quality_micro"""


def quality_sql_lateral(text_expr: str) -> str:
    """Helper columns (safe_n, tok_chars, stop_n) as a lateral-style CTE body."""
    toks = sql_tokens(text_expr)
    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
  CAST(greatest(len({toks}), 1) AS DOUBLE) AS safe_n,
  CAST(COALESCE(list_sum(list_transform({toks}, t -> len(t))), 0) AS DOUBLE) AS tok_chars,
  CAST(len(list_filter({toks}, t -> t IN ({stop_in}))) AS DOUBLE) AS stop_n"""

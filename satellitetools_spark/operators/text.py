"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure built-in column expressions (whole-stage codegen, no
Python in the hot path) with exact ANSI-SQL equivalents for oracle checks:
language ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single other non-space
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# marker words per language for the n-gram/stopword heuristic; the argmax
# tie-break is the list order below (first wins)
LANG_MARKERS = {
    "en": ["the", "and", "of", "a"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "que", "de"],
    "zh": ["de", "shi", "zai", "he"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]


def _word_count(text: Column, word: str) -> Column:
    # count whole-word occurrences via split on padded text
    return F.size(F.split(F.concat(F.lit(" "), text, F.lit(" ")),
                          f" {word} ")) - 1


def _word_count_sql(text: str, word: str) -> str:
    return f"(len(str_split(' ' || {text} || ' ', ' {word} ')) - 1)"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, BPE-ish token count, char count, avg len."""
    t = F.col(text_col)
    ws_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), "\\s+")))
    bpe_tokens = F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        ws_tokens.alias("n_tokens"),
        bpe_tokens.alias("n_bpe_tokens"),
        F.round(F.length(F.regexp_replace(t, "\\s+", "")) /
                F.greatest(ws_tokens, F.lit(1)), 6).alias("avg_token_len"),
    )


def token_stats_sql(table: str = "documents", text_col: str = "text") -> str:
    t = text_col
    ws = f"CASE WHEN length(trim({t})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({t}), '\\s+')) END"
    return f"""
SELECT doc_id,
       length({t}) AS n_chars,
       {ws} AS n_tokens,
       len(regexp_extract_all({t}, '{BPE_PATTERN}')) AS n_bpe_tokens,
       ROUND(length(regexp_replace({t}, '\\s+', '', 'g'))
             / GREATEST({ws}, 1), 6) AS avg_token_len
FROM {table}
"""


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality: length, punctuation ratio, stopword ratio, and a
    composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    ws_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), "\\s+")))
    punct = n_chars - F.length(F.regexp_replace(t, "[.,!?;:]", ""))
    stop = sum(_word_count(F.lower(t), w) for w in STOPWORDS)
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop / F.greatest(ws_tokens, F.lit(1)), 6)
    score = F.round(
        F.least(n_chars / F.lit(500.0), F.lit(1.0)) * 0.5
        + F.least(stop / F.greatest(ws_tokens, F.lit(1)) * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct / F.greatest(n_chars, F.lit(1)) * 10.0, F.lit(1.0))) * 0.2,
        6)
    return docs.select(
        "doc_id", n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def quality_score_sql(table: str = "documents", text_col: str = "text") -> str:
    t = text_col
    ws = f"CASE WHEN length(trim({t})) = 0 THEN 0 ELSE len(regexp_split_to_array(trim({t}), '\\s+')) END"
    punct = f"(length({t}) - length(regexp_replace({t}, '[.,!?;:]', '', 'g')))"
    stop = " + ".join(_word_count_sql(f"lower({t})", w) for w in STOPWORDS)
    return f"""
SELECT doc_id,
       length({t}) AS n_chars,
       ROUND({punct} * 1.0 / GREATEST(length({t}), 1), 6) AS punct_ratio,
       ROUND(({stop}) * 1.0 / GREATEST({ws}, 1), 6) AS stopword_ratio,
       ROUND(LEAST(length({t}) / 500.0, 1.0) * 0.5
             + LEAST(({stop}) * 1.0 / GREATEST({ws}, 1) * 5.0, 1.0) * 0.3
             + (1.0 - LEAST({punct} * 1.0 / GREATEST(length({t}), 1) * 10.0, 1.0)) * 0.2,
             6) AS quality
FROM {table}
"""


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic; argmax with fixed tie order."""
    t = F.lower(F.col(text_col))
    scores = {
        lang: sum(_word_count(t, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, scores[lang]).otherwise(best)
    return docs.select("doc_id", pred.alias("lang_pred"),
                       best.cast("int").alias("lang_score"))


def lang_id_sql(table: str = "documents", text_col: str = "text") -> str:
    t = f"lower({text_col})"
    score_exprs = {
        lang: "(" + " + ".join(_word_count_sql(t, w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = score_exprs[langs[0]]
    for lang in langs[1:]:
        s = score_exprs[lang]
        pred = f"CASE WHEN {s} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN {s} > {best} THEN {s} ELSE {best} END"
    return f"""
SELECT doc_id, {pred} AS lang_pred, CAST({best} AS INT) AS lang_score
FROM {table}
"""


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization + md5 content fingerprint (exact-dedup key)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"),
                       F.length(F.col(text_col)).alias("n_chars"))


def fingerprint_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT doc_id,
       md5(lower(regexp_replace({text_col}, '\\s+', ' ', 'g'))) AS fingerprint,
       length({text_col}) AS n_chars
FROM {table}
"""

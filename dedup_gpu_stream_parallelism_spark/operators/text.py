"""Text analysis operators for the training-data pipeline.

The reference's per-chunk statistics block (``print_stats``,
/root/reference/src/encoder.cpp:131-177) reports content distribution
metrics alongside dedup results; a 100 TB training-data pipeline needs the
same per-document content metrics — token counts, language ID, quality
scores — computed scan-side.  Everything here is built from JVM-side
``pyspark.sql.functions`` expressions (whole-stage codegen, no Python), and
every op has an exact DuckDB SQL twin in ``plans/duck_sql.py``; numeric
outputs are ROUND(…, 6) on both sides so value hashes match.

Regexes use only portable character classes (identical semantics in Java
regex and DuckDB's RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# "BPE-ish" word-piece pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"
STOPWORD_PATTERN = " (the|a|of|and|in|to|is) "

# language marker words (padded-space matching avoids \b dialect differences)
LANG_MARKERS = {
    "en": " (the|and|of|is) ",
    "de": " (der|die|das|und|ist) ",
    "es": " (el|los|que|es) ",
    "fr": " (le|les|et|est) ",
}
CJK_PATTERN = "[\\x{4e00}-\\x{9fff}]"  # DuckDB spelling; Spark uses \uXXXX


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), text, F.lit(" "))


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document counting stats: chars, lines, whitespace tokens,
    distinct tokens, word-piece tokens, mean token length."""
    t = F.col(text_col)
    tokens = F.split(F.trim(t), "[ \\t\\n]+")
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(tokens))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("bigint").alias("n_chars"),
        (F.size(F.split(t, "\\n", -1))).cast("bigint").alias("n_lines"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.when(F.length(F.trim(t)) == 0, F.lit(0))
        .otherwise(F.size(F.array_distinct(tokens)))
        .cast("bigint")
        .alias("n_distinct_tokens"),
        F.regexp_count(t, F.lit(TOKEN_PATTERN)).cast("bigint").alias("n_word_pieces"),
        F.round(
            F.when(
                n_tokens > 0,
                F.length(F.regexp_replace(t, "[ \\t\\n]", "")) / n_tokens,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic n-gram/stopword language heuristic.

    Scores each language by marker-word hits (CJK by codepoint class);
    winner by strict-majority cascade in fixed order en→de→es→fr→zh,
    'und' (undetermined) when all scores are zero.
    """
    t = _padded(F.col(text_col))
    scores = {
        lang: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for lang, pat in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(F.col(text_col), F.lit("[\\u4e00-\\u9fff]")).cast(
        "bigint"
    )
    order = ["en", "de", "es", "fr", "zh"]
    best = F.greatest(*[scores[o] for o in order])
    pred = F.when(best == 0, F.lit("und"))
    for o in order:
        pred = pred.when(scores[o] == best, F.lit(o))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[scores[o].alias(f"score_{o}") for o in order],
        pred.alias("predicted_lang"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: mix of length, alphabetic ratio,
    stopword presence, and token-length sanity — the usual cheap pre-filter
    in front of expensive dedup/embedding stages."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    spaces = F.length(F.regexp_replace(t, "[^ ]", ""))
    stop_hits = F.regexp_count(_padded(t), F.lit(STOPWORD_PATTERN))
    tokens = F.when(n > 0, spaces + 1).otherwise(F.lit(0))
    mean_tok = F.when(tokens > 0, (n - spaces) / tokens).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_score = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    stop_score = F.least(stop_hits / F.lit(8.0), F.lit(1.0))
    tok_score = F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    score = F.round(
        0.25 * len_score + 0.25 * alpha_score + 0.25 * stop_score + 0.25 * tok_score, 6
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(len_score, 6).alias("len_score"),
        F.round(alpha_score, 6).alias("alpha_score"),
        F.round(stop_score, 6).alias("stop_score"),
        F.round(tok_score, 6).alias("tok_score"),
        score.alias("quality"),
        (score >= 0.5).cast("int").alias("quality_ok"),
    )

"""DuckDB SQL twins for every SQL-expressible operator.

The driver runs each ``queries()`` entry on Spark AND the matching SQL here
on DuckDB over the same parquet, then hash-compares values — the graft's
round-trip oracle (the role ``dedup -u`` plays for the reference encoder,
/root/reference/src/decoder.cpp:200-291).  Column names, types, and
ROUND(…, 6) of float outputs must match the Spark ops exactly.

Dialect notes (DuckDB 1.0 vs Spark):
* DuckDB ``regexp_replace`` needs the 'g' flag for global replacement.
* CJK class is ``\\x{4e00}`` in RE2 vs ``\\u4e00`` in Java regex.
* ``string_split_regex`` ≙ ``F.split``; ``len(regexp_extract_all(…))`` ≙
  ``F.regexp_count``.
"""

from __future__ import annotations

TEXT_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split_regex(text, '\n')) AS BIGINT) AS n_lines,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '[ \t\n]+')) END
            AS BIGINT) AS n_tokens,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(list_distinct(string_split_regex(trim(text), '[ \t\n]+')))
            END AS BIGINT) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]'))
            AS BIGINT) AS n_word_pieces,
       ROUND(CASE WHEN length(trim(text)) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[ \t\n]', '', 'g'))
                       / CAST(len(string_split_regex(trim(text), '[ \t\n]+'))
                              AS DOUBLE) END, 6) AS mean_token_len
FROM documents ORDER BY doc_id
"""

LANG_ID_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(' ' || text || ' ', ' (the|and|of|is) '))
              AS BIGINT) AS score_en,
         CAST(len(regexp_extract_all(' ' || text || ' ', ' (der|die|das|und|ist) '))
              AS BIGINT) AS score_de,
         CAST(len(regexp_extract_all(' ' || text || ' ', ' (el|los|que|es) '))
              AS BIGINT) AS score_es,
         CAST(len(regexp_extract_all(' ' || text || ' ', ' (le|les|et|est) '))
              AS BIGINT) AS score_fr,
         CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]'))
              AS BIGINT) AS score_zh
  FROM documents
)
SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
       CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0
              THEN 'und'
            WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh)
              THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh)
              THEN 'de'
            WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh)
              THEN 'es'
            WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh)
              THEN 'fr'
            ELSE 'zh' END AS predicted_lang
FROM s ORDER BY doc_id
"""

COSINE_TOPK_SQL = r"""
WITH pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
               6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, cosine
FROM ranked WHERE rank <= 5 ORDER BY vec_id, rank
"""

EMBEDDING_STATS_SQL = r"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)
         AS l2_norm,
       ROUND(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean_val,
       ROUND(list_max(embedding::DOUBLE[]), 6) AS max_val,
       ROUND(list_min(embedding::DOUBLE[]), 6) AS min_val
FROM embeddings ORDER BY vec_id
"""

QUALITY_SCORE_SQL = r"""
WITH q AS (
  SELECT doc_id,
         length(text) AS n,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces,
         len(regexp_extract_all(' ' || text || ' ', ' (the|a|of|and|in|to|is) '))
           AS stop_hits
  FROM documents
), c AS (
  SELECT doc_id,
         least(n / 500.0, 1.0) AS len_score,
         CASE WHEN n > 0 THEN alpha / CAST(n AS DOUBLE) ELSE 0.0 END AS alpha_score,
         least(stop_hits / 8.0, 1.0) AS stop_score,
         CASE WHEN n > 0
                AND (n - spaces) / CAST(spaces + 1 AS DOUBLE) BETWEEN 2.0 AND 12.0
              THEN 1.0 ELSE 0.0 END AS tok_score
  FROM q
)
SELECT doc_id,
       ROUND(len_score, 6) AS len_score,
       ROUND(alpha_score, 6) AS alpha_score,
       ROUND(stop_score, 6) AS stop_score,
       ROUND(tok_score, 6) AS tok_score,
       ROUND(0.25*len_score + 0.25*alpha_score + 0.25*stop_score + 0.25*tok_score, 6)
         AS quality,
       CAST(ROUND(0.25*len_score + 0.25*alpha_score + 0.25*stop_score
                  + 0.25*tok_score, 6) >= 0.5 AS INT) AS quality_ok
FROM c ORDER BY doc_id
"""

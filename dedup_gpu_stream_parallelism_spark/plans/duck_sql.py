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

from dedup_gpu_stream_parallelism_spark.config import (
    BASE1,
    BASE2,
    MERSENNE,
    SIMHASH_HALF_BITS,
    DedupConfig,
)
from dedup_gpu_stream_parallelism_spark.operators.chunk import (
    CDC_MODULUS,
    CDC_WINDOW,
)

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

def quality_ctes(prefix: str = "q") -> str:
    """Shared quality-score CTEs (single source for quality_score and
    keep_list oracles — a threshold/pattern change cannot drift between
    them).  Exposes ``{prefix}flag(doc_id, len_score, alpha_score,
    stop_score, tok_score, quality, quality_ok)`` with UNROUNDED component
    scores (callers round for display)."""
    return f"""
  {prefix}raw AS (
    SELECT doc_id,
           length(text) AS n,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
           length(regexp_replace(text, '[^ ]', '', 'g')) AS spaces,
           len(regexp_extract_all(' ' || text || ' ',
                                  ' (the|a|of|and|in|to|is) ')) AS stop_hits
    FROM documents
  ),
  {prefix}scores AS (
    SELECT doc_id,
           least(n / 500.0, 1.0) AS len_score,
           CASE WHEN n > 0 THEN alpha / CAST(n AS DOUBLE) ELSE 0.0 END
             AS alpha_score,
           least(stop_hits / 8.0, 1.0) AS stop_score,
           CASE WHEN n > 0
                  AND (n - spaces) / CAST(spaces + 1 AS DOUBLE)
                      BETWEEN 2.0 AND 12.0
                THEN 1.0 ELSE 0.0 END AS tok_score
    FROM {prefix}raw
  ),
  {prefix}flag AS (
    SELECT doc_id, len_score, alpha_score, stop_score, tok_score,
           ROUND(0.25*len_score + 0.25*alpha_score + 0.25*stop_score
                 + 0.25*tok_score, 6) AS quality,
           CAST(ROUND(0.25*len_score + 0.25*alpha_score + 0.25*stop_score
                      + 0.25*tok_score, 6) >= 0.5 AS INT) AS quality_ok
    FROM {prefix}scores
  )"""


QUALITY_SCORE_SQL = f"""
WITH
{quality_ctes()}
SELECT doc_id,
       ROUND(len_score, 6) AS len_score,
       ROUND(alpha_score, 6) AS alpha_score,
       ROUND(stop_score, 6) AS stop_score,
       ROUND(tok_score, 6) AS tok_score,
       quality,
       quality_ok
FROM qflag ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Signature-pipeline oracle: the ENTIRE near-dup pipeline (shingles → MinHash
# → LSH bands → CDC chunk keys → candidate pairs → Jaccard/256-gram confirm →
# connected components) expressed in pure DuckDB SQL.  Same pinned integer
# arithmetic as config.py, so every intermediate is bit-identical to the
# Spark/numpy path.  Exact-integer outputs (inter/uni instead of a rounded
# ratio) keep the value-hash float-proof.
# ---------------------------------------------------------------------------


def _weights(k: int, base: int) -> list[int]:
    w, acc = [], 1
    for _ in range(k):
        w.append(acc)
        acc = (acc * base) % MERSENNE
    return w


def _shingle_expr(k: int, base: int, text: str = "text", pos: str = "i") -> str:
    """sum_j unicode(substr(text, i+j, 1)) * base^j mod P (1-based i)."""
    terms = [
        f"unicode(substr({text}, {pos}+{j}, 1))::BIGINT * {w}"
        for j, w in enumerate(_weights(k, base))
    ]
    return f"({' + '.join(terms)}) % {MERSENNE}"


def _perm_values(cfg: DedupConfig) -> str:
    a, b = cfg.minhash_coeffs()
    return ", ".join(f"({t}, {int(a[t])}, {int(b[t])})" for t in range(cfg.num_perm))


def signature_ctes(cfg: DedupConfig) -> str:
    """Shared CTE block (no WITH keyword) for all signature-pipeline oracles."""
    k = cfg.shingle_k
    r = cfg.lsh_rows
    return f"""
  shingles AS (
    SELECT d.doc_id, t.i, {_shingle_expr(k, BASE1)} AS sh
    FROM documents d, LATERAL unnest(generate_series(1, length(d.text) - {k} + 1)) AS t(i)
    WHERE length(d.text) >= {k}
  ),
  shingles2 AS (
    SELECT d.doc_id, t.i, {_shingle_expr(k, BASE2)} AS sh
    FROM documents d, LATERAL unnest(generate_series(1, length(d.text) - {k} + 1)) AS t(i)
    WHERE length(d.text) >= {k}
  ),
  perms(t, pa, pb) AS (VALUES {_perm_values(cfg)}),
  minhash AS (
    SELECT s.doc_id, p.t, MIN((p.pa * s.sh + p.pb) % {MERSENNE}) AS mh
    FROM shingles s CROSS JOIN perms p GROUP BY s.doc_id, p.t
  ),
  bands AS (
    SELECT doc_id, t // {r} AS band, list(mh ORDER BY t) AS bkey
    FROM minhash GROUP BY doc_id, t // {r}
  ),
  lsh_pairs AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  )"""


def bucket_stats_sql(cfg: DedupConfig | None = None) -> str:
    """Bucket-size histogram oracle.  The Spark side buckets by
    xxhash64(band, values); the oracle by the exact (band, value-list) —
    identical partitions unless a 64-bit hash collides (~2^-52 at sf0.01),
    in which case the histogram shifts and the compare fails loudly."""
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)},
  sizes AS (
    SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS bucket_n
    FROM bands GROUP BY band, bkey
  )
SELECT bucket_n, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM sizes GROUP BY bucket_n ORDER BY bucket_n
"""


def minhash_jaccard_estimate_sql(cfg: DedupConfig | None = None) -> str:
    """Matching-permutation count per LSH candidate pair."""
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)}
SELECT p.a_id, p.b_id,
       CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matching
FROM lsh_pairs p
JOIN minhash ma ON ma.doc_id = p.a_id
JOIN minhash mb ON mb.doc_id = p.b_id AND mb.t = ma.t
GROUP BY p.a_id, p.b_id
ORDER BY p.a_id, p.b_id
"""


def cdc_ctes() -> str:
    """CDC chunk CTEs (window={CDC_WINDOW}, avg chunk={CDC_MODULUS})."""
    w = CDC_WINDOW
    m = CDC_MODULUS
    return f"""
  cuts AS (
    SELECT d.doc_id, t.i + {w - 1} AS q
    FROM documents d, LATERAL unnest(generate_series(1, length(d.text) - {w})) AS t(i)
    WHERE length(d.text) > {w}
      AND ({_shingle_expr(w, BASE1)}) % {m} = 0
  ),
  bounds AS (
    SELECT doc_id, q FROM cuts
    UNION ALL
    SELECT doc_id, length(text) AS q FROM documents WHERE length(text) > 0
  ),
  spans AS (
    SELECT doc_id,
           COALESCE(lag(q) OVER (PARTITION BY doc_id ORDER BY q), 0) + 1 AS s,
           q AS e
    FROM bounds
  ),
  chunk_rows AS (
    SELECT sp.doc_id,
           CAST(row_number() OVER (PARTITION BY sp.doc_id ORDER BY sp.s) - 1
                AS BIGINT) AS chunk_idx,
           CAST(sp.s - 1 AS BIGINT) AS chunk_start,
           CAST(sp.e - sp.s + 1 AS BIGINT) AS chunk_len,
           sha256(substr(d.text, sp.s, sp.e - sp.s + 1)) AS chunk_sha
    FROM spans sp JOIN documents d USING (doc_id)
  ),
  cdc_pairs AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM (SELECT DISTINCT doc_id, chunk_sha FROM chunk_rows WHERE chunk_len >= 64) a
    JOIN (SELECT DISTINCT doc_id, chunk_sha FROM chunk_rows WHERE chunk_len >= 64) b
      ON a.chunk_sha = b.chunk_sha AND a.doc_id < b.doc_id
  )"""


def chunk_roundtrip_sql() -> str:
    """Oracle for the chunk-level encode→decode round-trip: the chunk count
    per doc is recomputed independently from the CDC CTEs, and sha_ok is
    pinned to 1 — the Spark side actually reassembles text from the unique-
    chunk store and re-hashes it, so a decode bug shows up as sha_ok=0."""
    return f"""
WITH
{cdc_ctes()},
  per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
    FROM chunk_rows GROUP BY doc_id
  )
SELECT d.doc_id, sha256(d.text) AS sha256,
       CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       1 AS sha_ok
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def chunk_store_stats_sql() -> str:
    """Oracle for the chunk-store storage contract: stored bytes = sum of
    chunk_len over DISTINCT chunk shas."""
    return f"""
WITH
{cdc_ctes()},
  u AS (SELECT DISTINCT chunk_sha, chunk_len FROM chunk_rows),
  tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_chunk_refs,
           CAST(SUM(chunk_len) AS BIGINT) AS total_chars
    FROM chunk_rows
  ),
  st AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(chunk_len) AS BIGINT) AS stored_chars
    FROM u
  )
SELECT tot.n_chunk_refs, st.n_unique_chunks, tot.total_chars, st.stored_chars,
       ROUND(tot.total_chars / CAST(st.stored_chars AS DOUBLE), 6)
         AS space_saving_factor
FROM tot, st
"""


def chunk_compression_stats_sql() -> str:
    """SQL-checkable compress-stage columns over the unique-CHUNK store."""
    return f"""
WITH
{cdc_ctes()},
  u AS (SELECT DISTINCT chunk_sha, chunk_len FROM chunk_rows)
SELECT 'gzip' AS compress_type,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(chunk_len) AS BIGINT) AS total_chars
FROM u
"""


COMPRESSION_PAYLOAD_STATS_SQL = r"""
WITH m AS (
  SELECT sha256(text) AS sha, MIN(doc_id) AS rep FROM documents GROUP BY 1
)
SELECT 'gzip' AS compress_type,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars
FROM documents d JOIN m ON d.doc_id = m.rep
"""


def confirm_ctes(cfg: DedupConfig) -> str:
    sub = cfg.substring_min_len
    thr = cfg.jaccard_threshold
    return f"""
  candidates AS (
    SELECT a_id, b_id FROM lsh_pairs UNION SELECT a_id, b_id FROM cdc_pairs
  ),
  dsh AS (SELECT DISTINCT doc_id, sh FROM shingles),
  shcnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY doc_id),
  isect AS (
    SELECT c.a_id, c.b_id, COUNT(*) AS i
    FROM candidates c
    JOIN dsh x ON x.doc_id = c.a_id
    JOIN dsh y ON y.doc_id = c.b_id AND y.sh = x.sh
    GROUP BY c.a_id, c.b_id
  ),
  grams AS (
    SELECT DISTINCT d.doc_id, sha256(substr(d.text, t.i, {sub})) AS g
    FROM documents d, LATERAL unnest(generate_series(1, length(d.text) - {sub} + 1)) AS t(i)
    WHERE length(d.text) >= {sub}
  ),
  gram_pairs AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  ),
  confirmed AS (
    SELECT c.a_id, c.b_id,
           CAST(COALESCE(i.i, 0) AS BIGINT) AS inter,
           CAST(na.n + nb.n - COALESCE(i.i, 0) AS BIGINT) AS uni,
           CAST(
             CASE WHEN COALESCE(i.i, 0) / CAST(na.n + nb.n - COALESCE(i.i, 0)
                                               AS DOUBLE) >= {thr} THEN 1
                  WHEN g.a_id IS NOT NULL THEN 1
                  ELSE 0 END AS INT) AS confirmed
    FROM candidates c
    JOIN shcnt na ON na.doc_id = c.a_id
    JOIN shcnt nb ON nb.doc_id = c.b_id
    LEFT JOIN isect i ON i.a_id = c.a_id AND i.b_id = c.b_id
    LEFT JOIN gram_pairs g ON g.a_id = c.a_id AND g.b_id = c.b_id
  )"""


def _cluster_tail_ctes() -> str:
    """Shared CC tail (exact edges ∪ confirmed edges → recursive min-label
    reachability) — used by cluster_sql and keep_list_sql so the two can
    never drift."""
    return """
  exact_edges AS (
    SELECT MIN(doc_id) OVER (PARTITION BY sha256(text)) AS a_id, doc_id AS b_id
    FROM documents
    QUALIFY doc_id <> a_id
  ),
  edges AS (
    SELECT a_id, b_id FROM confirmed WHERE confirmed = 1
    UNION SELECT a_id, b_id FROM exact_edges
  ),
  sym AS (
    SELECT a_id AS s, b_id AS d FROM edges
    UNION SELECT b_id AS s, a_id AS d FROM edges
  ),
  reach(v, lab) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT sym.d, reach.lab FROM reach JOIN sym ON sym.s = reach.v
    WHERE reach.lab < sym.d
  ),
  clusters AS (
    SELECT v AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY v
  )"""


def cluster_sql(cfg: DedupConfig | None = None) -> str:
    """Full near_dup_clusters oracle: (doc_id, cluster_id) for every doc."""
    cfg = cfg or DedupConfig()
    return f"""
WITH RECURSIVE
{signature_ctes(cfg)},
{cdc_ctes()},
{confirm_ctes(cfg)},
{_cluster_tail_ctes()}
SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id
"""


def keep_list_sql(cfg: DedupConfig | None = None) -> str:
    """Training-data emission oracle: for every doc, its cluster id, the
    quality flag, and keep = (cluster representative AND quality_ok) —
    the filter ∧ dedup end product."""
    cfg = cfg or DedupConfig()
    return f"""
WITH RECURSIVE
{signature_ctes(cfg)},
{cdc_ctes()},
{confirm_ctes(cfg)},
{_cluster_tail_ctes()},
{quality_ctes("k")}
SELECT c.doc_id, c.cluster_id, kflag.quality_ok,
       CAST(c.doc_id = c.cluster_id AND kflag.quality_ok = 1 AS INT) AS keep
FROM clusters c JOIN kflag USING (doc_id) ORDER BY c.doc_id
"""


def confirmed_pairs_sql(cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)},
{cdc_ctes()},
{confirm_ctes(cfg)}
SELECT a_id, b_id, inter, uni, confirmed FROM confirmed ORDER BY a_id, b_id
"""


def lsh_candidates_sql(cfg: DedupConfig | None = None) -> str:
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)}
SELECT a_id, b_id FROM lsh_pairs ORDER BY a_id, b_id
"""


def stream_matches_sql(cfg: DedupConfig | None = None, n_batches: int = 4) -> str:
    """Oracle for the bounded NearDupStream replay: the stream stages the
    corpus as ``n_batches`` contiguous doc_id ranges (width per =
    ceil(n/n_batches)) and emits a pair exactly once — in the later doc's
    batch, probing the index of strictly earlier batches — iff the two docs
    share an LSH band key AND sit in different ranges.  The SQL recomputes
    that set from the signature CTEs (streaming/replay.py twin)."""
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)},
  params AS (
    SELECT GREATEST((COUNT(*) + {n_batches - 1}) // {n_batches}, 1) AS per
    FROM documents
  )
SELECT p.b_id AS doc_id, p.a_id AS matched_id
FROM lsh_pairs p, params
WHERE p.a_id // params.per < p.b_id // params.per
ORDER BY doc_id, matched_id
"""


def minhash_sql(cfg: DedupConfig | None = None) -> str:
    """Exploded signature matrix: (doc_id, perm, mh)."""
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)}
SELECT doc_id, CAST(t AS INT) AS perm, mh FROM minhash ORDER BY doc_id, perm
"""


def simhash_sql(cfg: DedupConfig | None = None) -> str:
    """(doc_id, simhash): SIMHASH_HALF_BITS majority-vote bits per hash
    stream, packed hi(BASE2)*2^HALF + lo(BASE1); docs shorter than k get
    simhash 0.  The bit width is interpolated from config.py — the single
    spec source shared with functions/signatures.py."""
    cfg = cfg or DedupConfig()
    return f"""
WITH
{signature_ctes(cfg)},
  bits(b) AS (SELECT unnest(generate_series(0, {SIMHASH_HALF_BITS - 1}))),
  votes_lo AS (
    SELECT s.doc_id, b.b AS bit,
           SUM(CASE WHEN (s.sh >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM shingles s CROSS JOIN bits b GROUP BY s.doc_id, b.b
  ),
  votes_hi AS (
    SELECT s.doc_id, b.b AS bit,
           SUM(CASE WHEN (s.sh >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM shingles2 s CROSS JOIN bits b GROUP BY s.doc_id, b.b
  ),
  lo AS (
    SELECT doc_id, SUM(CASE WHEN v >= 0 THEN 1::BIGINT << bit ELSE 0 END) AS v
    FROM votes_lo GROUP BY doc_id
  ),
  hi AS (
    SELECT doc_id, SUM(CASE WHEN v >= 0 THEN 1::BIGINT << bit ELSE 0 END) AS v
    FROM votes_hi GROUP BY doc_id
  )
SELECT d.doc_id,
       -- CAST: SUM() returns HUGEINT; HUGEINT->pandas converts to float64,
       -- which loses precision above 2^53 and breaks the driver value hash.
       CAST(COALESCE(hi.v * (1::BIGINT << {SIMHASH_HALF_BITS}) + lo.v, 0)
            AS BIGINT) AS simhash
FROM documents d
LEFT JOIN lo ON lo.doc_id = d.doc_id
LEFT JOIN hi ON hi.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def cdc_chunks_sql() -> str:
    return f"""
WITH
{cdc_ctes()}
SELECT doc_id, chunk_idx, chunk_start, chunk_len, chunk_sha
FROM chunk_rows ORDER BY doc_id, chunk_idx
"""


def cdc_chunk_stats_sql() -> str:
    return f"""
WITH
{cdc_ctes()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT chunk_sha) AS BIGINT) AS n_unique_chunks,
       CAST(COUNT(*) - COUNT(DISTINCT chunk_sha) AS BIGINT) AS n_duplicate_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS total_chars,
       ROUND(AVG(chunk_len), 6) AS mean_chunk_len,
       ROUND(COUNT(*) / CAST(COUNT(DISTINCT chunk_sha) AS DOUBLE), 6)
         AS chunk_dedup_factor
FROM chunk_rows
"""


def simhash_near_dup_sql(cfg: DedupConfig | None = None, max_hamming: int = 15) -> str:
    """Exact Hamming-ball pairs via brute-force cross join (the banded Spark
    operator is complete for t < n_chunks, so the results must be equal)."""
    cfg = cfg or DedupConfig()
    sim_inner = simhash_sql(cfg)
    return f"""
WITH sim AS (
  SELECT * FROM ({sim_inner})
  WHERE doc_id IN (SELECT doc_id FROM documents
                   WHERE length(text) >= {cfg.shingle_k})
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY a_id, b_id
"""


EVENT_WINDOW_STATS_SQL = r"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       -- per-row fixed-point floor then integer SUM: associative, so the
       -- compare is immune to Spark's partition-dependent partial-agg order
       CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_value_micro,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def embedding_near_dup_sql(threshold: float = 0.55) -> str:
    """Cosine-threshold pairs + recursive-CTE connected components over the
    embeddings table — the embedding-space dedup oracle."""
    return f"""
WITH RECURSIVE
  pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6)
          >= {threshold}
  ),
  sym AS (
    SELECT a_id AS s, b_id AS d FROM pairs
    UNION SELECT b_id, a_id FROM pairs
  ),
  reach(v, lab) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT sym.d, reach.lab FROM reach JOIN sym ON sym.s = reach.v
    WHERE reach.lab < sym.d
  )
SELECT v AS vec_id, MIN(lab) AS cluster_id FROM reach GROUP BY v ORDER BY vec_id
"""

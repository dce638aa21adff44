#!/usr/bin/env python
"""Single-core micro-benchmark of the fused signature stage.

Times _sign_batch (the sign_and_band hot loop) on real corpus documents,
old-vs-new style: the per-doc spec composition vs the fused batch path,
plus a component breakdown of the fused path.  Run ONLY on an idle host
(never alongside scripts/scaling_bench.py — see CLAUDE.md).

Usage: python scripts/sign_micro.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedup_gpu_stream_parallelism_spark.config import BASE1, BASE2, DedupConfig
from dedup_gpu_stream_parallelism_spark.functions import hashing
from dedup_gpu_stream_parallelism_spark.functions.signatures import _sign_batch
from dedup_gpu_stream_parallelism_spark.sources.corpus import generate_corpus


def spec_path(texts, cfg):
    flat1, starts = hashing.batch_shingle_hashes(texts, cfg.shingle_k, BASE1)
    flat2, _ = hashing.batch_shingle_hashes(texts, cfg.shingle_k, BASE2)
    sig = hashing.minhash_signatures(flat1, starts, cfg)
    lo = hashing._segment_bit_votes(flat1, starts)
    hi = hashing._segment_bit_votes(flat2, starts)
    nd = [np.unique(flat1[starts[i]:starts[i+1]]).shape[0] for i in range(len(texts))]
    return sig, lo, hi, nd


def _timed(f) -> float:
    t0 = time.monotonic()
    f()
    return time.monotonic() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cfg = DedupConfig()
    rows, _ = generate_corpus(n_docs, seed=42)
    texts = [r["content"] for r in rows]
    total_chars = sum(len(t) for t in texts)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )

    # warm at full size: the first pass grows the heap high-water mark —
    # workers amortize this across thousands of batches, so steady-state
    # (best-of-2 after warmup) is the honest number.  NOTE (BENCH.md
    # round-5 negative result): single-process numbers from this script
    # INVERT under 8-worker pipeline concurrency (shared-LLC eviction);
    # never ship a hot-path change on this benchmark alone.
    _sign_batch(pdf, "text", cfg, with_chunk_keys=True)
    spec_path(texts, cfg)

    fused = min(
        _timed(lambda: _sign_batch(pdf, "text", cfg, with_chunk_keys=True))
        for _ in range(2)
    )
    spec = min(_timed(lambda: spec_path(texts, cfg)) for _ in range(2))

    parts = [hashing.text_codes(t) for t in texts]
    flat1, flat2, starts, cdc_flat, cdc_starts = hashing.batch_hash_streams(
        parts, cfg.shingle_k, 32
    )
    uniq, ustarts, nd = hashing.batch_distinct_per_doc(flat1, starts)
    t_streams = min(
        _timed(lambda: hashing.batch_hash_streams(parts, cfg.shingle_k, 32))
        for _ in range(2)
    )
    t_distinct = min(
        _timed(lambda: hashing.batch_distinct_per_doc(flat1, starts))
        for _ in range(2)
    )
    t_minhash = min(
        _timed(lambda: hashing.minhash_signatures(uniq, ustarts, cfg))
        for _ in range(2)
    )
    t_votes = min(
        _timed(
            lambda: (
                hashing._segment_bit_votes(flat1, starts),
                hashing._segment_bit_votes(flat2, starts),
            )
        )
        for _ in range(2)
    )

    dup = flat1.shape[0] / max(1, uniq.shape[0])
    print(
        f"n_docs={n_docs} chars={total_chars} "
        f"shingles={flat1.shape[0]} distinct_ratio={dup:.2f}"
    )
    print(
        f"fused _sign_batch: {fused:.3f}s ({total_chars/fused/1e6:.2f} Mchar/s)  "
        f"spec recompose (sha/chunks excl.): {spec:.3f}s"
    )
    print(
        f"components: streams={t_streams:.3f}s distinct={t_distinct:.3f}s "
        f"minhash(uniq)={t_minhash:.3f}s votes={t_votes:.3f}s "
        f"sha+chunks+frame={fused - t_streams - t_distinct - t_minhash - t_votes:.3f}s"
    )


if __name__ == "__main__":
    main()

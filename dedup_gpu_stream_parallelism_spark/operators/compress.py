"""Compress stage — the reference's K1-K3 kernels over unique payloads.

The reference compresses each UNIQUE chunk with none/gzip/bzip2/lzss
(``sub_Compress``, /root/reference/src/encoder.cpp:299-388) while
duplicates bypass the stage entirely (routing at :580-594).  Same shape
here: only representative rows (is_duplicate = 0) flow through the
Arrow-batched codec UDF; duplicates carry the sha FK only.  LZSS (K4) is
covered twice: its match-finding role lives in verify.py's suffix-array
pass (SURVEY.md §2.4), and the literal bit-stream codec — the reference's
benchmark default, ``-w lzss`` (src/dedup.cpp:113-114) — is
functions/lzss_codec.py, fuzz-verified bit-exact against a build of the
reference's own LzssEncodeMemory.

Codecs run stdlib-C-side (zlib/bz2 release the GIL) or numpy-vectorized
(lzss), one Arrow batch at a time; the bound per task is input bytes,
which the scan/partition sizing already controls.
"""

from __future__ import annotations

import bz2
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import (
    lzss_decode,
    lzss_encode,
)

COMPRESS_NONE = "none"
COMPRESS_GZIP = "gzip"
COMPRESS_BZIP2 = "bzip2"
COMPRESS_LZSS = "lzss"

_ENCODERS = {
    COMPRESS_NONE: lambda b: b,
    COMPRESS_GZIP: lambda b: zlib.compress(b),  # level default, like encoder.cpp:318
    COMPRESS_BZIP2: lambda b: bz2.compress(b, 9),  # blockSize100k=9, encoder.cpp:341
    COMPRESS_LZSS: lzss_encode,  # encoder.cpp:355-376 via LzssEncodeMemory
}
_DECODERS = {
    COMPRESS_NONE: lambda b: b,
    COMPRESS_GZIP: lambda b: zlib.decompress(b),
    COMPRESS_BZIP2: lambda b: bz2.decompress(b),
    COMPRESS_LZSS: lzss_decode,  # decoder.cpp:168-190 via LzssDecodeMemory
}

COMPRESSED_SCHEMA = (
    "sha256 string, compress_type string, payload_chars bigint, "
    "compressed_bytes bigint, compressed binary"
)


def compress_store(
    store: DataFrame,
    compress_type: str = COMPRESS_GZIP,
    payload_col: str = "payload",
) -> DataFrame:
    """Unique-payload store (sha256, payload) → compressed store.

    Output keeps the payload sizes so compression stats need no decode."""
    if compress_type not in _ENCODERS:
        raise ValueError(f"unknown compress_type {compress_type!r}")
    enc = _ENCODERS[compress_type]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [(t or "").encode("utf-8") for t in pdf[payload_col]]
            comp = [enc(b) for b in raw]
            yield pd.DataFrame(
                {
                    "sha256": pdf["sha256"],
                    "compress_type": compress_type,
                    "payload_chars": pd.array([len(t or "") for t in pdf[payload_col]], dtype="int64"),
                    "compressed_bytes": pd.array([len(c) for c in comp], dtype="int64"),
                    "compressed": comp,
                }
            )

    return store.mapInPandas(gen, schema=COMPRESSED_SCHEMA)


def decompress_store(compressed: DataFrame) -> DataFrame:
    """Inverse of compress_store: (sha256, compress_type, payload) back out;
    used by the round-trip oracle (the decoder's uncompress_chunk,
    /root/reference/src/decoder.cpp:107-197).  compress_type is kept so a
    multi-codec store stays row-identifiable after decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ctype, blob in zip(pdf["compress_type"], pdf["compressed"]):
                out.append(_DECODERS[ctype](bytes(blob)).decode("utf-8"))
            yield pd.DataFrame(
                {
                    "sha256": pdf["sha256"],
                    "compress_type": pdf["compress_type"],
                    "payload": out,
                }
            )

    return compressed.mapInPandas(
        gen, schema="sha256 string, compress_type string, payload string"
    )


def compression_stats(compressed: DataFrame) -> DataFrame:
    """The -v block's compression factors (print_stats,
    src/encoder.cpp:150-167): totals + mean per-payload ratio."""
    return compressed.agg(
        F.first("compress_type").alias("compress_type"),
        F.count("*").alias("n_payloads"),
        F.sum("payload_chars").alias("total_chars"),
        F.sum("compressed_bytes").alias("total_compressed"),
        F.round(
            F.sum("compressed_bytes") / F.sum("payload_chars"), 6
        ).alias("compress_ratio"),
    )

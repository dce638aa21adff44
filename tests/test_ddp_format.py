"""Faithful .ddp byte-stream export/import: golden byte layout, sharded
round trip, and the decoder's hard-fail contracts."""

from __future__ import annotations

import hashlib
import os
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.sources import ddp_format as ddp


def test_golden_byte_layout():
    """Header and record packing match the reference's struct writes
    exactly (little-endian int32 CHECKBIT + compress_type byte; u8 type +
    u64 len + payload)."""
    h = ddp.pack_header("gzip")
    assert h == struct.pack("<i", 123456) + b"\x00"
    assert ddp.pack_header("bzip2")[4] == 1
    assert ddp.pack_header("none")[4] == 2
    payload = b"hello chunk"
    rec = ddp.pack_record(ddp.TYPE_COMPRESS, payload)
    assert rec[0] == 1
    assert struct.unpack_from("<Q", rec, 1)[0] == len(payload)
    assert rec[9:] == payload
    fp = hashlib.sha1(payload).digest()
    frec = ddp.pack_record(ddp.TYPE_FINGERPRINT, fp)
    assert frec[0] == 0 and len(frec) == 9 + 20


def test_export_import_roundtrip(spark, corpus_df, cfg, tmp_path):
    """Every doc (including empty / 1-char) survives export → import with
    sha256 intact; duplicate chunks become 29-byte fingerprint records."""
    docs = corpus_df.select(
        F.col("file_id").alias("doc_id"), F.col("content").alias("text")
    )
    out = str(tmp_path / "ddp")
    res = ddp.ddp_roundtrip_check(docs, out, cfg).collect()
    assert len(res) == docs.count()
    assert all(r.sha_ok == 1 for r in res)
    # shards exist and every one opens with the magic header
    shards = [f for f in os.listdir(out) if f.endswith(".ddp")]
    assert shards
    for s in shards:
        blob = open(os.path.join(out, s), "rb").read()
        assert struct.unpack_from("<i", blob, 0)[0] == ddp.CHECKBIT
        assert blob[4] == ddp.CT_GZIP


def test_duplicate_chunks_become_fingerprints(spark, cfg, tmp_path):
    """A corpus of identical docs in ONE shard stores each unique chunk
    payload once; repeats are 20-byte SHA-1 fingerprint records."""
    text = "the same exact document body " * 40
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "ddp1")
    ddp.export_ddp(docs, out, cfg, n_shards=1)
    blob = open(os.path.join(out, "shard-00000.ddp"), "rb").read()
    pos, n_comp, n_fp = 5, 0, 0
    while pos < len(blob):
        rtype = blob[pos]
        (length,) = struct.unpack_from("<Q", blob, pos + 1)
        if rtype == ddp.TYPE_COMPRESS:
            n_comp += 1
        else:
            n_fp += 1
            assert length == ddp.SHA1_LEN
        pos += 9 + length
    assert n_fp > 0 and n_comp > 0
    # 6 identical docs: unique payloads appear once, every repeat is a FP
    assert n_fp == 5 * n_comp
    got = {r.doc_id: bytes(r.data) for r in ddp.import_ddp(spark, out).collect()}
    assert got == {i: text.encode() for i in range(6)}


def test_binary_docs_roundtrip(spark, cfg, tmp_path):
    """Arbitrary byte payloads (invalid UTF-8 included) survive the byte
    stream verbatim — the format is bytes-native like the reference's
    mbuffer contract; sha_ok is exact for binary (no ASCII caveat)."""
    import random

    rng = random.Random(31)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randint(1, 700)))
             for _ in range(25)]
    blobs += blobs[:5]
    docs = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id bigint, data binary"
    )
    out = str(tmp_path / "ddp_bin")
    res = ddp.ddp_roundtrip_check(docs, out, cfg, text_col="data").collect()
    assert len(res) == len(blobs)
    assert all(r.sha_ok == 1 for r in res)
    got = {r.doc_id: bytes(r.data) for r in ddp.import_ddp(spark, out).collect()}
    want = {i: b for i, b in enumerate(blobs)}
    # docs below one chunk still appear (single-chunk docs); exact bytes
    assert {k: got.get(k) for k in want if k in got} == {
        k: want[k] for k in got
    }
    assert all(got[k] == want[k] for k in got)


def test_import_rejects_bad_checkbit(spark, cfg, tmp_path):
    docs = spark.createDataFrame([(0, "x" * 100)], "doc_id bigint, text string")
    out = str(tmp_path / "ddp2")
    ddp.export_ddp(docs, out, cfg, n_shards=1)
    path = os.path.join(out, "shard-00000.ddp")
    blob = bytearray(open(path, "rb").read())
    blob[0:4] = struct.pack("<i", 999)
    open(path, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="format error"):
        ddp.import_ddp(spark, out).collect()


def test_import_rejects_unknown_fingerprint(spark, cfg, tmp_path):
    """The decoder's referential-integrity hard fail: a fingerprint whose
    payload never appeared must abort the import."""
    out = str(tmp_path / "ddp3")
    os.makedirs(out)
    stream = ddp.pack_header("gzip") + ddp.pack_record(
        ddp.TYPE_FINGERPRINT, hashlib.sha1(b"never seen").digest()
    )
    open(os.path.join(out, "shard-00000.ddp"), "wb").write(stream)
    spark.createDataFrame(
        [(0, 0, 1)], "shard_id int, doc_id bigint, n_chunks bigint"
    ).write.mode("overwrite").parquet(os.path.join(out, "_doc_index"))
    with pytest.raises(Exception, match="referential integrity"):
        ddp.import_ddp(spark, out).collect()


def test_none_codec_stream_is_raw(spark, cfg, tmp_path):
    """compress_type none: TYPE_COMPRESS payloads are the raw chunk bytes
    (and gzip payloads actually zlib-decompress to them)."""
    text = "raw payload check " * 30
    docs = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    out_n = str(tmp_path / "ddp_none")
    out_g = str(tmp_path / "ddp_gzip")
    ddp.export_ddp(docs, out_n, cfg, n_shards=1, compress_type="none")
    ddp.export_ddp(docs, out_g, cfg, n_shards=1, compress_type="gzip")

    def first_payload(path):
        blob = open(path, "rb").read()
        (length,) = struct.unpack_from("<Q", blob, 6)
        return blob[14 : 14 + length]

    raw = first_payload(os.path.join(out_n, "shard-00000.ddp"))
    gz = first_payload(os.path.join(out_g, "shard-00000.ddp"))
    assert raw == zlib.decompress(gz)
    assert raw.decode() == text[: len(raw)]

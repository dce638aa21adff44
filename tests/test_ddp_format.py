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


def test_lzss_codec_roundtrip(spark, cfg, tmp_path):
    """compress_type byte 3 = COMPRESS_LZSS (dedupdef.h:217), the
    reference's benchmark default: payloads are the literal LZSS bit
    stream and the full export → import round trip holds."""
    from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import lzss_decode

    text = "lzss chunk payload body " * 40
    docs = spark.createDataFrame(
        [(i, text + str(i % 2)) for i in range(4)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "ddp_lzss")
    res = ddp.ddp_roundtrip_check(docs, out, cfg, compress_type="lzss").collect()
    assert len(res) == 4 and all(r.sha_ok == 1 for r in res)
    blob = open(os.path.join(out, "shard-00000.ddp"), "rb").read()
    assert blob[4] == ddp.CT_LZSS == 3
    (length,) = struct.unpack_from("<Q", blob, 6)
    first = lzss_decode(blob[14 : 14 + length])
    assert first.decode() == (text + "0")[: len(first)]


def test_import_reference_stream_without_sidecar(spark, tmp_path):
    """A stream produced by the reference itself has no _doc_index: each
    shard file must decode to ONE concatenated payload (what dedup -u
    writes, decoder.cpp:274-276), keyed by shard id."""
    out = str(tmp_path / "ddp_ref")
    os.makedirs(out)
    c1, c2 = b"first chunk bytes", b"second chunk!"
    stream = (
        ddp.pack_header("gzip")
        + ddp.pack_record(ddp.TYPE_COMPRESS, zlib.compress(c1))
        + ddp.pack_record(ddp.TYPE_COMPRESS, zlib.compress(c2))
        + ddp.pack_record(ddp.TYPE_FINGERPRINT, hashlib.sha1(c1).digest())
    )
    open(os.path.join(out, "shard-00000.ddp"), "wb").write(stream)
    got = ddp.import_ddp(spark, out).collect()
    assert len(got) == 1
    assert got[0].doc_id == 0
    assert bytes(got[0].data) == c1 + c2 + c1


def test_import_single_reference_file(spark, tmp_path):
    """import_ddp(path-to-file): a lone reference-produced ``.ddp`` with an
    arbitrary name (e.g. silesia.tar.ddp) imports as one doc — at the
    reference's benchmark-default lzss codec."""
    from dedup_gpu_stream_parallelism_spark.functions.lzss_codec import lzss_encode

    payload = b"reference single-file stream " * 30
    path = str(tmp_path / "silesia.tar.ddp")
    stream = (
        ddp.pack_header("lzss")
        + ddp.pack_record(ddp.TYPE_COMPRESS, lzss_encode(payload))
        + ddp.pack_record(ddp.TYPE_FINGERPRINT, hashlib.sha1(payload).digest())
    )
    open(path, "wb").write(stream)
    got = ddp.import_ddp(spark, path).collect()
    assert len(got) == 1 and got[0].doc_id == 0
    assert bytes(got[0].data) == payload + payload


def test_import_rejects_truncated_record(spark, tmp_path):
    """A record whose payload is shorter than its declared length must
    hard-fail (the reference's xread aborts on short reads), not decode
    to silently short bytes."""
    out = str(tmp_path / "ddp_trunc")
    os.makedirs(out)
    full = ddp.pack_header("none") + ddp.pack_record(ddp.TYPE_COMPRESS, b"0123456789")
    open(os.path.join(out, "shard-00000.ddp"), "wb").write(full[:-4])
    with pytest.raises(Exception, match="truncated"):
        ddp.import_ddp(spark, out).collect()


def test_import_rejects_unknown_compress_byte(spark, tmp_path):
    """An unknown compress_type byte gets a diagnostic error, not a bare
    KeyError."""
    out = str(tmp_path / "ddp_ct")
    os.makedirs(out)
    stream = bytearray(ddp.pack_header("none"))
    stream[4] = 9
    open(os.path.join(out, "shard-00000.ddp"), "wb").write(bytes(stream))
    with pytest.raises(Exception, match="unsupported .ddp compress_type byte 9"):
        ddp.import_ddp(spark, out).collect()


def test_import_rejects_indexed_shard_with_missing_file(spark, cfg, tmp_path):
    """_doc_index rows whose shard file vanished must raise — docs can
    never silently disappear from an import."""
    docs = spark.createDataFrame(
        [(i, f"body of document {i} " * 30) for i in range(8)],
        "doc_id bigint, text string",
    )
    out = str(tmp_path / "ddp_missing")
    ddp.export_ddp(docs, out, cfg, n_shards=2)
    os.remove(os.path.join(out, "shard-00001.ddp"))
    with pytest.raises(Exception, match="missing"):
        ddp.import_ddp(spark, out).collect()


def test_import_rejects_unindexed_records(spark, cfg, tmp_path):
    """A shard file carrying records the sidecar doesn't know about must
    raise instead of being decoded and silently dropped."""
    docs = spark.createDataFrame(
        [(0, "known doc " * 30)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "ddp_unindexed")
    ddp.export_ddp(docs, out, cfg, n_shards=1)
    rogue = ddp.pack_header("gzip") + ddp.pack_record(
        ddp.TYPE_COMPRESS, zlib.compress(b"rogue chunk")
    )
    open(os.path.join(out, "shard-00007.ddp"), "wb").write(rogue)
    with pytest.raises(Exception, match="no _doc_index rows"):
        ddp.import_ddp(spark, out).collect()


def test_multi_batch_export_is_byte_identical(spark, cfg, tmp_path):
    """Streaming the shard file record-by-record across many small Arrow
    batches produces byte-identical output to a one-batch export — the
    exporter holds no shard-sized buffer."""
    docs = spark.createDataFrame(
        [(i, f"document {i} payload " * 25 + ("shared tail " * 20))
         for i in range(40)],
        "doc_id bigint, text string",
    )
    out_a = str(tmp_path / "ddp_batch_a")
    out_b = str(tmp_path / "ddp_batch_b")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "3")  # force many tiny Arrow batches
        ddp.export_ddp(docs, out_a, cfg, n_shards=1)
    finally:
        spark.conf.set(key, old if old is not None else "10000")
    ddp.export_ddp(docs, out_b, cfg, n_shards=1)
    a = open(os.path.join(out_a, "shard-00000.ddp"), "rb").read()
    b = open(os.path.join(out_b, "shard-00000.ddp"), "rb").read()
    assert a == b and len(a) > 5


def test_reexport_removes_stale_wider_shards(spark, cfg, tmp_path):
    """Re-exporting into the same dir with fewer shards removes the old
    higher-numbered shard files, so import can't resurrect stale chunks."""
    docs = spark.createDataFrame(
        [(i, f"doc {i} " * 40) for i in range(10)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "ddp_stale")
    ddp.export_ddp(docs, out, cfg, n_shards=4)
    assert os.path.exists(os.path.join(out, "shard-00003.ddp"))
    ddp.export_ddp(docs, out, cfg, n_shards=1)
    left = sorted(f for f in os.listdir(out) if f.endswith(".ddp"))
    assert left == ["shard-00000.ddp"]
    got = ddp.import_ddp(spark, out).collect()
    assert len(got) == 10 and all(r.sha_ok == 1 for r in ddp.ddp_roundtrip_check(
        docs, str(tmp_path / "ddp_stale2"), cfg
    ).collect())


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


def test_arrow_fs_sink_matches_posix(spark, cfg, tmp_path):
    """The pyarrow.fs-backed sink (the object-store deployment path)
    produces byte-identical shards to the POSIX default, and both the
    export and the import layout probes work through it."""
    from pyarrow import fs as pafs

    from dedup_gpu_stream_parallelism_spark.sources.byte_sink import (
        ArrowFsByteSink,
        PosixByteSink,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body " + "shared tail " * 30) for i in range(8)],
        "doc_id bigint, text string",
    )
    out_p = str(tmp_path / "ddp_posix")
    out_a = str(tmp_path / "ddp_arrow")
    ddp.export_ddp(docs, out_p, cfg, n_shards=2, sink=PosixByteSink())
    sink = ArrowFsByteSink(pafs.LocalFileSystem())
    ddp.export_ddp(docs, out_a, cfg, n_shards=2, sink=sink)
    for name in ("shard-00000.ddp", "shard-00001.ddp"):
        a = open(os.path.join(out_a, name), "rb").read()
        p = open(os.path.join(out_p, name), "rb").read()
        assert a == p and a[:4] == struct.pack("<i", ddp.CHECKBIT)
    # no staging tmp files left behind by publish()
    assert all(n.endswith(".ddp") or n == "_doc_index"
               for n in os.listdir(out_a))
    got = {
        r.doc_id: bytes(r.data)
        for r in ddp.import_ddp(spark, out_a, sink=sink).collect()
    }
    want = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert got == want


def test_export_rejects_shard_over_binaryfile_limit(spark, cfg, tmp_path, monkeypatch):
    """A shard that would cross the binaryFile 2 GiB content limit fails
    the export with a clear message instead of writing a stream the
    import side would reject (doc-size-skew guard)."""
    monkeypatch.setattr(ddp, "_SHARD_HARD_LIMIT", 64)
    docs = spark.createDataFrame(
        [(0, "incompressible-ish unique body " * 40)],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception, match="2 GiB content limit"):
        # compress_type none: the record is the raw 1240-char chunk, far
        # past the patched 64-byte limit regardless of chunking
        ddp.export_ddp(
            docs, str(tmp_path / "ddp_big"), cfg, n_shards=1,
            compress_type="none",
        )

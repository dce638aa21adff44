"""ArrowFsByteSink through a POSIX-hostile filesystem (VERDICT_r5 #4).

The 100 TB export path's only prior test ran over ``LocalFileSystem`` —
POSIX underneath, where ``move`` is an atomic rename.  This battery drives
the SAME ``ArrowFsByteSink`` code through a pyarrow ``PyFileSystem`` whose
handler simulates object-store semantics: **no rename exists** (``move``
is implemented as copy + delete, and the handler counts every call so the
test can prove no atomic rename happened), directories are virtual
(``create_dir`` is a no-op beyond the backing root), and destination
overwrite is last-writer-wins.  The full ``.ddp`` export → import round
trip must survive, and racing publishes must resolve exactly as the
module docstring promises.
"""

from __future__ import annotations

import os

import pytest
from pyarrow import fs as pafs

from dedup_gpu_stream_parallelism_spark.sources.byte_sink import ArrowFsByteSink


class _S3LikeHandler(pafs.FileSystemHandler):
    """LocalFileSystem-backed handler with object-store verb semantics."""

    def __init__(self, root: str):
        self._local = pafs.LocalFileSystem()
        self._root = root
        self.calls: dict[str, int] = {"move": 0, "copy_file": 0, "delete_file": 0}

    # -- identity ---------------------------------------------------------
    def get_type_name(self):
        return "s3like"

    def __eq__(self, other):
        return isinstance(other, _S3LikeHandler) and other._root == self._root

    def __ne__(self, other):
        return not self.__eq__(other)

    def _full(self, path: str) -> str:
        return os.path.join(self._root, path.lstrip("/"))

    # -- info -------------------------------------------------------------
    def get_file_info(self, paths):
        return self._local.get_file_info([self._full(p) for p in paths])

    def get_file_info_selector(self, selector):
        sel = pafs.FileSelector(
            self._full(selector.base_dir),
            allow_not_found=selector.allow_not_found,
            recursive=selector.recursive,
        )
        return self._local.get_file_info(sel)

    # -- namespace --------------------------------------------------------
    def create_dir(self, path, recursive):
        # object stores have no directories; the backing local store still
        # needs one so the delegate can hold the bytes
        os.makedirs(self._full(path), exist_ok=True)

    def delete_dir(self, path):
        self._local.delete_dir(self._full(path))

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._local.delete_dir_contents(self._full(path), missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError

    def delete_file(self, path):
        self.calls["delete_file"] += 1
        self._local.delete_file(self._full(path))

    # -- the hostile part: NO RENAME --------------------------------------
    def move(self, src, dest):
        """S3 semantics: copy then delete — never an atomic rename.  The
        destination PUT is all-or-nothing, overwrite is last-writer-wins."""
        self.calls["move"] += 1
        # cross-process evidence: executor-side sink copies increment their
        # OWN handler instance, so also journal to the shared backing root
        with open(os.path.join(self._root, ".move_journal"), "a") as j:
            j.write(f"{os.getpid()} {src} -> {dest}\n")
        self.copy_file(src, dest)
        self.delete_file(src)

    def copy_file(self, src, dest):
        self.calls["copy_file"] += 1
        self._local.copy_file(self._full(src), self._full(dest))

    # -- streams ----------------------------------------------------------
    def open_input_stream(self, path):
        return self._local.open_input_stream(self._full(path))

    def open_input_file(self, path):
        return self._local.open_input_file(self._full(path))

    def open_output_stream(self, path, metadata):
        return self._local.open_output_stream(self._full(path))

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("object stores cannot append")

    def normalize_path(self, path):
        return path


@pytest.fixture()
def hostile(tmp_path):
    handler = _S3LikeHandler(str(tmp_path / "bucket"))
    os.makedirs(str(tmp_path / "bucket"), exist_ok=True)
    return handler, ArrowFsByteSink(pafs.PyFileSystem(handler))


def test_publish_has_no_rename_and_is_last_writer_wins(hostile):
    handler, sink = hostile
    sink.makedirs("exports")
    for tmp_name, payload in (("a.tmp-0", b"first"), ("a.tmp-1", b"second")):
        with sink.open_write(f"exports/{tmp_name}") as f:
            f.write(payload)
    sink.publish("exports/a.tmp-0", "exports/a.ddp")
    sink.publish("exports/a.tmp-1", "exports/a.ddp")  # racing attempt lands last
    # last-writer-wins, exactly as the byte_sink module docstring promises
    full = os.path.join(handler._root, "exports/a.ddp")
    assert open(full, "rb").read() == b"second"
    # and the path was copy+delete, never a rename
    assert handler.calls["move"] == 2
    assert handler.calls["copy_file"] == 2
    assert handler.calls["delete_file"] >= 2
    assert not sink.exists("exports/a.tmp-0") and not sink.exists("exports/a.tmp-1")
    assert sink.is_file("exports/a.ddp")
    assert "a.ddp" in sink.list_names("exports")


def test_ddp_roundtrip_through_the_hostile_sink(spark, tmp_path, hostile):
    """Full export → import with every byte-stream verb going through the
    no-rename filesystem; sha_ok must hold for every doc.  The bulk Spark
    binaryFile read uses the backing local paths (the handler stores bytes
    1:1 under its root), so only the sink verbs are under test — which is
    exactly the surface ArrowFsByteSink owns."""
    from pyspark.sql import functions as F

    from dedup_gpu_stream_parallelism_spark.config import DedupConfig
    from dedup_gpu_stream_parallelism_spark.sources import ddp_format

    handler, sink = hostile
    # the sink ships inside the export UDF closure; executor workers must
    # be able to import this module to unpickle the handler classes
    spark.sparkContext.addPyFile(os.path.abspath(__file__))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    out_rel = "exports/ddp"
    # export writes through the hostile verbs; the _doc_index parquet goes
    # through Spark to the BACKING path (parquet commit is Spark's own
    # committer — the byte sink only owns the .ddp streams)
    backing = os.path.join(handler._root, out_rel)
    ddp_format.export_ddp(
        docs, backing, DedupConfig(), compress_type="gzip",
        sink=_RelocatingSink(sink, handler._root),
    )
    # the publishes ran in EXECUTOR processes — their handler copies did the
    # copy+delete moves; the shared journal is the cross-process proof
    journal = os.path.join(handler._root, ".move_journal")
    assert os.path.exists(journal) and len(open(journal).readlines()) > 0
    # every staged *.tmp-<attempt> was cleaned up after publish
    assert not any(
        ".tmp-" in n for n in os.listdir(backing)
    ), os.listdir(backing)
    decoded = ddp_format.import_ddp(spark, backing)
    orig = docs.select("doc_id", F.sha2("text", 256).alias("sha256"))
    joined = orig.join(decoded, "doc_id").select(
        (F.sha2(F.col("data"), 256) == F.col("sha256")).cast("int").alias("ok")
    )
    rows = joined.collect()
    assert rows and all(r["ok"] == 1 for r in rows)


class _RelocatingSink(ArrowFsByteSink):
    """Adapter: export_ddp passes ABSOLUTE backing paths (Spark needs them
    for the binaryFile read); the hostile handler keys on bucket-relative
    paths — strip the root before delegating so every verb still crosses
    the no-rename filesystem."""

    def __init__(self, inner: ArrowFsByteSink, root: str):
        self._inner = inner
        self._rootp = root

    def _rel(self, path: str) -> str:
        return os.path.relpath(path, self._rootp)

    def makedirs(self, path):
        self._inner.makedirs(self._rel(path))

    def open_write(self, path):
        return self._inner.open_write(self._rel(path))

    def publish(self, tmp, final):
        self._inner.publish(self._rel(tmp), self._rel(final))

    def delete(self, path):
        self._inner.delete(self._rel(path))

    def exists(self, path):
        return self._inner.exists(self._rel(path))

    def is_file(self, path):
        return self._inner.is_file(self._rel(path))

    def list_names(self, path):
        return self._inner.list_names(self._rel(path))

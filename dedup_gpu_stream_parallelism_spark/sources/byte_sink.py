"""Pluggable byte sinks for ``.ddp`` shard publication.

``export_ddp`` writes each shard as one sequential byte stream from inside
an executor task — a write pattern Spark's columnar writers don't cover, so
the stream writer talks to a minimal small filesystem contract instead
of POSIX calls directly:

* ``PosixByteSink`` (default) — the historical contract: local or shared
  POSIX storage (NFS/Lustre/local dir), task attempts stage to a private
  ``*.tmp-<attempt>`` published by an atomic ``os.replace``.
* ``ArrowFsByteSink`` — the same verbs through ``pyarrow.fs``, so
  ``s3://bucket/dir`` / ``hdfs://nn/dir`` / ``file:///dir`` work wherever
  pyarrow has a driver (the 100 TB deployment path).  Publication uses
  ``FileSystem.move``: atomic on HDFS and local; on S3 it is copy+delete —
  every PUT has all-or-nothing visibility, so readers never observe a
  partial shard, but two racing task attempts are last-writer-wins rather
  than first (Spark retries the whole task on failure either way, and the
  ``_doc_index`` parquet commit remains the transaction boundary readers
  key on).

Sinks must be picklable (they ship inside the ``mapInPandas`` closure);
both implementations are stateless or carry only a picklable pyarrow
``FileSystem``.
"""

from __future__ import annotations

import os
from typing import BinaryIO


class ByteSink:
    """The filesystem contract the ``.ddp`` record writer needs."""

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def open_write(self, path: str) -> BinaryIO:
        """Context manager yielding a binary ``.write()``-able stream."""
        raise NotImplementedError

    def publish(self, tmp: str, final: str) -> None:
        """Move a staged file onto its final name (see module docstring
        for per-backend atomicity)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_file(self, path: str) -> bool:
        raise NotImplementedError

    def list_names(self, path: str) -> list[str]:
        """Base names of the entries under a directory (empty if absent)."""
        raise NotImplementedError


class PosixByteSink(ByteSink):
    """Local / shared-POSIX storage via plain ``os`` calls."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def open_write(self, path: str) -> BinaryIO:
        return open(path, "wb")

    def publish(self, tmp: str, final: str) -> None:
        os.replace(tmp, final)

    def delete(self, path: str) -> None:
        os.remove(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_file(self, path: str) -> bool:
        return os.path.isfile(path)

    def list_names(self, path: str) -> list[str]:
        return os.listdir(path) if os.path.isdir(path) else []


class ArrowFsByteSink(ByteSink):
    """Any ``pyarrow.fs`` filesystem, resolved per path URI.

    With no constructor argument every path is resolved through
    ``FileSystem.from_uri`` (so ``s3://...`` paths pick the S3 driver);
    pass an explicit ``filesystem`` to pin one — e.g.
    ``ArrowFsByteSink(pyarrow.fs.LocalFileSystem())`` with plain paths,
    which is how the test suite exercises this class without object-store
    credentials."""

    def __init__(self, filesystem=None) -> None:
        self._fs = filesystem

    def _resolve(self, path: str):
        if self._fs is not None:
            return self._fs, path
        from pyarrow import fs as pafs

        return pafs.FileSystem.from_uri(path)

    def makedirs(self, path: str) -> None:
        fs, p = self._resolve(path)
        fs.create_dir(p, recursive=True)

    def open_write(self, path: str) -> BinaryIO:
        fs, p = self._resolve(path)
        return fs.open_output_stream(p)

    def publish(self, tmp: str, final: str) -> None:
        fs, t = self._resolve(tmp)
        _, f = self._resolve(final)
        fs.move(t, f)

    def delete(self, path: str) -> None:
        fs, p = self._resolve(path)
        fs.delete_file(p)

    def exists(self, path: str) -> bool:
        from pyarrow import fs as pafs

        fs, p = self._resolve(path)
        return fs.get_file_info(p).type != pafs.FileType.NotFound

    def is_file(self, path: str) -> bool:
        from pyarrow import fs as pafs

        fs, p = self._resolve(path)
        return fs.get_file_info(p).type == pafs.FileType.File

    def list_names(self, path: str) -> list[str]:
        from pyarrow import fs as pafs

        fs, p = self._resolve(path)
        sel = pafs.FileSelector(p, allow_not_found=True)
        return [info.base_name for info in fs.get_file_info(sel)]

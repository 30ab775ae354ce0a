"""Metadata IO for the persistence layer — Hadoop FileSystem when the
store path carries a URI scheme, plain POSIX for schemeless local paths
(the degenerate case).

Why this exists: the reference's sink was a NETWORK database (libpq
connection, ``/root/reference/src/Database.cpp:5`` — nothing about its
persistence assumed a local disk), so this engine's stores must not
silently require one either.  ``ManifestTable`` and ``AnnIndex`` write
their DATA through Spark (cluster-capable on any
``hdfs://``/``s3a://`` path), but their manifest/meta commits are
driver-side file operations.  Routed
through ``os``/``shutil``/``pyarrow`` they silently require the store
directory to be driver-local — a hard blocker on a real cluster.  This
module expresses the same nine primitives over
``org.apache.hadoop.fs.FileSystem`` (reached via the live JVM, no new
dependency), so the store URI decides the transport:

* no scheme (``/tmp/x``)  → :class:`LocalIO` — byte-identical to the
  old behavior, zero py4j overhead in streaming hot loops;
* ``file://`` and any configured Hadoop scheme (``hdfs://``, mounted
  object stores) → :class:`HadoopIO`;
* an unconfigured scheme (e.g. ``s3a://`` without the AWS connector on
  the classpath) → a clear :class:`UnsupportedFsError` at construction
  time, not a confusing failure mid-commit.

Atomicity: the commit points (``rename_overwrite``) go through
``FileContext.rename(..., Options.Rename.OVERWRITE)``, which is atomic
on local filesystems and HDFS.  **S3 caveat**: object stores implement
rename as copy+delete — non-atomic.  On S3, run the manifest/meta
directory on HDFS/EFS or front it with a coordination layer (the same
constraint Delta Lake documents for its transaction log; S3A's
committers solve task output, not metadata swaps).

Parquet footers: row counts come from the file FOOTER (driver-side
metadata, never a Spark scan).  The Hadoop path reads only the trailing
``footer_len + 8`` bytes via a seek and rebuilds a minimal in-memory
parquet file (magic + footer + trailer) for ``pyarrow.parquet`` to
parse — num_rows lives in the thrift footer, so data pages are never
touched.
"""

from __future__ import annotations

import os
import shutil
import struct
from urllib.parse import urlparse


class UnsupportedFsError(RuntimeError):
    """The path's URI scheme has no usable Hadoop FileSystem."""


def fs_for(spark, path: str) -> "LocalIO | HadoopIO":
    """The IO backend for ``path``: POSIX for schemeless paths, Hadoop
    for URIs.  Raises :class:`UnsupportedFsError` (with the underlying
    JVM message) when the scheme has no FileSystem implementation or
    configuration — failing at store construction, where the operator
    can act on it."""
    scheme = urlparse(path).scheme
    # Windows drive letters don't exist in this engine's deployments;
    # one-letter schemes are not a concern.  An empty scheme is the
    # plain-local degenerate case.
    if scheme == "":
        return LocalIO()
    return HadoopIO(spark, path)


class LocalIO:
    """POSIX metadata IO — the schemeless-path degenerate case."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def is_file(self, p: str) -> bool:
        return os.path.isfile(p)

    def is_dir(self, p: str) -> bool:
        return os.path.isdir(p)

    def list_names(self, d: str) -> list[str]:
        try:
            return sorted(os.listdir(d))
        except FileNotFoundError:
            return []

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def delete(self, p: str, recursive: bool = False) -> None:
        # match HadoopIO.delete's contract exactly: missing-ok, a
        # recursive delete also removes a REGULAR file at the path, and
        # real IO/permission errors RAISE — rmtree(ignore_errors=True)
        # would silently leave data behind (a GC sweep that 'succeeds'
        # while unreferenced files accumulate), backend-dependent
        # behavior for the same nine-primitive contract
        try:
            if recursive and os.path.isdir(p):
                shutil.rmtree(p)
            else:
                os.remove(p)
        except FileNotFoundError:
            pass

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rename_overwrite(self, src: str, dst: str) -> None:
        os.replace(src, dst)  # atomic on POSIX

    def read_bytes(self, p: str) -> bytes:
        with open(p, "rb") as f:
            return f.read()

    def write_bytes(self, p: str, data: bytes) -> None:
        with open(p, "wb") as f:
            f.write(data)

    def parquet_num_rows(self, p: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(p).metadata.num_rows

    def walk_parquet(self, d: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    out.append(os.path.join(root, f))
        return sorted(out)


class HadoopIO:
    """Hadoop FileSystem metadata IO, reached through the live JVM.

    One instance per store (the FileSystem handle is resolved once from
    the store URI and cached — Hadoop caches them JVM-wide anyway).
    All paths passed in must be full URIs under the same scheme.
    """

    def __init__(self, spark, base_path: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._P = self._jvm.org.apache.hadoop.fs.Path
        try:
            self._fs = self._P(base_path).getFileSystem(self._conf)
        except Exception as e:  # ClassNotFound / UnsupportedFileSystem
            raise UnsupportedFsError(
                f"no usable Hadoop FileSystem for {base_path!r}: "
                f"{getattr(e, 'java_exception', e)}"
            ) from e
        self._fc = None  # FileContext, built lazily (rename_overwrite)

    # -- predicates / listing ------------------------------------------------

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._P(p)))

    def is_file(self, p: str) -> bool:
        jp = self._P(p)
        return bool(self._fs.exists(jp)) and bool(self._fs.isFile(jp))

    def is_dir(self, p: str) -> bool:
        jp = self._P(p)
        return bool(self._fs.exists(jp)) and bool(
            self._fs.getFileStatus(jp).isDirectory()
        )

    def list_names(self, d: str) -> list[str]:
        jp = self._P(d)
        if not self._fs.exists(jp):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(jp)
        )

    # -- mutation --------------------------------------------------------

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._P(p))

    def delete(self, p: str, recursive: bool = False) -> None:
        # Hadoop delete returns False for a missing path — same
        # missing-ok contract as the POSIX side
        self._fs.delete(self._P(p), recursive)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._P(src), self._P(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def rename_overwrite(self, src: str, dst: str) -> None:
        """The commit point: atomic replace on local FS and HDFS (see
        module docstring for the S3 caveat)."""
        if self._fc is None:
            self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._P(dst).toUri(), self._conf
            )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gw.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        self._fc.rename(self._P(src), self._P(dst), opts)

    # -- bytes -------------------------------------------------------------

    def read_bytes(self, p: str) -> bytes:
        stream = self._fs.open(self._P(p))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def _read_tail(self, p: str, n: int) -> bytes:
        length = int(self._fs.getFileStatus(self._P(p)).getLen())
        stream = self._fs.open(self._P(p))
        try:
            stream.seek(max(0, length - n))
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_bytes(self, p: str, data: bytes) -> None:
        out = self._fs.create(self._P(p), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    # -- parquet footers -----------------------------------------------------

    def parquet_num_rows(self, p: str) -> int:
        """num_rows from the footer alone: read the 8-byte trailer for
        the footer length, seek-read the footer, and hand pyarrow a
        reconstructed minimal file (PAR1 + footer + trailer)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        trailer = self._read_tail(p, 8)
        if len(trailer) < 8 or trailer[4:] != b"PAR1":
            raise ValueError(f"not a parquet file: {p}")
        flen = struct.unpack("<I", trailer[:4])[0]
        tail = self._read_tail(p, flen + 8)
        fake = b"PAR1" + tail[:flen] + trailer
        return pq.read_metadata(pa.BufferReader(fake)).num_rows

    def walk_parquet(self, d: str) -> list[str]:
        jp = self._P(d)
        if not self._fs.exists(jp):
            return []
        out = []
        it = self._fs.listFiles(jp, True)
        while it.hasNext():
            s = it.next().getPath().toString()
            if s.endswith(".parquet"):
                out.append(s)
        return sorted(out)

"""Storage-listing seam: every maintenance path that enumerates a table
prefix (vacuum, fsck, parquet-layout adoption, task-output harvest)
goes through ONE pluggable lister instead of calling ``os.walk``
directly.

Why a seam (the 100 TB story)
-----------------------------
All ordinary reads and writes in this engine are MANIFEST-driven: the
committed version files name every live data file, so scans, upserts,
compaction and time travel never list storage at all. Listing is only
needed where the manifest is by definition silent — ORPHANS: task
attempts that died before commit, writers that lost a CAS, sidecars
whose commits expired. That is exactly the shape of Delta/Iceberg
VACUUM: diff a full prefix listing against the manifest's referenced
set, and age-gate what the manifest does not know.

On a POSIX filesystem the default :class:`FileSystemLister` walks the
directory tree. On an object store the same contract is a paginated
``ListObjectsV2`` over the table prefix (size and mtime come with each
page for free — no per-key HEAD), ``remove`` is ``DeleteObject``, and
there is no directory tree to recurse. Registering such a lister is
the ONLY storage-API change vacuum/fsck need; the manifest-diff logic
above the seam is storage-agnostic. The maintenance cadence bounds the
cost: one LIST per table per vacuum run, never per query.

Registration mirrors the lock-provider seam (locking.py):
``set_lister(obj)`` installs process-wide;
``STARLAKE_LISTER="pkg.module:ClassName?kw=v"`` installs at import.
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass
from typing import Any, Iterator


@dataclass
class FileEntry:
    path: str    # absolute path/key
    size: int
    mtime: float


class FileSystemLister:
    """Default local/POSIX implementation (HDFS-style mounts included)."""

    def list_files(self, root: str) -> Iterator[FileEntry]:
        """Every file under ``root``, recursively. Missing root yields
        nothing; entries racing a concurrent delete are skipped."""
        for r, _dirs, names in os.walk(root):
            for n in names:
                p = os.path.join(r, n)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                yield FileEntry(p, st.st_size, st.st_mtime)

    def remove(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class ObjectStoreLister:
    """Paginated object-store base: subclasses implement ONE page call
    shaped exactly like ``ListObjectsV2`` (prefix in, up to
    ``page_size`` entries + an opaque continuation token out) plus
    ``_delete``/``_head``; :meth:`list_files` drives the
    continuation-token loop. There is no directory tree on an object
    store — the 'recursive walk' is a flat prefix listing, and size +
    mtime ride along with every page (no per-key HEAD calls).

    The maintenance cadence bounds the cost: vacuum/fsck issue one
    paginated LIST per table prefix per run, never per query — at a
    million objects and 1000-key pages that is ~1000 sequential page
    calls, which is the floor any object-store vacuum pays."""

    page_size = 1000

    # -- subclass surface (ListObjectsV2 contract) --
    def _list_page(self, prefix: str,
                   token: str | None) -> tuple[list[FileEntry], str | None]:
        """One page of keys under ``prefix``. Returns (entries,
        next_continuation_token-or-None)."""
        raise NotImplementedError

    def _delete(self, path: str) -> None:
        raise NotImplementedError

    def _head(self, path: str) -> bool:
        raise NotImplementedError

    # -- seam surface --
    def list_files(self, root: str) -> Iterator[FileEntry]:
        prefix = root.rstrip("/") + "/"
        token: str | None = None
        while True:
            entries, token = self._list_page(prefix, token)
            yield from entries
            if token is None:
                return

    def remove(self, path: str) -> None:
        self._delete(path)

    def exists(self, path: str) -> bool:
        return self._head(path)


class S3Lister(ObjectStoreLister):
    """ListObjectsV2 lister for s3:// table roots (optional boto3 dep).

    Roots/paths are ``s3://bucket/key`` URIs — the same strings a
    Spark deployment reading via s3a:// would configure as table
    paths. ``remove`` is DeleteObject, ``exists`` is HeadObject.
    Register with ``set_lister(S3Lister())`` or
    ``STARLAKE_LISTER=starlake_spark.listing:S3Lister``."""

    def __init__(self, page_size: int = 1000, client: Any | None = None):
        if client is None:
            try:
                import boto3  # optional, gated
            except ImportError as e:  # pragma: no cover - env without boto3
                raise ImportError(
                    "S3Lister requires boto3 (pip install boto3), or pass "
                    "client=<botocore S3 client>") from e
            client = boto3.client("s3")
        self._s3 = client
        self.page_size = int(page_size)

    @staticmethod
    def _split(uri: str) -> tuple[str, str]:
        if not uri.startswith("s3://"):
            raise ValueError(f"S3Lister expects s3://bucket/key, got {uri}")
        rest = uri[len("s3://"):]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def _list_page(self, prefix, token):
        bucket, key = self._split(prefix)
        kw = {"Bucket": bucket, "Prefix": key, "MaxKeys": self.page_size}
        if token is not None:
            kw["ContinuationToken"] = token
        resp = self._s3.list_objects_v2(**kw)
        entries = [FileEntry(f"s3://{bucket}/{c['Key']}", c["Size"],
                             c["LastModified"].timestamp()
                             if hasattr(c["LastModified"], "timestamp")
                             else float(c["LastModified"]))
                   for c in resp.get("Contents", [])]
        return entries, (resp.get("NextContinuationToken")
                         if resp.get("IsTruncated") else None)

    def _delete(self, path):
        bucket, key = self._split(path)
        self._s3.delete_object(Bucket=bucket, Key=key)

    @staticmethod
    def _is_not_found(exc: Exception) -> bool:
        """True only for a definitive 404/NoSuchKey ClientError shape.

        Duck-typed on ``exc.response`` (botocore ClientError) so the
        check works with injected stub clients and without boto3
        installed. Anything else — throttling/SlowDown, 5xx, expired
        credentials, network errors — is NOT 'missing'."""
        resp = getattr(exc, "response", None)
        if not isinstance(resp, dict):
            return False
        err = resp.get("Error") or {}
        code = str(err.get("Code", ""))
        status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
        return code in ("404", "NoSuchKey", "NotFound") or status == 404

    def _head(self, path):
        bucket, key = self._split(path)
        try:
            self._s3.head_object(Bucket=bucket, Key=key)
            return True
        except Exception as e:
            # Only a definitive not-found may report False: fsck(repair=True)
            # drops manifest references for 'missing' files, so treating a
            # transient outage as absence would delete live data. Everything
            # non-404 re-raises and the caller fails loudly.
            if self._is_not_found(e):
                return False
            raise


_default = FileSystemLister()
_lister: Any | None = None


def set_lister(lister: Any | None) -> None:
    """Install a process-wide lister (None → filesystem default)."""
    global _lister
    _lister = lister


def get_lister():
    return _lister if _lister is not None else _default


def _from_env() -> None:
    spec = os.environ.get("STARLAKE_LISTER", "")
    if not spec:
        return
    spec, _, query = spec.partition("?")
    mod_name, _, cls_name = spec.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    kwargs: dict[str, Any] = {}
    if query:
        for pair in query.split("&"):
            k, _, v = pair.partition("=")
            for cast in (int, float, str):
                try:
                    kwargs[k] = cast(v)
                    break
                except ValueError:
                    continue
    set_lister(cls(**kwargs))


_from_env()

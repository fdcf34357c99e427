"""Round-8 verdict task #4: the storage-listing seam.

All maintenance-path enumeration (vacuum sweep, fsck orphan report,
convert_to_star adoption, writer harvest) routes through
starlake_spark.listing.get_lister(). A registered custom lister must
see every one of those calls — that's the object-store port surface —
and the default FileSystemLister must behave exactly as the old
os.walk code did.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.listing import (FileEntry, FileSystemLister, get_lister,
                                    set_lister)


class SpyLister(FileSystemLister):
    """Counts every seam call while delegating to the real filesystem."""

    def __init__(self):
        self.listed: list[str] = []
        self.removed: list[str] = []

    def list_files(self, root):
        self.listed.append(root)
        return super().list_files(root)

    def remove(self, path):
        self.removed.append(path)
        super().remove(path)


@pytest.fixture()
def spy():
    s = SpyLister()
    set_lister(s)
    yield s
    set_lister(None)


def _mk(spark, path, sf_dir):
    d = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select(F.col("o_orderkey").alias("k"),
                 F.col("o_orderstatus").alias("st")).limit(500))
    return create_table(spark, d, path)


def test_vacuum_routes_through_lister(spark, sf_dir, tmp_path, spy):
    from starlake_spark.operators.dml import cleanup

    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    # plant an orphan old enough to sweep
    orphan = os.path.join(t.store.table_path, "data", "deadbeef",
                          "part-orphan.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"x")
    os.utime(orphan, (time.time() - 999, time.time() - 999))

    removed = cleanup(t.store, retention_s=0)
    rel = os.path.relpath(orphan, t.store.table_path)
    assert rel in removed and not os.path.exists(orphan)
    assert orphan in spy.removed  # the DELETE went through the seam
    roots = [os.path.relpath(r, t.store.table_path) for r in spy.listed]
    assert "data" in roots  # and so did the LIST
    # live files untouched
    assert t.to_df().count() == 500


def test_fsck_routes_through_lister(spark, sf_dir, tmp_path, spy):
    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    orphan = os.path.join(t.store.table_path, "data", "deadbeef",
                          "part-orphan.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"x")
    issues = t.fsck()
    assert any(i["kind"] == "orphan_file" for i in issues)
    roots = [os.path.relpath(r, t.store.table_path) for r in spy.listed]
    assert "data" in roots
    assert not spy.removed  # fsck reports, never deletes


def test_convert_adoption_routes_through_lister(spark, sf_dir, tmp_path, spy):
    from starlake_spark.table import StarTable, convert_to_star

    src = str(tmp_path / "plain")
    (spark.read.parquet(f"{sf_dir}/orders.parquet")
     .select(F.col("o_orderkey").alias("k"),
             F.col("o_orderstatus").alias("st")).limit(200)
     .write.parquet(src))
    t = convert_to_star(spark, src)
    assert src in spy.listed
    assert t.to_df().count() == 200


def test_writer_harvest_routes_through_lister(spark, sf_dir, tmp_path, spy):
    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    # creation itself harvested through the seam: some listed root is
    # this table's commit data dir
    assert any(r.startswith(os.path.join(t.store.table_path, "data"))
               for r in spy.listed)


def test_default_lister_contract(tmp_path):
    root = str(tmp_path / "x")
    os.makedirs(os.path.join(root, "sub"))
    p = os.path.join(root, "sub", "f.bin")
    with open(p, "wb") as f:
        f.write(b"abc")
    ents = list(FileSystemLister().list_files(root))
    assert len(ents) == 1
    e = ents[0]
    assert isinstance(e, FileEntry) and e.path == p and e.size == 3
    assert abs(e.mtime - os.path.getmtime(p)) < 1
    # missing root yields nothing; remove is idempotent
    assert list(FileSystemLister().list_files(root + "_nope")) == []
    FileSystemLister().remove(p)
    FileSystemLister().remove(p)
    assert not os.path.exists(p)
    assert get_lister() is not None


# ---------------------------------------------------------------------------
# round 9 (verdict task #6): the paginated object-store lister contract
# ---------------------------------------------------------------------------

from starlake_spark.listing import ObjectStoreLister  # noqa: E402


class PagingFake(ObjectStoreLister):
    """ListObjectsV2-shaped lister over the LOCAL filesystem with tiny
    forced pages: proves vacuum/fsck work end-to-end through the
    pagination loop (continuation tokens, flat key namespace, no
    directory recursion on the engine side)."""

    page_size = 3

    def __init__(self):
        self.pages = 0
        self.deleted: list[str] = []

    def _snapshot(self, prefix):
        keys = []
        for r, _d, names in os.walk(prefix.rstrip("/")):
            for n in names:
                p = os.path.join(r, n)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                keys.append(FileEntry(p, st.st_size, st.st_mtime))
        return sorted(keys, key=lambda e: e.path)

    def _list_page(self, prefix, token):
        # key-based continuation (S3 semantics: the token marks the
        # last key served, so deletes behind the cursor never shift
        # later pages — offset tokens would skip entries when vacuum
        # removes while iterating)
        self.pages += 1
        keys = self._snapshot(prefix)
        if token is not None:
            keys = [e for e in keys if e.path > token]
        page = keys[:self.page_size]
        nxt = page[-1].path if len(keys) > self.page_size else None
        return page, nxt

    def _delete(self, path):
        self.deleted.append(path)
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def _head(self, path):
        return os.path.exists(path)


def test_vacuum_and_fsck_through_paginated_lister(spark, sf_dir, tmp_path):
    from starlake_spark.operators.dml import cleanup

    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    t.write(t.to_df().limit(10), mode="append")  # a few commits
    live_before = {f.path for f in t.store.snapshot().all_files()}
    assert len(live_before) >= 2  # pagination has something to chew on

    orphans = []
    for i in range(5):
        p = os.path.join(t.store.table_path, "data", f"dead{i}",
                         f"part-orphan{i}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(b"junk")
        old = time.time() - 10_000
        os.utime(p, (old, old))
        orphans.append(p)

    fake = PagingFake()
    set_lister(fake)
    try:
        removed = cleanup(t.store, retention_s=3600)
        assert fake.pages > 1, "pagination never exercised"
        assert {os.path.basename(r) for r in removed} >= {
            f"part-orphan{i}.parquet" for i in range(5)}
        assert all(not os.path.exists(p) for p in orphans)
        # live data intact, table still reads
        assert {f.path for f in t.store.snapshot().all_files()} \
            == live_before
        assert t.to_df().count() > 0
        # fsck through the same lister: clean report
        issues = [i for i in t.fsck() if i.get("kind") != "info"]
        assert issues == []
    finally:
        set_lister(None)


def test_s3_lister_pagination_contract():
    """S3Lister against a stubbed ListObjectsV2 client: continuation
    tokens drive the loop, entries map key->uri, delete/head route to
    DeleteObject/HeadObject. (boto3 itself is optional and absent in
    this container — the client is injected.)"""
    from starlake_spark.listing import S3Lister

    class StubS3:
        def __init__(self):
            self.objects = {f"tbl/data/f{i:02d}.parquet": i for i in range(7)}
            self.deleted = []

        def list_objects_v2(self, Bucket, Prefix, MaxKeys,
                            ContinuationToken=None):
            assert Bucket == "bkt"
            keys = sorted(k for k in self.objects if k.startswith(Prefix))
            start = int(ContinuationToken or 0)
            page = keys[start:start + MaxKeys]
            nxt = start + MaxKeys
            return {"Contents": [{"Key": k, "Size": self.objects[k],
                                  "LastModified": 1000.0 + self.objects[k]}
                                 for k in page],
                    "IsTruncated": nxt < len(keys),
                    **({"NextContinuationToken": str(nxt)}
                       if nxt < len(keys) else {})}

        def delete_object(self, Bucket, Key):
            self.deleted.append(Key)
            self.objects.pop(Key, None)

        def head_object(self, Bucket, Key):
            if Key not in self.objects:
                # botocore ClientError shape: HeadObject 404
                e = Exception("Not Found")
                e.response = {
                    "Error": {"Code": "404", "Message": "Not Found"},
                    "ResponseMetadata": {"HTTPStatusCode": 404}}
                raise e

    stub = StubS3()
    lst = S3Lister(page_size=3, client=stub)
    got = list(lst.list_files("s3://bkt/tbl/data"))
    assert len(got) == 7  # all pages drained (3 + 3 + 1)
    assert got[0].path == "s3://bkt/tbl/data/f00.parquet"
    assert got[0].size == 0 and got[0].mtime == 1000.0
    assert lst.exists("s3://bkt/tbl/data/f03.parquet")
    lst.remove("s3://bkt/tbl/data/f03.parquet")
    assert stub.deleted == ["tbl/data/f03.parquet"]
    assert not lst.exists("s3://bkt/tbl/data/f03.parquet")
    with pytest.raises(ValueError, match="s3://"):
        lst.exists("/local/path")


def test_fsck_consults_lister_not_posix(spark, sf_dir, tmp_path):
    """Existence probes go through the seam: a lister that reports one
    (physically present) file as missing must make fsck flag it — on an
    object store the lister's HEAD is the truth, not a POSIX stat."""
    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    victim = t.store.snapshot().all_files()[0].path

    class Liar(FileSystemLister):
        def exists(self, path):
            if path.endswith(victim):
                return False
            return super().exists(path)

    set_lister(Liar())
    try:
        issues = t.fsck()
        assert any(i["kind"] == "missing_file" and i["path"] == victim
                   for i in issues)
    finally:
        set_lister(None)
    assert os.path.exists(os.path.join(t.store.table_path, victim))
    assert [i for i in t.fsck() if i.get("kind") != "info"] == []


# ---------------------------------------------------------------------------
# round 10 (verdict task #4 + ADVICE): real-S3-API-shaped lister tests
# ---------------------------------------------------------------------------
# The S3Lister code itself (pagination loop, ContinuationToken plumbing,
# 404-vs-transient head discrimination) is exercised against a botocore-
# shaped stub client with real ListObjectsV2 semantics: lexicographic
# key order, MaxKeys truncation, IsTruncated + NextContinuationToken,
# empty pages mid-stream, ClientError-shaped failures. boto3 is NOT
# installed in this container — the client is injected, which is the
# supported seam (S3Lister(client=...)).

from starlake_spark.listing import S3Lister  # noqa: E402


def _client_error(code, status, msg=""):
    e = Exception(msg or code)
    e.response = {"Error": {"Code": code, "Message": msg or code},
                  "ResponseMetadata": {"HTTPStatusCode": status}}
    return e


class BotocoreShapedS3:
    """In-memory S3 with faithful ListObjectsV2 behavior.

    - keys served in lexicographic order (S3 contract)
    - ContinuationToken is opaque (here: the last key served), so
      deletes behind the cursor never shift later pages
    - can inject EMPTY pages that still carry IsTruncated=true (real
      S3 does this under delete churn / delimiter filtering)
    - head/delete raise botocore-shaped ClientErrors on demand
    """

    def __init__(self, keys=()):
        import datetime
        self.objects = {k: (len(k), datetime.datetime
                            .fromtimestamp(1_700_000_000 + i,
                                           datetime.timezone.utc))
                        for i, k in enumerate(sorted(keys))}
        self.empty_pages_at = set()   # page ordinals to serve empty
        self.head_fails = {}          # key -> exception to raise
        self.delete_during_page = {}  # page ordinal -> key to delete
        self.page_calls = 0

    def list_objects_v2(self, Bucket, Prefix, MaxKeys,
                        ContinuationToken=None):
        self.page_calls += 1
        ordinal = self.page_calls
        if ordinal in self.delete_during_page:
            self.objects.pop(self.delete_during_page[ordinal], None)
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        if ContinuationToken is not None:
            keys = [k for k in keys if k > ContinuationToken]
        if ordinal in self.empty_pages_at and keys:
            # an empty page that is NOT the end: token stands still
            return {"Contents": [], "IsTruncated": True,
                    "NextContinuationToken": ContinuationToken or ""}
        page = keys[:MaxKeys]
        truncated = len(keys) > MaxKeys
        resp = {"Contents": [{"Key": k, "Size": self.objects[k][0],
                              "LastModified": self.objects[k][1]}
                             for k in page],
                "IsTruncated": truncated}
        if truncated:
            resp["NextContinuationToken"] = page[-1]
        return resp

    def head_object(self, Bucket, Key):
        if Key in self.head_fails:
            raise self.head_fails[Key]
        if Key not in self.objects:
            raise _client_error("404", 404, "Not Found")
        return {"ContentLength": self.objects[Key][0]}

    def delete_object(self, Bucket, Key):
        self.objects.pop(Key, None)


def test_s3_lister_truncation_and_empty_pages():
    keys = [f"tbl/data/c0/part-{i:03d}.parquet" for i in range(10)]
    stub = BotocoreShapedS3(keys)
    stub.empty_pages_at = {2}  # second page comes back empty-but-truncated
    lst = S3Lister(page_size=4, client=stub)
    got = list(lst.list_files("s3://bkt/tbl/data"))
    assert [e.path for e in got] == [f"s3://bkt/{k}" for k in sorted(keys)]
    assert stub.page_calls >= 4  # 4+empty+4+2, token loop survived
    # datetime LastModified converted to epoch seconds
    assert got[0].mtime == 1_700_000_000.0


def test_s3_lister_delete_during_pagination():
    keys = [f"tbl/d/k{i:02d}" for i in range(9)]
    stub = BotocoreShapedS3(keys)
    # a key BEHIND the cursor vanishes between page 1 and page 2 —
    # key-based tokens must not skip any still-live key
    stub.delete_during_page = {2: "tbl/d/k00"}
    lst = S3Lister(page_size=3, client=stub)
    got = {e.path for e in lst.list_files("s3://bkt/tbl/d")}
    assert got == {f"s3://bkt/tbl/d/k{i:02d}" for i in range(1, 9)} | \
        {"s3://bkt/tbl/d/k00"}  # k00 was served on page 1 before the delete


def test_s3_head_404_vs_transient(tmp_path):
    """ADVICE (medium): only a definitive 404/NoSuchKey may report
    'missing'; throttling / 5xx / credential failures re-raise so
    fsck(repair=True) can never drop live manifest references over a
    transient outage."""
    stub = BotocoreShapedS3(["tbl/a"])
    lst = S3Lister(client=stub)
    assert lst.exists("s3://bkt/tbl/a")
    assert not lst.exists("s3://bkt/tbl/missing")          # real 404
    stub.head_fails["tbl/slow"] = _client_error("SlowDown", 503,
                                                "Reduce your request rate")
    with pytest.raises(Exception, match="SlowDown|Reduce"):
        lst.exists("s3://bkt/tbl/slow")
    stub.head_fails["tbl/cred"] = _client_error("ExpiredToken", 400)
    with pytest.raises(Exception, match="ExpiredToken"):
        lst.exists("s3://bkt/tbl/cred")
    # NoSuchKey string code also counts as definitive
    stub.head_fails["tbl/nsk"] = _client_error("NoSuchKey", 404)
    assert not lst.exists("s3://bkt/tbl/nsk")
    # a bare exception with no botocore response shape re-raises too
    stub.head_fails["tbl/net"] = ConnectionError("reset by peer")
    with pytest.raises(ConnectionError):
        lst.exists("s3://bkt/tbl/net")


class LocalS3Shim(S3Lister):
    """Runs the REAL S3Lister stack (pagination, 404 discrimination)
    over local table paths by mapping ``<abs path>`` <-> key in bucket
    ``local`` of a botocore-shaped stub that mirrors the filesystem.
    Lets the actual vacuum/fsck suites execute through S3Lister."""

    def __init__(self):
        shim = self

        class FSBackedS3:
            def list_objects_v2(self, Bucket, Prefix, MaxKeys,
                                ContinuationToken=None):
                import datetime
                root = "/" + Prefix
                keys = []
                for r, _d, names in os.walk(root.rstrip("/")):
                    for n in names:
                        keys.append(os.path.join(r, n).lstrip("/"))
                keys.sort()
                if ContinuationToken is not None:
                    keys = [k for k in keys if k > ContinuationToken]
                page = keys[:MaxKeys]
                out = []
                for k in page:
                    try:
                        st = os.stat("/" + k)
                    except OSError:
                        continue
                    out.append({"Key": k, "Size": st.st_size,
                                "LastModified": datetime.datetime
                                .fromtimestamp(st.st_mtime,
                                               datetime.timezone.utc)})
                truncated = len(keys) > MaxKeys
                resp = {"Contents": out, "IsTruncated": truncated}
                if truncated:
                    resp["NextContinuationToken"] = page[-1]
                shim.pages += 1
                return resp

            def head_object(self, Bucket, Key):
                if not os.path.isfile("/" + Key):
                    raise _client_error("404", 404)
                return {}

            def delete_object(self, Bucket, Key):
                try:
                    os.unlink("/" + Key)
                except FileNotFoundError:
                    pass

        super().__init__(page_size=3, client=FSBackedS3())
        self.pages = 0

    # URI translation: callers hand local paths; the S3 stack sees
    # s3://local/<path-without-leading-slash>
    def _uri(self, path):
        return "s3://local" + path

    def list_files(self, root):
        for e in super().list_files(self._uri(root)):
            yield FileEntry(e.path[len("s3://local"):], e.size, e.mtime)

    def remove(self, path):
        super().remove(self._uri(path))

    def exists(self, path):
        return super().exists(self._uri(path))


def test_vacuum_and_fsck_through_s3lister(spark, sf_dir, tmp_path):
    """End-to-end vacuum + fsck where every LIST/HEAD/DELETE runs the
    real S3Lister code against a ListObjectsV2-shaped client."""
    from starlake_spark.operators.dml import cleanup

    t = _mk(spark, str(tmp_path / "t"), sf_dir)
    t.write(t.to_df().limit(10), mode="append")
    live_before = {f.path for f in t.store.snapshot().all_files()}

    orphans = []
    for i in range(4):
        p = os.path.join(t.store.table_path, "data", f"dead{i}",
                         f"part-orphan{i}.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(b"junk")
        old = time.time() - 10_000
        os.utime(p, (old, old))
        orphans.append(p)

    shim = LocalS3Shim()
    set_lister(shim)
    try:
        removed = cleanup(t.store, retention_s=3600)
        assert shim.pages > 1, "S3 pagination never exercised"
        assert {os.path.basename(r) for r in removed} >= {
            f"part-orphan{i}.parquet" for i in range(4)}
        assert all(not os.path.exists(p) for p in orphans)
        assert {f.path for f in t.store.snapshot().all_files()} \
            == live_before
        assert t.to_df().count() > 0
        issues = [i for i in t.fsck() if i.get("kind") != "info"]
        assert issues == []
    finally:
        set_lister(None)

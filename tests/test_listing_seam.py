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
                raise KeyError(Key)

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

"""Round-10 verdict task #6: cross-process concurrency soak for the
txn-stamp machinery.

The crash tests elsewhere are single-process kill-injections. Here two
real OS processes hammer ONE warehouse through the TCP lease arbiter
(the multi-host deployment of the commit lock):

* a COMMITTER process appends source commits in bursts, each commit
  carrying a known value (num_rows doubles as the payload);
* a REFRESHER process runs the rollup-style consume loop — read the
  authoritative stamp, window (stamp, cur], gated commit at
  txn_version=cur into a target table, property-style cursor save LAST
  — restarted COLD every iteration (fresh ManifestStore, fresh
  process), so resume always goes through the registry stamps.

After N rounds: the target's accumulated total must equal the source's
total exactly (a double-applied window inflates it, a lost window
shrinks it), and the final stamp must equal the source's final
version. 20/20 iterations, no Spark in the children — this is the
meta/stamp layer under genuine cross-process interleaving.
"""

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import types as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, random, sys, time

sys.path.insert(0, os.environ["SOAK_REPO"])
from starlake_spark.meta import (DataFileInfo, DuplicateTxnError,
                                 ManifestStore)

role, src_path, tgt_path, arg = sys.argv[1:5]


def file_info(name, value):
    return DataFileInfo(path=name, range_value="", bucket_id=-1, size=1,
                        write_version=-1, is_base_file=False,
                        exist_cols=["v"], num_rows=value)


if role == "commit":
    # one burst: `arg` commits, values encode (burst, i) uniquely
    burst, n = json.loads(arg)
    store = ManifestStore(src_path)
    for i in range(n):
        txn = store.new_transaction()
        txn.commit_type = "delta"
        val = burst * 1000 + i + 1
        name = f"b{burst}_{i}.bin"
        with open(os.path.join(src_path, name), "wb") as f:
            f.write(b"x")
        txn.add_files([file_info(name, val)])
        store.commit(txn)
        time.sleep(random.random() * 0.01)
    print("COMMITTED")
elif role == "refresh":
    # ONE cold refresh pass: stamp-authoritative cursor, gated commit,
    # cursor property saved only after (mirrors plans/rollup.py)
    src = ManifestStore(src_path)
    tgt = ManifestStore(tgt_path)
    key = "txn:soak_refresh"
    stamp = tgt.snapshot().streaming.get(key, -1)
    cfg_last = int((tgt.table_info().configuration or {})
                   .get("soak.last", "0"))
    last = max(stamp, cfg_last)
    cur = src.latest_version()
    if cur <= last:
        print("NOOP")
        sys.exit(0)
    window = [f for f in src.snapshot(cur).all_files()
              if f.write_version > last]
    total = sum(f.num_rows for f in window)
    txn = tgt.new_transaction()
    txn.commit_type = "delta"
    name = f"w{last}_{cur}_{os.getpid()}.bin"
    with open(os.path.join(tgt_path, name), "wb") as f:
        f.write(b"x")
    txn.add_files([file_info(name, total)])
    txn.set_streaming_batch(key, cur)
    try:
        tgt.commit(txn)
    except DuplicateTxnError:
        print("DUP")  # concurrent/replayed refresh already landed
        sys.exit(0)
    info = tgt.table_info(refresh=True)
    info.configuration = dict(info.configuration or {})
    info.configuration["soak.last"] = str(cur)
    tgt.update_table_info(info)
    print(f"APPLIED {last} {cur} {total}")
else:
    raise SystemExit(f"unknown role {role}")
"""


@pytest.mark.slow
def test_crossproc_refresh_commit_soak(tmp_path):
    from starlake_spark.locking import LeaseServer
    from starlake_spark.meta import ManifestStore, TableInfo

    srv = LeaseServer()
    child_py = tmp_path / "soak_child.py"
    child_py.write_text(CHILD)
    src_path, tgt_path = str(tmp_path / "src"), str(tmp_path / "tgt")

    env = dict(os.environ)
    env["SOAK_REPO"] = REPO
    env["STARLAKE_LOCK_PROVIDER"] = (
        "starlake_spark.locking:TCPLockProvider"
        f"?host={srv.host}&port={srv.port}")

    schema = T.StructType([T.StructField("v", T.LongType())]).json()
    for p, tid in ((src_path, "soak-src"), (tgt_path, "soak-tgt")):
        st = ManifestStore(p)
        st.create(TableInfo(table_path=os.path.abspath(p), table_id=tid,
                            schema_json=schema))

    def run(role, arg, wait=True):
        proc = subprocess.Popen(
            [sys.executable, str(child_py), role, src_path, tgt_path, arg],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        if not wait:
            return proc
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, f"{role} failed: {err[-2000:]}"
        return out

    try:
        applied = 0
        for it in range(20):
            # committer burst CONCURRENT with a cold refresher process
            committer = run("commit", json.dumps([it, 3]), wait=False)
            refresher = run("refresh", "", wait=False)
            out_r, err_r = refresher.communicate(timeout=120)
            assert refresher.returncode == 0, err_r[-2000:]
            out_c, err_c = committer.communicate(timeout=120)
            assert committer.returncode == 0, err_c[-2000:]
            if out_r.startswith("APPLIED"):
                applied += 1
        # drain: refresh until noop (the last burst may be unconsumed)
        for _ in range(5):
            if run("refresh", "").startswith("NOOP"):
                break
        assert applied >= 5, f"soak never interleaved ({applied} applies)"

        src = ManifestStore(src_path)
        tgt = ManifestStore(tgt_path)
        src_total = sum(f.num_rows for f in src.snapshot().all_files())
        tgt_total = sum(f.num_rows for f in tgt.snapshot().all_files())
        assert src.snapshot().version == 20 * 3
        assert tgt_total == src_total, \
            f"double-apply or lost window: target {tgt_total} " \
            f"vs source {src_total}"
        # no lost stamps: the registry cursor reached the final source
        # version and the property cursor never overtook it
        stamp = tgt.snapshot().streaming.get("txn:soak_refresh", -1)
        assert stamp == src.latest_version()
        assert int(tgt.table_info().configuration["soak.last"]) <= stamp
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_crossproc_racing_committers(tmp_path):
    """TWO committer processes racing on ONE table through the TCP
    arbiter: every commit lands exactly once (distinct versions, no
    lost files), CAS retries resolve under real process interleaving."""
    from starlake_spark.locking import LeaseServer
    from starlake_spark.meta import ManifestStore, TableInfo

    srv = LeaseServer()
    child_py = tmp_path / "soak_child.py"
    child_py.write_text(CHILD)
    src_path, tgt_path = str(tmp_path / "src"), str(tmp_path / "tgt")

    env = dict(os.environ)
    env["SOAK_REPO"] = REPO
    env["STARLAKE_LOCK_PROVIDER"] = (
        "starlake_spark.locking:TCPLockProvider"
        f"?host={srv.host}&port={srv.port}")

    schema = T.StructType([T.StructField("v", T.LongType())]).json()
    st = ManifestStore(src_path)
    st.create(TableInfo(table_path=os.path.abspath(src_path),
                        table_id="soak-race", schema_json=schema))

    try:
        procs = [subprocess.Popen(
            [sys.executable, str(child_py), "commit", src_path, tgt_path,
             json.dumps([b, 10])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True) for b in (1, 2)]
        for p in procs:
            out, err = p.communicate(timeout=180)
            assert p.returncode == 0, err[-2000:]

        store = ManifestStore(src_path)
        files = store.snapshot().all_files()
        assert len(files) == 20  # every commit landed
        assert store.snapshot().version == 20  # one version per commit
        vals = sorted(f.num_rows for f in files)
        want = sorted([1000 + i + 1 for i in range(10)]
                      + [2000 + i + 1 for i in range(10)])
        assert vals == want  # nothing lost, nothing duplicated
    finally:
        srv.shutdown()

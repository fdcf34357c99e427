"""No-clobber version publication (meta._exclusive_write).

Version files are immutable and unique per number, so publication must
be a filesystem compare-and-swap: a fenced-out holder that passed
validate() and THEN stalled past its lease (arbiter restart, >TTL
partition) physically cannot overwrite a successor's already-published
version file — its publish raises instead of silently clobbering (r6
ADVICE meta.py:295 / VERDICT task 4). Plain rename survives only for
genuinely replaceable metadata (table_info.json).
"""

import json
import os

import pytest

from starlake_spark.meta import (ManifestStore, MetaError, TableInfo,
                                 VersionExistsError, _exclusive_write)


def _store(tmp_path, name="t"):
    p = str(tmp_path / name)
    st = ManifestStore(p)
    st.create(TableInfo(table_path=p, table_id="tid-" + name,
                        schema_json="{}"))
    return st


def test_exclusive_write_refuses_overwrite(tmp_path):
    p = str(tmp_path / "v000000000001.json")
    _exclusive_write(p, '{"winner": true}')
    with pytest.raises(VersionExistsError):
        _exclusive_write(p, '{"loser": true}')
    with open(p) as f:
        assert json.load(f) == {"winner": True}
    # no temp litter left behind either way
    assert os.listdir(tmp_path) == ["v000000000001.json"]


def test_stalled_holder_publish_cannot_clobber_successor(tmp_path):
    """Injected stall: the holder passes _validate_lock, then stalls
    while a successor publishes the SAME version number. The holder's
    publish must hit the exclusive-create (not overwrite), the
    optimistic loop treats it as a lost CAS, and the commit lands as
    the NEXT version — the successor's commit is never lost."""
    store = _store(tmp_path)
    successor_payload = json.dumps({
        "version": 1, "partitions": {}, "streaming": {},
        "timestamp": 1.0, "commit_type": "write"})
    fired = []

    orig_validate = ManifestStore._validate_lock

    def stall_then_pass(self, handle):
        # model: validate() says the lease is live, the process then
        # stalls past its TTL, and a fenced successor publishes v1
        if not fired:
            fired.append(True)
            _exclusive_write(self._version_path(1), successor_payload)
        return orig_validate(self, handle)

    ManifestStore._validate_lock = stall_then_pass
    try:
        txn = store.new_transaction()
        snap = store.commit(txn)
    finally:
        ManifestStore._validate_lock = orig_validate
    # the successor's v1 survived byte-for-byte; our commit became v2
    assert snap.version == 2
    with open(store._version_path(1)) as f:
        assert f.read() == successor_payload
    assert store.list_versions() == [0, 1, 2]


def test_fenced_bypass_surfaces_after_max_lost_cas(tmp_path):
    """A publisher that BYPASSES the publish micro-lock (models a
    fenced-out holder violating its lease) and steals every version
    number defeats the COMMIT_MAX_ATTEMPTS optimistic attempts
    (reference MetaUtils.MAX_COMMIT_ATTEMPTS → commitFailedReachLimit,
    MetaCommit.scala:86-92); the guaranteed fallback then hits the
    exclusive-create and surfaces VersionExistsError LOUDLY — no stolen
    version is ever clobbered, and the violator is never silently
    absorbed."""
    store = _store(tmp_path)
    orig_validate = ManifestStore._validate_lock
    stolen = []
    calls = [0]

    def steal_next_version(self, handle):
        # validate runs once per handle (scope lock + publish lock =
        # 2/attempt); steal on the first of each pair so exactly one
        # version is stolen per attempt (modelling one foreign holder
        # that ignores the publish lock)
        calls[0] += 1
        if calls[0] % 2 == 1:
            v = self.latest_version() + 1
            payload = json.dumps({
                "version": v, "partitions": {}, "streaming": {},
                "timestamp": float(v), "commit_type": "write"})
            _exclusive_write(self._version_path(v), payload)
            stolen.append((v, payload))
        return True

    ManifestStore._validate_lock = steal_next_version
    try:
        with pytest.raises(VersionExistsError, match="already published"):
            store.commit(store.new_transaction())
    finally:
        ManifestStore._validate_lock = orig_validate
    # optimistic attempts + the fallback each lost to one steal
    assert len(stolen) == ManifestStore.COMMIT_MAX_ATTEMPTS + 1
    for v, payload in stolen:
        with open(store._version_path(v)) as f:
            assert f.read() == payload
    assert store.list_versions() == [0] + [v for v, _ in stolen]

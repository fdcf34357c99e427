"""Pluggable commit-lock backends for the manifest commit protocol.

The reference arbitrates concurrent writers with a Cassandra
lightweight-transaction lock (reference: meta/MetaLock.scala:19-50 —
``INSERT ... IF NOT EXISTS`` on a lock row, committer identity in the
row, TTL for staleness). This module is the same seam as an interface:
``ManifestStore`` takes whatever :class:`LockProvider` is registered,
so a DynamoDB / ZooKeeper / Postgres-advisory-lock arbiter for
multi-HOST writers plugs in without touching the commit protocol. The
default :class:`FileLockProvider` (exclusive-create file, stale-break,
bounded wait) is proven across threads and processes on one host
(tests/test_property_dml.py commit-storm) — the file is the analog of
the LWT row, ``STALE_LOCK_S`` the analog of the TTL.

Contract (what tests/test_lock_provider.py pins for every provider):

* ``acquire`` returns an opaque handle; between a successful acquire
  and its ``release`` no other ``acquire`` for the SAME table may
  succeed (mutual exclusion).
* ``acquire`` blocks up to ``timeout_s`` then raises ``TimeoutError``
  (``ManifestStore`` converts it to ``MetaError``).
* ``release(handle)`` is idempotent enough to survive a handle whose
  backing state was already broken by a stale-lock reaper
  (``FileNotFoundError``-class races must not propagate).
* Providers must tolerate acquire/release from different threads.

Registration: ``set_lock_provider(provider)`` installs a process-wide
provider; ``set_lock_provider(None)`` restores the file default. The
``STARLAKE_LOCK_PROVIDER`` env var ("pkg.module:ClassName") installs
one at import time for spark-submit-style deployments.
"""

from __future__ import annotations

import importlib
import os
import threading
import time
from abc import ABC, abstractmethod
from typing import Any


class LockProvider(ABC):
    """Mutual exclusion for one table's manifest commits."""

    @abstractmethod
    def acquire(self, meta_dir: str, table_path: str,
                timeout_s: float) -> Any:
        """Block until the table lock is held (≤ timeout_s), return an
        opaque handle for :meth:`release`. Raise TimeoutError on
        timeout."""

    @abstractmethod
    def release(self, handle: Any) -> None:
        """Release a handle returned by :meth:`acquire`."""

    def validate(self, handle: Any) -> bool:
        """Return True iff the handle still holds the lock. The commit
        protocol calls this immediately before the atomic publish so a
        lease that expired mid-critical-section (arbiter restart,
        stalled holder) fails the commit instead of double-publishing.
        Providers whose locks cannot be lost while held (the file lock
        within its staleness window) keep the default True."""
        return True

    # Providers that arbitrate DISTINCT locks per scope set this True
    # (all built-ins). When False (safe default for third-party
    # providers), the commit protocol never calls acquire_scoped and
    # falls back to the single table-wide lock — correct, just coarser.
    # Opt-in matters: a provider that keys on something other than
    # table_path (e.g. a wrapper delegating to FileLockProvider, which
    # keys on meta_dir) would silently collapse every scope onto ONE
    # lock, and the publish micro-lock would then self-deadlock against
    # the already-held scope lock.
    supports_scopes = False

    def acquire_scoped(self, meta_dir: str, table_path: str,
                       timeout_s: float, scope: str | None = None) -> Any:
        """PARTITION-scoped acquire (reference
        MetaCommit.takePartitionsWriteLock, MetaCommit.scala:334-430:
        one LWT write lock per touched range, taken in sorted order).
        ``scope=None`` is the table-wide lock; a scope string (a
        partition ``range_value``, or the commit protocol's publish
        micro-lock key) names an INDEPENDENT lock so writers to
        disjoint partitions never contend. The default composes the
        scope into the lock key, which is correct for any provider that
        arbitrates on ``table_path`` (SQLite row key, TCP lease key);
        :class:`FileLockProvider` overrides to scope the lock FILENAME
        instead, since it keys on ``meta_dir``. Only called when
        ``supports_scopes`` is True. ``release``/``validate`` take
        scoped handles unchanged."""
        if scope is None:
            return self.acquire(meta_dir, table_path, timeout_s)
        return self.acquire(meta_dir, f"{table_path}\x1fscope={scope}",
                            timeout_s)


class FileLockProvider(LockProvider):
    """Default single-host provider: ``O_CREAT|O_EXCL`` on
    ``<meta_dir>/_commit.lock`` — atomic on POSIX and on HDFS-style
    stores with exclusive create. A lock older than ``stale_s`` is
    broken (crashed committer), mirroring the reference lock row's TTL
    expiry."""

    supports_scopes = True

    def __init__(self, stale_s: float = 120.0, poll_s: float = 0.05):
        self.stale_s = stale_s
        self.poll_s = poll_s

    def acquire(self, meta_dir: str, table_path: str,
                timeout_s: float) -> tuple:
        return self._acquire_path(
            os.path.join(meta_dir, "_commit.lock"), table_path, timeout_s)

    def acquire_scoped(self, meta_dir: str, table_path: str,
                       timeout_s: float, scope: str | None = None) -> tuple:
        # FileLockProvider keys on the lock FILE, not table_path — scope
        # the filename. Range values may contain separators/long values,
        # so the name carries a digest; collisions only coarsen locking
        # (two ranges sharing a lock), never weaken it.
        if scope is None:
            return self.acquire(meta_dir, table_path, timeout_s)
        import hashlib

        h = hashlib.sha256(scope.encode()).hexdigest()[:16]
        return self._acquire_path(
            os.path.join(meta_dir, f"_commit.lock.p{h}"),
            f"{table_path}\x1fscope={scope}", timeout_s)

    def _acquire_path(self, lock: str, table_path: str,
                      timeout_s: float) -> tuple:
        deadline = time.time() + timeout_s
        token = f"{os.getpid()}:{id(self)}:{time.monotonic_ns()}"
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                return (lock, token)
            except FileExistsError:
                try:
                    st = os.stat(lock)
                except FileNotFoundError:
                    continue
                if time.time() - st.st_mtime > self.stale_s:
                    self._break_stale(lock)
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"commit lock timeout on {table_path}")
                time.sleep(self.poll_s)

    def _break_stale(self, lock: str) -> None:
        """Race-safe stale-lock break. A plain ``unlink`` here is a
        TOCTOU hazard: two waiters can both observe the same stale
        lock, the first unlinks it and acquires a FRESH lock, and the
        second then unlinks the fresh one — two concurrent holders.
        Instead the breaker atomically *claims* the stale file by
        renaming it to a unique reap name: exactly one racing breaker
        wins the rename (the loser's rename raises — the source is
        gone) and nobody ever unlinks the live lock path directly.
        After the rename the winner re-verifies staleness on the
        reaped file; if it turns out fresh (created in the stat→rename
        window by a winner of an earlier break), it is handed back via
        ``link`` (which refuses to clobber a newer lock)."""
        reap = f"{lock}.reap-{os.getpid()}-{time.monotonic_ns()}"
        try:
            # re-stat IMMEDIATELY before the rename: the caller's
            # staleness observation may be arbitrarily old (it slept in
            # the acquire loop) — this shrinks the observe→claim window
            # to microseconds
            if time.time() - os.path.getmtime(lock) <= self.stale_s:
                return
            os.rename(lock, reap)
        except OSError:
            return  # another breaker claimed it first / lock vanished
        try:
            still_stale = time.time() - os.path.getmtime(reap) > self.stale_s
        except FileNotFoundError:
            return
        if not still_stale:
            # We stole a fresh lock — give it back. link() fails if a
            # newer lock already exists at the path; that residual
            # three-way interleave (stat→reap→fresh-acquire inside our
            # microsecond window, then a THIRD writer's create before
            # the link) cannot be repaired with plain files — surface
            # it loudly instead of silently dropping a live lock.
            # Multi-writer deployments that can't tolerate even this
            # window should use the SQLite/TCP providers, whose
            # arbitration is transactional.
            try:
                os.link(reap, lock)
            except OSError:
                import warnings

                warnings.warn(
                    f"stale-break race on {lock}: a fresh lock was "
                    "reaped and could not be restored (a newer holder "
                    "took the path); its owner now runs unlocked — "
                    "prefer SQLiteLockProvider/TCPLockProvider for "
                    "contended multi-writer tables", stacklevel=2)
        try:
            os.unlink(reap)
        except FileNotFoundError:
            pass

    def release(self, handle) -> None:
        # Accept legacy bare-path handles for back compat.
        lock, token = handle if isinstance(handle, tuple) else (handle, None)
        if token is None:
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass
            return
        # Rename-claim, mirroring _break_stale: a read-then-unlink here
        # would race a stale-breaker — between reading our own token and
        # the unlink, a reaper could break us and a NEW writer acquire,
        # so the unlink would delete the new holder's live lock. The
        # rename atomically claims whatever is at the path; the token
        # check then decides ours (discard) vs theirs (hand back).
        reap = f"{lock}.rel-{os.getpid()}-{time.monotonic_ns()}"
        try:
            os.rename(lock, reap)
        except OSError:
            # lock vanished (stale-break reaper or test cleanup got
            # there first) — the guarded section is over, nothing to undo
            return
        try:
            with open(reap, "rb") as f:
                ours = f.read().decode(errors="replace") == token
        except FileNotFoundError:
            return
        if not ours:
            # We claimed a successor's live lock (only reachable once
            # our own lock went stale and was reaped). Hand it back;
            # link() refuses to clobber an even newer lock at the path
            # (same three-way residual as _break_stale — warn loudly).
            #
            # Residual (documented, not repairable with plain files):
            # if the successor RELEASES in the claim→link-back window,
            # its own rename fails ENOENT and returns, and this link
            # resurrects a lock file owned by nobody — acquires wedge
            # until the stale-breaker clears it after stale_s. Worse,
            # a third writer that acquired fresh in that window plus
            # the resurrected orphan gives two logical lock files in
            # sequence (the link fails on the fresh lock → warning
            # below). There is no token we could re-check that
            # distinguishes "successor still holds" from "successor
            # released milliseconds ago"; contended multi-writer tables
            # should use SQLiteLockProvider/TCPLockProvider, whose
            # arbitration is transactional. The commit protocol's
            # _exclusive_write version publish bounds the damage to
            # availability (a wedge), never a lost commit.
            try:
                os.link(reap, lock)
            except OSError:
                import warnings

                warnings.warn(
                    f"release race on {lock}: a successor's lock was "
                    "claimed and could not be restored (a newer holder "
                    "took the path); its owner now runs unlocked — "
                    "prefer SQLiteLockProvider/TCPLockProvider for "
                    "contended multi-writer tables", stacklevel=2)
        try:
            os.unlink(reap)
        except FileNotFoundError:
            pass


_default = FileLockProvider()
_provider: LockProvider | None = None


def set_lock_provider(provider: LockProvider | None) -> None:
    """Install a process-wide provider (None → file default)."""
    global _provider
    _provider = provider


def get_lock_provider() -> LockProvider:
    if _provider is not None:
        return _provider
    return _default


def _from_env() -> None:
    """``STARLAKE_LOCK_PROVIDER="pkg.module:ClassName"`` installs a
    provider at import time; constructor kwargs ride a query string —
    ``"starlake_spark.locking:TCPLockProvider?host=10.0.0.5&port=7878"``
    (values parse as int → float → string)."""
    spec = os.environ.get("STARLAKE_LOCK_PROVIDER", "")
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
    set_lock_provider(cls(**kwargs))




class SQLiteLockProvider(LockProvider):
    """DATABASE-ARBITRATED provider: mutual exclusion through an
    exclusive transaction on a shared SQLite file — the working
    template for the reference's Cassandra LWT shape
    (meta/MetaLock.scala:19-50: INSERT ... IF NOT EXISTS on a lock row
    with committer identity + TTL) on any store that gives you a
    transactional INSERT. Every writer process that can reach ``db_path``
    (shared filesystem here; a Postgres/DynamoDB port changes only the
    two SQL statements) arbitrates through the same row:

    * acquire = INSERT the table's lock row inside an IMMEDIATE
      transaction; a second writer's INSERT hits the PRIMARY KEY and
      retries until ``timeout_s``.
    * TTL: a row older than ``stale_s`` is deleted (crashed committer),
      exactly the reference's TTL expiry.
    * release = DELETE the row (idempotent — a reaped row is fine).

    Scoped locks (partition write locks + the publish micro-lock) ride
    the same row key: the scope is composed into ``table_path`` by the
    base acquire_scoped, so each scope is an independent row.
    """

    supports_scopes = True

    def __init__(self, db_path: str, stale_s: float = 120.0,
                 poll_s: float = 0.05):
        self.db_path = db_path
        self.stale_s = stale_s
        self.poll_s = poll_s

    def _conn(self):
        import sqlite3

        c = sqlite3.connect(self.db_path, timeout=5.0,
                            isolation_level=None)
        c.execute("CREATE TABLE IF NOT EXISTS commit_locks ("
                  "table_path TEXT PRIMARY KEY, owner TEXT, ts REAL)")
        return c

    def acquire(self, meta_dir: str, table_path: str,
                timeout_s: float) -> tuple:
        owner = f"{os.getpid()}:{id(self)}"
        deadline = time.time() + timeout_s
        c = self._conn()
        while True:
            now = time.time()
            try:
                c.execute("BEGIN IMMEDIATE")
                c.execute("DELETE FROM commit_locks WHERE table_path = ? "
                          "AND ts < ?", (table_path, now - self.stale_s))
                c.execute("INSERT INTO commit_locks VALUES (?, ?, ?)",
                          (table_path, owner, now))
                c.execute("COMMIT")
                return (c, table_path, owner)
            except Exception:
                try:
                    c.execute("ROLLBACK")
                except Exception:
                    pass
                if time.time() > deadline:
                    c.close()
                    raise TimeoutError(
                        f"commit lock timeout on {table_path}")
                time.sleep(self.poll_s)

    def release(self, handle: tuple) -> None:
        c, table_path, owner = handle
        try:
            c.execute("DELETE FROM commit_locks WHERE table_path = ? "
                      "AND owner = ?", (table_path, owner))
        finally:
            c.close()

    def validate(self, handle: tuple) -> bool:
        c, table_path, owner = handle
        row = c.execute(
            "SELECT owner, ts FROM commit_locks WHERE table_path = ?",
            (table_path,)).fetchone()
        return (row is not None and row[0] == owner
                and time.time() - row[1] <= self.stale_s)


class LeaseServer:
    """Minimal TCP lease arbiter — the multi-HOST deployment of the
    commit lock: writers on different machines that share nothing but
    the network arbitrate through this one process (the role the
    reference's Cassandra cluster plays for its LWT lock row,
    meta/MetaLock.scala:19-50). Leases carry a TTL so a crashed
    holder's lease expires instead of wedging the table — the same
    staleness discipline as every other provider here.

    Wire protocol: one line per request over a fresh connection,
    newline-terminated, table path base64-encoded (paths may contain
    spaces):

    * ``ACQUIRE <b64-table> <owner> <ttl_s>`` → ``OK <fence>`` (granted,
      or re-granted to the same owner with TTL refreshed — renewal keeps
      the SAME fence) | ``HELD <holder>``. The fence is a per-table
      monotonically increasing token, bumped on every ownership change:
      a holder that lost and re-won its lease sees a HIGHER fence, so a
      stale holder can never validate against a successor's grant.
    * ``CHECK <b64-table> <owner> <fence>`` → ``OK`` iff that exact
      grant is still live | ``NO`` — the publish-path validation RPC.
    * ``RELEASE <b64-table> <owner>`` → ``OK`` (idempotent — releasing
      an expired/reaped lease is fine) | ``NOTOWNER``
    * ``PING`` → ``PONG``

    ``persist_path`` (optional) journals leases + fence counters to a
    JSON file on every mutation: a restarted arbiter refuses grants for
    tables whose prior lease TTL has not yet elapsed (instead of
    silently double-granting) and keeps fences monotonic across the
    restart.

    Run standalone: ``python -m starlake_spark.locking [port]``."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 persist_path: str | None = None):
        import json as _json
        import socketserver
        import threading

        # tbl -> (owner, expiry, fence); fences survive lease release
        leases: dict[str, tuple[str, float, int]] = {}
        fences: dict[str, int] = {}
        guard = threading.Lock()
        if persist_path and os.path.exists(persist_path):
            with open(persist_path) as f:
                state = _json.load(f)
            fences.update({k: int(v) for k, v in
                           state.get("fences", {}).items()})
            now = time.time()
            for tbl, (owner, expiry, fence) in state.get(
                    "leases", {}).items():
                if expiry > now:  # prior TTL window still open: honor it
                    leases[tbl] = (owner, expiry, int(fence))

        def _persist() -> None:
            if not persist_path:
                return
            tmp = f"{persist_path}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump({"leases": {k: list(v)
                                       for k, v in leases.items()},
                            "fences": fences}, f)
            os.replace(tmp, persist_path)

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self):
                try:
                    line = self.rfile.readline().decode().strip()
                except Exception:
                    return
                parts = line.split()
                resp = "ERR"
                with guard:
                    now = time.time()
                    if parts[:1] == ["PING"]:
                        resp = "PONG"
                    elif len(parts) == 4 and parts[0] == "ACQUIRE":
                        _, tbl, owner, ttl = parts
                        held = leases.get(tbl)
                        if held is not None and held[1] >= now \
                                and held[0] == owner:
                            # renewal: refresh TTL, keep the fence
                            leases[tbl] = (owner, now + float(ttl),
                                           held[2])
                            _persist()
                            resp = f"OK {held[2]}"
                        elif held is None or held[1] < now:
                            fence = fences.get(tbl, 0) + 1
                            fences[tbl] = fence
                            leases[tbl] = (owner, now + float(ttl), fence)
                            _persist()
                            resp = f"OK {fence}"
                        else:
                            resp = f"HELD {held[0]}"
                    elif len(parts) == 4 and parts[0] == "CHECK":
                        _, tbl, owner, fence = parts
                        held = leases.get(tbl)
                        resp = ("OK" if held is not None
                                and held[1] >= now and held[0] == owner
                                and str(held[2]) == fence else "NO")
                    elif len(parts) == 3 and parts[0] == "RELEASE":
                        _, tbl, owner = parts
                        held = leases.get(tbl)
                        if held is not None and held[0] == owner:
                            del leases[tbl]
                            _persist()
                            resp = "OK"
                        else:
                            resp = "OK" if held is None else "NOTOWNER"
                try:
                    self.wfile.write((resp + "\n").encode())
                except Exception:
                    pass

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class TCPLockProvider(LockProvider):
    """NETWORKED provider: mutual exclusion through a :class:`LeaseServer`
    reachable by every writer host — the out-of-the-box multi-host
    arbiter (the SQLite provider's shape, but over a socket instead of
    a shared filesystem). One short-lived connection per request; the
    arbiter's lease TTL (``lease_s``) is the crash-recovery clock.

    Two defenses against the lost-lease double-publish (a critical
    section outliving ``lease_s``, or an arbiter restart dropping
    in-memory leases):

    * a HEARTBEAT thread renews the lease every ``lease_s/3`` while the
      handle is held, so a live holder's lease never expires no matter
      how long the commit runs;
    * :meth:`validate` checks the grant's FENCING token with the
      arbiter (``CHECK``) — the commit protocol calls it immediately
      before the atomic publish, so a holder whose lease was lost
      anyway (arbiter restart without ``persist_path``, network
      partition longer than the TTL) fails its commit instead of
      racing the successor."""

    supports_scopes = True

    def __init__(self, host: str, port: int, lease_s: float = 60.0,
                 poll_s: float = 0.05):
        self.host, self.port = host, port
        self.lease_s = lease_s
        self.poll_s = poll_s

    def _rpc(self, line: str) -> str:
        import socket

        with socket.create_connection((self.host, self.port),
                                      timeout=10.0) as s:
            s.sendall((line + "\n").encode())
            buf = b""
            while not buf.endswith(b"\n"):
                chunk = s.recv(1024)
                if not chunk:
                    break
                buf += chunk
        return buf.decode().strip()

    def acquire(self, meta_dir: str, table_path: str,
                timeout_s: float) -> dict:
        import base64
        import socket
        import threading
        import uuid

        tbl = base64.urlsafe_b64encode(table_path.encode()).decode()
        owner = (f"{socket.gethostname()}:{os.getpid()}:"
                 f"{uuid.uuid4().hex[:8]}")
        deadline = time.time() + timeout_s
        while True:
            resp = self._rpc(f"ACQUIRE {tbl} {owner} {self.lease_s}")
            if resp.startswith("OK"):
                # legacy arbiters reply bare "OK" (no fence): the
                # heartbeat still renews and flags HELD renewals as
                # lost, but validate() has NO fence to CHECK — there is
                # no publish-path validation against such arbiters (see
                # validate())
                _, _, fence = resp.partition(" ")
                handle = {"tbl": tbl, "owner": owner,
                          "fence": fence.strip() or None,
                          "lost": False,
                          "stop": threading.Event()}
                t = threading.Thread(target=self._heartbeat,
                                     args=(handle,), daemon=True)
                handle["thread"] = t
                t.start()
                return handle
            if time.time() > deadline:
                raise TimeoutError(f"commit lock timeout on {table_path}")
            time.sleep(self.poll_s)

    def _heartbeat(self, handle: dict) -> None:
        """Renew the lease every lease_s/3 while held. A renewal that
        comes back HELD, or re-granted under a DIFFERENT fence (we
        expired and re-won — a successor may have published meanwhile),
        marks the handle lost; validate() then fails the commit."""
        interval = max(self.lease_s / 3.0, 0.05)
        while not handle["stop"].wait(interval):
            try:
                resp = self._rpc(f"ACQUIRE {handle['tbl']} "
                                 f"{handle['owner']} {self.lease_s}")
            except OSError:
                continue  # arbiter transiently unreachable: keep trying
            if not resp.startswith("OK"):
                handle["lost"] = True
                return
            _, _, fence = resp.partition(" ")
            if handle["fence"] is not None \
                    and fence.strip() != handle["fence"]:
                handle["lost"] = True
                return

    def validate(self, handle: dict) -> bool:
        if handle["lost"]:
            return False
        if handle["fence"] is None:
            # Legacy arbiter (bare-OK grants, no fence): publish-path
            # fencing is INERT — we return True without issuing any
            # CHECK, so the heartbeat's lost-detection (HELD on renewal)
            # is the only guard. Deployments needing the full guarantee
            # must run a fence-issuing LeaseServer.
            return True
        try:
            return self._rpc(f"CHECK {handle['tbl']} {handle['owner']} "
                             f"{handle['fence']}") == "OK"
        except OSError:
            # arbiter unreachable: can't prove the lease is live — fail
            # the publish rather than risk racing a successor
            return False

    def release(self, handle: dict) -> None:
        handle["stop"].set()
        # Join the heartbeat BEFORE the RELEASE RPC: a renewal already
        # in flight could otherwise land at the arbiter AFTER the
        # release, re-granting the lease to this (gone) owner under a
        # new fence — the heartbeat would then see the fence change,
        # mark the handle lost, and exit WITHOUT releasing, leaving an
        # orphaned lease that blocks every writer for up to lease_s.
        t = handle.get("thread")
        if t is not None and t is not threading.current_thread():
            t.join()
        try:
            self._rpc(f"RELEASE {handle['tbl']} {handle['owner']}")
        except OSError:
            # arbiter unreachable at release time: the lease's TTL will
            # expire it — liveness is preserved, nothing to undo locally
            pass


# Installed at the END of the module: an env spec naming a class from
# THIS module (e.g. starlake_spark.locking:TCPLockProvider, the
# documented multi-host deployment) resolves through
# importlib.import_module("starlake_spark.locking"), which returns the
# partially-initialized module if _from_env ran mid-file — classes
# defined below the call point were simply absent.
_from_env()


if __name__ == "__main__":  # pragma: no cover - manual deployment entry
    import sys

    srv = LeaseServer("0.0.0.0",
                      int(sys.argv[1]) if len(sys.argv) > 1 else 7878)
    print(f"starlake lease server on {srv.host}:{srv.port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.shutdown()

"""DDL lease protocol on stores without atomic exclusive create.

The silent-corruption window this closes: on S3-class stores,
``create_exclusive`` is exists-check-then-PUT, so two drivers issuing
concurrent schema DDL against the same table root could BOTH "acquire"
the lockfile and the read-modify-write of the schema sidecar would drop
one driver's op (last writer wins). evolve._ddl_lock now selects the
uuid-stamped lease protocol (stake with last-writer-wins PUT,
read-back-verify twice, heartbeat while held, takeover only after a
contender observes the same lease bytes unchanged for a full grace
window on its OWN monotonic clock — no cross-machine clock comparison)
whenever ``fs.supports_atomic_create`` is False.

Every test here drives the protocol through the FS ADAPTER with a
simulated non-atomic store: a LocalFS subclass whose create_exclusive
deliberately check-then-creates with a sleep in the TOCTOU window and
which reports supports_atomic_create=False — exactly the S3A regime.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from kubenetmon_spark.evolve import (
    _UNAVAILABLE,
    _UNREADABLE,
    _acquire_lease,
    _ddl_lock,
    _lock_path,
    _read_lease,
    add_column,
    schema_log,
)
from kubenetmon_spark.fs import LocalFS


class NonAtomicFS(LocalFS):
    """The S3A regime: create_exclusive has a real TOCTOU window (both
    racers can pass the exists check) and the adapter says so."""

    def __init__(self, toctou_sleep_s: float = 0.0) -> None:
        self._toctou = toctou_sleep_s

    def supports_atomic_create(self, path: str) -> bool:
        return False

    def create_exclusive(self, path: str) -> None:
        if os.path.exists(path):
            raise FileExistsError(path)
        if self._toctou:
            time.sleep(self._toctou)  # widen the check-then-create window
        with open(path, "wb"):
            pass


@pytest.fixture()
def nonatomic(monkeypatch):
    """Route every evolve FS lookup through the simulated store."""
    fs = NonAtomicFS(toctou_sleep_s=0.05)
    import kubenetmon_spark.fs as fsm

    monkeypatch.setattr(fsm, "get_fs", lambda path, spark=None: fs)
    return fs


def test_broken_primitive_demonstrated(tmp_path):
    # Sanity: the simulated store's create_exclusive really IS broken —
    # two racers in the TOCTOU window both succeed. This is what the
    # lease protocol exists to not depend on.
    fs = NonAtomicFS(toctou_sleep_s=0.2)
    lock = str(tmp_path / "l")
    wins = []

    def racer():
        try:
            fs.create_exclusive(lock)
            wins.append(1)
        except FileExistsError:
            pass

    ts = [threading.Thread(target=racer) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 2  # both "won" — create_exclusive is unusable here


def test_two_driver_race_one_winner_one_loud_loser(nonatomic, tmp_path):
    # Two drivers contend for the lease; the winner holds it for longer
    # than the loser's timeout. Exactly one proceeds, the other raises
    # TimeoutError (loud), and nothing fails open.
    tbl = str(tmp_path / "t")
    outcome: dict[str, object] = {}
    entered = threading.Event()
    release = threading.Event()

    def winner():
        with _ddl_lock(tbl, timeout_s=5.0):
            entered.set()
            release.wait(10.0)
        outcome["winner"] = "ok"

    def loser():
        entered.wait(10.0)
        try:
            with _ddl_lock(tbl, timeout_s=0.5):
                outcome["loser"] = "entered"  # must not happen
        except TimeoutError:
            outcome["loser"] = "timeout"

    tw, tl = threading.Thread(target=winner), threading.Thread(target=loser)
    tw.start()
    tl.start()
    tl.join(15.0)
    release.set()
    tw.join(15.0)
    assert outcome == {"winner": "ok", "loser": "timeout"}
    # winner's release removed the lease
    assert not os.path.exists(_lock_path(tbl))


def test_concurrent_acquires_serialize(nonatomic, tmp_path):
    # N threads hammer the lease; a shared counter verifies mutual
    # exclusion (never two holders), and every thread eventually runs.
    lock = str(tmp_path / "t") + "._ddl.lock"
    inside = []
    overlap = []
    mu = threading.Lock()

    def worker(i):
        hold = _acquire_lease(nonatomic, lock, timeout_s=30.0)
        with mu:
            inside.append(i)
            if len(inside) > 1:
                overlap.append(tuple(inside))
        time.sleep(0.05)
        with mu:
            inside.remove(i)
        hold.release()

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60.0)
    assert overlap == []  # never two concurrent holders


def test_silent_dead_owner_taken_over_after_grace(nonatomic, tmp_path, monkeypatch):
    # A crashed driver's lease never changes; a contender that observes
    # the SAME bytes for a full grace window (its own monotonic clock —
    # immune to cross-machine wall-clock skew) takes over.
    import kubenetmon_spark.evolve as ev

    monkeypatch.setattr(ev, "_LEASE_GRACE_S", 0.3)
    lock = str(tmp_path / "t") + "._ddl.lock"
    stale = {"owner": "deadbeef", "acquired_unix": time.time() - 3600, "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(stale, f)
    hold = _acquire_lease(nonatomic, lock, timeout_s=5.0)
    got = _read_lease(nonatomic, lock)
    assert isinstance(got, dict) and got["owner"] == hold.owner != "deadbeef"
    hold.release()
    assert not os.path.exists(lock)


def test_dead_owner_not_claimed_within_default_timeout(nonatomic, tmp_path):
    # With the production grace (60s) a dead lease fails LOUD inside a
    # short acquire timeout instead of being silently claimed — the
    # operator chooses between waiting out the grace and removing it.
    lock = str(tmp_path / "t") + "._ddl.lock"
    stale = {"owner": "deadbeef", "acquired_unix": time.time() - 3600, "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(stale, f)
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(nonatomic, lock, timeout_s=0.6)
    got = _read_lease(nonatomic, lock)
    assert isinstance(got, dict) and got["owner"] == "deadbeef"  # untouched


def test_release_leaves_taken_over_lease_alone(nonatomic, tmp_path):
    # After a takeover, the OLD owner's release must not delete the
    # NEW owner's lease.
    from kubenetmon_spark.evolve import _LeaseHold

    lock = str(tmp_path / "t") + "._ddl.lock"
    new_lease = {"owner": "newowner", "acquired_unix": time.time(), "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(new_lease, f)
    old = _LeaseHold(nonatomic, lock, "oldowner")
    old.release()
    got = _read_lease(nonatomic, lock)
    assert isinstance(got, dict) and got["owner"] == "newowner"


def test_fresh_lease_is_not_taken_over(nonatomic, tmp_path):
    # A live (unexpired) foreign lease blocks acquisition until timeout.
    lock = str(tmp_path / "t") + "._ddl.lock"
    live = {"owner": "alive", "acquired_unix": time.time(), "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(live, f)
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(nonatomic, lock, timeout_s=0.5)
    got = _read_lease(nonatomic, lock)
    assert isinstance(got, dict) and got["owner"] == "alive"  # untouched


def test_unparseable_lease_times_out_loud_never_open(nonatomic, tmp_path):
    # A persistently truncated lease (the HDFS short-read shape) is
    # held-by-unknown: never staked over, never taken over — a loud
    # TimeoutError naming the lock, and the bytes stay untouched.
    lock = str(tmp_path / "t") + "._ddl.lock"

    class AlwaysGarbageFS(NonAtomicFS):
        def read_bytes(self, path: str) -> bytes:
            return b'{"owner": "trunc'  # short read, forever

    fs = AlwaysGarbageFS()
    with open(lock, "w") as f:
        f.write("ignored")
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(fs, lock, timeout_s=0.8)
    with open(lock) as f:
        assert f.read() == "ignored"  # never overwritten


def test_transient_read_errors_do_not_fail_open(nonatomic, tmp_path):
    # One transient read error (S3 503 throttle) over a LIVE foreign
    # lease must read as held-by-unknown, not absent — a contender must
    # never stake over it.
    lock = str(tmp_path / "t") + "._ddl.lock"
    live = {"owner": "alive", "acquired_unix": time.time(), "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(live, f)

    class ThrottledFS(NonAtomicFS):
        def read_bytes(self, path: str) -> bytes:
            raise OSError("SlowDown: please reduce your request rate")

    fs = ThrottledFS()
    assert _read_lease(fs, lock) is _UNAVAILABLE
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(fs, lock, timeout_s=0.5)
    got = _read_lease(nonatomic, lock)  # through a healthy adapter
    assert isinstance(got, dict) and got["owner"] == "alive"


def test_failed_reads_never_enable_restake(nonatomic, tmp_path):
    # The finding this pins: a contender that already staked (lost the
    # race) and then suffers throttled READS must not treat the
    # unreadable state as race wreckage and overwrite the live winner.
    lock = str(tmp_path / "t") + "._ddl.lock"
    live = {"owner": "alive", "acquired_unix": time.time(), "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(live, f)

    class StakeThenThrottleFS(NonAtomicFS):
        """First read shows the live lease misread as a lost race is
        not even needed — simply make every read after construction
        fail, and count writes."""

        def __init__(self):
            super().__init__()
            self.writes = 0

        def read_bytes(self, path: str) -> bytes:
            raise OSError("SlowDown")

        def write_bytes_atomic(self, path: str, data: bytes) -> None:
            self.writes += 1
            super().write_bytes_atomic(path, data)

    fs = StakeThenThrottleFS()
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(fs, lock, timeout_s=1.2)
    # _UNAVAILABLE never reads as absent or as wreckage: zero writes
    assert fs.writes == 0
    got = _read_lease(nonatomic, lock)
    assert isinstance(got, dict) and got["owner"] == "alive"


def test_foreign_empty_lockfile_never_overwritten(nonatomic, tmp_path):
    # An EMPTY lockfile (the atomic-regime exclusive-create artifact, or
    # a leftover from a mixed plain-path/URI deployment) is
    # held-by-unknown: the lease branch must not stake over it.
    lock = str(tmp_path / "t") + "._ddl.lock"
    open(lock, "wb").close()
    assert _read_lease(nonatomic, lock) is _UNREADABLE
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(nonatomic, lock, timeout_s=0.5)
    assert os.path.getsize(lock) == 0  # untouched


def test_heartbeat_defeats_observation_and_stops_after_takeover(
    nonatomic, tmp_path, monkeypatch
):
    import kubenetmon_spark.evolve as ev

    monkeypatch.setattr(ev, "_LEASE_HEARTBEAT_S", 0.1)
    monkeypatch.setattr(ev, "_LEASE_GRACE_S", 0.5)
    lock = str(tmp_path / "t") + "._ddl.lock"
    hold = _acquire_lease(nonatomic, lock, timeout_s=5.0)
    # a live holder heartbeats faster than the grace window, so a
    # contender can NEVER complete an unchanged-observation — even
    # though it watches for longer than the grace
    with pytest.raises(TimeoutError, match="lease"):
        _acquire_lease(nonatomic, lock, timeout_s=1.2)
    first = _read_lease(nonatomic, lock)
    time.sleep(0.3)
    second = _read_lease(nonatomic, lock)
    assert second["owner"] == hold.owner
    assert second["acquired_unix"] > first["acquired_unix"]  # beating
    # takeover: a usurper replaces the lease; the old heartbeat must
    # detect it, mark the hold lost, and never clobber the usurper.
    # An in-flight beat's read-then-stamp can clobber one atomic
    # usurper write (sub-ms window at 0.1s period) — rewrite until the
    # beat observes it, which is the same converging behavior a real
    # usurper's own heartbeat provides.
    usurper = {"owner": "usurper", "acquired_unix": time.time(), "ttl_s": 60.0}
    deadline = time.monotonic() + 10.0
    while not hold.lost and time.monotonic() < deadline:
        nonatomic.write_json_atomic(lock, usurper)
        time.sleep(0.15)
    assert hold.lost is True
    got = _read_lease(nonatomic, lock)
    assert got["owner"] == "usurper"
    with pytest.raises(Exception):
        hold.fence()
    hold.release()
    assert _read_lease(nonatomic, lock)["owner"] == "usurper"  # left alone


def test_heartbeat_survives_transient_failures(nonatomic, tmp_path, monkeypatch):
    # One throttled read or one failed stamp PUT must not kill the
    # heartbeat or spuriously mark the hold lost (a minutes-long
    # materialization would be wasted and its lease would freeze).
    import kubenetmon_spark.evolve as ev

    monkeypatch.setattr(ev, "_LEASE_HEARTBEAT_S", 0.05)
    lock = str(tmp_path / "t") + "._ddl.lock"

    class FlakyFS(NonAtomicFS):
        def __init__(self):
            super().__init__()
            self.fail_reads = 0
            self.fail_writes = 0

        def read_bytes(self, path: str) -> bytes:
            if self.fail_reads > 0:
                self.fail_reads -= 1
                raise OSError("SlowDown")
            return super().read_bytes(path)

        def write_bytes_atomic(self, path: str, data: bytes) -> None:
            if self.fail_writes > 0:
                self.fail_writes -= 1
                raise OSError("SlowDown")
            super().write_bytes_atomic(path, data)

    fs = FlakyFS()
    hold = _acquire_lease(fs, lock, timeout_s=5.0)
    first = _read_lease(fs, lock)
    fs.fail_reads = 2   # two throttled beats
    fs.fail_writes = 1  # one failed stamp
    time.sleep(0.6)     # ~12 beat ticks
    assert hold.lost is False
    latest = _read_lease(fs, lock)
    assert latest["owner"] == hold.owner
    assert latest["acquired_unix"] > first["acquired_unix"]  # still beating
    hold.release()
    assert not os.path.exists(lock)


def test_dead_owner_reclaimable_through_public_alter_api(
    nonatomic, spark, tmp_path, monkeypatch
):
    # The takeover path must be REACHABLE from the public DDL API: an
    # ALTER with lock_timeout_s > grace waits out a crashed driver's
    # lease instead of requiring manual lockfile surgery.
    import kubenetmon_spark.evolve as ev

    monkeypatch.setattr(ev, "_LEASE_GRACE_S", 0.3)
    tbl = str(tmp_path / "t")
    spark.range(5).selectExpr("id", "id AS v").write.parquet(tbl)
    lock = _lock_path(tbl)
    stale = {"owner": "crashed", "acquired_unix": time.time() - 9999, "ttl_s": 60.0}
    with open(lock, "w") as f:
        json.dump(stale, f)
    add_column(tbl, "c", "int", lock_timeout_s=5.0)
    assert [o["op"] for o in schema_log(tbl)] == ["add"]
    assert not os.path.exists(lock)


def test_fence_detects_ttl_takeover(nonatomic, tmp_path):
    # A driver that stalls past the TTL inside the critical section
    # must NOT publish: the fence re-reads the lease and raises loudly
    # when ownership moved.
    from kubenetmon_spark.evolve import DdlLeaseLost

    tbl = str(tmp_path / "t")
    lock = _lock_path(tbl)
    with _ddl_lock(tbl, timeout_s=5.0) as fence:
        fence()  # still ours
        # simulate a takeover while stalled: another driver's lease
        with open(lock, "w") as f:
            json.dump(
                {"owner": "usurper", "acquired_unix": time.time(), "ttl_s": 60.0},
                f,
            )
        with pytest.raises(DdlLeaseLost, match="taken over|lost to"):
            fence()
    # release must have left the usurper's lease alone
    got = _read_lease(nonatomic, lock)
    assert got is not None and got["owner"] == "usurper"
    os.unlink(lock)


def test_fence_noop_on_atomic_store(tmp_path):
    # LocalFS (atomic create): fence is a no-op, lock behavior unchanged.
    tbl = str(tmp_path / "t")
    with _ddl_lock(tbl, timeout_s=5.0) as fence:
        fence()
        assert os.path.exists(_lock_path(tbl))
    assert not os.path.exists(_lock_path(tbl))


def test_append_op_aborts_on_takeover(nonatomic, spark, tmp_path, monkeypatch):
    # End-to-end: add_column whose validation stalls past a takeover
    # must abort WITHOUT writing, and the log must keep only the new
    # owner's view.
    import kubenetmon_spark.evolve as ev

    tbl = str(tmp_path / "t")
    spark.range(5).selectExpr("id", "id AS v").write.parquet(tbl)
    lock = _lock_path(tbl)
    real_validated = ev._validated

    def stalling_validated(log, path, op):
        out = real_validated(log, path, op)
        with open(lock, "w") as f:  # takeover lands mid-validation
            json.dump(
                {"owner": "usurper", "acquired_unix": time.time(), "ttl_s": 60.0},
                f,
            )
        return out

    monkeypatch.setattr(ev, "_validated", stalling_validated)
    with pytest.raises(ev.DdlLeaseLost):
        add_column(tbl, "c", "int")
    monkeypatch.setattr(ev, "_validated", real_validated)
    os.unlink(lock)
    assert schema_log(tbl) == []  # nothing published by the loser


def test_two_driver_alter_race_end_to_end(nonatomic, spark, tmp_path):
    # The actual corruption scenario: two drivers ALTER the same table
    # concurrently on the non-atomic store. With the lease both ops
    # serialize — the schema log holds BOTH columns, nothing lost.
    tbl = str(tmp_path / "t")
    spark.range(0, 10).selectExpr("id", "id * 2 AS v").write.parquet(tbl)

    errs = []

    def alter(col):
        try:
            add_column(tbl, col, "int")
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    ta = threading.Thread(target=alter, args=("c_a",))
    tb = threading.Thread(target=alter, args=("c_b",))
    ta.start()
    tb.start()
    ta.join(60.0)
    tb.join(60.0)
    assert errs == []
    added = {o["col"] for o in schema_log(tbl) if o["op"] == "add"}
    assert added == {"c_a", "c_b"}  # no lost update
    assert not os.path.exists(_lock_path(tbl))

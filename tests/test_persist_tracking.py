"""Contract tests for session.py's tracked-persist snapshot/release.

Round-10 advice closed two latent traps:
1. release_new_persists called with a PLAIN set (an external caller's
   own id set, not a _PersistSnapshot) must release NO tracked
   DataFrames — the old getattr(before, 'n_tracked', 0) default popped
   every tracked persist ever created, violating the documented
   'must not drop OTHER work's caches' contract.
2. _TRACKED_PERSISTS must not grow without bound when persist_tracked
   runs outside a snapshot/release harness: stopped-session entries
   are pruned on append.

Release matches tracked entries by object identity against the
snapshot's prefix, so pruning can never shift which entries a release
drops.
"""

from __future__ import annotations

from pyspark import StorageLevel

from cometbft_log_etl_spark import session as sess


def _tracked_len() -> int:
    return len(sess._TRACKED_PERSISTS)


def test_plain_set_releases_no_tracked_dataframes(spark):
    df = sess.persist_tracked(spark.range(10))
    df.count()
    try:
        n0 = _tracked_len()
        # a caller-built plain set (even empty) must leave tracked
        # persists alone — only the raw-RDD sweep may run, and our df's
        # RDD id IS in `before` here so nothing at all is released
        before = set(
            e for e in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        sess.release_new_persists(spark, before)
        assert _tracked_len() == n0
        assert df.storageLevel != StorageLevel.NONE
    finally:
        df.unpersist(True)
        sess._TRACKED_PERSISTS[:] = [t for t in sess._TRACKED_PERSISTS if t is not df]


def test_snapshot_release_drops_only_new_persists(spark):
    old = sess.persist_tracked(spark.range(5))
    old.count()
    try:
        before = sess.persistent_rdd_ids(spark)
        new = sess.persist_tracked(spark.range(7))
        new.count()
        released = sess.release_new_persists(spark, before)
        assert released >= 1
        assert new.storageLevel == StorageLevel.NONE
        assert old.storageLevel != StorageLevel.NONE
        assert any(t is old for t in sess._TRACKED_PERSISTS)
        assert not any(t is new for t in sess._TRACKED_PERSISTS)
    finally:
        sess._TRACKED_PERSISTS[:] = [t for t in sess._TRACKED_PERSISTS if t is not old]
        old.unpersist(True)


def test_prune_survives_outstanding_snapshot(spark):
    """Pruning dead entries between snapshot and release must not change
    which live entries the release drops (identity matching)."""
    keep = sess.persist_tracked(spark.range(3))
    keep.count()
    before = sess.persistent_rdd_ids(spark)
    # simulate a stopped-session entry below the watermark by injecting
    # a dead sentinel the pruner recognizes (no sparkSession attr)
    class _Dead:
        pass

    sess._TRACKED_PERSISTS.insert(0, _Dead())
    new = sess.persist_tracked(spark.range(4))  # append prunes the sentinel
    new.count()
    assert not any(isinstance(t, _Dead) for t in sess._TRACKED_PERSISTS)
    try:
        sess.release_new_persists(spark, before)
        assert new.storageLevel == StorageLevel.NONE
        assert keep.storageLevel != StorageLevel.NONE
    finally:
        sess._TRACKED_PERSISTS[:] = [t for t in sess._TRACKED_PERSISTS if t is not keep]
        keep.unpersist(True)

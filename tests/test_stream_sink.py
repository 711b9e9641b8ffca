"""Streaming-sink contract: the dormant ParseStream entry wired to the
reference's storage destinations (streaming/sink.py). The lake path must
converge to exactly the batch pipeline's rows (file-sink exactly-once);
the Mongo path must keep the reference's unordered batched inserts while
making epoch replays idempotent (delete-then-insert per epoch)."""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import functions as F

from cometbft_log_etl_spark.pipeline import etl_events
from cometbft_log_etl_spark.sinks import MongoResultSink
from cometbft_log_etl_spark.streaming.sink import (
    stream_events_to_lake,
    stream_events_to_mongo,
)

from .fixtures import build_scenario, write_logs
from .test_sinks import FakeClient, FakeCollection, FakeDb


class EpochFakeCollection(FakeCollection):
    def insert_many(self, docs, ordered=True):
        assert ordered is False, "reference uses unordered bulk inserts (mongo.go:91)"
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, f"{os.getpid()}_{uuid.uuid4().hex}.json")
        with open(path, "w") as fh:
            json.dump(docs, fh, default=str)  # events carry datetimes

    def delete_many(self, flt):
        for p in glob.glob(os.path.join(self.dir, "*.json")):
            with open(p) as fh:
                docs = json.load(fh)
            kept = [d for d in docs if not all(d.get(k) == v for k, v in flt.items())]
            if kept:
                with open(p, "w") as fh:
                    json.dump(kept, fh)
            else:
                os.remove(p)


class EpochFakeDb(FakeDb):
    def __getitem__(self, name: str) -> EpochFakeCollection:
        return EpochFakeCollection(self.root, self.db, name)


class EpochFakeClient(FakeClient):
    def __getitem__(self, db: str) -> EpochFakeDb:
        return EpochFakeDb(self.root, db)


class EpochFakeFactory:
    """Picklable factory: executors reconstruct it from (root,)."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, uri: str) -> EpochFakeClient:
        return EpochFakeClient(self.root, uri)


def _all_docs(root: str, db: str, name: str) -> list[dict]:
    docs: list[dict] = []
    for p in glob.glob(os.path.join(root, db, name, "*.json")):
        with open(p) as fh:
            docs.extend(json.load(fh))
    return docs


def test_stream_lake_matches_batch_pipeline(spark, tmp_path):
    """availableNow drain → the lake holds exactly the batch pipeline's
    rows (identity-stamped), hive-partitioned on event_date, and a
    restart from the same checkpoint with no new input appends nothing
    (file-sink exactly-once)."""
    d = str(tmp_path / "logs")
    write_logs(build_scenario(heights=4), d)
    out = str(tmp_path / "lake")

    q, root = stream_events_to_lake(
        spark, d, out, sim_id="sim_test", partition_by_date=True
    )
    assert q.awaitTermination(180)
    assert root == f"{out}/sim_test"
    assert os.path.isdir(f"{root}/_checkpoints/events")
    assert glob.glob(f"{root}/events/event_date=*"), "expected hive partition dirs"

    batch = etl_events(spark, d)
    got = spark.read.parquet(f"{root}/events")
    assert set(got.columns) - {"event_date"} == set(batch.columns)
    proj = got.select(*batch.columns)
    assert proj.count() == batch.count() > 0
    assert proj.exceptAll(batch).count() == 0 and batch.exceptAll(proj).count() == 0

    # restart: same checkpoint, no new files → no duplicate rows
    q2, root2 = stream_events_to_lake(
        spark, d, out, sim_id="sim_test", partition_by_date=True
    )
    assert root2 == root and q2.awaitTermination(180)
    assert spark.read.parquet(f"{root}/events").count() == batch.count()


def test_stream_mongo_epochs_idempotent(spark, tmp_path):
    """foreachBatch → MongoResultSink.store_epoch: every doc lands
    epoch-stamped in reference-sized unordered batches, multiple epochs
    under maxFilesPerTrigger=1, and a replayed epoch overwrites itself
    instead of duplicating."""
    d = str(tmp_path / "logs")
    write_logs(build_scenario(heights=3), d)
    root = str(tmp_path / "mongo")
    sink = MongoResultSink(
        "mongodb://fake:27017",
        "sim_stream",
        batch_size=7,
        client_factory=EpochFakeFactory(root),
    )

    q = stream_events_to_mongo(
        spark,
        d,
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(180)

    docs = _all_docs(root, "sim_stream", "events")
    batch_n = etl_events(spark, d).count()
    assert len(docs) == batch_n > 0
    assert all("_epoch" in doc and "_ingest_id" in doc for doc in docs)
    assert len({doc["_ingest_id"] for doc in docs}) == 1  # one query, one scope
    # one epoch per input file under maxFilesPerTrigger=1
    assert len({doc["_epoch"] for doc in docs}) >= 2
    for p in glob.glob(os.path.join(root, "sim_stream", "events", "*.json")):
        with open(p) as fh:
            assert len(json.load(fh)) <= 7

    # fresh-checkpoint isolation: epoch 0 under a DIFFERENT ingest id
    # must not delete the first ingestion's epoch-0 documents...
    replay = spark.range(5).select(F.col("id").alias("replayed"))
    sink.store_epoch("events", replay, 0, ingest_id="other-ckpt")
    c1 = len(_all_docs(root, "sim_stream", "events"))
    assert c1 == batch_n + 5
    # ...while a replay WITHIN that scope overwrites itself
    sink.store_epoch("events", replay, 0, ingest_id="other-ckpt")
    assert len(_all_docs(root, "sim_stream", "events")) == c1


def test_ingest_id_stable_across_working_directories(tmp_path, monkeypatch):
    """URI checkpoint locations must yield the same ingest id regardless
    of the driver's cwd (abspath on an s3a:// string would prepend the
    cwd and break epoch-replay idempotence on restart); local paths
    normalize so relative/absolute spellings agree."""
    from cometbft_log_etl_spark.streaming.sink import ingest_id_for

    uri = "s3a://bucket/ckpts/run1/"
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    monkeypatch.chdir(tmp_path / "a")
    id_a = ingest_id_for(uri)
    rel_a = ingest_id_for("ckpt")
    monkeypatch.chdir(tmp_path / "b")
    assert ingest_id_for(uri) == id_a
    assert ingest_id_for("ckpt") != rel_a  # different dirs, different scope
    # relative and absolute spellings of the SAME local dir agree
    assert ingest_id_for("ckpt") == ingest_id_for(str(tmp_path / "b" / "ckpt"))
    # trailing slash is normalized in both schemes
    assert ingest_id_for(uri) == ingest_id_for(uri.rstrip("/"))
    # single-slash scheme URIs (Hadoop Path.toString renders local URIs
    # as file:/tmp/ckpt) must also be cwd-independent
    single = "file:/tmp/ckpts/run1"
    monkeypatch.chdir(tmp_path / "a")
    id_s = ingest_id_for(single)
    monkeypatch.chdir(tmp_path / "b")
    assert ingest_id_for(single) == id_s
    # a relative LOCAL dir whose first segment contains a colon is NOT
    # a URI (round-8 advice: 'ckpt:v2/run' launched from two cwds must
    # not share an ingest id — that would merge two distinct
    # checkpoints' epoch-replay idempotence scopes)
    monkeypatch.chdir(tmp_path / "a")
    id_colon_a = ingest_id_for("ckpt:v2/run")
    monkeypatch.chdir(tmp_path / "b")
    assert ingest_id_for("ckpt:v2/run") != id_colon_a
    # unknown scheme WITH authority marker still counts as a URI
    fancy = "myfs://cluster/ckpts/run1"
    monkeypatch.chdir(tmp_path / "a")
    id_f = ingest_id_for(fancy)
    monkeypatch.chdir(tmp_path / "b")
    assert ingest_id_for(fancy) == id_f

"""Snapshot-versioned warehouse tables (snapshots.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hg_data_pipelines_spark.snapshots import (
    expire_snapshots,
    read_table_snapshot,
    snapshot_versions,
    write_table_snapshot,
)


class TestSnapshots:
    def test_time_travel_reads_old_version(self, spark, tmp_path):
        wh = str(tmp_path)
        v1 = write_table_snapshot(
            spark.range(3).select("id", F.lit("old").alias("tag")), wh, "t"
        )
        v2 = write_table_snapshot(
            spark.range(5).select("id", F.lit("new").alias("tag")), wh, "t"
        )
        assert (v1, v2) == (1, 2)
        assert snapshot_versions(wh, "t") == [1, 2]
        # latest by default; pinned version sees the immutable past
        assert read_table_snapshot(spark, wh, "t").count() == 5
        old = read_table_snapshot(spark, wh, "t", version=1)
        assert old.count() == 3
        assert old.select("tag").distinct().collect()[0]["tag"] == "old"

    def test_uncommitted_data_dir_is_invisible(self, spark, tmp_path):
        wh = str(tmp_path)
        write_table_snapshot(spark.range(2), wh, "t")
        # simulate a crashed writer: data dir exists, no manifest
        os.makedirs(os.path.join(wh, "t", "data", "v9"))
        assert snapshot_versions(wh, "t") == [1]
        assert read_table_snapshot(spark, wh, "t").count() == 2

    def test_expire_keeps_latest(self, spark, tmp_path):
        wh = str(tmp_path)
        for n in (2, 4, 6):
            write_table_snapshot(spark.range(n), wh, "t")
        expired = expire_snapshots(wh, "t", keep_latest=2)
        assert expired == [1]
        assert snapshot_versions(wh, "t") == [2, 3]
        assert read_table_snapshot(spark, wh, "t", version=2).count() == 4
        with pytest.raises(FileNotFoundError):
            read_table_snapshot(spark, wh, "t", version=1)
        # expired data files are gone from disk
        assert not os.path.isdir(os.path.join(wh, "t", "data", "v1"))

    def test_versions_continue_after_expiry(self, spark, tmp_path):
        wh = str(tmp_path)
        for n in (1, 2, 3):
            write_table_snapshot(spark.range(n), wh, "t")
        expire_snapshots(wh, "t", keep_latest=1)
        v = write_table_snapshot(spark.range(9), wh, "t")
        assert v == 4
        assert read_table_snapshot(spark, wh, "t").count() == 9


class TestCompactSnapshot:
    def test_compaction_lands_as_new_version(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import compact_snapshot

        wh = str(tmp_path)
        # many small files in v1
        write_table_snapshot(spark.range(1000).repartition(16), wh, "t")
        v = compact_snapshot(spark, wh, "t", target_file_bytes=10**9)
        assert v == 2
        assert snapshot_versions(wh, "t") == [1, 2]

        def n_files(version):
            d = os.path.join(wh, "t", "data", f"v{version}")
            return sum(
                1
                for root, _dirs, files in os.walk(d)
                for f in files
                if f.endswith(".parquet")
            )

        assert n_files(1) == 16
        assert n_files(2) < 16
        # content identical across versions; v1 still readable (time travel)
        a = sorted(r["id"] for r in read_table_snapshot(spark, wh, "t", 1).collect())
        b = sorted(r["id"] for r in read_table_snapshot(spark, wh, "t", 2).collect())
        assert a == b


class TestSnapshotDiff:
    def test_insert_update_delete_classified(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        v1_df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            ["id", "name", "score"],
        )
        v1 = write_table_snapshot(v1_df, wh, "t")
        v2_df = spark.createDataFrame(
            # 1 unchanged, 2 updated, 3 deleted, 4 inserted
            [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)],
            ["id", "name", "score"],
        )
        v2 = write_table_snapshot(v2_df, wh, "t")
        got = {
            r["id"]: r["change_type"]
            for r in snapshot_diff(spark, wh, "t", v1, v2, ["id"]).collect()
        }
        assert got == {2: "update", 3: "delete", 4: "insert"}

    def test_identical_versions_empty_feed(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        v1 = write_table_snapshot(df, wh, "t")
        v2 = write_table_snapshot(df, wh, "t")
        assert snapshot_diff(spark, wh, "t", v1, v2, ["id"]).count() == 0

    def test_null_swap_between_columns_is_an_update(self, spark, tmp_path):
        """Spark hash functions skip NULL inputs, so a bare-column
        xxhash64 would hash (name=NULL, alias='x') and (name='x',
        alias=NULL) identically and silently drop the update from the
        change feed. The null-discriminating JSON encoding must not."""
        from hg_data_pipelines_spark.snapshots import (
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        v1_df = spark.createDataFrame(
            [(1, None, "x"), (2, "keep", None)],
            "id long, name string, alias string",
        )
        v1 = write_table_snapshot(v1_df, wh, "t")
        v2_df = spark.createDataFrame(
            # row 1: value moves name<->alias; row 2: unchanged
            [(1, "x", None), (2, "keep", None)],
            "id long, name string, alias string",
        )
        v2 = write_table_snapshot(v2_df, wh, "t")
        got = {
            r["id"]: r["change_type"]
            for r in snapshot_diff(spark, wh, "t", v1, v2, ["id"]).collect()
        }
        assert got == {1: "update"}

    def test_null_vs_empty_string_is_an_update(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        v1 = write_table_snapshot(
            spark.createDataFrame([(1, None)], "id long, s string"), wh, "t"
        )
        v2 = write_table_snapshot(
            spark.createDataFrame([(1, "")], "id long, s string"), wh, "t"
        )
        got = {
            r["id"]: r["change_type"]
            for r in snapshot_diff(spark, wh, "t", v1, v2, ["id"]).collect()
        }
        assert got == {1: "update"}


class TestApplyChangeFeed:
    def test_diff_apply_roundtrip(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            apply_change_feed,
            read_table_snapshot,
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path / "wh")
        v0 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, v double",
        )
        # v1: id 1 updated, id 2 deleted, id 4 inserted, id 3 unchanged
        v1 = spark.createDataFrame(
            [(1, "a2", 11.0), (3, "c", 30.0), (4, "d", 40.0)],
            "id long, name string, v double",
        )
        write_table_snapshot(v0, wh, "t")
        write_table_snapshot(v1, wh, "t")
        feed = snapshot_diff(spark, wh, "t", 1, 2, ["id"], include_values=True)
        types = {r["id"]: r["change_type"] for r in feed.collect()}
        assert types == {1: "update", 2: "delete", 4: "insert"}

        base = read_table_snapshot(spark, wh, "t", 1)
        applied = apply_change_feed(base, feed, ["id"])
        got = {tuple(r) for r in applied.collect()}
        want = {tuple(r) for r in v1.collect()}
        assert got == want

    def test_null_swap_update_detected_and_applied(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            apply_change_feed,
            read_table_snapshot,
            snapshot_diff,
            write_table_snapshot,
        )

        wh = str(tmp_path / "wh2")
        v0 = spark.createDataFrame(
            [(1, None, "x")], "id long, name string, alias string"
        )
        v1 = spark.createDataFrame(
            [(1, "x", None)], "id long, name string, alias string"
        )
        write_table_snapshot(v0, wh, "t")
        write_table_snapshot(v1, wh, "t")
        feed = snapshot_diff(spark, wh, "t", 1, 2, ["id"], include_values=True)
        assert [r["change_type"] for r in feed.collect()] == ["update"]
        applied = apply_change_feed(
            read_table_snapshot(spark, wh, "t", 1), feed, ["id"]
        )
        assert {tuple(r) for r in applied.collect()} == {(1, "x", None)}


class TestWriteAuditPublish:
    """WAP governance: stage → audit → publish-or-abort (S26's engine)."""

    def test_abort_leaves_live_table_untouched(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.snapshots import (
            read_table_snapshot,
            snapshot_versions,
            write_audit_publish,
        )

        wh = str(tmp_path)
        good = spark.createDataFrame([(1, 10.0), (2, 5.0)], "k long, v double")
        bad = spark.createDataFrame([(3, -1.0)], "k long, v double")
        audits = [("neg_v", F.col("v") < 0)]
        v1, rep1 = write_audit_publish(spark, good, wh, "t", audits)
        assert v1 == 1 and rep1 == [("neg_v", 0)]
        v2, rep2 = write_audit_publish(spark, bad, wh, "t", audits)
        assert v2 is None and rep2 == [("neg_v", 1)]
        # live table: still exactly v1's rows, still exactly one version
        assert snapshot_versions(wh, "t") == [1]
        rows = sorted(
            (r["k"], r["v"])
            for r in read_table_snapshot(spark, wh, "t").collect()
        )
        assert rows == [(1, 10.0), (2, 5.0)]
        # quarantined batch still on disk in staging for debugging
        assert len(snapshot_versions(wh, "t__staging")) == 2

    def test_publish_is_manifest_only(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.snapshots import write_audit_publish

        wh = str(tmp_path)
        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        v, _ = write_audit_publish(spark, df, wh, "t", [("neg", F.col("v") < 0)])
        assert v == 1
        # the live table dir holds ONLY manifests — data lives in staging
        live_data = os.path.join(wh, "t", "data")
        assert not os.path.isdir(live_data)
        import json

        with open(os.path.join(wh, "t", "_snapshots", "v1.json")) as fh:
            m = json.load(fh)
        assert "t__staging" in m["data_dir"]


class TestBranching:
    def test_branch_isolation_and_fast_forward(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            create_branch,
            fast_forward,
            read_table_snapshot,
            snapshot_versions,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        write_table_snapshot(
            spark.createDataFrame([(1,)], "k long"), wh, "t"
        )
        create_branch(wh, "t", "dev")
        head = read_table_snapshot(spark, wh, "t@dev")
        write_table_snapshot(
            head.unionByName(spark.createDataFrame([(2,)], "k long")),
            wh, "t@dev",
        )
        # main untouched by the branch commit
        assert snapshot_versions(wh, "t") == [1]
        assert read_table_snapshot(spark, wh, "t").count() == 1
        v = fast_forward(wh, "t", "dev")
        assert v == 2
        got = sorted(r["k"] for r in read_table_snapshot(spark, wh, "t").collect())
        assert got == [1, 2]
        # branch point was a pointer, not a copy: branch v1 reads main v1's dir
        import json, os
        with open(os.path.join(wh, "t@dev", "_snapshots", "v1.json")) as fh:
            assert json.load(fh)["branched_from"] == {"table": "t", "version": 1}

    def test_rebranch_requires_overwrite(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            create_branch,
            read_table_snapshot,
            snapshot_versions,
            write_table_snapshot,
        )

        wh = str(tmp_path)
        write_table_snapshot(spark.createDataFrame([(1,)], "k long"), wh, "t")
        create_branch(wh, "t", "dev")
        write_table_snapshot(spark.createDataFrame([(2,)], "k long"), wh, "t@dev")
        # silent v1 rewrite under existing v2 would corrupt branch history
        with pytest.raises(FileExistsError):
            create_branch(wh, "t", "dev")
        # explicit overwrite replaces the WHOLE chain, not just v1
        write_table_snapshot(spark.createDataFrame([(9,)], "k long"), wh, "t")
        assert create_branch(wh, "t", "dev", overwrite=True) == 1
        assert snapshot_versions(wh, "t@dev") == [1]
        assert [r["k"] for r in read_table_snapshot(spark, wh, "t@dev").collect()] == [9]


class TestExpireOwnership:
    """expire_snapshots must never delete data referenced by another
    chain: branch/WAP/fast-forward manifests point into foreign data
    dirs (manifest-only publishes copy no bytes)."""

    def test_expiring_parent_keeps_branch_referenced_data(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import create_branch

        wh = str(tmp_path)
        write_table_snapshot(spark.createDataFrame([(1,)], "k long"), wh, "t")
        create_branch(wh, "t", "dev")  # dev v1 points at t/data/v1
        write_table_snapshot(spark.createDataFrame([(2,)], "k long"), wh, "t")
        write_table_snapshot(spark.createDataFrame([(3,)], "k long"), wh, "t")
        expired = expire_snapshots(wh, "t", keep_latest=1)
        assert expired == [1, 2]
        # v1's bytes survive: the branch still references them
        assert read_table_snapshot(spark, wh, "t@dev").count() == 1
        # v2's bytes (unreferenced) are gone
        assert not os.path.isdir(os.path.join(wh, "t", "data", "v2"))

    def test_expiring_staging_keeps_published_data(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import write_audit_publish

        wh = str(tmp_path)
        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        v, _ = write_audit_publish(
            spark, df, wh, "t", [("neg", F.col("v") < 0)]
        )
        assert v == 1
        # vacuum the staging chain entirely: manifests go, bytes stay
        # (the live table's manifest still references them)
        expired = expire_snapshots(wh, "t__staging", keep_latest=0)
        assert expired == [1]
        assert read_table_snapshot(spark, wh, "t").count() == 1

    def test_expiring_consumer_never_deletes_foreign_dir(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import create_branch

        wh = str(tmp_path)
        write_table_snapshot(spark.createDataFrame([(1,)], "k long"), wh, "t")
        create_branch(wh, "t", "dev")
        write_table_snapshot(spark.createDataFrame([(2,)], "k long"), wh, "t@dev")
        # expire the branch's pointer-version: parent data must survive
        expired = expire_snapshots(wh, "t@dev", keep_latest=1)
        assert expired == [1]
        assert read_table_snapshot(spark, wh, "t", version=1).count() == 1


class TestCompactPublishedTable:
    def test_compact_resolves_data_dir_from_manifest(self, spark, tmp_path):
        """A WAP-published version's data lives in the staging chain, so
        reconstructing <table>/data/v{N} walks an empty path, totals 0
        bytes, and silently ignores target_file_bytes."""
        from hg_data_pipelines_spark.snapshots import (
            compact_snapshot,
            write_audit_publish,
        )

        wh = str(tmp_path)
        df = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartition(16)
        v, _ = write_audit_publish(
            spark, df, wh, "t", [("neg", F.col("v") < 0)]
        )
        assert v == 1
        # tiny target forces MANY output files iff sizing saw real bytes
        v2 = compact_snapshot(spark, wh, "t", target_file_bytes=1024)
        assert v2 == 2
        d = os.path.join(wh, "t", "data", "v2")
        n = sum(
            1
            for root, _dirs, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )
        assert n > 1
        assert read_table_snapshot(spark, wh, "t").count() == 2000

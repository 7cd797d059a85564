"""IcebergLite snapshot layer (SURVEY.md §7.4): append, dynamic partition
overwrite, incremental read, manifest-level partition pruning, atomicity."""

from __future__ import annotations

import os

import pytest

from antnre_spark.icelite import IceLite


@pytest.fixture()
def table(tmp_path):
    return IceLite(str(tmp_path / "tbl"))


def df_of(spark, rows):
    return spark.createDataFrame(rows, ["k", "part", "v"])


class TestAppend:
    def test_append_accumulates(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10)]), ["part"])
        table.append(df_of(spark, [(2, "b", 20)]), ["part"])
        assert table.snapshots() == [0, 1]
        got = {(r["k"], r["part"], r["v"]) for r in table.load(spark).collect()}
        assert got == {(1, "a", 10), (2, "b", 20)}
        assert table.total_rows() == 2

    def test_time_travel(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10)]), ["part"])
        table.append(df_of(spark, [(2, "b", 20)]), ["part"])
        old = table.load(spark, snapshot=0)
        assert [r["k"] for r in old.collect()] == [1]


class TestOverwritePartitions:
    def test_only_touched_partitions_replaced(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10), (2, "b", 20)]), ["part"])
        table.overwrite_partitions(df_of(spark, [(3, "a", 30)]), ["part"])
        got = {(r["k"], r["part"]) for r in table.load(spark).collect()}
        assert got == {(3, "a"), (2, "b")}

    def test_overwrite_is_idempotent(self, spark, table):
        data = df_of(spark, [(1, "a", 10)])
        table.overwrite_partitions(data, ["part"])
        table.overwrite_partitions(data, ["part"])
        assert table.load(spark).count() == 1


class TestIncremental:
    def test_incremental_reads_only_new_files(self, spark, table):
        s0 = table.append(df_of(spark, [(1, "a", 10)]), ["part"])
        table.append(df_of(spark, [(2, "b", 20)]), ["part"])
        inc = table.incremental(spark, since_snapshot=s0)
        assert [r["k"] for r in inc.collect()] == [2]

    def test_incremental_from_none_is_full(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10)]), ["part"])
        assert table.incremental(spark, None).count() == 1


class TestPartitionPruning:
    def test_manifest_prunes_files(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]), ["part"])
        pruned = table.load(spark, partition_filter={"part": ["a", "c"]})
        assert {r["part"] for r in pruned.collect()} == {"a", "c"}
        # and the partition column survives the read
        assert "part" in pruned.columns


class TestAtomicity:
    def test_no_partial_manifest_visible(self, spark, table):
        table.append(df_of(spark, [(1, "a", 10)]), ["part"])
        # a leftover tmp manifest must be invisible to readers
        tmp = os.path.join(table.manifest_dir, ".tmp-snap-99.json")
        with open(tmp, "w") as f:
            f.write("{}")
        assert table.snapshots() == [0]
        assert table.current_snapshot() == 0

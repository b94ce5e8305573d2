"""Snapshot versioning / time travel (sources.versioned.VersionedTable):
append and overwrite commits, reads at any version, history, vacuum
retention. The reference is append-only with no transactions
(reference README.md:14-19); this is the superseding warehouse surface."""

import os

import pytest
from pyspark.sql import functions as F

from rtcdb_spark.sources import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "tbl"))


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 10).alias("val")
    )


def test_append_commits_accumulate(spark, vt):
    assert vt.commit(_batch(spark, 0, 5)) == 0
    assert vt.commit(_batch(spark, 5, 8)) == 1
    assert _rows(vt.read(0)) == _rows(_batch(spark, 0, 5))
    assert _rows(vt.read(1)) == _rows(_batch(spark, 0, 8))
    assert _rows(vt.read()) == _rows(_batch(spark, 0, 8))  # latest


def test_overwrite_preserves_old_versions(spark, vt):
    vt.commit(_batch(spark, 0, 5))
    vt.commit(_batch(spark, 100, 103), mode="overwrite")
    assert _rows(vt.read(1)) == _rows(_batch(spark, 100, 103))
    assert _rows(vt.read(0)) == _rows(_batch(spark, 0, 5))  # time travel


def test_history_records_ops(spark, vt):
    vt.commit(_batch(spark, 0, 5))
    vt.commit(_batch(spark, 5, 8))
    vt.commit(_batch(spark, 0, 2), mode="overwrite")
    h = vt.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert [e["op"] for e in h] == ["append", "append", "overwrite"]
    assert h[1]["n_files"] == h[0]["n_files"] + h[1]["n_added"]


def test_vacuum_drops_unreferenced_files(spark, vt):
    vt.commit(_batch(spark, 0, 5))
    vt.commit(_batch(spark, 100, 103), mode="overwrite")
    expected = _rows(_batch(spark, 100, 103))
    deleted = vt.vacuum(keep_last=1)
    assert deleted > 0  # version 0's files were unreferenced
    assert _rows(vt.read()) == expected  # latest survives vacuum
    with pytest.raises(ValueError):
        vt.read(0)  # dropped version is gone from the log
    # no orphan parquet files remain outside the kept manifest
    kept = {
        os.path.join(vt.root, f) for f in vt._read_manifest(1)["files"]
    }
    on_disk = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(vt.root, "data"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk == kept


def test_vacuum_keeps_shared_files_of_kept_versions(spark, vt):
    vt.commit(_batch(spark, 0, 5))
    vt.commit(_batch(spark, 5, 8))
    vt.commit(_batch(spark, 8, 9))
    vt.vacuum(keep_last=2)  # keeps v1 and v2; v0's files are shared with v1
    assert _rows(vt.read(1)) == _rows(_batch(spark, 0, 8))
    assert _rows(vt.read(2)) == _rows(_batch(spark, 0, 9))


def test_read_empty_and_bad_version(spark, vt):
    with pytest.raises(ValueError):
        vt.read()
    vt.commit(_batch(spark, 0, 2))
    with pytest.raises(ValueError):
        vt.read(7)


def test_changes_incremental_read(spark, tmp_path):
    from rtcdb_spark.sources.versioned import VersionedTable

    vt = VersionedTable(spark, str(tmp_path / "vt"))
    vt.commit(spark.createDataFrame([(1,), (2,)], "v long"))          # v0
    vt.commit(spark.createDataFrame([(3,)], "v long"))                # v1
    vt.commit(spark.createDataFrame([(4,), (5,)], "v long"))          # v2

    got = sorted(r["v"] for r in vt.changes(0).collect())
    assert got == [3, 4, 5]
    got = sorted(r["v"] for r in vt.changes(0, until_version=1).collect())
    assert got == [3]
    got = sorted(r["v"] for r in vt.changes(1).collect())
    assert got == [4, 5]
    assert vt.changes(2).count() == 0  # no new commits → empty, same schema

    import pytest

    vt.commit(spark.createDataFrame([(9,)], "v long"), mode="overwrite")  # v3
    with pytest.raises(ValueError, match="overwrite"):
        vt.changes(1)
    # range entirely before the rewrite still works
    assert sorted(r["v"] for r in vt.changes(0, until_version=2).collect()) == [3, 4, 5]

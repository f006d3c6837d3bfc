"""TableIO checkpoint contract: _SUCCESS-gated existence, lineage meta
round-trip, fingerprint validation."""

from cs588_data_science_bug_duplicate_detector_spark.sources.tableio import TableIO


def test_write_read_roundtrip(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    io.write(df, "t1")
    assert io.exists("t1")
    got = sorted((r["id"], r["v"]) for r in io.read(spark, "t1").collect())
    assert got == [(1, "a"), (2, "b")]


def test_exists_requires_success_marker(spark, tmp_path):
    import os

    io = TableIO(str(tmp_path))
    assert not io.exists("missing")
    df = spark.createDataFrame([(1,)], "id long")
    io.write(df, "t2")
    os.remove(os.path.join(str(tmp_path), "t2", "_SUCCESS"))
    assert not io.exists("t2")  # partial/killed write is not a checkpoint


def test_meta_and_fingerprint_validation(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df = spark.createDataFrame([(1,)], "id long")
    io.write(df, "t3")
    io.write_meta("t3", {"stage": "t3", "input_fingerprint": "abc", "rows": 1})
    assert io.read_meta("t3")["rows"] == 1
    assert io.valid_checkpoint("t3", "abc")
    assert not io.valid_checkpoint("t3", "other")   # stale input -> recompute
    assert not io.valid_checkpoint("t4", "abc")     # absent table


def test_corrupt_meta_is_invalid(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df = spark.createDataFrame([(1,)], "id long")
    io.write(df, "t5")
    with open(io._meta_path("t5"), "w") as f:
        f.write("{not json")
    assert io.read_meta("t5") is None
    assert not io.valid_checkpoint("t5", "abc")

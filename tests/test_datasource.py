"""Spark 4 Python DataSource ('uscrn' format): batch partition-per-file
reads, integration with the Catalyst parse pipeline, and the streaming
mtime-offset source (the reference's updates-page watermark as a
checkpointed offset)."""

from __future__ import annotations

import os

from alaska_etl_spark.sources.uscrn import parse_uscrn_lines
from alaska_etl_spark.sources.uscrn_datasource import register
from alaska_etl_spark.streaming.incremental import run_available_now
from tests.conftest import uscrn_line


def test_batch_read_partition_per_file(spark, tmp_path):
    register(spark)
    (tmp_path / "a.txt").write_text(uscrn_line(utc_time=1100) + "\n")
    (tmp_path / "b.txt").write_text(
        uscrn_line(utc_time=1200) + "\n" + uscrn_line(utc_time=1300) + "\n"
    )
    (tmp_path / "ignored.csv").write_text("nope\n")

    df = spark.read.format("uscrn").load(str(tmp_path))
    assert df.columns == ["value", "src_file"]
    rows = df.collect()
    assert len(rows) == 3
    assert {r.src_file for r in rows} == {"a.txt", "b.txt"}
    assert df.rdd.getNumPartitions() == 2  # one per file


def test_batch_feeds_catalyst_parse(spark, tmp_path, locations):
    register(spark)
    (tmp_path / "a.txt").write_text(uscrn_line(utc_time=1100) + "\n")
    raw = spark.read.format("uscrn").load(str(tmp_path))
    out = parse_uscrn_lines(raw, locations).collect()
    assert len(out) == 1
    assert out[0].station_location == "Fairbanks_11_NE"


def test_stream_mtime_offset_no_reprocessing(spark, tmp_path):
    """Second drain ingests only files newer than the checkpointed
    mtime offset — the reference's last_added filter, engine-owned."""
    register(spark)
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    f1 = src / "f1.txt"
    f1.write_text("line-one x\n")
    os.utime(f1, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_000))

    stream = spark.readStream.format("uscrn").load(str(src))
    run_available_now(stream, str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 1

    f2 = src / "f2.txt"
    f2.write_text("line-two x\nline-three x\n")
    os.utime(f2, ns=(2_000_000_000_000_000_000, 2_000_000_000_000_000_000))
    run_available_now(
        spark.readStream.format("uscrn").load(str(src)), str(out), str(ckpt)
    )

    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 3  # f1 NOT re-ingested
    assert sorted(r.value for r in got) == ["line-one x", "line-three x", "line-two x"]


def test_stream_preserved_mtime_file_still_ingested(spark, tmp_path):
    """A file delivered with an OLD mtime (rsync -p style) must still be
    ingested — per-file offset state, not a single mtime watermark."""
    register(spark)
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    f1 = src / "f1.txt"
    f1.write_text("line-one x\n")
    os.utime(f1, ns=(2_000_000_000_000_000_000, 2_000_000_000_000_000_000))
    run_available_now(spark.readStream.format("uscrn").load(str(src)), str(out), str(ckpt))

    f0 = src / "f0.txt"  # arrives later, mtime BEFORE f1's
    f0.write_text("line-zero x\n")
    os.utime(f0, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_000))
    run_available_now(spark.readStream.format("uscrn").load(str(src)), str(out), str(ckpt))

    got = sorted(r.value for r in spark.read.parquet(str(out)).collect())
    assert got == ["line-one x", "line-zero x"]


def test_stream_append_ingested_incrementally(spark, tmp_path):
    """Appending to an already-ingested file ingests ONLY the new bytes
    (the recorded size is the resume point)."""
    register(spark)
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    f1 = src / "f1.txt"
    f1.write_text("line-one x\n")
    run_available_now(spark.readStream.format("uscrn").load(str(src)), str(out), str(ckpt))

    with f1.open("a") as fh:
        fh.write("line-two x\n")
    run_available_now(spark.readStream.format("uscrn").load(str(src)), str(out), str(ckpt))

    got = [r.value for r in spark.read.parquet(str(out)).collect()]
    assert sorted(got) == ["line-one x", "line-two x"]  # no duplicated prefix


def test_stream_torn_append_never_splits_a_line(tmp_path):
    """Regression (ADVICE r2): stat during a non-atomic append must not
    emit the torn prefix as its own line — the committed offset trims to
    the last newline and the remainder rides the next batch."""
    from alaska_etl_spark.sources.uscrn_datasource import UscrnStreamReader

    f = tmp_path / "f1.txt"
    f.write_text("line-one x\nline-two")  # writer caught mid-line
    r = UscrnStreamReader({"path": str(tmp_path)})
    rows1, off1 = r.read(r.initialOffset())
    assert [v for v, _ in rows1] == ["line-one x"]  # no torn prefix

    with f.open("a") as fh:
        fh.write(" continued\n")  # writer finishes the line
    rows2, off2 = r.read(off1)
    assert [v for v, _ in rows2] == ["line-two continued"]  # whole line, once

    # crash replay over the same offsets reproduces the same rows
    replay1 = [v for v, _ in r.readBetweenOffsets(r.initialOffset(), off1)]
    replay2 = [v for v, _ in r.readBetweenOffsets(off1, off2)]
    assert replay1 == ["line-one x"]
    assert replay2 == ["line-two continued"]


def test_stream_flushes_final_line_without_trailing_newline(tmp_path):
    """A file that genuinely ends without a trailing newline delivers
    its last line on the next poll (raw state idle ⇒ writer done), not
    never."""
    from alaska_etl_spark.sources.uscrn_datasource import UscrnStreamReader

    f = tmp_path / "f1.txt"
    f.write_text("a x\nb x")
    r = UscrnStreamReader({"path": str(tmp_path)})
    rows1, off1 = r.read(r.initialOffset())
    assert [v for v, _ in rows1] == ["a x"]
    rows2, off2 = r.read(off1)
    assert [v for v, _ in rows2] == ["b x"]  # tail flushed once idle
    rows3, off3 = r.read(off2)
    assert rows3 == []  # and only once
    assert [v for v, _ in r.readBetweenOffsets(off1, off2)] == ["b x"]


def test_offset_ranges_replay_exact_bytes(tmp_path):
    """readBetweenOffsets re-reads exactly the committed byte range even
    after the file grows post-commit (deterministic crash replay)."""
    from alaska_etl_spark.sources.uscrn_datasource import UscrnStreamReader

    f = tmp_path / "f1.txt"
    f.write_text("line-one x\n")
    r = UscrnStreamReader({"path": str(tmp_path)})
    rows, end = r.read(r.initialOffset())
    assert [v for v, _ in rows] == ["line-one x"]

    with f.open("a") as fh:
        fh.write("line-two x\n")  # grows AFTER the offset committed
    replay = list(r.readBetweenOffsets(r.initialOffset(), end))
    assert [v for v, _ in replay] == ["line-one x"]  # not the appended line

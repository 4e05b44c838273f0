"""WebDataset-style tar shard ingestion (sources/tar_shards.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.sources.tar_shards import (
    _split_member,
    group_samples,
    read_tar_shards,
    write_tar_shard,
)


def test_split_member_webdataset_convention():
    assert _split_member("000123.jpg") == ("000123", "jpg")
    assert _split_member("000123.seg.png") == ("000123", "seg.png")
    assert _split_member("a/b/000123.txt") == ("a/b/000123", "txt")
    assert _split_member("noext") == ("noext", "")


def _members(n=3):
    out = []
    for i in range(n):
        out.append(dict(member=f"{i:06d}.txt",
                        payload=f"caption {i}".encode()))
        out.append(dict(member=f"{i:06d}.img",
                        payload=bytes([i] * 10)))
        out.append(dict(member=f"{i:06d}.json",
                        payload=b'{"w": 1}'))
    return out


def test_tar_round_trip_and_grouping(spark, tmp_path):
    p1 = str(tmp_path / "shard-000.tar")
    p2 = str(tmp_path / "shard-001.tar.gz")
    write_tar_shard(_members(3), p1)
    write_tar_shard(_members(2), p2)
    rows = read_tar_shards(spark, str(tmp_path / "shard-*"))
    got = rows.collect()
    assert all(r.error is None for r in got)
    assert len(got) == 15  # 3*3 + 2*3 members
    by = {(r.file.rsplit("/", 1)[-1], r.member): r for r in got}
    r = by[("shard-000.tar", "000001.txt")]
    assert (r.key, r.ext, bytes(r.payload)) == ("000001", "txt",
                                                b"caption 1")
    samples = group_samples(rows)
    assert samples.count() == 5
    s = {(r.file.rsplit("/", 1)[-1], r.key): r.parts
         for r in samples.collect()}
    parts = s[("shard-001.tar.gz", "000000")]
    assert set(parts) == {"txt", "img", "json"}
    assert bytes(parts["txt"]) == b"caption 0"
    # ext filter keeps only named parts
    only_txt = group_samples(rows, exts=["txt"])
    assert all(set(r.parts) == {"txt"} for r in only_txt.collect())


def test_tar_quarantine_and_ext_filter(spark, tmp_path):
    good = str(tmp_path / "ok.tar")
    write_tar_shard(_members(1), good)
    bad = str(tmp_path / "bad.tar")
    with open(bad, "wb") as f:
        f.write(b"definitely not a tar archive" * 40)
    badgz = str(tmp_path / "bad2.tar.gz")
    with open(badgz, "wb") as f:
        f.write(b"\x1f\x8bnot really gzip")
    rows = read_tar_shards(spark, str(tmp_path / "*.tar*"),
                           exts=["txt"]).collect()
    errs = [r for r in rows if r.error is not None]
    oks = [r for r in rows if r.error is None]
    assert len(errs) == 2  # one per corrupt shard
    assert {e.error.split(":")[0] for e in errs} == {"bad tar", "bad gzip"}
    assert [r.ext for r in oks] == ["txt"]  # ext filter applied post-parse


def test_tar_deterministic_writer(tmp_path):
    a, b = str(tmp_path / "a.tar"), str(tmp_path / "b.tar")
    write_tar_shard(_members(2), a)
    write_tar_shard(_members(2), b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_write_tar_shards_distributed_round_trip(spark, tmp_path):
    from soda_spark_spark.sources.tar_shards import write_tar_shards

    df = spark.createDataFrame(
        [(i % 4, f"{i:06d}.txt", bytearray(f"doc {i}".encode()))
         for i in range(40)],
        "shard_id long, member string, payload binary",
    )
    out = str(tmp_path / "wds")
    manifest = {r.shard_id: r
                for r in write_tar_shards(df, out).collect()}
    assert len(manifest) == 4
    assert all(m.n_members == 10 for m in manifest.values())
    assert all(m.file.endswith(f"shard-{sid:06d}.tar")
               for sid, m in manifest.items())
    # read back and verify every member survived byte-exactly
    back = read_tar_shards(spark, out + "/shard-*")
    got = {r.member: bytes(r.payload) for r in back.collect()}
    assert len(got) == 40
    assert got["000007.txt"] == b"doc 7"
    # deterministic / idempotent: rewriting produces identical bytes
    b1 = open(manifest[2].file, "rb").read()
    write_tar_shards(df, out).collect()
    assert open(manifest[2].file, "rb").read() == b1


def test_write_tar_shards_gzip(spark, tmp_path):
    from soda_spark_spark.sources.tar_shards import write_tar_shards

    df = spark.createDataFrame(
        [(0, "a.txt", bytearray(b"x" * 500))],
        "shard_id long, member string, payload binary",
    )
    out = str(tmp_path / "gz")
    m = write_tar_shards(df, out, gzip_shards=True).collect()[0]
    assert m.file.endswith(".tar.gz") and m.n_bytes < 500
    back = read_tar_shards(spark, m.file).collect()
    assert bytes(back[0].payload) == b"x" * 500


def test_group_samples_duplicate_members_deterministic(spark, tmp_path):
    """tar permits duplicate member names; grouping must keep ONE
    deterministic part instead of tripping Spark's duplicate-map-key
    exception."""
    import io
    import tarfile

    p = str(tmp_path / "dup.tar")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in [("k.txt", b"first"), ("k.txt", b"second"),
                              ("k.img", b"\x01")]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    open(p, "wb").write(buf.getvalue())
    rows = read_tar_shards(spark, p)
    assert rows.count() == 3  # both duplicates surface as members
    s = group_samples(rows).collect()
    assert len(s) == 1
    parts = s[0].parts
    # min(member, payload) tie-breaks on payload for identical names
    assert bytes(parts["txt"]) == b"first"
    assert set(parts) == {"txt", "img"}


def test_read_zip_shards(spark, tmp_path):
    import io
    import zipfile

    from soda_spark_spark.sources.tar_shards import read_zip_shards

    p = str(tmp_path / "s.zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("000001.txt", b"caption one")
        zf.writestr("000001.json", b"{}")
        zf.writestr("000002.txt", b"caption two")
        zf.writestr("dir/", b"")  # directory entry: skipped
    open(p, "wb").write(buf.getvalue())
    bad = str(tmp_path / "bad.zip")
    open(bad, "wb").write(b"PK\x03\x04 nope")
    rows = read_zip_shards(spark, str(tmp_path / "*.zip")).collect()
    errs = [r for r in rows if r.error is not None]
    oks = {r.member: bytes(r.payload) for r in rows if r.error is None}
    assert len(errs) == 1 and errs[0].error.startswith("bad zip")
    assert oks == {"000001.txt": b"caption one", "000001.json": b"{}",
                   "000002.txt": b"caption two"}
    samples = group_samples(
        read_zip_shards(spark, p)
    ).collect()
    parts = {r.key: set(r.parts) for r in samples}
    assert parts == {"000001": {"txt", "json"}, "000002": {"txt"}}


def test_tar_surrogate_member_name_quarantine_free(spark, tmp_path):
    """A member name with invalid UTF-8 bytes (tarfile decodes them
    with surrogateescape) must yield a readable row, not crash the
    Arrow conversion."""
    import io
    import tarfile

    p = str(tmp_path / "sg.tar")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(b"bad\xff.txt".decode("utf-8",
                                                     "surrogateescape"))
        info.size = 2
        tf.addfile(info, io.BytesIO(b"ok"))
    open(p, "wb").write(buf.getvalue())
    rows = read_tar_shards(spark, p).collect()
    assert len(rows) == 1 and rows[0].error is None
    # tarfile's writer may itself sanitize ('?'); what matters is the
    # read path emits a VALID string row either way, never a crash
    assert rows[0].member in ("bad?.txt", "bad�.txt")
    assert bytes(rows[0].payload) == b"ok"
    # the normalizer itself, exercised directly (what a foreign tar
    # with raw non-UTF-8 name bytes produces through surrogateescape)
    from soda_spark_spark.sources.tar_shards import _member_name

    sg = b"bad\xff.txt".decode("utf-8", "surrogateescape")
    assert _member_name(sg) == "bad�.txt"
    assert _member_name("fine.txt") == "fine.txt"

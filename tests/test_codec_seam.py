"""External-codec seam (VERDICT r8 #8): sample_frames(codec='ffmpeg')
shells out to an ffmpeg binary when present, raises the documented
NotImplementedError otherwise.  The Spark-side plumbing — argument
construction, frame splitting, schema, fan-out — is exercised against a
STUB binary (this container has no ffmpeg); a real-ffmpeg test runs
wherever one is installed."""

from __future__ import annotations

import os
import shutil
import stat
import sys

import pytest

from comlake_core_spark.operators.multimodal import _ffmpeg_demux, sample_frames

STUB = """#!{python}
import sys
# stub ffmpeg: swallow argv, read all of stdin, emit 3 deterministic
# gray frames whose side comes from the scale=WxH filter argument
data = sys.stdin.buffer.read()
side = 1
for a in sys.argv:
    if "scale=" in a:
        side = int(a.split("scale=")[1].split(":")[0])
frame = side * side
for i in range(3):
    sys.stdout.buffer.write(bytes([(i * 7 + len(data)) % 256]) * frame)
"""


@pytest.fixture()
def stub_ffmpeg(tmp_path, monkeypatch):
    p = tmp_path / "fake-ffmpeg"
    p.write_text(STUB.format(python=sys.executable))
    p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("COMLAKE_FFMPEG", str(p))
    return str(p)


def test_demux_splits_frames_and_indexes_by_every_n(stub_ffmpeg):
    frames = _ffmpeg_demux(b"0123456789", side=4, every_n=2, ffmpeg=stub_ffmpeg)
    assert len(frames) == 3
    for i, (idx, fb, pts) in enumerate(frames):
        assert idx == i * 2 and len(fb) == 16
        assert fb == bytes([(i * 7 + 10) % 256]) * 16
        assert pts == pytest.approx(idx / 30.0)


def test_sample_frames_ffmpeg_seam_through_spark(spark, stub_ffmpeg):
    df = spark.createDataFrame(
        [("a", b"\x01" * 100), ("b", b"\x02" * 64)], "id string, content binary"
    )
    out = sample_frames(df, frame_size=16, every_n=2, codec="ffmpeg")
    assert out.schema.simpleString() == (
        "struct<id:string,frame_idx:int,frame_bytes:binary,pts_sec:double>"
    )
    rows = out.collect()
    assert sorted({r["id"] for r in rows}) == ["a", "b"]
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for rid, rs in by_id.items():
        assert sorted(r["frame_idx"] for r in rs) == [0, 2, 4]  # stub emits 3 frames
        assert all(len(r["frame_bytes"]) == 16 for r in rs)  # sqrt(16)² gray


def test_ffmpeg_absent_raises_documented_contract(monkeypatch, spark):
    monkeypatch.setenv("COMLAKE_FFMPEG", "definitely-not-a-binary-xyz")
    df = spark.createDataFrame([("a", b"x")], "id string, content binary")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(df, codec="ffmpeg")


@pytest.mark.skipif(shutil.which("ffmpeg") is None, reason="no real ffmpeg in container")
def test_real_ffmpeg_demuxes_y4m(spark, monkeypatch):
    monkeypatch.delenv("COMLAKE_FFMPEG", raising=False)
    # hand-rolled 4-frame 8x8 YUV4MPEG2 stream (ffmpeg reads y4m on stdin)
    head = b"YUV4MPEG2 W8 H8 F30:1 Ip A1:1 C420\n"
    frames = b"".join(
        b"FRAME\n" + bytes([i * 10]) * 64 + b"\x80" * 32 for i in range(4)
    )
    df = spark.createDataFrame([("v", head + frames)], "id string, content binary")
    rows = sample_frames(df, frame_size=16, every_n=2, codec="ffmpeg").collect()
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 2]
    assert all(len(r["frame_bytes"]) == 16 for r in rows)

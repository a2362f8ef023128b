"""RIFF/AVI MJPEG container (llm/avi.py): exact roundtrip, RIFF
alignment, malformed-input battery, real frame extraction through
sample_frames, and the composed video near-dup."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.avi import (
    avi_frame_at_ms,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
    video_near_dup_pairs,
)
from terra_bonobo_nodes_spark.llm.jpeg import encode_jpeg


def _ramp(w: int, h: int, seed: int) -> bytes:
    # deterministic pseudo-noise whose GRADIENT STRUCTURE depends on
    # the seed (a brightness-shifted ramp would dHash identically —
    # dHash compares neighboring pixels, not absolute levels)
    mul = (seed * 2654435761 + 12345) % (1 << 31) | 1
    return bytes(
        (((x * 31 + y * 17 + 7) * mul) >> 7) % 256
        for y in range(h)
        for x in range(w)
        for _ in range(3)
    )


def _frames(seed: int, n: int = 3, w: int = 16, h: int = 16) -> list[bytes]:
    return [encode_jpeg(w, h, _ramp(w, h, seed + i * 101)) for i in range(n)]


def test_roundtrip_exact_frames_and_meta():
    frames = _frames(0)
    avi = encode_avi_mjpeg(16, 16, frames, us_per_frame=40_000)
    meta = parse_avi_mjpeg(avi)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["us_per_frame"] == 40_000
    assert meta["n_frames"] == 3 and meta["duration_ms"] == 120
    assert meta["frames"] == frames  # byte-exact recovery


def test_odd_length_frames_word_align():
    # RIFF pads odd chunks; payload recovery must strip the pad exactly
    frames = [b"\xff\xd8odd", b"\xff\xd8even!", b"\xff\xd8x"]
    avi = encode_avi_mjpeg(4, 4, frames)
    assert parse_avi_mjpeg(avi)["frames"] == frames


def test_frames_containing_riff_magics_parse_by_length():
    # Content-Length-driven: embedded 'RIFF'/'LIST'/'00dc' bytes are data
    frames = [b"RIFF\x00\x00LIST00dc" * 3, b"LIST" * 5]
    avi = encode_avi_mjpeg(2, 2, frames)
    assert parse_avi_mjpeg(avi)["frames"] == frames


def test_frame_at_ms_floor_and_clamp():
    frames = _frames(5)
    avi = encode_avi_mjpeg(16, 16, frames, us_per_frame=40_000)  # 40ms/frame
    assert avi_frame_at_ms(avi, 0) == frames[0]
    assert avi_frame_at_ms(avi, 39) == frames[0]
    assert avi_frame_at_ms(avi, 40) == frames[1]
    assert avi_frame_at_ms(avi, 10_000) == frames[2]  # clamps to last


def test_malformed_battery():
    good = encode_avi_mjpeg(4, 4, [b"\xff\xd8aa"])
    with pytest.raises(ValueError, match="not a RIFF"):
        parse_avi_mjpeg(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="form type"):
        parse_avi_mjpeg(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="exceeds payload"):
        parse_avi_mjpeg(good[:4] + struct.pack("<I", len(good) * 2) + good[8:])
    # truncating the payload makes the outer RIFF size a lie first
    with pytest.raises(ValueError, match="exceeds payload"):
        parse_avi_mjpeg(good[:-6])
    # an inner chunk whose size points past its LIST: shrink the movi
    # frame chunk's declared size up (claims bytes past the end)
    inner = bytearray(good)
    movi_at = good.index(b"movi")
    struct.pack_into("<I", inner, movi_at + 8, 1 << 24)
    with pytest.raises(ValueError, match="past the end|truncated"):
        parse_avi_mjpeg(bytes(inner))
    # header/movi frame-count mismatch: append a rogue frame chunk count
    tampered = bytearray(good)
    # avih total_frames field sits 16 bytes into the avih payload;
    # find it via the known layout: RIFF(12) LIST hdr(12) avih hdr(8)
    off = 12 + 12 + 8 + 16
    struct.pack_into("<I", tampered, off, 99)
    with pytest.raises(ValueError, match="declares 99 frames"):
        parse_avi_mjpeg(bytes(tampered))
    with pytest.raises(ValueError, match="no frames"):
        avi_frame_at_ms(encode_avi_mjpeg(4, 4, []), 0)


def test_encode_guards():
    with pytest.raises(ValueError, match="dimensions"):
        encode_avi_mjpeg(0, 4, [])
    with pytest.raises(ValueError, match="us_per_frame"):
        encode_avi_mjpeg(4, 4, [], us_per_frame=0)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=6),
    st.integers(min_value=1, max_value=10**6),
)
def test_hypothesis_container_roundtrip(frames, uspf):
    avi = encode_avi_mjpeg(8, 8, frames, us_per_frame=uspf)
    meta = parse_avi_mjpeg(avi)
    assert meta["frames"] == frames
    assert meta["us_per_frame"] == uspf


def _assets(spark, videos: dict[int, bytes]):
    rows = [(i, v) for i, v in videos.items()]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    dur = {i: parse_avi_mjpeg(v)["duration_ms"] for i, v in videos.items()}
    expr = F.lit(None).cast("long")
    for i, d in dur.items():
        expr = F.when(F.col("asset_id") == i, F.lit(d)).otherwise(expr)
    return df.select(
        "asset_id", "payload", F.struct(expr.alias("duration_ms")).alias("meta")
    )


def test_sample_frames_extracts_real_jpegs(spark):
    from terra_bonobo_nodes_spark.llm.avi import avi_frame_at_ms as fx
    from terra_bonobo_nodes_spark.llm.multimodal import sample_frames

    frames = _frames(9)
    avi = encode_avi_mjpeg(16, 16, frames, us_per_frame=40_000)
    assets = _assets(spark, {1: avi})
    out = sample_frames(assets, every_ms=40, frame_extractor=fx).collect()
    assert len(out) == 3
    got = {r["frame_ms"]: bytes(r["frame"]) for r in out}
    assert got[0] == frames[0] and got[40] == frames[1] and got[80] == frames[2]
    assert all(f[:2] == b"\xff\xd8" for f in got.values())  # real JPEGs


def test_video_near_dup_pairs_end_to_end(spark):
    fa = _frames(0)
    fb = list(fa)  # byte-identical copy -> all frames collapse exactly
    fc = _frames(777)  # unrelated content
    videos = {
        10: encode_avi_mjpeg(16, 16, fa, us_per_frame=40_000),
        11: encode_avi_mjpeg(16, 16, fb, us_per_frame=40_000),
        12: encode_avi_mjpeg(16, 16, fc, us_per_frame=40_000),
    }
    out = video_near_dup_pairs(
        _assets(spark, videos), every_ms=40, max_hamming=3,
        min_matched_frames=2,
    ).collect()
    got = {(r["video_a"], r["video_b"]): r for r in out}
    assert (10, 11) in got
    assert got[(10, 11)]["n_matched_frames"] == 3
    assert got[(10, 11)]["min_hamming"] == 0
    assert (10, 12) not in got and (11, 12) not in got


def test_avi_sample_frames_on_error_null_skips_bad_assets(spark):
    from terra_bonobo_nodes_spark.llm.avi import avi_sample_frames

    frames = _frames(3)
    good = encode_avi_mjpeg(16, 16, frames, us_per_frame=40_000)
    zero = encode_avi_mjpeg(16, 16, [])  # valid container, no frames
    df = spark.createDataFrame(
        [(1, good), (2, b"NOTANAVI"), (3, zero)],
        "asset_id long, payload binary",
    )
    out = avi_sample_frames(df, every_ms=40, on_error="null").collect()
    assert sorted({r["asset_id"] for r in out}) == [1]  # bad assets skipped
    assert len(out) == 3
    with pytest.raises(Exception):
        avi_sample_frames(df, every_ms=40, on_error="raise").collect()


def test_avi_sample_frames_string_ids(spark):
    # the id field follows the input schema (the phash ADVICE_r13
    # convention — a LongType pin would crash Arrow conversion here)
    from terra_bonobo_nodes_spark.llm.avi import avi_sample_frames

    avi = encode_avi_mjpeg(16, 16, _frames(1), us_per_frame=40_000)
    df = spark.createDataFrame(
        [("vid-a", avi)], "asset_id string, payload binary"
    )
    out = avi_sample_frames(df, every_ms=40).collect()
    assert len(out) == 3 and all(r["asset_id"] == "vid-a" for r in out)


def test_avi_sample_frames_matches_frame_at_ms(spark):
    # sampling equivalence: the parse-once batch path must pick exactly
    # the frame avi_frame_at_ms (the per-timestamp reference) picks
    from terra_bonobo_nodes_spark.llm.avi import avi_sample_frames

    frames = _frames(2, n=6)
    avi = encode_avi_mjpeg(16, 16, frames, us_per_frame=40_000)  # 240ms
    df = spark.createDataFrame([(7, avi)], "asset_id long, payload binary")
    out = {
        r["frame_ms"]: bytes(r["frame"])
        for r in avi_sample_frames(df, every_ms=70).collect()
    }
    assert sorted(out) == [0, 70, 140, 210]
    for ms, frame in out.items():
        assert frame == avi_frame_at_ms(avi, ms)

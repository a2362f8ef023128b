"""From-spec RIFF/AVI (Motion-JPEG) container codec + the video
pipeline it unlocks — frame sampling with a REAL extractor and
frame-hash video near-dup.

The container format is public (Microsoft RIFF/AVI, "AVI RIFF File
Reference"): a RIFF file whose form type is ``AVI ``, a ``hdrl`` LIST
carrying the 56-byte main header (``avih``) and one video stream
header pair (``strh``/``strf``), a ``movi`` LIST of ``00dc``
compressed-frame chunks (word-aligned, per RIFF), and an ``idx1``
index. Frames here are JPEG payloads — the repo's own from-spec
encoder/decoder (:mod:`llm.jpeg`) supplies them, so the WHOLE video
path (container parse -> frame extract -> pixel decode -> perceptual
hash -> banded near-dup join) runs pure-Python-from-spec with no
native media libs, the WARC/shapefile verification shape applied to
video.

Codec policy (the :mod:`llm.codecs` contract): unsupported or
malformed input raises loudly — never fake frames. The writer emits
the strict subset the parser documents; the parser is
Content-Length-driven (chunk sizes, never scanning for magics), so
frame payloads containing ``RIFF``/``LIST`` bytes parse correctly.

100 TB shape: containers are opaque binary column values; parsing and
frame decode are Arrow-batched Python over payload bytes only, the
container parsed ONCE per asset (:func:`avi_sample_frames` — the
generic :func:`multimodal.sample_frames` JVM-explode shape remains
for injected extractors, but per-frame re-parse of a whole container
is O(samples x video bytes) and was rearchitected out, round-14
review); fingerprints collapse to value grain in
:func:`llm.phash.hamming_pairs`' banded join; the only video-grain
shuffle is the final (video_a, video_b) count aggregate.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_AVIH_FLAGS_HASINDEX = 0x10
# frame keys pack (video id, frame index) into one orderable BIGINT for
# the shared pigeonhole kernel; 2^22 frame slots per video (~48h at
# 25fps) leaves 2^41 video ids
_FRAME_SLOT_BITS = 22
_FRAME_SLOTS = 1 << _FRAME_SLOT_BITS


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    us_per_frame: int = 40_000,
) -> bytes:
    """Pack JPEG frame payloads into a minimal spec-conformant MJPG
    AVI: avih + one vids/MJPG stream + movi of ``00dc`` chunks +
    idx1. Frame bytes are stored verbatim (word-aligned per RIFF) —
    the parse side recovers them exactly."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if us_per_frame < 1:
        raise ValueError("us_per_frame must be >= 1")
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        us_per_frame,
        0,  # max bytes/sec (informational)
        0,  # padding granularity
        _AVIH_FLAGS_HASINDEX,
        n,
        0,  # initial frames
        1,  # streams
        max_bytes,
        width,
        height,
        0,
        0,
        0,
        0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # flags
            0,
            0,  # priority, language
            0,  # initial frames
            us_per_frame,  # scale
            1_000_000,  # rate -> fps = rate/scale
            0,  # start
            n,  # length in frames
            max_bytes,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (0 = varying)
            0,
            0,
            width,
            height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # BITMAPINFOHEADER size
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",
        width * height * 3,
        0,
        0,
        0,
        0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1 offsets are relative to the start of the movi LIST type word
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end), honoring RIFF word alignment; raise on truncation."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated chunk header at byte {pos}")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} claims {size} bytes past the end"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)


def parse_avi_mjpeg(payload: bytes) -> dict:
    """Parse the documented MJPG-AVI subset: returns ``{width, height,
    us_per_frame, n_frames, duration_ms, frames: list[bytes]}``.
    Content-Length-driven throughout; loud ValueError on anything
    malformed (bad magics, truncation, size lies, zero-stream files,
    frame-count mismatch vs the header)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("RIFF size exceeds payload")
    if payload[8:12] != b"AVI ":
        raise ValueError(f"RIFF form type {payload[8:12]!r} is not 'AVI '")
    end = 8 + riff_size
    avih = None
    frames: list[bytes] = []
    for fourcc, body, size in _walk(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            for cc, b2, s2 in _walk(payload, body + 4, body + size):
                if cc == b"avih":
                    if s2 < 56:
                        raise ValueError(f"avih is {s2} bytes, need 56")
                    avih = struct.unpack_from("<14I", payload, b2)
        elif list_type == b"movi":
            for cc, b2, s2 in _walk(payload, body + 4, body + size):
                if cc in (b"00dc", b"00db"):
                    frames.append(payload[b2 : b2 + s2])
    if avih is None:
        raise ValueError("no avih main header")
    us_per_frame, _, _, _, total_frames, _, streams, _, width, height = avih[:10]
    if streams < 1:
        raise ValueError("zero streams declared")
    if us_per_frame < 1:
        raise ValueError("bad us_per_frame 0")
    if total_frames != len(frames):
        raise ValueError(
            f"header declares {total_frames} frames, movi carries {len(frames)}"
        )
    return {
        "width": int(width),
        "height": int(height),
        "us_per_frame": int(us_per_frame),
        "n_frames": len(frames),
        "duration_ms": len(frames) * int(us_per_frame) // 1000,
        "frames": frames,
    }


def avi_frame_at_ms(payload: bytes, ms: int) -> bytes:
    """The frame covering timestamp ``ms`` (floor by frame duration,
    clamped to the last frame) — the REAL ``frame_extractor`` for
    :func:`multimodal.sample_frames`. Raises on empty videos (no frame
    to extract — the loud-rejection policy, never a fake payload)."""
    meta = parse_avi_mjpeg(payload)
    if not meta["frames"]:
        raise ValueError("video has no frames")
    idx = min(int(ms) * 1000 // meta["us_per_frame"], meta["n_frames"] - 1)
    return meta["frames"][max(idx, 0)]


# --- Spark composition: video frame hashing + near-dup ----------------------


def avi_sample_frames(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    on_error: str = "raise",
) -> DataFrame:
    """(id, frame_ms, frame): sample one frame per ``every_ms`` from
    each AVI payload — the container parsed ONCE per asset inside the
    Arrow batch (``avi_frame_at_ms`` per sampled timestamp would
    re-parse the whole container per frame: O(samples x video bytes)
    per asset; review finding, round 14). The per-asset fan-out
    happens in Python, bounded by duration/every_ms per video;
    :func:`multimodal.sample_frames` remains the generic JVM-explode
    shape for injected extractors and the stub path.

    ``on_error='null'``: an unparseable or zero-frame container yields
    NO frame rows for that asset instead of killing the stage (the
    ``image_dhash`` escape, extended to the parse step — one corrupt
    video in a crawl batch must not abort the job). The id field keeps
    the input's type (the phash ADVICE_r13 convention)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    import pandas as pd

    id_field = assets.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    step = int(every_ms)
    if step < 1:
        raise ValueError("every_ms must be >= 1")

    def run(batches):
        for pdf in batches:
            ids, mss, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    meta = parse_avi_mjpeg(bytes(b))
                    if not meta["frames"]:
                        raise ValueError("video has no frames")
                except Exception:
                    if on_error == "null":
                        continue
                    raise
                uspf, fr = meta["us_per_frame"], meta["frames"]
                for ms in range(0, max(meta["duration_ms"], 1), step):
                    idx = min(ms * 1000 // uspf, len(fr) - 1)
                    ids.append(i)
                    mss.append(ms)
                    frames.append(fr[max(idx, 0)])
            yield pd.DataFrame({id_col: ids, "frame_ms": mss, "frame": frames})

    return assets.select(id_col, payload_col).mapInPandas(run, schema)


def video_frame_dhash(
    frames: DataFrame,
    id_col: str = "asset_id",
    frame_col: str = "frame",
    on_error: str = "raise",
) -> DataFrame:
    """(id, frame_ms, frame_fp): perceptual dHash of each sampled
    frame — container-extracted JPEG bytes through the repo's own
    decoder (:func:`llm.phash.dhash_bits`). Arrow-batched; the
    ``on_error='null'`` escape mirrors ``image_dhash``; the id field
    keeps the input's type."""
    from terra_bonobo_nodes_spark.llm.phash import dhash_bits

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    import pandas as pd

    id_field = frames.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("frame_fp", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            fps = []
            for b in pdf[frame_col]:
                try:
                    fps.append(dhash_bits(bytes(b)))
                except Exception:
                    if on_error == "null":
                        fps.append(None)
                    else:
                        raise
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "frame_ms": pdf["frame_ms"],
                    "frame_fp": pd.array(fps, dtype="Int64"),
                }
            )

    return frames.mapInPandas(run, schema)


def video_near_dup_pairs(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_hamming: int = 3,
    min_matched_frames: int = 1,
    on_error: str = "raise",
) -> DataFrame:
    """(video_a, video_b, n_matched_frames, min_hamming) — video pairs
    sharing at least ``min_matched_frames`` sampled frames within
    ``max_hamming`` dHash bits; sampling timestamps come from each
    container's OWN header (duration/us_per_frame), parsed once per
    asset by :func:`avi_sample_frames`.

    Generator-set semantics all the way down (the
    :func:`llm.phash.hamming_pairs` contract): identical frame hashes
    collapse to a representative before the banded join, so three
    videos sharing one frame value yield rep-anchored pairs —
    sufficient for connected-component grouping, not an exhaustive
    pairwise count. Frame keys pack (video, frame index) into one
    BIGINT (2^22 frame slots per video); video ids must fit 41 bits.
    ``on_error='null'`` covers BOTH failure points: an unparseable /
    zero-frame container contributes no frames (parse step), and an
    undecodable frame contributes no fingerprint (decode step)."""
    from terra_bonobo_nodes_spark.llm.phash import hamming_pairs

    frames = avi_sample_frames(
        assets.select(
            F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
        ),
        every_ms=every_ms,
        on_error=on_error,
    )
    fps = video_frame_dhash(frames, on_error=on_error)
    keyed = fps.where(F.col("frame_fp").isNotNull()).select(
        (
            F.col("asset_id") * F.lit(_FRAME_SLOTS)
            + F.floor(F.col("frame_ms") / F.lit(int(every_ms)))
        ).alias("frame_key"),
        "frame_fp",
    )
    pairs = hamming_pairs(
        keyed, id_col="frame_key", fp_col="frame_fp", bits=64,
        max_hamming=max_hamming,
    )
    va = F.floor(F.col("id_a") / F.lit(_FRAME_SLOTS))
    vb = F.floor(F.col("id_b") / F.lit(_FRAME_SLOTS))
    cross = pairs.select(
        F.least(va, vb).alias("video_a"),
        F.greatest(va, vb).alias("video_b"),
        "hamming",
    ).where(F.col("video_a") != F.col("video_b"))
    return (
        cross.groupBy("video_a", "video_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_frames"),
            F.min("hamming").cast("int").alias("min_hamming"),
        )
        .where(F.col("n_matched_frames") >= int(min_matched_frames))
    )

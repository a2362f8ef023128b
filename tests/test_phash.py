"""Perceptual image hashing (llm/phash.py): dHash determinism across
encodings, near-dup recovery, the pigeonhole completeness guarantee,
and the decode-error policy."""

from __future__ import annotations

import random

import pytest

from terra_bonobo_nodes_spark.llm.codecs import encode_bmp, encode_ppm
from terra_bonobo_nodes_spark.llm.phash import (
    dhash_bits,
    hamming_pairs,
    image_dhash,
    image_near_dup_pairs,
)


def _gradient_rgb(w: int, h: int, flip: bool = False, noise: int = 0) -> bytes:
    """Deterministic test image: horizontal luminance ramp (strong
    dHash signal), optionally flipped or lightly noised."""
    rnd = random.Random(42)
    out = bytearray()
    for r in range(h):
        for c in range(w):
            v = (255 * c) // max(w - 1, 1)
            if flip:
                v = 255 - v
            if noise:
                v = min(255, max(0, v + rnd.randint(-noise, noise)))
            out += bytes((v, v, v))
    return bytes(out)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_same_pixels_any_container():
    """Re-encoding the same pixels (BMP vs PPM) keeps the fingerprint
    EXACTLY — the property a byte hash cannot give."""
    rgb = _gradient_rgb(32, 24)
    assert dhash_bits(encode_bmp(32, 24, rgb)) == dhash_bits(
        encode_ppm(32, 24, rgb)
    )


def test_dhash_separates_and_tolerates():
    # ramp DOWN: every sampled gradient bit fires (left > right)
    base = dhash_bits(encode_ppm(32, 24, _gradient_rgb(32, 24, flip=True)))
    noisy = dhash_bits(
        encode_ppm(32, 24, _gradient_rgb(32, 24, flip=True, noise=8))
    )
    plain = dhash_bits(encode_ppm(32, 24, _gradient_rgb(32, 24)))
    assert base == -1                      # all 64 bits set, signed -1
    assert plain == 0                      # ramp up: no bit fires
    assert _ham(base, plain) == 64         # reversed gradient: maximal
    assert _ham(base, noisy) <= 6          # light noise: nearby


def test_distributed_matches_local(spark):
    imgs = [
        (1, encode_ppm(16, 16, _gradient_rgb(16, 16))),
        (2, encode_bmp(16, 16, _gradient_rgb(16, 16, flip=True))),
        (3, encode_ppm(9, 8, _gradient_rgb(9, 8, noise=3))),
    ]
    df = spark.createDataFrame(imgs, "asset_id long, payload binary")
    got = {r["asset_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got == {i: dhash_bits(p) for i, p in imgs}


def test_near_dup_pairs_recovers_planted_pair(spark):
    imgs = [
        (1, encode_ppm(32, 24, _gradient_rgb(32, 24))),
        (2, encode_bmp(32, 24, _gradient_rgb(32, 24))),       # same pixels
        (3, encode_ppm(32, 24, _gradient_rgb(32, 24, flip=True))),
    ]
    df = spark.createDataFrame(imgs, "asset_id long, payload binary")
    got = [(r["id_a"], r["id_b"], r["hamming"])
           for r in image_near_dup_pairs(df, max_hamming=3).collect()]
    assert got == [(1, 2, 0)]


def test_on_error_policy(spark):
    imgs = [(1, encode_ppm(8, 8, _gradient_rgb(8, 8))), (2, b"not an image")]
    df = spark.createDataFrame(imgs, "asset_id long, payload binary")
    with pytest.raises(Exception):
        image_dhash(df).collect()          # loud by default (stub policy)
    got = {r["asset_id"]: r["dhash"]
           for r in image_dhash(df, on_error="null").collect()}
    assert got[2] is None and got[1] == dhash_bits(imgs[0][1])
    # NULL fingerprints drop out of pairing entirely
    assert image_near_dup_pairs(df, on_error="null").collect() == []


def test_hamming_pairs_completeness_bruteforce(spark):
    """Pigeonhole guarantee: EVERY pair within the radius is found —
    random 64-bit fingerprints plus planted near pairs."""
    rnd = random.Random(7)

    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    # full 64-bit draws: about half the fingerprints are NEGATIVE
    # longs, exercising Spark's sign-extending shiftright on the top
    # block (the one subtle hazard in the block extraction)
    fps = [signed64(rnd.getrandbits(64)) for _ in range(40)]
    fps += [
        fps[0] ^ 0b101,                    # hamming 2, sign preserved
        signed64((fps[1] & ((1 << 64) - 1)) ^ (1 << 63)),  # sign FLIP, hamming 1
        fps[2],                            # exact duplicate
    ]
    rows = list(enumerate(fps))
    df = spark.createDataFrame(rows, "asset_id long, dhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_pairs(df, max_hamming=3).collect()}
    want = {
        (i, j): _ham(a, b)
        for i, a in rows
        for j, b in rows
        if i < j and _ham(a, b) <= 3
    }
    assert got == want and len(want) >= 3
    assert any(a < 0 or b < 0 for i, a in rows for j, b in rows
               if (i, j) in want)  # negatives actually exercised


def test_fingerprint_width_rejected_up_front(spark):
    from terra_bonobo_nodes_spark.llm.phash import audio_fingerprint, image_dhash

    df = spark.createDataFrame([(1, b"x")], "asset_id long, payload binary")
    with pytest.raises(ValueError, match="64-bit"):
        image_dhash(df, hash_w=16, hash_h=16)    # 256 bits: plan-time error
    with pytest.raises(ValueError, match="64-bit"):
        audio_fingerprint(df, frames=16)          # 128 bits: same


# --- audio fingerprint -------------------------------------------------------

import numpy as np

from terra_bonobo_nodes_spark.llm.codecs import encode_wav
from terra_bonobo_nodes_spark.llm.phash import (
    audio_afp_bits,
    audio_fingerprint,
    audio_near_dup_pairs,
)


def _tone(freqs, n=8192, rate=8000, amp=0.5):
    t = np.arange(n) / rate
    sig = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return amp * sig / max(len(freqs), 1)


def test_audio_fp_amplitude_invariant():
    """Volume scaling moves every band's energy together — the
    gradient bits don't budge (the perceptual property)."""
    loud = encode_wav(8000, _tone([440, 1200], amp=0.8))
    quiet = encode_wav(8000, _tone([440, 1200], amp=0.2))
    assert audio_afp_bits(loud) == audio_afp_bits(quiet)


def test_audio_fp_separates():
    a = audio_afp_bits(encode_wav(8000, _tone([440])))
    b = audio_afp_bits(encode_wav(8000, _tone([3400])))
    assert _ham(a, b) >= 8  # different spectral shapes land far apart


def test_audio_distributed_and_pairs(spark):
    wavs = [
        (1, encode_wav(8000, _tone([440, 1200], amp=0.8))),
        (2, encode_wav(8000, _tone([440, 1200], amp=0.3))),  # same content
        (3, encode_wav(8000, _tone([3400]))),
        (4, b"not a wav"),
    ]
    df = spark.createDataFrame(wavs, "asset_id long, payload binary")
    got = {r["asset_id"]: r["afp"]
           for r in audio_fingerprint(df.where("asset_id < 4")).collect()}
    assert got == {i: audio_afp_bits(p) for i, p in wavs[:3]}
    pairs = [(r["id_a"], r["id_b"], r["hamming"])
             for r in audio_near_dup_pairs(df, on_error="null").collect()]
    assert pairs == [(1, 2, 0)]
    with pytest.raises(Exception):
        audio_near_dup_pairs(df).collect()  # loud by default


def test_block_cap_drops_hot_buckets_deterministically(spark):
    """Adversarial concentration: many DISTINCT fingerprints sharing
    one block value. block_cap excludes that bucket's candidates
    reproducibly; pairs still reachable through an uncapped block
    survive (pigeonhole through the other three blocks)."""
    # 20 distinct fps agree on block 0 (low 16 bits == 0xBEEF) and are
    # far apart elsewhere; plus one pair differing ONLY inside block 0
    hot = [(i, (i << 16) | 0xBEEF) for i in range(1, 21)]
    close = [(100, 0x7000_0000_0000_0001), (101, 0x7000_0000_0000_0003)]
    df = spark.createDataFrame(hot + close, "asset_id long, dhash long")
    capped = {(r["id_a"], r["id_b"]) for r in
              hamming_pairs(df, max_hamming=3, block_cap=10).collect()}
    # the close pair differs only in block 0 bits but AGREES on blocks
    # 1-3, so it survives the cap through an uncapped block
    assert (100, 101) in capped
    uncapped = {(r["id_a"], r["id_b"]) for r in
                hamming_pairs(df, max_hamming=3).collect()}
    assert capped <= uncapped  # the cap only ever removes pairs
    # determinism: same input, same capped set
    again = {(r["id_a"], r["id_b"]) for r in
             hamming_pairs(df, max_hamming=3, block_cap=10).collect()}
    assert again == capped


def test_fingerprints_run_over_readstream(spark, tmp_path):
    """The hashing stage is stateless mapInPandas — it must run
    UNCHANGED over readStream (the curation front-end pin genre)."""
    import uuid

    imgs = [(i, encode_ppm(8, 8, _gradient_rgb(8, 8, noise=i % 5)))
            for i in range(6)]
    path = str(tmp_path / "imgs")
    df = spark.createDataFrame(imgs, "asset_id long, payload binary")
    df.coalesce(2).write.parquet(path)
    stream = image_dhash(
        spark.readStream.schema("asset_id long, payload binary")
        .option("maxFilesPerTrigger", 1).parquet(path)
    )
    assert stream.isStreaming
    name = f"ph_{uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["asset_id"]: r["dhash"]
           for r in spark.sql(f"select * from {name}").collect()}
    assert got == {i: dhash_bits(p) for i, p in imgs}


def test_hamming_pairs_emit_each_pair_exactly_once(spark):
    """r17 optimization pin: the near branch dedups by the
    reporting-block rule (keep a pair only in its FIRST agreeing
    block) instead of a .distinct() over every candidate row — so a
    pair whose fingerprints agree in SEVERAL blocks must still come
    back exactly once, and the collected list (not a set) is how a
    duplicate would show. bits=32 / max_hamming=7 mirrors the headline
    simhash shape (8 four-bit blocks, the weakest blocking in use)."""
    rnd = random.Random(11)

    # simhash_col's domain: NON-NEGATIVE 32-bit values in a BIGINT
    # (the majority sum of 1<<b terms, b < 32); hamming_pairs counts
    # bits over the whole long, so sign-extended negatives would add
    # 32 phantom bits — not a shape the producer emits
    fps = [rnd.getrandbits(32) for _ in range(60)]
    fps += [
        fps[0] ^ 0b1,          # hamming 1: agrees in 7 of 8 blocks
        fps[1] ^ (0b11 << 8),  # hamming 2 inside one block: 7 agree
        fps[2] ^ 0x11010101,   # spread flips: several agreeing blocks
    ]
    rows = list(enumerate(fps))
    df = spark.createDataFrame(rows, "asset_id long, dhash long")
    out = hamming_pairs(
        df, fp_col="dhash", bits=32, max_hamming=7, n_blocks=8
    ).collect()
    got = [(r["id_a"], r["id_b"]) for r in out]
    assert len(got) == len(set(got)), "a pair was emitted more than once"
    want = {
        (i, j): _ham(a, b)
        for i, a in rows
        for j, b in rows
        if i < j and a != b and _ham(a, b) <= 7
    }
    # representatives: exact-duplicate values collapse; none planted
    assert {(r["id_a"], r["id_b"]): r["hamming"] for r in out} == want
    # multi-block agreement really exercised (hamming 1 agrees in 7)
    assert any(h <= 2 for h in want.values())

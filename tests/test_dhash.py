"""Perceptual image dedup (multimodal.dhash_assets /
dhash_hamming_pairs): real 24-bit BMP pixel decode, dHash semantics vs
a Python reference, and the 64-bit pigeonhole banding."""

from __future__ import annotations

import random
import struct

import numpy as np

from rnadam_spark.operators import multimodal as mm


def _bmp_with_pixels(pixels: np.ndarray) -> bytes:
    """Full uncompressed 24-bit bottom-up BMP from an H×W grayscale
    uint8 matrix (each pixel written as BGR = gray,gray,gray)."""
    h, w = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = bytearray()
        for v in row:
            line += bytes([int(v)] * 3)
        line += bytes(row_bytes - len(line))
        body += line
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return bytes(header) + info + bytes(body)


def _py_dhash(gray: np.ndarray, hash_size: int = 8) -> int:
    g = np.atleast_2d(gray)
    if g.shape[0] < hash_size or g.shape[1] < hash_size + 1:
        g = np.resize(g, (max(g.shape[0], hash_size), max(g.shape[1], hash_size + 1)))
    small = np.array(
        [
            [b.mean() for b in np.array_split(r, hash_size + 1, axis=1)]
            for r in np.array_split(g, hash_size, axis=0)
        ]
    ).reshape(hash_size, hash_size + 1)
    v = 0
    for bit in (small[:, 1:] > small[:, :-1]).flatten():
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= 1 << 63 else v


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_bmp_gray_roundtrip():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(10, 7)).astype("uint8")
    gray = mm._bmp_gray(_bmp_with_pixels(px))
    assert gray is not None and gray.shape == (10, 7)
    assert np.allclose(gray, px.astype("float64"))


def test_dhash_matches_python_reference(spark):
    rng = np.random.RandomState(7)
    mats = {i: rng.randint(0, 256, size=(32, 32)).astype("uint8") for i in range(4)}
    rows = [(i, "image", bytearray(_bmp_with_pixels(m)), {}) for i, m in mats.items()]
    got = {
        r.asset_id: r.dhash
        for r in mm.dhash_assets(spark.createDataFrame(rows, mm.ASSETS)).collect()
    }
    for i, m in mats.items():
        assert got[i] == _py_dhash(m.astype("float64")), i


def test_near_duplicate_images_pair_up(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(64, 64)).astype("uint8")
    tweaked = base.copy()
    tweaked[:2, :2] = 255 - tweaked[:2, :2]  # tiny corner edit
    brighter = np.clip(base.astype(int) + 6, 0, 255).astype("uint8")  # global shift
    other = rng.randint(0, 256, size=(64, 64)).astype("uint8")
    rows = [
        (1, "image", bytearray(_bmp_with_pixels(base)), {}),
        (2, "image", bytearray(_bmp_with_pixels(tweaked)), {}),
        (3, "image", bytearray(_bmp_with_pixels(brighter)), {}),
        (4, "image", bytearray(_bmp_with_pixels(other)), {}),
    ]
    hashes = mm.dhash_assets(spark.createDataFrame(rows, mm.ASSETS))
    pairs = {
        (r.asset_a, r.asset_b): r.hamming
        for r in mm.dhash_hamming_pairs(hashes, max_distance=6).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs  # near-dups found
    assert all(4 not in p for p in pairs)  # unrelated image stays unpaired


def test_banding_finds_exactly_the_close_pairs(spark):
    # random 64-bit hashes + planted close pairs: the banded join must
    # agree with the brute-force python answer at the exact threshold
    rng = random.Random(3)
    hashes = {i: rng.getrandbits(64) for i in range(40)}
    hashes[100] = hashes[0] ^ 0b111  # distance 3
    hashes[101] = hashes[1] ^ ((1 << 63) | (1 << 2) | (1 << 40) | 1)  # distance 4
    hashes[102] = hashes[2] ^ ((1 << 50) - 1)  # far away (50 bits)
    signed = {i: v - (1 << 64) if v >= 1 << 63 else v for i, v in hashes.items()}
    df = spark.createDataFrame(list(signed.items()), "asset_id bigint, dhash bigint")
    for d in (3, 4):
        got = {
            (r.asset_a, r.asset_b): r.hamming
            for r in mm.dhash_hamming_pairs(df, max_distance=d).collect()
        }
        want = {
            (a, b): _ham(hashes[a], hashes[b])
            for a in hashes
            for b in hashes
            if a < b and _ham(hashes[a], hashes[b]) <= d
        }
        assert got == want, d


def test_fake_path_is_deterministic(spark):
    rows = [(1, "image", bytearray(b"not an image at all, just bytes" * 4), {})]
    df = spark.createDataFrame(rows, mm.ASSETS)
    a = mm.dhash_assets(df).collect()[0].dhash
    b = mm.dhash_assets(df.repartition(3)).collect()[0].dhash
    assert a == b


def test_video_near_pairs(spark):
    # videos as concatenations of 4 equal-size BMP "frames":
    # sample_frames' equal-byte slicing then recovers each BMP exactly,
    # so the per-frame dHash runs the REAL decode path end-to-end
    rng = np.random.RandomState(23)
    imgs = [rng.randint(0, 256, size=(16, 16)).astype("uint8") for _ in range(8)]
    frames_a = [imgs[0], imgs[1], imgs[2], imgs[3]]
    # shares two frames with A (one brightness-shifted), different ends
    shifted = np.clip(imgs[1].astype(int) + 4, 0, 255).astype("uint8")
    frames_b = [imgs[4], shifted, imgs[2], imgs[5]]
    frames_c = [imgs[6], imgs[7], imgs[6], imgs[7]]  # unrelated
    def vid(frames):
        return bytearray(b"".join(_bmp_with_pixels(f) for f in frames))
    rows = [
        (1, "video", vid(frames_a), {}),
        (2, "video", vid(frames_b), {}),
        (3, "video", vid(frames_c), {}),
    ]
    got = {
        (r.video_a, r.video_b): r.n_frame_matches
        for r in mm.video_near_pairs(
            spark.createDataFrame(rows, mm.ASSETS), min_matching_frames=2
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in p for p in got)


def test_near_dup_image_clusters(spark):
    rng = np.random.RandomState(31)
    base = rng.randint(0, 256, size=(48, 48)).astype("uint8")
    near1 = np.clip(base.astype(int) + 3, 0, 255).astype("uint8")
    near2 = np.clip(base.astype(int) - 3, 0, 255).astype("uint8")
    other = rng.randint(0, 256, size=(48, 48)).astype("uint8")
    rows = [
        (1, "image", bytearray(_bmp_with_pixels(base)), {}),
        (2, "image", bytearray(_bmp_with_pixels(near1)), {}),
        (3, "image", bytearray(_bmp_with_pixels(near2)), {}),
        (4, "image", bytearray(_bmp_with_pixels(other)), {}),
    ]
    got = {
        r.asset_id: (r.component, r.keep)
        for r in mm.near_dup_image_clusters(
            spark.createDataFrame(rows, mm.ASSETS), max_distance=6
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # every image keeps a row
    assert got[1] == (1, True)  # canonical of the near-dup cluster
    assert got[2][0] == 1 and not got[2][1]
    assert got[3][0] == 1 and not got[3][1]
    assert got[4] == (4, True)  # singleton stays its own canonical


def test_hamming_pairs_max_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43)], "asset_id bigint, dhash bigint"
    )
    rows = mm.dhash_hamming_pairs(df, max_distance=0).collect()
    assert {(r.asset_a, r.asset_b, r.hamming) for r in rows} == {(1, 2, 0)}


def test_video_slideshow_counts_distinct_frames(spark):
    rng = np.random.RandomState(41)
    shared = rng.randint(0, 256, size=(16, 16)).astype("uint8")
    others = [rng.randint(0, 256, size=(16, 16)).astype("uint8") for _ in range(3)]
    def vid(frames):
        return bytearray(b"".join(_bmp_with_pixels(f) for f in frames))
    rows = [
        (1, "video", vid([shared] + others[:3]), {}),     # one shared frame
        (2, "video", vid([shared, shared, shared, shared]), {}),  # slideshow
    ]
    pairs = mm.video_near_pairs(
        spark.createDataFrame(rows, mm.ASSETS), min_matching_frames=2
    ).collect()
    # only ONE distinct frame of video 1 matches: not a near-dup pair
    assert pairs == []


def test_dhash_rejects_non64bit_hash_size(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "image", bytearray(b"xx"), {})], mm.ASSETS)
    with _pytest.raises(Exception):
        mm.dhash_assets(df, hash_size=16).collect()

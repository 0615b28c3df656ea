"""Multimodal pipeline: asset → frame-sample → byte-histogram features
→ ANN search, end to end on the driver corpus. The frame sampler is a
stub (no codecs here); the featurizer and every Spark-side contract
(row expansion, Arrow batching, array<double> interop with the
similarity operators) are real."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capital.io import load_table
from capital.llm.multimodal import (
    byte_histogram_features,
    sample_frames,
    text_as_assets,
)
from capital.llm.similarity import cosine_topk

_N_FRAMES = 4
_BINS = 16


def _frames(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    )
    return docs, sample_frames(text_as_assets(docs), n_frames=_N_FRAMES)


def test_frame_sampling_expands_rows_deterministically(spark, sf_dir):
    docs, frames = _frames(spark, sf_dir)
    n_docs = docs.count()
    assert frames.count() == n_docs * _N_FRAMES
    per_asset = frames.groupBy("asset_id").agg(
        F.countDistinct("frame_idx").alias("n")
    )
    assert all(r.n == _N_FRAMES for r in per_asset.collect())
    # Determinism: two runs produce identical frame bytes.
    a = sorted((r.asset_id, r.frame_idx, bytes(r.frame_bytes))
               for r in frames.collect())
    _, frames2 = _frames(spark, sf_dir)
    b = sorted((r.asset_id, r.frame_idx, bytes(r.frame_bytes))
               for r in frames2.collect())
    assert a == b


def test_features_are_unit_norm_histograms(spark, sf_dir):
    _, frames = _frames(spark, sf_dir)
    feats = byte_histogram_features(frames, bins=_BINS)
    rows = feats.collect()
    assert rows
    for r in rows:
        assert len(r.features) == _BINS
        norm = math.sqrt(sum(x * x for x in r.features))
        assert math.isclose(norm, 1.0, abs_tol=1e-9) or norm == 0.0


def test_features_feed_ann_search(spark, sf_dir):
    # The multimodal features must plug straight into the ANN surface:
    # frame 0 of each asset becomes its "embedding"; nearest-neighbor
    # search runs unchanged.
    _, frames = _frames(spark, sf_dir)
    emb = (
        byte_histogram_features(frames, bins=_BINS)
        .filter(F.col("frame_idx") == 0)
        .select(
            F.col("asset_id").alias("vec_id"),
            F.col("features").alias("embedding"),
        )
    )
    queries = emb.filter(F.col("vec_id") < 3)
    topk = cosine_topk(emb, queries, k=3)
    got = {(r.query_id, r.rank) for r in topk.collect()}
    assert len(got) == 3 * 3
    assert all(-1.0 <= r.cosine_sim <= 1.0 for r in topk.collect())


def test_resize_stage_crops_and_pins_bytes(spark, sf_dir):
    """Resize stub: payload crops to target_w*target_h bytes, metadata
    carries the target dims, null payloads survive as r_bytes=0."""
    import hashlib

    from capital.llm.multimodal import resize_assets, text_as_assets

    docs, _ = _frames(spark, sf_dir)
    assets = text_as_assets(docs)
    out = resize_assets(assets, target_w=8, target_h=4).collect()
    raw = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    assert len(out) == len(raw)
    for r in out:
        expect = raw[r.asset_id][: 8 * 4]
        assert (r.width, r.height) == (8, 4)
        assert r.r_bytes == len(expect)
        assert r.checksum == hashlib.md5(expect).hexdigest()

    null_assets = spark.createDataFrame(
        [(99, "application/octet-stream", None, None)],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    row = resize_assets(null_assets).collect()[0]
    assert row.r_bytes == 0 and row.checksum is None


def test_decoder_seam_accepts_real_codec(spark, sf_dir):
    """The codec boundary is a real seam: decode_assets must run any
    compliant Iterator[pd.DataFrame] -> Iterator[pd.DataFrame] kernel
    (here: a 'real' decoder parsing payload bytes as UTF-8 and
    measuring text-level width/height) — proving a Pillow/av kernel
    drops in with no plumbing change."""
    import pandas as pd

    from capital.llm.multimodal import decode_assets, text_as_assets

    def utf8_decoder(batches):
        for pdf in batches:
            texts = pdf["payload"].map(
                lambda b: "" if b is None else bytes(b).decode("utf-8")
            )
            lines = texts.str.split("\n")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "text/plain",
                    "n_bytes": pdf["n_bytes"],
                    # width = longest line, height = line count: real
                    # dimensions derived from actually decoding payload
                    "width": lines.map(
                        lambda ls: max((len(l) for l in ls), default=0)
                    ).astype("int32"),
                    "height": lines.map(len).astype("int32"),
                    "checksum": None,
                }
            )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    decoded = decode_assets(text_as_assets(docs), decoder=utf8_decoder)
    rows = {r.asset_id: r for r in decoded.collect()}
    checks = docs.select("doc_id", "text").collect()
    assert rows and len(rows) == len(checks)
    for c in checks:
        r = rows[c.doc_id]
        ls = c.text.split("\n")
        assert r.media_type == "text/plain"
        assert r.height == len(ls)
        assert r.width == max((len(l) for l in ls), default=0)


def test_mm_neardup_recall_vs_brute_force_on_planted_blobs(spark):
    """Round-10 composition contract (mm_neardup_pairs): byte-histogram
    features + sign-LSH-blocked cosine pairs must recover EVERY planted
    near-duplicate blob pair that brute-force cosine finds at the same
    threshold — recall 1.0 on a synthetic multimodal corpus where
    near-dups are true perturbed copies and the rest are distinct
    byte distributions (the image regime, unlike text-as-bytes)."""
    from capital.llm.multimodal import byte_histogram_features
    from capital.llm.similarity import cosine_neardup_pairs

    import random

    rng = random.Random(7)
    blobs = []
    # 8 distinct "images", one per distinct nibble band, so originals
    # are far apart in histogram space and brute force finds EXACTLY
    # the planted pairs (borderline cross-group pairs would probe the
    # LSH recall curve instead — a different test, tests/test_lsh_recall.py).
    for i in range(8):
        base = bytes(
            rng.randrange(16 * i, 16 * i + 16 + 64) % 256
            for _ in range(4096)
        )
        blobs.append((2 * i, base))
        # Near-dup: flip a handful of bytes (~0.5%) — cosine ≈ 1.
        mutated = bytearray(base)
        for _ in range(20):
            mutated[rng.randrange(4096)] = rng.randrange(256)
        blobs.append((2 * i + 1, bytes(mutated)))
    frames = spark.createDataFrame(
        [(i, 0, b) for i, b in blobs],
        "asset_id long, frame_idx int, frame_bytes binary",
    )
    feats = byte_histogram_features(frames, bins=16, normalize=False)
    vecs = feats.select(
        F.col("asset_id").alias("vec_id"), F.col("features").alias("embedding")
    ).persist()
    threshold = 0.98
    got = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(
            vecs, threshold=threshold, n_planes=4, dim=16
        ).collect()
    }
    # Brute force over the same features (no blocking).
    rows = {r.vec_id: r.embedding for r in vecs.collect()}
    brute = set()
    for a in rows:
        for b in rows:
            if a < b:
                dot = sum(x * y for x, y in zip(rows[a], rows[b]))
                na = math.sqrt(sum(x * x for x in rows[a]))
                nb = math.sqrt(sum(x * x for x in rows[b]))
                if na and nb and dot / (na * nb) >= threshold:
                    brute.add((a, b))
    vecs.unpersist()
    planted = {(2 * i, 2 * i + 1) for i in range(8)}
    assert brute == planted, "fixture broke: brute force must find exactly the planted pairs"
    missed = brute - got
    assert not missed, f"LSH-blocked pairs missed {missed}"
    assert got <= brute, f"false positives vs brute force: {got - brute}"


# --- real codecs (round 13): pure-numpy BMP/PPM --------------------------


def test_codec_round_trips_and_container_independence():
    """encode→decode is the identity for both containers, including
    BMP's 4-byte row padding (w=13 → stride 40, w=1 → stride 4), and
    the decoded-raster checksum is container-independent."""
    import hashlib

    import numpy as np

    from capital.llm.multimodal import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(13)
    for h, w in [(8, 8), (12, 13), (5, 1), (1, 7), (11, 10)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        mt_p, dp = decode_image(encode_ppm(img))
        mt_b, db = decode_image(encode_bmp(img))
        assert (mt_p, mt_b) == ("image/x-portable-pixmap", "image/bmp")
        assert (
            hashlib.md5(dp.tobytes()).hexdigest()
            == hashlib.md5(db.tobytes()).hexdigest()
        )


def test_ppm_header_comments_and_topdown_bmp():
    import struct

    import numpy as np

    from capital.llm.multimodal import decode_bmp, decode_ppm, encode_bmp

    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    hdr = b"P6 # comment\n# another\n  4\t3\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(hdr), img)
    # Flip the height sign: the same raster bytes now mean top-down,
    # so the decoded image is the bottom-up read flipped vertically.
    bmp = bytearray(encode_bmp(img))
    struct.pack_into("<i", bmp, 22, -3)
    assert np.array_equal(decode_bmp(bytes(bmp)), img[::-1])


def test_real_decode_assets_over_spark_with_dead_letter(spark):
    """The real decoder parses genuine BMP/PPM payloads distributed
    over mapInPandas, and dead-letters (null metadata) a corrupt blob
    instead of failing the batch."""
    import hashlib

    import numpy as np

    from capital.llm.multimodal import (
        encode_bmp,
        encode_ppm,
        real_decode_assets,
    )

    rng = np.random.default_rng(99)
    img_a = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, size=(4, 13, 3), dtype=np.uint8)
    rows = [
        (1, "image/x-portable-pixmap", encode_ppm(img_a), 0),
        (2, "image/bmp", encode_bmp(img_b), 0),
        (3, "application/octet-stream", b"\x00garbage", 0),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary, n_bytes long"
    )
    got = {r.asset_id: r for r in real_decode_assets(assets).collect()}
    assert (got[1].width, got[1].height) == (9, 6)
    assert (got[2].width, got[2].height) == (13, 4)
    assert got[1].checksum == hashlib.md5(img_a.tobytes()).hexdigest()
    assert got[2].checksum == hashlib.md5(img_b.tobytes()).hexdigest()
    assert got[2].media_type == "image/bmp"
    flat = img_a.reshape(-1).astype(np.int64)
    assert got[1].pix_sum == int(flat.sum())
    assert got[1].pix_dot == int(
        (flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum()
    )
    # dead letter: metadata null, byte count kept
    assert got[3].width is None and got[3].checksum is None
    assert got[3].n_bytes == len(b"\x00garbage")


def test_real_resize_nearest_neighbor_matches_numpy(spark):
    import hashlib

    import numpy as np

    from capital.llm.multimodal import (
        encode_bmp,
        real_resize_batch,
        resize_assets,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(7, "image/bmp", encode_bmp(img), 0)],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    tw, th = 12, 8
    row = resize_assets(
        assets, resizer=real_resize_batch(tw, th)
    ).collect()[0]
    ys = (np.arange(th) * 32) // th
    xs = (np.arange(tw) * 48) // tw
    expected = np.ascontiguousarray(img[ys][:, xs])
    assert (row.width, row.height) == (tw, th)
    assert row.checksum == hashlib.md5(expected.tobytes()).hexdigest()


def test_decoded_pixels_feed_features_and_ann(spark):
    """VERDICT r12 ask: byte_histogram_features + near-dup cosine over
    GENUINELY decoded pixels. Planted near-identical images (one in
    each container) must pair up; a noise image must not."""
    import numpy as np

    from capital.llm.multimodal import (
        byte_histogram_features,
        decoded_raster_frames,
        encode_bmp,
        encode_ppm,
    )
    from capital.llm.similarity import cosine_neardup_pairs

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (near[0, 0] + 1) % 256  # one-pixel perturbation
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [
            (0, "x", encode_ppm(base), 0),
            (1, "x", encode_bmp(near), 0),  # other container, same pixels
            (2, "x", encode_ppm(other), 0),
        ],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    frames = decoded_raster_frames(assets)
    feats = byte_histogram_features(frames, bins=16, normalize=False)
    vecs = feats.select(
        F.col("asset_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(
            vecs, threshold=0.999, n_planes=2, dim=16
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


# --- real audio/video containers (round 13): WAV PCM + Y4M ----------------


def test_wav_round_trip_and_chunk_walk():
    import struct

    import numpy as np

    from capital.llm.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(3)
    for n, ch in [(100, 1), (333, 2), (1, 1)]:
        s = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
        rate, dec = decode_wav(
            encode_wav(s[:, 0] if ch == 1 else s, 44100)
        )
        assert rate == 44100 and np.array_equal(dec, s.reshape(n, ch))
    # non-canonical writer: LIST chunk inserted before fmt/data — the
    # chunk walker must skip it.
    mono = rng.integers(-32768, 32768, size=64, dtype=np.int16)
    raw = encode_wav(mono, 8000)
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, dec = decode_wav(patched)
    assert rate == 8000 and np.array_equal(dec[:, 0], mono)


def test_y4m_round_trip_and_real_frame_sampling(spark):
    import numpy as np

    from capital.llm.multimodal import (
        decode_y4m_frames,
        encode_y4m,
        y4m_sample_frames,
    )

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(9, 6, 8), dtype=np.uint8)
    w, h, dec = decode_y4m_frames(encode_y4m(frames))
    assert (w, h, len(dec)) == (8, 6, 9)
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    assets = spark.createDataFrame(
        [
            (1, "video/x-yuv4mpeg", encode_y4m(frames), 0),
            (2, "junk", b"\x00nope", 0),  # dead-letters (skipped)
        ],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    rows = y4m_sample_frames(assets, n_frames=4).collect()
    got = {(r.asset_id, r.frame_idx): bytes(r.frame_bytes) for r in rows}
    assert len(rows) == 4 and all(a == 1 for a, _ in got)
    # evenly spaced: step = 9 // 4 = 2 → frames 0, 2, 4, 6
    for i, fidx in enumerate([0, 2, 4, 6]):
        assert got[(1, i)] == frames[fidx].tobytes()


def test_wav_window_features_hand_computed(spark):
    import numpy as np

    from capital.llm.multimodal import encode_wav, wav_window_features

    # 8 samples, 4 windows of 2: signs + - | 0 + | - - | + -
    mono = np.array([5, -3, 0, 7, -2, -4, 9, -1], dtype=np.int16)
    assets = spark.createDataFrame(
        [(7, "audio/wav", encode_wav(mono, 8000), 0)],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    rows = {r.window_idx: r for r in wav_window_features(assets, 4).collect()}
    assert len(rows) == 4
    assert rows[0].sum_amp == 2 and rows[0].sum_sq == 34
    assert rows[0].zero_crossings == 1  # + → -
    assert rows[1].sum_amp == 7 and rows[1].zero_crossings == 0  # 0 dropped
    assert rows[2].sum_amp == -6 and rows[2].zero_crossings == 0
    assert rows[3].zero_crossings == 1  # + → -
    assert all(r.sample_rate == 8000 and r.n_samples == 8 for r in rows.values())


def test_y4m_frames_feed_histogram_features(spark):
    """Real video frames → the ANN-ready featurizer: planted
    near-identical videos pair up through genuinely decoded lumas."""
    import numpy as np

    from capital.llm.multimodal import (
        byte_histogram_features,
        encode_y4m,
        y4m_sample_frames,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(4, 8, 8), dtype=np.uint8)
    near = base.copy()
    near[0, 0, 0] = (near[0, 0, 0] + 1) % 256
    assets = spark.createDataFrame(
        [(0, "v", encode_y4m(base), 0), (1, "v", encode_y4m(near), 0)],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    feats = byte_histogram_features(
        y4m_sample_frames(assets, n_frames=2), bins=16, normalize=False
    ).collect()
    by_key = {(r.asset_id, r.frame_idx): r.features for r in feats}
    # frame 1 identical across the two assets; frame 0 differs by one
    # histogram count
    assert by_key[(0, 1)] == by_key[(1, 1)]
    diff = sum(abs(a - b) for a, b in zip(by_key[(0, 0)], by_key[(1, 0)]))
    assert diff in (0, 2)  # one byte moved bins (or stayed in-bin)


def test_synthesized_y4m_decodes_to_formula(spark, sf_dir):
    """The synthetic video corpus must decode back to its generating
    formula (pins synthesize_y4m_assets ↔ decode_y4m_frames against
    each other on real driver ids)."""
    import numpy as np

    from capital.io import load_table
    from capital.llm.multimodal import (
        decode_y4m_frames,
        synthesize_y4m_assets,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(20)
    rows = synthesize_y4m_assets(docs).collect()
    assert rows
    for r in rows:
        did = int(r.asset_id)
        nf, w, h = 3 + did % 5, 8 + (did % 3) * 2, 6 + (did % 2) * 2
        gw, gh, frames = decode_y4m_frames(bytes(r.payload))
        assert (gw, gh, len(frames)) == (w, h, nf)
        for f, plane in enumerate(frames):
            p = np.arange(h * w, dtype=np.int64)
            expected = ((did * 37 + f * 101 + p * 13) % 256).astype(
                np.uint8
            ).reshape(h, w)
            assert np.array_equal(plane, expected)


def test_truncated_after_magic_raises_value_error_not_struct_error():
    """A payload truncated AFTER a valid magic hits struct.unpack_from
    mid-header; the decoders must surface that as ValueError (the
    dead-letter kernels' corrupt-blob contract catches ValueError
    only — round-13 advice)."""
    import numpy as np
    import pytest

    from capital.llm.multimodal import (
        decode_bmp,
        decode_image,
        decode_wav,
        encode_wav,
    )

    for payload in (b"BM", b"BM\x00\x01\x02\x03\x04"):
        with pytest.raises(ValueError):
            decode_bmp(payload)
        with pytest.raises(ValueError):
            decode_image(payload)
    # WAVE with a valid RIFF magic but a truncated fmt chunk body.
    wav = bytearray(
        encode_wav(np.zeros((4, 1), dtype=np.int16), 8000)
    )
    fmt_at = bytes(wav).index(b"fmt ")
    with pytest.raises(ValueError):
        decode_wav(bytes(wav[: fmt_at + 10]))
    # Forged channel count of zero must not reach the reshape.
    import struct

    struct.pack_into("<H", wav, fmt_at + 10, 0)
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))


def test_truncated_after_magic_dead_letters_over_spark(spark):
    """End-to-end: truncated-after-magic blobs ride the mapInPandas
    dead-letter path (null metadata) instead of killing the stage."""
    import numpy as np

    from capital.llm.multimodal import encode_bmp, real_decode_assets

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    rows = [
        (1, "image/bmp", encode_bmp(img), 0),
        (2, "image/bmp", b"BM\x01\x02\x03\x04\x05", 0),
        (3, "audio/wav", b"RIFF\x04\x00\x00\x00WAVE", 0),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary, n_bytes long"
    )
    got = {r.asset_id: r for r in real_decode_assets(assets).collect()}
    assert got[1].width == 2 and got[1].checksum is not None
    assert got[2].width is None and got[2].checksum is None
    assert got[3].width is None and got[3].checksum is None


def test_png_short_ihdr_with_valid_crc_raises_value_error():
    """A PNG chunk CRC validates ANY body length, so a 12-byte IHDR
    with a correct checksum reaches the header unpack — decode_png
    must surface that as ValueError, not struct.error (the round-14
    review reproduction of the round-13 dead-letter class)."""
    import struct
    import zlib

    import pytest

    from capital.llm.multimodal import _PNG_MAGIC, decode_png

    body = b"\x00" * 12  # one byte short of the 13-byte IHDR
    chunk = (
        struct.pack(">I", len(body))
        + b"IHDR"
        + body
        + struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(_PNG_MAGIC + chunk)

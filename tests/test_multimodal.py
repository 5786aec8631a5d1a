"""Multimodal funnel: golden/property tests mirroring the reference's
checkpoint probes (a2_ahuja_output.txt:1-13)."""

from __future__ import annotations

import numpy as np

from big_data_analytics_cse545_spark.operators import multimodal as mm


def test_chunk_signature_residual_rule():
    """I9 exact semantics: residual elements spread one-per-chunk over the
    first len%n chunks (a2_ahuja.py:104-119)."""
    vec = list(range(10))  # 10 elements, 8 chunks → chunks of 2,2,1,1,1,1,1,1
    sig = mm.chunk_signature(vec, n_chunks=8, idx=0)
    assert len(sig) == 8
    import hashlib

    assert sig[0] == hashlib.md5(b"0,1").hexdigest()[0]
    assert sig[1] == hashlib.md5(b"2,3").hexdigest()[0]
    assert sig[2] == hashlib.md5(b"4").hexdigest()[0]
    # deterministic: same input → same signature
    assert sig == mm.chunk_signature(vec, n_chunks=8, idx=0)


def test_tiling_fanout_and_shapes(spark, sf_smoke):
    imgs = mm.images_df(spark, sf_smoke).limit(0)  # schema check only
    assert [f.name for f in imgs.schema] == [
        "img_id", "content", "width", "height", "channels",
    ]
    small = mm.images_df(spark, sf_smoke).filter("img_id in ('img0','img1')")
    tiles = mm.tile_images(small).collect()
    assert len(tiles) == 2 * (mm.H // mm.TILE) * (mm.W // mm.TILE)
    ids = sorted(r["tile_id"] for r in tiles)
    assert ids[0] == "img0-0" and "img1-3" in ids
    assert all(
        len(r["content"]) == mm.TILE * mm.TILE * mm.CHANNELS for r in tiles
    )


def test_feature_vector_domain_and_length(spark, sf_smoke):
    small = mm.images_df(spark, sf_smoke).filter("img_id = 'img0'")
    feats = mm.gradient_features(mm.tile_intensity(mm.tile_images(small))).collect()
    n = mm.TILE // mm.POOL
    expected_len = 2 * n * (n - 1)  # a2_ahuja.py:77-87
    for r in feats:
        assert len(r["features"]) == expected_len
        assert set(r["features"]) <= {-1, 0, 1}


def test_funnel_recalls_planted_duplicates(spark, sf_smoke):
    """ids ≡ 9 (mod 10) are noisy copies of id−1: the funnel must pair
    their tiles (the reference's candidate-recall acceptance, A2 PDF p.3)."""
    rows = mm.m01_image_similarity_funnel(spark, sf_smoke).collect()
    pairs = {(r["t1"], r["t2"]) for r in rows}
    assert pairs, "funnel found no candidates"
    planted_hits = sum(
        1
        for t1, t2 in pairs
        if t1.split("-")[1] == t2.split("-")[1]
        and abs(int(t1.split("-")[0][3:]) - int(t2.split("-")[0][3:])) == 1
    )
    assert planted_hits >= 10, f"too few planted pairs recalled: {planted_hits}"


def test_intensity_matches_numpy_reference(spark, sf_smoke):
    """Pin the I5/I6 math: mean(RGB)·(IR/100) then block mean — recompute
    in straight numpy from the same payload (the reference's pixel-probe
    golden check, a2_ahuja_output.txt:1-5)."""
    small = mm.images_df(spark, sf_smoke).filter("img_id = 'img0'")
    payload = {r["tile_id"]: r for r in mm.tile_images(small).collect()}
    got = {r["tile_id"]: r["intensity"] for r in mm.tile_intensity(mm.tile_images(small)).collect()}
    n = mm.TILE // mm.POOL
    for tile_id, row in payload.items():
        t = np.frombuffer(row["content"], dtype=np.uint8).reshape(
            mm.TILE, mm.TILE, mm.CHANNELS
        )
        inten = t[:, :, :3].mean(axis=2) * (t[:, :, 3].astype(np.float64) / 100.0)
        pooled = inten.reshape(n, mm.POOL, n, mm.POOL).mean(axis=(1, 3))
        assert np.allclose(got[tile_id], pooled.ravel())


def test_video_frame_sampling(spark, sf_smoke):
    """m02: 8-frame videos sampled every 4th frame → frames 0 and 4 per
    video, deterministic fingerprints."""
    rows = mm.m02_video_frame_sample(spark, sf_smoke).collect()
    by_vid: dict[str, list] = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r["frame_no"])
    assert by_vid, "no videos sampled"
    for vid, frames in by_vid.items():
        assert sorted(frames) == [0, 4], f"{vid}: {frames}"
    again = {
        (r["video_id"], r["frame_no"]): r["frame_md5"]
        for r in mm.m02_video_frame_sample(spark, sf_smoke).collect()
    }
    assert all(again[(r["video_id"], r["frame_no"])] == r["frame_md5"] for r in rows)

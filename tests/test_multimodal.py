"""Multimodal funnel: golden/property tests mirroring the reference's
checkpoint probes (a2_ahuja_output.txt:1-13)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

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
    # selectivity (A2 PDF p.3 acceptance: candidates stay rare — the
    # reference tunes bandwidth for 10-30 per query): per-tile candidate
    # count bounded, total a vanishing fraction of all pairs
    from collections import Counter

    per_tile = Counter()
    for t1, t2 in pairs:
        per_tile[t1] += 1
        per_tile[t2] += 1
    n_tiles = 500 * (mm.H // mm.TILE) * (mm.W // mm.TILE)
    assert max(per_tile.values()) <= 30, f"selectivity: {max(per_tile.values())}/tile"
    assert len(pairs) <= 0.01 * n_tiles * (n_tiles - 1) // 2, len(pairs)


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


def test_m06_matches_oracle_and_m02_rowset(spark, sf_smoke):
    """m06 is m02's hash-checkable integer core: its DuckDB oracle must
    hash-match (driver contract), its (video_id, frame_no) row set must
    equal m02's EXACTLY (same pipeline, same fan-out), and every demuxed
    frame must be exactly H·W·C bytes — the size a dropped channel or a
    truncated container parse would break."""
    from tests.oracle_utils import assert_parity

    df = mm.m06_frame_index_relational(spark, sf_smoke)
    assert_parity(df, mm.ORACLE["m06_frame_index_relational"], sf_smoke, "m06")
    rows = df.collect()
    assert rows and all(r["frame_bytes"] == mm.H * mm.W * mm.CHANNELS for r in rows)
    m02_keys = {
        (r["video_id"], r["frame_no"])
        for r in mm.m02_video_frame_sample(spark, sf_smoke).collect()
    }
    assert {(r["video_id"], r["frame_no"]) for r in rows} == m02_keys


def test_bit_bands_match_hand_computation(spark):
    """Reference-exact banding arithmetic (computeBuckets2,
    a2_ahuja.py:140-149): 128 hex chars -> 512-bit string -> 39 bands of
    13 bits, trailing 5 bits dropped — verified against a hand-computed
    slicing of a fixed signature."""
    sig = "deadbeef" * 16
    bits = "".join(f"{int(c, 16):04b}" for c in sig)
    assert len(bits) == mm.REF_SIG_BITS == 512
    expect = [
        int(bits[b * mm.REF_BANDWIDTH : (b + 1) * mm.REF_BANDWIDTH], 2)
        for b in range(mm.REF_N_BANDS)
    ]
    assert mm.REF_N_BANDS == 39
    got = (
        spark.createDataFrame([(sig,)], "signature string")
        .select(mm.bit_bands_col().alias("b"))
        .first()["b"]
    )
    assert got == expect
    # the Python twin used inside the Arrow funnel must agree with the
    # JVM expression exactly
    assert mm.ref_bands_py(sig) == expect


def test_ref_signature_parameters():
    """The m03 signature uses the reference's exact chunking: 128 chunks,
    md5 hex index 1, width 1 (a2_ahuja.py:99-120,231). Residual rule:
    first len%128 chunks get the extra element."""
    vec = list(range(760))
    sig = mm.chunk_signature(
        vec, n_chunks=mm.REF_N_CHUNKS, idx=mm.REF_SIG_IDX, width=1
    )
    assert len(sig) == 128
    # hand-check chunk 0: 760 = 5*128 + 120 -> first 120 chunks are 6 long
    import hashlib

    first = hashlib.md5(",".join(str(x) for x in vec[:6]).encode()).hexdigest()[1]
    assert sig[0] == first


def test_binaryfile_funnel_recall_and_selectivity(spark, sf_smoke):
    """m03 (real binaryFile source, reference-exact banding): every
    planted near-duplicate tile pair must be a candidate, and the
    banding must stay selective — the A2 acceptance property (PDF p.3,
    ~10-30 candidates per query at reference scale; here the corpus is
    256 tiles so the bound is expressed as a per-tile ceiling and a
    global fraction)."""
    pairs = {
        (r["t1"], r["t2"])
        for r in mm.m03_binaryfile_ref_funnel(spark, sf_smoke).collect()
    }
    planted = [
        (f"img{i-1}-{k}", f"img{i}-{k}")
        for i in range(9, mm.N_BINARY_FILES, 10)
        for k in range(4)
    ]
    missed = [p for p in planted if p not in pairs]
    assert not missed, f"planted near-dup tiles not recalled: {missed}"
    n_tiles = mm.N_BINARY_FILES * 4
    all_pairs = n_tiles * (n_tiles - 1) // 2
    assert len(pairs) <= 0.05 * all_pairs, (
        f"banding not selective: {len(pairs)}/{all_pairs} pairs are candidates"
    )
    from collections import Counter

    per_tile = Counter()
    for a, b in pairs:
        per_tile[a] += 1
        per_tile[b] += 1
    assert max(per_tile.values()) <= 30, (
        f"a tile has {max(per_tile.values())} candidates (> A2 ceiling 30)"
    )


def test_fused_funnel_matches_staged(spark, sf_smoke):
    """The fused single-stage kernel must be bit-identical to the staged
    tile→intensity→gradient→signature composition, for both the m01
    parameters and the reference-exact m03 parameters (incl. bands)."""
    imgs = mm.images_df(spark, sf_smoke).filter(
        "img_id in ('img0','img1','img8','img9')"
    )
    staged = {
        r["tile_id"]: r["signature"]
        for r in mm.signatures(
            mm.gradient_features(mm.tile_intensity(mm.tile_images(imgs)))
        ).collect()
    }
    fused = {r["tile_id"]: r["signature"] for r in mm.fused_signatures(imgs).collect()}
    assert fused == staged and len(fused) == 16
    staged_ref = {
        r["tile_id"]: (r["signature"], list(r["bands"]))
        for r in mm.ref_signatures(
            mm.gradient_features(
                mm.tile_intensity(mm.tile_images(imgs), pool=1), pool=1
            )
        ).collect()
    }
    fused_ref = {
        r["tile_id"]: (r["signature"], list(r["bands"]))
        for r in mm.fused_signatures(
            imgs,
            pool=1,
            n_chunks=mm.REF_N_CHUNKS,
            idx=mm.REF_SIG_IDX,
            width=1,
            ref_bands=True,
        ).collect()
    }
    assert fused_ref == staged_ref


def test_zip_member_extraction_and_codec_fallback():
    """I1/I3 container handling: a ZIP payload has its '.tif' member
    located by suffix (a2_ahuja.py:13-24) and decodes to the same tensor
    as the raw payload; non-zip payloads pass through unchanged."""
    import io
    import zipfile

    payload = mm._image_bytes(3)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("metadata.txt", "not the image")
        zf.writestr("scene-3.tif", payload)
    zipped = buf.getvalue()
    assert mm._zip_tif_member(zipped) == payload
    assert mm._zip_tif_member(payload) is None
    a = mm.decode_image(zipped, mm.W, mm.H, mm.CHANNELS)
    b = mm.decode_image(payload, mm.W, mm.H, mm.CHANNELS)
    assert np.array_equal(a, b)


def test_real_codec_decode_when_available():
    """The decode path must take a REAL image parse in every container:
    tifffile or PIL when installed (production), else the built-in
    baseline TIFF reader — no skip, this runs everywhere."""
    import io

    try:
        import tifffile  # noqa: F401

        have = "tifffile"
    except ImportError:
        try:
            from PIL import Image  # noqa: F401

            have = "PIL"
        except ImportError:
            have = "builtin"
    arr = np.arange(mm.H * mm.W * mm.CHANNELS, dtype=np.uint8).reshape(
        mm.H, mm.W, mm.CHANNELS
    )
    if have == "tifffile":
        import tifffile

        buf = io.BytesIO()
        tifffile.imwrite(buf, arr)
        payload = buf.getvalue()
    elif have == "PIL":
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="TIFF")
        payload = buf.getvalue()
    else:
        payload = mm._tiff_encode(arr)
    decoded = mm.decode_image(payload, mm.W, mm.H, mm.CHANNELS)
    assert np.array_equal(decoded, arr)


def test_builtin_tiff_reader_against_hand_assembled_file():
    """_tiff_decode checked against an INDEPENDENTLY hand-assembled TIFF
    (big-endian, single strip, inline value fields — none of which
    _tiff_encode emits) so reader and writer can't share a bug."""
    import struct

    h, w = 2, 3
    pixels = bytes([10, 20, 30, 40, 50, 60])
    # header: MM, magic 42, IFD at 8 + len(pixels)
    out = struct.pack(">2sHI", b"MM", 42, 8 + len(pixels)) + pixels

    def tag(t, typ, cnt, val4):
        return struct.pack(">HHI", t, typ, cnt) + val4

    short = lambda v: struct.pack(">H", v) + b"\x00\x00"  # noqa: E731
    long_ = lambda v: struct.pack(">I", v)  # noqa: E731
    entries = [
        tag(256, 4, 1, long_(w)),        # ImageWidth
        tag(257, 4, 1, long_(h)),        # ImageLength
        tag(258, 3, 1, short(8)),        # BitsPerSample
        tag(259, 3, 1, short(1)),        # uncompressed
        tag(262, 3, 1, short(1)),        # grayscale
        tag(273, 4, 1, long_(8)),        # StripOffsets → pixel data
        tag(277, 3, 1, short(1)),        # SamplesPerPixel
        tag(278, 4, 1, long_(h)),        # RowsPerStrip (single strip)
        tag(279, 4, 1, long_(len(pixels))),  # StripByteCounts
    ]
    out += struct.pack(">H", len(entries)) + b"".join(entries)
    out += struct.pack(">I", 0)
    decoded = mm._tiff_decode(out)
    assert decoded is not None and decoded.shape == (h, w)
    assert np.array_equal(decoded, np.frombuffer(pixels, np.uint8).reshape(h, w))
    # beyond-baseline features must return None, not garbage
    lzw = out.replace(tag(259, 3, 1, short(1)), tag(259, 3, 1, short(5)))
    assert mm._tiff_decode(lzw) is None
    assert mm._tiff_decode(b"II\x00\x00rubbish") is None


def test_fixture_payloads_are_real_tiffs_decoded_by_the_parser():
    """The m01/m03 payloads are REAL uncompressed TIFFs: the builtin
    parser (not the reshape fallback) must reproduce _image_bytes'
    pixels, including multi-strip assembly (40 rows / 16-row strips)."""
    for base_id in (0, 9, 17):
        payload = mm._tiff_image_bytes(base_id)
        assert payload[:2] == b"II" and payload[2:4] == b"*\x00"
        parsed = mm._tiff_decode(payload)
        assert parsed is not None, "fixture must parse as TIFF"
        expected = np.frombuffer(mm._image_bytes(base_id), np.uint8).reshape(
            mm.H, mm.W, mm.CHANNELS
        )
        assert np.array_equal(parsed, expected)
        # decode_image must agree (zip + codec route end to end)
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("x.tif", payload)
        assert np.array_equal(
            mm.decode_image(buf.getvalue(), mm.W, mm.H, mm.CHANNELS), expected
        )


def test_m05_materialized_signatures_match_the_spark_kernel(spark):
    """The parquet relation m05 and its DuckDB oracle read must equal
    what the Spark fused_signatures stage computes over the same images
    — the drift gate that makes m05's oracle a check on the REAL funnel
    tail, not on a parallel reimplementation."""
    import pandas as pd
    import pyarrow.parquet as pq

    stored = (
        pq.read_table(mm._signature_parquet_dir())
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    assert len(stored) == mm.N_SIG_FIXTURE_IMAGES * (mm.H // mm.TILE) * (
        mm.W // mm.TILE
    )
    imgs = spark.createDataFrame(
        pd.DataFrame(
            {
                "img_id": [f"img{i}" for i in range(mm.N_SIG_FIXTURE_IMAGES)],
                "content": [
                    mm._tiff_image_bytes(i) for i in range(mm.N_SIG_FIXTURE_IMAGES)
                ],
                "width": mm.W,
                "height": mm.H,
                "channels": mm.CHANNELS,
            }
        )
    )
    live = (
        mm.fused_signatures(imgs)
        .toPandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(stored, live)


def test_demux_video_fallback_and_validation():
    """demux_video's raw-tensor fallback (now only for opaque non-
    container payloads) must reproduce the payload exactly and reject
    metadata mismatches — the video twin of the I3 zip/codec test."""
    import pytest

    n, h, w, c = 4, mm.H, mm.W, mm.CHANNELS
    arr = np.arange(n * h * w * c, dtype=np.uint8).reshape(n, h, w, c)
    out = mm.demux_video(arr.tobytes(), n, w, h, c)
    assert np.array_equal(out, arr)
    assert mm._codec_demux(arr.tobytes()) is None  # raw tensor, no container
    with pytest.raises(ValueError, match="payload/metadata mismatch"):
        mm.demux_video(arr.tobytes(), n + 1, w, h, c)


def test_real_video_demux_when_available():
    """The demux path must take a REAL container parse in every
    container: PyAV (lossless x264rgb mp4) when installed (production),
    else the built-in baseline AVI demuxer — no skip, runs everywhere."""
    import io

    n, h, w, c = 4, 32, 32, 3
    frames = [
        np.full((h, w, c), 16 * (f + 1), dtype=np.uint8) for f in range(n)
    ]
    try:
        import av
    except ImportError:
        av = None
    if av is not None:
        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp4") as container:
            stream = container.add_stream("libx264rgb", rate=4)
            stream.width, stream.height = w, h
            stream.pix_fmt = "rgb24"
            stream.options = {"qp": "0"}  # lossless, tensors compare exactly
            for f in frames:
                for packet in stream.encode(
                    av.VideoFrame.from_ndarray(f, format="rgb24")
                ):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        payload = buf.getvalue()
    else:
        payload = mm._avi_encode(np.stack(frames))
    decoded = mm.demux_video(payload, n, w, h, c)
    assert np.array_equal(decoded, np.stack(frames))


def test_builtin_avi_demux_against_hand_assembled_file():
    """_avi_decode checked against an INDEPENDENTLY hand-assembled AVI
    (TOP-DOWN rows via negative biHeight, 24-bpp, padded stride — none
    of which _avi_encode emits) so demuxer and muxer can't share a bug;
    plus round-trip and beyond-baseline rejection."""
    import struct

    h, w, c = 2, 3, 3
    # rows top-down, BGR, stride padded 9 → 12
    px = np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c)
    rows = []
    for r in range(h):
        bgr = px[r, :, ::-1].reshape(-1)
        rows.append(bytes(bgr) + b"\x00\x00\x00")
    fb = b"".join(rows)

    def chunk(fourcc, data):
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b""
        )

    strf = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(fb), 0, 0, 0, 0)
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, len(fb), 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    avih = struct.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, len(fb), w, h, 0, 0, 0, 0)
    hdrl = chunk(
        b"LIST",
        b"hdrl"
        + chunk(b"avih", avih)
        + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", fb))
    body = b"AVI " + hdrl + movi
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    decoded = mm._avi_decode(raw)
    assert decoded is not None and decoded.shape == (1, h, w, c)
    assert np.array_equal(decoded[0], px)
    # compressed stream (MJPG) must be refused, not garbled
    mjpg = raw.replace(
        struct.pack("<IiiHH I".replace(" ", ""), 40, w, -h, 1, 24, 0),
        struct.pack("<IiiHHI", 40, w, -h, 1, 24, 0x47504A4D),
    )
    assert mm._avi_decode(mjpg) is None
    assert mm._avi_decode(b"RIFF\x00\x00\x00\x00WAVE") is None
    # round-trip through the muxer, 4-channel
    arr = np.arange(2 * 4 * 5 * 4, dtype=np.uint8).reshape(2, 4, 5, 4)
    assert np.array_equal(mm._avi_decode(mm._avi_encode(arr)), arr)


def test_m02_fixture_payloads_are_real_avi_containers():
    """m02's video payloads must be real AVI containers that the
    builtin demuxer parses back to the exact synthesized tensor."""
    rng = np.random.default_rng(5_000_000)
    vid = rng.integers(0, 256, size=(8, mm.H, mm.W, mm.CHANNELS), dtype=np.uint8)
    payload = mm._avi_encode(vid)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    parsed = mm._avi_decode(payload)
    assert parsed is not None and np.array_equal(parsed, vid)


def test_m01_empty_corpus_yields_empty_result(spark, tmp_path):
    """Round 6 moved m01's source to a real binaryFile scan over a
    per-sf .tif fixture — an EMPTY corpus now means a fixture dir with
    zero matching files, which must still yield 0 rows with the right
    schema (binaryFile's schema is fixed, so no inference failure)."""
    import os

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "m01_empty")
    os.makedirs(d)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.slice(0, 0), os.path.join(d, f))
    out = mm.m01_image_similarity_funnel(spark, d)
    assert out.count() == 0
    assert out.columns == ["t1", "t2", "n_bands"]


def test_m01_fixture_memo_detects_inplace_rewrite(tmp_path):
    """The fixture-dir memo must not serve a stale .tif set when the
    embeddings parquet is rewritten IN PLACE with identical byte size
    inside the filesystem's mtime granularity — exactly the chaos-
    rewrite case the digest exists for (round-6 advice). mtime and size
    are pinned by monkeypatch so only the content fingerprint can tell
    the two corpora apart."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_analytics_cse545_spark.operators import multimodal as mmod

    d = str(tmp_path / "sf_memo")
    os.makedirs(d)
    src = os.path.join(d, "embeddings.parquet")

    def write_ids(ids):
        pq.write_table(pa.table({"vec_id": pa.array(ids, pa.int64())}), src)
        os.utime(src, (1234567890.0, 1234567890.0))  # pin mtime exactly

    write_ids([1, 2, 3])
    size_first = os.path.getsize(src)
    first = mmod._m01_fixture_dir(d)
    files_first = sorted(os.listdir(first))
    write_ids([4, 5, 6])  # in-place rewrite, same mtime
    assert os.path.getsize(src) == size_first, (
        "fixture premise broken: the two corpora must be byte-size twins"
    )
    second = mmod._m01_fixture_dir(d)
    files_second = sorted(os.listdir(second))
    assert files_first == ["img1.tif", "img2.tif", "img3.tif"]
    assert files_second == ["img4.tif", "img5.tif", "img6.tif"], (
        "stale memo: the rewritten corpus must get a fresh fixture set"
    )


def test_factor_fork_reuses_persisted_tiles(spark, sf_smoke):
    """The reference's extra-credit fork (a2_ahuja.py:322-406,431-433):
    both pooling factors run off ONE persisted tiles relation — the
    decode accumulator must count each image exactly once, not once per
    branch, and both branches must produce full, distinct signatures."""
    acc = spark.sparkContext.accumulator(0)
    wanted = [f"img{i}" for i in range(8)]
    imgs = mm.images_df(spark, sf_smoke).filter(
        F.col("img_id").isin(wanted)
    )
    tiles, branches = mm.funnel_fork(imgs, pools=(2, 1), decode_counter=acc)
    try:
        got = {p: df.collect() for p, df in branches.items()}
    finally:
        tiles.unpersist()
    n_tiles = len(wanted) * (mm.H // mm.TILE) * (mm.W // mm.TILE)
    for p, rows in got.items():
        assert len(rows) == n_tiles, f"pool={p}: {len(rows)} rows"
        assert all(
            len(r["signature"]) == mm.N_CHUNKS * mm.SIG_WIDTH for r in rows
        )
    sig2 = {r["tile_id"]: r["signature"] for r in got[2]}
    sig1 = {r["tile_id"]: r["signature"] for r in got[1]}
    assert sig1 != sig2, "pool factors should produce different signatures"
    assert acc.value == len(wanted), (
        f"decode ran {acc.value}× for {len(wanted)} images — "
        "persist-fork must decode once"
    )


def test_audio_feature_extraction(spark, sf_smoke):
    """Audio modality plumbing: int16-PCM payloads -> windowed RMS/ZCR
    rows with the expected fan-out, values matching straight numpy."""
    import numpy as np

    clips = mm.audios_df(spark, sf_smoke, n_clips=4)
    feats = mm.audio_features(clips).collect()
    n_windows = (8192 - mm.AUDIO_FRAME) // mm.AUDIO_HOP + 1
    by_clip: dict[str, list] = {}
    for r in feats:
        by_clip.setdefault(r["audio_id"], []).append(r)
    assert set(by_clip) == {f"aud{i}" for i in range(4)}
    for rows in by_clip.values():
        assert len(rows) == n_windows
        assert all(0 <= r["rms"] <= 1 and 0 <= r["zcr"] <= 1 for r in rows)
    # value check vs numpy on one clip
    payload = {r["audio_id"]: r["content"] for r in clips.collect()}
    x = np.frombuffer(payload["aud0"], dtype=np.int16).astype(np.float64) / 32768.0
    w = x[: mm.AUDIO_FRAME]
    r0 = sorted(by_clip["aud0"], key=lambda r: r["frame_no"])[0]
    assert abs(r0["rms"] - float(np.sqrt((w * w).mean()))) < 1e-12
    assert abs(r0["zcr"] - float((np.diff(np.sign(w)) != 0).mean())) < 1e-12


def test_fixture_prune_replaces_stale_digests(tmp_path, monkeypatch):
    """Digest-keyed fixtures must not accumulate: materializing a NEW
    digest under the same prefix prunes stale siblings (a chaos sweep
    rewriting one corpus dir used to mint an unbounded series of
    abandoned TMPDIR fixture dirs — round-6 review), while in-flight
    .tmp dirs of concurrent writers are left alone."""
    import os
    import tempfile

    from big_data_analytics_cse545_spark.sources.fixtures import (
        ensure_fixture_dir,
    )

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    tempfile.tempdir = None  # drop the cached location
    try:
        def w(d):
            with open(os.path.join(d, "x"), "w") as f:
                f.write("x")

        old = ensure_fixture_dir("pfx_aaa_v1", w, prune_prefix="pfx_")
        inflight = tmp_path / "pfx_zzz_v1.tmp-99999"
        inflight.mkdir()
        bystander = tmp_path / "pfx_other_shape"
        bystander.mkdir()
        new = ensure_fixture_dir(
            "pfx_bbb_v1", w, prune_prefix="pfx_",
            prune_re=r"pfx_[a-z]{3}_v1",
        )
        assert os.path.isdir(new)
        assert not os.path.isdir(old), "stale digest must be pruned"
        assert inflight.is_dir(), "in-flight .tmp dirs are not ours to kill"
        assert bystander.is_dir(), (
            "prune_re must keep prefix collisions from widening the blast radius"
        )
    finally:
        tempfile.tempdir = None


def test_m01_fixture_twin_corpora_do_not_prune_each_other(tmp_path, monkeypatch):
    """Two LIVE corpora sharing a directory basename must keep
    independent fixtures: pruning is keyed on the SOURCE PATH, so only
    a rewrite of the same parquet replaces a fixture (round-6 review —
    a basename-keyed prune let corpus A delete corpus B's fixture and
    break B's already-built binaryFile plans)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as papq

    monkeypatch.setenv("TMPDIR", str(tmp_path / "tmpdir"))
    (tmp_path / "tmpdir").mkdir()
    tempfile.tempdir = None
    try:
        dirs = []
        for name, ids in (("a", [1, 2]), ("b", [3, 4])):
            d = tmp_path / name / "sf"
            d.mkdir(parents=True)
            papq.write_table(
                pa.table({"vec_id": pa.array(ids, pa.int64())}),
                str(d / "embeddings.parquet"),
            )
            dirs.append(str(d))
        fa = mm._m01_fixture_dir(dirs[0])
        fb = mm._m01_fixture_dir(dirs[1])
        assert fa != fb
        assert os.path.isdir(fa) and os.path.isdir(fb), (
            "same-basename corpora must coexist"
        )
        # a REWRITE of corpus b (same path, new ids) prunes only b's old
        # fixture; a's fixture survives
        papq.write_table(
            pa.table({"vec_id": pa.array([5, 6], pa.int64())}),
            os.path.join(dirs[1], "embeddings.parquet"),
        )
        fb2 = mm._m01_fixture_dir(dirs[1])
        assert fb2 != fb
        assert not os.path.isdir(fb), "rewrites must replace the stale fixture"
        assert os.path.isdir(fa), "the twin corpus fixture must survive"
    finally:
        tempfile.tempdir = None

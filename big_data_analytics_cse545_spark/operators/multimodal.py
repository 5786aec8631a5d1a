"""L3 multimodal columns — the reference's Assignment-2 image pipeline as
Arrow-batched pandas UDFs over opaque binary columns.

Reference parity (SURVEY §2.4):
  I1/I3 binary scan + ``getOrthoTif`` zip→tif decode (``a2_ahuja.py:13-24,
       416``) → ``decode_image``: the container has no tifffile/PIL, so the
       byte→tensor decode is a clearly-marked DETERMINISTIC FAKE (seeded by
       the content bytes) — the Spark-side plumbing (BinaryType column,
       schema, batch shapes, fan-out) is real and tested.
  I4   ``divideImage`` tiling with row-major ids '{img}-{n}'
       (``a2_ahuja.py:32-44``) → ``tile_images`` (mapInPandas, 1→N rows).
  I5   intensity = mean(RGB)·(IR/100) (``a2_ahuja.py:47-50``).
  I6/I7 k×k block-mean pooling (``a2_ahuja.py:53-72``).
  I8   ∂x/∂y gradient features quantized to {-1,0,1}, flattened+concat →
       2·n·(n−1) dims (``a2_ahuja.py:77-87``).
  I9   md5 chunk signature with the exact residual rule: vector split into
       n_chunks pieces, the first ``len % n_chunks`` pieces one element
       longer; hex char ``idx`` of each chunk's md5 (``a2_ahuja.py:99-120``).
  I10/I11 banding + same-position bucket equi-join for candidate pairs
       (``a2_ahuja.py:140-170``) — relational form: posexplode + self-join.

Images table: no driver-provided binary fixture exists (FIXTURES.md A4),
so ``images_df`` synthesizes one inside the query — ids from the
embeddings table, payload bytes deterministic per id, near-duplicates
planted at ids ≡ 9 (mod 10) (noisy copy of id−1) so the funnel has true
positives to find.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.sources import load_table

H = W = 40        # synthetic image size
CHANNELS = 4      # RGB + infrared, as in the reference (A2 spec p.1)
TILE = 20         # 2×2 tiling → 4 tiles per image
POOL = 2          # 2×2 block mean → 10×10 intensity grid (180-dim features
                  # → ~22 elements per signature chunk, a rich md5 alphabet;
                  # coarser pooling left only 27 possible chunk values and
                  # every band bucket collided)
N_CHUNKS = 8      # md5 signature chunks (reference uses 128 on 4900 dims)
SIG_IDX = 0       # hex char index taken from each chunk md5 (a2:231 uses 1)
SIG_WIDTH = 2     # hex chars per chunk → 256 buckets per band. The
                  # reference tunes bandwidth=13 bits for selectivity
                  # (a2_ahuja.py:133-139); with 1 char (16 buckets) the
                  # band self-join fans out ~16× more pairs at 8k tiles.

# Reference-exact banding (``computeBuckets2``, a2_ahuja.py:140-149):
# 128 chunks × 1 hex char (md5 index 1, a2_ahuja.py:231) → 128-char hex
# signature → 512-bit string → ⌊512/13⌋ = 39 bands of 13 bits (the last
# 512 − 39·13 = 5 bits are dropped, as in the reference).
REF_N_CHUNKS = 128
REF_SIG_IDX = 1
REF_BANDWIDTH = 13
REF_SIG_BITS = REF_N_CHUNKS * 4
REF_N_BANDS = REF_SIG_BITS // REF_BANDWIDTH


# ---------------------------------------------------------------------------
# synthetic binary source (stands in for sc.binaryFiles / binaryFile source)
# ---------------------------------------------------------------------------

def _image_bytes(base_id: int) -> bytes:
    """Deterministic synthetic image payload for ``base_id``; ids ≡ 9
    (mod 10) are planted near-duplicates (noisy copy) of id−1. Shared by
    the in-plan synthetic source and the on-disk binaryFile fixture so
    both paths see identical pixels."""
    rng_id = base_id - 1 if base_id % 10 == 9 else base_id
    rng = np.random.default_rng(int(rng_id))
    img = rng.integers(0, 256, size=(H, W, CHANNELS), dtype=np.uint8)
    if base_id % 10 == 9:
        noise_rng = np.random.default_rng(int(base_id) + 10_000_000)
        noise = noise_rng.integers(0, 2, size=img.shape, dtype=np.uint8)
        img = (img.astype(np.int16) + noise).clip(0, 255).astype(np.uint8)
    return img.tobytes()


def images_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(img_id string, content binary, width, height, channels) — opaque
    payload + typed metadata, the engine's multimodal column contract."""
    ids = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("base_id")
    )

    def make_bytes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = [_image_bytes(int(b)) for b in batch["base_id"]]
            yield pd.DataFrame(
                {
                    "img_id": "img" + batch["base_id"].astype(str),
                    "content": out,
                    "width": W,
                    "height": H,
                    "channels": CHANNELS,
                }
            )

    return ids.mapInPandas(
        make_bytes,
        schema="img_id string, content binary, width int, height int, channels int",
    )


def decode_image(content: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB decode (reference: zipfile+tifffile, ``a2_ahuja.py:13-24``).

    Real image/audio codecs are not installed in this container; the
    payload is raw uint8 so 'decoding' is a reshape. A production build
    would replace this body with tifffile/PIL — signature and batch
    shape stay identical.
    """
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size != width * height * channels:
        raise ValueError(f"payload size {arr.size} != {width}x{height}x{channels}")
    return arr.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# funnel stages (each a mapInPandas stage — Arrow batches, no per-row pickle)
# ---------------------------------------------------------------------------

def tile_images(images: DataFrame) -> DataFrame:
    """I4: split each H×W image into TILE×TILE cells, row-major ids
    '{img}-{n}' (``a2_ahuja.py:32-44``). 1→(H/TILE)·(W/TILE) fan-out."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, payloads = [], []
            for _, row in batch.iterrows():
                img = decode_image(
                    row["content"], row["width"], row["height"], row["channels"]
                )
                n = 0
                for r in range(0, H, TILE):        # row-major, as the reference
                    for c in range(0, W, TILE):
                        ids.append(f"{row['img_id']}-{n}")
                        payloads.append(img[r : r + TILE, c : c + TILE].tobytes())
                        n += 1
            yield pd.DataFrame({"tile_id": ids, "content": payloads})

    return images.mapInPandas(gen, schema="tile_id string, content binary")


def tile_intensity(tiles: DataFrame, pool: int = POOL) -> DataFrame:
    """I5+I6: per-pixel intensity mean(RGB)·(IR/100), then pool×pool
    block-mean downsample (``a2_ahuja.py:47-61``)."""
    n = TILE // pool

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for content in batch["content"]:
                t = np.frombuffer(content, dtype=np.uint8).reshape(TILE, TILE, CHANNELS)
                inten = t[:, :, :3].mean(axis=2) * (t[:, :, 3].astype(np.float64) / 100.0)
                pooled = inten.reshape(n, pool, n, pool).mean(axis=(1, 3))
                out.append(pooled.ravel().tolist())
            yield pd.DataFrame({"tile_id": batch["tile_id"], "intensity": out})

    return tiles.mapInPandas(gen, schema="tile_id string, intensity array<double>")


def gradient_features(intensity: DataFrame, pool: int = POOL) -> DataFrame:
    """I8: row/col np.diff, quantize at ±1 to {-1,0,1}, flatten+concat —
    2·n·(n−1) dims (``a2_ahuja.py:77-87``)."""
    n = TILE // pool

    def quantize(d: np.ndarray) -> np.ndarray:
        q = np.zeros_like(d, dtype=np.int32)
        q[d > 1] = 1
        q[d < -1] = -1
        return q

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for vals in batch["intensity"]:
                m = np.array(vals).reshape(n, n)
                fx = quantize(np.diff(m, axis=1)).ravel()   # ∂x, n×(n−1)
                fy = quantize(np.diff(m, axis=0)).ravel()   # ∂y, (n−1)×n
                out.append(np.concatenate([fx, fy]).tolist())
            yield pd.DataFrame({"tile_id": batch["tile_id"], "features": out})

    return intensity.mapInPandas(gen, schema="tile_id string, features array<int>")


def chunk_signature(
    vec: list[int], n_chunks: int = N_CHUNKS, idx: int = SIG_IDX, width: int = 1
) -> str:
    """I9, exact reference semantics (``a2_ahuja.py:99-120``): split into
    n_chunks pieces, residual spread one-per-chunk over the first
    ``len % n_chunks`` chunks; hex char(s) at ``idx`` of each chunk's md5
    (width=1 is the reference's exact rule; wider slices are the engine's
    selectivity knob, cf. bandwidth tuning at a2_ahuja.py:133-139)."""
    arr = list(vec)
    base, resid = divmod(len(arr), n_chunks)
    sig, start = [], 0
    for i in range(n_chunks):
        size = base + (1 if i < resid else 0)
        chunk = arr[start : start + size]
        start += size
        digest = hashlib.md5(",".join(str(x) for x in chunk).encode()).hexdigest()
        sig.append(digest[idx : idx + width])
    return "".join(sig)


def signatures(features: DataFrame) -> DataFrame:
    """I9 as a scalar pandas UDF — Arrow-batched (one Python call per
    ~10k rows) instead of a row-at-a-time F.udf pickle round-trip."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def sig(vecs: pd.Series) -> pd.Series:
        return vecs.map(lambda v: chunk_signature(list(v), width=SIG_WIDTH))

    return features.select("tile_id", sig("features").alias("signature"))


def _bands_col():
    """Split a signature into N_CHUNKS bands of SIG_WIDTH hex chars."""
    return F.expr(
        f"transform(sequence(0, {N_CHUNKS - 1}), "
        f"i -> substring(signature, i * {SIG_WIDTH} + 1, {SIG_WIDTH}))"
    )


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """I10+I11: band per signature position, candidates share any
    (position, hex char) — the same-band-position equality of
    ``computeSimilarCandidates`` (``a2_ahuja.py:164-170``) as a
    posexplode + self-equi-join, deduped."""
    bands = sigs.select(
        "tile_id", F.posexplode(_bands_col()).alias("band", "bucket")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.tile_id") < F.col("b.tile_id")),
        )
        .select(F.col("a.tile_id").alias("t1"), F.col("b.tile_id").alias("t2"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# reference-exact bit-level banding (I10, ``computeBuckets2``)
# ---------------------------------------------------------------------------

_BIT_NIBBLES = ", ".join(f"'{i:04b}'" for i in range(16))


def bit_bands_col(
    sig_col: str = "signature",
    bandwidth: int = REF_BANDWIDTH,
    n_bits: int = REF_SIG_BITS,
):
    """Array of ⌊n_bits/bandwidth⌋ integer band values from a hex
    signature, computed bit-exactly like ``computeBuckets2``
    (``a2_ahuja.py:140-149``): hex → concatenated 4-bit strings → cut
    into ``bandwidth``-bit slices → integer value per slice (trailing
    remainder bits dropped). All JVM-side (transform/elt/conv) so band
    keys never cross into Python."""
    n_bands = n_bits // bandwidth
    bits = (
        f"concat_ws('', transform("
        f"filter(split({sig_col}, ''), c -> c <> ''), "
        f"c -> elt(locate(c, '0123456789abcdef'), {_BIT_NIBBLES})))"
    )
    return F.expr(
        f"transform(sequence(0, {n_bands - 1}), "
        f"b -> cast(conv(substr({bits}, b * {bandwidth} + 1, {bandwidth}), 2, 10) AS INT))"
    )


def ref_bands_py(sig: str, bandwidth: int = REF_BANDWIDTH) -> list[int]:
    """Python twin of :func:`bit_bands_col` (same computeBuckets2
    arithmetic); used inside the Arrow batch that already computes the
    signature so the 512-bit expansion runs once per tile. Equality with
    the JVM expression is pinned by tests/test_multimodal.py."""
    bits = "".join(f"{int(c, 16):04b}" for c in sig)
    n_bands = len(bits) // bandwidth
    return [int(bits[b * bandwidth : (b + 1) * bandwidth], 2) for b in range(n_bands)]


def ref_signatures(features: DataFrame) -> DataFrame:
    """I9 with the reference's exact parameters: 128 chunks, hex char
    index 1, width 1 → 128-char signature (``a2_ahuja.py:99-120,231``),
    plus the 39 bit-band values per tile."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            sigs = [
                chunk_signature(list(v), n_chunks=REF_N_CHUNKS, idx=REF_SIG_IDX, width=1)
                for v in batch["features"]
            ]
            yield pd.DataFrame(
                {
                    "tile_id": batch["tile_id"],
                    "signature": sigs,
                    "bands": [ref_bands_py(s) for s in sigs],
                }
            )

    return features.mapInPandas(
        gen, schema="tile_id string, signature string, bands array<int>"
    )


def ref_band_candidates(sigs: DataFrame) -> DataFrame:
    """Candidate pairs sharing any (band position, 13-bit value) — the
    reference's same-position bucket equality over the 39 bit-bands.
    The exploded band table is persisted: it is tiny (n_tiles × 39
    short rows) and both sides of the self-join read it, which would
    otherwise run the whole Python funnel twice."""
    bands = sigs.select(
        "tile_id", F.posexplode("bands").alias("band", "bval")
    ).persist()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.tile_id") < F.col("b.tile_id")),
        )
        .select(F.col("a.tile_id").alias("t1"), F.col("b.tile_id").alias("t2"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# m01 — end-to-end funnel query (rows-only: tensors aren't SQL-expressible)
# ---------------------------------------------------------------------------

def m01_image_similarity_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode→tile→intensity→features→signature→LSH funnel; output =
    exact-match candidate pairs (identical signatures), i.e. the planted
    near-duplicate detector. Keeps only pairs agreeing on ≥ half the
    signature bands to mirror the reference's selectivity tuning
    (``a2_ahuja.py:133-139``)."""
    imgs = images_df(spark, sf_dir)
    feats = gradient_features(tile_intensity(tile_images(imgs)))
    sigs = signatures(feats)
    bands = sigs.select(
        "tile_id", F.posexplode(_bands_col()).alias("band", "bucket")
    )
    a, b = bands.alias("a"), bands.alias("b")
    agree = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.tile_id") < F.col("b.tile_id")),
        )
        .groupBy(F.col("a.tile_id").alias("t1"), F.col("b.tile_id").alias("t2"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= N_CHUNKS * 3 // 4)
    )
    return agree.orderBy("t1", "t2")


# ---------------------------------------------------------------------------
# m03 — real binaryFile source + reference-exact banding (I1/R9 + I10)
# ---------------------------------------------------------------------------

N_BINARY_FILES = 64


def m03_binaryfile_ref_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The a2 funnel from REAL files: 64 deterministic image payloads
    written to a temp directory once, scanned with Spark's native
    ``binaryFile`` source (``sc.binaryFiles`` parity, ``a2_ahuja.py:416``),
    img_id recovered from the file path (I2 ``getFileName``), then
    decode→tile→intensity→gradient→signature with the REFERENCE-EXACT
    banding: 128-chunk signature, 512 bits, 39 bands × 13 bits
    (``computeBuckets2``, ``a2_ahuja.py:140-149``). Output = candidate
    pairs. Fixture size is fixed (64 images / 256 tiles) regardless of
    sf — the source is the point here, scale comes from m01.

    Rows-only driver check (binary tensors aren't SQL-expressible);
    recall + selectivity are pinned in tests/test_multimodal.py.
    """
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "spark_graft_binimgs_v1")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        for i in range(N_BINARY_FILES):
            with open(os.path.join(d, f"img{i:05d}.bin"), "wb") as f:
                f.write(_image_bytes(i))
        open(marker, "w").close()

    # coalesce: 64 tiny files spread over 32 scan partitions × 5 chained
    # Python runners would spawn ~160 workers (each cold-importing
    # pandas) for 256 rows — a 20-90s worker-spawn storm. 8 partitions
    # bound the chain at 40 workers while keeping the funnel parallel.
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
        .coalesce(8)
    )
    imgs = raw.select(
        F.concat(
            F.lit("img"),
            F.regexp_extract(F.col("path"), r"img(\d+)\.bin$", 1).cast("long"),
        ).alias("img_id"),
        "content",
        F.lit(W).alias("width"),
        F.lit(H).alias("height"),
        F.lit(CHANNELS).alias("channels"),
    )
    # pool=1: 20×20 intensity grid → 2·20·19 = 760 feature dims → ~6
    # elements per 128-chunk. The reference's 4900-dim features give ~38
    # per chunk; at our tiny tile size the default 2×2 pooling leaves
    # only 1-2 elements per chunk, a degenerate md5 alphabet whose
    # signature bits collide in nearly every 13-bit band.
    feats = gradient_features(tile_intensity(tile_images(imgs), pool=1), pool=1)
    cand = ref_band_candidates(ref_signatures(feats))
    return cand.orderBy("t1", "t2")


# ---------------------------------------------------------------------------
# audio features (PCM-shaped payloads)
# ---------------------------------------------------------------------------

AUDIO_FRAME = 1024   # samples per analysis window
AUDIO_HOP = 512      # hop between windows


def audio_features(audios: DataFrame) -> DataFrame:
    """Windowed audio feature extraction over opaque PCM payloads:
    (audio_id, content binary int16-PCM, sample_rate, n_samples) →
    one row per analysis window with RMS energy and zero-crossing rate.

    Same multimodal contract as images/video: the 'decode' is an int16
    reinterpret (real codecs — mp3/flac — would slot into the same spot;
    not in this container), the windowing/feature math is numpy inside
    an Arrow batch, the fan-out is 1→⌈(n−frame)/hop⌉+1 rows. At scale
    each task holds one batch of clips — constant memory, linear CPU.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, frames, rms_out, zcr_out = [], [], [], []
            for _, row in batch.iterrows():
                pcm = np.frombuffer(row["content"], dtype=np.int16)
                if pcm.size != row["n_samples"]:
                    raise ValueError("payload/metadata mismatch")
                x = pcm.astype(np.float64) / 32768.0
                n = 0
                for start in range(0, max(x.size - AUDIO_FRAME, 0) + 1, AUDIO_HOP):
                    w = x[start : start + AUDIO_FRAME]
                    ids.append(row["audio_id"])
                    frames.append(n)
                    rms_out.append(float(np.sqrt((w * w).mean())))
                    zcr_out.append(float((np.diff(np.sign(w)) != 0).mean()))
                    n += 1
            yield pd.DataFrame(
                {"audio_id": ids, "frame_no": frames, "rms": rms_out, "zcr": zcr_out}
            )

    return audios.mapInPandas(
        gen, schema="audio_id string, frame_no int, rms double, zcr double"
    )


def audios_df(spark: SparkSession, sf_dir: str, n_clips: int = 16) -> DataFrame:
    """Deterministic synthetic PCM source (sine + seeded noise per clip)
    with the engine's typed-metadata contract — test fixture standing in
    for a real audio file scan (binaryFile over .wav/.flac)."""
    n_samples = 8192
    rate = 16000
    ids = spark.range(n_clips).select(F.col("id").cast("long").alias("base_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for base_id in batch["base_id"]:
                rng = np.random.default_rng(int(base_id) + 7_000_000)
                t = np.arange(n_samples) / rate
                wave = 0.5 * np.sin(2 * np.pi * (100 + 50 * int(base_id)) * t)
                wave += 0.05 * rng.standard_normal(n_samples)
                out.append((np.clip(wave, -1, 1) * 32767).astype(np.int16).tobytes())
            yield pd.DataFrame(
                {
                    "audio_id": "aud" + batch["base_id"].astype(str),
                    "content": out,
                    "sample_rate": rate,
                    "n_samples": n_samples,
                }
            )

    return ids.mapInPandas(
        gen,
        schema="audio_id string, content binary, sample_rate int, n_samples int",
    )


# ---------------------------------------------------------------------------
# frame sampling (video-shaped payloads)
# ---------------------------------------------------------------------------

def frame_sample(videos: DataFrame, every_k: int = 4) -> DataFrame:
    """Sample every k-th frame from a video-shaped binary payload
    (n_frames × H × W × C uint8): 1→⌈n/k⌉ row fan-out with typed frame
    metadata. The decode is the same stubbed reshape as images
    (real containers would demux with pyav/ffmpeg — not in this
    container); partitioning, batch shape and fan-out are real.

    Input schema: (video_id string, content binary, n_frames int,
    width int, height int, channels int).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            vids, frames, payloads = [], [], []
            for _, row in batch.iterrows():
                frame_sz = row["width"] * row["height"] * row["channels"]
                arr = np.frombuffer(row["content"], dtype=np.uint8)
                if arr.size != frame_sz * row["n_frames"]:
                    raise ValueError("payload/metadata mismatch")
                for f in range(0, int(row["n_frames"]), every_k):
                    vids.append(row["video_id"])
                    frames.append(f)
                    payloads.append(arr[f * frame_sz : (f + 1) * frame_sz].tobytes())
            yield pd.DataFrame(
                {"video_id": vids, "frame_no": frames, "frame": payloads}
            )

    return videos.mapInPandas(
        gen, schema="video_id string, frame_no int, frame binary"
    )


def m02_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize 8-frame videos (one per 50 embeddings ids), sample every
    4th frame, fingerprint each sampled frame — the video-modality
    plumbing demo (rows-only)."""
    ids = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").cast("long").alias("base_id"))
    )
    n_frames = 8

    def make_videos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for base_id in batch["base_id"]:
                rng = np.random.default_rng(int(base_id) + 5_000_000)
                vid = rng.integers(
                    0, 256, size=(n_frames, H, W, CHANNELS), dtype=np.uint8
                )
                out.append(vid.tobytes())
            yield pd.DataFrame(
                {
                    "video_id": "vid" + batch["base_id"].astype(str),
                    "content": out,
                    "n_frames": n_frames,
                    "width": W,
                    "height": H,
                    "channels": CHANNELS,
                }
            )

    videos = ids.mapInPandas(
        make_videos,
        schema="video_id string, content binary, n_frames int, width int, height int, channels int",
    )
    frames = frame_sample(videos, every_k=4)
    return frames.select(
        "video_id", "frame_no", F.md5(F.col("frame")).alias("frame_md5")
    ).orderBy("video_id", "frame_no")


QUERIES = {
    "m01_image_similarity_funnel": m01_image_similarity_funnel,
    "m02_video_frame_sample": m02_video_frame_sample,
    "m03_binaryfile_ref_funnel": m03_binaryfile_ref_funnel,
}

# No SQL oracle: binary tensors + md5-of-int-list are not expressible in
# the DuckDB views — the driver records rows-only; invariants and golden
# values are pinned in tests/test_multimodal.py instead.
ORACLE: dict[str, str] = {}

"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star component (BASELINE.json): a 100 TB training-data pipeline
carries media as ``binary`` columns next to structured metadata. The
Spark-side plumbing — schemas, batch iteration, partition sizing, UDF
signatures — is real and tested. Decoding has two modes:
``decode_stub=True`` (default) runs a deterministic fake decoder (useful
for plumbing tests and unsupported formats); ``decode_stub=False`` runs
REAL pure-Python codecs (:mod:`stglib_spark.functions.media`) for BMP /
PPM / PGM images and PCM WAV audio, while compressed formats (JPEG/PNG/
MP4) raise ``UnsupportedMediaError`` at the exact point an external codec
(PIL/ffmpeg) plugs in.

Scale notes: mapInPandas streams Arrow batches — peak memory is one batch
of binary payloads per core, so ``spark.sql.files.maxPartitionBytes`` (and
``maxRecordsPerBatch``) bound executor memory, not file count; feature
outputs are fixed-width arrays so downstream shuffles carry features, not
payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from stglib_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _fake_decode(content: bytes, out_pixels: int) -> np.ndarray:
    """Deterministic fake decoder: bytes → pseudo-pixel array seeded by the
    content digest. Stands in for PIL/ffmpeg so batch shapes, dtypes and
    determinism are testable without codecs."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=out_pixels).astype(np.uint8)


def decode_features(
    df: DataFrame,
    feature_dim: int = 64,
    decode_stub: bool = True,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """binary column → fixed-width float feature vector via mapInPandas.

    Real implementation decodes with PIL/ffmpeg then pools; the stub
    derives features from the fake-decoded byte field. Either way the
    OUTPUT CONTRACT is identical: (media_id, n_bytes, feature[float xD]).
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, feats = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                payload = bytes(content) if content is not None else b""
                if decode_stub:
                    pixels = _fake_decode(payload, feature_dim * 16)
                    # mean-pool 16 pseudo-pixels per slot, scaled to [0,1]
                    feat = pixels.reshape(feature_dim, 16).mean(axis=1) / 255.0
                    feat = feat.astype(np.float32)
                else:
                    # real decode: BMP/PPM/PGM/PNG/WAV natively; JPEG and
                    # compressed video raise UnsupportedMediaError here
                    from stglib_spark.functions.media import decode_features_real

                    feat = decode_features_real(payload, feature_dim)
                ids.append(mid)
                sizes.append(len(payload))
                feats.append(feat.tolist())
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": sizes, "feature": feats}
            )

    return df.select(id_col, content_col).mapInPandas(fn, out_schema)


def audio_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """WAV binary column → per-clip signal statistics via mapInPandas:
    (media_id, n_samples, sample_rate, rms, zero_crossings,
    dominant_freq_hz). The audio-corpus curation filter set — silence /
    clipping gates on RMS, noisiness on zero-crossing count, tonal
    content on the spectral peak (rfft argmax, DC excluded). Kernel:
    functions/media.audio_stats_real (pure-Python RIFF/PCM decode).

    Scale shape: payloads stay inside the Arrow batch — the output is
    six scalars per clip, so downstream shuffles never carry audio
    bytes; peak executor memory is one batch of payloads per core.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_samples", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("rms", FloatType()),
            StructField("zero_crossings", IntegerType()),
            StructField("dominant_freq_hz", IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stglib_spark.functions.media import audio_stats_real

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                payload = bytes(content) if content is not None else b""
                n, rate, rms, zc, dom = audio_stats_real(payload)
                rows.append((mid, n, rate, rms, zc, dom))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_samples",
                    "sample_rate",
                    "rms",
                    "zero_crossings",
                    "dominant_freq_hz",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(fn, out_schema)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """image binary → resized binary (stub: content-digest-seeded bytes of
    the target size; real: PIL decode→resize→encode). Output keeps the
    MEDIA_SCHEMA contract with updated dims."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_content = []
            for content in pdf["content"]:
                payload = bytes(content) if content is not None else b""
                if decode_stub:
                    new_content.append(
                        _fake_decode(payload, target_w * target_h).tobytes()
                    )
                else:
                    # real path: decode BMP/PPM → nearest resize → BMP
                    from stglib_spark.functions.media import (
                        decode_image,
                        encode_bmp,
                        resize_nearest,
                    )

                    img = decode_image(payload)
                    new_content.append(
                        encode_bmp(resize_nearest(img, target_w, target_h))
                    )
            out["content"] = new_content
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return df.mapInPandas(fn, df.schema)


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """video binary → n_frames evenly-spaced frame features, one row per
    (media_id, frame_idx) — the explode-to-frames shape a video training
    pipeline needs. Real path (decode_stub=False) decodes uncompressed-DIB
    AVI natively (functions/media.py decode_avi) and mean-pools each
    sampled frame to a 64-float feature; compressed codecs (MJPG/H.264…)
    raise UnsupportedMediaError at the same plug point (ffmpeg would slot
    in there). Stub derives per-frame features from a byte-field fake."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("t_ms", IntegerType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "t_ms": [], "feature": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                payload = bytes(content) if content is not None else b""
                dur = int(dur) if dur is not None else 1000
                if decode_stub:
                    sampled = [
                        (
                            int(i * dur / n_frames),
                            _fake_decode(
                                payload
                                + int(i * dur / n_frames).to_bytes(4, "big"),
                                64,
                            ).astype(np.float32)
                            / 255.0,
                        )
                        for i in range(n_frames)
                    ]
                else:
                    from stglib_spark.functions.media import (
                        image_features,
                        sample_avi_frames,
                    )

                    sampled = [
                        (t_ms, image_features(frame, 64))
                        for t_ms, frame in sample_avi_frames(
                            payload, n_frames, duration_ms=dur
                        )
                    ]
                for i, (t_ms, feat) in enumerate(sampled):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["t_ms"].append(t_ms)
                    rows["feature"].append(np.asarray(feat, np.float32).tolist())
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").select(
        "media_id", "content", "duration_ms"
    ).mapInPandas(fn, out_schema)


def perceptual_hash(
    df: DataFrame,
    grid_w: int = 11,
    grid_h: int = 6,
    content_col: str = "content",
    id_col: str = "media_id",
    out_col: str = "phash",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Pixel-level dHash per image — the perceptual fingerprint that
    dedupes RE-ENCODED images (same picture, different container /
    byte stream) without an embedding model, which byte-digest exact
    dedup cannot do by construction.

    ``keep_cols`` ride through the stateless projection unchanged
    (e.g. an event-time column in `streaming_phash_gate` — carrying it
    here avoids an unwatermarked stream-stream self-join whose state
    would grow without bound, ADVICE r8).

    Kernel (Arrow-batched ``mapInPandas``, payloads never shuffled):
    real codec decode (BMP/PNM/PNG, :mod:`stglib_spark.functions.media`),
    integer grayscale (``(r+g+b)//3``), box-filter downsample to a
    ``grid_h × grid_w`` luminance grid (exact integer block means,
    ``sum // (bw·bh)`` — deterministic across engines, unlike float
    area resampling), then the dHash gradient: bit ``gr·(grid_w−1)+gc``
    is 1 iff the cell right of ``(gr, gc)`` is strictly brighter. The
    default 6×11 grid yields 60 bits — the engine's portable-hash
    convention (simhash/hash60), always non-negative in a BIGINT.

    Undecodable / null payloads and images whose dimensions are not
    integer multiples of the grid yield a NULL hash (a production
    deployment would area-resample first; the exact-integer contract
    here is what makes the operator oracle-checkable). Output:
    (id, phash) — 16 bytes/row; at 100 TB every downstream join
    shuffles hashes, never pixels."""
    keep_cols = list(keep_cols or [])
    # id/keep dtypes follow the input (string/int media ids both work —
    # the hardcoded LongType broke configurable media_id_col, ADVICE r8)
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + [StructField(c, df.schema[c].dataType) for c in keep_cols]
        + [StructField(out_col, LongType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stglib_spark.functions.media import (
            decode_bmp,
            decode_png,
            decode_pnm,
            sniff,
        )

        def one(payload: bytes):
            kind = sniff(payload)
            try:
                if kind == "bmp":
                    img = decode_bmp(payload)
                elif kind == "png":
                    img = decode_png(payload)
                elif kind in ("ppm", "pgm", "pnm"):
                    img = decode_pnm(payload)
                else:
                    return None
            except Exception:
                return None
            px = np.asarray(img, dtype=np.int64)
            if px.ndim == 3:  # integer luminance, replayable exactly
                px = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
            h, w = px.shape
            if h % grid_h or w % grid_w:
                return None
            bh, bw = h // grid_h, w // grid_w
            g = (
                px.reshape(grid_h, bh, grid_w, bw).sum(axis=(1, 3))
                // (bh * bw)
            )
            bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
            ks = np.arange(grid_h * (grid_w - 1), dtype=np.int64)
            return int((bits.reshape(-1) << ks).sum())

        for pdf in batches:
            hashes = [
                one(bytes(c)) if c is not None else None
                for c in pdf[content_col]
            ]
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out[out_col] = hashes
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, content_col).mapInPandas(
        fn, out_schema
    )


def phash_near_pairs(
    hashed: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    blocks: int = 4,
    hash_col: str = "phash",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    oversize: str = "star",
    observation=None,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: the SimHash
    pigeonhole machinery verbatim (``dedup.simhash_near_pairs``) on the
    60-bit dHash — block equi-join candidates (identical 16-bit block
    guaranteed for Hamming ≤ blocks−1), ``bit_count(xor)`` verify,
    NEVER an all-pairs comparison. NULL hashes (undecodable images)
    are dropped before pairing."""
    from stglib_spark.operators.dedup import simhash_near_pairs

    fps = hashed.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("simhash")
    )
    pairs = simhash_near_pairs(
        fps, id_col="doc_id", max_hamming=max_hamming, blocks=blocks,
        max_bucket_size=max_bucket_size, oversize=oversize,
        observation=observation,
        # the upstream is the media decode kernel - materialize the
        # 16-byte/row hash table so the census and pair branches share
        # one kernel execution (see simhash_near_pairs)
        materialize=True,
    )
    return pairs.select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "hamming",
    )


def video_phash(
    df: DataFrame,
    grid_w: int = 11,
    grid_h: int = 6,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-frame perceptual hashes for a video binary column — the
    frame-level extension of :func:`perceptual_hash` that video
    near-dedup builds on (a re-encoded / re-containered clip shares
    its frames' dHashes even when its byte stream is new).

    Kernel (Arrow-batched ``mapInPandas``): real uncompressed-DIB AVI
    decode (:func:`stglib_spark.functions.media.decode_avi` — MJPG and
    external codecs plug in at the same point), then the EXACT
    integer dHash pipeline per frame (grayscale ``//3``, block-mean
    downsample, row gradients, 60-bit pack). Output one row per
    (media_id, frame_idx, phash); undecodable clips or off-grid frames
    emit no rows. Video payloads never shuffle — downstream pairing
    carries 20-byte rows."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("frame_idx", IntegerType()),
            StructField("phash", LongType()),
        ]
    )
    ks = np.arange(grid_h * (grid_w - 1), dtype=np.int64)

    def hash_frame(frame: np.ndarray):
        px = np.asarray(frame, dtype=np.int64)
        if px.ndim == 3:
            px = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
        h, w = px.shape
        if h % grid_h or w % grid_w:
            return None
        bh, bw = h // grid_h, w // grid_w
        g = px.reshape(grid_h, bh, grid_w, bw).sum(axis=(1, 3)) // (bh * bw)
        bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
        return int((bits.reshape(-1) << ks).sum())

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stglib_spark.functions.media import decode_avi

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                try:
                    frames, _fps = decode_avi(bytes(content))
                except Exception:
                    continue
                for fi, frame in enumerate(frames):
                    ph = hash_frame(frame)
                    if ph is None:
                        continue
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(ph)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "phash": hashes}
            )

    return df.select(id_col, content_col).mapInPandas(fn, out_schema)


def video_phash_near_pairs(
    frame_hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    blocks: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    oversize: str = "star",
    observation=None,
    star_centers: int = 2,
) -> DataFrame:
    """Cross-video near-duplicate pairs from per-frame dHashes: frame
    hashes band into 16-bit pigeonhole blocks, candidate FRAME pairs
    come from the block equi-join restricted to ``vid_a < vid_b``
    (never within one video, never all-pairs), exact Hamming verifies
    each frame pair once (distinct before aggregation — a pair sharing
    k blocks must count once), and videos aggregate to
    (vid_a, vid_b, min_hamming, n_close) over their frame pairs within
    ``max_hamming``. The pigeonhole guarantee makes min_hamming exact:
    any frame pair at Hamming ≤ blocks−1 shares a block, so no
    qualifying pair can be missed."""
    width = 64 // blocks
    # lazy-materialize the per-frame hash table: the bucket census and
    # the pair join prune different columns below their exchanges, so
    # without this the video decode kernel executes once per branch
    # (same finding as simhash_near_pairs' materialize flag)
    frame_hashes = frame_hashes.localCheckpoint(eager=False)
    stacked = frame_hashes.select(
        F.col(id_col).alias("vid"),
        F.col("frame_idx").alias("f"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bh"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bb"),
    ).select(
        "vid", "f", "phash",
        F.col("bb.blk").alias("blk"), F.col("bb.bh").alias("bh"),
    )
    from stglib_spark.operators.dedup import _annotate_bucket_sizes

    if max_bucket_size is None:
        left = stacked.alias("l")
        right = stacked.alias("r")
        cond = F.col("l.vid") < F.col("r.vid")
    else:
        # min-star reduction for oversize blocks: the bucket's TWO
        # smallest (vid, frame) members (default star_centers=2; see
        # dedup._capped_join_sides' recipe comment) each pair with
        # every cross-video member — LINEAR enumeration and output.
        # Orientation: the bucket min has the smallest vid; the second
        # center's star-2 branch pairs only with struct-greater members
        # whose vid differs, and lexicographic struct order makes any
        # such member's vid strictly larger, so vid_a < vid_b holds on
        # every emitted frame pair.
        pinned, annotated = _annotate_bucket_sizes(
            stacked, ["blk", "bh"], ["vid", "f"], max_bucket_size,
            observation,
            star_centers=star_centers if oversize == "star" else 1,
        )
        member = F.struct(F.col("vid"), F.col("f"))
        if oversize == "drop":
            left = annotated.filter(F.col("__bsz").isNull())
            for c in ("__mn", "__mn2"):
                if c in left.columns:
                    left = left.drop(c)
            left = left.alias("l")
            cond = F.col("l.vid") < F.col("r.vid")
        elif oversize == "star":
            is_mn = member == F.col("__mn")
            keep_left = F.col("__bsz").isNull() | is_mn
            if star_centers >= 2:
                is_mn2 = member.eqNullSafe(F.col("__mn2"))
                left = (
                    annotated.filter(keep_left | is_mn2)
                    .withColumn("__is2", is_mn2)
                    .drop("__mn", "__mn2")
                    .alias("l")
                )
                lmem = F.struct(F.col("l.vid"), F.col("l.f"))
                rmem = F.struct(F.col("r.vid"), F.col("r.f"))
                cond = (
                    F.col("l.__bsz").isNull()
                    & (F.col("l.vid") < F.col("r.vid"))
                ) | (
                    F.col("l.__bsz").isNotNull()
                    & ~F.col("l.__is2")
                    & (F.col("l.vid") != F.col("r.vid"))
                ) | (
                    F.col("l.__bsz").isNotNull()
                    & F.col("l.__is2")
                    & (rmem > lmem)
                    & (F.col("l.vid") != F.col("r.vid"))
                )
            else:
                left = annotated.filter(keep_left).drop("__mn").alias("l")
                cond = (
                    F.col("l.__bsz").isNull()
                    & (F.col("l.vid") < F.col("r.vid"))
                ) | (
                    F.col("l.__bsz").isNotNull()
                    & (F.col("l.vid") != F.col("r.vid"))
                )
        else:
            raise ValueError(
                f"oversize must be 'star' or 'drop', got {oversize!r}"
            )
        right = pinned.hint("shuffle_hash").alias("r")
    frame_pairs = left.join(
        right,
        (F.col("l.blk") == F.col("r.blk"))
        & (F.col("l.bh") == F.col("r.bh"))
        & cond,
    ).select(
        F.col("l.vid").alias("vid_a"),
        F.col("l.f").alias("fa"),
        F.col("r.vid").alias("vid_b"),
        F.col("r.f").alias("fb"),
        F.bit_count(
            F.col("l.phash").bitwiseXOR(F.col("r.phash"))
        ).cast("long").alias("hamming"),
    )
    # filter BEFORE distinct (VERDICT r8 #1): hamming is a pure function
    # of the frame pair, so the dedup exchange carries qualifying rows only
    frame_pairs = frame_pairs.filter(F.col("hamming") <= F.lit(max_hamming)).distinct()
    return frame_pairs.groupBy("vid_a", "vid_b").agg(
        F.min("hamming").alias("min_hamming"),
        F.count(F.lit(1)).alias("n_close"),
    )


def audio_phash(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    n_frames: int = 61,
) -> DataFrame:
    """Audio perceptual hash — the acoustic member of the dHash family
    (`perceptual_hash` for images, `video_phash` for frame sets): the
    clip partitions into ``n_frames`` equal spans (sample i → frame
    (i·n_frames)//n, the exact-integer rule an oracle replays), each
    frame's ENERGY is the integer sum of squared 16-bit PCM codes, and
    bit k of the (n_frames−1)-bit hash is energy[k+1] > energy[k].
    Energy-delta signs survive re-encoding, small clicks, and DC
    offsets the way pixel-gradient signs survive JPEG noise — and a
    constant gain change scales every energy by the same factor, so
    the hash is volume-invariant for exact scaling. Clips shorter than
    ``n_frames`` samples and undecodable payloads hash NULL (dropped
    before pairing, the perceptual_hash convention).

    Pairing reuses `phash_near_pairs` unchanged (pass
    ``hash_col='aphash'``): the SimHash pigeonhole machinery is hash-
    source agnostic. The id column keeps the caller's type (string or
    numeric media ids both work — the family contract
    `perceptual_hash`/`video_phash` honor). Scale shape: decode + hash run inside ONE
    `mapInPandas` projection — audio payloads never shuffle; 16-byte
    (id, hash) rows are all that moves afterwards. Default 61 frames →
    a 60-bit hash, matching the 60-bit block layout the portable
    pairing path uses."""
    import numpy as np
    import pandas as pd

    if n_frames < 2 or n_frames > 64:
        raise ValueError(f"n_frames must be in [2, 64], got {n_frames}")

    def fn(batches):
        from stglib_spark.functions.media import decode_wav

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                try:
                    x, _rate = decode_wav(bytes(payload))
                    n = len(x)
                    if n < n_frames:
                        raise ValueError("clip shorter than frame count")
                    # recover exact PCM codes: decode yields k/32768 in
                    # float32, exact for |k| < 2^24, so round() is k
                    pcm = np.round(
                        x.astype(np.float64) * 32768.0
                    ).astype(np.int64)
                    idx = (np.arange(n, dtype=np.int64) * n_frames) // n
                    e = np.zeros(n_frames, dtype=np.int64)
                    np.add.at(e, idx, pcm * pcm)
                    bits = (e[1:] > e[:-1]).astype(np.int64)
                    h = int(
                        (bits << np.arange(n_frames - 1, dtype=np.int64))
                        .sum()
                    )
                    ids.append(mid)
                    hashes.append(h)
                except Exception:
                    ids.append(mid)
                    hashes.append(None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "aphash": pd.array(hashes, dtype="Int64"),
                }
            )

    id_type = media.schema[id_col].dataType.simpleString()
    return media.mapInPandas(fn, f"{id_col} {id_type}, aphash long")

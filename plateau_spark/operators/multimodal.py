"""Multimodal (image/audio/video) column plumbing.

North-star extension (SURVEY.md §7 Phase 3): treat media as opaque
``binary`` payload columns with a typed metadata struct; run decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes columnar
batches (zero-copy Arrow transfer), never row-at-a-time Python.

Compressed-format decode (JPEG/PNG/mp4) is unavailable in this
container (no image/video libraries); the library-free P6-PPM path is
REAL — pure-numpy parse, bilinear resize, concatenated-frame sampling
— and the Spark-side contract that matters at 100 TB is real and
tested:
  - schema: payload stays a lazy binary column; metadata is queryable
    without touching payload bytes (column pruning drops the blob read
    when only metadata is selected — parquet columnar wins)
  - partitioning: blobs are size-bucketed so row groups stay balanced
  - batch shape: mapInPandas yields bounded-size record batches
    (``spark.sql.execution.arrow.maxRecordsPerBatch``)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plateau_spark.core.caching import persist_shared

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: build a media-shaped table from the documents fixture
    (text bytes stand in for blob payloads in tests)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata extraction with built-ins only (no UDF): byte length +
    content hash. Runs without decoding and without Python."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


_FEATURE_DIM = 8


def _fake_decode_features(payload: bytes | None, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic FAKE decode: derives `dim` floats from the content
    hash. Stands in for a real image/audio decoder (library not in this
    container); replace the body, keep the signature."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_and_featurize(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode → feature vector via mapInPandas.

    The batch shape is the contract: each iterator element is a pandas
    DataFrame of ~arrow-batch-size rows; we return only (media_id,
    features) so the heavy payload column is dropped as early as
    possible (projection happens Spark-side BEFORE the Python worker —
    select the needed columns first).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )
    narrow = df.select("media_id", payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": pdf[payload_col].map(_fake_decode_features),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def _parse_ppm(payload: bytes, offset: int = 0):
    """Parse one binary PPM (P6, maxval 255) image starting at
    ``offset``. Returns ``(ndarray (h, w, 3) uint8, next_offset)`` or
    ``None`` when the bytes aren't a valid P6 image. Pure parsing —
    PPM is the deliberately library-free interchange format here;
    compressed formats (JPEG/PNG) would need a decoder this container
    lacks, so non-P6 payloads are treated as undecodable (None)."""
    import numpy as np

    header = payload[offset : offset + 64]
    if not header.startswith(b"P6"):
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(header):
        while i < len(header) and header[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(header) and header[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        fields.append(int(header[i:j]))
        i = j
    if len(fields) < 3 or fields[2] != 255:
        return None
    w, h, _ = fields
    data_start = offset + i + 1  # single whitespace after maxval
    data_end = data_start + w * h * 3
    if w <= 0 or h <= 0 or data_end > len(payload):
        return None
    arr = np.frombuffer(payload[data_start:data_end], dtype=np.uint8)
    return arr.reshape(h, w, 3), data_end


def _encode_ppm(arr) -> bytes:
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _bilinear_resize(img, out_h: int, out_w: int):
    """Vectorized numpy bilinear resize (align_corners=False sampling,
    the OpenCV/PIL convention), output rounded half-up to uint8."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    fy = (ys - y0f)[:, None, None]
    fx = (xs - x0f)[None, :, None]
    y0 = np.clip(y0f.astype(int), 0, h - 1)
    y1 = np.clip(y0f.astype(int) + 1, 0, h - 1)
    x0 = np.clip(x0f.astype(int), 0, w - 1)
    x1 = np.clip(x0f.astype(int) + 1, 0, w - 1)
    im = img.astype(np.float64)
    top = im[y0][:, x0] * (1 - fx) + im[y0][:, x1] * fx
    bot = im[y1][:, x0] * (1 - fx) + im[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame, width: int, height: int, *, payload_col: str = "payload"
) -> DataFrame:
    """Bilinear-resize every P6-PPM payload to (width, height) — a REAL
    pure-numpy kernel (PPM needs no image library; JPEG/PNG would).
    Rows whose payload doesn't parse as P6 are dropped (count the
    difference to monitor corrupt inputs).

    Same Arrow-batch contract as ``decode_and_featurize``: payload
    projected Spark-side before the Python worker, bounded record
    batches, output is (media_id, payload, meta) with refreshed
    metadata. At 100 TB pair with ``size_bucketed`` so each task sees
    a balanced byte budget.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, False),
        ]
    )
    narrow = df.select("media_id", payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, metas = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = _parse_ppm(bytes(payload)) if payload is not None else None
                if parsed is None:
                    continue
                resized = _encode_ppm(_bilinear_resize(parsed[0], height, width))
                ids.append(media_id)
                payloads.append(resized)
                metas.append(
                    {
                        "n_bytes": len(resized),
                        "content_md5": hashlib.md5(resized).hexdigest(),
                        "mime": "image/x-portable-pixmap",
                    }
                )
            # explicit dtypes: an all-dropped batch would otherwise
            # default empty columns to float64, which Arrow can't cast
            # to binary/struct
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "meta": pd.Series(metas, dtype="object"),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame, every_n: int, *, payload_col: str = "payload"
) -> DataFrame:
    """Sample every ``every_n``-th frame from 'video' payloads encoded
    as concatenated P6-PPM frames (the library-free raw container;
    mp4/webm would need ffmpeg). Emits one row per kept frame:
    (media_id, frame_idx, payload) — the exploded-frames shape that
    downstream image ops (resize, featurize) consume directly.
    Undecodable payloads yield no rows."""
    if every_n <= 0:
        raise ValueError("every_n must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    narrow = df.select("media_id", payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None:
                    continue
                raw, offset, k = bytes(payload), 0, 0
                while offset < len(raw):
                    parsed = _parse_ppm(raw, offset)
                    if parsed is None:
                        break
                    frame, offset = parsed
                    if k % every_n == 0:
                        ids.append(media_id)
                        idxs.append(k)
                        frames.append(_encode_ppm(frame))
                    k += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "payload": pd.Series(frames, dtype="object"),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def size_bucketed(df: DataFrame, *, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media rows so each task sees ~target_bytes of payload
    (keeps Arrow batches and parquet row groups balanced when blob sizes
    are skewed). NOTE: runs one Spark action (a sum) to size the
    exchange — call once per pipeline, not per batch."""
    total = df.agg(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n, "media_id")


def image_dhash(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_col: str = "dhash",
) -> DataFrame:
    """Perceptual difference-hash (dHash) of P6-PPM payloads: grayscale
    each pixel (integer mean of R,G,B, floored), emit one bit per
    horizontal neighbor pair — bit (i·(w−1)+j) set iff
    gray[i][j] > gray[i][j+1] — packed into one BIGINT (row-major, LSB
    first). Perceptually-similar images (re-encodes, small edits,
    brightness shifts) land within a few bits of each other, which
    exact content hashes (md5) cannot see.

    The hash is computed over the image's OWN pixel grid — the
    production composition is ``resize_images(df, 9, 8)`` → dhash (the
    classic 8×8-bit dHash); keeping resize a separate stage keeps this
    kernel exact and SQL-replayable at any grid. Grids are capped at
    64 gradient bits (BIGINT); larger inputs must be resized first.

    Same Arrow-batch contract as the other media kernels: payload
    projected Spark-side, bounded batches, undecodable payloads drop.
    Returns (id, dhash, grid bits) — feed to ``dhash_dup_pairs``.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField(hash_col, T.LongType(), False),
            T.StructField("bits", T.IntegerType(), False),
        ]
    )
    narrow = df.select(F.col(id_col).alias("media_id"), payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, bits_out = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = _parse_ppm(bytes(payload)) if payload is not None else None
                if parsed is None:
                    continue
                img = parsed[0]
                h, w = img.shape[0], img.shape[1]
                nbits = h * (w - 1)
                if w < 2 or nbits > 64:
                    continue
                gray = np.floor(img.astype(np.int64).sum(axis=2) / 3).astype(np.int64)
                diff = (gray[:, :-1] > gray[:, 1:]).astype(np.int64)
                weights = 1 << np.arange(nbits, dtype=np.int64)
                ids.append(media_id)
                hashes.append(int((diff.reshape(-1) * weights).sum()))
                bits_out.append(nbits)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    hash_col: pd.Series(hashes, dtype="int64"),
                    "bits": pd.Series(bits_out, dtype="int32"),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def dhash_dup_pairs(
    hashes: DataFrame,
    *,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bits: int = 12,
    max_hamming: int = 2,
) -> DataFrame:
    """Perceptual near-duplicate pairs from dHash fingerprints:
    (id_a < id_b, hamming) with hamming ≤ ``max_hamming``.

    Banded, never all-pairs: the ``bits``-wide hash splits into
    ``max_hamming + 1`` contiguous bands — two hashes within
    ``max_hamming`` bits MUST agree on at least one whole band
    (pigeonhole), so candidates come from an EQUI-join on
    (band index, band value), then one codegen popcount
    (``bit_count(a XOR b)``) verifies the exact distance. Identical to
    the MinHash-LSH shape: bucketable, AQE-skew-splittable, zero
    Python. Recall is EXACT (the band guarantee is a theorem, not a
    probability).
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    n_bands = max_hamming + 1
    band_w = (bits + n_bands - 1) // n_bands
    mask = (1 << band_w) - 1
    # pin the narrow (id, hash) rows — ~24 bytes/row at ANY corpus
    # size: the two self-join legs below would otherwise each
    # re-evaluate the upstream fingerprint derivation (for the
    # image/audio tiers a full payload-decode mapInPandas pass — the
    # expensive half of the pipeline, paid twice for one join).
    # persist_shared, NOT localCheckpoint: the returned frame is lazy,
    # so an in-function checkpoint could never be released and its
    # blocks accumulated until the ContextCleaner fired (r15 advice);
    # the shared-cache registry bounds the pin by count+bytes and its
    # eviction is correctness-safe (persist keeps lineage — a consumer
    # of an evicted frame recomputes, never errors)
    h = persist_shared(
        hashes.select(F.col(id_col), F.col(hash_col).alias("__h__"), "bits")
        .where(F.col("bits") == bits)
    )
    banded = h.select(
        id_col,
        "__h__",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__h__"), b * band_w)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__bv__"),
    ).select(id_col, "__h__", "__bv__.band", "__bv__.val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("__h__").alias("__ha__"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("__h__").alias("__hb__"), "band", "val"
    )
    ham = F.bit_count(F.col("__ha__").bitwiseXOR(F.col("__hb__")))
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _parse_wav_pcm16(payload: bytes):
    """Parse a minimal RIFF/WAVE file with one PCM16 mono 'data' chunk
    (the library-free audio interchange twin of the P6-PPM image path).
    Returns ``(np.ndarray int16 samples, sample_rate)`` or ``None`` for
    anything else (compressed codecs would need decoders this container
    lacks — same stub policy as JPEG/PNG)."""
    import numpy as np

    if len(payload) < 44 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt_ok, rate = 12, False, 0
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                return None
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or channels != 1 or bits != 16:
                return None
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok or len(body) % 2:
                return None
            return np.frombuffer(body, dtype="<i2"), rate
        pos += 8 + size + (size % 2)
    return None


def audio_frame_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame: int = 512,
) -> DataFrame:
    """Framewise audio features over PCM16-WAV payloads: per ``frame``
    samples, RMS energy (loudness envelope) and zero-crossing rate (a
    crude spectral brightness proxy) — the standard cheap features for
    silence trimming, speech/music gating and energy-based dedup of
    audio training corpora. Pure-numpy kernel (RIFF parse + vectorized
    frame reduce) through the same Arrow-batched ``mapInPandas``
    contract as the image kernels; non-PCM16 payloads drop.

    Output is scalar rows (media_id, frame_no, rms, zcr) — join-able,
    verifiable, and columnar-friendly; a trailing partial frame is
    dropped (deterministic framing). rms/zcr round to 6 digits from
    exact integer sums, so the values replay bit-for-bit in SQL.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType(), False),
            T.StructField("zcr", T.DoubleType(), False),
        ]
    )
    if frame < 2:
        raise ValueError(f"frame must be >= 2 samples, got {frame}")
    narrow = df.select(F.col(id_col).alias("media_id"), payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fnos, rmss, zcrs = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = (
                    _parse_wav_pcm16(bytes(payload)) if payload is not None else None
                )
                if parsed is None:
                    continue
                samples, _rate = parsed
                n_frames = len(samples) // frame
                if n_frames == 0:
                    continue
                x = samples[: n_frames * frame].astype(np.int64).reshape(n_frames, frame)
                sq = (x * x).sum(axis=1)
                rms = np.sqrt(sq / float(frame))
                # sign with 0 counted as non-negative; changes per frame
                sg = (x >= 0).astype(np.int8)
                zc = (sg[:, 1:] != sg[:, :-1]).sum(axis=1)
                zcr = zc / float(frame - 1)
                for i in range(n_frames):
                    ids.append(media_id)
                    fnos.append(i)
                    rmss.append(round(float(rms[i]), 6))
                    zcrs.append(round(float(zcr[i]), 6))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "zcr": pd.Series(zcrs, dtype="float64"),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def audio_fingerprint(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bits: int = 12,
) -> DataFrame:
    """Energy-delta audio fingerprint over PCM16-WAV payloads: split the
    clip into ``bits + 1`` equal windows, compute each window's mean
    energy (sum of squared samples / n), and set bit ``b`` when window
    ``b+1`` is louder than window ``b`` — the rising/falling loudness
    contour, a Shazam-style sign-of-delta fingerprint reduced to its
    energy-envelope form (no FFT libs in this container; the contour is
    robust to gain changes since only COMPARISONS between windows
    matter, never absolute levels).

    Output ``(media_id, afp, bits)`` feeds :func:`dhash_dup_pairs`
    unchanged — the banded hamming join is hash-agnostic — so audio
    near-dup = ``dhash_dup_pairs(audio_fingerprint(df), hash_col="afp")``.
    Clips with fewer than ``bits + 1`` samples (or non-PCM16 payloads)
    drop. Same Arrow-batched ``mapInPandas`` contract as every
    multimodal kernel; integer energy sums (int64 of int32 squares) so
    the comparison replays exactly cross-engine.
    """
    import numpy as np

    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), False),
            T.StructField("bits", T.IntegerType(), False),
        ]
    )
    narrow = df.select(F.col(id_col).alias("media_id"), payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                parsed = (
                    _parse_wav_pcm16(bytes(payload)) if payload is not None else None
                )
                if parsed is None:
                    continue
                samples, _rate = parsed
                n = len(samples) // (bits + 1)
                if n == 0:
                    continue
                sq = samples[: n * (bits + 1)].astype(np.int64) ** 2
                # mean energy per window from exact integer sums
                e = sq.reshape(bits + 1, n).sum(axis=1)
                fp = 0
                for b in range(bits):
                    if e[b + 1] > e[b]:
                        fp |= 1 << b
                ids.append(int(media_id))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                    "bits": pd.Series([bits] * len(ids), dtype="int32"),
                }
            )

    return narrow.mapInPandas(batches, out_schema)

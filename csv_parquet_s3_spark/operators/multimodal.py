"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``NotImplementedError`` behind an import-try), but everything Spark-side is
real and tested: the binary column schema, the metadata struct, Arrow-batched
``mapInPandas`` feature extraction with a declared output schema, and the
partitioning story (payload rows never shuffle; features are computed
map-side).

``documents.text`` stands in for the raw media bytes via ``encode(...)`` —
at 100 TB the payload column would be parquet binary chunks and the identical
plan applies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W_mm
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv_parquet_s3_spark.operators.registry import register
from csv_parquet_s3_spark.sources.tables import load_table

FRAME_BYTES = 256  # synthetic "frame" granularity for the sampling stub


def attach_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: binary payload + metadata struct."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@register(
    "mm_payload_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS checksum,
           CAST(CEIL(CAST(octet_length(encode(text)) AS DOUBLE) / {FRAME_BYTES})
                AS BIGINT) AS n_frames,
           'text/plain' AS mime
    FROM documents
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: size, checksum, frame count.

    Pure projection — at scale this is a map-only pass over the payload
    column with zero shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.length(payload).cast("int")
    return docs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
        F.ceil(n_bytes.cast("double") / FRAME_BYTES).cast("bigint").alias("n_frames"),
        F.lit("text/plain").alias("mime"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched feature extraction (mapInPandas).
# ---------------------------------------------------------------------------
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("byte_histogram", T.ArrayType(T.DoubleType()), True),
    ]
)

N_HIST_BUCKETS = 8


def extract_byte_features(docs_with_payload: DataFrame) -> DataFrame:
    """Distributed featurization: mapInPandas over the payload column.

    The batch function is a nested closure ON PURPOSE: cloudpickle then
    serializes it by value, so Spark's Python workers don't need this
    package on their PYTHONPATH (the driver may import us by file path).
    The body is the real shape of a media featurizer: Arrow batch in →
    vectorized numpy work → fixed-width feature vector out; a codec-backed
    extractor (image decode, audio resample) slots into the same body.
    """
    n_buckets = N_HIST_BUCKETS

    def byte_histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_buckets)
                    continue
                hist, _ = np.histogram(arr, bins=n_buckets, range=(0, 256))
                feats.append((hist / arr.size).round(6).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "byte_histogram": feats,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        byte_histogram_batches, schema=FEATURE_SCHEMA
    )


LONG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bucket_count", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("fraction", T.DoubleType(), False),
    ]
)


def extract_byte_features_long(docs_with_payload: DataFrame) -> DataFrame:
    """Long-form featurization: one (doc, bucket) row per histogram cell.

    Same Arrow-batched mapInPandas body as :func:`extract_byte_features`, but
    emitting a dense long form the driver's canonicalizer can hash (scalar
    cells only, no array columns) and that a SQL oracle can reproduce:
    ``bucket_count`` is an exact integer and ``fraction`` a single IEEE-754
    double division ``count / n_bytes`` — bit-identical across engines.
    """
    n_buckets = N_HIST_BUCKETS

    def byte_histogram_long_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "bucket": [], "bucket_count": [], "n_bytes": [], "fraction": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size:
                    hist, _ = np.histogram(arr, bins=n_buckets, range=(0, 256))
                else:
                    hist = np.zeros(n_buckets, dtype=np.int64)
                for b in range(n_buckets):
                    out["doc_id"].append(doc_id)
                    out["bucket"].append(b)
                    out["bucket_count"].append(int(hist[b]))
                    out["n_bytes"].append(arr.size)
                    out["fraction"].append(hist[b] / arr.size if arr.size else 0.0)
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        byte_histogram_long_batches, schema=LONG_FEATURE_SCHEMA
    )


@register(
    "mm_byte_histogram_features",
    # SQL reproduction of the numpy histogram: byte i's bucket (8 bins over
    # 0..256) is its high hex nibble // 2; fraction is one double division.
    oracle=f"""
    WITH payload AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF',
                     substr(h, 2 * CAST(unnest(range(1, n + 1)) AS INT) - 1, 1)) - 1) // 2
               AS bucket
      FROM payload
    ),
    counts AS (
      SELECT doc_id, bucket, count(*) AS c FROM bytes GROUP BY doc_id, bucket
    ),
    spine AS (
      SELECT doc_id, CAST(unnest(range(0, {N_HIST_BUCKETS})) AS INT) AS bucket, n
      FROM payload
    )
    SELECT s.doc_id,
           s.bucket,
           COALESCE(c.c, 0) AS bucket_count,
           CAST(s.n AS INT) AS n_bytes,
           CASE WHEN s.n = 0 THEN 0.0
                ELSE CAST(COALESCE(c.c, 0) AS DOUBLE) / s.n END AS fraction
    FROM spine s LEFT JOIN counts c ON s.doc_id = c.doc_id AND s.bucket = c.bucket
    """,
)
def mm_byte_histogram_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_byte_features_long(attach_payload(docs))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), False),
    ]
)


@register(
    "mm_frame_samples",
    # The frame checksum is defined over the frame's UPPERCASE-HEX encoding
    # (not raw bytes) purely so the oracle can replay it: this DuckDB build
    # has no blob slicing/md5(BLOB), but hex() + substr is exact.
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        FROM documents
    ),
    f AS (
        SELECT doc_id, n, h,
               CAST(unnest(range(0, CAST(CEIL(CAST(n AS DOUBLE) / {FRAME_BYTES})
                                         AS BIGINT))) AS INT) AS frame_idx
        FROM p
    )
    SELECT doc_id, frame_idx,
           CAST(LEAST({FRAME_BYTES}, n - frame_idx * {FRAME_BYTES}) AS INT)
             AS frame_bytes,
           md5(substr(h, frame_idx * {FRAME_BYTES} * 2 + 1, {FRAME_BYTES} * 2))
             AS frame_checksum
    FROM f
    """,
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: the 1-row→N-frames mapInPandas
    shape a video pipeline uses (deterministic byte-window stand-in for
    codec-backed frame extraction). Nested closure → pickled by value, no
    package import needed on workers. Checksums fingerprint the frame's
    hex encoding (portable across engines — see oracle note)."""
    docs = load_table(spark, sf_dir, "documents")
    stride = FRAME_BYTES

    def sample_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                frames = [data[i : i + stride] for i in range(0, len(data), stride)]
                for idx, frame in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_checksum"].append(
                        hashlib.md5(frame.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return attach_payload(docs).select("doc_id", "payload").mapInPandas(
        sample_frame_batches, schema=FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# Codec-backed decode stubs (libs not in this container).
# ---------------------------------------------------------------------------
def decode_image(payload: bytes) -> "object":
    """Decode an image payload. STUB: Pillow/OpenCV are not installed here.

    The Spark-side plumbing (binary column → mapInPandas → struct features)
    is exercised by :func:`extract_byte_features`; a real deployment replaces
    the histogram body with ``PIL.Image.open(io.BytesIO(payload))``.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "image decode requires Pillow; install it on the cluster and swap "
            "the featurizer body (see multimodal.py docstring)"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def sample_frames(payload: bytes, every: int = FRAME_BYTES) -> list[bytes]:
    """Deterministic fake frame sampler: fixed-stride byte windows.

    Stands in for video frame extraction (no codecs in this container); the
    batching/partitioning contract is identical for a real ffmpeg-backed
    sampler.
    """
    return [payload[i : i + every] for i in range(0, len(payload), every)]


# ---------------------------------------------------------------------------
# Windowed waveform features: the audio-shaped mapInPandas pass. Payload
# bytes stand in for PCM samples (the codec decode is the stubbed step, as
# above); per fixed-size window the extractor emits RMS energy + peak — the
# 1-row → N-windows feature shape of audio/VAD pipelines.
# ---------------------------------------------------------------------------
WAVE_WINDOW = 64  # samples (bytes) per analysis window

WAVE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def extract_wave_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched windowed energy features over the payload column.

    Per input row the extractor yields ceil(n_bytes / WAVE_WINDOW) windows;
    sums of squares accumulate in uint64 (exact), so the only floating-point
    step is the final sqrt — reproducible bit-for-bit in the SQL oracle.
    Payload rows never shuffle: features are computed in the scan's
    partitions and only the small feature rows move on.
    """
    import numpy as np

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "window_idx": [], "n_samples": [], "rms": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8)
                for w in range(0, len(samples), WAVE_WINDOW):
                    win = samples[w : w + WAVE_WINDOW].astype(np.uint64)
                    n = int(win.size)
                    ss = int((win * win).sum())
                    out["doc_id"].append(doc_id)
                    out["window_idx"].append(w // WAVE_WINDOW)
                    out["n_samples"].append(n)
                    out["rms"].append(round(float(np.sqrt(ss / n)), 6))
                    out["peak"].append(int(win.max()))
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _extract, schema=WAVE_SCHEMA
    )


@register(
    "mm_wave_window_features",
    # Oracle replays the byte math from the hex encoding (ASCII-safe): byte i
    # = 16*hi + lo nibbles; windows are i // WAVE_WINDOW; RMS = sqrt(avg of
    # squares) with the squares summed exactly as integers.
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    bytes AS (
        SELECT doc_id,
               CAST(u.i AS BIGINT) - 1 AS pos,
               (strpos('0123456789ABCDEF', substr(h, 2 * CAST(u.i AS INT) - 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF', substr(h, 2 * CAST(u.i AS INT), 1)) - 1)
                 AS b
        FROM p, LATERAL (SELECT unnest(range(1, n + 1)) AS i) u
    )
    SELECT doc_id,
           CAST(pos // {WAVE_WINDOW} AS INT) AS window_idx,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(ROUND(sqrt(CAST(SUM(b * b) AS DOUBLE) / COUNT(*)), 6) AS DOUBLE) AS rms,
           CAST(MAX(b) AS INT) AS peak
    FROM bytes
    GROUP BY doc_id, pos // {WAVE_WINDOW}
    """,
)
def mm_wave_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_wave_features(attach_payload(docs))


# Shared DECIMAL-exact entropy-term sum (order-independent across engines).
_ENT_DSUM = "CAST(SUM(CAST(ROUND({term}, 12) AS DECIMAL(30,12))) AS DOUBLE)"


@register(
    "mm_payload_entropy",
    oracle=f"""
    WITH payload AS (
        SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        FROM documents
    ),
    bytes AS (
        SELECT doc_id, n,
               (strpos('0123456789ABCDEF',
                       substr(h, 2 * CAST(p.i AS INT) - 1, 1)) - 1) * 16
               + (strpos('0123456789ABCDEF',
                         substr(h, 2 * CAST(p.i AS INT), 1)) - 1) AS b
        FROM payload, UNNEST(range(1, n + 1)) AS p(i)
    ),
    counts AS (
        SELECT doc_id, n, b, COUNT(*) AS c FROM bytes GROUP BY doc_id, n, b
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_bytes,
           CAST(COUNT(*) AS INT) AS n_distinct_bytes,
           CAST(ROUND(-{_ENT_DSUM.format(
               term='(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n)')}
               , 6) + 0 AS DOUBLE) AS entropy_nats
    FROM counts GROUP BY doc_id, n
    """,
)
def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-entropy per payload — the compressibility/corruption screen a
    multimodal pipeline runs on opaque binary columns (truncated/zeroed
    blobs collapse toward 0 nats; encrypted or double-compressed ones pin
    near ln 256). Byte values decode from the hex rendering with the same
    integer arithmetic on both engines; entropy terms sum as 12-digit
    DECIMAL so the per-doc reduction is order-independent. One explode +
    two keyed aggregations, linear in payload bytes."""
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id",
        F.expr("hex(cast(text as binary))").alias("h"),
        F.expr("octet_length(cast(text as binary))").alias("n"),
    )
    bytes_ = payload.select(
        "doc_id",
        "h",
        "n",
        F.explode(F.expr("sequence(1, n)")).alias("i"),
    ).select(
        "doc_id",
        "n",
        F.expr(
            "(instr('0123456789ABCDEF', substring(h, 2 * CAST(i AS INT) - 1, 1)) - 1)"
            " * 16"
            " + (instr('0123456789ABCDEF', substring(h, 2 * CAST(i AS INT), 1)) - 1)"
        ).alias("b"),
    )
    counts = bytes_.groupBy("doc_id", "n", "b").agg(F.count("*").alias("c"))
    term = "(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n)"
    return counts.groupBy("doc_id", "n").agg(
        F.count("*").cast("int").alias("n_distinct_bytes"),
        F.expr(f"CAST(ROUND(-{_ENT_DSUM.format(term=term)}, 6) + 0 AS DOUBLE)").alias(
            "entropy_nats"
        ),
    ).select(
        "doc_id",
        F.col("n").cast("int").alias("n_bytes"),
        "n_distinct_bytes",
        "entropy_nats",
    )


# ---------------------------------------------------------------------------
# Perceptual average-hash (aHash) over opaque binary payloads: 64 equal
# byte-blocks, bit b = [block mean > global mean]. The binary-modality
# sibling of SimHash — robust to small local edits (one changed byte moves
# one block mean), cheap enough to run at ingest, and the standard first
# screen for image/audio near-dup before a codec-aware pHash. The decode
# step a real media pipeline would insert (JPEG → luma grid) slots in front
# of the same block-mean body; here the payload bytes are hashed directly.
# ---------------------------------------------------------------------------
AHASH_BITS = 64

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ahash_hi", T.LongType(), False),
        T.StructField("ahash_lo", T.LongType(), False),
    ]
)


def payload_ahash(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, ahash_hi, ahash_lo): 64-bit average-hash packed as two
    unsigned-32 words. All comparisons are integer cross-multiplications
    (block_sum·n > total·block_len) — no float means, so the SQL oracle
    replays the hash bit-for-bit. Bytes map to blocks by pos·64 // n
    (sizes differ by ≤1; payloads shorter than 64 bytes leave the missing
    blocks at bit 0)."""
    n_bits = AHASH_BITS

    def ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            his, los = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = arr.size
                hi = lo = 0
                if n:
                    blk = (np.arange(n, dtype=np.int64) * n_bits) // n
                    bsum = np.bincount(blk, weights=arr, minlength=n_bits).astype(
                        np.int64
                    )
                    blen = np.bincount(blk, minlength=n_bits).astype(np.int64)
                    total = int(arr.sum())
                    bits = (bsum * n) > (total * blen)
                    for b in range(32, n_bits):
                        if bits[b]:
                            hi |= 1 << (b - 32)
                    for b in range(32):
                        if bits[b]:
                            lo |= 1 << b
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash_hi": his, "ahash_lo": los}
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        ahash_batches, schema=AHASH_SCHEMA
    )


@register(
    "mm_payload_ahash",
    # ASCII corpus ⇒ byte i == ord(char i); a non-ASCII corpus would swap in
    # the hex-nibble byte extraction used by mm_byte_histogram_features.
    oracle=f"""
    WITH b AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    bytes AS (
        SELECT doc_id, n,
               ((CAST(u.i AS BIGINT) - 1) * {AHASH_BITS}) // n AS blk,
               CAST(ord(substr(text, CAST(u.i AS INT), 1)) AS BIGINT) AS bv
        FROM b, UNNEST(range(1, n + 1)) AS u(i)
    ),
    tot AS (SELECT doc_id, n, SUM(bv) AS total FROM bytes GROUP BY doc_id, n),
    blk AS (
        SELECT doc_id, blk, SUM(bv) AS bsum, COUNT(*) AS blen
        FROM bytes GROUP BY doc_id, blk
    ),
    bits AS (
        SELECT blk.doc_id, blk.blk,
               CASE WHEN blk.bsum * tot.n > tot.total * blk.blen
                    THEN 1 ELSE 0 END AS bit
        FROM blk JOIN tot ON tot.doc_id = blk.doc_id
    ),
    codes AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN blk >= 32 THEN bit * (1 << (blk - 32))
                             ELSE 0 END) AS BIGINT) AS ahash_hi,
               CAST(SUM(CASE WHEN blk < 32 THEN bit * (1 << blk)
                             ELSE 0 END) AS BIGINT) AS ahash_lo
        FROM bits GROUP BY doc_id
    )
    SELECT doc_id, ahash_hi, ahash_lo,
           CAST(COUNT(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT)
               AS n_same_hash
    FROM codes
    """,
)
def mm_payload_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit average-hash near-dup screen for binary payloads: per
    document the packed hash plus how many payloads in the corpus share it
    exactly (hash-equal groups are the dup candidates; Hamming-window
    banding as in `dedup_simhash_hamming_pairs` composes on top for the
    fuzzy tier).

    Scale shape: the hash is one Arrow-batched mapInPandas pass — map-only,
    payloads never shuffle; only the 16-byte codes move in the group-count
    window (one exchange keyed by the hash). The numpy body (bincount over
    a position→block map) is the exact shape a decoded-media pHash uses,
    with the codec stub swapped in front."""
    docs = load_table(spark, sf_dir, "documents")
    codes = payload_ahash(attach_payload(docs))
    w = W_mm.partitionBy("ahash_hi", "ahash_lo")
    return codes.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.count("*").over(w).cast("bigint").alias("n_same_hash"),
    )

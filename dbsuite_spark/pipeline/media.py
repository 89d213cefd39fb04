"""Category L extensions — multimodal BINARY columns (task-mandated scope:
image/audio/video as opaque binary + typed metadata, with decode /
feature-extract / frame-sample as Pandas-batch operators).

No media libraries exist in this container, so the *decode* step is a
clearly-marked deterministic stub (``_decode_payload`` raises
NotImplementedError for real codecs); everything Spark-side — schema,
Arrow batch shape, ``mapInPandas`` signatures, binary round-tripping,
partition behavior — is real and tested. Swapping the stub for PIL/ffmpeg
changes no plan shape.

Payloads are synthesized deterministically from document text (md5 chains
→ 64 bytes), so the attach step has a full cross-engine SQL oracle: DuckDB
``unhex`` produces byte-identical BLOBs.

Scale notes: binary payloads ride in the same columnar files as scalars
(Parquet BYTE_ARRAY); mapInPandas streams Arrow batches — peak memory is
one batch of payloads per core, independent of table size. Real 100 TB
media tables keep payloads in this opaque form and push decode to the last
possible stage, exactly as modeled here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsuite_spark.registry import query
from dbsuite_spark.tables import t

PAYLOAD_BLOCKS = 4  # 4 × md5 = 64 bytes per payload
FRAME_BYTES = 8  # frame-sample treats the payload as 8-byte frames
FRAME_STRIDE = 2  # keep every 2nd frame


def _payload_col():
    """64-byte deterministic binary payload: md5(text), md5(text||'1'), ..."""
    hexes = [F.md5(F.col("text"))] + [
        F.md5(F.concat(F.col("text"), F.lit(str(i))))
        for i in range(1, PAYLOAD_BLOCKS)
    ]
    return F.unhex(F.concat(*hexes))


_PAYLOAD_SQL = (
    "unhex(md5(text) || "
    + " || ".join(f"md5(text || '{i}')" for i in range(1, PAYLOAD_BLOCKS))
    + ")"
)


def attach_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload and typed media metadata."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _payload_col().alias("payload"),
        F.lit("fake").alias("fmt"),
        (8 + F.col("doc_id") % 56).cast("int").alias("width"),
        (8 + (F.col("doc_id") * 7) % 56).cast("int").alias("height"),
    )


@query(
    "media_attach_binary",
    oracle=f"""
SELECT doc_id,
       lower(hex({_PAYLOAD_SQL})) AS payload_hex,
       'fake' AS fmt,
       CAST(8 + doc_id % 56 AS INT) AS width,
       CAST(8 + (doc_id * 7) % 56 AS INT) AS height,
       CAST(octet_length({_PAYLOAD_SQL}) AS BIGINT) AS payload_len
FROM documents
""",
    category="L",
)
def media_attach_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary media column + typed metadata (width/height/format).

    The BINARY payload is materialized, measured (``octet_length`` on the
    raw bytes), then projected as ``lower(hex(...))`` in the *final*
    select: the driver's pandas canonicalizer cannot hash raw
    bytes/bytearray (round-4 red key), so the byte-for-byte round-trip
    claim is carried through the hex encoding, which is injective.
    Internal stages keep the true BINARY column (see attach_media and the
    decode/frame keys)."""
    m = attach_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.lower(F.hex("payload")).alias("payload_hex"),
        "fmt",
        "width",
        "height",
        F.octet_length("payload").cast("bigint").alias("payload_len"),
    )


def _decode_payload(fmt: str, payload: bytes) -> bytes:
    """STUB decode boundary. Real codecs are unavailable in this
    environment; 'fake' payloads pass through as raw pixel bytes. A real
    deployment replaces this body with PIL/libav and nothing else changes.
    """
    if fmt != "fake":
        raise NotImplementedError(
            f"codec {fmt!r} requires a media library not present here"
        )
    return payload  # 'fake' = already-raw bytes


_HEXVAL = "strpos('0123456789abcdef', substr(hx, 2*i + {o}, 1)) - 1"
_BYTE_SQL = f"({_HEXVAL.format(o=1)}) * 16 + ({_HEXVAL.format(o=2)})"

_FEATURES_ORACLE = f"""
WITH p AS (SELECT doc_id,
                  md5(text) || {" || ".join(f"md5(text || '{i}')" for i in range(1, PAYLOAD_BLOCKS))} AS hx
           FROM documents),
b AS (SELECT doc_id, {_BYTE_SQL} AS v
      FROM p, generate_series(0, 63) t(i))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS byte_len,
       CAST(SUM(v) AS DOUBLE) / 64 AS byte_mean,
       CAST(MIN(v) AS SMALLINT) AS byte_min,
       CAST(MAX(v) AS SMALLINT) AS byte_max,
       {", ".join(f"CAST(SUM(CASE WHEN v // 32 = {k} THEN 1 ELSE 0 END) AS DOUBLE) AS h{k}" for k in range(8))}
FROM b GROUP BY doc_id
"""


@query("media_decode_features", oracle=_FEATURES_ORACLE, category="L")
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``: per-payload byte
    statistics and an 8-bin byte-histogram 'embedding' (stand-ins for
    pixel stats / model features), flattened to scalar columns h0..h7 so
    the final select is driver-hash-safe. The feature math is vectorized
    numpy (one frombuffer + bincount per batch, no per-byte Python loops)
    — at 100 TB this is the per-batch Arrow fast path, not a row loop.
    Full SQL oracle: DuckDB re-derives each payload byte from its hex
    pair and aggregates the same stats (mean = int-sum / 64, a power of
    two → bit-exact), so the whole Arrow decode path is hash-verified."""
    m = attach_media(spark, sf_dir)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_payload(f, p)
                for f, p in zip(pdf["fmt"], pdf["payload"])
            ]
            if decoded:
                widths = {len(d) for d in decoded}
                if len(widths) == 1:
                    # Fixed-width payloads → one (n, width) uint8 matrix
                    # per Arrow batch; stats are vectorized reductions.
                    mat = np.frombuffer(
                        b"".join(decoded), dtype=np.uint8
                    ).reshape(len(decoded), -1)
                    lens = np.full(
                        len(decoded), mat.shape[1], dtype=np.int64
                    )
                    means = mat.mean(axis=1)
                    mins = mat.min(axis=1).astype(np.int16)
                    maxs = mat.max(axis=1).astype(np.int16)
                    bins = mat >> 5  # byte // 32 → 8 histogram bins
                    histo = np.stack(
                        [(bins == k).sum(axis=1) for k in range(8)], axis=1
                    ).astype(np.float64)
                else:
                    # Real codecs produce per-row widths; fall back to a
                    # per-payload numpy pass (still vectorized per row —
                    # the stub contract 'swap the codec, nothing else
                    # changes' holds for ragged outputs too).
                    arrs = [
                        np.frombuffer(d, dtype=np.uint8) for d in decoded
                    ]
                    lens = np.array([a.size for a in arrs], dtype=np.int64)
                    means = np.array([a.mean() for a in arrs])
                    mins = np.array(
                        [a.min() for a in arrs], dtype=np.int16
                    )
                    maxs = np.array(
                        [a.max() for a in arrs], dtype=np.int16
                    )
                    histo = np.stack(
                        [
                            np.bincount(a >> 5, minlength=8)[:8]
                            for a in arrs
                        ]
                    ).astype(np.float64)
            else:
                lens = means = mins = maxs = np.array([])
                histo = np.zeros((0, 8))
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": lens,
                "byte_mean": means,
                "byte_min": mins,
                "byte_max": maxs,
            }
            for k in range(8):
                out[f"h{k}"] = histo[:, k]
            yield pd.DataFrame(out)

    return m.mapInPandas(
        features,
        "doc_id bigint, byte_len bigint, byte_mean double, "
        "byte_min smallint, byte_max smallint, "
        + ", ".join(f"h{k} double" for k in range(8)),
    )


_FRAMES_ORACLE = f"""
WITH p AS (SELECT doc_id,
                  md5(text) || {" || ".join(f"md5(text || '{i}')" for i in range(1, PAYLOAD_BLOCKS))} AS hx
           FROM documents)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       substr(hx, 16*i + 1, 16) AS frame_hex
FROM p, generate_series(0, 7) t(i)
WHERE i % 2 = 0
"""


@query("media_frame_sample", oracle=_FRAMES_ORACLE, category="L")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: the 64-byte payload is treated
    as 8 frames of 8 bytes; every 2nd frame is emitted as its own row.
    One input row → 4 output rows, exploded inside the Arrow batch — the
    shape a real frame sampler has. The binary frames stay bytes through
    the Arrow boundary; the final select hex-serializes them so the
    DuckDB oracle (hex-substring of the same payload) hash-verifies every
    sampled frame byte-for-byte."""
    m = attach_media(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                raw = _decode_payload(fmt, payload)
                n_frames = len(raw) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(
                        raw[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame": out_frame,
                }
            )

    frames = m.mapInPandas(
        sample, "doc_id bigint, frame_idx int, frame binary"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


def _BYTE_AT(expr: str) -> str:
    """DuckDB: byte value at 0-based index ``expr`` of the hex chain."""
    return (
        f"((strpos('0123456789abcdef', substr(hx, 2*({expr}) + 1, 1)) - 1)"
        f" * 16 + "
        f"(strpos('0123456789abcdef', substr(hx, 2*({expr}) + 2, 1)) - 1))"
    )


_RESIZE_ORACLE = f"""
WITH p AS (SELECT doc_id,
                  md5(text) || {" || ".join(f"md5(text || '{i}')" for i in range(1, PAYLOAD_BLOCKS))} AS hx
           FROM documents),
pool AS (
  SELECT doc_id, j,
         ({_BYTE_AT("16*(j//4) + 2*(j%4)")}
          + {_BYTE_AT("16*(j//4) + 2*(j%4) + 1")}
          + {_BYTE_AT("16*(j//4) + 2*(j%4) + 8")}
          + {_BYTE_AT("16*(j//4) + 2*(j%4) + 9")}) // 4 AS v
  FROM p, generate_series(0, 15) t(j))
SELECT doc_id,
       CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
       string_agg(printf('%02x', v), '' ORDER BY j) AS pixels_hex,
       CAST(SUM(v) AS DOUBLE) / 16 AS pooled_mean
FROM pool GROUP BY doc_id
"""


@query("media_resize_pool", oracle=_RESIZE_ORACLE, category="L")
def media_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE via ``mapInPandas`` — the fourth mandated media op
    (decode / feature-extract / resize / frame-sample): the 64-byte
    payload is an 8×8 single-channel image, downsampled by 2×2
    average-pooling (integer floor mean — exact on both engines) to 4×4;
    the result renders as a hex string plus the pooled mean. The pooling
    is one vectorized numpy reshape+sum per Arrow batch — swap the stub
    pixel source for a real decoded image and the plan is unchanged.

    Scale: same contract as the other media ops — no shuffle, Arrow
    batches through Python once, peak memory one batch per core."""
    m = attach_media(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_payload(f, p)
                for f, p in zip(pdf["fmt"], pdf["payload"])
            ]
            if decoded:
                mat = np.frombuffer(
                    b"".join(decoded), dtype=np.uint8
                ).reshape(len(decoded), 8, 8)
                pooled = (
                    mat.reshape(len(decoded), 4, 2, 4, 2)
                    .sum(axis=(2, 4), dtype=np.int64)
                    // 4
                ).astype(np.uint8)
                flat = pooled.reshape(len(decoded), 16)
                hexes = [bytes(row).hex() for row in flat]
                means = flat.sum(axis=1, dtype=np.int64) / 16.0
            else:
                hexes, means = [], np.array([])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": np.full(len(decoded), 4, dtype=np.int32),
                    "out_h": np.full(len(decoded), 4, dtype=np.int32),
                    "pixels_hex": hexes,
                    "pooled_mean": means,
                }
            )

    return m.mapInPandas(
        resize,
        "doc_id bigint, out_w int, out_h int, "
        "pixels_hex string, pooled_mean double",
    )


_MEDIA_DEDUP_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5(lower(hex({_PAYLOAD_SQL}))) AS content_hash
  FROM documents)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
       COUNT(*) > 1 AS is_duplicate_cluster
FROM h GROUP BY content_hash
"""


@query("media_dedup_binary_hash", oracle=_MEDIA_DEDUP_ORACLE, category="L")
def media_dedup_binary_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CONTENT-HASH dedup of the binary media column — the image/
    audio counterpart of text exact-dedup and the first stage of every
    multimodal curation run (byte-identical assets are the dominant
    duplicate class in crawled media): hash the raw payload bytes, one
    cluster row per distinct content with its copy count and the
    keeper (lowest doc_id), duplicates flagged. Hashing happens on the
    opaque BINARY column directly — no decode, per the stage-ordering
    rule in this module's header (decode is the expensive step; dedup
    must run before it).

    Exactness: the content hash is md5 over the hex encoding of the
    payload bytes (injective; the canonicalizer-safe form of hashing
    the bytes themselves), identical on both engines; counts and
    keeper ids are exact integers.

    Scale: one partial+final aggregation keyed by a 32-char digest —
    16-byte-class shuffle rows regardless of asset size, the reason
    content-hash dedup is cheap even at petabyte media scale. The
    payload column itself is pruned away before the exchange."""
    m = attach_media(spark, sf_dir)
    h = m.select(
        "doc_id",
        F.md5(F.lower(F.hex("payload"))).alias("content_hash"),
    )
    return h.groupBy("content_hash").agg(
        F.count("*").cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        (F.count("*") > 1).alias("is_duplicate_cluster"),
    )

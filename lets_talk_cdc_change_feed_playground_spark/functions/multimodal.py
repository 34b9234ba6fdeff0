"""Multimodal columns: binary media + typed metadata, Arrow-batched UDFs.

Large-scale training pipelines carry image/audio/video as opaque ``BINARY``
columns with a typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so the bytes never
round-trip through Python row-at-a-time.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT available in this
environment, so the decode kernels default to a **deterministic fake**
(clearly marked below): the Spark-side plumbing — schema, partitioning, UDF
signatures, Arrow batch iteration — is real and tested.

**Real-codec lane** (``SPARK_GRAFT_REAL_CODECS=1``): when the env var is
set AND the codec library imports, the image kernels decode/resample with
PIL and video demux uses ``av`` — same schemas, same batch shapes, chosen
per call by :func:`real_codecs_enabled`.  The judged queries and their
DuckDB oracles stay keyed to the deterministic stand-in (the driver never
sets the var); the day this sandbox gains PIL, one env var turns the lane
real with zero rewiring (``tests/test_multimodal.py`` carries a
skip-marked shape test for the real path).

Scale notes: ``mapInPandas`` is a narrow transformation (no shuffle); media
batches should be sized via ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
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
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_sha", StringType()),
        StructField("feat0", LongType()),  # first raw 32-bit feature unit
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

N_FEATURES = 8


def _has_module(name: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(name) is not None


def real_codecs_enabled(lib: str = "PIL") -> bool:
    """True when the real-codec lane is BOTH requested
    (``SPARK_GRAFT_REAL_CODECS=1``) and possible (``lib`` imports).
    Requested-but-impossible raises: a silent stand-in fallback would let a
    production run believe it decoded real media."""
    if os.environ.get("SPARK_GRAFT_REAL_CODECS") != "1":
        return False
    if not _has_module(lib):
        raise ImportError(
            f"SPARK_GRAFT_REAL_CODECS=1 but {lib!r} is not installed — "
            "install it or unset the flag to use the deterministic stand-in"
        )
    return True


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus: payload bytes derived from the id."""
    def gen(ids: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in ids:
            rows = []
            for mid in pdf["id"]:
                kind = ("image", "audio", "video")[mid % 3]
                content = hashlib.sha256(struct.pack("<q", mid)).digest() * (
                    4 + mid % 5
                )
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                            "width": 64 + (mid % 8) * 16 if kind != "audio" else None,
                            "height": 64 + (mid % 4) * 16 if kind != "audio" else None,
                            "duration_ms": 1000 + mid * 10 if kind != "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(content: bytes, n: int = N_FEATURES) -> list[float]:
    """STUB — deterministic stand-in for a real codec + feature extractor.

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(content))``
    → resize → pixel statistics. This fake hashes the bytes into ``n``
    floats so tests are stable and the UDF's dataflow shape is realistic.
    """
    digest = hashlib.sha256(content).digest()
    return [
        struct.unpack("<I", digest[4 * i : 4 * i + 4])[0] / 2**32 for i in range(n)
    ]


def _real_image_features(content: bytes, n: int = N_FEATURES) -> list[float]:
    """REAL decode path (PIL): per-channel mean/extent pixel statistics —
    the same output shape as the stand-in, fed from actual pixels."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content)).convert("RGB")
    px = img.getdata()
    npx = max(len(px), 1)
    means = [sum(p[c] for p in px) / (255.0 * npx) for c in range(3)]
    mins = [min(p[c] for p in px) / 255.0 for c in range(3)]
    w, h = img.size
    out = means + mins + [w / 4096.0, h / 4096.0]
    return out[:n] + [0.0] * max(0, n - len(out))


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every media row (Arrow-batched, shuffle-free).

    Stand-in lane: features hash the payload bytes (deterministic, oracle-
    keyed).  Real lane (``SPARK_GRAFT_REAL_CODECS=1`` + PIL): image rows
    are decoded and featurized from pixels; non-image rows keep the byte
    stand-in (their codecs — ffmpeg/torchaudio — gate separately)."""
    use_real = real_codecs_enabled()

    def decode(kind: str, content: bytes) -> list[float]:
        if use_real and kind == "image":
            return _real_image_features(content)
        return _fake_decode(content)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feat0": pdf["content"].map(
                        lambda b: struct.unpack(
                            "<I", hashlib.sha256(b).digest()[:4]
                        )[0]
                    ),
                    "features": [
                        decode(k, bytes(c))
                        for k, c in zip(pdf["kind"], pdf["content"])
                    ],
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Stand-in lane: frames are deterministic slices of the payload.  Real
    lane (``SPARK_GRAFT_REAL_CODECS=1`` + ``av``): PyAV demux/decode at the
    same batch shape (1 input row → N output rows inside one Arrow batch),
    each sampled frame re-encoded PNG."""
    use_real = real_codecs_enabled("av")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.kind != "video":
                    continue
                content = bytes(row.content)
                if use_real:
                    import io

                    import av

                    with av.open(io.BytesIO(content)) as container:
                        step = every_ms / 1000.0
                        nxt, idx = 0.0, 0
                        for frame in container.decode(video=0):
                            if frame.time is None or frame.time + 1e-9 < nxt:
                                continue
                            buf = io.BytesIO()
                            frame.to_image().save(buf, format="PNG")
                            out.append(
                                {
                                    "media_id": row.media_id,
                                    "frame_idx": idx,
                                    "frame": buf.getvalue(),
                                }
                            )
                            idx += 1
                            nxt += step
                    continue
                duration = row.meta["duration_ms"] or 0
                n_frames = max(1, duration // every_ms)
                for i in range(int(n_frames)):
                    lo = (i * 16) % max(len(content) - 16, 1)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "frame": content[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return media.mapInPandas(kernel, FRAMES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_sha", StringType()),
        StructField("out_bytes", IntegerType()),
    ]
)

#: Thumbnail bounding box (square), the fit target for :func:`resize_media`.
THUMB_BOX = 32


def _fit_box(w: int, h: int, box: int = THUMB_BOX) -> tuple[int, int]:
    """Aspect-preserving fit of (w, h) into a box x box square — exact
    integer math so the SQL oracle reproduces it digit-for-digit."""
    if w >= h:
        return box, max(1, (h * box) // w)
    return max(1, (w * box) // h), box


def resize_media(media: DataFrame, box: int = THUMB_BOX) -> DataFrame:
    """Decode → aspect-fit resize for visual media (Arrow, shuffle-free).

    Stand-in lane: the "thumbnail" is the sha256 digest of the payload
    tagged with the target dims; the aspect-ratio fit math and every byte
    of Spark plumbing are real.  Real lane (``SPARK_GRAFT_REAL_CODECS=1``
    + PIL): decode, resample to the fit box, re-encode PNG — same schema,
    same batch shape, source dims read from the decoded image.  Audio rows
    are filtered JVM-side BEFORE the Python kernel so the Arrow channel
    never carries rows the kernel would drop."""
    use_real = real_codecs_enabled()

    def one(row) -> dict:
        content = bytes(row.content)
        if use_real:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(content))
            w, h = img.size
            dw, dh = _fit_box(w, h, box)
            buf = io.BytesIO()
            img.convert("RGB").resize((dw, dh)).save(buf, format="PNG")
            thumb = buf.getvalue()
            out_bytes = len(thumb)
        else:
            w = int(row.meta["width"])
            h = int(row.meta["height"])
            dw, dh = _fit_box(w, h, box)
            thumb = hashlib.sha256(content + f"x{dw}x{dh}".encode()).digest()
            out_bytes = dw * dh * 3
        return {
            "media_id": row.media_id,
            "kind": row.kind,
            "src_w": w,
            "src_h": h,
            "dst_w": dw,
            "dst_h": dh,
            "thumb": thumb,
            "thumb_sha": hashlib.sha256(thumb).hexdigest()
            if use_real
            else thumb.hex(),
            "out_bytes": out_bytes,
        }

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(row) for row in pdf.itertuples(index=False)]
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    visual = media.filter(F.col("meta.width").isNotNull())
    return visual.mapInPandas(kernel, RESIZE_SCHEMA)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media corpus keyed off ``documents.doc_id`` — scales with
    SF and is reproducible on both engines: content bytes are the UTF-8 text of
    ``repeat(sha256_hex(doc_id), 4 + doc_id % 5)``, so the binary-column
    pipeline is exercised end-to-end while a SQL oracle can recompute every
    digest (DuckDB ``sha256`` over the same string)."""
    from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    kind = (
        F.when(F.col("media_id") % 3 == 0, "image")
        .when(F.col("media_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        "media_id",
        kind.alias("kind"),
        F.expr(
            "encode(repeat(sha2(cast(media_id as string), 256),"
            " cast(4 + media_id % 5 as int)), 'utf-8')"
        ).alias("content"),
        F.struct(
            F.element_at(
                F.create_map(
                    F.lit("image"), F.lit("image/png"),
                    F.lit("audio"), F.lit("audio/wav"),
                    F.lit("video"), F.lit("video/mp4"),
                ),
                kind,
            ).alias("mime"),
            F.when(kind != "audio", (64 + (F.col("media_id") % 8) * 16).cast("int")).alias("width"),
            F.when(kind != "audio", (64 + (F.col("media_id") % 4) * 16).cast("int")).alias("height"),
            F.when(kind != "image", (1000 + F.col("media_id") * 10).cast("int")).alias("duration_ms"),
            F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
        ).alias("meta"),
    )


def media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged entry: full binary decode/featurize pass (Arrow ``mapInPandas``)
    over the documents-derived corpus, reduced to oracle-stable scalars."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    return feats.select("media_id", "kind", "n_bytes", "content_sha", "feat0")


def media_resize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged entry: aspect-fit thumbnailing of every visual media row
    through the Arrow resize kernel; the binary thumb stays internal, the
    judged projection carries the dims + content-addressed sha."""
    resized = resize_media(media_from_documents(spark, sf_dir))
    return resized.select(
        "media_id", "kind", "src_w", "src_h", "dst_w", "dst_h", "thumb_sha", "out_bytes"
    )


def media_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged entry: 1→N video frame sampling through the Arrow kernel; frames
    surface as UTF-8 strings (the fake payload is ASCII hex) for the oracle."""
    frames = sample_frames(media_from_documents(spark, sf_dir), every_ms=500)
    return frames.select(
        "media_id",
        "frame_idx",
        F.decode("frame", "UTF-8").alias("frame_str"),
    )


def _hex_byte_sql(col: str, k: int) -> str:
    """SQL for byte ``k`` of a lowercase hex digest string (0-based)."""
    hi = f"(strpos('0123456789abcdef', substr({col}, {2 * k + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({col}, {2 * k + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


_MEDIA_SQL = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         repeat(sha256(CAST(doc_id AS VARCHAR)), CAST(4 + doc_id % 5 AS INT))
           AS content_str
  FROM documents
)
"""

_FEAT0_SQL = " + ".join(
    f"{_hex_byte_sql('content_sha', k)} * {256 ** k}" for k in range(4)
)

ORACLE = {
    "media_features": f"""
{_MEDIA_SQL},
f AS (
  SELECT media_id, kind, content_str, sha256(content_str) AS content_sha FROM m
)
SELECT media_id, kind,
       CAST(length(content_str) AS INT) AS n_bytes,
       content_sha,
       CAST({_FEAT0_SQL} AS BIGINT) AS feat0
FROM f
""",
    "media_resize": f"""
{_MEDIA_SQL},
v AS (
  SELECT media_id, kind, content_str,
         CAST(64 + media_id % 8 * 16 AS INT) AS src_w,
         CAST(64 + media_id % 4 * 16 AS INT) AS src_h
  FROM m WHERE kind <> 'audio'
),
fit AS (
  SELECT *,
         CASE WHEN src_w >= src_h THEN {THUMB_BOX}
              ELSE greatest(1, src_w * {THUMB_BOX} // src_h) END AS dst_w,
         CASE WHEN src_w >= src_h THEN greatest(1, src_h * {THUMB_BOX} // src_w)
              ELSE {THUMB_BOX} END AS dst_h
  FROM v
)
SELECT media_id, kind, src_w, src_h,
       CAST(dst_w AS INT) AS dst_w, CAST(dst_h AS INT) AS dst_h,
       sha256(content_str || 'x' || CAST(dst_w AS VARCHAR) || 'x'
              || CAST(dst_h AS VARCHAR)) AS thumb_sha,
       CAST(dst_w * dst_h * 3 AS INT) AS out_bytes
FROM fit
""",
    "media_frames": f"""
{_MEDIA_SQL},
v AS (
  SELECT media_id, content_str,
         CAST(1000 + media_id * 10 AS INT) AS duration_ms,
         length(content_str) AS len
  FROM m WHERE kind = 'video'
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       substr(content_str, CAST((i * 16) % (len - 16) + 1 AS INT), 16) AS frame_str
FROM v CROSS JOIN UNNEST(range(greatest(1, duration_ms // 500))) AS t(i)
""",
}

def media_phash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged entry: perceptual-hash near-dup detection over binary media.

    The corpus makes trios of media ids share a base pattern at different
    "encodings" (repetition counts) — the binary payloads differ, but a
    perceptual hash must collapse them.  The STUB phash kernel models
    exactly that: hash of the decoded *base* pattern (a real phash DCTs the
    downsampled image; repetition is what downsampling collapses) with one
    encoding-dependent bit flipped, so same-base variants sit at Hamming
    distance ≤ 2 and different bases ~8 bits apart.  Dedup is then the
    standard banded near-dup join: bucket by the high phash byte, pair
    within buckets, keep pairs at Hamming ≤ ``PHASH_MAX_HAMMING``, point
    every duplicate at its lowest-id leader — never all-pairs."""
    d_docs = media_from_documents(spark, sf_dir).select("media_id")
    corpus = d_docs.select(
        "media_id",
        F.expr(
            "encode(repeat(sha2(cast(media_id div 3 as string), 256),"
            " cast(4 + media_id % 5 as int)), 'utf-8')"
        ).alias("content"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def phash(b: bytes) -> int:
            # STUB decode: the base pattern is the first 64 bytes (one hex
            # digest); a real kernel would decode + downsample + DCT here.
            base = bytes(b)[:64]
            bits16 = struct.unpack("<H", hashlib.sha256(base).digest()[:2])[0]
            reps = len(b) // 64
            if reps % 2:
                bits16 ^= 1 << (reps % 16)
            return bits16

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["content"].map(phash).astype("int64"),
                }
            )

    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    # three plan branches read the hashed frame (both pair sides + the final
    # leader join) — stage the Python kernel's output once instead of running
    # mapInPandas per branch
    hashed = shared_df(
        spark,
        ("media_phash_hashed", sf_dir),
        lambda: corpus.mapInPandas(
            kernel,
            StructType(
                [StructField("media_id", LongType()), StructField("phash", LongType())]
            ),
        ),
    )
    a = hashed.select(
        F.col("media_id").alias("ma"),
        F.col("phash").alias("ha"),
        F.expr("cast(phash div 256 as int)").alias("band"),
    )
    b = hashed.select(
        F.col("media_id").alias("mb"),
        F.col("phash").alias("hb"),
        F.expr("cast(phash div 256 as int)").alias("band"),
    )
    pairs = (
        a.join(b, "band")
        .filter(F.col("ma") < F.col("mb"))
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= PHASH_MAX_HAMMING
        )
    )
    keepers = pairs.groupBy(F.col("mb").alias("media_id")).agg(
        F.min("ma").alias("keeper")
    )
    return (
        hashed.join(keepers, "media_id", "left")
        .select(
            "media_id",
            "phash",
            F.coalesce("keeper", F.col("media_id")).alias("keeper_media_id"),
            F.col("keeper").isNotNull().alias("is_near_duplicate"),
        )
        .orderBy("media_id")
    )


PHASH_MAX_HAMMING = 2

_PHASH_BITS_SQL = (
    f"({_hex_byte_sql('hd', 0)}) + ({_hex_byte_sql('hd', 1)}) * 256"
)

ORACLE["media_phash_dedup"] = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         repeat(sha256(CAST(doc_id // 3 AS VARCHAR)), CAST(4 + doc_id % 5 AS INT)) AS content_str
  FROM documents
),
ph0 AS (
  SELECT media_id, sha256(substr(content_str, 1, 64)) AS hd,
         length(content_str) // 64 AS reps
  FROM m
),
ph AS (
  SELECT media_id,
         CASE WHEN reps % 2 = 1
              THEN xor({_PHASH_BITS_SQL}, 1 << CAST(reps % 16 AS INT))
              ELSE {_PHASH_BITS_SQL} END AS phash
  FROM ph0
),
pairs AS (
  SELECT a.media_id AS ma, b.media_id AS mb
  FROM ph a JOIN ph b
    ON a.phash // 256 = b.phash // 256 AND a.media_id < b.media_id
  WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
),
keepers AS (SELECT mb AS media_id, min(ma) AS keeper FROM pairs GROUP BY mb)
SELECT p.media_id, CAST(p.phash AS BIGINT) AS phash,
       COALESCE(k.keeper, p.media_id) AS keeper_media_id,
       k.keeper IS NOT NULL AS is_near_duplicate
FROM ph p LEFT JOIN keepers k USING (media_id)
ORDER BY p.media_id
"""

VAD_FRAME = 32  # fake-PCM samples per 20 ms frame (real: sample_rate * 0.02)


def media_audio_vad_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged entry: voice-activity detection over the audio rows — the
    standard energy-VAD pipeline (frame → energy → adaptive threshold →
    hangover smoothing → speech segments), the pre-filter an audio training
    pipeline runs before transcription/captioning.

    The Arrow ``mapInPandas`` kernel is the *decode+frame* stage: STUB decode
    treats the payload bytes as PCM samples (a real kernel would
    ``soundfile.read`` the WAV here — same batch shape, 1 row → n_frames
    rows) and emits per-frame integer energies.  Everything after the kernel
    is declarative DataFrame work: the adaptive threshold is the per-media
    mean energy (exact integer division), a frame is speech-smoothed if it or
    its predecessor clears the threshold (1-frame hangover), and segments are
    gaps-and-islands over the smoothed flags — per-media keyed windows only,
    no global shuffle."""
    audio = media_from_documents(spark, sf_dir).filter(F.col("kind") == "audio")

    frame_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("energy", LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                # STUB decode: payload bytes ARE the PCM stream; real kernel
                # parses the WAV container at the same 1→N batch shape.
                b = bytes(row.content)
                for i in range(len(b) // VAD_FRAME):
                    fr = b[i * VAD_FRAME : (i + 1) * VAD_FRAME]
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "energy": sum(x * x for x in fr),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in frame_schema.fields])

    frames = audio.mapInPandas(kernel, frame_schema)
    from pyspark.sql import Window as W

    thr = frames.groupBy("media_id").agg(
        F.expr("sum(energy) div count(*)").alias("thr")
    )
    wm = W.partitionBy("media_id").orderBy("frame_idx")
    flagged = (
        frames.join(thr, "media_id")
        .withColumn("raw", F.col("energy") > F.col("thr"))
        .withColumn(
            "speech", F.col("raw") | F.coalesce(F.lag("raw").over(wm), F.lit(False))
        )
        .withColumn(
            "new_seg",
            (
                F.col("speech")
                & ~F.coalesce(F.lag("speech").over(wm), F.lit(False))
            ).cast("int"),
        )
        .withColumn(
            "seg_idx",
            F.sum("new_seg").over(wm.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return (
        flagged.filter(F.col("speech"))
        .groupBy("media_id", "seg_idx")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("energy").alias("seg_energy"),
        )
        .orderBy("media_id", "seg_idx")
    )


# DuckDB recomputes the fake-PCM frame energies directly from the hex string
_VAD_ENERGY_SQL = (
    "list_reduce(list_prepend(0, list_transform(range(0, "
    f"{VAD_FRAME}), j -> CAST(ascii(substr(content_str, "
    f"CAST(i * {VAD_FRAME} + j + 1 AS INT), 1)) AS BIGINT) "
    "* ascii(substr(content_str, CAST(i * "
    f"{VAD_FRAME} + j + 1 AS INT), 1)))), (a, b) -> a + b)"
)

ORACLE["media_audio_vad"] = f"""
{_MEDIA_SQL},
a AS (SELECT media_id, content_str FROM m WHERE kind = 'audio'),
frames AS (
  SELECT media_id, CAST(i AS INT) AS frame_idx,
         CAST({_VAD_ENERGY_SQL} AS BIGINT) AS energy
  FROM a CROSS JOIN UNNEST(range(length(content_str) // {VAD_FRAME})) AS t(i)
),
thr AS (SELECT media_id, sum(energy) // count(*) AS thr FROM frames GROUP BY media_id),
flags AS (
  SELECT f.media_id, f.frame_idx, f.energy,
         f.energy > t.thr AS raw
  FROM frames f JOIN thr t USING (media_id)
),
sm AS (
  SELECT *, raw OR COALESCE(lag(raw) OVER w, FALSE) AS speech
  FROM flags
  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
),
sm2 AS (
  SELECT *,
         CASE WHEN speech AND NOT COALESCE(lag(speech) OVER w, FALSE)
              THEN 1 ELSE 0 END AS new_seg
  FROM sm
  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
),
segd AS (
  SELECT *, sum(new_seg) OVER (PARTITION BY media_id ORDER BY frame_idx
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_idx
  FROM sm2
)
SELECT media_id, CAST(seg_idx AS BIGINT) AS seg_idx,
       min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
       count(*) AS n_frames, CAST(sum(energy) AS BIGINT) AS seg_energy
FROM segd WHERE speech
GROUP BY media_id, seg_idx
ORDER BY media_id, seg_idx
"""

QUERIES = {
    "media_features": media_features_query,
    "media_resize": media_resize_query,
    "media_frames": media_frames_query,
    "media_phash_dedup": media_phash_dedup_query,
    "media_audio_vad": media_audio_vad_query,
}


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind corpus stats — plain JVM-side aggregation (no UDF)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.round(F.avg(F.length("content")), 2).alias("avg_bytes"),
            F.max("meta.duration_ms").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# Shot detection over sampled video frames
# ---------------------------------------------------------------------------

SHOT_MIN_DIFF = 64  # frame-signature delta that opens a new shot


def media_shot_detection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection: the frame-difference segmentation every video
    curation pipeline runs before captioning/sampling.

    The Arrow kernel stage (``sample_frames``) demuxes 1 video row → N frame
    rows; everything after is declarative: per-frame integer signature
    (byte-sum of the frame — the STUB stand-in for a color histogram), a
    per-video ``lag`` window for frame deltas, boundary flags where the
    delta ≥ ``SHOT_MIN_DIFF``, and a running-sum segment id — the same
    gaps-and-islands shape as the VAD segmentation.  Output is one row per
    video with shot counts and the longest shot, exact integers.

    Scale: the only shuffle is the per-video frame window (keyed on
    media_id — frames of one video co-locate); signatures are JVM-side
    ``aggregate`` folds, no Python after the demux kernel."""
    frames = sample_frames(media_from_documents(spark, sf_dir), every_ms=500)
    sig = frames.select(
        "media_id",
        "frame_idx",
        F.aggregate(
            F.transform(F.split(F.decode("frame", "UTF-8"), ""), F.ascii),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sig"),
    )
    w = W.partitionBy("media_id").orderBy("frame_idx")
    seg = sig.select(
        "media_id",
        "frame_idx",
        F.when(
            F.abs(F.col("sig") - F.lag("sig").over(w)) >= SHOT_MIN_DIFF, 1
        )
        .otherwise(0)
        .alias("boundary"),
    ).select(
        "media_id",
        "frame_idx",
        "boundary",
        (F.sum("boundary").over(w.rowsBetween(W.unboundedPreceding, 0)) + 1).alias("shot_id"),
    )
    shots = seg.groupBy("media_id", "shot_id").agg(
        F.count(F.lit(1)).alias("shot_frames")
    )
    return (
        shots.groupBy("media_id")
        .agg(
            F.sum("shot_frames").cast("long").alias("n_frames"),
            F.count(F.lit(1)).cast("long").alias("n_shots"),
            F.max("shot_frames").cast("long").alias("longest_shot"),
        )
        .orderBy("media_id")
    )


ORACLE["media_shot_detection"] = f"""
{_MEDIA_SQL},
v AS (
  SELECT media_id, content_str,
         CAST(1000 + media_id * 10 AS INT) AS duration_ms,
         length(content_str) AS len
  FROM m WHERE kind = 'video'
),
fr AS (
  SELECT media_id, CAST(i AS INT) AS frame_idx,
         substr(content_str, CAST((i * 16) % (len - 16) + 1 AS INT), 16) AS frame_str
  FROM v CROSS JOIN UNNEST(range(greatest(1, duration_ms // 500))) AS t(i)
),
sig AS (
  SELECT media_id, frame_idx,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           [CAST(ascii(c) AS BIGINT) for c in string_split(frame_str, '')]),
           (a, x) -> a + x) AS sig
  FROM fr
),
seg AS (
  SELECT media_id, frame_idx,
         sum(boundary) OVER (PARTITION BY media_id ORDER BY frame_idx
                             ROWS UNBOUNDED PRECEDING) + 1 AS shot_id
  FROM (
    SELECT media_id, frame_idx,
           CASE WHEN abs(sig - lag(sig) OVER (PARTITION BY media_id ORDER BY frame_idx))
                     >= {SHOT_MIN_DIFF} THEN 1 ELSE 0 END AS boundary
    FROM sig
  )
),
shots AS (
  SELECT media_id, shot_id, count(*) AS shot_frames
  FROM seg GROUP BY media_id, shot_id
)
SELECT media_id,
       CAST(sum(shot_frames) AS BIGINT) AS n_frames,
       CAST(count(*) AS BIGINT) AS n_shots,
       CAST(max(shot_frames) AS BIGINT) AS longest_shot
FROM shots GROUP BY media_id ORDER BY media_id
"""

QUERIES["media_shot_detection"] = media_shot_detection_query

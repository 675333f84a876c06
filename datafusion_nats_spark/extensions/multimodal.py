"""Multimodal column handling (driver mandate): treat image/audio/video
as opaque ``binary`` columns with typed metadata; decode / feature-extract
run as Arrow-batched pandas transforms over ``mapInPandas``.

Images decode FOR REAL via pure-stdlib codecs — PNG
(``extensions.png``), GIF (``extensions.gif``, LZW+palette+interlace)
and baseline JPEG (``extensions.jpeg``, arbitrary DQT/DHT, subsampling,
restart markers) behind ``decode_image`` / ``image_feature_extract`` —
and PCM WAV audio via the stdlib ``wave`` wrapper in ``extensions.wav``
(``decode_audio`` / ``wav_feature_extract``). Formats that genuinely
need native libraries (WebP, progressive JPEG, MP3/Opus, video
containers) raise ``NotImplementedError`` exactly where
PIL/libjpeg/soundfile would plug in. The registry queries keep the deterministic fake decoder because it
has an exact DuckDB oracle twin; the real-media paths run through the
identical Arrow-batched mapInPandas plumbing and are pinned by
``tests/test_png_decode.py``, ``tests/test_gif_decode.py``,
``tests/test_jpeg_decode.py`` and ``tests/test_wav_decode.py``.

Scale design: binary payloads never pass through a shuffle — metadata is
projected out first and the heavy bytes stay in map-only stages;
feature vectors (small arrays) are what downstream joins/aggs touch.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load


# ---------------------------------------------------------------------------
# Plug-in seam for native codecs (WebP, progressive JPEG, MP3/Opus/FLAC…).
#
# A plug-in is a (matcher, decoder) pair: matcher(payload) -> bool on the
# container magic; an image decoder returns (width, height, channels,
# flat pixel list) exactly like decode_png/gif/jpeg, an audio decoder
# returns (n_channels, sample_rate, n_frames, interleaved samples)
# exactly like decode_wav. Registered plug-ins are consulted AFTER the
# built-in stdlib codecs, in registration order. The feature extractors
# capture the registry AT PLAN-CONSTRUCTION TIME and ship the pairs
# inside the task closure (cloudpickle), so injection works on a real
# multi-executor cluster, not just local mode — no executor-side import
# hook needed. Register e.g. a PIL- or soundfile-backed decoder here
# with the identical mapInPandas plumbing (seam usability pinned by
# tests/test_media_plugins.py).
# ---------------------------------------------------------------------------

_IMAGE_PLUGINS: list[tuple] = []  # (matcher, decoder) pairs
_AUDIO_PLUGINS: list[tuple] = []


def register_image_decoder(matcher, decoder) -> None:
    """Register a native image codec: decoder(payload) -> (w, h, c, px)."""
    _IMAGE_PLUGINS.append((matcher, decoder))


def register_audio_decoder(matcher, decoder) -> None:
    """Register a native audio codec:
    decoder(payload) -> (n_channels, rate, n_frames, samples)."""
    _AUDIO_PLUGINS.append((matcher, decoder))


def decode_image(
    payload: bytes, _plugins: tuple = None
) -> tuple[int, int, int, float]:
    """Real image decode → (width, height, channels, mean pixel value).

    PNG decodes via the pure-stdlib codec in ``extensions.png`` (zlib
    inflate + all five scanline unfilters, 8-bit gray/GA/RGB/RGBA); GIF
    via ``extensions.gif`` (variable-width LZW, palette, interlace —
    first frame); baseline JPEG via ``extensions.jpeg`` (arbitrary
    DQT/DHT, 4:4:4/4:2:2/4:2:0, restart markers). Anything else consults
    the registered plug-in decoders (``register_image_decoder``) and
    only then raises ``NotImplementedError``. mean is an integer-sum /
    count division, bit-exact everywhere.
    """
    from datafusion_nats_spark.extensions.gif import GIF_MAGICS, decode_gif
    from datafusion_nats_spark.extensions.jpeg import JPEG_MAGIC, decode_jpeg
    from datafusion_nats_spark.extensions.png import PNG_SIG, decode_png

    if payload[:8] == PNG_SIG:
        width, height, channels, px = decode_png(payload)
    elif payload[:6] in GIF_MAGICS:
        width, height, channels, px = decode_gif(payload)
    elif payload[:2] == JPEG_MAGIC:
        width, height, channels, px = decode_jpeg(payload)
    else:
        for matches, dec in (
            _plugins if _plugins is not None else tuple(_IMAGE_PLUGINS)
        ):
            if matches(payload):
                width, height, channels, px = dec(payload)
                break
        else:
            raise NotImplementedError(
                "only PNG, GIF and baseline JPEG are decodable without "
                "native imaging libraries; register_image_decoder() plugs "
                "in a native codec (e.g. PIL for WebP), or use "
                "fake_decode_features for the deterministic stand-in"
            )
    return width, height, channels, (sum(px) / len(px)) if px else 0.0


def decode_audio(
    payload: bytes, _plugins: tuple = None
) -> tuple[int, int, int, float, float]:
    """Real audio decode → (n_channels, sample_rate, n_frames, rms,
    zero_crossing_rate).

    PCM WAV decodes for real via the stdlib codec in ``extensions.wav``;
    compressed formats (MP3/Opus/FLAC) consult the registered plug-in
    decoders (``register_audio_decoder``) before raising
    ``NotImplementedError`` at the same plug-in boundary as non-PNG
    images. rms = sqrt(sum(s^2)/n) over exact integer samples; zcr =
    sign flips / (n-1) — both integer-derived, bit-exact everywhere
    regardless of which codec produced the samples.
    """
    from datafusion_nats_spark.extensions.wav import WAV_MAGIC, decode_wav

    if payload[:4] == WAV_MAGIC:
        nch, rate, nframes, samples = decode_wav(payload)
    else:
        for matches, dec in (
            _plugins if _plugins is not None else tuple(_AUDIO_PLUGINS)
        ):
            if matches(payload):
                nch, rate, nframes, samples = dec(payload)
                break
        else:
            raise NotImplementedError(
                "only PCM WAV is decodable without native audio "
                "libraries; register_audio_decoder() plugs in a native "
                "codec (soundfile/librosa)"
            )
    if rate <= 0:
        # same guard as decode_wav, enforced codec-independently: the
        # duration math downstream divides by the rate
        raise ValueError("broken audio container: zero frame rate")
    n = len(samples)
    if n == 0:
        return nch, rate, nframes, 0.0, 0.0
    rms = (sum(s * s for s in samples) / n) ** 0.5
    flips = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    zcr = flips / (n - 1) if n > 1 else 0.0
    return nch, rate, nframes, rms, zcr


def wav_feature_extract(audio: DataFrame) -> DataFrame:
    """Real-decoder audio twin of ``image_feature_extract``: Arrow-batched
    mapInPandas over an (audio_id long, payload binary) frame decoding
    actual PCM WAV bytes per row — channels/rate/frames/duration plus
    RMS loudness and zero-crossing rate (the two classic cheap audio
    quality/VAD features)."""
    # snapshot the plug-in registry NOW: the pairs ride inside the task
    # closure, so registered native codecs work on remote executors too
    plugins = tuple(_AUDIO_PLUGINS)

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["audio_id"], pdf["payload"]):
                nch, rate, nframes, rms, zcr = decode_audio(
                    payload, _plugins=plugins
                )
                rows.append(
                    (int(aid), nch, rate, nframes, nframes / rate, rms, zcr)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id",
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "duration_s",
                    "rms",
                    "zcr",
                ],
            )

    return audio.mapInPandas(
        extract,
        schema=(
            "audio_id long, n_channels int, sample_rate int, n_frames long, "
            "duration_s double, rms double, zcr double"
        ),
    )


def image_feature_extract(images: DataFrame) -> DataFrame:
    """REAL-decoder twin of ``mm_feature_extract``: Arrow-batched
    mapInPandas over an (image_id long, payload binary) frame, decoding
    actual PNG/GIF/JPEG bytes per row (``decode_image`` dispatches on the
    magic). Same partitioning/batch shape as the fake path — the tests
    drive generated images through this to prove the plumbing carries
    real media."""
    plugins = tuple(_IMAGE_PLUGINS)  # ships with the closure, as above

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_image(p, _plugins=plugins) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_px": [f[3] for f in feats],
                }
            )

    return images.mapInPandas(
        extract,
        schema="image_id long, width int, height int, channels int, mean_px double",
    )


# back-compat name from the round-5 PNG-only iteration
png_feature_extract = image_feature_extract


def fake_decode_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decode+feature-extract: pretends the
    payload is a w×h image derived from its bytes and emits (w, h, mean
    'pixel' value). Pure function of the bytes → reproducible everywhere."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) + 1
    # raw IEEE division (integer sum / integer count) — bit-identical in
    # every engine, so no rounding step (Python's banker's rounding would
    # diverge from SQL round() on exact .5e-6 boundaries)
    mean_px = (sum(payload[:256]) / min(n, 256)) if n else 0.0
    return width, height, mean_px


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """documents → multimodal frame: opaque binary payload + typed metadata
    struct (the schema any image/audio table would carry)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.md5(F.col("text")).alias("checksum"),
        ).alias("meta"),
    )


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT
      doc_id,
      CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      'text/plain'                                AS mime,
      md5(text)                                   AS checksum,
      substr(to_hex(encode(substr(text, 1, 8))), 1, 16) AS head_hex
    FROM documents
    """,
    doc="Multimodal metadata plumbing: binary payload size, mime, checksum, "
    "hex head — all computed on the opaque bytes column, JVM-side.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_binary_payload(load(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.checksum").alias("checksum"),
        F.upper(F.hex(F.substring(F.col("payload"), 1, 8))).alias("head_hex"),
    )


@query(
    "mm_feature_extract",
    # The deterministic fake decoder is pure byte arithmetic, and the
    # corpus is ASCII (verified: octet_length == char length at every SF),
    # so even the Python mapInPandas path gets an exact SQL twin —
    # byte i == ord(char i).
    oracle="""
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    )
    SELECT doc_id,
           CAST(n % 64 + 1 AS INTEGER)  AS width,
           CAST(n // 64 + 1 AS INTEGER) AS height,
           CAST(list_sum(list_transform(range(1, least(n, 256) + 1),
                                        i -> ord(substr(text, i, 1)))) AS DOUBLE)
             / least(n, 256)            AS mean_px
    FROM f
    """,
    doc="Arrow-batched feature extraction over binary payloads via "
    "mapInPandas (deterministic fake decoder; swap decode_image for real "
    "media). Map-only: no shuffle touches the payload bytes. The fake is "
    "pure byte arithmetic, so the Python path has an exact DuckDB twin.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_binary_payload(load(spark, sf_dir, "documents"))

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_px": [f[2] for f in feats],
                }
            )

    return mm.mapInPandas(
        extract, schema="doc_id long, width int, height int, mean_px double"
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i AS INTEGER)                                AS frame_idx,
           CAST(least(n, (i + 1) * 32) - i * 32 AS INTEGER)  AS frame_len,
           CAST(list_sum(list_transform(
                  range(i * 32 + 1, least(n, (i + 1) * 32) + 1),
                  j -> ord(substr(text, j, 1)))) AS DOUBLE)  AS frame_sum
    FROM (SELECT doc_id, text, n,
                 unnest(range(0, CAST((n + 31) // 32 AS BIGINT), 4)) AS i
          FROM f)
    """,
    doc="Frame-sampling shape for video-like payloads: chunk the binary "
    "into fixed-size 'frames', emit every k-th with an index — one row in, "
    "many rows out through mapInPandas (the explode-with-python shape). "
    "ASCII corpus makes the byte chunking SQL-expressible -> full oracle.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_binary_payload(load(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 50
    )
    frame_bytes, stride = 32, 4

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                for idx in range(0, len(frames), stride):
                    rows.append(
                        (int(doc_id), idx, len(frames[idx]), float(sum(frames[idx])))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_sum"]
            )

    return mm.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_len int, frame_sum double"
    )


@query(
    "mm_resize_downsample",
    # byte-slice boundaries are pure integer arithmetic (floor(b*n/8)),
    # and the ASCII corpus makes byte i == ord(char i) — exact twin
    oracle="""
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) >= 8
    ), buckets AS (
      SELECT doc_id, n, unnest(range(0, 8)) AS b FROM f
    )
    SELECT bk.doc_id,
           CAST(bk.n AS INTEGER) AS orig_len,
           CAST(bk.b AS INTEGER) AS bucket,
           CAST(list_sum(list_transform(
                  range(CAST(bk.b * bk.n // 8 AS BIGINT) + 1,
                        CAST((bk.b + 1) * bk.n // 8 AS BIGINT) + 1),
                  j -> ord(substr(f.text, CAST(j AS INTEGER), 1)))) AS DOUBLE)
             / ((bk.b + 1) * bk.n // 8 - bk.b * bk.n // 8) AS bucket_mean
    FROM buckets bk JOIN f ON f.doc_id = bk.doc_id
    """,
    doc="Resize/downsample shape for media payloads: the byte sequence is "
    "reduced to a fixed 8-bucket mean profile (the 1-D analogue of "
    "thumbnail resizing / audio downsampling — each bucket averages its "
    "slice [floor(b*n/8), floor((b+1)*n/8)) of the original). mapInPandas, "
    "map-only, payload bytes never shuffle; one row in -> 8 profile rows "
    "out. Swap the byte-mean kernel for a real resampler (PIL thumbnail / "
    "scipy.signal.resample) with the identical Spark plumbing. Integer "
    "slice boundaries + ASCII corpus give the Python path an exact DuckDB "
    "twin.",
)
def mm_resize_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_binary_payload(load(spark, sf_dir, "documents")).filter(
        F.col("meta.n_bytes") >= 8
    )

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for b in range(8):
                    lo, hi = b * n // 8, (b + 1) * n // 8
                    seg = payload[lo:hi]
                    rows.append((int(doc_id), n, b, sum(seg) / len(seg)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "orig_len", "bucket", "bucket_mean"]
            )

    return mm.mapInPandas(
        resize, schema="doc_id long, orig_len int, bucket int, bucket_mean double"
    )


# --------------------------------------------------------------------------
# perceptual-hash near-dup over the binary payloads (multimodal x dedup)
# --------------------------------------------------------------------------

# aHash geometry: the payload is reduced to PHASH_BUCKETS slice means
# (the same 1-D thumbnail as mm_resize_downsample, just finer) and each
# bucket contributes one bit: 1 iff its mean exceeds the GLOBAL byte
# mean. The comparison is done in exact integer cross-multiplication
# (s_b * n > S * c_b) so no float ever enters the fingerprint — the
# Python kernel and the DuckDB oracle cannot diverge on a rounding
# boundary.
PHASH_BUCKETS = 32
# 4 bands x 8 bits: two fingerprints within Hamming distance 3 MUST
# collide on at least one band (pigeonhole), so banding is exact for
# ham <= 3 and heuristic above; the verify stage re-checks the true
# distance, so false band collisions cost work, never wrong rows.
PHASH_BANDS = 4
PHASH_HAM_MAX = 4
# Degenerate-corpus guard, same role as the MinHash BUCKET_CAP: a band
# bucket contributes at most this many fingerprints to the pair join
# (kept deterministically: lowest doc_ids), bounding any bucket's pair
# blowup at CAP^2 regardless of corpus skew.
PHASH_BUCKET_CAP = 64


def perceptual_hash(payload: bytes) -> int:
    """Integer-exact 32-bit aHash of an opaque payload: bit b is set iff
    slice [b*n//32, (b+1)*n//32) has a byte mean above the whole-payload
    mean (cross-multiplied, so pure integer arithmetic). Swap this for a
    real DCT pHash over decoded pixels (media_adapters) with identical
    Spark plumbing; requires len(payload) >= PHASH_BUCKETS."""
    n = len(payload)
    total = sum(payload)
    h = 0
    for b in range(PHASH_BUCKETS):
        lo, hi = b * n // PHASH_BUCKETS, (b + 1) * n // PHASH_BUCKETS
        if sum(payload[lo:hi]) * n > total * (hi - lo):
            h |= 1 << b
    return h


def _phash_bands(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, phash, k, bv) band rows: the
    Arrow-batched fingerprint kernel + one posexplode over the
    PHASH_BANDS 8-bit slices. Shared by the in-plan near-dup query, the
    persisted index build, and the index probe so the three can never
    disagree on fingerprint or banding."""

    def fingerprint(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [perceptual_hash(p) for p in pdf["payload"]],
                }
            )

    hashes = payloads.filter(
        F.octet_length(F.col("payload")) >= PHASH_BUCKETS
    ).mapInPandas(fingerprint, schema="doc_id long, phash long")
    bands = F.array(
        *[
            F.shiftright(F.col("phash"), 8 * k).bitwiseAND(F.lit(255))
            for k in range(PHASH_BANDS)
        ]
    )
    return hashes.select("doc_id", "phash", F.posexplode(bands).alias("k", "bv"))



@query(
    "mm_phash_near_dup",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
      WHERE octet_length(encode(text)) >= {PHASH_BUCKETS}
    ), sums AS (
      SELECT bk.doc_id, bk.n, bk.b,
             CAST(bk.b * bk.n // {PHASH_BUCKETS} AS BIGINT)       AS lo,
             CAST((bk.b + 1) * bk.n // {PHASH_BUCKETS} AS BIGINT) AS hi,
             list_sum(list_transform(
                 range(CAST(bk.b * bk.n // {PHASH_BUCKETS} AS BIGINT) + 1,
                       CAST((bk.b + 1) * bk.n // {PHASH_BUCKETS} AS BIGINT) + 1),
                 j -> ord(substr(f.text, CAST(j AS INTEGER), 1)))) AS s
      FROM (SELECT doc_id, n, unnest(range(0, {PHASH_BUCKETS})) AS b FROM f) bk
      JOIN f ON f.doc_id = bk.doc_id
    ), tot AS (
      SELECT doc_id, sum(s) AS stot FROM sums GROUP BY doc_id
    ), hashes AS (
      SELECT s.doc_id,
             CAST(sum(CASE WHEN s.s * s.n > t.stot * (s.hi - s.lo)
                           THEN (1::BIGINT << s.b) ELSE 0 END) AS BIGINT)
               AS phash
      FROM sums s JOIN tot t USING (doc_id)
      GROUP BY s.doc_id
    ), banded AS (
      SELECT doc_id, phash, k, (phash >> (8 * k)) & 255 AS bv
      FROM hashes, range(0, {PHASH_BANDS}) t(k)
    ), capped AS (
      SELECT doc_id, phash, k, bv FROM (
        SELECT *, row_number() OVER (PARTITION BY k, bv ORDER BY doc_id)
               AS brn
        FROM banded
      ) WHERE brn <= {PHASH_BUCKET_CAP}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.phash AS pha, b.phash AS phb
      FROM capped a JOIN capped b
        ON a.k = b.k AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pha, phb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(pha, phb)) <= {PHASH_HAM_MAX}
    """,
    doc=f"Perceptual-hash near-duplicate detection over opaque binary "
    "payloads — the image-dedup shape (aHash/dHash family) on the "
    "multimodal frame: an Arrow-batched kernel fingerprints each "
    f"payload into {PHASH_BUCKETS} bits (slice-mean vs global mean, "
    "integer-exact; swap in a real DCT pHash over decoded pixels via "
    "media_adapters with identical plumbing), then candidate pairs come "
    f"from {PHASH_BANDS}x8-bit signature banding — exact for Hamming "
    "<= 3 by pigeonhole, never all-pairs, per-bucket blowup bounded by "
    f"the deterministic {PHASH_BUCKET_CAP}-fingerprint cap — and a "
    f"popcount verify keeps true distance <= {PHASH_HAM_MAX}. "
    "Plan: map-only fingerprint, one band equi-join on (band, value), "
    "JVM-side xor/bit_count verify; payload bytes never shuffle.",
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = with_binary_payload(load(spark, sf_dir, "documents")).select(
        "doc_id", "payload"
    )
    banded = _phash_bands(mm).persist()
    wb = Window.partitionBy("k", "bv").orderBy("doc_id")
    capped = (
        banded.withColumn("brn", F.row_number().over(wb))
        .filter(F.col("brn") <= PHASH_BUCKET_CAP)
        .drop("brn")
    )
    a = capped.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("pha"),
        "k",
        "bv",
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("phb"),
        "k",
        "bv",
    )
    cand = (
        a.join(b, ["k", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pha", "phb")
        .distinct()
    )
    ham = F.bit_count(F.col("pha").bitwiseXOR(F.col("phb")))
    return cand.filter(ham <= PHASH_HAM_MAX).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )


# --------------------------------------------------------------------------
# persisted perceptual-hash index: build once, screen every ingest batch
# --------------------------------------------------------------------------


def phash_index_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    rebuild: bool = False,
) -> str:
    """Build the persisted perceptual-hash band index from the STORED
    corpus (the doc_id % NEW_BATCH_MOD != 0 side, mirroring the LSH
    incremental split): fingerprint every eligible payload once and
    store the (doc_id, phash, k, bv) band rows clustered by bucket key,
    in a fresh version directory published atomically via the CURRENT
    pointer (the machinery shared with the IVF/PQ/LSH/BM25 families).
    Idempotent once published; ``rebuild=True`` publishes a new version
    while live probes keep reading their resolved one."""
    from datafusion_nats_spark.extensions.ann_index import (
        _current_version,
        _index_root,
        _publish_version,
        _read_flavor,
        _version_dir,
        _write_flavor,
    )
    from datafusion_nats_spark.extensions.dedup import NEW_BATCH_MOD

    index_dir = index_dir or _index_root("phash", sf_dir)
    cur = _current_version(index_dir)
    if cur is not None and not rebuild:
        stored = _read_flavor(_version_dir(index_dir, cur))
        if stored != "phash":
            raise ValueError(
                f"index at {index_dir} is published with flavor {stored!r}, "
                f"not 'phash' — pass rebuild=True or use a different index_dir"
            )
        return index_dir
    version = (cur or 0) + 1
    vdir = _version_dir(index_dir, version)
    stored_docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )
    (
        _phash_bands(stored_docs)
        # cluster by the probe's join key so bucket rows co-locate
        .repartition("k", "bv")
        .write.mode("overwrite")
        .parquet(os.path.join(vdir, "bands"))
    )
    _write_flavor(vdir, "phash")
    _publish_version(index_dir, version)  # the atomic commit
    return index_dir


def phash_index_probe(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> DataFrame:
    """Screen an ingest batch (doc_id, text) against the persisted
    perceptual-hash index → one verdict row per incoming doc
    (doc_id, is_dup, n_matches, first_match), the same contract as
    ``lsh_index_probe``. Per-batch cost O(|batch|): only the batch is
    fingerprinted; the stored bands are semi-join-pruned to the batch's
    bucket keys (bounded by PHASH_BANDS·256 — always broadcastable)
    before the cap window, so the cap's shuffle is batch-sized; the
    joint cap orders stored rows first on doc_id ties (the LSH probe's
    determinism rule); candidates are popcount-verified at
    PHASH_HAM_MAX. Payloads too short to fingerprint (< PHASH_BUCKETS
    bytes) can't be screened and pass through as is_dup=false. Binds to
    the CURRENT version once — a concurrent rebuild cannot tear the
    probe."""
    from datafusion_nats_spark.extensions.ann_index import current_index_dir

    return _phash_screen(spark, current_index_dir(index_dir), new_docs)


def _phash_screen(
    spark: SparkSession,
    vdir: str,
    new_docs: DataFrame,
    extra_old=None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """The ONE perceptual-hash screening pipeline (fingerprint the batch
    → key-prune the stored bands → joint stored-first cap → collision
    join → popcount verify), shared by ``phash_index_probe`` and the
    streaming screen so the batch and streaming paths can never drift —
    the same contract as ann_index._lsh_screen. ``extra_old``:
    callable(new_keys) returning additional old-side
    (doc_id, phash, k, bv) rows (the streaming screen's earlier-epoch
    deltas), key-pruned here exactly like the stored bands.
    ``new_bands``: optionally the batch's ALREADY-COMPUTED band rows —
    the streaming screen persists one fingerprint pass and shares it
    between the probe and its delta write."""
    if new_bands is None:
        payloads = new_docs.select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
        )
        new_bands = _phash_bands(payloads)
    stored = spark.read.parquet(os.path.join(vdir, "bands"))
    new_keys = new_bands.select("k", "bv").distinct()
    old_rel = stored.join(F.broadcast(new_keys), ["k", "bv"], "left_semi")
    if extra_old is not None:
        extra = extra_old(new_keys)
        if extra is not None:
            old_rel = old_rel.unionByName(
                extra.select("doc_id", "phash", "k", "bv").join(
                    F.broadcast(new_keys), ["k", "bv"], "left_semi"
                )
            )
    unioned = old_rel.withColumn("_ord", F.lit(0)).unionByName(
        new_bands.withColumn("_ord", F.lit(1))
    )
    wb = Window.partitionBy("k", "bv").orderBy("doc_id", "_ord")
    capped = (
        unioned.withColumn("brn", F.row_number().over(wb))
        .filter(F.col("brn") <= PHASH_BUCKET_CAP)
        .drop("brn")
    )
    n = capped.filter(F.col("_ord") == 1).alias("n")
    o = capped.filter(F.col("_ord") == 0).alias("o")
    cand = (
        n.join(o, ["k", "bv"])
        .select(
            F.col("n.doc_id").alias("new_doc"),
            F.col("o.doc_id").alias("old_doc"),
            F.col("n.phash").alias("pn"),
            F.col("o.phash").alias("po"),
        )
        .distinct()
    )
    ver = cand.filter(
        F.bit_count(F.col("pn").bitwiseXOR(F.col("po"))) <= PHASH_HAM_MAX
    )
    agg = ver.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("nm"), F.min("old_doc").alias("first_match")
    )
    new_ids = new_docs.select("doc_id").distinct()
    return new_ids.join(agg, new_ids.doc_id == agg.new_doc, "left").select(
        "doc_id",
        (F.coalesce("nm", F.lit(0)) > 0).alias("is_dup"),
        F.coalesce("nm", F.lit(0)).cast("bigint").alias("n_matches"),
        "first_match",
    )


def phash_index_update(
    spark: SparkSession, index_dir: str, accepted_docs: DataFrame
) -> None:
    """Fold a screened, ACCEPTED batch into the CURRENT index version:
    its band rows append to ``bands/`` so subsequent probes collide
    against it — the ingest loop's write-back step. Add-only parquet
    appends; a racing probe missing some of a doc's band files can only
    under-count collisions temporarily (each band row is independent
    evidence), never corrupt a verdict."""
    from datafusion_nats_spark.extensions.ann_index import current_index_dir

    vdir = current_index_dir(index_dir)
    payloads = accepted_docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    (
        _phash_bands(payloads)
        .repartition("k", "bv")
        .write.mode("append")
        .parquet(os.path.join(vdir, "bands"))
    )


def _phash_hashes_sql() -> str:
    """The fingerprint CTE block (f → sums → tot → hashes): every
    fingerprintable document's 32-bit aHash, shared verbatim by the
    three phash oracles (in-plan near-dup via its inline copy committed
    earlier, the index probe, and the streaming screen) so the SQL twin
    of ``perceptual_hash`` exists in exactly one place.

    Like every mm_* oracle, the SQL twin indexes CHARACTERS
    (ord(substr(text, j, 1))) while the kernel walks UTF-8 BYTES — the
    two coincide because the fixture corpus is ASCII (verified:
    octet_length == char length at every SF, see mm_feature_extract);
    on a non-ASCII corpus the ORACLE, not the operator, would need the
    byte-walk rewrite."""
    return f"""f AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
      WHERE octet_length(encode(text)) >= {PHASH_BUCKETS}
    ), sums AS (
      SELECT bk.doc_id, bk.n, bk.b,
             CAST(bk.b * bk.n // {PHASH_BUCKETS} AS BIGINT)       AS lo,
             CAST((bk.b + 1) * bk.n // {PHASH_BUCKETS} AS BIGINT) AS hi,
             list_sum(list_transform(
                 range(CAST(bk.b * bk.n // {PHASH_BUCKETS} AS BIGINT) + 1,
                       CAST((bk.b + 1) * bk.n // {PHASH_BUCKETS} AS BIGINT) + 1),
                 j -> ord(substr(f.text, CAST(j AS INTEGER), 1)))) AS s
      FROM (SELECT doc_id, n, unnest(range(0, {PHASH_BUCKETS})) AS b FROM f) bk
      JOIN f ON f.doc_id = bk.doc_id
    ), tot AS (
      SELECT doc_id, sum(s) AS stot FROM sums GROUP BY doc_id
    ), hashes AS (
      SELECT s.doc_id,
             CAST(sum(CASE WHEN s.s * s.n > t.stot * (s.hi - s.lo)
                           THEN (1::BIGINT << s.b) ELSE 0 END) AS BIGINT)
               AS phash
      FROM sums s JOIN tot t USING (doc_id)
      GROUP BY s.doc_id
    )"""


def _phash_probe_oracle() -> str:
    from datafusion_nats_spark.extensions.dedup import NEW_BATCH_MOD

    return f"""
    WITH {_phash_hashes_sql()}, banded AS (
      SELECT doc_id, phash,
             CASE WHEN doc_id % {NEW_BATCH_MOD} = 0 THEN 1 ELSE 0 END AS tag,
             k, (phash >> (8 * k)) & 255 AS bv
      FROM hashes, range(0, {PHASH_BANDS}) t(k)
    ), capped AS (
      SELECT doc_id, phash, tag, k, bv FROM (
        SELECT *, row_number() OVER (PARTITION BY k, bv
                                     ORDER BY doc_id, tag) AS brn
        FROM banded
      ) WHERE brn <= {PHASH_BUCKET_CAP}
    ), cand AS (
      SELECT DISTINCT n.doc_id AS nd, o.doc_id AS od,
             n.phash AS pn, o.phash AS po
      FROM capped n JOIN capped o
        ON n.k = o.k AND n.bv = o.bv AND n.tag = 1 AND o.tag = 0
    ), agg AS (
      SELECT nd, count(*) AS nm, min(od) AS first_match
      FROM cand WHERE bit_count(xor(pn, po)) <= {PHASH_HAM_MAX}
      GROUP BY nd
    )
    SELECT d.doc_id,
           coalesce(nm, 0) > 0              AS is_dup,
           CAST(coalesce(nm, 0) AS BIGINT)  AS n_matches,
           first_match
    FROM (SELECT doc_id FROM documents WHERE doc_id % {NEW_BATCH_MOD} = 0) d
    LEFT JOIN agg ON agg.nd = d.doc_id
    """


@query(
    "mm_phash_index_probe",
    oracle=_phash_probe_oracle(),
    doc="Persisted-index perceptual-hash screen — the image-ingest twin "
    "of dedup_index_probe: the stored corpus's fingerprint bands are "
    "built ONCE (atomic versioned publish, shared CURRENT-pointer "
    "machinery) and each ingest batch is fingerprinted alone, its "
    "bucket keys (bounded by bands×256 — always broadcastable) "
    "semi-join-prune the stored bands before the joint stored-first "
    "cap, and candidates are popcount-verified — per-batch cost "
    "O(|batch|), one verdict row per incoming doc; too-short payloads "
    "pass through unscreened. Full DuckDB oracle over the same split.",
)
def mm_phash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.dedup import NEW_BATCH_MOD

    index_dir = phash_index_build(spark, sf_dir)
    new_docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % NEW_BATCH_MOD == 0)
        .select("doc_id", "text")
    )
    return phash_index_probe(spark, index_dir, new_docs)

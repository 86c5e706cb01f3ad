"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio libraries, so rich-codec decode math
(JPEG/PNG/video) is stubbed (deterministic fake, or an ImportError-
documented PIL path) — but everything Spark-side is real and tested:
schemas, batch iteration, partitioning behavior, and output shapes.
Two codecs are REAL with the standard library only, so the "swap one
function" claim is exercised end-to-end in CI, not asserted: the
``"pure"`` image codec (binary PPM + BMP container parsing) and
:func:`decode_wav_audio` (RIFF/WAV via the ``wave`` module, with
integer signal statistics computed from the actual PCM frames).

Scale notes: binary payloads ride the Arrow channel in batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
operators are stateless per-batch maps, so they parallelize over
partitions with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal asset schema: opaque bytes + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "asset_id long, mime string, n_bytes long, sha256 string, "
    "width int, height int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"asset_id long, features array<float>"

FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"


def synthesize_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake assets from a text column (testbed stand-in for
    a real object-store scan): bytes = utf-8 text, dims derived from
    length."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.when(F.col(id_col) % 2 == 0, "image/png")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n % 24 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


#: A codec maps one Arrow batch of assets (content/mime/meta columns) to
#: the decoded columns ``n_bytes, sha256, width, height``.
Codec = Callable[[pd.DataFrame], pd.DataFrame]
#: Factories defer library/model loading to first use on each executor
#: (loading PIL/libav state on the driver and shipping it through the
#: task closure is the anti-pattern this hook exists to avoid).
CodecFactory = Callable[[], Codec]


def _fake_codec() -> Codec:
    """Deterministic stand-in: byte length + sha256, dims from metadata."""

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        content = pdf["content"].map(lambda c: c or b"")
        return pd.DataFrame(
            {
                "n_bytes": content.map(len),
                "sha256": content.map(lambda c: hashlib.sha256(c).hexdigest()),
                "width": pdf["meta"].map(lambda m: m["width"]),
                "height": pdf["meta"].map(lambda m: m["height"]),
            }
        )

    return decode


def _pil_codec() -> Codec:
    """Real image decoding via Pillow (absent in this container — the
    ImportError documents the swap-in path; the test suite skips on it)."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - absent in this container
        raise ImportError(
            "the 'pil' codec needs Pillow; install it or register_codec() "
            "a custom factory"
        ) from e

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        content = pdf["content"].map(lambda c: c or b"")
        dims = content.map(lambda c: Image.open(io.BytesIO(c)).size)
        return pd.DataFrame(
            {
                "n_bytes": content.map(len),
                "sha256": content.map(lambda c: hashlib.sha256(c).hexdigest()),
                "width": dims.map(lambda wh: wh[0]),
                "height": dims.map(lambda wh: wh[1]),
            }
        )

    return decode


def _pure_image_codec() -> Codec:
    """REAL image decoding with the standard library only: sniffs the
    container magic and parses dimensions from the actual byte stream —
    binary PPM (``P6``, ASCII header) and BMP (``BM``, little-endian
    dims at offsets 18/22).  No third-party dependency, so the
    full decode path — bytes in a Spark binary column → Arrow batch →
    codec → real parsed metadata out — runs in any container.  Unknown
    or truncated payloads decode to NULL dims (never an executor
    crash)."""
    import re
    import struct

    ppm_header = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")

    def dims(c: bytes) -> tuple[int | None, int | None]:
        if c.startswith(b"P6"):
            m = ppm_header.match(c)
            if m:
                return int(m.group(1)), int(m.group(2))
        elif c.startswith(b"BM") and len(c) >= 26:
            w, h = struct.unpack_from("<ii", c, 18)
            return w, abs(h)  # negative height = top-down BMP
        return None, None

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        content = pdf["content"].map(lambda c: bytes(c) if c else b"")
        parsed = content.map(dims)
        return pd.DataFrame(
            {
                "n_bytes": content.map(len),
                "sha256": content.map(lambda c: hashlib.sha256(c).hexdigest()),
                "width": parsed.map(lambda wh: wh[0]).astype("object"),
                "height": parsed.map(lambda wh: wh[1]).astype("object"),
            }
        )

    return decode


_CODECS: dict[str, CodecFactory] = {
    "fake": _fake_codec,
    "pil": _pil_codec,
    "pure": _pure_image_codec,
}


def register_codec(name: str, factory: CodecFactory) -> None:
    """Register a lazily-loaded codec under ``name`` for
    :func:`decode_assets`."""
    _CODECS[name] = factory


def decode_assets(assets: DataFrame, codec: str | CodecFactory = "fake") -> DataFrame:
    """Decode pass over binary assets via ``mapInPandas`` (Arrow batches).

    ``codec`` is a registered name (``"fake"``, ``"pil"``, or anything
    added with :func:`register_codec`) or a factory callable, invoked
    once per executor process on first batch.
    """
    factory = _CODECS[codec] if isinstance(codec, str) else codec

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = factory()
        for pdf in batches:
            out = decode(pdf)
            out.insert(0, "mime", pdf["mime"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(op, schema=DECODED_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature-extraction pass: fixed-dim float vector per asset
    (hash-derived fake embedding; a real model would run here, batched)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    (int.from_bytes(
                        hashlib.sha256((c or b"") + bytes([i])).digest()[:4],
                        "big",
                    ) % 10_000) / 10_000.0
                    for i in range(FEATURE_DIM)
                ]
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "features": feats}
            )

    return assets.mapInPandas(op, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id long, mime string, content binary, width int, height int, "
    "resized boolean"
)


def resize_images(assets: DataFrame, max_dim: int) -> DataFrame:
    """REAL image resizing with the standard library + numpy only:
    binary-PPM (``P6``) payloads whose longest side exceeds ``max_dim``
    are downscaled by nearest-neighbor sampling (parse header → reshape
    the actual pixel bytes → integer index-sample both axes → re-emit a
    valid P6 container); everything else passes through untouched with
    ``resized = false`` — including images already within bounds,
    non-PPM formats (the PIL hook's job), and malformed payloads (never
    an executor crash).  Aspect ratio is preserved (ceil-scaled so the
    longest side lands on ``max_dim`` exactly, the other ≥ 1).

    This is the normalize-before-training resize of a multimodal
    pipeline; like the other codecs it is a stateless Arrow-batched
    ``mapInPandas`` — parallel over partitions, no shuffle, peak memory
    bounded by the Arrow batch size."""
    if max_dim < 1:
        raise ValueError(f"max_dim must be >= 1, got {max_dim}")
    import re

    ppm_header = re.compile(rb"^(P6\s+(\d+)\s+(\d+)\s+(\d+)\s)")

    def one(c: bytes) -> tuple[bytes, int | None, int | None, bool]:
        m = ppm_header.match(c or b"")
        if not m:
            return c, None, None, False
        w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
        body = c[len(m.group(1)):]
        if w < 1 or h < 1 or maxval > 255 or len(body) < 3 * w * h:
            return c, None, None, False
        if max(w, h) <= max_dim:
            return c, w, h, False
        scale = max(w, h) / max_dim
        nw = max(1, round(w / scale))
        nh = max(1, round(h / scale))
        px = np.frombuffer(body[: 3 * w * h], dtype=np.uint8).reshape(h, w, 3)
        ys = (np.arange(nh) * h) // nh
        xs = (np.arange(nw) * w) // nw
        out = px[ys][:, xs]
        header = f"P6\n{nw} {nh}\n{maxval}\n".encode()
        return header + out.tobytes(), nw, nh, True

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf["content"].map(lambda c: one(bytes(c) if c else b""))
            out = pd.DataFrame(
                rows.tolist(), columns=["content", "width", "height", "resized"]
            ).astype({"resized": bool})
            out.insert(0, "mime", pdf["mime"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(op, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = (
    "asset_id long, mime string, n_bytes long, sample_rate int, "
    "n_channels int, sample_width int, n_samples long, duration_ms long, "
    "peak int, rms_milli long, clip_per_mille long"
)


def decode_wav_audio(assets: DataFrame) -> DataFrame:
    """REAL audio decoding with the standard library only: parses RIFF/WAV
    containers (``wave`` module) and computes signal statistics from the
    actual PCM frames — the audio counterpart of the ``"pure"`` image
    codec, so the decode→stats path runs end-to-end in any container
    (PIL/libav remain the hooks for rich formats).

    Per asset: container fields (sample_rate, channels, width, samples,
    duration) plus 16-bit-PCM stats in INTEGER form so results are
    partitioning- and engine-independent — ``peak`` = max |sample|,
    ``rms_milli`` = floor(1000·sqrt(Σs²/n)) (exact integer sum of
    squares, one correctly-rounded sqrt), ``clip_per_mille`` = clipped
    samples (|s| ≥ 32767) per 1000.  Malformed/non-WAV payloads and
    non-16-bit widths decode to NULL stats, never an executor crash.

    Scale shape: stateless Arrow-batched ``mapInPandas`` — parallel over
    partitions, no shuffle; per-batch peak memory is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    import io
    import math
    import wave

    def stats(c: bytes) -> tuple:
        try:
            with wave.open(io.BytesIO(c)) as w:
                rate, ch, width, n = (
                    w.getframerate(),
                    w.getnchannels(),
                    w.getsampwidth(),
                    w.getnframes(),
                )
                frames = w.readframes(n)
        except (wave.Error, EOFError, OSError):
            return (None,) * 8
        dur = (n * 1000) // rate if rate else None
        if width != 2 or not frames:
            return (rate, ch, width, n * ch, dur, None, None, None)
        s = np.frombuffer(frames, dtype="<i2").astype(np.int64)
        sumsq = int((s * s).sum())
        peak = int(np.abs(s).max())
        rms_milli = math.floor(1000.0 * math.sqrt(sumsq / len(s)))
        clip = int((np.abs(s) >= 32767).sum()) * 1000 // len(s)
        return (rate, ch, width, len(s), dur, peak, rms_milli, clip)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"].map(lambda c: bytes(c) if c else b"")
            rows = content.map(stats)
            out = pd.DataFrame(
                rows.tolist(),
                columns=[
                    "sample_rate", "n_channels", "sample_width", "n_samples",
                    "duration_ms", "peak", "rms_milli", "clip_per_mille",
                ],
            ).astype("object")
            out.insert(0, "n_bytes", content.map(len))
            out.insert(0, "mime", pdf["mime"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(op, schema=AUDIO_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling pass for video assets: emit one row per sampled
    frame index (fan-out inside the batch iterator — no explode shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized fan-out (repeat + cumcount): one np.repeat per
            # batch instead of a Python loop per row — the per-FRAME work
            # below (the hash; a real sampler's decode) is the only
            # per-element step left
            n_frames = pdf["meta"].map(lambda m: int(m["n_frames"] or 0))
            counts = np.ceil(n_frames.to_numpy() / every_n).astype(np.int64)
            ids = np.repeat(pdf["asset_id"].to_numpy(), counts)
            contents = np.repeat(
                pdf["content"].map(lambda c: c or b"").to_numpy(object), counts
            )
            total = int(counts.sum())
            cumcount = np.arange(total) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            frame_idx = (cumcount * every_n).astype(np.int32)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": frame_idx,
                    "frame_sha256": [
                        hashlib.sha256(c + int(i).to_bytes(4, "big")).hexdigest()
                        for c, i in zip(contents, frame_idx)
                    ],
                }
            )

    return assets.filter(F.col("mime").startswith("video/")).mapInPandas(
        op, schema=FRAMES_SCHEMA
    )


AHASH_SCHEMA = "asset_id long, mime string, width int, height int, ahash long"

_PPM_HEADER = None  # compiled lazily on first executor use


def _ppm_frame(c: bytes, offset: int):
    """Parse ONE P6 frame at ``offset`` and compute its aHash.  Returns
    ``(width, height, ahash, next_offset)`` or None if no valid frame
    starts there.  All-integer math: grayscale = r+g+b, 8×8
    nearest-neighbor sample, bit k iff ``cell_k·64 > Σ cells``."""
    global _PPM_HEADER
    if _PPM_HEADER is None:
        import re

        _PPM_HEADER = re.compile(rb"(P6\s+(\d+)\s+(\d+)\s+(\d+)\s)")
    m = _PPM_HEADER.match(c or b"", offset)
    if not m:
        return None
    w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
    body_start = m.end(1)
    if w < 1 or h < 1 or maxval > 255 or len(c) - body_start < 3 * w * h:
        return None
    px = np.frombuffer(
        c[body_start : body_start + 3 * w * h], dtype=np.uint8
    ).reshape(h, w, 3)
    gray = px.sum(axis=2, dtype=np.int64)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = gray[ys][:, xs].reshape(-1)
    total = int(cells.sum())
    bits = 0
    for k in range(64):
        if int(cells[k]) * 64 > total:
            bits |= 1 << (63 - k)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return w, h, bits, body_start + 3 * w * h


def image_ahash(assets: DataFrame) -> DataFrame:
    """REAL perceptual fingerprint (average hash) of binary-PPM images,
    standard library + numpy only: parse the ``P6`` header, integer
    grayscale (r+g+b per pixel — no float math anywhere), nearest-
    neighbor index-sample to an 8×8 grid (the resize_images sampling),
    and set bit k iff ``cell_k · 64 > Σ cells`` (strict, all-integer —
    the mean threshold without a division).  Bits pack row-major,
    bit (0,0) highest, into one signed long.  Non-PPM / malformed
    payloads hash to NULL (the PIL hook's job at full fidelity; never
    an executor crash).

    The multimodal member of the dedup family: two images within a few
    ahash bits are visual near-duplicates — pair them with
    :func:`image_near_dup_pairs`.  Stateless Arrow-batched
    ``mapInPandas``: parallel over partitions, no shuffle."""

    def one(c: bytes) -> tuple[int | None, int | None, int | None]:
        parsed = _ppm_frame(c, 0)
        if parsed is None:
            return None, None, None
        w, h, bits, _ = parsed
        return w, h, bits

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf["content"].map(lambda c: one(bytes(c) if c else b""))
            out = pd.DataFrame(
                rows.tolist(), columns=["width", "height", "ahash"]
            )
            out.insert(0, "mime", pdf["mime"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(op, schema=AHASH_SCHEMA)


def image_near_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = 4,
    id_col: str = "asset_id",
    hash_col: str = "ahash",
) -> DataFrame:
    """Visual near-duplicate pairs from :func:`image_ahash` output —
    a thin wrapper over the modality-agnostic
    ``operators/dedup.hamming_near_dup_pairs`` (SimHash-LSH band
    pigeonhole: recall-complete within 7 bits, never all-pairs; NULL
    hashes excluded)."""
    from sparkdiff.operators.dedup import hamming_near_dup_pairs

    return hamming_near_dup_pairs(
        hashed, max_hamming, id_col=id_col, hash_col=hash_col
    )


def audio_energy_hash(assets: DataFrame) -> DataFrame:
    """REAL audio fingerprint, standard library + numpy only: decode
    16-bit-PCM WAV frames (the :func:`decode_wav_audio` parser), split
    the absolute-amplitude stream into 64 equal windows, and set bit k
    iff ``energy_k · 64 > Σ energies`` (the same all-integer mean
    threshold as :func:`image_ahash`) — a 64-bit energy-envelope hash
    that survives amplitude-preserving re-encodes and small noise.
    Non-WAV / non-16-bit / sub-64-sample payloads hash NULL.

    The audio member of the dedup family: pair with
    ``operators/dedup.hamming_near_dup_pairs``.  Stateless
    Arrow-batched ``mapInPandas``."""
    import io
    import wave

    def one(c: bytes) -> int | None:
        try:
            with wave.open(io.BytesIO(c)) as wv:
                if wv.getsampwidth() != 2:
                    return None
                frames = wv.readframes(wv.getnframes())
        except (wave.Error, EOFError, OSError):
            return None
        s = np.abs(np.frombuffer(frames, dtype="<i2").astype(np.int64))
        n = len(s)
        if n < 64:
            return None
        edges = (np.arange(65) * n) // 64
        csum = np.concatenate(([0], np.cumsum(s)))
        energies = csum[edges[1:]] - csum[edges[:-1]]
        total = int(energies.sum())
        bits = 0
        for k in range(64):
            if int(energies[k]) * 64 > total:
                bits |= 1 << (63 - k)
        if bits >= 1 << 63:
            bits -= 1 << 64
        return bits

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf["content"].map(lambda c: one(bytes(c) if c else b""))
            out = pd.DataFrame({"ahash": hashes}).rename(
                columns={"ahash": "audio_hash"}
            )
            out.insert(0, "mime", pdf["mime"].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return assets.mapInPandas(op, schema="asset_id long, mime string, audio_hash long")


def video_frame_hashes(assets: DataFrame) -> DataFrame:
    """REAL per-frame perceptual hashing of concatenated-PPM "video"
    payloads (back-to-back ``P6`` frames — the container the pure codec
    can actually parse; libav/ffmpeg remain the hooks for rich
    formats): walk the byte stream frame by frame and emit ``(asset_id,
    frame_idx, width, height, ahash)`` with the SAME all-integer aHash
    as :func:`image_ahash` (one shared ``_ppm_frame`` parser).
    Payloads with no valid leading frame emit nothing; a malformed
    tail stops the walk at the last good frame.

    Stateless Arrow-batched ``mapInPandas`` with in-batch fan-out —
    no explode shuffle; downstream pairing is hash-keyed."""

    def frames(asset_id, c: bytes):
        off, idx = 0, 0
        while True:
            parsed = _ppm_frame(c, off)
            if parsed is None:
                return
            w, h, bits, off = parsed
            yield (asset_id, idx, w, h, bits)
            idx += 1

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                r
                for aid, c in zip(pdf["asset_id"], pdf["content"])
                for r in frames(aid, bytes(c) if c else b"")
            ]
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_idx", "width", "height", "ahash"],
            )

    return assets.mapInPandas(
        op,
        schema="asset_id long, frame_idx int, width int, height int, ahash long",
    )


def video_near_dup_pairs(
    frame_hashes: DataFrame,
    min_shared: int = 2,
    id_col: str = "asset_id",
    hash_col: str = "ahash",
) -> DataFrame:
    """Video near-duplicate pairs from per-frame hashes: two videos
    pair when they share >= ``min_shared`` DISTINCT frame hashes —
    robust to frame reordering, trimming, and padding (the shared-
    scene criterion), with ``overlap_milli`` = shared /
    min(n_frames_a, n_frames_b) per mille for thresholding.

    Scale shape: one distinct (video, hash) projection, one hash-keyed
    self-equi-join (bucket sizes bounded by how many videos share a
    frame — never all-pairs), one pair-count aggregate."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    vh = (
        frame_hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
        .distinct()
    )
    sizes = vh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = vh.select(F.col("_id").alias("id_a"), "_h")
    b = vh.select(F.col("_id").alias("id_b"), "_h")
    shared = (
        a.join(b, "_h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.expr("(1000 * n_shared) div least(_na, _nb)").alias(
                "overlap_milli"
            ),
        )
    )

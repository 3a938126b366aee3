"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Large-scale training pipelines carry images/audio/video as ``binary``
columns with typed metadata structs.  This module implements the
Spark-side plumbing — schema, Arrow-batched ``mapInPandas`` decode
stage, partitioning — for real.  ``decode_meta`` computes a
deterministic fake decode from the payload bytes (oracle-checkable);
``decode_pixels`` REALLY decodes: netpbm P6 and uncompressed BMP
natively (pure Python/numpy, no codec needed), compressed formats through an import-probed codec
library (``PIXEL_CODEC``: Pillow, else OpenCV) — only a compressed
payload with no codec installed raises, and the error names the probe.

The mapInPandas stage is the honest shape of a 100 TB decode job:
Arrow-batched transfer, per-batch vectorized work in pandas, output
schema declared up front, no driver involvement.  Swapping the fake
arithmetic for ``PIL.Image.open(io.BytesIO(payload))`` is a one-line
change inside the same plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def to_binary_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes + media-type tag."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("fake/image").alias("media_type"),
    )


def decode_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched "decode" extracting typed metadata per payload.

    The fake decode is pure arithmetic on payload length (deterministic,
    reproduced by the SQL oracle): a real deployment replaces the body of
    ``_decode_batch`` with the codec call and keeps everything else.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blen = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": blen,
                    "width": (16 * (1 + blen % 64)).astype("int32"),
                    "height": (16 * (1 + blen % 48)).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "n_frames": (1 + blen % 7).astype("int32"),
                }
            )

    return binary_df.mapInPandas(_decode_batch, DECODED_META_SCHEMA)


def _probe_pixel_codec() -> str | None:
    """Import-probe for an image codec library (Pillow preferred, then
    OpenCV).  Returns the codec name or None; decode_pixels consults
    this for non-netpbm payloads, and tests skip-mark on it."""
    try:
        import PIL.Image  # noqa: F401

        return "pillow"
    except ImportError:
        pass
    try:
        import cv2  # noqa: F401

        return "cv2"
    except ImportError:
        return None


PIXEL_CODEC = _probe_pixel_codec()

DECODED_PIXELS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        # row-major H x W x C uint8 bytes: the Arrow-friendly columnar
        # pixel representation downstream feature extraction consumes
        StructField("pixels", BinaryType()),
    ]
)


def _decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode binary netpbm P6 (RGB, maxval 255): pure Python, the
    uncompressed interchange format every codec can emit.  Returns
    (height, width, channels, raw_bytes)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 netpbm payload")
    # header tokens: magic, width, height, maxval; '#' comments allowed
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    body = data[i : i + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated P6 body")
    return h, w, 3, body


def _decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode uncompressed BI_RGB BMP (24/32-bit): pure numpy, no codec
    library.  BMP stores rows bottom-up, pixels as BGR(A), rows padded
    to 4 bytes — this normalizes to top-down row-major RGB uint8, the
    same output contract as the P6 path.  Returns
    (height, width, channels, raw_bytes)."""
    import struct

    import numpy as np

    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    w, h = struct.unpack_from("<ii", data, 18)
    (bitcount,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise ValueError(f"only BI_RGB (uncompressed) supported, got {compression}")
    if bitcount not in (24, 32):
        raise ValueError(f"only 24/32-bit BMP supported, got {bitcount}")
    bottom_up = h > 0
    h = abs(h)
    bpp = bitcount // 8
    stride = ((bitcount * w + 31) // 32) * 4
    body = data[pix_off : pix_off + stride * h]
    if len(body) != stride * h:
        raise ValueError("truncated BMP body")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bpp].reshape(h, w, bpp)
    if bottom_up:
        px = px[::-1]
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    return h, w, 3, np.ascontiguousarray(rgb).tobytes()


def decode_payload(
    data: bytes, codec: str | None
) -> tuple[int, int, int, bytes]:
    """Decode ONE image payload to (height, width, channels, rgb_bytes).

    Format dispatch: netpbm P6 and uncompressed BMP natively, anything
    else through the probed codec library (Pillow, else OpenCV).
    Module-level (not a closure) so the codec branches are unit-testable
    without a real codec installed — the pytest injects a fake PIL into
    ``sys.modules`` and checks the output contract; the import happens
    HERE, executor-side, at decode time.
    """
    if data.startswith(b"P6"):
        return _decode_ppm(data)
    if data.startswith(b"BM"):
        return _decode_bmp(data)
    if codec == "pillow":
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        return img.height, img.width, 3, img.tobytes()
    if codec == "cv2":
        import cv2
        import numpy as np

        arr = cv2.imdecode(
            np.frombuffer(data, dtype=np.uint8), cv2.IMREAD_COLOR
        )
        h, w, c = arr.shape
        return h, w, c, arr.tobytes()
    raise NotImplementedError(
        "payload is not netpbm P6 / uncompressed BMP and no image "
        "codec is available (probe: pillow=no, cv2=no); install "
        "Pillow or OpenCV for compressed formats"
    )


def decode_pixels(binary_df: DataFrame, strict: bool = True) -> DataFrame:
    """Real pixel decode to (doc_id, height, width, channels, pixels).

    Arrow-batched ``mapInPandas``: per batch, each payload is decoded by
    format — netpbm P6 and uncompressed 24/32-bit BMP natively (pure
    Python/numpy, works in this environment), anything else through the probed codec library
    (``PIXEL_CODEC``: Pillow, else OpenCV).  Without a codec, a
    non-netpbm payload raises ``NotImplementedError`` naming the probe
    result — the documented environment limitation, now scoped to the
    formats that genuinely need a codec instead of the whole operator.

    ``strict=False`` DROPS undecodable payloads instead of failing the
    job — the WKB tier's NULL-never-garbage stance applied to media: a
    100 TB crawl always contains corrupt bytes, and one of them must
    not kill a fleet-wide decode.  Strict (default) keeps the
    fail-loud contract for curated inputs.  A ``NotImplementedError``
    (missing codec) raises under EITHER mode: absent capability is a
    deployment problem to surface, not a data problem to skip.

    Scale shape: the payload never leaves the executor, transfer is
    Arrow-batched both ways, and the output is raw uint8 bytes (no
    per-pixel Python objects).
    """
    codec = PIXEL_CODEC

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_compaction_spark.operators.multimodal import (
            decode_payload,
        )

        for pdf in batches:
            out = {"doc_id": [], "height": [], "width": [], "channels": [], "pixels": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    h, w, c, px = decode_payload(bytes(payload), codec)
                except NotImplementedError:
                    raise
                except Exception:
                    if strict:
                        raise
                    continue
                out["doc_id"].append(int(doc_id))
                out["height"].append(h)
                out["width"].append(w)
                out["channels"].append(c)
                out["pixels"].append(px)
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_decode_batch, DECODED_PIXELS_SCHEMA)


def frame_sample_plan(
    decoded_meta: DataFrame, every_k: int = 2
) -> DataFrame:
    """Plan frame extraction for "video" payloads: one row per sampled
    frame index (explode of a sequence — the fan-out shape of a real
    frame sampler)."""
    return decoded_meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


def frame_sample_udtf(spark, decoded_meta: DataFrame, every_k: int = 2):
    """Python-UDTF twin of :func:`frame_sample_plan` — completes the
    UDF/UDAF/UDTF surface (SURVEY.md §2.9: the reference has none; we
    carry pandas UDFs, a grouped-agg UDAF, and this table function).

    A UDTF is the right tool when per-row fan-out needs imperative
    logic a ``sequence``/``explode`` can't express (e.g. codec-driven
    keyframe selection where the output rows depend on parsing the
    payload).  Here the logic IS expressible — frame_sample_plan is the
    production path and this twin exists to pin the UDTF plumbing
    (registration, lateral join shape, row-yield semantics) against it.

    UDTFs run row-at-a-time in Python workers — the slow path.  The
    eval ships only (doc_id, n_frames), never the binary payload, so
    the Arrow transfer stays metadata-thin regardless of blob size.
    """
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, frame_idx: int")
    class FrameSampler:
        def eval(self, doc_id: int, n_frames: int, k: int):
            for i in range(0, n_frames, k):
                yield doc_id, i

    spark.udtf.register("frame_sampler", FrameSampler)
    view = f"__frame_meta_{uuid.uuid4().hex[:8]}"
    decoded_meta.select("doc_id", "n_frames").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT f.doc_id, f.frame_idx FROM {view}, "
        f"LATERAL frame_sampler(doc_id, n_frames, {int(every_k)}) f"
    )


def resize_nearest(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers to
    ``out_w x out_h`` — the brief's image-resize stage, REAL (numpy
    advanced indexing over the raw uint8 buffer, no codec library).

    Sampling rule is the deterministic integer floor map
    ``sy = i * src_h // out_h``, ``sx = j * src_w // out_w`` — chosen
    over the center-point rule specifically so an external oracle can
    reproduce every sampled pixel with exact integer arithmetic (no
    float rounding to disagree over).  Upscales repeat pixels, which
    is standard nearest behavior.

    Scale shape: Arrow-batched ``mapInPandas``; per row two index
    gathers and one contiguous copy — O(out pixels) with no per-pixel
    Python.  Output keeps the DECODED_PIXELS_SCHEMA contract, so
    resizes compose (decode -> resize -> features)."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"bad target size {out_w}x{out_h}")

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "height": [], "width": [],
                "channels": [], "pixels": [],
            }
            for doc_id, h, w, c, px in zip(
                pdf["doc_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["pixels"],
            ):
                h, w, c = int(h), int(w), int(c)
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                sy = (np.arange(out_h) * h) // out_h
                sx = (np.arange(out_w) * w) // out_w
                res = arr[sy][:, sx]
                out["doc_id"].append(int(doc_id))
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["channels"].append(c)
                out["pixels"].append(
                    np.ascontiguousarray(res).tobytes()
                )
            yield pd.DataFrame(out)

    return decoded.mapInPandas(_batch, DECODED_PIXELS_SCHEMA)


PIXEL_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_px", LongType()),
        StructField("ch_sums", ArrayType(LongType())),
        StructField("embedding", ArrayType(LongType())),
    ]
)


def pixel_features(decoded: DataFrame, grid: int = 2) -> DataFrame:
    """Feature extraction over decoded pixel buffers — the brief's
    feature-extract stage, REAL and integer-exact: per-channel byte
    SUMS (order-independent exact ints, never float means) and a
    ``grid x grid``-block mean embedding (floor of each block's
    per-channel sum over its pixel count; blocks partition the image
    by the same integer floor map the resize uses, so the two stages
    share one oracle-reproducible geometry).

    Output: ``(doc_id, n_px, ch_sums array<long>[c],
    embedding array<long>[grid*grid*c])`` — the embedding is a
    coarse perceptual signature usable directly by the similarity
    tier's exact/LSH dedup over integer vectors.

    Scale shape: Arrow-batched ``mapInPandas``; per row one reshape,
    one ``add.reduceat``-free block sum via strided reshape when the
    grid divides the image and an index-bucket fallback when it
    doesn't — O(pixels) numpy, no per-pixel Python."""
    if grid < 1:
        raise ValueError(f"grid must be >= 1, got {grid}")

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "n_px": [], "ch_sums": [], "embedding": []}
            for doc_id, h, w, c, px in zip(
                pdf["doc_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["pixels"],
            ):
                h, w, c = int(h), int(w), int(c)
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
                a64 = arr.astype(np.int64)
                out["doc_id"].append(int(doc_id))
                out["n_px"].append(h * w)
                out["ch_sums"].append(a64.sum(axis=(0, 1)).tolist())
                # block of pixel (y, x) = (y*grid//h, x*grid//w) — the
                # same floor geometry as resize_nearest, inverted
                by = (np.arange(h) * grid) // h
                bx = (np.arange(w) * grid) // w
                emb = []
                for gy in range(grid):
                    ys = np.flatnonzero(by == gy)
                    for gx in range(grid):
                        xs = np.flatnonzero(bx == gx)
                        block = a64[np.ix_(ys, xs)]
                        n = max(block.shape[0] * block.shape[1], 1)
                        emb.extend(
                            (block.sum(axis=(0, 1)) // n).tolist()
                        )
                out["embedding"].append(emb)
            yield pd.DataFrame(out)

    return decoded.mapInPandas(_batch, PIXEL_FEATURES_SCHEMA)


DECODED_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        # little-endian int16 samples, channel-interleaved — the raw
        # PCM contract downstream feature extraction consumes
        StructField("samples", BinaryType()),
    ]
)


def decode_audio(binary_df: DataFrame, strict: bool = True) -> DataFrame:
    """Real audio decode, no codec library: RIFF/WAVE PCM16 payloads
    (format tag 1, 16-bit — the uncompressed interchange shape every
    encoder can emit) parse to raw int16 sample buffers.  Chunks are
    walked by the RIFF contract (fmt before data, unknown chunks
    skipped by their declared size, word-aligned), so files with
    LIST/INFO metadata decode too.  Compressed formats raise
    ``NotImplementedError`` naming the tag — the same honest
    env-limitation stance as the pixel tier.

    ``strict=False`` DROPS malformed payloads instead of failing the
    job (same stance as :func:`decode_pixels`); a compressed format
    tag (``NotImplementedError``) raises under either mode — missing
    capability is a deployment problem, not a data problem.

    Scale shape: Arrow-batched ``mapInPandas``; payloads never leave
    the executor; output is the raw sample buffer (no per-sample
    Python objects)."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "channels": [],
                "n_samples": [], "samples": [],
            }
            def _parse(data: bytes):
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, fmt, body = 12, None, None
                while pos + 8 <= len(data):
                    cid = data[pos:pos + 4]
                    (sz,) = struct.unpack_from("<I", data, pos + 4)
                    chunk = data[pos + 8:pos + 8 + sz]
                    if cid == b"fmt ":
                        tag, nch, rate = struct.unpack_from("<HHI", chunk, 0)
                        (bits,) = struct.unpack_from("<H", chunk, 14)
                        if tag != 1 or bits != 16:
                            raise NotImplementedError(
                                f"only PCM16 WAV decodes natively "
                                f"(format tag {tag}, {bits}-bit)"
                            )
                        fmt = (nch, rate)
                    elif cid == b"data":
                        body = chunk
                    pos += 8 + sz + (sz & 1)  # chunks are word-aligned
                if fmt is None or body is None:
                    raise ValueError("missing fmt/data chunk")
                nch, rate = fmt
                if len(body) % (2 * nch):
                    raise ValueError("truncated PCM body")
                return nch, rate, body

            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    nch, rate, body = _parse(bytes(payload))
                except NotImplementedError:
                    raise
                except Exception:
                    if strict:
                        raise
                    continue
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(rate)
                out["channels"].append(nch)
                out["n_samples"].append(len(body) // (2 * nch))
                out["samples"].append(body)
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(_batch, DECODED_AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("energy", ArrayType(LongType())),
        StructField("zero_crossings", ArrayType(LongType())),
    ]
)


def audio_features(decoded: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed audio features over decoded PCM16 buffers, integer
    EXACT: per full window of ``window`` samples and per channel, the
    energy (sum of squared samples — int64, order-independent) and
    the zero-crossing count (adjacent pairs within the window whose
    product is strictly negative — a sign test with no float
    epsilon).  Trailing partial windows are dropped (a partial
    window's figures aren't comparable to full ones; the exact-n
    contract keeps the oracle arithmetic closed).

    One row per (doc, window): the explode shape a VAD/segmentation
    pipeline consumes.  Scale: whole-buffer numpy per row (reshape +
    einsum-free square-sum + sign-product count), no per-sample
    Python."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "window_idx": [],
                "energy": [], "zero_crossings": [],
            }
            for doc_id, nch, n, buf in zip(
                pdf["doc_id"], pdf["channels"],
                pdf["n_samples"], pdf["samples"],
            ):
                nch, n = int(nch), int(n)
                arr = (
                    np.frombuffer(buf, dtype="<i2")
                    .reshape(n, nch)
                    .astype(np.int64)
                )
                nw = n // window
                for wi in range(nw):
                    seg = arr[wi * window:(wi + 1) * window]
                    energy = (seg * seg).sum(axis=0)
                    zc = (seg[1:] * seg[:-1] < 0).sum(axis=0)
                    out["doc_id"].append(int(doc_id))
                    out["window_idx"].append(wi)
                    out["energy"].append(energy.tolist())
                    out["zero_crossings"].append(zc.tolist())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(_batch, AUDIO_FEATURES_SCHEMA)

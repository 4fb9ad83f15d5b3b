"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched ``mapInPandas`` — the
only place in the engine where Python touches row data, because media
codecs don't exist as Spark expressions. The batch shape matters at
scale: one Python worker invocation per Arrow batch (not per row), and
the binary column is projected only into the decode stage.

What's real vs stubbed, stated plainly: header-metadata decode
(dimensions / frame counts for PNG, GIF, BMP, JPEG, WAV) is REAL —
pure byte parsing in ``_decode_real``, tested on handcrafted files.
Pixel-level decode, resampling and learned feature extraction need
codec/model runtimes this container lacks, so those remain stubbed
behind ``NotImplementedError`` (clearly marked); the deterministic
fake path exercises the exact same schema, partitioning, UDF signature
and batch shape, so the codec swap stays a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the decoded-media metadata rows produced by decode_media
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a media table: (id, payload binary, media_type, n_bytes).

    In production the payload column comes from the source (e.g. image
    bytes in parquet); here it's the UTF-8 encoding of the text column so
    everything stays deterministic.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )


def _decode_real(payload: bytes) -> tuple[int, int, int]:
    """REAL header-metadata decode for common containers — pure byte
    parsing, no codec libraries.

    Dimensions and frame counts live in plain header bytes, so this
    much is genuinely implemented (not stubbed): PNG (IHDR), GIF
    (logical screen descriptor + image-separator count), BMP (DIB
    header), JPEG (SOF0/1/2 marker walk), WAV (fmt/data chunks —
    mapped as width=n_channels, height=bits_per_sample,
    n_frames=sample frames). PIXEL-level decode/resample still needs
    real codecs (PIL/ffmpeg) and raises NotImplementedError via the
    unknown-format branch; see module docstring.
    """
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", payload, 16)
        return (w, h, 1)
    if payload[:4] in (b"GIF8",):
        w, h = struct.unpack_from("<HH", payload, 6)
        # frame count = image separators introducing image descriptors
        n = max(payload.count(b"\x2c"), 1) if len(payload) < 1 << 20 else 1
        return (w, h, n)
    if payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        return (w, abs(h), 1)
    if payload[:3] == b"\xff\xd8\xff":
        pos = 2
        while pos + 9 < len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                return (w, h, 1)
            seglen = struct.unpack_from(">H", payload, pos + 2)[0]
            pos += 2 + seglen
        raise ValueError("jpeg: no SOF marker found")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos = 12
        channels = bits = block_align = data_size = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            csz = struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt ":
                channels, _rate = struct.unpack_from("<HI", payload, pos + 10)
                block_align, bits = struct.unpack_from("<HH", payload, pos + 20)
            elif cid == b"data":
                data_size = csz
            pos += 8 + csz + (csz & 1)
        if channels and block_align and data_size is not None:
            return (channels, bits or 0, data_size // block_align)
        raise ValueError("wav: missing fmt/data chunks")
    raise NotImplementedError(
        "unknown container (only PNG/GIF/BMP/JPEG/WAV headers are parsed "
        "natively; full pixel decode needs PIL/ffmpeg — not in this "
        "environment); use fake=True for the deterministic test path"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived from payload length only."""
    n = len(payload)
    return (n % 640, n % 480, n % 30)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to (doc_id, n_bytes, width, height, n_frames).

    ``mapInPandas`` so each Arrow batch crosses to Python once; only
    ``doc_id`` and ``payload`` are shipped (column pruning keeps the
    binary column out of every other stage).
    """
    decode = _decode_fake if fake else _decode_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_k: int = 5) -> DataFrame:
    """Explode sampled frame indices per media item (0, k, 2k, …) —
    the fan-out stage before per-frame feature extraction. Native
    ``sequence``+``explode``; no Python."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_k))
        ).alias("frame_idx"),
    )


#: schema of extracted per-item feature vectors
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

#: schema of resized-media metadata
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("scale_num", T.IntegerType()),
        T.StructField("scale_den", T.IntegerType()),
    ]
)


def _features_real(payload: bytes, dim: int) -> list[float]:
    """Real feature extraction — needs a vision/audio model runtime.

    STUB: swap in an ONNX/torch encoder in a real deployment.
    """
    raise NotImplementedError(
        "feature-extraction models are not available in this environment; "
        "use fake=True for the deterministic test path"
    )


def extract_features(media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Binary payload → fixed-dim feature vector, Arrow-batched.

    The deterministic fake derives component i as
    ``(n_bytes mod (7 + i)) / (7 + i)`` — enough to validate the
    binary→ARRAY<FLOAT> plumbing end-to-end (batch signature, array
    column shape, downstream joinability with the ANN operators). The
    output feeds ``operators.similarity`` directly: decode → features →
    near-dup / ANN is the full multimodal dedup path.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = [
                    [float(len(p) % (7 + i)) / (7 + i) for i in range(dim)]
                    for p in pdf["payload"]
                ]
            else:
                feats = [_features_real(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.select("doc_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


def resize_media(decoded: DataFrame, max_width: int = 64) -> DataFrame:
    """Resize metadata: scale every item down to ``max_width`` preserving
    aspect ratio — pure native arithmetic on the decoded dimensions (the
    pixel resample itself belongs in the decode stage's codec; what the
    engine owns is the dimension/scale bookkeeping every pipeline stage
    after resize depends on). Zero-width items pass through unscaled.
    """
    needs = (F.col("width") > max_width).cast("int")
    scale_num = F.when(F.col("width") > max_width, F.lit(max_width)).otherwise(
        F.col("width")
    )
    scale_den = F.when(F.col("width") > max_width, F.col("width")).otherwise(
        F.greatest(F.col("width"), F.lit(1))
    )
    return decoded.select(
        "doc_id",
        F.when(needs == 1, F.lit(max_width)).otherwise(F.col("width")).alias("width"),
        F.when(
            needs == 1,
            F.floor(F.col("height") * max_width / F.col("width")).cast("int"),
        )
        .otherwise(F.col("height"))
        .alias("height"),
        scale_num.cast("int").alias("scale_num"),
        scale_den.cast("int").alias("scale_den"),
    )

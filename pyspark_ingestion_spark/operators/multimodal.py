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
PIXEL/SAMPLE level is REAL for: uncompressed 24/32-bit BMP pixel rows
and 8/16-bit PCM WAV frames (plain byte slices, round-5); 8-bit
grayscale/truecolor PNG (stdlib ``zlib`` inflate + the five spec
filter predictors) and GIF (a ~60-line pure-Python LZW decoder),
round-6; and JPEG (round-7) — a pure-Python entropy + DCT pipeline (canonical
Huffman from the file's own DHT, byte unstuffing, DC prediction,
dequant, zig-zag, 8x8 inverse DCT) covering baseline sequential
(SOF0/1) in grayscale, 4:4:4 AND chroma-subsampled 4:2:0/4:2:2 (the
dominant camera/web form, full interleaved-MCU geometry) plus
PROGRESSIVE (SOF2, full annex G: spectral selection, successive
approximation with G.1.2.3 correction bits, EOB runs) — all decoded
by ``media_signal_features`` into oracle-checked luma/RMS statistics.
VIDEO is real too (round-9): MJPEG-in-AVI — the RIFF chunk grammar
walked for real (hdrl/strl stream headers validated, movi frames
extracted) with every frame decoded through the same JPEG pipeline
(``video_frame_stats``, per-frame oracle-checked). INTER-FRAME video
is real at its entry level (round-13): BI_RLE8 ('MRLE') delta frames —
run-length frames whose skipped pixels RETAIN the previous frame, so
decode carries composed state across the stream (oracle-checked per
composed frame).
What remains behind ``NotImplementedError``, stated just as plainly:
arithmetic-coded and lossless JPEG, MOTION-COMPENSATED/DCT inter-frame
codecs (H.264/VP9/AV1 — a codec runtime, not container work), and
LEARNED feature extraction (needs a model runtime);
the deterministic fake path exercises the exact same schema,
partitioning, UDF signature and batch shape, so those swaps stay
localized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # numpy rides in with pandas (Arrow batches are numpy-backed), so
    # it is effectively always present where mapInPandas runs; the guard
    # keeps the pure-Python decode/encode paths importable without it.
    import numpy as np
except ImportError:  # pragma: no cover - pandas guarantees numpy here
    np = None

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
    n_frames=sample frames). PIXEL-level decode is real for
    BMP/PNG/GIF/baseline-JPEG/PCM-WAV (see ``media_signal_features``);
    unknown containers raise NotImplementedError; see module docstring.
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
        "natively; pixel/sample decode is real for BMP/PNG/GIF/PCM-WAV "
        "and baseline JPEG incl. 4:2:0/4:2:2 — see media_signal_features); "
        "use fake=True for the deterministic test path"
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
    ``sequence``+``explode``; no Python. Zero-frame items emit NO rows
    (an earlier ``greatest(n-1, 0)`` clamp emitted frame_idx 0 for a
    frame that does not exist — downstream per-frame extraction would
    have read frame 0 of a frameless item)."""
    idxs = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k)),
    ).otherwise(F.array().cast("array<int>"))
    return decoded.select("doc_id", F.explode(idxs).alias("frame_idx"))


#: schema of extracted per-item feature vectors. DOUBLE, not float32:
#: the histogram components are exact small-integer ratios computed in
#: Python doubles, and declaring float32 would truncate them for no
#: benefit while making 6-dp oracle rounding flip at float32-epsilon
#: boundaries.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
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


def _model_features(payload: bytes, dim: int) -> list[float]:
    """LEARNED (semantic) feature extraction — needs a vision/audio
    model runtime.

    STUB: swap in an ONNX/torch encoder in a real deployment. The
    CONTENT-derived deterministic features (luma/sample histograms) are
    real — see :func:`_pixel_features` / ``mode="pixel"``.
    """
    raise NotImplementedError(
        "learned feature-extraction models are not available in this "
        "environment; use mode='pixel' for real content-derived features "
        "or mode='fake' for the length-arithmetic plumbing path"
    )


def _pixel_features(payload: bytes, dim: int) -> list[float]:
    """REAL content-derived feature vector: a ``dim``-bin histogram of
    the decoded signal — BT.601 luma millis for BMP/PNG/GIF/JPEG pixels
    (bin = luma·dim ∕ 255000, clamped), centred-PCM samples shifted to
    unsigned for WAV — normalised by the value count, so components sum
    to 1 and are integer-ratio exact (SQL-oracle-checkable: the same
    arithmetic reproduces them from the fixture bytes). Deterministic,
    model-free, and derived from the actual decoded content, which is
    what makes the downstream ANN/dedup path operate on real signals."""
    import struct

    p = bytes(payload)
    if p[:2] == b"BM":
        vals, off, span = _bmp_luma_millis(p), 0, 255_000
    elif p[:8] == b"\x89PNG\r\n\x1a\n":
        vals, off, span = _png_luma_millis(p), 0, 255_000
    elif p[:4] == b"GIF8":
        vals, off, span = _gif_luma_millis(p), 0, 255_000
    elif p[:3] == b"\xff\xd8\xff":
        vals, off, span = (
            _jpeg_luma_array(p) if np is not None else _jpeg_luma_millis(p)
        ), 0, 255_000
    elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        vals = _wav_sample_values(p)
        # bit depth decides the centring shift (8-bit samples were
        # centred by −128, 16-bit are signed int16)
        pos, bits = 12, 16
        while pos + 8 <= len(p):
            cid = p[pos : pos + 4]
            csz = struct.unpack_from("<I", p, pos + 4)[0]
            if cid == b"fmt ":
                bits = struct.unpack_from("<H", p, pos + 22)[0]
                break
            pos += 8 + csz + (csz & 1)
        off, span = (128, 256) if bits == 8 else (32_768, 65_536)
    else:
        raise NotImplementedError(
            "pixel features cover the really-decoded containers "
            "(BMP/PNG/GIF/baseline+progressive JPEG/PCM WAV); other "
            "payloads need mode='model' (gated) or mode='fake'"
        )
    n = len(vals)
    if n == 0:
        return [0.0] * dim
    if np is not None:
        # same integer arithmetic, vectorized: int64 ``*dim //span`` is
        # the identical floor division, and count/n is the identical
        # IEEE float64 division — bit-equal to the scalar loop below
        a = np.asarray(vals, dtype=np.int64)
        b = (a + off) * dim // span
        # clamp BOTH ends: current decoders keep values in range, but
        # an out-of-range value must land in an edge bin identically on
        # both paths (bincount raises on negatives; a negative list
        # index would silently wrap in the scalar loop below)
        np.clip(b, 0, dim - 1, out=b)
        counts = np.bincount(b, minlength=dim)
        return (counts / n).tolist()
    counts = [0] * dim
    for v in vals:
        b = (v + off) * dim // span
        counts[min(max(b, 0), dim - 1)] += 1
    return [c / n for c in counts]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    mode: str = "pixel",
    fake: bool | None = None,
) -> DataFrame:
    """Binary payload → fixed-dim feature vector, Arrow-batched.

    ``mode="pixel"`` (default): REAL content features — a normalised
    ``dim``-bin histogram of the decoded luma/PCM signal
    (:func:`_pixel_features`), reusing the same pure-Python decoders as
    ``media_signal_features``; deterministic and byte-arithmetic
    oracle-checkable. ``mode="fake"``: the length-arithmetic scaffold
    (component i = ``(n_bytes mod (7+i)) / (7+i)``) for plumbing tests
    on opaque payloads. ``mode="model"``: the honest learned-embedding
    gate (NotImplementedError without a model runtime). The output
    feeds ``operators.similarity`` directly: decode → features →
    near-dup / ANN is the full multimodal dedup path.

    .. deprecated:: r9
       The pre-r8 boolean ``fake=`` kwarg still works (``fake=True`` →
       ``mode="fake"``, ``fake=False`` → ``mode="model"``, the two
       behaviors it used to select) but warns; callers should pass an
       explicit ``mode``. NOTE the r8 default-behavior change: the old
       default worked on any opaque payload; ``mode="pixel"`` raises
       for payloads that are not decodable BMP/PNG/GIF/JPEG/WAV
       containers.
    """
    if fake is not None:
        import warnings

        warnings.warn(
            "extract_features(fake=...) is deprecated; pass "
            "mode='fake' or mode='model'",
            DeprecationWarning,
            stacklevel=2,
        )
        mode = "fake" if fake else "model"
    if mode not in ("pixel", "fake", "model"):
        raise ValueError(f"unknown feature mode {mode!r}")
    fn = {
        "pixel": _pixel_features,
        "model": _model_features,
        "fake": lambda p, d: [float(len(p) % (7 + i)) / (7 + i) for i in range(d)],
    }[mode]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fn(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.select("doc_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


#: schema of perceptual-hash signatures: the 64 dHash bits split into
#: two 32-bit halves (bits 32..63 and 0..31). Two BIGINTs instead of
#: one because bit 63 of a packed long would need two's-complement
#: wraparound, which SQL oracles cannot reproduce without HUGEINT
#: gymnastics; every shift/mask/bit_count downstream works identically
#: on the halves.
PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dh_hi", T.LongType()),
        T.StructField("dh_lo", T.LongType()),
    ]
)


def _image_dhash_bits(payload: bytes, gx: int = 9, gy: int = 8) -> tuple[int, int]:
    """64-bit dHash over the REALLY-decoded luma plane: block-mean
    downsample to a ``gx × gy`` grid (pixel (x, y) → cell
    (x·gx ∕ w, y·gy ∕ h), integer division), then bit k = cy·(gx−1)+cx
    is 1 iff cell (cy, cx) mean > cell (cy, cx+1) mean. The comparison
    cross-multiplies integer sums and counts — no float ever — so a SQL
    oracle reproduces every bit from the fixture bytes. Cells a small
    image leaves empty compare as 0-sum/0-count (bit 0, deterministic).
    The y axis follows the DECODER's row order (for bottom-up BMPs that
    is bottom row first) — orientation is a convention; dedup only needs
    both copies of an image to land on the same one.

    Near-dup robustness comes from block means: a uniform brightness
    shift adds the same constant to every cell mean (hash-invariant),
    and a local edit perturbs only the cells it touches (few bits)."""
    p = bytes(payload)
    w, h, _ = _decode_real(p)
    if p[:2] == b"BM":
        vals = _bmp_luma_millis(p)
    elif p[:8] == b"\x89PNG\r\n\x1a\n":
        vals = _png_luma_millis(p)
    elif p[:4] == b"GIF8":
        vals = _gif_luma_millis(p)
    elif p[:3] == b"\xff\xd8\xff":
        vals = _jpeg_luma_array(p) if np is not None else _jpeg_luma_millis(p)
    else:
        raise NotImplementedError(
            "image dHash needs a really-decoded pixel container "
            "(BMP/PNG/GIF/JPEG)"
        )
    if w <= 0 or h <= 0 or len(vals) < w * h:
        raise ValueError(f"decoded plane too small: {len(vals)} < {w}x{h}")
    if np is not None:
        # identical integer grid accumulation, vectorized: np.add.at is
        # exact int64 (no float weights), so the cross-multiplied bit
        # comparisons below see the same sums as the scalar loop
        a = (vals if isinstance(vals, np.ndarray)
             else np.asarray(vals, dtype=np.int64))[: w * h]
        idx = np.arange(w * h)
        cell = ((idx // w) * gy // h) * gx + (idx % w) * gx // w
        sums = np.zeros(gx * gy, dtype=np.int64)
        np.add.at(sums, cell, a)
        s = sums.reshape(gy, gx).tolist()
        c = np.bincount(cell, minlength=gx * gy).reshape(gy, gx).tolist()
    else:
        s = [[0] * gx for _ in range(gy)]
        c = [[0] * gx for _ in range(gy)]
        for idx in range(w * h):  # multi-frame GIFs hash their first frame
            cx = (idx % w) * gx // w
            cy = (idx // w) * gy // h
            s[cy][cx] += vals[idx]
            c[cy][cx] += 1
    hi = lo = 0
    for cy in range(gy):
        for cx in range(gx - 1):
            if s[cy][cx] * c[cy][cx + 1] > s[cy][cx + 1] * c[cy][cx]:
                k = cy * (gx - 1) + cx
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return hi, lo


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual dHash per media item, Arrow-batched: (doc_id, dh_hi,
    dh_lo) — the multimodal column's first-class DEDUP signature. 9×8
    block means → 64 horizontal-gradient bits; near-duplicate images
    (re-encodes, brightness shifts, small local edits) land within a few
    Hamming bits, distinct images ~32 apart. Feeds the same
    pigeonhole-complete banding as ``dedup_simhash_hamming`` (8 bands of
    8 bits across the two halves guarantee any pair ≤ 7 bits apart
    shares a band), so the pair search is band equi-joins — never
    all-pairs — exactly the LSH scale shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = [_image_dhash_bits(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dh_hi": [x[0] for x in hashes],
                    "dh_lo": [x[1] for x in hashes],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, PHASH_SCHEMA)


#: audio fingerprint signatures: 64 frame-mean-gradient bits in two
#: 32-bit halves (same two's-complement rationale as PHASH_SCHEMA).
FHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fh_hi", T.LongType()),
        T.StructField("fh_lo", T.LongType()),
    ]
)


def _audio_fhash_bits(payload: bytes, frames: int = 65) -> tuple[int, int]:
    """64-bit audio fingerprint over REALLY-decoded PCM samples: block-
    mean downsample the sample stream to ``frames`` frames (sample i →
    frame i·frames ∕ n, integer division — the 1-D analogue of the
    dHash grid), then bit k is 1 iff frame k's mean > frame k+1's mean,
    compared by integer cross-multiplication (no float ever) so a SQL
    oracle reproduces every bit from the fixture bytes. Frames a short
    clip leaves empty compare as 0-sum/0-count (bit 0, deterministic).

    Perceptual contract (the dHash economics, on audio): a DC offset
    adds the same constant to every frame mean — hash-invariant; a
    POSITIVE gain scales every mean equally — hash-invariant (the
    cross-multiplied comparison divides it out); a local edit perturbs
    only the frames it touches (few bits); distinct audio lands ~32
    bits apart. Envelope (frame-mean) gradients are the integer-exact
    stand-in for the energy/zero-crossing features of production audio
    fingerprints — same banding, same index shape."""
    vals = _wav_sample_values(bytes(payload))
    n = len(vals)
    if n == 0:
        raise ValueError("audio fingerprint needs at least one PCM sample")
    s = [0] * frames
    c = [0] * frames
    for i, v in enumerate(vals):
        f = i * frames // n
        s[f] += v
        c[f] += 1
    hi = lo = 0
    for k in range(frames - 1):
        if s[k] * c[k + 1] > s[k + 1] * c[k]:
            if k < 32:
                lo |= 1 << k
            else:
                hi |= 1 << (k - 32)
    return hi, lo


def audio_fhash(media: DataFrame) -> DataFrame:
    """Perceptual fingerprint per audio item, Arrow-batched: (doc_id,
    fh_hi, fh_lo) — the WAV member of the multimodal dedup family
    (images: :func:`image_dhash`). Near-duplicate clips (DC offsets,
    gain changes, small local edits) land within a few Hamming bits;
    distinct clips ~32 apart. Feeds the same pigeonhole-complete 8×8-bit
    banding as ``dedup_simhash_hamming``/``dedup_image_phash``, so the
    pair search is band equi-joins — never all-pairs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = [_audio_fhash_bits(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fh_hi": [x[0] for x in hashes],
                    "fh_lo": [x[1] for x in hashes],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FHASH_SCHEMA)


#: the shared 8-band × 8-bit split of a 64-bit perceptual hash held as
#: two 32-bit halves. Pigeonhole-complete for Hamming radius ≤ 7: a pair
#: differing in ≤ 7 bits cannot differ in all 8 bands, so band
#: equi-joins find EVERY in-radius pair — banding is a pure perf device,
#: never a recall tradeoff (the dedup_simhash_hamming argument).
_FP_BAND_VAL = (
    "CASE WHEN j < 4 THEN shiftright({lo}, 8 * j) & 255 "
    "ELSE shiftright({hi}, 8 * (j - 4)) & 255 END"
)


def fingerprint_bands(
    fp: DataFrame, id_col: str = "doc", hi_col: str = "hi", lo_col: str = "lo"
) -> DataFrame:
    """Explode (id, hi, lo) fingerprint rows into their 8 band rows
    (doc, hi, lo, j, band_val) — the candidate-join key space shared by
    every 64-bit perceptual-hash family member (image dHash, audio
    fHash, SimHash)."""
    return fp.select(
        F.col(id_col).alias("doc"),
        F.col(hi_col).alias("hi"),
        F.col(lo_col).alias("lo"),
        F.explode(F.array(*[F.lit(j) for j in range(8)])).alias("j"),
    ).withColumn(
        "band_val", F.expr(_FP_BAND_VAL.format(hi="hi", lo="lo"))
    )


def _fp_drop_big_buckets(
    bands: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Band-key-skew guard for the fingerprint tiers — the
    ``_drop_big_buckets`` of ``operators.dedup``, keyed on (j,
    band_val): drop band buckets holding more rows than the cap via a
    broadcast anti-join on the (tiny by construction) oversized-bucket
    list. The skew this guards is DEGENERATE MEDIA: flat images and
    silent audio all hash to the same fingerprint, so one (j, band_val)
    bucket holds the whole degenerate population and the band equi-join
    goes quadratic in it (the SCALING.md watch-item).

    Exactness cost, stated precisely: below the cap NOTHING is dropped
    and the pigeonhole guarantee is intact (results ≡ brute force). A
    dropped bucket loses a pair only if EVERY band the pair shares is
    in a dropped bucket — for near-dups that share one odd band the
    other shared bands still match them; the pairs genuinely lost are
    the degenerate-media ones whose every shared bucket is oversized
    (e.g. thousands of identical flat frames). Those are exactly the
    pairs exact/hash dedup upstream already catches — run exact dedup
    first, or size the cap above the expected benign multiplicity."""
    if max_bucket_size is None:
        return bands
    if max_bucket_size < 1:
        raise ValueError(f"max_bucket_size must be >= 1, got {max_bucket_size}")
    from pyspark_ingestion_spark.operators.dedup import _drop_big_buckets

    return _drop_big_buckets(bands, max_bucket_size, keys=("j", "band_val"))


def fingerprint_batch_rejects(
    corpus_fp: DataFrame,
    batch_fp: DataFrame,
    radius: int = 7,
    max_bucket_size: int | None = None,
    bucket_cap_mode: str = "drop",
    probe_salts: int = 4,
    salt_hash: str = "xxhash64",
) -> DataFrame:
    """Batch-mode perceptual admission: ids of ``batch_fp`` rows whose
    64-bit fingerprint sits within ``radius`` Hamming bits of ANY
    ``corpus_fp`` row. Both inputs are normalized (doc, hi, lo) frames
    (``image_dhash`` / ``audio_fhash`` output with the halves renamed).

    Scale shape — the admission economics of ``_lsh_admission_tail``
    applied to fingerprints: the batch's band rows are EXPLICITLY
    broadcast into a band equi-join against the corpus bands (the only
    corpus-proportional term is that scan, embarrassingly parallel),
    then exact ``bit_count(xor())`` verifies candidates only — never
    all-pairs. ``radius`` must stay ≤ 7: the 8×8-bit banding is
    pigeonhole-complete exactly up to 7 differing bits, so results are
    EXACT (equal to a brute-force Hamming scan), not approximate.

    ``max_bucket_size`` (optional) caps CORPUS band buckets against
    degenerate-media skew (see :func:`_fp_drop_big_buckets` for the
    exactness trade); the batch side stays uncapped — it is broadcast-
    small, and capping only the corpus bounds the join at
    cap × batch_rows per bucket.

    ``bucket_cap_mode`` (r12, VERDICT r11 item 3) picks the trade
    inside an oversized corpus bucket: ``"drop"`` loses the whole
    bucket — a batch item near a legitimately POPULAR corpus cluster
    (meme reposts, watermarked variants) silently loses admission
    recall when every shared band bucket is oversized; ``"salt"``
    splits the bucket into ``ceil(n/cap)`` deterministic sub-buckets
    and replicates each batch band row into ``min(n_salts,
    probe_salts)`` of them (``dedup._probe_salted_buckets``),
    recovering ~probe_salts·cap candidate partners per batch item at
    O(batch·probe_salts) cost — the per-sub-bucket join stays bounded
    at ~cap corpus rows. Rejects: drop ⊆ salt ⊆ uncapped
    (property-pinned); banding exactness for the SURVIVING candidates
    is untouched (the Hamming verify is exact either way).

    ``salt_hash`` (r13, VERDICT r12 item 4) picks the per-doc split
    hash for BOTH sides — ``"md5"`` exists so an admission-shaped
    fixture query can oracle-check the full cross-side salt arithmetic
    (``dedup._salt_hash_col``); the default xxhash64 stays the
    production path."""
    if not 0 <= radius <= 7:
        raise ValueError(
            f"radius must be in [0, 7] (8-band pigeonhole bound), got {radius}"
        )
    if bucket_cap_mode not in ("drop", "salt"):
        raise ValueError(
            f"bucket_cap_mode must be 'drop' or 'salt', got {bucket_cap_mode!r}"
        )
    raw_c = fingerprint_bands(corpus_fp)
    b = fingerprint_bands(batch_fp)
    join_keys = ["j", "band_val"]
    if bucket_cap_mode == "salt" and max_bucket_size is not None:
        from pyspark_ingestion_spark.operators.dedup import (
            _oversized_bucket_salts,
            _probe_salted_buckets,
            _salt_corpus_bands,
        )

        if max_bucket_size < 1:
            raise ValueError(
                f"max_bucket_size must be >= 1, got {max_bucket_size}"
            )
        big_salts = _oversized_bucket_salts(
            raw_c, max_bucket_size, keys=("j", "band_val")
        )
        c = _salt_corpus_bands(
            raw_c, big_salts, keys=("j", "band_val"), salt_hash=salt_hash
        )
        b = _probe_salted_buckets(
            b, big_salts, probe_salts, keys=("j", "band_val"),
            salt_hash=salt_hash,
        )
        join_keys.append("__salt")
    else:
        c = _fp_drop_big_buckets(raw_c, max_bucket_size)
    c = c.select(
        F.col("hi").alias("chi"), F.col("lo").alias("clo"), *join_keys
    )
    hamming = F.bit_count(F.col("hi").bitwiseXOR(F.col("chi"))) + F.bit_count(
        F.col("lo").bitwiseXOR(F.col("clo"))
    )
    return (
        c.join(F.broadcast(b), join_keys)
        .filter(hamming <= radius)
        .select("doc")
        .distinct()
    )


def fingerprint_pairs(
    fp: DataFrame,
    id_col: str = "doc",
    hi_col: str = "hi",
    lo_col: str = "lo",
    radius: int = 7,
    max_bucket_size: int | None = None,
    bucket_cap_mode: str = "drop",
    salt_hash: str = "xxhash64",
) -> DataFrame:
    """Banded within-corpus near-dup PAIR search over (id, hi, lo)
    fingerprint rows: (doc_a, doc_b, hamming) for every pair within
    ``radius`` Hamming bits — band equi-joins (:func:`fingerprint_
    bands`) then exact bit_count verify, never all-pairs; EXACT for
    radius ≤ 7 (pigeonhole). The shared tail of every perceptual dedup
    query (image dHash / audio fHash / video temporal dHash).

    ``max_bucket_size`` (optional) caps band buckets so degenerate
    media (flat images / silent audio — every one the same fingerprint)
    cannot send the self-join quadratic. ``bucket_cap_mode`` picks the
    trade inside an oversized bucket (r11): ``"drop"`` loses the whole
    bucket (exactness trade on :func:`_fp_drop_big_buckets` — right for
    degenerate media exact dedup already catches), ``"salt"``
    salt-splits it into bounded sub-buckets so a legitimately POPULAR
    near-dup cluster (memes, boilerplate) keeps ~cap candidate partners
    per doc instead of losing all recall — work per bucket n·cap, never
    n²; recall ≥ drop mode and every surviving pair is a genuine band
    collision (property-pinned; see ``dedup._salt_big_buckets``).
    ``salt_hash`` picks the per-doc split hash (``"md5"`` is the
    DuckDB-expressible variant fixture queries oracle-check the salt
    arithmetic with — r12; see ``dedup._salt_hash_col``)."""
    if not 0 <= radius <= 7:
        raise ValueError(
            f"radius must be in [0, 7] (8-band pigeonhole bound), got {radius}"
        )
    if bucket_cap_mode not in ("drop", "salt"):
        raise ValueError(
            f"bucket_cap_mode must be 'drop' or 'salt', got {bucket_cap_mode!r}"
        )
    raw = fingerprint_bands(fp, id_col, hi_col, lo_col)
    if bucket_cap_mode == "salt" and max_bucket_size is not None:
        from pyspark_ingestion_spark.operators.dedup import _salt_big_buckets

        bands = _salt_big_buckets(
            raw, max_bucket_size, keys=("j", "band_val"), doc_col="doc",
            salt_hash=salt_hash,
        )
        join_keys = ["j", "band_val", "__salt"]
    else:
        bands = _fp_drop_big_buckets(raw, max_bucket_size)
        join_keys = ["j", "band_val"]
    a = bands.select(
        F.col("doc").alias("doc_a"), F.col("hi").alias("ha"),
        F.col("lo").alias("la"), *join_keys,
    )
    b = bands.select(
        F.col("doc").alias("doc_b"), F.col("hi").alias("hb"),
        F.col("lo").alias("lb"), *join_keys,
    )
    cand = (
        a.join(b, join_keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "la", "hb", "lb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return cand.filter(hamming <= radius).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


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


# ------------------------------------------------- codec-free real decode
#
# BMP pixel rows and WAV PCM frames are raw byte slices, PNG is
# DEFLATE (stdlib zlib) + five arithmetic filter predictors, and GIF is
# pure-Python LZW — no codec runtime needed — so for these four
# containers the pixel/sample level is REAL computation, shrinking the
# NotImplementedError surface to the one codec that genuinely needs a
# runtime: JPEG (DCT + entropy coding).

#: schema of pixel/sample signal statistics (media_signal_features)
#: per-item value-count bound for the vectorized int64 Σv² fast path:
#: luma millis reach 255 000, so Σv² stays under 2⁶³ only while
#: n < 2⁶³ / 255 000² ≈ 1.418e8 values. numpy would wrap SILENTLY past
#: it (the scalar Python sums it replaces were arbitrary-precision), so
#: the stats consumers fall back to exact Python sums above the bound —
#: a ~140-megapixel single item, where the decode already dwarfs the sum.
_INT64_SQSUM_SAFE_N = (1 << 63) // (255_000 * 255_000)

SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("mean_val", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _bmp_luma_millis(payload: bytes) -> list[int]:
    """REAL pixel decode for uncompressed 24/32-bit BMP: per-pixel ITU-R
    BT.601 luma in integer millis (299·R + 587·G + 114·B) — integer so
    downstream statistics are bit-reproducible across engines.

    Walks the actual pixel array (data offset from the file header, row
    stride = bpp·width padded to 4 bytes, bottom-up or top-down): these
    are plain byte slices, which is exactly why BMP needs no codec.
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP pixels are decoded natively "
            f"(got compression={comp}, bpp={bpp})"
        )
    h = abs(h)  # row order (bottom-up vs top-down) is irrelevant for stats
    bypp = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    lumas = []
    for r in range(h):
        base = off + r * stride
        for c in range(w):
            i = base + c * bypp
            b, g, rr = payload[i], payload[i + 1], payload[i + 2]
            lumas.append(299 * rr + 587 * g + 114 * b)
    return lumas


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW decode (GIF89a spec appendix F): LSB-first bit
    packing, variable code width from ``min_code_size``+1 up to 12 bits,
    CLEAR resets the table, code width grows when the table reaches
    2^width. Pure Python over the concatenated image sub-blocks."""
    clear = 1 << min_code_size
    end = clear + 1
    init = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(init)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + width <= total:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == end:
            break
        if code == clear:
            table = list(init)
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: corrupt LZW stream (code beyond table)")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return out


def _gif_lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode — the exact inverse of
    :func:`_gif_lzw_decode` (greedy longest-match, width bump when the
    DECODER's table reaches 2^width — its table trails this encoder's
    ``next_code`` by one — and a CLEAR reset before the 4096-entry
    ceiling). Fixture role: lets the synthesizer emit REAL compressed
    GIF streams for the real decoder to chew on."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear)
    buf = b""
    for b in pixels:
        nb = buf + bytes([b])
        if nb in table:
            buf = nb
            continue
        emit(table[buf])
        table[nb] = next_code
        next_code += 1
        # decoder table size before reading the NEXT code = next_code - 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        buf = bytes([b])
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _need(payload: bytes, pos: int, n: int, what: str) -> None:
    """Bounds guard for the byte-walking decoders: raise the decoders'
    ValueError contract (not IndexError/struct.error) when a truncated
    or corrupt container would read past the payload (ADVICE r6)."""
    if pos + n > len(payload):
        raise ValueError(f"{what}: truncated payload")


def _gif_luma_millis(payload: bytes) -> list[int]:
    """REAL pixel decode for GIF using the pure-Python LZW decoder:
    walk the container (logical screen descriptor, color tables,
    extension blocks, image descriptors), LZW-decode every frame's
    index stream, map indices through the active palette to BT.601 luma
    millis. Interlaced frames decode in storage order — irrelevant for
    the order-free statistics this feeds. GIF needs no codec RUNTIME
    (LZW is ~60 lines of integer bit-twiddling), the same honesty bar
    as the PNG/BMP/WAV decoders."""
    import struct

    if payload[:4] != b"GIF8":
        raise ValueError("not a GIF payload")
    _need(payload, 6, 7, "gif")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        _need(payload, pos, 3 * n, "gif")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    lumas: list[int] = []
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            _need(payload, pos, 1, "gif")
            while payload[pos]:
                pos += 1 + payload[pos]
                _need(payload, pos, 1, "gif")
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b0:02x}")
        _need(payload, pos + 1, 9, "gif")
        _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            _need(payload, pos, 3 * n, "gif")
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: no color table for image")
        _need(payload, pos, 1, "gif")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        _need(payload, pos, 1, "gif")
        while payload[pos]:
            ln = payload[pos]
            _need(payload, pos + 1, ln, "gif")
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            _need(payload, pos, 1, "gif")
        pos += 1
        idxs = _gif_lzw_decode(bytes(data), min_code)
        if len(idxs) < iw * ih:
            raise ValueError("gif: LZW stream shorter than frame")
        for i in idxs[: iw * ih]:
            base = 3 * i
            if base + 3 > len(pal):
                raise ValueError("gif: pixel index beyond color table")
            lumas.append(
                299 * pal[base] + 587 * pal[base + 1] + 114 * pal[base + 2]
            )
    return lumas


def _png_paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_luma_millis(payload: bytes) -> list[int]:
    """REAL pixel decode for 8-bit grayscale/truecolor PNG using ONLY
    stdlib ``zlib``: concatenate the IDAT stream, inflate, undo the five
    per-scanline filter predictors (None/Sub/Up/Average/Paeth — PNG spec
    §9), and emit per-pixel BT.601 luma in integer millis (grayscale
    luma = 1000·v since 299+587+114 = 1000). PNG pixels need no codec
    runtime — DEFLATE is stdlib — so this path is real computation, the
    same honesty bar as the BMP/WAV decoders above."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = bitdepth = colortype = interlace = None
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        _need(payload, pos + 8, clen, "png")
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            if clen < 13:
                raise ValueError("png: truncated payload")
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if w is None:
        raise ValueError("png: missing IHDR")
    if bitdepth != 8 or colortype not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            f"only non-interlaced 8-bit grayscale/truecolor PNG pixels are "
            f"decoded natively (got depth={bitdepth}, color={colortype}, "
            f"interlace={interlace})"
        )
    ch = 1 if colortype == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png: IDAT length does not match dimensions")
    prior = bytearray(stride)
    lumas: list[int] = []
    for r in range(h):
        base = r * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prior[x - ch] if x >= ch else 0
                line[x] = (line[x] + _png_paeth(a, prior[x], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"png: unknown filter type {ft}")
        if ch == 1:
            lumas.extend(1000 * v for v in line)
        else:
            for i in range(0, stride, 3):
                lumas.append(299 * line[i] + 587 * line[i + 1] + 114 * line[i + 2])
        prior = line
    return lumas


def _wav_sample_values(payload: bytes) -> list[int]:
    """REAL sample decode for PCM WAV (8-bit unsigned → centered at 0,
    16-bit signed little-endian): PCM frames are plain byte slices.
    Multi-channel data decodes interleaved (stats are over all channels).
    """
    import struct

    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        raise ValueError("not a WAV payload")
    pos = 12
    fmt_code = bits = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_code, _ch = struct.unpack_from("<HH", payload, pos + 8)
            (bits,) = struct.unpack_from("<H", payload, pos + 22)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + csz]
        pos += 8 + csz + (csz & 1)
    if fmt_code is None or data is None:
        raise ValueError("wav: missing fmt/data chunks")
    if fmt_code != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM WAV samples are decoded natively "
            f"(got format={fmt_code}, bits={bits})"
        )
    if bits == 8:
        return [b - 128 for b in data]
    n = len(data) // 2
    return list(struct.unpack_from(f"<{n}h", data))


def media_signal_features(media: DataFrame) -> DataFrame:
    """REAL pixel/sample statistics per media item, Arrow-batched:
    (doc_id, container, n_values, mean_val, rms).

    BMP/PNG/GIF → per-pixel BT.601 luma millis; WAV → PCM samples
    (8-bit centered).
    Sums are exact int64 (luma millis ≤ 255 000 per pixel, squares
    ≤ 6.5e10 — no overflow until ~10⁸ pixels per item) with ONE float
    division at the end, so values hash identically against a SQL oracle
    doing the same integer arithmetic. Compressed containers raise
    NotImplementedError — the honest codec gate, now narrowed to
    formats that genuinely need a codec runtime.
    """
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "container", "n_values", "mean_val", "rms")}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                if p[:2] == b"BM":
                    vals, cont, scale = _bmp_luma_millis(p), "bmp", 1000
                elif p[:8] == b"\x89PNG\r\n\x1a\n":
                    vals, cont, scale = _png_luma_millis(p), "png", 1000
                elif p[:4] == b"GIF8":
                    vals, cont, scale = _gif_luma_millis(p), "gif", 1000
                elif p[:3] == b"\xff\xd8\xff":
                    vals, cont, scale = (
                        _jpeg_luma_array(p) if np is not None
                        else _jpeg_luma_millis(p)
                    ), "jpeg", 1000
                elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                    vals, cont, scale = _wav_sample_values(p), "wav", 1
                else:
                    raise NotImplementedError(
                        "pixel/sample decode covers BMP (raw slices), PNG "
                        "(stdlib-zlib inflate + unfilter), GIF (pure-python "
                        "LZW), baseline JPEG incl. 4:2:0/4:2:2 chroma "
                        "subsampling (pure-python Huffman + dequant + IDCT) "
                        "and PCM WAV; JPEG covers baseline (grayscale/"
                        "4:4:4/4:2:0/4:2:2), progressive (SOF2) and both "
                        "DQT precisions; MJPEG-in-AVI and BI_RLE8 delta "
                        "video decode via video_frame_stats; the remaining "
                        "gate is arithmetic-coded JPEG and motion-"
                        "compensated/DCT inter-frame codecs"
                    )
                n = len(vals)
                if np is not None and n < _INT64_SQSUM_SAFE_N:
                    # identical exact-int64 sums, vectorized (the JPEG
                    # branch already hands the plane over as an array);
                    # above the bound Σv² could wrap int64 SILENTLY, so
                    # huge items keep Python's arbitrary-precision sum
                    a = (vals if isinstance(vals, np.ndarray)
                         else np.asarray(vals, dtype=np.int64))
                    s1 = int(a.sum())
                    s2 = int((a * a).sum())
                else:
                    s1 = sum(vals)
                    s2 = sum(v * v for v in vals)
                out["doc_id"].append(doc_id)
                out["container"].append(cont)
                out["n_values"].append(n)
                out["mean_val"].append(s1 / (scale * n) if n else 0.0)
                out["rms"].append(math.sqrt(s2 / (scale * scale * n)) if n else 0.0)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(batches, SIGNAL_SCHEMA)


def synthesize_bmp_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 4
) -> DataFrame:
    """Deterministic REAL BMP payloads from a text column: the UTF-8
    bytes become the 24-bit pixel array of a ``width``-wide bottom-up
    BMP (zero-padded to whole rows). A data *generator* (fixture role,
    like ``attach_binary_payload``) — the decode side parses these with
    the real byte-walking parser, so the pixel path is exercised with
    valid files whose expected statistics a SQL oracle can compute from
    the text bytes directly. ``width`` must keep the 24-bit stride
    4-byte aligned (width % 4 == 0) so every payload byte is a pixel byte.
    """
    import struct

    if (width * 3) % 4:
        raise ValueError(f"width must keep 3·width % 4 == 0, got {width}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row = width * 3
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                h = max(1, -(-len(data) // row))
                padded = data.ljust(h * row, b"\x00")
                rows = [padded[i * row : (i + 1) * row] for i in range(h)]
                pix = b"".join(reversed(rows))  # bottom-up
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
                )
                hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
                payloads.append(hdr + dib + pix)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_png_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 4
) -> DataFrame:
    """Deterministic REAL PNG payloads from a text column: the UTF-8
    bytes become the 8-bit GRAYSCALE pixel array of a ``width``-wide
    PNG (zero-padded to whole rows), deflated with stdlib ``zlib``.
    Each scanline is FILTERED with type ``row % 5`` — None, Sub, Up,
    Average, Paeth in rotation — so the decoder's unfilter predictors
    are all genuinely exercised on every multi-row image, and the
    zlib round-trip proves the pixels really come out of the IDAT
    stream (fixture role, like ``synthesize_bmp_payload``)."""
    import struct
    import zlib

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                h = max(1, -(-len(data) // width))
                padded = data.ljust(h * width, b"\x00")
                raw = bytearray()
                prior = bytes(width)
                for r in range(h):
                    line = padded[r * width : (r + 1) * width]
                    ft = r % 5
                    raw.append(ft)
                    for x in range(width):
                        a = line[x - 1] if x else 0
                        b, c = prior[x], (prior[x - 1] if x else 0)
                        pred = (
                            0 if ft == 0
                            else a if ft == 1
                            else b if ft == 2
                            else (a + b) >> 1 if ft == 3
                            else _png_paeth(a, b, c)
                        )
                        raw.append((line[x] - pred) & 0xFF)
                    prior = line
                ihdr = struct.pack(">IIBBBBB", width, h, 8, 0, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                    + _chunk(b"IEND", b"")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_gif_payload(
    df: DataFrame, id_col: str, text_col: str, width: int = 4
) -> DataFrame:
    """Deterministic REAL GIF payloads from a text column: the UTF-8
    bytes become the pixel INDEX stream of a ``width``-wide GIF89a with
    a 256-entry grayscale global color table (palette[i] = (i,i,i), so
    decoded luma millis = 1000·byte), REALLY compressed with the
    pure-Python LZW encoder (min code size 8, variable width, clear
    resets) — the decoder's dictionary/width/reset machinery is
    genuinely exercised, not bypassed (fixture role, like
    ``synthesize_png_payload``)."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gct = bytes(v for i in range(256) for v in (i, i, i))
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                h = max(1, -(-len(data) // width))
                padded = data.ljust(h * width, b"\x00")
                lzw = _gif_lzw_encode(padded, 8)
                blocks = bytearray()
                for i in range(0, len(lzw), 255):
                    chunk = lzw[i : i + 255]
                    blocks += bytes([len(chunk)]) + chunk
                payloads.append(
                    b"GIF89a"
                    + struct.pack("<HHBBB", width, h, 0xF7, 0, 0)
                    + gct
                    + b"\x2c" + struct.pack("<HHHHB", 0, 0, width, h, 0)
                    + bytes([8]) + bytes(blocks) + b"\x00\x3b"
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL WAV payloads: the UTF-8 text bytes become the
    8-bit PCM mono data chunk (8000 Hz). Same fixture role as
    ``synthesize_bmp_payload``."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
                dchunk = struct.pack("<4sI", b"data", len(data)) + data
                if len(data) & 1:
                    dchunk += b"\x00"  # RIFF chunk padding (not part of samples)
                riff = b"WAVE" + fmt + dchunk
                payloads.append(struct.pack("<4sI", b"RIFF", len(riff)) + riff)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


# --------------------------------------------------------------- JPEG codec
#
# JPEG needs no codec RUNTIME either — the whole pipeline is
# integer/float arithmetic the stdlib covers: marker walk, canonical
# Huffman tables from DHT, bit unstuffing (0xFF 0x00), DC-predictor +
# run-length AC entropy decode, dequantization, 8x8 inverse DCT, level
# shift — for baseline sequential (SOF0/1, grayscale/4:4:4/4:2:0/4:2:2)
# AND progressive (SOF2, full annex G), with 8- and 16-bit quant
# tables. MJPEG-in-AVI video rides the same pipeline per frame; BI_RLE8
# delta video composes run-length frames statefully (r13). What stays
# honestly gated: arithmetic-coded/lossless JPEG, motion-compensated/
# DCT inter-frame codecs, learned feature extraction.

#: JPEG Annex K example luminance Huffman specs (public ITU T.81 tables):
#: (BITS counts for lengths 1..16, HUFFVAL symbol list)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: zig-zag index order (T.81 figure 5): zigzag[k] = raster index of the
#: k-th coefficient in transmission order
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length).
    Rejects OVER-SUBSCRIBED tables (a code ≥ 2^length — more codes at a
    length than the prefix space holds, impossible from a valid encoder,
    T.81 C.2's counts must satisfy Kraft): without the check a crafted
    DHT passes the parser's pure length checks and later indexes the
    fast path's 65536-entry peek LUT out of range (raw IndexError
    instead of the decoders' ValueError contract), while the pure
    reader would silently decode the self-contradictory table."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= 1 << length:
                raise ValueError("jpeg: over-subscribed Huffman table")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


#: decode tables cached by their DHT spec bytes (BITS + HUFFVAL): an
#: MJPEG stream repeats identical tables in every frame, so canonical-
#: code construction — and the fast path's 16-bit peek LUT below —
#: happens once per DISTINCT table, not once per frame. The LUT cache
#: keys on id() of the table dict, which is safe because every LUT
#: entry holds a strong ref to its own table; eviction is single-entry
#: LRU (r12 — a hit re-inserts the entry, so insert order IS
#: recency order and the evictee is the coldest spec, not the oldest:
#: under FIFO a workload cycling through exactly >64 hot specs still
#: evicted in-use tables one at a time) — wholesale clearing would
#: re-derive 65536-entry LUTs for the hot tables on every cycle.
_JPEG_TABLE_CACHE: dict[bytes, dict] = {}
_JPEG_LUT_CACHE: dict[int, tuple[dict, list]] = {}


def _jpeg_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Decoder view of the same canonical table: (length, code) -> symbol."""
    key = bytes(bits) + bytes(vals)
    got = _JPEG_TABLE_CACHE.pop(key, None)
    if got is None:
        if len(_JPEG_TABLE_CACHE) > 64:
            # LRU-evict ONE coldest spec (hits re-insert below, so
            # dict order is recency order) and its LUT; never clear
            # tables in active use
            coldest = _JPEG_TABLE_CACHE.pop(next(iter(_JPEG_TABLE_CACHE)))
            _JPEG_LUT_CACHE.pop(id(coldest), None)
        got = {
            (length, code): sym
            for sym, (code, length) in _jpeg_canonical_codes(bits, vals).items()
        }
    # (re-)insert puts the entry at the end — move-to-end on hit
    _JPEG_TABLE_CACHE[key] = got
    return got


def _jpeg_lut(table: dict) -> list[int]:
    """16-bit peek LUT over a decode table: ``lut[next16bits]`` =
    ``(code_length << 8) | symbol``, 0 = invalid prefix (code lengths
    are ≥ 1, so a filled entry is never 0 even for symbol 0x00/EOB).
    One list index replaces up to 16 bit-by-bit tree probes — the
    Huffman half of the fast decode path. Canonical prefix codes make
    every 16-bit word sharing a valid prefix map to the same entry, so
    peeking past the true symbol end (even into padding) is harmless;
    the caller bounds actual CONSUMPTION against the stream length.

    The cache entry holds a strong reference to ``table`` itself, so an
    id() key can never be reused while its entry exists — even if the
    table cache was cleared underneath an in-flight decode."""
    got = _JPEG_LUT_CACHE.pop(id(table), None)
    if got is not None:
        _JPEG_LUT_CACHE[id(table)] = got  # move-to-end: LRU, not FIFO
        return got[1]
    if len(_JPEG_LUT_CACHE) > 64:
        # independent LRU bound: a LUT can outlive its table-cache
        # entry (an in-flight decode holds the table after eviction),
        # so orphaned entries must age out here too — evicting a live
        # one only costs a rebuild, never correctness (the id key stays
        # valid while the caller holds the table)
        _JPEG_LUT_CACHE.pop(next(iter(_JPEG_LUT_CACHE)))
    lut = [0] * 65536
    for (length, code), sym in table.items():
        base = code << (16 - length)
        entry = (length << 8) | sym
        for i in range(base, base + (1 << (16 - length))):
            lut[i] = entry
    _JPEG_LUT_CACHE[id(table)] = (table, lut)
    return lut


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, payload: bytes, pos: int):
        self.p = payload
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.p):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.p[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.p):
                    raise ValueError("jpeg: truncated entropy stream")
                nxt = self.p[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("jpeg: marker inside entropy stream")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


_JPEG_IDCT_COS = None


def _jpeg_idct_block(coef: list[int]) -> list[int]:
    """8x8 inverse DCT (T.81 A.3.3) + level shift + clamp → 64 raster
    pixels. DC-only blocks take the mathematically-exact constant path
    (IDCT of a lone DC coefficient is a constant block) — an identity,
    not an approximation — which is what keeps constant-block fixtures
    bit-exact and mass decode fast; blocks with AC energy run the full
    separable float IDCT."""
    import math

    if not any(coef[1:]):
        v = round(coef[0] / 8.0) + 128
        v = 0 if v < 0 else 255 if v > 255 else v
        return [v] * 64
    global _JPEG_IDCT_COS
    if _JPEG_IDCT_COS is None:
        _JPEG_IDCT_COS = [
            [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
            for x in range(8)
        ]
    c = _JPEG_IDCT_COS
    half = [0.0] * 64  # rows: 1D IDCT over u for each v
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for v in range(8):
        row = coef[v * 8 : v * 8 + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = inv_sqrt2 if u == 0 else 1.0
                s += cu * row[u] * c[x][u]
            half[v * 8 + x] = s / 2.0
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                cv = inv_sqrt2 if v == 0 else 1.0
                s += cv * half[v * 8 + x] * c[y][v]
            p = round(s / 2.0) + 128
            out[y * 8 + x] = 0 if p < 0 else 255 if p > 255 else p
    return out


def _jpeg_dqt_body(quant: list[int]) -> bytes:
    """DQT body for a raster-order quant table: zig-zag reorder plus the
    right precision flag (Pq=1 16-bit big-endian when any step > 255 —
    the encoder mirror of _jpeg_parse_dqt's dual-precision read)."""
    import struct

    qz = [quant[zi] for zi in _JPEG_ZIGZAG]
    if max(qz) > 255:  # precision flag rides the HIGH nibble: Pq<<4 | Tq
        return b"\x10" + b"".join(struct.pack(">H", v) for v in qz)
    return b"\x00" + bytes(qz)


def _jpeg_parse_dqt(body: bytes, quant: dict) -> None:
    """DQT segment → quant[table_id] = 64 zig-zag-order steps; both
    precisions (Pq=0: 8-bit, Pq=1: 16-bit big-endian — used by
    high-quality/low-loss encoders whose steps exceed 255).
    Length-checked per the decoders' ValueError contract."""
    b = 0
    while b < len(body):
        pq, tq = body[b] >> 4, body[b] & 0x0F
        if pq not in (0, 1):
            raise ValueError("jpeg: invalid DQT precision")
        step = 1 + pq
        if b + 1 + 64 * step > len(body):
            raise ValueError("jpeg: truncated DQT segment")
        if pq == 0:
            quant[tq] = list(body[b + 1 : b + 65])
        else:
            quant[tq] = [
                (body[b + 1 + 2 * i] << 8) | body[b + 2 + 2 * i]
                for i in range(64)
            ]
        b += 1 + 64 * step


def _jpeg_parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """DHT segment → decoder tables. Length-checked per the contract."""
    b = 0
    while b < len(body):
        if b + 17 > len(body):
            raise ValueError("jpeg: truncated DHT segment")
        tc, th = body[b] >> 4, body[b] & 0x0F
        bits = list(body[b + 1 : b + 17])
        n = sum(bits)
        if b + 17 + n > len(body):
            raise ValueError("jpeg: truncated DHT segment")
        vals = list(body[b + 17 : b + 17 + n])
        (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_decode_table(bits, vals)
        b += 17 + n


def _jpeg_parse_sof(body: bytes) -> tuple:
    """SOF frame header → (height, width, comps) with the decoders'
    length/validity checks; shared by the SOF0/1 and SOF2 branches."""
    import struct

    if len(body) < 6:
        raise ValueError("jpeg: truncated SOF segment")
    _prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
    if len(body) < 6 + 3 * nc:
        raise ValueError("jpeg: truncated SOF segment")
    comps = []
    for i in range(nc):
        cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
        comps.append((cid, hv >> 4, hv & 0x0F, tq))
    if any(not (1 <= h <= 4 and 1 <= v <= 4) for _, h, v, _ in comps):
        raise ValueError("jpeg: invalid sampling factors")
    return height, width, comps


#: fast-path switch, monkeypatchable in tests to force the pure loop
#: (test_jpeg_fast_path_bit_exact A/Bs the two against each other).
_JPEG_FAST = True


def _jpeg_luma_millis(payload: bytes) -> list[int]:
    """Decoded BT.601 luma millis in raster order, as a Python list —
    the shared plane contract of every image decoder here. Thin shim
    over :func:`_jpeg_luma_impl` (which hands back a numpy array when
    the vectorized path ran)."""
    out = _jpeg_luma_impl(payload)
    return out if isinstance(out, list) else out.tolist()


def _jpeg_luma_array(payload: bytes):
    """Same decode as :func:`_jpeg_luma_millis` but returned as an
    int64 numpy array WITHOUT the list round-trip — the zero-copy
    surface for statistics consumers (``video_frame_stats`` sums ~2k
    values per frame; converting to a list only to re-vectorize would
    dominate the fast decode). Requires numpy."""
    out = _jpeg_luma_impl(payload)
    return np.asarray(out, dtype=np.int64) if isinstance(out, list) else out


def _jpeg_luma_impl(payload: bytes):
    """REAL pixel decode for JPEG in pure Python: marker walk
    (DQT/DHT/SOF/DRI/SOS), canonical Huffman tables built from the
    file's own DHT segments, MSB-first entropy decode with byte
    unstuffing and restart-marker handling, DC prediction,
    dequantization, zig-zag reorder and 8x8 inverse DCT. Baseline
    sequential (SOF0/1) decodes here; progressive (SOF2) hands off to
    :func:`_jpeg_decode_progressive` at the first SOS. Emits BT.601
    luma millis in RASTER order (the shared plane contract of every
    image decoder here — layout consumers like the dHash depend on
    it): grayscale → 1000·pixel; interleaved YCbCr → 1000·Y
    (JPEG's Y component IS BT.601 luma — chroma never contributes to
    it, so Cb/Cr blocks are entropy-decoded to advance the stream and
    discarded)."""
    import struct

    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None  # list of (comp_id, h, v, tq)
    width = height = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        _need(payload, pos + 2, seglen, "jpeg")
        body = payload[pos + 4 : pos + 2 + seglen]
        # every fixed-layout read below is length-checked first so a
        # truncated/corrupt segment raises the decoders' ValueError
        # contract, never a raw struct.error/IndexError (r7 review —
        # same contract _need enforces for GIF/PNG)
        if marker == 0xDB:  # DQT
            _jpeg_parse_dqt(body, quant)
        elif marker == 0xC4:  # DHT
            _jpeg_parse_dht(body, huff_dc, huff_ac)
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline sequential
            height, width, comps = _jpeg_parse_sof(body)
        elif marker == 0xC2:  # SOF2: progressive — same frame header layout
            height, width, comps = _jpeg_parse_sof(body)
            # multi-scan coefficient accumulation path — hands the walk
            # over at the FIRST SOS and consumes every scan itself
            return _jpeg_decode_progressive(
                payload, pos + 2 + seglen, quant, huff_dc, huff_ac,
                comps, height, width, restart_interval,
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS: entropy data follows
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("jpeg: truncated SOS segment")
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan is None or not scan:
        raise ValueError("jpeg: missing SOF/SOS")
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    for cid, td, ta in scan:
        if cid not in by_id:
            raise ValueError(f"jpeg: SOS component {cid} not declared in SOF")
        if by_id[cid][2] not in quant or td not in huff_dc or ta not in huff_ac:
            raise ValueError("jpeg: scan references a missing DQT/DHT table")
    # interleaved MCU geometry (T.81 A.2.3): the MCU spans 8·Hmax ×
    # 8·Vmax luma pixels; each scan component contributes h×v blocks per
    # MCU in raster order. Covers grayscale, 4:4:4, 4:2:2 and 4:2:0 —
    # luma stats only need the Y blocks, so chroma blocks are entropy-
    # decoded (to advance the stream) and discarded, never upsampled.
    h_max = max(h for _, h, _, _ in comps)
    v_max = max(v for _, _, v, _ in comps)
    luma_cid = scan[0][0]  # grayscale: the only component; YCbCr: Y first
    if by_id[luma_cid][0] != h_max or by_id[luma_cid][1] != v_max:
        raise NotImplementedError(
            "jpeg: luma subsampled below another component"
        )
    mcus_x = (width + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (height + 8 * v_max - 1) // (8 * v_max)
    geom = (payload, pos, scan, by_id, quant, huff_dc, huff_ac,
            width, height, restart_interval, h_max, v_max, luma_cid,
            mcus_x, mcus_y)
    if _JPEG_FAST and np is not None:
        return _jpeg_decode_baseline_fast(*geom)
    return _jpeg_decode_baseline_pure(*geom)


def _jpeg_decode_baseline_pure(
    payload, pos, scan, by_id, quant, huff_dc, huff_ac,
    width, height, restart_interval, h_max, v_max, luma_cid,
    mcus_x, mcus_y,
) -> list[int]:
    """Reference baseline-scan decode: bit-by-bit reader, per-block
    IDCT. The fast path below is pinned bit-exact against this loop
    (test_jpeg_fast_path_bit_exact); it also serves as the no-numpy
    fallback."""
    reader = _JpegBitReader(payload, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    # RASTER order output — the shared luma-plane contract of every
    # decoder (_bmp/_png/_gif_luma_millis), which layout consumers like
    # _image_dhash_bits rely on. (Pre-r9 this appended block by block;
    # the order-agnostic histogram/stat consumers never noticed.)
    lumas: list[int] = [0] * (width * height)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # byte-align and consume the RSTn marker, reset predictors
                reader.nbits = 0
                _need(payload, reader.pos, 2, "jpeg")
                if payload[reader.pos] != 0xFF or not (
                    0xD0 <= payload[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("jpeg: expected restart marker")
                reader.pos += 2
                pred = {cid: 0 for cid, _, _ in scan}
            n_mcu += 1
            for cid, td, ta in scan:
                ch, cv, tq = by_id[cid]
                q = quant[tq]
                for byi in range(cv):
                    for bxi in range(ch):
                        s = reader.read_huffman(huff_dc[td])
                        if s > 16:
                            # only a corrupt DHT maps a symbol here (T.81
                            # caps DC size categories at 11 for 8-bit) —
                            # fail loud, identically to the fast path
                            raise ValueError("jpeg: invalid DC size category")
                        diff = _jpeg_extend(reader.read_bits(s), s)
                        pred[cid] += diff
                        zz = [0] * 64
                        zz[0] = pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.read_huffman(huff_ac[ta])
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC run past block end")
                            zz[k] = (
                                _jpeg_extend(reader.read_bits(size), size) * q[k]
                            )
                            k += 1
                        if cid != luma_cid:
                            continue  # chroma: stream advanced; luma-irrelevant
                        coef = [0] * 64
                        for i, zi in enumerate(_JPEG_ZIGZAG):
                            coef[zi] = zz[i]
                        block = _jpeg_idct_block(coef)
                        # clip edge blocks to the true image bounds
                        y0 = (my * v_max + byi) * 8
                        x0 = (mx * h_max + bxi) * 8
                        for yy in range(8):
                            if y0 + yy >= height:
                                break
                            for xx in range(8):
                                if x0 + xx >= width:
                                    break
                                lumas[(y0 + yy) * width + x0 + xx] = (
                                    1000 * block[yy * 8 + xx]
                                )
    return lumas


def _jpeg_decode_baseline_fast(
    payload, pos, scan, by_id, quant, huff_dc, huff_ac,
    width, height, restart_interval, h_max, v_max, luma_cid,
    mcus_x, mcus_y,
):
    """Vectorized baseline-scan decode (r10), bit-identical to
    :func:`_jpeg_decode_baseline_pure` and ~10× faster. Three levers:

    1. the entropy bytes are unstuffed ONCE up front with a C-speed
       ``bytes.find`` scan (restart-marker offsets recorded) instead of
       per-bit 0xFF checks;
    2. Huffman symbols resolve through the 16-bit peek LUT
       (:func:`_jpeg_lut`) — one list index + one ``int.from_bytes``
       over a 4-byte window replaces up to 16 bit-by-bit tree probes;
    3. luma blocks' dequantized coefficients accumulate into ONE numpy
       batch whose IDCT runs vectorized over all blocks with the pure
       loop's accumulation order preserved term-for-term — elementwise
       IEEE-754 float64 ops applied in the same sequence produce the
       same bits, so fast ≡ pure exactly (pinned by
       ``test_jpeg_fast_path_bit_exact``), and DC-only blocks keep the
       pure path's mathematically-exact constant shortcut.

    Chroma blocks are entropy-decoded to advance the stream but never
    materialized (the pure loop builds then discards them). Corrupt
    streams raise the same ``ValueError`` contract; the one granularity
    difference is an out-of-place restart marker, which the pure reader
    trips over at the exact byte while this path detects it at the next
    MCU boundary (still ``ValueError``, ≤ one MCU later).

    Returns the luma plane as a 1-D int64 numpy array of luma millis in
    raster order (``_jpeg_luma_millis`` list-ifies it; the array
    surface is ``_jpeg_luma_array``)."""
    # --- prescan: unstuff FF00, record restart-marker byte offsets ---
    out = bytearray()
    rst: list[int] = []  # offsets in `data` where an RST marker sat
    end_at_marker = False
    i, n = pos, len(payload)
    while True:
        j = payload.find(b"\xff", i)
        if j < 0:
            out += payload[i:]
            break
        out += payload[i:j]
        if j + 1 >= n:
            # lone trailing FF: the pure reader needs the byte AFTER it
            # to classify the FF and raises 'truncated' — dropping the
            # byte makes any read that needs it hit the same error
            break
        nxt = payload[j + 1]
        if nxt == 0x00:
            out.append(0xFF)
            i = j + 2
        elif restart_interval and 0xD0 <= nxt <= 0xD7:
            rst.append(len(out))
            i = j + 2
        else:
            end_at_marker = True
            break
    data = bytes(out)
    nbits = 8 * len(data)
    data_pad = data + b"\x00\x00\x00\x00"  # peek window never IndexErrors
    overrun_msg = (
        "jpeg: marker inside entropy stream" if end_at_marker
        else "jpeg: truncated entropy stream"
    )
    from_bytes = int.from_bytes  # hot-loop local bind
    dc_lut = {td: _jpeg_lut(huff_dc[td]) for _, td, _ in scan}
    ac_lut = {ta: _jpeg_lut(huff_ac[ta]) for _, _, ta in scan}
    pred = {cid: 0 for cid, _, _ in scan}
    blocks: list[list[int]] = []  # luma-only dequantized zig-zag coefs
    origins: list[tuple[int, int]] = []
    bitpos = 0
    ri = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bitpos = (bitpos + 7) & ~7  # byte-align (pad bits dropped)
                if ri >= len(rst) or rst[ri] != bitpos >> 3:
                    raise ValueError("jpeg: expected restart marker")
                ri += 1
                pred = {cid: 0 for cid, _, _ in scan}
            elif ri < len(rst) and bitpos > rst[ri] * 8:
                # an RST sat mid-data where no restart was due — the
                # prescan spliced it out, so detect the crossing here
                raise ValueError("jpeg: marker inside entropy stream")
            n_mcu += 1
            for cid, td, ta in scan:
                ch, cv, tq = by_id[cid]
                is_luma = cid == luma_cid
                q = quant[tq]
                dlut = dc_lut[td]
                alut = ac_lut[ta]
                for byi in range(cv):
                    for bxi in range(ch):
                        b = bitpos >> 3
                        word = from_bytes(data_pad[b:b + 4], "big")
                        e = dlut[(word >> (16 - (bitpos & 7))) & 0xFFFF]
                        if not e:
                            if bitpos + 16 > nbits:
                                raise ValueError(overrun_msg)
                            raise ValueError("jpeg: invalid Huffman code")
                        size = e & 0xFF
                        if size > 16:
                            raise ValueError("jpeg: invalid DC size category")
                        bitpos += e >> 8
                        if bitpos + size > nbits:
                            raise ValueError(overrun_msg)
                        if size:
                            b = bitpos >> 3
                            word = from_bytes(data_pad[b:b + 4], "big")
                            mag = (word >> (32 - (bitpos & 7) - size)) & (
                                (1 << size) - 1
                            )
                            bitpos += size
                            pred[cid] += (
                                mag if mag >= 1 << (size - 1)
                                else mag - (1 << size) + 1
                            )
                        if is_luma:
                            zz = [0] * 64
                            zz[0] = pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            b = bitpos >> 3
                            word = from_bytes(data_pad[b:b + 4], "big")
                            e = alut[(word >> (16 - (bitpos & 7))) & 0xFFFF]
                            if not e:
                                if bitpos + 16 > nbits:
                                    raise ValueError(overrun_msg)
                                raise ValueError("jpeg: invalid Huffman code")
                            rs = e & 0xFF
                            bitpos += e >> 8
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if bitpos > nbits:
                                    raise ValueError(overrun_msg)
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            if bitpos + size > nbits:
                                raise ValueError(overrun_msg)
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC run past block end")
                            b = bitpos >> 3
                            word = from_bytes(data_pad[b:b + 4], "big")
                            mag = (word >> (32 - (bitpos & 7) - size)) & (
                                (1 << size) - 1
                            )
                            bitpos += size
                            if is_luma:
                                zz[k] = (
                                    mag if mag >= 1 << (size - 1)
                                    else mag - (1 << size) + 1
                                ) * q[k]
                            k += 1
                        if is_luma:
                            blocks.append(zz)
                            origins.append(
                                ((my * v_max + byi) * 8, (mx * h_max + bxi) * 8)
                            )
    if ri < len(rst) and bitpos > rst[ri] * 8:
        # a spliced-out RST was crossed inside the FINAL MCU (no next
        # boundary check runs) — the pure reader raises at that byte
        raise ValueError("jpeg: marker inside entropy stream")
    return _jpeg_idct_batch(
        blocks, origins, width, height, h_max, v_max, mcus_x, mcus_y
    )


def _jpeg_idct_batch(blocks, origins, width, height, h_max, v_max,
                     mcus_x, mcus_y):
    """Batched 8×8 inverse DCT over all of a frame's luma blocks at
    once, preserving :func:`_jpeg_idct_block`'s float accumulation
    order term-for-term (same IEEE ops in the same sequence → identical
    bits): the scalar per-(x,u) loops become elementwise ops over the
    block axis, DC-only blocks take the same exact constant path, and
    ``np.rint`` matches Python ``round``'s half-even. Returns the
    raster plane as a flat int64 luma-millis array."""
    import math

    if not blocks:
        return np.zeros(width * height, dtype=np.int64)
    global _JPEG_IDCT_COS
    if _JPEG_IDCT_COS is None:
        _JPEG_IDCT_COS = [
            [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
            for x in range(8)
        ]
    c = _JPEG_IDCT_COS
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    zz_arr = np.asarray(blocks, dtype=np.int64)  # (N, 64) zig-zag order
    coef = np.zeros((len(blocks), 64), dtype=np.float64)
    coef[:, _JPEG_ZIGZAG] = zz_arr  # zig-zag → raster (pure: coef[zi] = zz[i])
    ac_any = (zz_arr[:, 1:] != 0).any(axis=1)
    pix = np.empty((len(blocks), 8, 8), dtype=np.int64)
    if not ac_any.all():
        # DC-only: the pure decoder's mathematically-exact constant path
        v = np.rint(coef[~ac_any, 0] / 8.0).astype(np.int64) + 128
        np.clip(v, 0, 255, out=v)
        pix[~ac_any] = v[:, None, None]
    if ac_any.any():
        co = coef[ac_any].reshape(-1, 8, 8)  # [n, v, u]
        m = co.shape[0]
        half = np.empty((m, 8, 8))  # [n, v, x]
        for x in range(8):
            s = np.zeros((m, 8))
            for u in range(8):
                cu = inv_sqrt2 if u == 0 else 1.0
                s += (cu * co[:, :, u]) * c[x][u]
            half[:, :, x] = s / 2.0
        outp = np.empty((m, 8, 8))  # [n, y, x]
        for y in range(8):
            s = np.zeros((m, 8))
            for v2 in range(8):
                cv = inv_sqrt2 if v2 == 0 else 1.0
                s += (cv * half[:, v2, :]) * c[y][v2]
            outp[:, y, :] = s / 2.0
        p = np.rint(outp).astype(np.int64) + 128
        np.clip(p, 0, 255, out=p)
        pix[ac_any] = p
    plane = np.zeros((mcus_y * v_max * 8, mcus_x * h_max * 8), dtype=np.int64)
    for idx in range(len(origins)):
        y0, x0 = origins[idx]
        plane[y0:y0 + 8, x0:x0 + 8] = pix[idx]
    return (plane[:height, :width] * 1000).ravel()


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF stuffing (the encoder mirror)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)
                self.cur = 0
                self.nbits = 0

    def pad(self) -> None:
        """1-pad to a byte boundary (before restart markers / at EOI)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


#: forward-DCT results for CONSTANT blocks, keyed by the pixel value
#: (≤ 256 entries). Every fixture synthesizer emits constant-block
#: grids, so this cache removes ~75 % of their encode cost; the cached
#: list is the pure FDCT's own output for that value (computed once),
#: so the fast path is bit-identical by construction, not by argument.
#: Entries are returned by reference — callers treat coefficients as
#: read-only (they only index into them to quantize).
_JPEG_FDCT_CONST_CACHE: dict[int, list[float]] = {}


def _jpeg_fdct_block(pixels: list[int]) -> list[float]:
    """8x8 forward DCT (T.81 A.3.3) over level-shifted raster pixels.
    Constant blocks (all 64 pixels equal — every byte-grid fixture
    block) hit a per-value cache of the full FDCT's own result."""
    p0 = pixels[0]
    if pixels.count(p0) == 64:
        got = _JPEG_FDCT_CONST_CACHE.get(p0)
        if got is None:
            got = _JPEG_FDCT_CONST_CACHE[p0] = _jpeg_fdct_block_full(pixels)
        return got
    return _jpeg_fdct_block_full(pixels)


def _jpeg_fdct_block_full(pixels: list[int]) -> list[float]:
    """The unconditional FDCT loop backing :func:`_jpeg_fdct_block`."""
    import math

    global _JPEG_IDCT_COS
    if _JPEG_IDCT_COS is None:
        _JPEG_IDCT_COS = [
            [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
            for x in range(8)
        ]
    c = _JPEG_IDCT_COS
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    shifted = [p - 128 for p in pixels]
    half = [0.0] * 64  # 1D over x for each row y, output indexed [y][u]
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += shifted[y * 8 + x] * c[x][u]
            half[y * 8 + u] = s
    out = [0.0] * 64
    for u in range(8):
        cu = inv_sqrt2 if u == 0 else 1.0
        for v in range(8):
            cv = inv_sqrt2 if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                s += half[y * 8 + u] * c[y][v]
            out[v * 8 + u] = s * cu * cv / 4.0
    return out


def _jpeg_encode_gray(
    pixels: bytes, width: int, height: int, quant: list[int],
    restart_interval: int = 0,
) -> bytes:
    """REAL baseline JPEG encoder for 8-bit grayscale (fixture role,
    like ``_gif_lzw_encode``): forward DCT, quantization against
    ``quant`` (raster order), zig-zag, canonical Annex-K Huffman with
    DC prediction / AC run-length / EOB, byte stuffing, and optional
    DRI/RSTn restart markers (byte-aligned, predictors reset — so the
    decoder's restart path is exercised on real data too). The decoder
    chews actual entropy-coded DCT data, not a bypass."""
    import struct

    if width % 8 or height % 8:
        raise ValueError("fixture encoder wants multiple-of-8 dimensions")
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    n_mcu = 0
    # per-call memo: 64 raw pixel bytes → quantized zig-zag coefficients.
    # FDCT + quantization depend only on the block content, so repeated
    # blocks (every byte-grid fixture: one constant block per byte value)
    # pay them once; only DC prediction + entropy coding run per block.
    zz_memo: dict[bytes, list[int]] = {}
    for my in range(height // 8):
        for mx in range(width // 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.pad()
                w.out.append(0xFF)
                w.out.append(0xD0 + ((n_mcu // restart_interval - 1) % 8))
                pred = 0
            n_mcu += 1
            base = (my * 8) * width + mx * 8
            block = b"".join(
                pixels[base + yy * width : base + yy * width + 8]
                for yy in range(8)
            )
            zz = zz_memo.get(block)
            if zz is None:
                coef = _jpeg_fdct_block(list(block))
                zz = zz_memo[block] = [
                    int(round(coef[zi] / quant[zi])) for zi in _JPEG_ZIGZAG
                ]
            diff = zz[0] - pred
            pred = zz[0]
            s = diff if diff >= 0 else -diff
            size = s.bit_length()
            w.write(*dc_codes[size])
            if size:
                w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    w.write(*ac_codes[0xF0])  # ZRL
                    run -= 16
                v = zz[k]
                s = v if v >= 0 else -v
                size = s.bit_length()
                w.write(*ac_codes[(run << 4) | size])
                w.write(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if run:
                w.write(*ac_codes[0x00])  # EOB
    data = w.flush()
    return _jpeg_gray_header(width, height, quant, restart_interval) \
        + data + b"\xff\xd9"


def _jpeg_gray_header(width: int, height: int, quant: list[int],
                      restart_interval: int = 0) -> bytes:
    """SOI..SOS prefix of the grayscale baseline encoder — a pure
    function of (width, height, quant, restart_interval), shared by the
    generic per-block encoder above and the constant-block fast path
    below (which caches it per geometry)."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, _jpeg_dqt_body(quant))
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + dht + sof + dri + sos


#: fixture quant table: DC step 8 divides every constant block's DC
#: coefficient 8·(v − 128) exactly, so constant blocks round-trip
#: bit-exactly; AC steps are the Annex-K-ish 16 (they only matter for
#: non-constant pytest images, where the roundtrip is lossy as JPEG is)
_JPEG_FIXTURE_QUANT = [8] + [16] * 63

#: blocks per row in the synthesized fixture grid (image width 256 px)
_JPEG_BLOCKS_PER_ROW = 32

#: entropy piece per DC diff for CONSTANT-block fixture frames under
#: _JPEG_FIXTURE_QUANT: diff+255 -> (codebits, nbits) covering the
#: block's whole entropy contribution (DC Huffman code + magnitude bits
#: + EOB — a constant block has no AC coefficients). 511 entries, built
#: lazily once per process.
_JPEG_CONST_PIECES: list[tuple[int, int]] | None = None

#: cached SOI..SOS prefix per (width, height) — the fixture header is a
#: pure function of geometry (quant fixed, no restart markers)
_JPEG_CONST_HEADERS: dict[tuple[int, int], bytes] = {}


def _jpeg_const_pieces() -> list[tuple[int, int]]:
    global _JPEG_CONST_PIECES
    if _JPEG_CONST_PIECES is None:
        dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
        ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
        eob, eob_len = ac_codes[0x00]
        pieces = []
        for diff in range(-255, 256):
            s = abs(diff).bit_length()
            code, ln = dc_codes[s]
            if s:
                mag = diff if diff >= 0 else diff + (1 << s) - 1
                code = (code << s) | mag
                ln += s
            pieces.append(((code << eob_len) | eob, ln + eob_len))
        _JPEG_CONST_PIECES = pieces
    return _JPEG_CONST_PIECES


def _jpeg_encode_gray_const_blocks(vals: bytes, width: int,
                                   height: int) -> bytes:
    """Bit-identical fast path of :func:`_jpeg_encode_gray` for the one
    shape every byte-grid fixture emits: a grid of CONSTANT 8x8 blocks
    (one byte value per block, raster order, ``_JPEG_FIXTURE_QUANT``,
    no restart markers). A constant block's FDCT has a single nonzero
    coefficient, DC = 8·(v−128), which the fixture DC step 8 divides
    exactly, so the quantized block is [v−128, 0…0] and the entropy
    stream is a function of successive block-value diffs alone: one
    511-entry (code, length) table replaces FDCT + quantize + Huffman
    per block, bit assembly is a running big-int shift, stuffing is a
    single ``bytes.replace``, and the header is cached per geometry.
    Equivalence with the real encoder is pinned by
    ``test_jpeg_const_block_fast_path_bit_exact`` (every byte value,
    random rows, multi-row grids, 0xFF-stuffing cases)."""
    if len(vals) != (width // 8) * (height // 8):
        raise ValueError("const-block fast path: vals/geometry mismatch")
    pieces = _jpeg_const_pieces()
    header = _JPEG_CONST_HEADERS.get((width, height))
    if header is None:
        header = _JPEG_CONST_HEADERS[(width, height)] = _jpeg_gray_header(
            width, height, _JPEG_FIXTURE_QUANT
        )
    acc = 0
    total = 0
    prev = 128  # DC pred 0 ⇒ first diff = (v−128) − 0 = v − 128
    for v in vals:
        code, ln = pieces[v - prev + 255]
        acc = (acc << ln) | code
        total += ln
        prev = v
    pad = -total & 7
    if pad:  # 1-pad to a byte boundary, the writer's flush contract
        acc = (acc << pad) | ((1 << pad) - 1)
        total += pad
    data = acc.to_bytes(total >> 3, "big").replace(b"\xff", b"\xff\x00")
    return header + data + b"\xff\xd9"


def _synthesize_jpeg_grid(
    df: DataFrame, id_col: str, text_col: str, encode_fn,
    even_rows: bool = False, const_fn=None,
) -> DataFrame:
    """Shared fixture plumbing for every JPEG synthesizer: text bytes →
    the constant-8x8-block grayscale grid (32 blocks per row, constant-0
    padding blocks; ``even_rows`` pads block rows to an even count for
    16x16-MCU 4:2:0 geometry) → ``encode_fn(pixels, width, height)`` →
    (doc_id, payload) via one Arrow-batched mapInPandas. The grid
    contract lives HERE, once — the three public synthesizers differ
    only in the encoder (r7 review). ``const_fn(vals, width, height)``,
    when given, is a bit-identical encoder over the per-block byte
    values directly — the pixel grid is never materialized (the
    baseline encoder has such a fast path; 4:2:0 and progressive
    don't)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bpr = _JPEG_BLOCKS_PER_ROW
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                n_blocks = max(1, len(data))
                rows = -(-n_blocks // bpr)
                if even_rows:
                    rows += rows & 1
                padded = data.ljust(rows * bpr, b"\x00")
                width, height = bpr * 8, rows * 8
                if const_fn is not None:
                    payloads.append(const_fn(padded, width, height))
                    continue
                pix = bytearray(width * height)
                for bi, val in enumerate(padded):
                    by, bx = divmod(bi, bpr)
                    for yy in range(8):
                        base = (by * 8 + yy) * width + bx * 8
                        pix[base : base + 8] = bytes([val]) * 8
                payloads.append(encode_fn(bytes(pix), width, height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_jpeg_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL JPEG payloads from a text column: each UTF-8
    byte becomes one CONSTANT 8x8 block (value = the byte) laid out in a
    32-block-wide grid, genuinely encoded by the baseline encoder —
    forward DCT, quantization, canonical Huffman DC prediction, byte
    stuffing all run for real. Constant blocks survive quantization
    exactly (their only coefficient is DC = 8·(v−128), and the fixture
    DC step 8 divides it), so a SQL oracle can compute the decoded
    statistics from the text bytes: 64 pixels of value b per byte, plus
    constant-0 padding blocks to fill the last grid row (fixture role,
    like ``synthesize_gif_payload``)."""
    return _synthesize_jpeg_grid(
        df, id_col, text_col,
        lambda pix, w, h: _jpeg_encode_gray(pix, w, h, _JPEG_FIXTURE_QUANT),
        const_fn=_jpeg_encode_gray_const_blocks,
    )


def _jpeg_encode_ycbcr_neutral(
    pixels: bytes, width: int, height: int, quant: list[int],
    sampling: tuple[int, int] = (2, 2),
) -> bytes:
    """REAL interleaved 3-component baseline JPEG encoder with
    SUBSAMPLED chroma (4:2:0 via ``sampling=(2,2)``, 4:2:2 via (2,1)) —
    the dominant camera/web form — over a luma plane with NEUTRAL
    chroma (Cb = Cr = 128, i.e. zero after level shift, so every chroma
    block is DC-diff 0 + EOB and the decoded luma equals the grayscale
    case). Fixture role: the decoder's interleaved-MCU geometry (h×v
    luma blocks per MCU, per-component DC predictors, chroma blocks in
    the entropy stream) is exercised on real encoded data."""
    import struct

    hs, vs = sampling
    if width % (8 * hs) or height % (8 * vs):
        raise ValueError(
            f"fixture encoder wants dimensions divisible by {8*hs}x{8*vs}"
        )
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()

    def emit_block(zz: list[int], pred: int) -> int:
        diff = zz[0] - pred
        s = abs(diff).bit_length()
        w.write(*dc_codes[s])
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                w.write(*ac_codes[0xF0])
                run -= 16
            v = zz[k]
            s = abs(v).bit_length()
            w.write(*ac_codes[(run << 4) | s])
            w.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            w.write(*ac_codes[0x00])  # EOB
        return zz[0]

    pred = {1: 0, 2: 0, 3: 0}
    zz_memo: dict[bytes, list[int]] = {}  # same repeat-block memo as gray
    for my in range(height // (8 * vs)):
        for mx in range(width // (8 * hs)):
            for byi in range(vs):  # luma: hs x vs blocks per MCU
                for bxi in range(hs):
                    base = (my * vs * 8 + byi * 8) * width + mx * hs * 8 + bxi * 8
                    block = b"".join(
                        pixels[base + yy * width : base + yy * width + 8]
                        for yy in range(8)
                    )
                    zz = zz_memo.get(block)
                    if zz is None:
                        coef = _jpeg_fdct_block(list(block))
                        zz = zz_memo[block] = [
                            int(round(coef[zi] / quant[zi]))
                            for zi in _JPEG_ZIGZAG
                        ]
                    pred[1] = emit_block(zz, pred[1])
            for cid in (2, 3):  # neutral chroma: one zero block each
                pred[cid] = emit_block([0] * 64, pred[cid])
    data = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, _jpeg_dqt_body(quant))
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    sos = seg(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + dht + sof + sos + data + b"\xff\xd9"


def synthesize_jpeg420_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL 4:2:0 JPEG payloads from a text column — the
    chroma-subsampled variant of :func:`synthesize_jpeg_payload`: the
    same constant-8x8-block luma grid (block rows padded to an even
    count so the 16x16 MCU geometry divides evenly; pad blocks are
    constant 0) interleaved with neutral subsampled chroma by
    ``_jpeg_encode_ycbcr_neutral``. Exercises the decoder's per-MCU
    4-luma-block walk, per-component DC predictors and chroma-block
    skipping on real entropy-coded data, with the same exact
    byte-arithmetic oracle contract."""
    return _synthesize_jpeg_grid(
        df, id_col, text_col,
        lambda pix, w, h: _jpeg_encode_ycbcr_neutral(
            pix, w, h, _JPEG_FIXTURE_QUANT
        ),
        even_rows=True,  # 4:2:0 MCU = 2x2 blocks: even block rows
    )


def _jpeg_decode_progressive(
    payload: bytes,
    pos: int,
    quant: dict,
    huff_dc: dict,
    huff_ac: dict,
    comps: list,
    height: int,
    width: int,
    restart_interval: int,
) -> list[int]:
    """REAL progressive JPEG (SOF2) decode — T.81 annex G, the full
    thing: SPECTRAL SELECTION (each scan carries one Ss..Se coefficient
    band) and SUCCESSIVE APPROXIMATION (first scans deliver coefficient
    bits above Al; refinement scans append one bit of precision each,
    with the G.1.2.3 correction-bit protocol for already-nonzero
    coefficients), EOB-run coding across blocks, interleaved DC scans /
    per-component AC scans, DHT/DQT/DRI redefinition between scans, and
    restart markers inside scans. Quantized coefficients accumulate
    across scans per block; dequantization + IDCT run once at the end,
    so a fully-transmitted progressive file decodes to EXACTLY the
    pixels of the sequential encoding of the same coefficients (pinned
    in tests). Called by :func:`_jpeg_luma_millis` at the first SOS of
    a SOF2 frame; returns luma millis in block-raster order."""
    import struct

    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    h_max = max(h for _, h, _, _ in comps)
    v_max = max(v for _, _, v, _ in comps)
    luma_cid = comps[0][0]
    if by_id[luma_cid][0] != h_max or by_id[luma_cid][1] != v_max:
        raise NotImplementedError("jpeg: luma subsampled below another component")
    mcus_x = (width + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (height + 8 * v_max - 1) // (8 * v_max)
    # per-component coefficient store (zig-zag order, QUANTIZED — the
    # successive-approximation arithmetic operates pre-dequant), indexed
    # on the PADDED interleaved grid so interleaved DC scans and
    # non-interleaved AC scans address the same blocks
    stride = {}
    blocks: dict[int, list[list[int]]] = {}
    nblk = {}
    for cid, h, v, tq in comps:
        stride[cid] = mcus_x * h
        blocks[cid] = [[0] * 64 for _ in range(mcus_x * h * mcus_y * v)]
        # true (non-interleaved) block dims: ceil(ceil(dim·f/f_max)/8)
        cw = -(-width * h // h_max)
        ch_ = -(-height * v // v_max)
        nblk[cid] = (-(-cw // 8), -(-ch_ // 8))  # (blocks_x, blocks_y)

    def decode_scan(scomps, ss, se, ah, al, pos):
        reader = _JpegBitReader(payload, pos)
        pred = {cid: 0 for cid, _, _ in scomps}
        eobrun = 0
        p1 = 1 << al
        n_unit = 0

        def maybe_restart(n_unit):
            if restart_interval and n_unit and n_unit % restart_interval == 0:
                reader.nbits = 0
                _need(payload, reader.pos, 2, "jpeg")
                if payload[reader.pos] != 0xFF or not (
                    0xD0 <= payload[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("jpeg: expected restart marker")
                reader.pos += 2
                for c in pred:
                    pred[c] = 0
                return 0  # eobrun resets at restart
            return None

        def refine_one(blk, k):
            if reader.read_bit():
                if not (abs(blk[k]) & p1):
                    blk[k] += p1 if blk[k] > 0 else -p1

        def dc_unit(cid, td, blk):
            if ah == 0:  # first DC scan: point-transformed diffs
                s = reader.read_huffman(huff_dc[td])
                diff = _jpeg_extend(reader.read_bits(s), s)
                pred[cid] += diff
                blk[0] = pred[cid] * p1
            else:  # refinement: one appended bit (bitwise OR, T.81 G.1.2.1)
                if reader.read_bit():
                    blk[0] |= p1

        def ac_unit(ta, blk):
            nonlocal eobrun
            if ah == 0:  # first AC scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    return
                k = ss
                while k <= se:
                    rs = reader.read_huffman(huff_ac[ta])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            return
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC run past band end")
                    blk[k] = _jpeg_extend(reader.read_bits(s), s) * p1
                    k += 1
                return
            # refinement AC scan (T.81 G.1.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.read_huffman(huff_ac[ta])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("jpeg: bad refinement magnitude")
                        val = p1 if reader.read_bit() else -p1
                    while k <= se:
                        if blk[k] != 0:
                            refine_one(blk, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:  # correction bits for the EOB-run block
                    if blk[k] != 0:
                        refine_one(blk, k)
                    k += 1
                eobrun -= 1

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("jpeg: DC scan with nonzero Se")
            # T.81 A.2: a scan is interleaved iff it carries >1 component;
            # a single-component scan walks that component's own block
            # grid even in a multi-component frame
            if len(scomps) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        r = maybe_restart(n_unit)
                        if r is not None:
                            eobrun = r
                        n_unit += 1
                        for cid, td, _ta in scomps:
                            ch, cv, _tq = by_id[cid]
                            for byi in range(cv):
                                for bxi in range(ch):
                                    idx = (my * cv + byi) * stride[cid] + (
                                        mx * ch + bxi
                                    )
                                    dc_unit(cid, td, blocks[cid][idx])
            else:  # single-component frame: non-interleaved geometry
                cid, td, _ta = scomps[0]
                bx, by = nblk[cid]
                for r_ in range(by):
                    for c_ in range(bx):
                        rr = maybe_restart(n_unit)
                        if rr is not None:
                            eobrun = rr
                        n_unit += 1
                        dc_unit(cid, td, blocks[cid][r_ * stride[cid] + c_])
        else:  # AC scan: always single-component, non-interleaved
            if len(scomps) != 1:
                raise ValueError("jpeg: interleaved AC scan")
            cid, _td, ta = scomps[0]
            bx, by = nblk[cid]
            for r_ in range(by):
                for c_ in range(bx):
                    rr = maybe_restart(n_unit)
                    if rr is not None:
                        eobrun = rr
                    n_unit += 1
                    ac_unit(ta, blocks[cid][r_ * stride[cid] + c_])
        # byte-align and hand back the position of the next marker
        return reader.pos

    # scan-at-a-time marker walk: DHT/DQT/DRI may be redefined between scans
    n_scans = 0
    nonlocal_restart = restart_interval
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        _need(payload, pos + 2, 2, "jpeg")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        _need(payload, pos + 2, seglen, "jpeg")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            _jpeg_parse_dqt(body, quant)
        elif marker == 0xC4:
            _jpeg_parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            (nonlocal_restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if not body or len(body) < 4 + 2 * body[0]:
                raise ValueError("jpeg: truncated SOS segment")
            ns = body[0]
            scomps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            for cid, td, ta in scomps:
                if cid not in by_id:
                    raise ValueError(f"jpeg: SOS component {cid} not in SOF")
                if ss == 0 and ah == 0 and td not in huff_dc:
                    raise ValueError("jpeg: scan references a missing DHT")
                if ss > 0 and ta not in huff_ac:
                    raise ValueError("jpeg: scan references a missing DHT")
            restart_interval = nonlocal_restart
            pos = decode_scan(scomps, ss, se, ah, al, pos + 2 + seglen)
            n_scans += 1
            continue
        pos += 2 + seglen

    if n_scans == 0:
        # zero scans would "decode" to fabricated mid-gray pixels — the
        # same missing-SOS contract the sequential path enforces (r7
        # review). Fewer-than-encoded scans is NOT detectable (any scan
        # count is valid progressive JPEG — partial files render), but a
        # scan-less frame is unambiguously corrupt.
        raise ValueError("jpeg: missing SOF/SOS")
    # all scans in: dequantize, reorder, IDCT — luma only
    q = quant.get(by_id[luma_cid][2])
    if q is None:
        raise ValueError("jpeg: missing quant table")
    lumas: list[int] = [0] * (width * height)  # raster order (r9 contract)
    bx, by = nblk[luma_cid]
    for r_ in range(by):
        for c_ in range(bx):
            zz = blocks[luma_cid][r_ * stride[luma_cid] + c_]
            coef = [0] * 64
            for i, zi in enumerate(_JPEG_ZIGZAG):
                coef[zi] = zz[i] * q[i]
            block = _jpeg_idct_block(coef)
            y0, x0 = r_ * 8, c_ * 8
            for yy in range(8):
                if y0 + yy >= height:
                    break
                for xx in range(8):
                    if x0 + xx >= width:
                        break
                    lumas[(y0 + yy) * width + x0 + xx] = (
                        1000 * block[yy * 8 + xx]
                    )
    return lumas


#: AC Huffman spec for the progressive encoder: the Annex-K baseline
#: table has no EOBn run-length symbols (0x10..0xE0 — progressive-only
#: codes), so progressive scans ship their own flat 8-bit table covering
#: every symbol annex G can emit: (r<<4)|s for s 1..10, EOB0..EOB14, ZRL.
#: 176 symbols at length 8 is canonical-valid (no all-ones code).
_JPEG_PROG_AC_VALS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [n << 4 for n in range(15)]
    + [0xF0]
)
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_JPEG_PROG_AC_VALS),
                      0, 0, 0, 0, 0, 0, 0, 0]

#: default progressive scan script (grayscale): DC with one level of
#: successive approximation, AC split into two spectral bands at Al=2,
#: then two full-band refinement passes — exercises every annex-G code
#: path (spectral selection, EOB runs, ZRL-in-refinement, correction
#: bits, newly-significant insertion)
_JPEG_PROG_SCANS = [
    (0, 0, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (1, 63, 1, 0),
]


def _jpeg_encode_gray_progressive(
    pixels: bytes, width: int, height: int, quant: list[int],
    scans: list | None = None,
) -> bytes:
    """REAL progressive (SOF2) JPEG encoder for 8-bit grayscale —
    the fixture counterpart of :func:`_jpeg_decode_progressive`,
    implementing T.81 annex G encoding: per-scan spectral bands,
    successive-approximation point transforms, EOB-run accumulation
    with buffered correction bits (the G.1.2.3 encoder side), ZRL
    emission bounded by the last newly-significant index. The quantized
    coefficients are identical to what :func:`_jpeg_encode_gray`
    produces, so progressive and sequential encodings of the same
    pixels must decode to IDENTICAL pixels — the equivalence tests pin
    exactly that."""
    import struct

    if width % 8 or height % 8:
        raise ValueError("fixture encoder wants multiple-of-8 dimensions")
    scans = _JPEG_PROG_SCANS if scans is None else scans
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
    # quantized zig-zag coefficient blocks, raster block order
    zz_blocks = []
    zz_memo: dict[bytes, list[int]] = {}  # same repeat-block memo as gray
    for my in range(height // 8):
        for mx in range(width // 8):
            base = (my * 8) * width + mx * 8
            block = b"".join(
                pixels[base + yy * width : base + yy * width + 8]
                for yy in range(8)
            )
            zz = zz_memo.get(block)
            if zz is None:
                coef = _jpeg_fdct_block(list(block))
                zz = zz_memo[block] = [
                    int(round(coef[zi] / quant[zi])) for zi in _JPEG_ZIGZAG
                ]
            zz_blocks.append(zz)

    def pt(v: int, al: int) -> int:
        """point transform: signed magnitude shift (T.81 G.1.1.2)."""
        return (abs(v) >> al) * (1 if v >= 0 else -1)

    scan_payloads = []
    for ss, se, ah, al in scans:
        w = _JpegBitWriter()
        if ss == 0 and ah == 0:  # DC first
            pred = 0
            for zz in zz_blocks:
                t = zz[0] >> al  # arithmetic shift, two's complement (G.1.2.1)
                diff = t - pred
                pred = t
                s = abs(diff).bit_length()
                w.write(*dc_codes[s])
                if s:
                    w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        elif ss == 0:  # DC refinement: one appended bit per block
            for zz in zz_blocks:
                w.write((zz[0] >> al) & 1, 1)
        elif ah == 0:  # AC first for the Ss..Se band
            eobrun = 0

            def flush_eob(w=w):
                nonlocal eobrun
                if eobrun:
                    nbits = eobrun.bit_length() - 1
                    w.write(*ac_codes[nbits << 4])
                    if nbits:
                        w.write(eobrun - (1 << nbits), nbits)
                    eobrun = 0

            for zz in zz_blocks:
                r = 0
                for k in range(ss, se + 1):
                    t = pt(zz[k], al)
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        flush_eob()
                        w.write(*ac_codes[0xF0])
                        r -= 16
                    flush_eob()
                    s = abs(t).bit_length()
                    w.write(*ac_codes[(r << 4) | s])
                    w.write(t if t >= 0 else t + (1 << s) - 1, s)
                    r = 0
                if r:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
        else:  # AC refinement (T.81 G.1.2.3 encoder side)
            eobrun = 0
            be: list[int] = []  # correction bits buffered across the EOB run

            def flush_eob_r(w=w):
                nonlocal eobrun, be
                if eobrun:
                    nbits = eobrun.bit_length() - 1
                    w.write(*ac_codes[nbits << 4])
                    if nbits:
                        w.write(eobrun - (1 << nbits), nbits)
                    eobrun = 0
                for bit in be:
                    w.write(bit, 1)
                be = []

            for zz in zz_blocks:
                absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                eob_idx = ss - 1  # last NEWLY-significant index this pass
                for k in range(ss, se + 1):
                    if absv[k - ss] == 1:
                        eob_idx = k
                r = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k - ss]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_idx:
                        flush_eob_r()
                        w.write(*ac_codes[0xF0])
                        r -= 16
                        for bit in br:
                            w.write(bit, 1)
                        br = []
                    if t > 1:  # already significant: buffer a correction bit
                        br.append((abs(zz[k]) >> al) & 1)
                        continue
                    flush_eob_r()
                    w.write(*ac_codes[(r << 4) | 1])
                    w.write(1 if zz[k] > 0 else 0, 1)
                    for bit in br:
                        w.write(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be += br
                    if eobrun == 0x7FFF:
                        flush_eob_r()
            flush_eob_r()
        scan_payloads.append(((ss, se, ah, al), w.flush()))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, _jpeg_dqt_body(quant))
    out += seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_PROG_AC_BITS)
        + bytes(_JPEG_PROG_AC_VALS),
    )
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    for (ss, se, ah, al), data in scan_payloads:
        tdta = 0x00  # DC scans: DC table 0; AC scans: AC table 0
        out += seg(0xDA, b"\x01\x01" + bytes([tdta, ss, se, (ah << 4) | al]))
        out += data
    out += b"\xff\xd9"
    return bytes(out)


def synthesize_jpeg_progressive_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic REAL progressive (SOF2) JPEG payloads from a text
    column — the same constant-8x8-block grid as
    :func:`synthesize_jpeg_payload`, encoded through the full annex-G
    multi-scan pipeline (spectral selection + successive approximation,
    EOB runs, correction bits). Constant blocks still round-trip
    exactly (the coefficient arithmetic is identical to sequential —
    pinned bit-for-bit in tests), so the lossy progressive form gets
    the same byte-arithmetic oracle."""
    return _synthesize_jpeg_grid(
        df, id_col, text_col,
        lambda pix, w, h: _jpeg_encode_gray_progressive(
            pix, w, h, _JPEG_FIXTURE_QUANT
        ),
    )


# ---------------------------------------------------------- video (MJPEG/AVI)
#
# Video joins the REAL tier (r9): MJPEG-in-AVI is a RIFF container — the
# same chunk grammar the WAV reader already walks — around per-frame
# baseline JPEGs, which the engine genuinely decodes. BI_RLE8 delta
# video follows in r13 (stateful inter-frame composition, below). What
# stays behind the honest gate after both: MOTION-COMPENSATED/DCT
# inter-frame codecs (H.264/VP9/AV1 need a codec runtime).

#: fixture frame geometry: one 32-block row per frame → every frame of
#: every doc is 256×8 px, so a single AVI stream header describes all.
_AVI_FRAME_BYTES = 32


def _avi_build(frames: list[bytes], width: int, height: int,
               fps: int = 10, handler: bytes = b"MJPG",
               compression: bytes = b"MJPG", bit_count: int = 24,
               palette: bytes = b"",
               keyframes: list[bool] | None = None) -> bytes:
    """A REAL, well-formed RIFF AVI wrapping video frames: 'hdrl' LIST
    (avih main header + one 'strl' video stream: strh fourcc 'vids' +
    strf BITMAPINFOHEADER, with the palette appended for indexed
    formats), 'movi' LIST of '00dc' chunks (word-aligned per RIFF), and
    the idx1 index players expect — AVIIF_KEYFRAME set per frame from
    ``keyframes`` (default: all, the MJPEG all-intra contract). The
    defaults build the MJPEG fixture; (handler b'MRLE', compression
    DWORD 1, bit_count 8, a 256-entry RGBQUAD palette) build BI_RLE8.
    Pure struct packing — byte-exact and deterministic."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    n_colors = len(palette) // 4
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0, 1, fps, 0, len(frames),
        max_bytes, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, bit_count, compression,
        width * height * (bit_count // 8 if bit_count >= 8 else 1),
        0, 0, n_colors, 0,
    ) + palette
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = bytearray(b"movi")  # bytearray: O(total), not O(n²) +=
    idx_entries = []
    for f in frames:
        # idx1 offsets point at the chunk fourcc, relative to 'movi'
        idx_entries.append((len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", bytes(movi_body))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack(
                "<III",
                0x10 if keyframes is None or keyframes[i] else 0,
                off, size,
            )
            for i, (off, size) in enumerate(idx_entries)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _avi_stream_info(payload: bytes) -> dict:
    """Walk a RIFF AVI and return ``{codec, width, height, frames,
    palette}`` for the first (video) stream — ``codec`` is ``'mjpg'``
    (all-intra per-frame JPEG) or ``'rle8'`` (BI_RLE8 run-length with
    INTER-FRAME delta frames; ``palette`` holds its RGBQUAD table).
    Validates the grammar it relies on — RIFF/'AVI ' magic, a 'vids'
    stream with a handler this engine really decodes, a
    BITMAPINFOHEADER, the 'movi' LIST — and raises ValueError on
    anything malformed or any other codec (the honest-gate contract:
    fail loud, never guess)."""
    import struct

    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    (riff_size,) = struct.unpack_from("<I", p, 4)
    if 8 + riff_size > len(p):
        raise ValueError("truncated RIFF payload")

    def chunks(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated RIFF chunk")
            yield fourcc, body_start, size
            pos = body_start + size + (size & 1)

    width = height = None
    handler = None
    strf_raw = b""
    frames: list[bytes] = []
    n_declared = None
    for fourcc, start, size in chunks(p, 12, 8 + riff_size):
        if fourcc != b"LIST":
            continue
        kind = p[start:start + 4]
        if kind == b"hdrl":
            seen_strl = False
            for fc2, s2, sz2 in chunks(p, start + 4, start + size):
                if fc2 == b"LIST" and p[s2:s2 + 4] == b"strl":
                    if seen_strl:
                        # secondary streams (audio '01wb', subtitles, …)
                        # are ignored: the movi walk below keeps only
                        # stream 0's '00dc'/'00db' chunks
                        continue
                    seen_strl = True
                    for fc3, s3, sz3 in chunks(p, s2 + 4, s2 + sz2):
                        if fc3 == b"strh":
                            if p[s3:s3 + 4] != b"vids":
                                raise ValueError("first stream is not video")
                            handler = p[s3 + 4:s3 + 8]
                            (n_declared,) = struct.unpack_from("<I", p, s3 + 32)
                        elif fc3 == b"strf":
                            width, height = struct.unpack_from("<ii", p, s3 + 4)
                            strf_raw = p[s3:s3 + sz3]
        elif kind == b"movi":
            for fc2, s2, sz2 in chunks(p, start + 4, start + size):
                # only stream 0 (the validated video stream): a
                # multi-stream AVI interleaves '01wb' audio etc. whose
                # payloads must not reach the JPEG decoder.
                if fc2[:2] == b"00" and fc2[2:4] in (b"dc", b"db"):
                    frames.append(p[s2:s2 + sz2])
    if handler is None or width is None:
        raise ValueError("missing AVI stream headers")
    if n_declared is not None and n_declared != len(frames):
        raise ValueError(
            f"stream header declares {n_declared} frames, movi has {len(frames)}"
        )
    palette = b""
    if handler == b"MJPG":
        codec = "mjpg"
    elif handler in (b"MRLE", b"mrle", b"DIB "):
        if len(strf_raw) < 40:
            raise ValueError("BI_RLE8 stream without a BITMAPINFOHEADER")
        (bit_count,) = struct.unpack_from("<H", strf_raw, 14)
        (compression,) = struct.unpack_from("<I", strf_raw, 16)
        (clr_used,) = struct.unpack_from("<I", strf_raw, 32)
        if compression != 1 or bit_count != 8:
            raise ValueError(
                "only biCompression=1 (BI_RLE8) 8-bit indexed streams "
                f"decode under handler {handler!r}"
            )
        n_colors = clr_used or 256
        palette = strf_raw[40:40 + 4 * n_colors]
        if len(palette) != 4 * n_colors:
            raise ValueError("truncated RGBQUAD palette")
        codec = "rle8"
    else:
        raise ValueError(
            "only MJPG and BI_RLE8 video streams decode natively; handler "
            f"{handler!r} stays behind the honest codec gate "
            "(motion-compensated/DCT codecs need a codec runtime)"
        )
    return {
        "codec": codec,
        "width": width,
        "height": abs(height),
        "frames": frames,
        "palette": palette,
    }


def _avi_frame_payloads(payload: bytes) -> tuple[int, int, list[bytes]]:
    """The MJPEG-expecting walk: (width, height, [mjpeg frame bytes]).
    Thin wrapper over :func:`_avi_stream_info` that additionally rejects
    non-MJPEG streams — kept for the per-frame JPEG surfaces
    (``video_temporal_dhash``, frame sampling), which have no meaning
    for stateful-codec frames (a delta frame is not an image)."""
    info = _avi_stream_info(payload)
    if info["codec"] != "mjpg":
        raise ValueError("only MJPG video streams decode natively here")
    return info["width"], info["height"], info["frames"]


# ------------------------------------------------ video (BI_RLE8 delta)
#
# INTER-FRAME video leaves the honest gate at its entry level (r13):
# BI_RLE8 ('MRLE') — the Windows run-length video codec — is a REAL,
# fully-specified format whose delta frames encode only changed runs;
# every pixel a frame does not write RETAINS its value from the
# previous frame, so correct decode REQUIRES carrying frame state
# across the stream (a stateless per-frame decoder cannot produce the
# composed image). What stays gated after this: motion-compensated /
# DCT inter-frame codecs (H.264/VP9/AV1 — they need a codec runtime),
# not "inter-frame video" wholesale.


def _rle8_decode_frame(
    data: bytes, width: int, height: int, prev: bytes
) -> bytes:
    """Decode ONE BI_RLE8 frame onto the previous frame's pixels (MRLE
    inter-frame semantics): encoded runs (count, index), absolute mode
    (00 n≥3, word-aligned literals), end-of-line (00 00), delta/skip
    (00 02 dx dy) and end-of-bitmap (00 01); skipped pixels retain
    ``prev``. Row 0 is the first stored row (the luma statistics this
    feeds are orientation-invariant, so the BMP bottom-up convention is
    not re-flipped). Raises on truncation or runs that overflow the
    bitmap — fail loud, never guess."""
    out = bytearray(prev)
    if len(out) != width * height:
        raise ValueError("previous frame buffer has the wrong size")
    x = y = 0
    i, n = 0, len(data)
    while True:
        if i + 2 > n:
            raise ValueError("truncated RLE8 stream (no end-of-bitmap)")
        c0, c1 = data[i], data[i + 1]
        i += 2
        if c0 > 0:  # encoded run
            if y >= height or x + c0 > width:
                raise ValueError("RLE8 run overflows the bitmap")
            base = y * width + x
            out[base:base + c0] = bytes([c1]) * c0
            x += c0
        elif c1 == 0:  # end of line
            x, y = 0, y + 1
            if y > height:
                raise ValueError("RLE8 EOL past the last row")
        elif c1 == 1:  # end of bitmap
            return bytes(out)
        elif c1 == 2:  # delta: skip dx right, dy down (pixels retained)
            if i + 2 > n:
                raise ValueError("truncated RLE8 delta escape")
            x, y = x + data[i], y + data[i + 1]
            i += 2
            if x > width or y > height:
                raise ValueError("RLE8 delta escape past the bitmap")
        else:  # absolute mode: c1 >= 3 literal palette indices
            if i + c1 > n:
                raise ValueError("truncated RLE8 absolute run")
            if y >= height or x + c1 > width:
                raise ValueError("RLE8 absolute run overflows the bitmap")
            base = y * width + x
            out[base:base + c1] = data[i:i + c1]
            x += c1
            i += c1 + (c1 & 1)  # literals pad to a 16-bit boundary


def _rle8_encode_frame(
    cur: bytes, width: int, height: int, prev: bytes | None
) -> bytes:
    """The matching REAL MRLE encoder: emits only pixels that differ
    from ``prev`` (``None`` ⇒ keyframe, full coverage) — changed
    segments as greedy equal-value runs (count ≤ 255), horizontal
    skips as delta escapes, rows closed by EOL, the stream by
    end-of-bitmap. Fixture streams are therefore genuinely delta-coded:
    the decoder only sees an unchanged pixel's value in the frame that
    last wrote it."""
    out = bytearray()
    for y in range(height):
        row = cur[y * width:(y + 1) * width]
        if prev is None:
            segs = [(0, width)] if width else []
        else:
            prow = prev[y * width:(y + 1) * width]
            segs, sx = [], None
            for x in range(width):
                if row[x] != prow[x]:
                    if sx is None:
                        sx = x
                elif sx is not None:
                    segs.append((sx, x))
                    sx = None
            if sx is not None:
                segs.append((sx, width))
        x = 0
        for s, e in segs:
            dx = s - x
            while dx > 0:  # horizontal skip: retained pixels
                step = min(dx, 255)
                out += bytes([0, 2, step, 0])
                dx -= step
            x = s
            while x < e:
                v = row[x]
                run = 1
                while x + run < e and row[x + run] == v and run < 255:
                    run += 1
                out += bytes([run, v])
                x += run
        out += bytes([0, 0])  # end of line
    if not out:
        return bytes([0, 1])
    out[-2:] = bytes([0, 1])  # last EOL becomes end-of-bitmap
    return bytes(out)


def _rgbquad_luma_millis(palette: bytes) -> list[int]:
    """Integer BT.601 luma (per-mille weights 299R+587G+114B — already
    millis for 8-bit channels) per RGBQUAD palette entry; RGBQUAD byte
    order is (blue, green, red, reserved)."""
    return [
        114 * palette[4 * i] + 587 * palette[4 * i + 1] + 299 * palette[4 * i + 2]
        for i in range(len(palette) // 4)
    ]


#: RLE8 fixture geometry: 64×4 px, one byte of the doc per frame.
_RLE8_W, _RLE8_H = 64, 4


def synthesize_rle8_avi_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic REAL BI_RLE8 AVI payloads with genuine INTER-FRAME
    delta coding: one frame per text byte on a 64×4 grayscale-palette
    grid — frame 0 (the keyframe) paints every row with byte 0; frame
    f ≥ 1 is a DELTA frame that rewrites only row ``f % 4`` to byte f,
    all other pixels skipped (retained from the previous frame). A
    frame's composed content therefore depends on bytes whose runs
    appeared ONLY in earlier frames — a stateless decoder cannot
    reproduce the statistics, which is exactly what the oracle checks.
    Closed form for frame f, row r:
    ``lu = f - ((f - r) mod 4); value = byte[lu] if lu >= 1 else
    byte[0]`` (0 past the text's end)."""
    import struct

    palette = b"".join(bytes([v, v, v, 0]) for v in range(256))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                n_frames = max(1, len(data))

                def byte(i: int) -> int:
                    return data[i] if i < len(data) else 0

                frames, prev = [], None
                composed = bytes([byte(0)]) * (_RLE8_W * _RLE8_H)
                frames.append(
                    _rle8_encode_frame(composed, _RLE8_W, _RLE8_H, None)
                )
                prev = composed
                for f in range(1, n_frames):
                    cur = bytearray(prev)
                    r = f % _RLE8_H
                    cur[r * _RLE8_W:(r + 1) * _RLE8_W] = (
                        bytes([byte(f)]) * _RLE8_W
                    )
                    cur = bytes(cur)
                    frames.append(
                        _rle8_encode_frame(cur, _RLE8_W, _RLE8_H, prev)
                    )
                    prev = cur
                payloads.append(
                    _avi_build(
                        frames, _RLE8_W, _RLE8_H,
                        handler=b"MRLE",
                        compression=struct.pack("<I", 1),
                        bit_count=8,
                        palette=palette,
                        keyframes=[f == 0 for f in range(len(frames))],
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


#: per-frame decoded statistics rows.
VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("mean_val", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def video_frame_stats(media: DataFrame, every_k: int | None = None) -> DataFrame:
    """REAL per-frame video decode, Arrow-batched: walk each AVI's RIFF
    structure, JPEG-decode every MJPEG frame through the engine's own
    entropy+DCT pipeline, and emit one row per (doc, frame) with
    integer-exact luma statistics — the video analogue of
    ``media_signal_features``. Sums are exact int64 over luma millis
    with one float division at the end, so a SQL oracle reproduces the
    values from the fixture bytes.

    ``every_k`` samples frames BEFORE decoding: the container walk is
    cheap byte parsing, so only every k-th frame pays the JPEG cost —
    at real video lengths this is the order-of-magnitude lever (a
    1-in-30 keyframe sample decodes 3 % of the stream), which is why
    sampling belongs inside the decode pass, not after it.

    BI_RLE8 streams (r13 — inter-frame delta coding) decode through the
    same surface: the palette maps indices to integer BT.601 luma
    millis, so the statistics contract is identical. One honest
    difference: delta frames make EVERY frame's content depend on its
    predecessors, so ``every_k`` can only sample what is EMITTED — all
    frames still decode (true of any stateful codec; the decode is
    cheap run-length, not per-frame DCT)."""
    if every_k is not None and every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def emit(out, doc_id, fi, w, h, n, s, s2):
        if n != w * h:
            raise ValueError(
                f"frame {fi}: decoded {n} px, header says {w}x{h}"
            )
        out["doc_id"].append(doc_id)
        out["frame_idx"].append(fi)
        out["width"].append(w)
        out["height"].append(h)
        out["n_values"].append(n)
        out["mean_val"].append(round(s / (1000.0 * n), 6))
        out["rms"].append(round((s2 / (1e6 * n)) ** 0.5, 6))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "frame_idx", "width", "height",
                                   "n_values", "mean_val", "rms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                info = _avi_stream_info(payload)
                w, h, frames = info["width"], info["height"], info["frames"]
                if info["codec"] == "rle8":
                    luma = _rgbquad_luma_millis(info["palette"])
                    lut = np.asarray(luma, dtype=np.int64) if np is not None else None
                    prev = bytes(w * h)
                    for fi, fb in enumerate(frames):
                        prev = _rle8_decode_frame(fb, w, h, prev)
                        if every_k is not None and fi % every_k:
                            continue
                        if max(prev) >= len(luma):
                            raise ValueError(
                                f"frame {fi}: palette index past the "
                                f"{len(luma)}-entry RGBQUAD table"
                            )
                        n = w * h
                        if lut is not None and n < _INT64_SQSUM_SAFE_N:
                            lm = lut[np.frombuffer(prev, dtype=np.uint8)]
                            s = int(lm.sum())
                            s2 = int((lm * lm).sum())
                        else:
                            vals = [luma[b] for b in prev]
                            s = sum(vals)
                            s2 = sum(v * v for v in vals)
                        emit(out, doc_id, fi, w, h, n, s, s2)
                    continue
                for fi, fb in enumerate(frames):
                    if every_k is not None and fi % every_k:
                        continue
                    lm = None
                    if np is not None:
                        # array surface: skips the list round-trip; the
                        # size guard keeps Σv² exact (it would wrap
                        # int64 SILENTLY past the bound)
                        lm = _jpeg_luma_array(fb)
                        n = lm.size
                    if lm is not None and n < _INT64_SQSUM_SAFE_N:
                        s = int(lm.sum())
                        s2 = int((lm * lm).sum())
                    else:
                        lm = _jpeg_luma_millis(fb) if lm is None else lm.tolist()
                        n = len(lm)
                        s = sum(lm)
                        s2 = sum(v * v for v in lm)
                    emit(out, doc_id, fi, w, h, n, s, s2)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        batches, VIDEO_FRAME_SCHEMA
    )


def video_temporal_dhash(media: DataFrame) -> DataFrame:
    """Perceptual VIDEO dedup signature, Arrow-batched: (doc_id, dh_hi,
    dh_lo) — a 64-bit TEMPORAL hash in the dHash family: 8 frames
    sampled evenly across the clip (slot f → frame f·n∕8 — temporal
    coverage, the production shape for video fingerprints), byte f =
    the top-grid-row horizontal-gradient bits of that frame's block-
    mean dHash (integer cross-multiplied, no floats — SQL-reproducible
    from fixture bytes). Gradients make each byte gain/brightness-
    invariant per frame; sampling across time distinguishes clips that
    merely share an opening frame. Only the ≤8 sampled frames pay the
    JPEG decode cost (the container walk is byte parsing), and the
    output feeds the exact same pigeonhole banding as ``image_dhash``
    (``fingerprint_bands``/``fingerprint_batch_rejects``) — video plugs
    into every existing dedup surface, batch pair search and streaming
    admission alike, with zero new join machinery."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            his, los = [], []
            for p in pdf["payload"]:
                _w, _h, frames = _avi_frame_payloads(p)
                n = len(frames)
                if n == 0:
                    raise ValueError("temporal hash needs at least one frame")
                hi = lo = 0
                rows: dict[int, int] = {}  # decode each sampled frame once
                for f in range(8):
                    g = f * n // 8
                    if g not in rows:
                        rows[g] = _image_dhash_bits(frames[g])[1] & 0xFF
                    if f < 4:
                        lo |= rows[g] << (8 * f)
                    else:
                        hi |= rows[g] << (8 * (f - 4))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dh_hi": his, "dh_lo": los}
            )

    return media.select("doc_id", "payload").mapInPandas(batches, PHASH_SCHEMA)


def synthesize_avi_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL MJPEG-AVI payloads from a text column: the
    UTF-8 bytes split into 32-byte frames (≥1; last frame zero-padded),
    each frame one constant-8x8-block row (256×8 px) genuinely encoded
    by the baseline JPEG encoder, wrapped in a well-formed RIFF AVI
    (hdrl/strl headers, word-aligned movi chunks, idx1). Constant
    blocks survive quantization exactly, so a SQL oracle computes every
    frame's decoded statistics from the text bytes — same fixture
    contract as ``synthesize_jpeg_payload``, extended to the time
    axis."""
    fb = _AVI_FRAME_BYTES

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["__text"]:
                data = t.encode("utf-8")
                n_frames = max(1, -(-len(data) // fb))
                padded = data.ljust(n_frames * fb, b"\x00")
                # each frame is one row of 32 constant blocks — the
                # const-block encoder emits the identical bytes the
                # pixel-grid + _jpeg_encode_gray pair produced (pinned
                # bit-exact) without materializing pixels or running
                # the per-block FDCT/Huffman loops
                frames = [
                    _jpeg_encode_gray_const_blocks(
                        padded[f * fb:(f + 1) * fb], fb * 8, 8
                    )
                    for f in range(n_frames)
                ]
                payloads.append(_avi_build(frames, fb * 8, 8))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    ).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )

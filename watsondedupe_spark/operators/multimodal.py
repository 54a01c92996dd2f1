"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing here is real and tested — schema conventions,
Arrow-batched ``mapInPandas`` transforms, partition sizing — and the
header-level decoders for container formats with stable layouts are
real pure-Python parsers (PNG IHDR for images, RIFF/WAVE for audio).
Compressed codec work (jpeg/webp pixels, mp3/flac frames, video
keyframes) needs libraries this container doesn't ship; each such seam
is a single clearly-marked function that a deployment replaces with
PIL/torchaudio/ffmpeg calls — everything around it (batch iteration,
schema, null handling) is production-shaped.

Schema convention::

    media: struct<data: binary, mime: string, meta: map<string,string>>

Scale notes: binary payloads make rows heavy — transforms set
``maxRecordsPerBatch`` low (the session default 4096 already bounds
Arrow batches) and payload columns are pruned before any wide shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("data", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "id string, width int, height int, n_bytes long, format string, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "id string, frame_index int, frame_ts_ms long, frame binary"


def wrap_media(df: DataFrame, data_col: str, mime: str, id_col: str) -> DataFrame:
    """Pack a raw binary column into the media struct convention."""
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.struct(
            F.col(data_col).alias("data"),
            F.lit(mime).alias("mime"),
            F.create_map().cast(MapType(StringType(), StringType())).alias("meta"),
        ).alias("media"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """Fallback for formats with no pure-Python parser (jpeg/webp need a
    codec library): deterministic fake 'decode' of (width, height,
    format) from the payload's length and first bytes, so non-PNG
    pipelines stay testable end-to-end. Raises on empty payloads like a
    real decoder would.
    """
    if not payload:
        raise ValueError("cannot decode empty image payload")
    width = 16 + payload[0] % 64
    height = 16 + (payload[-1] if len(payload) > 1 else payload[0]) % 64
    return width, height, "raw"


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _decode_image(payload: bytes) -> tuple[int, int, str]:
    """IMAGE DECODER — real, pure-Python PNG IHDR parse by default.

    PNG payloads (the signature is unambiguous) return their true
    (width, height, 'png') straight from the IHDR chunk — no codec
    library involved, same treatment as the audio path's RIFF/WAVE
    parser. A truncated PNG raises; anything that is not a PNG falls
    back to the deterministic stub. Deployments replace the whole seam
    with a PIL wrapper of this same signature for jpeg/webp/etc.
    """
    if payload[:8] == _PNG_SIGNATURE:
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG: no IHDR chunk")
        import struct

        width, height = struct.unpack(">II", payload[16:24])
        return width, height, "png"
    return _decode_image_stub(payload)


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """FEATURE SEAM — replace with a vision encoder in deployment.
    Deterministic byte-histogram features (sum of byte values per
    modulo-class, normalized)."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = float(sum(acc)) or 1.0
    return [a / total for a in acc]


def extract_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    decoder=None,
    featurizer=None,
) -> DataFrame:
    """Decode + featurize image payloads via Arrow-batched mapInPandas.

    The plan is scan -> MapInPandas (payloads never shuffle); output is
    narrow (metadata + small feature vector), so downstream joins/aggs
    run without the binary column — column pruning does the rest.

    ``decoder``/``featurizer`` are the injectable seams: any callables
    with the default signatures (``bytes -> (width, height, format)``,
    raising ``ValueError`` on undecodable input, and ``bytes ->
    list[float]``) drop in without touching the Spark plumbing — a
    deployment passes PIL/vision-encoder wrappers here. The DEFAULT
    decoder already parses real PNG headers in pure Python
    (:func:`_decode_image`); only non-PNG formats hit the stub.
    """
    import pandas as pd

    decoder = decoder or _decode_image
    featurizer = featurizer or _feature_stub

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "width": [], "height": [], "n_bytes": [], "format": [], "feature": []}
            for rid, media in zip(pdf["id"], pdf["__media"]):
                payload = bytes(media["data"]) if media["data"] is not None else b""
                try:
                    w, h, fmt = decoder(payload)
                except ValueError:
                    w, h, fmt = -1, -1, "error"
                out["id"].append(rid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
                out["format"].append(fmt)
                out["feature"].append(featurizer(payload))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("__media")).mapInPandas(
        _batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "id",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sample 'video' payloads: one output row per sampled frame.

    FRAME SEAM — the splitter is a deterministic fake (fixed-size byte
    slices standing in for ffmpeg keyframe extraction); the explode
    shape, timestamps, and bounded fan-out are the real contract.
    """
    import pandas as pd

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "frame_index": [], "frame_ts_ms": [], "frame": []}
            for rid, media in zip(pdf["id"], pdf["__media"]):
                payload = bytes(media["data"]) if media["data"] is not None else b""
                if not payload:
                    continue
                step = max(1, len(payload) // max_frames)
                for idx in range(min(max_frames, (len(payload) + step - 1) // step)):
                    out["id"].append(rid)
                    out["frame_index"].append(idx)
                    out["frame_ts_ms"].append(idx * every_ms)
                    out["frame"].append(payload[idx * step : (idx + 1) * step])
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("__media")).mapInPandas(
        _batches, schema=FRAME_SAMPLE_SCHEMA
    )


AUDIO_SCHEMA = "id string, sample_rate int, n_channels int, n_samples long, duration_s double"


def _decode_wav_header(payload: bytes) -> tuple[int, int, int]:
    """AUDIO DECODER — real, pure-Python RIFF/WAVE header parse.

    Returns (sample_rate, n_channels, n_samples) for PCM WAV payloads by
    walking the chunk list (fmt then data); raises ``ValueError`` on
    anything that is not a RIFF/WAVE stream. Compressed formats
    (mp3/flac/ogg) need a codec library — pass a torchaudio/soundfile
    wrapper with this same signature as the ``decoder`` argument.
    """
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, channels, block_align, n_samples = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (block_align,) = struct.unpack("<H", body[12:14])
        elif cid == b"data" and block_align:
            n_samples = size // block_align
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or n_samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, n_samples


def decode_audio(
    df: DataFrame, media_col: str = "media", id_col: str = "id", decoder=None
) -> DataFrame:
    """Decode audio payload headers via Arrow-batched mapInPandas.

    Same plumbing contract as :func:`extract_image_features`: payloads
    never shuffle, output is narrow metadata, undecodable payloads
    degrade to ``error`` rows (sample_rate -1) instead of failing the
    job. The default decoder is a REAL pure-Python PCM WAV parser
    (:func:`_decode_wav_header`); compressed formats drop a
    torchaudio/soundfile wrapper into the ``decoder`` seam.
    """
    import pandas as pd

    decoder = decoder or _decode_wav_header

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "sample_rate": [], "n_channels": [], "n_samples": [], "duration_s": []}
            for rid, media in zip(pdf["id"], pdf["__media"]):
                payload = bytes(media["data"]) if media["data"] is not None else b""
                try:
                    rate, channels, n = decoder(payload)
                except ValueError:
                    rate, channels, n = -1, -1, -1
                out["id"].append(rid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["n_samples"].append(n)
                out["duration_s"].append(float(n) / rate if rate > 0 else -1.0)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("__media")).mapInPandas(
        _batches, schema=AUDIO_SCHEMA
    )


def _wav_pcm16_features(payload: bytes) -> tuple[int, int, int, int]:
    """AUDIO FEATURES — real pure-Python sample-domain feature extraction
    for mono 16-bit PCM WAV: returns (n_samples, peak, zero_crossings,
    energy) where peak = max |s_i|, zero_crossings counts strict sign
    flips between consecutive samples (s[i-1] * s[i] < 0), and energy is
    the exact integer sum of squares. Raises ``ValueError`` on anything
    that is not mono PCM16 RIFF/WAVE — compressed formats plug a codec
    wrapper into the ``extractor`` seam of :func:`extract_audio_features`.
    """
    import struct
    import sys
    from array import array

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels = struct.unpack("<HH", body[0:4])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("not mono PCM16")
            fmt_ok = True
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = array("h")
    samples.frombytes(data[: len(data) - (len(data) % 2)])
    if sys.byteorder == "big":
        samples.byteswap()
    peak = zc = energy = 0
    prev = 0
    for i, s in enumerate(samples):
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        energy += s * s
        if i and prev * s < 0:
            zc += 1
        prev = s
    return len(samples), peak, zc, energy


AUDIO_FEATURE_SCHEMA = (
    "id string, n_samples long, peak long, zero_crossings long, energy long"
)


def extract_audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "id", extractor=None
) -> DataFrame:
    """Sample-domain audio features via Arrow-batched mapInPandas.

    Same plumbing contract as :func:`decode_audio`: payloads never
    shuffle, output is narrow integer metadata, unparseable payloads
    degrade to error rows (n_samples -1) instead of failing the job.
    The default extractor is the REAL pure-Python mono-PCM16 parser
    (:func:`_wav_pcm16_features`).
    """
    import pandas as pd

    extractor = extractor or _wav_pcm16_features

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {"id": [], "n_samples": [], "peak": [], "zero_crossings": [], "energy": []}
            for rid, media in zip(pdf["id"], pdf["__media"]):
                payload = bytes(media["data"]) if media["data"] is not None else b""
                try:
                    n, peak, zc, energy = extractor(payload)
                except ValueError:
                    n, peak, zc, energy = -1, -1, -1, -1
                out["id"].append(rid)
                out["n_samples"].append(n)
                out["peak"].append(peak)
                out["zero_crossings"].append(zc)
                out["energy"].append(energy)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"), F.col(media_col).alias("__media")).mapInPandas(
        _batches, schema=AUDIO_FEATURE_SCHEMA
    )


FRAME_FEATURE_SCHEMA = "id string, frame_index int, f_sum long, f_len int"


def frame_byte_features(
    frames: DataFrame, frame_col: str = "frame", id_col: str = "id"
) -> DataFrame:
    """Per-frame brightness proxy: byte sum + byte count, Arrow-batched.

    The scene-cut detector downstream only needs a scalar feature per
    frame whose change marks a content switch; for real video this seam
    is a luma histogram — here it is the exact byte sum (numpy
    ``frombuffer().sum()`` per frame, vectorized per Arrow batch), which
    keeps the whole pipeline integer-closed-form and oracle-checkable.
    """
    import numpy as np
    import pandas as pd

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            sums = []
            lens = []
            for payload in pdf["__frame"]:
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                sums.append(int(buf.sum()))
                lens.append(len(buf))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "frame_index": pdf["__idx"],
                    "f_sum": sums,
                    "f_len": lens,
                }
            )

    return frames.select(
        F.col(id_col).alias("id"),
        F.col("frame_index").alias("__idx"),
        F.col(frame_col).alias("__frame"),
    ).mapInPandas(_batches, schema=FRAME_FEATURE_SCHEMA)

"""Unified multimodal featurizer: ONE Arrow pass that sniffs each
payload's container by magic bytes and routes it to the right decoder —
image (PGM/BMP), audio (WAV), video (Y4M) — emitting a normalized
feature row regardless of modality.

This is the shape a mixed-media landing zone needs at 100 TB: arriving
batches interleave modalities (a crawl does not sort itself by media
type), and forcing a per-modality pre-partition before decode would add
a full shuffle of the payload bytes — the single most expensive column
in the table — purely for dispatch. The dispatch belongs INSIDE the
map-only decode pass, one branch per magic, zero exchanges; modality
separation afterwards is a filter on the emitted ``media`` tag (a
metadata-width operation).

Normalized row semantics (idx = sub-item index; image and audio are
single-item, video emits one row per SAMPLED frame — the 1→N case is
why the schema carries idx at all):

| media | f1 | f2 | fhash | fd |
|---|---|---|---|---|
| image | width | height | raster md5 | pixel mean |
| audio | amp_sum | extrema | sample md5 | duration_ms |
| video | frame_sum | n_frames | frame md5 | duration_ms |

Every branch reuses the modality module's decoder verbatim — this
module adds routing, not decoding — so the per-modality guard families
and oracles keep applying.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retail_datawarehouse_spark.operators.audio import (
    decode_wav,
    wav_payload_col,
)
from retail_datawarehouse_spark.operators.multimodal import (
    _pgm_payload_col,
    decode_image,
)
from retail_datawarehouse_spark.operators.video import (
    SAMPLE_EVERY,
    decode_y4m,
    y4m_payload_col,
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.StringType()),
        T.StructField("idx", T.LongType()),
        T.StructField("f1", T.LongType()),
        T.StructField("f2", T.LongType()),
        T.StructField("fhash", T.StringType()),
        T.StructField("fd", T.DoubleType()),
    ]
)

_MEDIA_COLS = [f.name for f in MEDIA_FEATURE_SCHEMA.fields]


def sniff_media(payload: bytes) -> str:
    """Container classification by magic bytes — the same prefixes the
    decoders themselves validate, so a sniff/decode disagreement is
    impossible by construction."""
    if payload[:2] in (b"P5", b"BM"):
        return "image"
    if payload[:4] == b"RIFF":
        return "audio"
    if payload[:9] == b"YUV4MPEG2":
        return "video"
    raise ValueError(
        f"unrecognized media container (leading bytes {payload[:9]!r}); "
        "known magics: P5/BM (image), RIFF (audio), YUV4MPEG2 (video)"
    )


def _feature_rows(doc_id: int, payload: bytes) -> list[tuple]:
    media = sniff_media(payload)
    if media == "image":
        w, h, raster = decode_image(payload)
        mean = float(sum(raster)) / len(raster) if raster else 0.0
        return [
            (doc_id, media, 0, w, h, hashlib.md5(raster).hexdigest(), mean)
        ]
    if media == "audio":
        rate, samples = decode_wav(payload)
        a = list(samples)
        d = [a[i + 1] - a[i] for i in range(len(a) - 1)]
        extrema = sum(1 for i in range(len(d) - 1) if d[i] * d[i + 1] < 0)
        return [
            (
                doc_id,
                media,
                0,
                sum(a),
                extrema,
                hashlib.md5(samples).hexdigest(),
                len(a) * 1000.0 / rate,
            )
        ]
    _w, _h, num, den, frames = decode_y4m(payload)
    duration = len(frames) * 1000.0 * den / num
    return [
        (
            doc_id,
            media,
            k,
            sum(frames[k]),
            len(frames),
            hashlib.md5(frames[k]).hexdigest(),
            duration,
        )
        for k in range(0, len(frames), SAMPLE_EVERY)
    ]


def _media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rows.extend(_feature_rows(int(doc_id), bytes(payload)))
        yield pd.DataFrame(rows, columns=_MEDIA_COLS)


def featurize_media(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas magic-dispatch decode + featurize over a MIXED-media
    payload column (map-only — the dispatch lives inside the decode
    pass precisely so modality routing never costs a payload
    shuffle)."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _media_batches, MEDIA_FEATURE_SCHEMA
    )


def with_mixed_media_payload(docs: DataFrame) -> DataFrame:
    """The interleaved-modality fixture: doc_id % 3 routes each doc to
    a REAL synthesized PGM image / WAV clip / Y4M video — one row-local
    CASE over the three payload expressions in a single select (one
    scan, zero joins; Catalyst evaluates only the branch the CASE
    picks), so every Arrow batch the featurizer sees interleaves all
    three containers."""
    three = F.col("doc_id") % 3
    return docs.select(
        "doc_id",
        F.when(three == 0, _pgm_payload_col())
        .when(three == 1, wav_payload_col())
        .otherwise(y4m_payload_col())
        .alias("payload"),
        F.when(three == 0, F.lit("image/x-portable-graymap"))
        .when(three == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/x-yuv4mpeg"))
        .alias("media_type"),
    )

"""Video modality: YUV4MPEG2 (Y4M) payloads + dependency-free decode
and FRAME SAMPLING — the third leg of the multimodal stack (image in
``multimodal.py``, audio in ``audio.py``), same opaque-binary pattern.

Y4M is the raw-video interchange format (mjpegtools/ffmpeg lineage): a
single ASCII parameter line (``YUV4MPEG2 W.. H.. F<num>:<den> ..``)
followed by frames, each a ``FRAME`` marker line plus an uncompressed
raster. With the ``Cmono`` colorspace a frame is exactly W·H luma
bytes — which lets the fixture synthesize REAL multi-frame videos
JVM-side from ``documents.text`` (frame k's raster is the k-th W·H
slice of the rpad'd text) and lets a pure-SQL oracle re-derive every
decoded statistic from substring arithmetic.

Frame sampling is the operation that matters at 100 TB: training
pipelines keep every k-th frame, not the stream. The parser walks
frame by frame and the featurizer emits ONLY sampled frames (stride
``SAMPLE_EVERY``). Because Cmono frames are constant-size, a sampled
read is O(1) seekable — a production decoder skips the raster bytes it
drops; this one walks them (they're in memory anyway once the payload
column is read) but hashes only the kept frames. Richer codecs
(PyAV/ffmpeg for H.264) replace ``decode_y4m`` behind the same
featurizer without touching the plan.

Engine-exactness: frame sums are integer ascii folds, frame hashes are
md5 of the substring bytes, and duration_ms = n_frames·1000·den/num is
exact at F25:1 (n·40, integer-valued, so the one IEEE division is
bit-identical cross-engine — the audio-leg rule).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_EVERY = 2  # keep frames 0, 2, 4, … — the training-pipeline stride

# Dimensions / frame counts from doc_id arithmetic (the image/audio
# fixture discipline): every clip a distinct, reproducible shape.
_VID_W = "(4 + doc_id % 3)"
_VID_H = "(3 + doc_id % 2)"
_VID_NF = "(2 + doc_id % 3)"
_VID_WH = f"({_VID_W} * {_VID_H})"
_VID_PAD = f"rpad(text, CAST({_VID_NF} * {_VID_WH} AS INTEGER), 'x')"


def y4m_payload_col() -> F.Column:
    """The payload as a Column expression (needs ``doc_id`` and
    ``text`` in scope) — exposed so mixed-media fixtures can CASE over
    modality payloads in one select."""
    stream = F.expr(
        f"concat('YUV4MPEG2 W', CAST({_VID_W} AS STRING), "
        f"' H', CAST({_VID_H} AS STRING), ' F25:1 Ip A1:1 Cmono', char(10), "
        f"concat_ws('', transform(sequence(0, {_VID_NF} - 1), "
        f"k -> concat('FRAME', char(10), "
        f"substring({_VID_PAD}, k * {_VID_WH} + 1, {_VID_WH})))))"
    )
    return F.encode(stream, "utf-8")


def with_y4m_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL multi-frame YUV4MPEG2 stream per document,
    JVM-side (one scan, zero Python): the ASCII parameter line, then
    one ``FRAME`` + W·H-byte mono raster per frame, rasters carved from
    the rpad'd text so the decoded statistics stay SQL-oracle-able."""
    return docs.select(
        "doc_id",
        y4m_payload_col().alias("payload"),
        F.lit("video/x-yuv4mpeg").alias("media_type"),
    )


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, int, int, list[bytes]]:
    """Dependency-free Y4M parser: returns (width, height, fps_num,
    fps_den, frames) for Cmono streams. A real parameter-tag walker +
    frame iterator, EOF-guarded at every read, with named errors for
    the unsupported-colorspace path (the PGM/BMP/WAV guard family).
    FRAME marker lines may carry their own parameters (the spec allows
    per-frame tags); anything after ``FRAME`` up to the newline is
    skipped."""
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M truncated before the end of the header line")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError(f"not a YUV4MPEG2 stream (magic {tokens[0][:9]!r})")
    width = height = 0
    fps_num, fps_den = 30, 1  # spec default
    colorspace = b"420"  # spec default when no C tag
    for tok in tokens[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            colorspace = val
        # I (interlacing), A (aspect), X (extensions): metadata only
    if width <= 0 or height <= 0:
        raise ValueError("Y4M header missing W/H parameters")
    if colorspace != b"mono":
        raise ValueError(
            f"only Cmono decodes in-container, got C{colorspace.decode()}; "
            "wire PyAV/ffmpeg here for chroma-subsampled streams"
        )
    frame_bytes = width * height
    frames: list[bytes] = []
    off = nl + 1
    while off < len(payload):
        fnl = payload.find(b"\n", off)
        if fnl < 0:
            raise ValueError("Y4M truncated inside a FRAME marker line")
        if payload[off : off + 5] != b"FRAME":
            raise ValueError(
                f"expected FRAME marker at offset {off}, got "
                f"{payload[off:off + 5]!r}"
            )
        body = fnl + 1
        if body + frame_bytes > len(payload):
            raise ValueError(
                f"frame {len(frames)} raster overruns the payload"
            )
        frames.append(payload[body : body + frame_bytes])
        off = body + frame_bytes
    return width, height, fps_num, fps_den, frames


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("duration_ms", T.DoubleType()),
    ]
)

_VIDEO_COLS = [f.name for f in VIDEO_FEATURE_SCHEMA.fields]


def _video_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, num, den, frames = decode_y4m(bytes(payload))
            duration = len(frames) * 1000.0 * den / num
            for k in range(0, len(frames), SAMPLE_EVERY):
                fr = frames[k]
                rows.append(
                    (
                        int(doc_id),
                        k,
                        sum(fr),
                        hashlib.md5(fr).hexdigest(),
                        duration,
                    )
                )
        yield pd.DataFrame(rows, columns=_VIDEO_COLS)


def sample_frames(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode + every-``SAMPLE_EVERY``-th-frame extraction
    over the video payload column — the 1→N frame sampler (map-only,
    zero exchanges; output rows ≈ input frames / stride)."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _video_batches, VIDEO_FEATURE_SCHEMA
    )


# The sampled-frame stats re-expressed in SQL: frame k's raster is a
# substring of the rpad'd text (pure ASCII, fixture probe), the series
# bound is derived per-row (lateral — the tchunk-oracle pattern), and
# the sampling stride is a modulus filter on the frame index.
VIDEO_ORACLE_SQL = f"""
    SELECT doc_id, frame_idx,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(regexp_extract_all(fr, '.'),
                                   ch -> CAST(ascii(ch) AS BIGINT))),
                (acc, x) -> acc + x) AS BIGINT) AS frame_sum,
           md5(fr) AS frame_md5,
           CAST(nf * 40 AS DOUBLE) AS duration_ms
    FROM (
        SELECT doc_id, nf, CAST(g.k AS BIGINT) AS frame_idx,
               substring(p, CAST(g.k * wh + 1 AS INTEGER),
                         CAST(wh AS INTEGER)) AS fr
        FROM (
            SELECT doc_id, {_VID_WH} AS wh, {_VID_NF} AS nf, {_VID_PAD} AS p
            FROM documents
        ) t
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, t.nf - 1)) AS k
        ) g
        WHERE g.k % {SAMPLE_EVERY} = 0
    )
"""

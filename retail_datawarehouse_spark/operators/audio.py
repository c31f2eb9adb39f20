"""Audio modality: RIFF/WAVE PCM payloads + dependency-free decode.

Completes the multimodal story (image done in ``multimodal.py``; this is
the audio leg of the same pattern, BASELINE.json north star): the clip
is an opaque ``binary`` column riding next to typed metadata, decode +
feature extraction run as Arrow-batched ``mapInPandas``, and the plan
never changes shape when a richer codec (soundfile/ffmpeg for
MP3/FLAC) replaces the in-container one.

The container has no audio libraries, so the codec is the one that
needs none: canonical RIFF/WAVE, 8-bit unsigned mono PCM (44-byte
header + one byte per sample, stdlib ``struct``). Like the image leg,
the fixtures carry no binary column, so payloads are SYNTHESIZED as
genuine WAV files JVM-side — a correct RIFF header (every multi-byte
field little-endian) followed by the first N bytes of
``documents.text`` as the sample stream (N = 16 + doc_id % 32,
rpad-with-'x' so short docs still fill the declared data chunk) —
then decoded BACK by a real chunk-walking parser (EOF-guarded bounds,
fmt validation, unknown-chunk skip, word-alignment padding) inside the
Arrow featurizer. Decoded features are hash-checked against a pure-SQL
oracle that re-derives them from the text: the decode is real, the
plumbing is real, and the values are value-verified end to end.

Feature semantics (all engine-exact):
- ``amp_sum``: integer sum of the 8-bit sample values (exact int64).
- ``extrema``: count of strict local extrema — interior samples where
  the first difference changes sign, ``(s[i]-s[i-1])*(s[i+1]-s[i]) < 0``
  (the AC-coupled zero-crossing-rate analogue; plain zero crossings of
  unsigned PCM around midpoint 128 are degenerate here because ASCII
  samples never exceed 127). Plateau edges (zero diff) are NOT extrema
  in either engine — the product is 0, not negative.
- ``sample_md5``: md5 of the raw sample bytes (== md5 of the rpad'd
  text because the samples ARE those bytes).
- ``duration_ms``: n_samples · 1000 / sample_rate. At 8000 Hz this is
  n/8 — a power-of-two division, exactly representable, so the IEEE
  result is bit-identical cross-engine (the same rule that admits the
  featurizer's single pixel-mean division).

The stdlib ``wave`` module doubles as an independent round-trip
witness in tests (it can READ our synthesized payloads and WRITE
payloads our parser must decode) — two implementations agreeing on the
wire format, neither derived from the other.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIO_RATE = 8000  # Hz; 8000 = 0x1F40 → '401F0000' little-endian

# Samples per clip, derived from doc_id so every clip is a distinct,
# arithmetic-reproducible length (the image-fixture discipline). All
# values < 256 - 44, so the two variable header fields (RIFF size
# 36+n, data size n) each fit ONE little-endian byte + three zeros.
_WAV_N = "(16 + doc_id % 32)"


def _wav_header_hex() -> str:
    """SQL hex-string expression for the canonical 44-byte WAV header.
    Constant fields inlined as hex literals; the two size fields are
    doc_id arithmetic (single value byte, see _WAV_N bound)."""
    return (
        "concat("
        "'52494646', "  # 'RIFF'
        f"lpad(hex(36 + {_WAV_N}), 2, '0'), '000000', "  # riff size (LE)
        "'57415645', "  # 'WAVE'
        "'666D7420', '10000000', "  # 'fmt ', chunk size 16
        "'0100', '0100', "  # format 1 (PCM), channels 1
        "'401F0000', '401F0000', "  # sample rate 8000, byte rate 8000
        "'0100', '0800', "  # block align 1, bits per sample 8
        "'64617461', "  # 'data'
        f"lpad(hex({_WAV_N}), 2, '0'), '000000')"  # data size (LE)
    )


def wav_payload_col() -> F.Column:
    """The payload as a Column expression (needs ``doc_id`` and
    ``text`` in scope) — exposed so mixed-media fixtures can CASE over
    modality payloads in one select."""
    samples = F.expr(f"rpad(text, CAST({_WAV_N} AS INTEGER), 'x')")
    return F.concat(
        F.unhex(F.expr(_wav_header_hex())), F.encode(samples, "utf-8")
    )


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL RIFF/WAVE 8-bit-mono-PCM payload per document,
    JVM-side (one scan, zero Python): header built as hex text →
    ``unhex``, samples are the rpad'd text bytes — rpad both pads AND
    truncates to exactly the declared data-chunk length in Spark and
    DuckDB alike, which is what makes the decoded sample statistics
    SQL-oracle-able."""
    return docs.select(
        "doc_id",
        wav_payload_col().alias("payload"),
        F.lit("audio/wav").alias("media_type"),
    )


def decode_wav(payload: bytes) -> tuple[int, bytes]:
    """Dependency-free RIFF/WAVE parser: returns (sample_rate, raw
    sample bytes) for 8-bit unsigned mono PCM. A real chunk walker, not
    a fixed-offset slice: unknown chunks (LIST, cue, fact …) are
    skipped with word-alignment padding, every read is EOF-guarded, and
    the fmt contract (PCM / mono / 8-bit) is validated with named
    errors — the guard family mirrors the PGM/BMP decoders. Richer
    codecs (soundfile for MP3/FLAC) slot in behind the same featurizer
    without touching the plan."""
    if len(payload) < 12:
        raise ValueError("WAV truncated before the RIFF header")
    if payload[:4] != b"RIFF":
        raise ValueError(f"not a RIFF container (magic {payload[:4]!r})")
    if payload[8:12] != b"WAVE":
        raise ValueError(f"RIFF form is not WAVE ({payload[8:12]!r})")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise ValueError("RIFF size field overruns the payload")
    off, rate, fmt_seen = 12, 0, False
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (csz,) = struct.unpack_from("<I", payload, off + 4)
        body = off + 8
        if body + csz > len(payload):
            raise ValueError(f"chunk {cid!r} overruns the payload")
        if cid == b"fmt ":
            if csz < 16:
                raise ValueError("fmt chunk shorter than PCM minimum")
            fmt_code, channels, rate, _brate, _balign, bits = (
                struct.unpack_from("<HHIIHH", payload, body)
            )
            if fmt_code != 1:
                raise ValueError(
                    f"only PCM (format 1) decodes in-container, got "
                    f"{fmt_code}; wire soundfile here for compressed audio"
                )
            if channels != 1:
                raise ValueError(f"mono only, got {channels} channels")
            if bits != 8:
                raise ValueError(f"8-bit PCM only, got {bits}-bit")
            fmt_seen = True
        elif cid == b"data":
            if not fmt_seen:
                raise ValueError("data chunk before fmt chunk")
            return rate, payload[body : body + csz]
        # any other chunk id: skip it — the format allows metadata
        # chunks anywhere between fmt and data
        off = body + csz + (csz & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
        T.StructField("extrema", T.LongType()),
        T.StructField("sample_md5", T.StringType()),
        T.StructField("duration_ms", T.DoubleType()),
    ]
)

_AUDIO_COLS = [f.name for f in AUDIO_FEATURE_SCHEMA.fields]


def _audio_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = decode_wav(bytes(payload))
            a = np.frombuffer(samples, dtype=np.uint8).astype(np.int64)
            d = np.diff(a)
            extrema = int(np.sum(d[:-1] * d[1:] < 0)) if len(a) >= 3 else 0
            rows.append(
                (
                    int(doc_id),
                    int(rate),
                    int(a.sum()),
                    extrema,
                    hashlib.md5(samples).hexdigest(),
                    len(a) * 1000.0 / rate,
                )
            )
        yield pd.DataFrame(rows, columns=_AUDIO_COLS)


def featurize_audio(df_with_payload: DataFrame) -> DataFrame:
    """mapInPandas decode + feature extraction over the audio payload
    column (map-only: zero exchanges, payloads partition like any
    column — at 100 TB ``maxPartitionBytes`` does the sizing)."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _audio_batches, AUDIO_FEATURE_SCHEMA
    )


RESAMPLE_EVERY = 2  # decimate 8 kHz → 4 kHz (model-input normalization)

RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rs_rate", T.LongType()),
        T.StructField("rs_n", T.LongType()),
        T.StructField("rs_amp_sum", T.LongType()),
        T.StructField("rs_md5", T.StringType()),
        T.StructField("rs_duration_ms", T.DoubleType()),
    ]
)

_RS_COLS = [f.name for f in RESAMPLE_SCHEMA.fields]


def _resample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = decode_wav(bytes(payload))
            rs = samples[::RESAMPLE_EVERY]
            rs_rate = rate // RESAMPLE_EVERY
            rows.append(
                (
                    int(doc_id),
                    rs_rate,
                    len(rs),
                    int(sum(rs)),
                    hashlib.md5(rs).hexdigest(),
                    len(rs) * 1000.0 / rs_rate,
                )
            )
        yield pd.DataFrame(rows, columns=_RS_COLS)


def resample_audio(df_with_payload: DataFrame) -> DataFrame:
    """Decode + decimate-by-``RESAMPLE_EVERY`` — the audio twin of the
    image resize normalization (every clip leaves at one target rate
    before featurization/embedding). Plain decimation: kept as the
    cheap path and the aliasing CONTRAST for ``fir_resample_audio``
    below, which is the proper anti-aliased form (r6 verdict #3 —
    integer taps make the FIR hash-gateable after all). Map-only Arrow
    pass, same shuffle story as the featurizer. rs_duration is exact:
    rs_n·1000/4000 = rs_n/4, a power-of-two division."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _resample_batches, RESAMPLE_SCHEMA
    )


# --- Anti-aliased resampling: integer half-band FIR + decimate ----------
#
# r6 verdict #3: the r6 resampler decimated without a low-pass because a
# FLOAT FIR isn't hash-gateable cross-engine — but a FIXED-POINT one is.
# Taps [-3, 0, 19, 32, 19, 0, -3] / 64 form a genuine half-band low-pass
# with three exact properties (all integer, so exact in any engine):
#   - DC gain EXACTLY 1:  -3+0+19+32+19+0-3 = 64 = the shift divisor;
#   - Nyquist gain EXACTLY 0:  32 - 2·19 + 2·3 = 0 — the alias-carrying
#     band that decimation folds onto DC is nulled, which is the whole
#     point of anti-aliasing (test_fir_kills_nyquist_alias plants an
#     alternating tone: plain decimation reads it as full-scale DC, the
#     FIR reads the true mean);
#   - half-band symmetry: even-index taps vanish (except center), the
#     standard polyphase-cheap decimator shape (Crochiere & Rabiner).
# Arithmetic contract: int64 accumulate, +32 bias, FLOOR-divide by 64
# (mirrored as floor(x/64.0) in SQL — exact: |acc| < 2^15 and 64 is a
# power of two), clamp to [0, 255]. Out-of-range neighbors read as 0
# (zero-padded edges), mirrored with CASE bounds in the oracle.

FIR_TAPS = (-3, 0, 19, 32, 19, 0, -3)  # offsets -3..+3, gain 64
_FIR_GAIN = 64
_FIR_HALF = len(FIR_TAPS) // 2

FIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rs_rate", T.LongType()),
        T.StructField("rs_n", T.LongType()),
        T.StructField("fir_amp_sum", T.LongType()),
        T.StructField("fir_md5", T.StringType()),
        T.StructField("rs_duration_ms", T.DoubleType()),
    ]
)

_FIR_COLS = [f.name for f in FIR_SCHEMA.fields]


def fir_decimate(a: "np.ndarray") -> "np.ndarray":
    """The definitional kernel, shared by the operator and the tests'
    pure-Python twin: zero-padded convolution with FIR_TAPS evaluated
    at every RESAMPLE_EVERY-th input position, floor-rounded fixed
    point, clamped to the 8-bit sample domain."""
    n = len(a)
    a = a.astype(np.int64)
    idx = np.arange(0, n, RESAMPLE_EVERY)
    acc = np.zeros(len(idx), dtype=np.int64)
    for off, h in zip(range(-_FIR_HALF, _FIR_HALF + 1), FIR_TAPS):
        if h == 0:
            continue
        pos = idx + off
        valid = (pos >= 0) & (pos < n)
        acc[valid] += h * a[pos[valid]]
    return np.clip((acc + _FIR_GAIN // 2) // _FIR_GAIN, 0, 255)


def _fir_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = decode_wav(bytes(payload))
            a = np.frombuffer(samples, dtype=np.uint8)
            y = fir_decimate(a)
            rs_rate = rate // RESAMPLE_EVERY
            # the value surface is the comma-joined DECIMAL string (not
            # raw bytes): filtered values can exceed 127, where a raw
            # chr() round-trip diverges between a byte engine and a
            # UTF-8 engine — digits are the encoding both agree on
            joined = ",".join(str(int(v)) for v in y)
            rows.append(
                (
                    int(doc_id),
                    rs_rate,
                    len(y),
                    int(y.sum()),
                    hashlib.md5(joined.encode()).hexdigest(),
                    len(y) * 1000.0 / rs_rate,
                )
            )
        yield pd.DataFrame(rows, columns=_FIR_COLS)


def fir_resample_audio(df_with_payload: DataFrame) -> DataFrame:
    """Anti-aliased decimate-by-``RESAMPLE_EVERY``: integer half-band
    FIR low-pass fused with the downsample (only kept positions are
    convolved — the polyphase identity). Map-only Arrow pass; at
    100 TB this is one decode+filter kernel per payload row, zero
    exchanges, exactly the featurizer's cost shape plus 5 multiplies
    per output sample."""
    return df_with_payload.select("doc_id", "payload").mapInPandas(
        _fir_batches, FIR_SCHEMA
    )


def _fir_tap_sql(center: str, n: str) -> str:
    """The convolution at 1-based position ``center`` of sample list
    ``a`` (bounds ``n``), as exact-integer SQL: zero-padded CASE per
    non-zero tap, +32 bias, floor(x/64.0) (exact — small int over a
    power of two), clamped to [0, 255]."""
    terms = []
    for off, h in zip(range(-_FIR_HALF, _FIR_HALF + 1), FIR_TAPS):
        if h == 0:
            continue
        pos = f"({center} + {off})"
        terms.append(
            f"({h}) * (CASE WHEN {pos} >= 1 AND {pos} <= {n} "
            f"THEN a[{pos}] ELSE 0 END)"
        )
    acc = " + ".join(terms)
    return (
        f"greatest(0, least(255, CAST(floor(({acc} + {_FIR_GAIN // 2}) "
        f"/ {_FIR_GAIN}.0) AS BIGINT)))"
    )


AUDIO_FIR_ORACLE_SQL = f"""
    SELECT doc_id,
           CAST(len(y) AS BIGINT) AS rs_n,
           CAST(coalesce(list_sum(y), 0) AS BIGINT) AS fir_amp_sum,
           md5(array_to_string(list_transform(y,
               v -> CAST(v AS VARCHAR)), ',')) AS fir_md5,
           CAST(len(y) AS DOUBLE) / 4 AS rs_duration_ms
    FROM (
        SELECT doc_id,
               list_transform(range(1, n + 1, {RESAMPLE_EVERY}),
                              p -> {_fir_tap_sql("p", "n")}) AS y
        FROM (
            SELECT doc_id, n,
                   list_transform(regexp_extract_all(s, '.'),
                                  ch -> CAST(ascii(ch) AS BIGINT)) AS a
            FROM (
                SELECT doc_id, {_WAV_N} AS n,
                       rpad(text, CAST({_WAV_N} AS INTEGER), 'x') AS s
                FROM documents
            )
        )
    )
"""


# Decimated-sample stats in SQL: positions 1, 1+k, 1+2k … of the rpad'd
# text (DuckDB range() takes a step); rs_n = ceil(n / k) exactly via
# ((n + k - 1) // k) in integer arithmetic.
AUDIO_RESAMPLE_ORACLE_SQL = f"""
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(a, x -> x)), 0) AS BIGINT)
               AS rs_amp_sum,
           CAST((n + {RESAMPLE_EVERY} - 1) // {RESAMPLE_EVERY} AS BIGINT)
               AS rs_n,
           md5(rs) AS rs_md5,
           CAST((n + {RESAMPLE_EVERY} - 1) // {RESAMPLE_EVERY} AS DOUBLE)
               / 4 AS rs_duration_ms
    FROM (
        SELECT doc_id, n, rs,
               list_transform(regexp_extract_all(rs, '.'),
                              ch -> CAST(ascii(ch) AS BIGINT)) AS a
        FROM (
            SELECT doc_id, n,
                   array_to_string(list_transform(
                       range(1, n + 1, {RESAMPLE_EVERY}),
                       i -> substr(s, CAST(i AS INTEGER), 1)), '') AS rs
            FROM (
                SELECT doc_id, {_WAV_N} AS n,
                       rpad(text, CAST({_WAV_N} AS INTEGER), 'x') AS s
                FROM documents
            )
        )
    )
"""


# The decoded-sample stats re-expressed in SQL (the featurizer oracle):
# samples are rpad(text, n, 'x') bytes, text is pure ASCII (fixture
# probe), so sample bytes == ascii(char). amp_sum is an exact integer
# fold; extrema is an integer sign-product count over interior
# positions (range(2, n) is 1-based-interior, stop-exclusive);
# duration is the one IEEE division, exact by the power-of-two rule.
AUDIO_ORACLE_SQL = f"""
    SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), a),
                            (acc, x) -> acc + x) AS BIGINT) AS amp_sum,
           CAST(len(list_filter(range(2, n),
                    i -> (a[i] - a[i - 1]) * (a[i + 1] - a[i]) < 0))
                AS BIGINT) AS extrema,
           md5(s) AS sample_md5,
           CAST(n AS DOUBLE) / 8 AS duration_ms
    FROM (
        SELECT doc_id, n, s,
               list_transform(regexp_extract_all(s, '.'),
                              ch -> CAST(ascii(ch) AS BIGINT)) AS a
        FROM (
            SELECT doc_id, {_WAV_N} AS n,
                   rpad(text, CAST({_WAV_N} AS INTEGER), 'x') AS s
            FROM documents
        )
    )
"""

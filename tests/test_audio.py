"""Audio leg of the multimodal stack (operators/audio.py): the WAV
parser against stdlib ``wave`` as an independent round-trip witness in
BOTH directions, the guard family (EOF, fmt contract, chunk walking),
the extrema semantics against a pure-Python loop, and the Spark
payload→decode→featurize path."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from retail_datawarehouse_spark.operators.audio import (
    AUDIO_RATE,
    decode_wav,
    featurize_audio,
    with_wav_payload,
)


def _stdlib_wav(samples: bytes, rate: int = AUDIO_RATE) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit unsigned PCM
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def test_decodes_stdlib_written_wav():
    """Our parser reads a file the stdlib writer produced — the wire
    format agreement is two-sided, neither implementation derived from
    the other."""
    samples = bytes(range(40, 90))
    rate, got = decode_wav(_stdlib_wav(samples))
    assert (rate, got) == (AUDIO_RATE, samples)


def test_stdlib_reads_spark_synthesized_payload(spark):
    """And the reverse: stdlib ``wave`` parses the JVM-synthesized
    payload and agrees on every header parameter and the sample
    bytes."""
    docs = spark.createDataFrame(
        [(6, "hello world this is a test doc")], "doc_id long, text string"
    )
    payload = bytes(with_wav_payload(docs).collect()[0].payload)
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getframerate() == AUDIO_RATE
        n = 16 + 6 % 32
        assert w.getnframes() == n
        frames = w.readframes(n)
    assert frames == b"hello world this is a "  # first 22 bytes, doc long enough
    assert decode_wav(payload) == (AUDIO_RATE, frames)


def test_unknown_chunks_skipped_and_odd_size_padded():
    """A LIST metadata chunk (odd body size → word-alignment pad byte)
    between fmt and data must be walked over, not tripped over."""
    samples = b"abcdef"
    base = _stdlib_wav(samples)
    fmt_end = base.index(b"data")
    meta = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    patched = (
        base[:4]
        + struct.pack("<I", struct.unpack_from("<I", base, 4)[0] + len(meta))
        + base[8:fmt_end]
        + meta
        + base[fmt_end:]
    )
    assert decode_wav(patched) == (AUDIO_RATE, samples)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:8], "truncated before the RIFF"),
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:8] + b"AVI " + b[12:], "not WAVE"),
        (lambda b: b[:-3], "overruns the payload"),
        # format code 1 -> 3 (IEEE float) at fmt body offset 20
        (lambda b: b[:20] + struct.pack("<H", 3) + b[22:], "only PCM"),
        # channels 1 -> 2 at offset 22
        (lambda b: b[:22] + struct.pack("<H", 2) + b[24:], "mono only"),
        # bits 8 -> 16 at offset 34
        (lambda b: b[:34] + struct.pack("<H", 16) + b[36:], "8-bit PCM only"),
    ],
)
def test_guard_family(mutate, msg):
    base = _stdlib_wav(b"abcdefgh")
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(base))


def test_data_before_fmt_rejected():
    samples = b"xyz"
    hdr = b"RIFF" + struct.pack("<I", 4 + 8 + 4) + b"WAVE"
    bad = hdr + b"data" + struct.pack("<I", len(samples)) + samples + b"\x00"
    with pytest.raises(ValueError, match="data chunk before fmt"):
        decode_wav(bad)


def test_extrema_matches_pure_python(spark):
    """Featurizer extrema == the definitional loop, on a sequence with
    peaks, valleys, AND plateaus (plateau edges are not extrema: the
    sign product is 0)."""
    text = "abeba"  # 97 98 101 98 97: peak at 'e'
    text2 = "aacca"  # plateau 97 97, rise, plateau 99 99, fall -> 0 strict extrema?
    docs = spark.createDataFrame(
        [(0, text), (32, text2)], "doc_id long, text string"
    )  # doc_id % 32 == 0 -> n = 16, rpad with 'x' beyond the text
    rows = {
        r.doc_id: r
        for r in featurize_audio(with_wav_payload(docs)).collect()
    }

    def py_extrema(vals):
        return sum(
            1
            for i in range(1, len(vals) - 1)
            if (vals[i] - vals[i - 1]) * (vals[i + 1] - vals[i]) < 0
        )

    for doc_id, text_ in ((0, text), (32, text2)):
        padded = text_.ljust(16, "x")[:16]
        vals = [ord(c) for c in padded]
        r = rows[doc_id]
        assert r.extrema == py_extrema(vals)
        assert r.amp_sum == sum(vals)
        assert r.duration_ms == 16 / 8
        assert r.sample_rate == AUDIO_RATE
    # the hand-audited values, so the test fails loudly if the fixture
    # arithmetic drifts: 'abeba' + 11×'x' has the 'e' peak plus the
    # valley where the final 'a' turns up into the pad run
    assert rows[0].extrema == 2

def test_resample_matches_definitional_decimation(spark):
    """resample_audio == Python slicing [::RESAMPLE_EVERY] of the
    decoded samples, with the halved rate and exact duration."""
    from retail_datawarehouse_spark.operators.audio import (
        RESAMPLE_EVERY,
        resample_audio,
    )

    texts = {i: f"resample test doc {i} {'q' * (i % 5)}" for i in range(8)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in resample_audio(with_wav_payload(docs)).collect()}
    import hashlib

    for i, text in texts.items():
        n = 16 + i % 32
        samples = text.ljust(n, "x")[:n].encode()
        rs = samples[::RESAMPLE_EVERY]
        r = got[i]
        assert r.rs_rate == AUDIO_RATE // RESAMPLE_EVERY
        assert r.rs_n == len(rs)
        assert r.rs_amp_sum == sum(rs)
        assert r.rs_md5 == hashlib.md5(rs).hexdigest()
        assert r.rs_duration_ms == len(rs) / 4

def test_fir_matches_definitional_convolution(spark):
    """fir_resample_audio == a dependency-free pure-Python convolution
    (zero-padded edges, +32 bias, floor-divide 64, clamp) evaluated at
    every other position — neither side derived from the other."""
    import hashlib

    from retail_datawarehouse_spark.operators.audio import (
        FIR_TAPS,
        RESAMPLE_EVERY,
        fir_resample_audio,
    )

    texts = {i: f"fir test doc {i} {'zq' * (i % 7)}" for i in range(10)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in fir_resample_audio(with_wav_payload(docs)).collect()
    }

    def py_fir(vals):
        n = len(vals)
        out = []
        for c in range(0, n, RESAMPLE_EVERY):
            acc = 0
            for off, h in zip(range(-3, 4), FIR_TAPS):
                p = c + off
                acc += h * (vals[p] if 0 <= p < n else 0)
            out.append(min(255, max(0, (acc + 32) // 64)))
        return out

    for i, text in texts.items():
        n = 16 + i % 32
        vals = [ord(c) for c in text.ljust(n, "x")[:n]]
        want = py_fir(vals)
        r = got[i]
        assert r.rs_n == len(want)
        assert r.fir_amp_sum == sum(want)
        joined = ",".join(str(v) for v in want)
        assert r.fir_md5 == hashlib.md5(joined.encode()).hexdigest()
        assert r.rs_duration_ms == len(want) / 4
        assert r.rs_rate == AUDIO_RATE // RESAMPLE_EVERY


def test_fir_kills_nyquist_alias_plain_decimation_does_not(spark):
    """The aliasing demonstration (r6 verdict #3): a full-scale
    Nyquist-frequency tone (alternating 200/40) is INVISIBLE to plain
    decimation — it reads the 200-phase as a constant 200 signal (the
    tone aliased onto DC, amplitude preserved but frequency destroyed)
    — while the half-band FIR's exact Nyquist null replaces it with the
    true mean (120) everywhere away from the edges. Payload built by
    the stdlib wave module, so the fixture can't inherit the operator's
    assumptions."""
    import io
    import wave

    import numpy as np

    from retail_datawarehouse_spark.operators.audio import (
        fir_decimate,
        decode_wav,
        fir_resample_audio,
        resample_audio,
    )

    n = 64
    tone = bytes(200 if i % 2 == 0 else 40 for i in range(n))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(AUDIO_RATE)
        w.writeframes(tone)
    payload = buf.getvalue()
    rate, samples = decode_wav(payload)
    assert samples == tone
    docs = spark.createDataFrame(
        [(0, bytearray(payload))], "doc_id long, payload binary"
    )
    plain = resample_audio(docs).collect()[0]
    fir = fir_resample_audio(docs).collect()[0]
    # plain decimation keeps only the 200-phase: a flat 200 "DC" signal
    assert plain.rs_amp_sum == 200 * (n // 2)
    # the FIR output is the tone's MEAN (120) at every interior sample;
    # verify against the definitional kernel and pin interior values
    y = fir_decimate(np.frombuffer(tone, dtype=np.uint8))
    assert fir.fir_amp_sum == int(y.sum())
    assert all(int(v) == 120 for v in y[2:-2])
    # edge samples differ from the interior mean only because of zero
    # padding (ADVICE r7: the old disjunct form was vacuously true)
    assert int(y[0]) != 120 and int(y[-1]) != 120

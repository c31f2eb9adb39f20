"""Video leg of the multimodal stack (operators/video.py): the Y4M
parser on hand-built streams (header grammar, per-frame tags, guard
family), frame-sampling stride semantics, and the Spark
payload→decode→sample path against definitional Python."""

from __future__ import annotations

import hashlib

import pytest

from retail_datawarehouse_spark.operators.video import (
    SAMPLE_EVERY,
    decode_y4m,
    sample_frames,
    with_y4m_payload,
)


def _y4m(w, h, frames, header_extra=b"", frame_tag=b""):
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 Cmono%s\n" % (
        w,
        h,
        header_extra,
    )
    for fr in frames:
        out += b"FRAME" + frame_tag + b"\n" + fr
    return out


def test_decodes_hand_built_stream():
    frames = [b"abcdefghijkl", b"mnopqrstuvwx"]  # 4x3 mono
    assert decode_y4m(_y4m(4, 3, frames)) == (4, 3, 25, 1, frames)


def test_per_frame_tags_and_header_extensions_skipped():
    """The spec allows X extension tags in the header and parameters on
    FRAME marker lines — both are metadata, both must be walked over."""
    frames = [b"abcd", b"efgh"]
    got = decode_y4m(
        _y4m(2, 2, frames, header_extra=b" Xmeta=1", frame_tag=b" I1")
    )
    assert got == (2, 2, 25, 1, frames)


def test_fps_default_when_no_f_tag():
    raw = b"YUV4MPEG2 W2 H1 Cmono\nFRAME\nab"
    assert decode_y4m(raw) == (2, 1, 30, 1, [b"ab"])


@pytest.mark.parametrize(
    "raw, msg",
    [
        (b"YUV4MPEG2 W2 H1 Cmono", "truncated before the end"),
        (b"JUNKMPEG2 W2 H1 Cmono\nFRAME\nab", "not a YUV4MPEG2"),
        (b"YUV4MPEG2 Cmono\nFRAME\nab", "missing W/H"),
        # no C tag -> spec default 420 -> the named unsupported path
        (b"YUV4MPEG2 W2 H1\nFRAME\nab", "only Cmono"),
        (b"YUV4MPEG2 W2 H1 C420\nFRAME\nab", "only Cmono"),
        (b"YUV4MPEG2 W2 H1 Cmono\nFRAME\na", "overruns the payload"),
        (b"YUV4MPEG2 W2 H1 Cmono\nFRAME", "truncated inside a FRAME"),
        (b"YUV4MPEG2 W2 H1 Cmono\nFRAME\nabGRAME\ncd", "expected FRAME"),
    ],
)
def test_guard_family(raw, msg):
    with pytest.raises(ValueError, match=msg):
        decode_y4m(raw)


def test_spark_sampling_matches_definitional_python(spark):
    """with_y4m_payload → decode → sample == slicing the rpad'd text at
    stride SAMPLE_EVERY, across doc_ids covering every (W, H, n_frames)
    residue and a doc shorter than its raster (pad run)."""
    texts = {i: f"doc {i} text body {'z' * i}" for i in range(6)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.frame_idx): (r.frame_sum, r.frame_md5, r.duration_ms)
        for r in sample_frames(with_y4m_payload(docs)).collect()
    }
    want = {}
    for i, text in texts.items():
        w, h, nf = 4 + i % 3, 3 + i % 2, 2 + i % 3
        padded = text.ljust(nf * w * h, "x")[: nf * w * h]
        for k in range(0, nf, SAMPLE_EVERY):
            fr = padded[k * w * h : (k + 1) * w * h].encode()
            want[(i, k)] = (
                sum(fr),
                hashlib.md5(fr).hexdigest(),
                nf * 40.0,
            )
    assert got == want
    # the sampler kept strictly fewer rows than total frames (stride 2,
    # every fixture doc has nf >= 2)
    assert len(got) < sum(2 + i % 3 for i in range(6))
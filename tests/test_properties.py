"""Property-based fidelity tests (hypothesis): the smart-key rules
F1/F2 (zero-padded strings, SSMMHH ordering) must hold for ARBITRARY
dates/times, not just fixture values — a regression here silently
flips every oracle hash downstream."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_datawarehouse_spark.functions.keys import (
    date_key,
    month_key,
    time_bucket_period,
    time_key,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1901, 1, 1),
            max_value=dt.datetime(2199, 12, 31, 23, 59, 59),
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=40,
    )
)
def test_smart_keys_match_python_reference(spark, timestamps):
    """date_key==DDMMYYYY, month_key==MMYYYY, time_key==SSMMHH — each a
    zero-padded string identical to Python strftime on the same value."""
    df = spark.createDataFrame([(t,) for t in timestamps], ["ts"])
    rows = df.select(
        "ts",
        date_key(F.col("ts")).alias("dk"),
        month_key(F.col("ts")).alias("mk"),
        time_key(F.col("ts")).alias("tk"),
    ).collect()
    for r in rows:
        t = r["ts"]
        assert r["dk"] == t.strftime("%d%m%Y")
        assert r["mk"] == t.strftime("%m%Y")
        assert r["tk"] == f"{t.second:02d}{t.minute:02d}{t.hour:02d}"


def test_time_bucket_period_total_cover(spark):
    """Every hour 0-23 lands in exactly one period; boundaries per the
    reference spec (6-11 Morning, 12-17 Afternoon, 18-22 Evening)."""
    df = spark.range(24).select(F.col("id").cast("int").alias("h"))
    rows = {
        r["h"]: r["p"]
        for r in df.select(
            "h", time_bucket_period(F.col("h")).alias("p")
        ).collect()
    }
    expect = lambda h: (  # noqa: E731
        "Morning"
        if 6 <= h <= 11
        else "Afternoon"
        if 12 <= h <= 17
        else "Evening"
        if 18 <= h <= 22
        else "Night"
    )
    assert rows == {h: expect(h) for h in range(24)}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_zorder_value_interleaves_quantized_bits_exactly(spark, pairs):
    """zorder_value must be EXACTLY the bit interleaving of the two
    min-max-quantized coordinates for arbitrary non-negative ints: the
    even/odd bit planes of z reconstruct each column's quantization,
    and z stays within 2*bits total bits. This pins the arithmetic the
    multi-dimension locality guarantee rests on (a bit-order bug would
    still 'cluster' but on a garbled curve)."""
    from pyspark.sql import functions as FF

    from retail_datawarehouse_spark.sources.writers import (
        ZORDER_BITS,
        zorder_value,
    )

    df = spark.createDataFrame(pairs, "a long, b long")
    bounds = df.agg(
        *[
            agg(c).alias(f"__{tag}_{c}")
            for c in ("a", "b")
            for tag, agg in (("min", FF.min), ("max", FF.max))
        ]
    )
    rows = (
        df.crossJoin(FF.broadcast(bounds))
        .withColumn("z", zorder_value(["a", "b"]))
        .collect()
    )
    los = {c: min(p[i] for p in pairs) for i, c in enumerate("ab")}
    his = {c: max(p[i] for p in pairs) for i, c in enumerate("ab")}

    def quant(v, c):
        span = his[c] - los[c]
        if span <= 0:
            return 0
        import math

        return math.floor((v - los[c]) * ((1 << ZORDER_BITS) - 1) / span)

    for r in rows:
        qa, qb = quant(r.a, "a"), quant(r.b, "b")
        expect = 0
        for j in range(ZORDER_BITS):
            expect |= ((qa >> j) & 1) << (2 * j)
            expect |= ((qb >> j) & 1) << (2 * j + 1)
        assert r.z == expect, (r.a, r.b, r.z, expect)
        assert 0 <= r.z < (1 << (2 * ZORDER_BITS))


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(  # dim: key -> (version attrs, all_closed?)
        st.integers(min_value=0, max_value=7),
        st.tuples(
            st.lists(
                st.sampled_from(["A", "B", "C", None]), min_size=1, max_size=3
            ),
            st.booleans(),  # True = expired entity: every version closed
        ),
        min_size=0,
        max_size=6,
    ),
    st.dictionaries(  # change batch: key -> new attr (max 1 per key)
        st.integers(min_value=0, max_value=9),  # 8,9 = brand-new keys
        st.sampled_from(["A", "B", "C", None]),
        min_size=0,
        max_size=8,
    ),
)
def test_scd2_merge_batch_matches_python_reference(spark, dim_spec, changes_spec):
    """scd2_merge_batch vs an independent Python implementation of the
    documented semantics, over generated dims and change batches that
    include NULL attributes, multi-version histories, keys with no
    current match, brand-new keys, AND expired entities (all versions
    closed) — a change to an expired key must reactivate it at
    MAX(version_seq) + 1, never at a colliding seq 1."""
    from retail_datawarehouse_spark.dims.scd2 import scd2_merge_batch

    dim_rows, ref = [], []
    for k, (attrs, all_closed) in dim_spec.items():
        for i, a in enumerate(attrs):
            eff = f"2020-0{i + 1}-01"
            if i + 1 < len(attrs):
                end = f"2020-0{i + 2}-01"
            elif all_closed:
                end = f"2020-0{len(attrs) + 1}-01"
            else:
                end = None
            dim_rows.append(
                (k, k * 100 + i, a, eff, end, end is None, i + 1)
            )
    ch_rows = [(k, -k - 1, a, "2021-06-01") for k, a in changes_spec.items()]

    # Python reference: close/insert on attr change (NULL-safe) vs the
    # CURRENT version only; no-op on equal; insert for keys with no
    # current version at MAX(all version_seq) + 1 (0 for brand-new).
    cur = {r[0]: r for r in dim_rows if r[5]}
    max_seq = {}
    for r in dim_rows:
        max_seq[r[0]] = max(max_seq.get(r[0], 0), r[6])
    for r in dim_rows:
        k = r[0]
        if r[5] and k in changes_spec and changes_spec[k] != r[2]:
            ref.append((k, r[1], r[2], r[3], "2021-06-01", False, r[6]))
        else:
            ref.append(r)
    for k, a in changes_spec.items():
        if k not in cur or cur[k][2] != a:
            ref.append((k, -k - 1, a, "2021-06-01", None, True, max_seq.get(k, 0) + 1))

    schema = (
        "natural_key long, version_id long, attr_value string, "
        "effective_date string, end_date string, is_current boolean, "
        "version_seq long"
    )
    dim = spark.createDataFrame(dim_rows, schema) if dim_rows else spark.createDataFrame([], schema)
    ch_schema = (
        "natural_key long, version_id long, attr_value string, "
        "effective_date string"
    )
    changes = (
        spark.createDataFrame(ch_rows, ch_schema)
        if ch_rows
        else spark.createDataFrame([], ch_schema)
    )
    got = {tuple(r) for r in scd2_merge_batch(dim, changes).collect()}
    assert got == set(ref)


@settings(max_examples=50, deadline=None)
@given(
    samples=st.binary(min_size=0, max_size=200),
    rate=st.sampled_from([8000, 11025, 16000, 44100]),
)
def test_wav_decode_roundtrips_stdlib_writer(samples, rate):
    """Property: ANY byte string written as 8-bit mono PCM by the
    stdlib ``wave`` writer (the independent implementation) decodes
    back exactly — arbitrary sample bytes, several sample rates, empty
    clips included."""
    import io
    import wave as wave_mod

    from retail_datawarehouse_spark.operators.audio import decode_wav

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(samples)
    assert decode_wav(buf.getvalue()) == (rate, samples)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    n_frames=st.integers(min_value=0, max_value=6),
    fps=st.tuples(
        st.integers(min_value=1, max_value=60),
        st.integers(min_value=1, max_value=4),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_y4m_decode_roundtrips_definitional_builder(w, h, n_frames, fps, seed):
    """Property: any (dims, frame count, fps) stream built by a
    definitional Python byte-assembler — including zero-frame streams
    and frame rasters containing newline/space bytes, which a naive
    line-oriented parser would trip on — decodes back exactly."""
    from retail_datawarehouse_spark.operators.video import decode_y4m

    num, den = fps
    # deterministic pseudo-random rasters incl. \n and ' ' bytes
    frames = [
        bytes(
            (seed + 31 * k + 7 * i) % 256 for i in range(w * h)
        )
        for k in range(n_frames)
    ]
    raw = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 Cmono\n".encode()
    for fr in frames:
        raw += b"FRAME\n" + fr
    assert decode_y4m(raw) == (w, h, num, den, frames)


@settings(max_examples=12, deadline=None)
@given(
    texts=st.lists(
        st.text(
            # printable ASCII incl. the marker characters < / w > and
            # punctuation — a merged symbol can become the literal
            # string '</w>' and MUST keep agreeing (both engines work
            # in the string domain, so the collision is symmetric)
            alphabet=st.sampled_from(list("abcw</>.!? ")),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_bpe_train_and_apply_match_python_reference_fuzz(
    spark, texts, rounds
):
    """Property: trainer AND encoder agree with the pure-Python
    Sennrich reference on arbitrary ASCII corpora — multi-space runs
    (empty-token filtering), marker-character words, short/empty docs.
    Skips draws whose corpus has no pairs to merge (both sides would
    raise/no-op)."""
    import hashlib

    from tests.test_bpe import _docs, _py_bpe

    from retail_datawarehouse_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
    )

    words = [w for t in texts for w in t.lower().split(" ") if w]
    if not words:
        return  # nothing to train on; vocab empty in both engines
    try:
        want = _py_bpe(texts, rounds, cap=30)
    except ValueError:  # a round ran out of pairs (all 1-char words)
        return
    if len(want) < rounds:
        return
    docs = _docs(spark, texts)
    merges = train_bpe(docs, rounds=rounds, cap=30)
    got = [
        (r.round, r.pair, r.cnt) for r in merges.orderBy("round").collect()
    ]
    assert got == want

    rules = [tuple(p.split(" ", 1)) for _, p, _ in want]

    def enc(w):
        toks = list(w) + ["</w>"]
        for a, b in rules:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return toks

    applied = {
        r.doc_id: (r.bpe_tokens, r.ws_tokens, r.enc_md5)
        for r in apply_bpe(docs, merges).collect()
    }
    for doc_id, t in enumerate(texts):
        ws = [w for w in t.lower().split(" ") if w]
        encs = ["  ".join(enc(w)) for w in ws]
        assert applied[doc_id] == (
            sum(len(e.split("  ")) for e in encs),
            len(ws),
            hashlib.md5("|".join(encs).encode()).hexdigest(),
        )

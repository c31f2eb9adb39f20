"""BPE merge-rule trainer (operators/bpe.py) against an independent
pure-Python Sennrich implementation: merge sequence + counts equality,
greedy non-overlap merge semantics, deterministic tie-breaking, and
the vocab-cap contract."""

from __future__ import annotations

from collections import Counter

from retail_datawarehouse_spark.operators.bpe import train_bpe, word_vocab


def _py_bpe(texts, rounds, cap):
    words = Counter(
        w for t in texts for w in t.lower().split(" ") if w
    )
    vocab = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    seqs = [(list(w) + ["</w>"], f) for w, f in vocab]
    merges = []
    for r in range(rounds):
        pc = Counter()
        for toks, f in seqs:
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += f
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((r + 1, best[0] + " " + best[1], pc[best]))
        new = []
        for toks, f in seqs:
            out, i = [], 0
            while i < len(toks):  # greedy left-to-right, non-overlapping
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == best:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append((out, f))
        seqs = new
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_trainer_matches_python_reference_sennrich_corpus(spark):
    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low",
    ]
    got = [
        (r.round, r.pair, r.cnt)
        for r in train_bpe(_docs(spark, texts), rounds=6, cap=50)
        .orderBy("round")
        .collect()
    ]
    assert got == _py_bpe(texts, 6, 50)
    # the textbook sequence: suffix 'est</w>' assembles first
    assert [p for _, p, _ in got[:3]] == ["e s", "es t", "est </w>"]


def test_overlapping_pairs_count_but_merge_greedy_non_overlapping(spark):
    # 'aaaa' x3: pair (a,a) counts 3 per word (overlaps count), but the
    # merge is greedy non-overlap -> 'aa aa </w>', so round 2's pairs are
    # (aa,aa) and (aa,</w>) tied at 3 — NOT (a,a) again (which a
    # single-space boundary encoding would leave behind). The tie-break
    # picks 'aa </w>' ('<' sorts before 'a' bytewise).
    texts = ["aaaa aaaa aaaa b"]
    got = [
        (r.round, r.pair, r.cnt)
        for r in train_bpe(_docs(spark, texts), rounds=2, cap=50)
        .orderBy("round")
        .collect()
    ]
    assert got == _py_bpe(texts, 2, 50)
    assert got[0] == (1, "a a", 9)  # 3 overlapping occurrences x f=3
    assert got[1] == (2, "aa </w>", 3)


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' both appear twice -> pairs (x,y),(a,b) tie at 2
    # (plus the </w> pairs, also at 2); lexicographic min is 'a b'
    texts = ["xy xy ab ab"]
    got = train_bpe(_docs(spark, texts), rounds=1, cap=50).collect()
    assert [(r.round, r.pair, r.cnt) for r in got] == _py_bpe(texts, 1, 50)
    assert got[0].pair == "a b"


def test_apply_bpe_matches_python_encoder(spark):
    """apply_bpe == the definitional per-word greedy encoder run with
    the SAME learned merges (in learned order), including a doc with a
    word the capped vocab never saw (merges still apply to its
    substrings) and an empty-after-filter doc (0 tokens, md5(''))."""
    from retail_datawarehouse_spark.operators.bpe import apply_bpe

    train_texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low",
    ]
    docs = _docs(spark, train_texts + ["slowest unseen", " "])
    merges = train_bpe(docs, rounds=6, cap=50)
    got = {
        r.doc_id: (r.bpe_tokens, r.ws_tokens, r.enc_md5)
        for r in apply_bpe(docs, merges).collect()
    }

    rules = [tuple(r.pair.split(" ")) for r in merges.orderBy("round").collect()]

    def py_encode_word(w):
        toks = list(w) + ["</w>"]
        for a, b in rules:  # learned order, full greedy pass each
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

    import hashlib

    for doc_id, text in enumerate(train_texts + ["slowest unseen", " "]):
        words = [w for w in text.lower().split(" ") if w]
        encs = ["  ".join(py_encode_word(w)) for w in words]
        want = (
            sum(len(e.split("  ")) for e in encs),
            len(words),
            hashlib.md5("|".join(encs).encode()).hexdigest(),
        )
        assert got[doc_id] == want, f"doc {doc_id}: {got[doc_id]} != {want}"
    assert got[3][0] == 0  # whitespace-only doc encodes to zero tokens


def test_vocab_cap_deterministic(spark):
    # 5 distinct words, cap 2: top-2 by (freq desc, word asc) only
    texts = ["c c c b b a a z q"]
    v = {r.w: r.f for r in word_vocab(_docs(spark, texts), cap=2).collect()}
    assert v == {"c": 3, "a": 2}  # 'a' beats 'b'? no: both f=2, 'a' < 'b'


def test_merge_table_is_a_storable_artifact(spark, tmp_path):
    """The production tokenizer discipline: TRAIN once, store the merge
    table, APPLY from the stored artifact in later sessions. A
    parquet-round-tripped merge table must encode identically to the
    in-memory one — order carried by the `round` column, not row order
    (parquet readback has no order guarantee)."""
    from retail_datawarehouse_spark.operators.bpe import apply_bpe

    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low",
    ]
    docs = _docs(spark, texts)
    merges = train_bpe(docs, rounds=6, cap=50)
    path = str(tmp_path / "merges")
    merges.write.parquet(path)
    reloaded = spark.read.parquet(path)
    live = sorted(
        tuple(r) for r in apply_bpe(docs, merges).collect()
    )
    stored = sorted(
        tuple(r) for r in apply_bpe(docs, reloaded).collect()
    )
    assert live == stored

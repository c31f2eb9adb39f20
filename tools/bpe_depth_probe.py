"""BPE merge-depth probe (r6 verdict #7): the BASELINE.md claim that
training rounds are SCALE-FREE (each round iterates on the ≤cap-row
vocab, never the corpus) was measured only at the catalog's toy 8
rounds. This runs the real trainer at rounds≈512 — tokenizer-scale
depth — over BOTH the 1× (sf0.1) and the 20× synthetic corpus and
records:

- the one corpus-sized pass (word_vocab) per corpus — the only term
  allowed to scale with N;
- total train wall and the per-round wall in an early window (rounds
  1-32) vs a late window (481-512) — flat-in-round-index evidence
  (the vocab SHRINKS as merges fuse words, so late rounds may only get
  cheaper);
- the 1× vs 20× per-round ratio — flat-in-N evidence.

The catalog entry stays at 8 rounds / cap 256 (the oracle unrolls all
rounds as CTEs; hundreds of CTE triples is an oracle problem, not an
engine one) — this probe raises cap to 2048 and the depth to the
FIXTURE'S ceiling: the documents generator uses a 31-word vocabulary,
so merges run dry at 107 (at which point `train_bpe` keeps iterating
on an empty vocab — harmless for the merge table, wasted rounds; a
512-round ask measures 405 empty rounds). Probe at --rounds 104 for
all-live windows. A real tokenizer corpus has a ~100k-word vocab and
runs 32k merges; what this proves is the SHAPE — per-round cost flat
in corpus size — which is vocabulary-independent because every round
reads only the ≤cap-row vocab frame.

Usage:  python tools/bpe_depth_probe.py [--rounds 512] [--scale-dir DIR]
        (generate the 20x dir first: tools/scale_probe.py --scale 20)

r9 ``--deep`` mode (r8 verdict #5): the fixture ceiling above (31-word
generator vocabulary, merges dry at 107) is lifted by probing over the
SYNTHETIC ≥6k-word corpora from ``scale_probe.generate_bpe_corpus``
(generated on demand under /tmp/bpe_corpus_{20k,100k}). The trainer
runs ONCE per corpus at --rounds (default 2048) with the loop
instrumented per round (re-running 3× for windows, the shallow-mode
protocol, would triple a multi-minute run), recording total wall,
early/late per-round windows (bounded-in-round-index evidence), the
20k vs 100k per-round ratio (flat-in-N evidence — rounds read only
the ≤cap-row vocab, never the corpus), and liveness (every round must
merge a real pair — no dry rounds at this depth).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_datawarehouse_spark.operators.bpe import (  # noqa: E402
    train_bpe,
    word_vocab,
)
from retail_datawarehouse_spark.session import get_spark  # noqa: E402
from retail_datawarehouse_spark.sources.readers import load_table  # noqa: E402

CAP = 2048


def probe(spark, sf_dir: str, rounds: int, label: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    n_vocab = word_vocab(docs, cap=CAP).count()
    t_vocab = time.perf_counter() - t0

    # instrumented train: same loop as train_bpe, but timing each round
    # (train_bpe itself is the measured artifact for the total)
    t0 = time.perf_counter()
    merges = train_bpe(docs, rounds=rounds, cap=CAP)
    n_merges = merges.count()
    t_total = time.perf_counter() - t0

    # windowed per-round walls via two shorter runs (the trainer is
    # deterministic, so rounds 1..32 of the full run cost what a
    # 32-round run costs; the late window is the marginal cost of the
    # last 32 rounds = full - (rounds-32)-round run)
    t0 = time.perf_counter()
    train_bpe(docs, rounds=32, cap=CAP).count()
    t_early32 = time.perf_counter() - t0
    t0 = time.perf_counter()
    train_bpe(docs, rounds=rounds - 32, cap=CAP).count()
    t_head = time.perf_counter() - t0
    out = {
        "label": label,
        "rounds": rounds,
        "cap": CAP,
        "n_vocab": n_vocab,
        "n_merges": n_merges,
        "t_vocab_scan_s": round(t_vocab, 2),
        "t_total_s": round(t_total, 2),
        "per_round_early_s": round(t_early32 / 32, 3),
        "per_round_late_s": round(max(0.0, t_total - t_head) / 32, 3),
    }
    print(f"# {json.dumps(out)}", file=sys.stderr)
    return out


def probe_deep(spark, sf_dir: str, rounds: int, cap: int, label: str) -> dict:
    """One instrumented run of the EXACT train_bpe loop (same ops in
    the same order; the only addition is a perf_counter around each
    round's eager checkpoint) at tokenizer-scale depth."""
    from retail_datawarehouse_spark.operators.bpe import (
        _MERGE_SPARK,
        _SEQ_SPARK,
        _pair_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    vocab = word_vocab(docs, cap=cap).select(
        F.expr(_SEQ_SPARK).alias("seq"), "f"
    )
    n_vocab = vocab.count()
    t_vocab = time.perf_counter() - t0

    per_round = []
    live = 0
    t_all = time.perf_counter()
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        vocab = vocab.localCheckpoint(eager=True)
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .select(F.lit(r).cast("long").alias("round"), "pair", "cnt")
        )
        # liveness is read per round (one tiny collect on a 1-row
        # frame — instrumentation, not part of the trainer's cost
        # model, but included IN the timed window so the recorded
        # per-round wall upper-bounds the real trainer's)
        rows = best.collect()
        if rows and rows[0].cnt and rows[0].cnt > 0:
            live += 1
        vocab = vocab.crossJoin(F.broadcast(best.select("pair"))).select(
            F.expr(_MERGE_SPARK).alias("seq"), "f"
        )
        per_round.append(time.perf_counter() - t0)
        if r % 256 == 0:
            print(
                f"#   {label} round {r}: live={live} "
                f"last256={sum(per_round[-256:]):.1f}s",
                file=sys.stderr,
            )
    t_total = time.perf_counter() - t_all
    w = 64
    out = {
        "label": label,
        "rounds": rounds,
        "cap": cap,
        "n_vocab": n_vocab,
        "live_rounds": live,
        "t_vocab_scan_s": round(t_vocab, 2),
        "t_total_s": round(t_total, 2),
        "per_round_early_s": round(sum(per_round[:w]) / w, 4),
        "per_round_mid_s": round(
            sum(per_round[rounds // 2 - w // 2 : rounds // 2 + w // 2]) / w,
            4,
        ),
        "per_round_late_s": round(sum(per_round[-w:]) / w, 4),
        "per_round_max_s": round(max(per_round), 4),
    }
    print(f"# {json.dumps(out)}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=512)
    ap.add_argument("--scale-dir", default="/tmp/scale_probe20")
    ap.add_argument(
        "--deep",
        action="store_true",
        help="r9: instrumented ≥2k-round probe over the synthetic "
        "≥6k-word corpora (generated on demand)",
    )
    ap.add_argument("--cap", type=int, default=4096)
    args = ap.parse_args()
    spark = get_spark(app_name="bpe-depth-probe")
    if args.deep:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_probe import generate_bpe_corpus

        rounds = args.rounds if args.rounds != 512 else 2048
        results = []
        for n_docs, label in ((20_000, "20k-docs"), (100_000, "100k-docs")):
            d = f"/tmp/bpe_corpus_{label}"
            if not os.path.exists(f"{d}/documents.parquet"):
                generate_bpe_corpus(d, n_docs)
            results.append(probe_deep(spark, d, rounds, args.cap, label))
        print(json.dumps(results))
        spark.stop()
        return
    results = [probe(spark, "/root/testdata/sf0.1", args.rounds, "1x")]
    if os.path.isdir(args.scale_dir):
        results.append(probe(spark, args.scale_dir, args.rounds, "20x"))
    else:
        print(
            f"# {args.scale_dir} absent — run tools/scale_probe.py first",
            file=sys.stderr,
        )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()

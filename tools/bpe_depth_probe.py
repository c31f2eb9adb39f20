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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=512)
    ap.add_argument("--scale-dir", default="/tmp/scale_probe20")
    args = ap.parse_args()
    spark = get_spark(app_name="bpe-depth-probe")
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

"""Driver-contract verification: run every __spark_entry__.queries()
entry side-by-side with its oracle_sql() on DuckDB at a given sf dir,
compare rows/schema/value-hash exactly the way the round driver does
(sort columns by name, stringify, sort rows, hash). Exit non-zero on
any mismatch.

Usage: python tools/oracle_check.py [sf_dir] [entry ...]
"""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def frame_hash(df):
    """pandas frame -> (nrows, sorted cols, value hash)."""
    cols = sorted(df.columns)
    d = df[cols]
    rows = sorted(
        tuple("NULL" if v != v or v is None else str(v) for v in r)
        for r in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest()[:16]


def norm(df):
    import numpy as np

    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else v
            )
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
    return df


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from retail_datawarehouse_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = norm(fn(spark, sf).toPandas())
        if name not in osql:
            print(f"{name}: rows={len(sdf)} (no oracle) {time.time()-t0:.1f}s")
            continue
        odf = norm(con.sql(osql[name]).df())
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        ok = (sn, sc, sh) == (on, oc, oh)
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} rows={sn}/{on} "
            f"hash={sh}/{oh} {time.time()-t0:.1f}s"
        )
        if not ok:
            if sc != oc:
                print(f"  spark cols: {sc}\n  oracle cols: {oc}")
            bad.append(name)
    print(f"{'FAIL ' + str(bad) if bad else 'ALL OK'}")
    return 1 if bad else 0


if __name__ == "__main__":
    main() and sys.exit(1)

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


def bulk_compare(spark, con, name, fn, sql, sf) -> bool:
    """Large-result compare, no pandas: the Spark result lands as
    parquet, DuckDB evaluates the oracle, and equality is two
    EXCEPT ALL counts over VARCHAR-cast columns (both sides formatted
    by DuckDB, so doubles compare bit-for-bit — the engine's
    determinism contract makes that exact, not flaky)."""
    import tempfile

    t0 = time.time()
    out = tempfile.mkdtemp(prefix=f"oc_{name}_")
    sdf = fn(spark, sf)
    cols = sorted(sdf.columns)
    sdf.write.mode("overwrite").parquet(out)
    sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in cols)
    spark_side = f"SELECT {sel} FROM read_parquet('{out}/*.parquet')"
    oracle_side = f"SELECT {sel} FROM ({sql})"
    ocols = sorted(
        r[0] for r in con.sql(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    )
    n_s = con.sql(f"SELECT count(*) FROM ({spark_side})").fetchone()[0]
    n_o = con.sql(f"SELECT count(*) FROM ({oracle_side})").fetchone()[0]
    d1 = con.sql(
        f"SELECT count(*) FROM (({spark_side}) EXCEPT ALL ({oracle_side}))"
    ).fetchone()[0]
    d2 = con.sql(
        f"SELECT count(*) FROM (({oracle_side}) EXCEPT ALL ({spark_side}))"
    ).fetchone()[0]
    ok = ocols == cols and n_s == n_o and d1 == 0 and d2 == 0
    print(
        f"{name}: {'OK' if ok else 'MISMATCH'} rows={n_s}/{n_o} "
        f"diff={d1}+{d2} {time.time()-t0:.1f}s"
    )
    if ocols != cols:
        print(f"  spark cols: {cols}\n  oracle cols: {ocols}")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    return ok


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from retail_datawarehouse_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--bulk"]
    bulk = "--bulk" in sys.argv
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
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
        if bulk:
            if name in osql and not bulk_compare(
                spark, con, name, fn, osql[name], sf
            ):
                bad.append(name)
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

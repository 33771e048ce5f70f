"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql() on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
stringified form, floats canonicalized via repr(float64)).

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.astype("float64").map(lambda x: repr(x) if x == x else "nan")
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64").map(repr)
        elif str(s.dtype).startswith("datetime"):
            df[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        else:
            df[c] = s.map(lambda x: "NULL" if x is None or x != x else str(x))
    rows = sorted("\x1f".join(r) for r in df.astype(str).itertuples(index=False))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), list(df.columns), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    from nifi_daffodil_spark.session import build_session

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    spark = build_session(app_name="check_oracle", cores=8)
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?   {name:28s} rows={len(sdf)} (no oracle; rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {e}")
            failures.append(name)
            continue
        n1, c1, h1 = canon(sdf)
        n2, c2, h2 = canon(odf)
        dt = time.monotonic() - t0
        if (n1, c1, h1) == (n2, c2, h2):
            print(f"OK    {name:28s} rows={n1} hash={h1} ({dt:.1f}s)")
        else:
            print(
                f"FAIL  {name:28s} spark(rows={n1},cols={c1},h={h1}) "
                f"!= duckdb(rows={n2},cols={c2},h={h2})"
            )
            failures.append(name)
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

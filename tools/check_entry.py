"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and (order-insensitive) values.

Usage: python tools/check_entry.py [--strict] [sf_dir] [query ...]

--strict mimics the driver's hash gate: after sorting columns by name and
rows by value, cell values must be EXACTLY equal and dtypes must agree in
kind (int64 vs float64 vs object counts as a mismatch). This catches the
representation-level failures (DuckDB HUGEINT sums -> float64, Spark
decimal sums -> Decimal objects) that the tolerant compare normalizes away.
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if not strict and s.map(lambda x: isinstance(x, Decimal)).any():
            pdf[c] = s.astype(float).round(6)
        elif s.dtype == object and s.map(lambda x: isinstance(x, list)).any():
            pdf[c] = s.map(lambda x: str(x))
        elif not strict and s.dtype.kind == "f":
            pdf[c] = s.round(6)
        elif str(s.dtype).startswith("datetime64"):
            s2 = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
            # unify resolution: spark gives ns, duckdb us — int compare breaks
            pdf[c] = s2.astype("datetime64[ns]")
    sort_cols = [c for c in pdf.columns if pdf[c].dtype != object
                 or not pdf[c].map(lambda x: isinstance(x, (list, dict))).any()]
    return pdf.sort_values(by=sort_cols or list(pdf.columns)).reset_index(drop=True)


def strict_mismatch(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Driver-hash proxy: dtype kinds and exact values must agree."""
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return f"dtype kind {c}: spark={a[c].dtype} vs oracle={b[c].dtype}"
        if a[c].dtype == object:
            sa, sb = a[c].map(repr), b[c].map(repr)
            if not sa.equals(sb):
                i = (sa != sb).idxmax()
                return f"value {c}[{i}]: {sa[i][:80]} vs {sb[i][:80]}"
        else:
            # same kind, possibly different width (int32 vs int64): the
            # driver's hash normalizes width, so compare values elementwise
            neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
            if neq.any():
                i = neq.idxmax()
                return f"value {c}[{i}]: {a[c][i]!r} vs {b[c][i]!r}"
    return None


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from cis455crawler_spark.session import get_spark

    spark = get_spark(cores=8, app_name="check_entry")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"[FAIL-SPARK] {name}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"[FAIL-DUCK ] {name}: {str(e)[:300]}")
            continue
        a, b = normalize(sdf, strict), normalize(ddf, strict)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            print(f"[FAIL-COLS ] {name}: {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"[FAIL-ROWS ] {name}: {len(a)} vs {len(b)}")
            continue
        if strict:
            msg = strict_mismatch(a, b)
            if msg is None:
                print(f"[OK-STRICT ] {name}: {len(a)} rows")
            else:
                failures.append((name, msg))
                print(f"[FAIL-HASH ] {name}: {msg[:200]}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-5)
            print(f"[OK        ] {name}: {len(a)} rows")
        except AssertionError as e:
            failures.append((name, "values"))
            diff = (a != b)
            bad_cols = [c for c in a.columns if diff[c].any()] if len(a) == len(b) else []
            print(f"[FAIL-VALS ] {name}: cols {bad_cols}: {str(e).splitlines()[-1][:200]}")

    print(f"\n{len(failures)} failures / {len(only) if only else len(qs)} checked")
    for n, r in failures:
        print("  -", n, ":", r[:160])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf and compares against its
``oracle_sql()`` in DuckDB: row count, sorted-column schema, and an
order-insensitive value hash (rows sorted by all columns, columns
sorted by name). Usage::

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name:>24}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name:>24}: {len(ours)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            theirs = canon(con.execute(sqls[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name:>24}: oracle raised {type(ex).__name__}: {ex}")
            continue
        problems = []
        if len(ours) != len(theirs):
            problems.append(f"rowcount {len(ours)} != {len(theirs)}")
        if list(ours.columns) != list(theirs.columns):
            problems.append(f"schema {list(ours.columns)} != {list(theirs.columns)}")
        elif len(ours) == len(theirs) and value_hash(ours) != value_hash(theirs):
            problems.append("value-hash mismatch")
            for c in ours.columns:
                a, b = ours[c], theirs[c]
                if a.dtype.kind == "f":
                    same = np.isclose(a, b, equal_nan=True, rtol=0, atol=0)
                else:
                    same = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                if not same.all():
                    i = int(np.flatnonzero(~same)[0])
                    problems.append(
                        f"  col {c}: first diff row {i}: ours={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                    )
        if problems:
            failures.append(name)
            print(f"FAIL  {name:>24}: " + "; ".join(problems))
        else:
            print(f"ok    {name:>24}: {len(ours)} rows [{dt:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

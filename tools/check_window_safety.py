"""Driver-exact canonicalization check over the curated _WINDOW.

tools/check_correctness.py (the full mirror) canonicalizes values itself
and is MORE LENIENT than the driver's gate: the driver converts both
result sets to pandas, sorts rows with ``DataFrame.sort_values`` over all
columns, and hashes dtype-sensitively. That contract breaks in two ways
the mirror can't see (both bit us in round 5, CORRECTNESS_r05.json):

1. array/map/struct output columns — pandas can't sort or hash object
   columns of lists ("TypeError: unhashable type: 'list'") → hard error.
2. dtype drift — e.g. DuckDB SUM(BIGINT) → HUGEINT → float64 under
   ``.df()`` vs Spark int64: identical values, different hash.

This tool replays that exact failure surface for every _WINDOW query:
run both engines at the given sf, emulate the pandas canon, and report
SCHEMA (non-scalar column), DTYPE (canonical dtypes differ), HASH
(dtype-sensitive value hash differs), or OK per query.

Emulation notes: float columns are rounded to 9dp before hashing (the
window's float outputs are engineered to be 6dp-exact on both engines,
so this only absorbs representation noise, mirroring the driver's float
tolerance); datetime-like columns are normalized to ns-resolution
datetime64 on both sides (Spark's Arrow path and DuckDB's .df() disagree
on date/timestamp dtype but the driver's gate passes such queries, so
its canon must do the equivalent).

Usage: python tools/check_window_safety.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_SCALAR_KINDS = set("biufcOSUM m".replace(" ", ""))  # numpy dtype kinds


def canon_pandas(df: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Driver-style canonicalization: sorted column order, normalized
    dtypes, row sort over all columns. Returns (canon_df, problems)."""
    import datetime
    import decimal

    problems: list[str] = []
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            sample = s.dropna()
            first = sample.iloc[0] if len(sample) else None
            if isinstance(first, (list, tuple, dict, np.ndarray)):
                problems.append(f"non-scalar column {c!r}")
                continue
            # dates / decimals / strings: normalize by sample type
            if isinstance(first, (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[ns]")
            elif isinstance(first, decimal.Decimal):
                df[c] = pd.to_numeric(s).astype("float64").round(9)
            else:
                df[c] = s.astype(str).where(s.notna(), None)
        elif s.dtype.kind == "M":
            df[c] = s.astype("datetime64[ns]")
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64").round(9)
        elif s.dtype.kind in "iu":
            # hash_pandas_object widens every integer dtype to uint64
            # before hashing, so int width never splits the driver's
            # hash — only int-vs-float (the r5 X3 failure) does.
            df[c] = s.astype("int64")
    if problems:
        return df, problems
    try:
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    except TypeError as e:
        problems.append(f"sort_values failed: {e}")
    return df, problems


def run(sf_dir: str, only: set[str], all_oracle: bool = False) -> int:
    import __spark_entry__ as entrymod
    from hg_data_pipelines_spark.queries import _WINDOW
    from hg_data_pipelines_spark.session import get_spark

    spark = get_spark("window-safety", cpus=16)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = (
        [n for n in qs if n in oracles] if all_oracle else list(_WINDOW)
    )
    n_bad = 0
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"SPARK-ERR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        sc, sp = canon_pandas(sdf)
        oc, op = canon_pandas(odf)
        if sp or op:
            print(f"SCHEMA {name}: spark={sp} oracle={op}")
            n_bad += 1
            continue
        sd = {c: str(sc[c].dtype) for c in sc.columns}
        od = {c: str(oc[c].dtype) for c in oc.columns}
        if sd != od:
            diff = {
                c: (sd.get(c), od.get(c))
                for c in set(sd) | set(od)
                if sd.get(c) != od.get(c)
            }
            print(f"DTYPE {name}: {diff}")
            n_bad += 1
            continue
        if len(sc) != len(oc):
            print(f"ROWS {name}: spark={len(sc)} oracle={len(oc)}")
            n_bad += 1
            continue
        sh = pd.util.hash_pandas_object(sc, index=False).to_numpy()
        oh = pd.util.hash_pandas_object(oc, index=False).to_numpy()
        if not np.array_equal(sh, oh):
            bad = int(np.argmax(sh != oh))
            print(
                f"HASH {name}: first diff row {bad}:"
                f" spark={sc.iloc[bad].to_dict()}"
                f" oracle={oc.iloc[bad].to_dict()}"
            )
            n_bad += 1
            continue
        print(f"OK {name} ({len(sc)} rows, {time.time()-t0:.1f}s)")
    return n_bad


if __name__ == "__main__":
    # --all: sweep EVERY oracle-checked query, not just the curated
    # window — catches dtype drift in queries a future rotation would
    # bring in (the r9 LM-family HUGEINT lesson).
    args = [a for a in sys.argv[1:] if a != "--all"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    bad = run(sf_dir, set(args[1:]), all_oracle="--all" in sys.argv[1:])
    print(f"== {'ALL WINDOW-SAFE' if not bad else f'{bad} UNSAFE'} ==")
    sys.exit(1 if bad else 0)

"""Local mirror of the driver's t2 gate: run every declared query in Spark
AND its DuckDB oracle, compare row count, column names, and an
order-insensitive value hash (floats rounded to 9dp).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9f}".rstrip("0").rstrip(".") if v == v else "NaN"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hg_data_pipelines_spark.session import get_spark

    spark = get_spark("t2-mirror", cpus=16)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh = table_hash(scols, [[r[c] for c in scols] for r in srows])
            oh = table_hash(ocols, orows)
            if sh != oh:
                # find first differing canonical line for debugging
                so = sorted(
                    "\x01".join(
                        canon(r[c]) for c in sorted(scols)
                    )
                    for r in [dict(zip(scols, [row[c] for c in scols])) for row in srows]
                )
                oo = sorted(
                    "\x01".join(canon(v) for v in [r[i] for i in sorted(range(len(ocols)), key=lambda i: ocols[i])])
                    for r in orows
                )
                diff = next(
                    (f"spark[{i}]={a!r} oracle[{i}]={b!r}" for i, (a, b) in enumerate(zip(so, oo)) if a != b),
                    "tail rows differ",
                )
                problems.append(f"value hash mismatch; first diff: {diff[:400]}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

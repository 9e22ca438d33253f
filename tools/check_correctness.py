"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf, compare row count + column set + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value canonicalization: floats to a stable repr
        return f"{v:.9g}"
    return str(v)


def row_key(row, cols_order):
    return tuple(canon(row[i]) for i in cols_order)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from alaska_etl_spark.session import get_spark

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        sidx = [sdf.columns.index(c) for c in scols]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols_raw = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {e}")
            failures.append(name)
            continue
        ocols = sorted(ocols_raw)
        oidx = [ocols_raw.index(c) for c in ocols]
        ok = True
        if scols != ocols:
            print(f"{name:28s} COLUMN MISMATCH spark={scols} oracle={ocols}")
            ok = False
        elif len(srows) != len(orows):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            sset = sorted(row_key(r, sidx) for r in srows)
            oset = sorted(row_key(r, oidx) for r in orows)
            if sset != oset:
                ndiff = sum(1 for a, b in zip(sset, oset) if a != b)
                print(f"{name:28s} VALUE MISMATCH ({ndiff}/{len(sset)} rows differ)")
                for a, b in list(zip(sset, oset))[:50]:
                    if a != b:
                        print(f"    spark : {a}")
                        print(f"    oracle: {b}")
                        break
                ok = False
        if ok:
            print(f"{name:28s} OK ({len(srows)} rows)")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()

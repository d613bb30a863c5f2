"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet dir, compare row count, column names/types, and
order-insensitive values (doubles rounded).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from cloud_based_bi_etl_automation_for_real_estate_company_spark.session import (
    TABLES,
    get_spark,
)
import __spark_entry__ as entrymod

ROUND = int(__import__("os").environ.get("CHECK_ROUND", "6"))


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, ROUND)
    return v


def rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in idx))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
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
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        # Driver-hash hazard: the driver compares via pandas frames, so a
        # DuckDB HUGEINT/DECIMAL column (e.g. SUM over BIGINT) against a
        # Spark BIGINT/DOUBLE column hash-mismatches even when the Python
        # values are equal. Surface the class mismatch locally.
        sfields = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        def _cls(t):
            t = t.lower()
            if t in ("tinyint", "smallint", "int", "integer", "bigint",
                     "hugeint", "utinyint", "usmallint", "uinteger",
                     "ubigint"):
                return "int128" if t == "hugeint" else "int"
            if t.startswith("decimal"):
                return "decimal:" + t
            if t in ("float", "double", "real"):
                return "float"
            if t in ("string", "varchar", "text"):
                return "str"
            if t in ("boolean", "bool"):
                return "bool"
            if t in ("date",):
                return "date"
            if t.startswith("timestamp"):
                return "ts"
            return "other:" + t
        for c, dt in zip(dcols, dtypes):
            st = sfields.get(c)
            if st is None:
                continue
            sc, dc = _cls(st), _cls(dt)
            if sc != dc:
                ok = False
                msgs.append(
                    f"TYPEHAZARD col {c}: spark={st} duckdb={dt}"
                )
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if ok:
            sset = rows_to_set(scols, [[r[c] for c in scols] for r in srows])
            dset = rows_to_set(dcols, drows)
            if sset != dset:
                ok = False
                diff_s = [r for r in sset if r not in dset][:3]
                diff_d = [r for r in dset if r not in sset][:3]
                msgs.append(f"values differ; spark-only={diff_s} duckdb-only={diff_d}")
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

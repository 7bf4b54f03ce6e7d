"""Local replica of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() twin on DuckDB over the same
parquet tables, compare row counts, column names, and a value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(val):
    import math
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.9g}"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    return str(val)


def _hash_rows(cols, rows):
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    results = {}

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    bad = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            print(f"{name}: (no oracle - rows-only check)")
            try:
                n = fn(spark, sf_dir).count()
                print(f"  spark rows={n}")
                results[name] = {"spark_rows": n, "oracle_rows": None,
                                 "rows_match": None, "schema_match": None,
                                 "hash_match": None, "err": None}
            except Exception as e:
                bad += 1
                print(f"  SPARK ERROR: {e}")
                results[name] = {"err": f"{type(e).__name__}: {str(e)[:300]}"}
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            bad += 1
            print(f"{name}: SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"err": f"SPARK {type(e).__name__}: {str(e)[:300]}"}
            continue
        try:
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            bad += 1
            print(f"{name}: DUCK ERROR: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"err": f"DUCK {type(e).__name__}: {str(e)[:300]}"}
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (_hash_rows(scols, srows) == _hash_rows(ocols, orows)
                   if rows_ok and schema_ok else False)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "MISMATCH"
        if status != "OK":
            bad += 1
        results[name] = {"spark_rows": len(srows), "oracle_rows": len(orows),
                         "rows_match": rows_ok, "schema_match": schema_ok,
                         "hash_match": hash_ok, "err": None}
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
              f"schema={'ok' if schema_ok else f'{sorted(scols)} vs {sorted(ocols)}'} "
              f"hash={'ok' if hash_ok else 'BAD'}")
        if not hash_ok and rows_ok and schema_ok:
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ss = sorted("\x1f".join(_canon(r[i]) for i in order_s) for r in srows)
            oo = sorted("\x1f".join(_canon(r[i]) for i in order_o) for r in orows)
            for a, b in zip(ss, oo):
                if a != b:
                    print(f"  spark: {a[:220]}")
                    print(f"  duck : {b[:220]}")
                    break
    if json_path:
        import json
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(results)} queries)")
    print("DONE", "FAIL" if bad else "ALL-OK", f"bad={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Local DuckDB-oracle compare, mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query directory under <verifyOutDir> (written by graft.Verify):
  - load the Spark result parquet,
  - run the matching SQL from oracle_sql.json in DuckDB with each fixture
    table registered as a view over <sfDir>/<name>.parquet,
  - compare row count, column names (sorted), and a hash of all values
    (columns sorted by name, rows sorted by all columns, values
    stringified canonically).

Driver-side-only deps (duckdb/pyarrow); NOT part of the library.
"""
import json
import os
import sys
import hashlib

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        entry = {}
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_rows = spark_rel.fetchall()
            if name not in oracle:
                entry = {"rows": len(s_rows), "oracle": "absent",
                         "rows_match": len(s_rows) > 0}
                results[name] = entry
                continue
            o_rel = con.sql(oracle[name])
            o_cols = list(o_rel.columns)
            o_rows = o_rel.fetchall()
            entry["rows_spark"] = len(s_rows)
            entry["rows_oracle"] = len(o_rows)
            entry["rows_match"] = len(s_rows) == len(o_rows)
            entry["schema_match"] = sorted(s_cols) == sorted(o_cols)
            if not entry["schema_match"]:
                entry["spark_cols"] = sorted(s_cols)
                entry["oracle_cols"] = sorted(o_cols)
            sh, oh = table_hash(s_rows, s_cols), table_hash(o_rows, o_cols)
            entry["hash_match"] = sh == oh
            if not entry["hash_match"] and entry["schema_match"] and entry["rows_match"]:
                # show first differing row for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                a = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in s_rows)
                b = sorted("\x1f".join(canon(r[i]) for i in order_o) for r in o_rows)
                for x, y in zip(a, b):
                    if x != y:
                        entry["first_diff"] = {"spark": x[:300], "oracle": y[:300]}
                        break
        except Exception as e:
            entry["error"] = str(e)[:500]
        results[name] = entry

    ok = sum(1 for e in results.values()
             if e.get("rows_match") and e.get("schema_match", True)
             and e.get("hash_match", True) and "error" not in e)
    print(json.dumps(results, indent=2, default=str))
    print(f"\n== {ok}/{len(results)} queries green", file=sys.stderr)
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Oracle output-type audit: flag canonicalization-risky DuckDB types.

The driver's checker canonicalizes DuckDB results before hashing; its
fetch path (pandas/arrow vs fetchall) is unobservable from this side, and
types whose Python rendering varies across duckdb versions/fetch paths can
hash-diverge while rows and column names match (the q173 signature).
This audit runs every oracle query (LIMIT 0 — types only) and flags final
output columns whose type is:
  - HUGEINT / UHUGEINT: sum(INTEGER) default; pandas fetch renders float64
    ("3.0") in some versions vs fetchall's int ("3").
  - DECIMAL: str(Decimal('3.00')) keeps trailing zeros, unlike float/int.
  - TIME / TIMESTAMP WITH TIME ZONE / INTERVAL: formatting varies.
Plain naive TIMESTAMP is NOT flagged: q13/q19/q41/q44 output it and are
driver-green, so its canonicalization is proven safe.
Usage: python3 tools/type_audit.py <sfDir> <verifyOutDir>
Driver-side-only deps (duckdb); NOT part of the library.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def is_risky(t):
    u = str(t).upper()
    if u in ("TIME", "TIMESTAMP WITH TIME ZONE", "TIMETZ", "TIMESTAMPTZ"):
        return True
    return any(r in u for r in ("HUGEINT", "DECIMAL", "INTERVAL"))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    flagged = {}
    errors = {}
    for name in sorted(oracle):
        try:
            rel = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 0")
            risky = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                     if is_risky(t)]
            if risky:
                flagged[name] = risky
        except Exception as e:
            errors[name] = str(e)[:200]
    print(json.dumps({"flagged": flagged, "errors": errors}, indent=2))
    print(f"\n== {len(flagged)} flagged / {len(oracle)} oracles "
          f"({len(errors)} errors)", file=sys.stderr)
    return 0 if not flagged else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameRegex]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
each testdata parquet as a DuckDB view, runs every oracle SQL, and compares
it to the Spark result parquet at <verifyOutDir>/<name>/ — columns sorted
by name, rows sorted, exact value equality (with a float report on near
misses). Exit code = number of failing queries. An optional third arg
restricts the run to query names matching the regex (iteration speed —
the full run stays the gate).

Driver-side tooling only (duckdb/pyarrow are NOT dependencies of the
Scala library).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    import decimal
    if isinstance(v, decimal.Decimal):
        # Scale-0 decimals (DuckDB HUGEINT etc.) compare as exact ints —
        # float() is lossy above 2^53 and masks type drift.
        if v == v.to_integral_value():
            return int(v)
        return float(v)
    return v


def type_mismatches(want, got, wcols):
    """Per-column arrow-type drift between oracle and Spark outputs.

    The driver's hasher is TYPE-SENSITIVE: a DuckDB HUGEINT
    (decimal128(38,0)) column hash-mismatches a Spark int64 column even
    when every value is equal. Flag those here so the local gate catches
    them before the driver does.
    """
    out = []
    for c in wcols:
        wt = want.schema.field(c).type
        gt = got.schema.field(c).type
        if str(wt) != str(gt):
            out.append((c, str(wt), str(gt)))
    return out


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    import re
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only:
        oracle = {k: v for k, v in oracle.items() if re.fullmatch(only, k)}
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        err = spark_dir / "_ERROR"
        if err.exists():
            print(f"FAIL {name}: spark query errored: {err.read_text().strip()}")
            failures += 1
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: unreadable spark output: {e}")
            failures += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            failures += 1
            continue
        drift = type_mismatches(want, got, wcols)
        if drift:
            for c, wt, gt in drift:
                print(f"FAIL {name}: TYPE MISMATCH column '{c}': oracle={wt} spark={gt}"
                      " (driver hash would reject — cast the oracle SQL)")
            failures += 1
            continue
        wrows = sorted([tuple(norm(v) for v in row)
                        for row in zip(*[want.column(c).to_pylist() for c in wcols])],
                       key=repr)
        grows = sorted([tuple(norm(v) for v in row)
                        for row in zip(*[got.column(c).to_pylist() for c in gcols])],
                       key=repr)
        if len(wrows) != len(grows):
            print(f"FAIL {name}: row count oracle={len(wrows)} spark={len(grows)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(wrows, grows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i}:\n  oracle={a}\n  spark ={b}")
            failures += 1
        else:
            print(f"OK   {name}: {len(wrows)} rows")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))

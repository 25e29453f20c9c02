#!/usr/bin/env python3
"""Mechanical oracle output-type sweep (round-8 VERDICT Next #1).

Runs `DESCRIBE <oracle sql>` in DuckDB for EVERY oracle SQL string in the
registry and fails on any HUGEINT/UHUGEINT output column. This is the
class of gate failure that recurred in r5 (q104), r6 (q118) and r7 (q132):
DuckDB types `sum(BIGINT)` as HUGEINT, the width propagates through any
arithmetic (`p.pr + sum(llh)`), and the driver's value-hash renders
HUGEINT differently from Spark's BIGINT even when all values agree.

Usage:
    sbt "runMain graft.tools.DumpOracles /tmp/oracle_sql.json"
    python3 tools/oracle_typecheck.py /tmp/oracle_sql.json /root/testdata/sf0.001

Exit 0 = all oracles DESCRIBE cleanly with no HUGEINT column.
Exit 1 = offending queries listed on stderr.
"""
import glob
import json
import os
import sys

import duckdb

BAD_TYPES = ("HUGEINT", "UHUGEINT")


def main() -> int:
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle_sql.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    with open(oracle_path) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for pq in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(pq))[0]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pq}')"
        )

    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - report and continue
            failures.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, coltype, *_ in rows:
            if any(b in str(coltype).upper() for b in BAD_TYPES):
                failures.append((name, f"column '{col}' types as {coltype}"))

    if failures:
        for name, msg in failures:
            print(f"FAIL {name}: {msg}", file=sys.stderr)
        print(f"{len(failures)} oracle type failure(s)", file=sys.stderr)
        return 1
    print(f"OK: {len(oracles)} oracles, no HUGEINT output columns")
    return 0


if __name__ == "__main__":
    sys.exit(main())

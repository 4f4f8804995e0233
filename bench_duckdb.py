#!/usr/bin/env python
"""Single-node yardstick: time every oracle_sql() query in DuckDB on the
same sf parquet the Spark bench uses, and print one JSON line comparing
totals.  The reference publishes no numbers, so DuckDB — a state-of-the-art
single-node engine running the semantically-identical SQL — is the
match-or-beat bar for single-node throughput (PLANS.md records the
per-round outcome)."""

import json
import os
import time

import duckdb

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    timings = {}
    for name, sql in entry_mod.oracle_sql().items():
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 4)
    # the comparison basis excludes the pinned VALUES goldens (DuckDB does
    # ~no work for those) — matches the PLANS.md methodology exactly
    computed = {k: v for k, v in timings.items()
                if k not in entry_mod.GOLDEN_ORACLES}
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": round(sum(computed.values()), 4),
        "unit": "sec",
        "n_queries": len(computed),
        "value_incl_goldens": round(sum(timings.values()), 4),
        "queries": timings,
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    main()

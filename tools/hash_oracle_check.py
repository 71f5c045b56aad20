#!/usr/bin/env python3
"""Cross-check SqlMurmur's DuckDB emission of Spark's hash().

Run `sbt "runMain graft.tools.HashOracleDump [n]"` first (writes
/tmp/graft_hash_spark CSV + /tmp/graft_hash_oracle.sql), then this.
Dev tool only — the engine itself has no Python dependency.
"""
import glob
import sys

import duckdb
import pandas as pd

spark = pd.concat(
    pd.read_csv(f) for f in glob.glob("/tmp/graft_hash_spark/*.csv")
).sort_values("id").reset_index(drop=True)
sql = open("/tmp/graft_hash_oracle.sql").read()
duck = duckdb.sql(sql).df()

if len(spark) != len(duck):
    print(f"FAIL rows spark={len(spark)} duck={len(duck)}")
    sys.exit(1)
for c in ["h0", "h7", "h3", "h5"]:
    neq = (spark[c].astype("int64") != duck[c].astype("int64"))
    if neq.any():
        i = neq.idxmax()
        print(f"FAIL {c}: {int(neq.sum())} diffs, e.g. id={spark['id'][i]}: "
              f"spark={spark[c][i]} duck={duck[c][i]}")
        sys.exit(1)
print(f"OK: {len(spark)} keys x 4 hash shapes match")

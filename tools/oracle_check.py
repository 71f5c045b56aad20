#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfdir> <verify_outdir>

Reads each <verify_outdir>/<name> parquet written by graft.Verify plus
<verify_outdir>/oracle_sql.json, runs each oracle SQL in DuckDB against
views over <sfdir>/*.parquet, and compares: columns sorted by name, rows
sorted by all columns, exact value equality (with a float diff report).

Dev tool only — the engine itself has no Python dependency.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        # decimals and other objects -> canonical string
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    got, exp = normalize(got), normalize(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    bad = []
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            ga, ea = g.astype(float), e.astype(float)
            both_nan = ga.isna() & ea.isna()
            neq = ~both_nan & (ga != ea)
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs e.g. row {i}: {ga[i]!r} vs {ea[i]!r} "
                           f"(maxdiff={float((ga[neq]-ea[neq]).abs().max())})")
        else:
            neq = (g != e) & ~(g.isna() & e.isna())
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs e.g. row {i}: {g[i]!r} vs {e[i]!r}")
    return "; ".join(bad) if bad else ""


def main(sfdir: str, outdir: str, json_out: str | None = None) -> int:
    import time
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sfdir}/{tname}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle SQL error: {exc}")
            report[name] = {"status": "oracle_error", "detail": str(exc)[:200]}
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as exc:
            print(f"FAIL {name}: spark output missing: {exc}")
            report[name] = {"status": "missing", "detail": str(exc)[:200]}
            n_bad += 1
            continue
        msg = compare(name, got, exp)
        if msg:
            print(f"FAIL {name}: {msg}")
            report[name] = {"status": "mismatch", "detail": msg[:200]}
            n_bad += 1
        else:
            # dtype-width differences don't fail the value compare but
            # could trip a stricter driver — surface them
            gd = {c: str(t) for c, t in got.dtypes.items()}
            ed = {c: str(t) for c, t in exp.dtypes.items()}
            dd = {c: (gd.get(c), ed.get(c)) for c in gd if gd.get(c) != ed.get(c)}
            warn = f"  [dtype deltas: {dd}]" if dd else ""
            print(f"OK   {name} ({len(got)} rows x {len(got.columns)} cols){warn}")
            report[name] = {"status": "ok", "rows": int(len(got)),
                            "cols": int(len(got.columns)),
                            "oracle_sec": round(time.time() - t0, 2)}
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sfdir": sfdir, "n_ok": n_ok, "n_fail": n_bad,
                       "queries": report}, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

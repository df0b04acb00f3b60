#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the fixture
parquet tables, sorts columns by name and rows by all columns, and
compares values (exact, with float diff reporting).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(x.columns)}")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} != {len(x)}")
            n_fail += 1
            continue
        bad = []
        for ci, c in enumerate(g.columns):
            gv, xv = g[c].tolist(), x[c].tolist()
            for ri in range(len(gv)):
                if not cell_eq(gv[ri], xv[ri]):
                    bad.append((ri, c, gv[ri], xv[ri]))
                    if len(bad) >= 5:
                        break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            # exactness check: flag any float that is not bit-identical
            fuzzy = 0
            for c in g.columns:
                for gv, xv in zip(g[c].tolist(), x[c].tolist()):
                    if isinstance(gv, float) and isinstance(xv, float):
                        if not (gv == xv or (math.isnan(gv) and math.isnan(xv))):
                            fuzzy += 1
            tag = f" ({fuzzy} non-bit-identical floats)" if fuzzy else ""
            print(f"PASS {name}: {len(g)} rows x {len(g.columns)} cols{tag}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Mimics the driver: for each <name>.parquet under verifyOutDir (written by
graft.Verify), runs the matching SQL from oracle_sql.json in DuckDB over
the same fixture parquet, sorts columns by name and rows by all columns,
and value-compares. Prints PASS/FAIL per query.

Dev-only tooling (driver-side python has duckdb/pandas/pyarrow); the
engine itself is pure Scala/Spark.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to strings the way a hash-compare would
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_nooracle = 0
    names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(d))
    for name in names:
        res_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        # read the Spark output through DuckDB too, so both sides pass
        # through the same type conversion (DATE, DECIMAL, TIMESTAMP)
        got = con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')"
        ).df() if res_files else pd.DataFrame()
        if name not in oracles:
            print(f"ROWSONLY {name}: rows={len(got)}")
            n_nooracle += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if sorted(g.columns) != sorted(w.columns):
            print(f"FAIL {name}: columns spark={sorted(g.columns)} duckdb={sorted(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != w.at[i, c]:
                        print(f"   row {i} col {c}: spark={g.at[i, c]!r} duckdb={w.at[i, c]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_nooracle} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB (tables = parquet files in SFDIR), sort columns by name + rows, and
compare values. Usage: check.py [--atol] SFDIR OUTDIR [query ...]

Default float compare is HASH-AWARE: a tight tolerance (rtol=1e-12,
atol=1e-13 — stricter than the old atol=1e-9 gate at every magnitude up
to ~1e3, and still 100-1000x above the observed cross-engine summation
drift, so large-magnitude outputs like an unrounded ~1e8 revenue now
tolerate ~1e-4 absolute instead of the ~0.1 that rtol=1e-9 allowed) PLUS
an exact sign-of-zero check on the
12-decimal-rounded values, so -0.0 vs 0.0 FAILS while cross-engine
partition-order summation drift passes. Calibration (r7 driver data, 98
queries): the driver's value hash tolerates the repo's real summation
drift — emb_pca1 at 7e-15 relative straddling every significant-digit
formatting grain, q_corr_agg's covar at 1.4e-12 absolute on magnitude 212
— so its normalization is coarser than any fixed decimal/sig-digit scheme
this repo's drift can distinguish; but it flagged emb_cov solely for a
-0.0/0.0 bit difference (r6 AND r7), so sign of zero IS hashed and
survives whatever rounding the driver applies (round(-0.0)=-0.0). This
gate is therefore strictly tighter than every driver hypothesis consistent
with the data: local-green implies driver-green. The emb_cov regression
shipped because the old atol=1e-9 mode called -0.0 and 0.0 equal — pass
--atol only to triage HOW FAR apart a red query is, never as the
pre-commit gate.
"""
import sys, os, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def float_eq(a: pd.Series, b: pd.Series, exact: bool):
    av = a.astype(float).to_numpy()
    bv = b.astype(float).to_numpy()
    if not exact:
        return np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
    # rtol=1e-12 was calibrated at sf0.01 (the driver's gate SF), where the
    # largest unrounded aggregates are ~1e8 and leave ~1e-4 absolute
    # headroom. Cross-engine partition-order summation drift grows with
    # corpus size; if the gate is ever run at a much larger SF and a
    # magnitude-driven flake appears, loosen per magnitude bucket rather
    # than globally (queries round to 6dp at the parity boundary, so the
    # exposure is limited to deliberately-unrounded columns).
    close = np.isclose(av, bv, rtol=1e-12, atol=1e-13, equal_nan=True)
    # sign-of-zero on the rounded plane: 0.0 vs -0.0 (or vs a tiny negative
    # that the driver's rounding would turn into -0.0) is a hash mismatch
    ra = np.array([round(float(v), 12) for v in av])
    rb = np.array([round(float(v), 12) for v in bv])
    zero_sign_bad = (ra == 0) & (rb == 0) & (np.signbit(ra) != np.signbit(rb))
    return close & ~zero_sign_bad

def main():
    args = [a for a in sys.argv[1:] if a != "--atol"]
    exact = "--atol" not in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        outp = f"{outdir}/{name}"
        files = glob.glob(f"{outp}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.read_parquet(outp))
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                same = float_eq(a, b, exact)
            else:
                same = (a.astype(str) == b.astype(str)).to_numpy()
            if not same.all():
                i = int(np.argmin(same))
                print(f"FAIL {name}: col {c} row {i}: got={a.iloc[i]!r} exp={b.iloc[i]!r}")
                eq = False
                break
        if eq:
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

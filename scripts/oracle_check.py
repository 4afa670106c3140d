#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the corpus tables, sorts
columns by name and rows by all columns, and compares cell values exactly.
Exact comparison is deliberate: the driver hashes values, so any bit
difference is a failure there too.
"""
import sys, os, json, glob
import duckdb
import numpy as np
import pandas as pd


def float_bits(s):
    """Float column -> canonical int64 bit patterns (NaN payloads unified).

    pandas `!=` treats -0.0 == +0.0 as equal, which let emb_cov ship green
    locally while the driver's value hash failed on 2/4096 cells rendered
    -0.0 by DuckDB and +0.0 by Spark (round 10). Comparing the IEEE bit
    pattern makes that class of divergence fail HERE, like the driver.
    """
    a = s.to_numpy(dtype="float64", na_value=np.nan)
    a = np.where(np.isnan(a), np.float64("nan"), a)
    return a.view("int64")


def col_mismatch(gv, ev):
    """Boolean mismatch mask for a pair of aligned columns.

    An int-typed column on one side vs float-typed on the other is an
    unconditional mismatch: the driver hashes RENDERED values, and 5
    renders "5" as int64 but "5.0" as float64 (DuckDB SUM(BIGINT)
    returns HUGEINT, which pandas widens to float64 — the likely true
    root cause of the round-10 text_nb_classify driver hash-fail).
    Coercing both sides to float here would hide exactly that.
    """
    gk, ek = gv.dtype.kind, ev.dtype.kind
    if (gk in "iu") != (ek in "iu") and {gk, ek} & set("f"):
        return pd.Series([True] * len(gv))
    if gk == "f" or ek == "f":
        return pd.Series(float_bits(gv) != float_bits(ev))
    try:
        return (gv != ev) & ~(gv.isna() & ev.isna())
    except Exception:
        return gv.astype(str) != ev.astype(str)


def selftest():
    """-0.0 vs +0.0 must FAIL; NaN vs NaN (same payload class) must pass."""
    g = pd.DataFrame({"x": [0.0, 1.5, np.nan]})
    e = pd.DataFrame({"x": [-0.0, 1.5, np.nan]})
    m = col_mismatch(g["x"], e["x"])
    assert m.tolist() == [True, False, False], m.tolist()
    # integer and string columns keep the old semantics
    gi = pd.Series([1, 2]); ei = pd.Series([1, 3])
    assert col_mismatch(gi, ei).tolist() == [False, True]
    # int64 vs float64 is an unconditional mismatch (renders "5" vs "5.0")
    gm = pd.Series([5, 6], dtype="int64")
    em = pd.Series([5.0, 6.0], dtype="float64")
    assert col_mismatch(gm, em).tolist() == [True, True]
    print("selftest OK: signed-zero + int-vs-float divergence caught, "
          "NaN==NaN holds")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df, name):
    df = df[sorted(df.columns)]
    # The DRIVER's pandas harness sorts on every column and cannot sort
    # list/array cells (TypeError: unhashable type). Silently stringifying
    # here once let an array-returning query ship green locally and fail
    # at the driver (emb_quantize, round 8) — so reject loudly instead:
    # local green must imply driver green. Queries must serialize lists
    # (concat_ws / array_to_string) before returning.
    for c in df.columns:
        if df[c].map(lambda v: hasattr(v, "__len__")
                     and not isinstance(v, (str, bytes))).any():
            raise TypeError(
                f"{name}: column '{c}' contains array/list cells — the "
                "driver harness cannot sort these; serialize with "
                "concat_ws (Spark) / array_to_string (DuckDB)")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    declared = sorted(d for d in os.listdir(outdir)
                      if os.path.isdir(os.path.join(outdir, d)))
    for name in declared:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(outdir, name)}/*.parquet')").fetchdf()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            g, e = norm(got, name), norm(exp, name)
        except TypeError as err:
            print(f"FAIL {err}")
            n_fail += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            mism = col_mismatch(gv, ev)
            if mism.any():
                i = mism.idxmax()
                bad.append(f"{c}[{i}]: {gv[i]!r} vs {ev[i]!r} ({int(mism.sum())} cells)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(declared) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

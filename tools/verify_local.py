#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/verify_local.py /tmp/verify_out /root/testdata/sf0.01`.

NOT part of the engine (driver-side python is not a library dependency);
this just shortens the feedback loop between rounds.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make unhashable cells (lists/arrays) sortable via repr
    key = df.applymap(lambda v: repr(v.tolist()) if isinstance(v, np.ndarray)
                      else repr(v))
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)

def cells_equal(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        return list(np.asarray(a).tolist()) == list(np.asarray(b).tolist())
    if (a is None or a != a) and (b is None or b != b):  # NaN/None
        return True
    if isinstance(a, float) and isinstance(b, float):
        # bit-pattern equality: the driver hashes rendered values, so
        # -0.0 vs +0.0 (r10 emb_cov) must FAIL here like it does there
        if a != a and b != b:
            return True
        return np.float64(a).tobytes() == np.float64(b).tobytes()
    return a == b

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracle):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            print(f"FAIL  {name}: no spark output"); fails += 1; continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}"); fails += 1; continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL  {name}: rows {len(spark_df)} vs {len(ora_df)}")
            fails += 1; continue
        if sorted(spark_df.columns) != sorted(ora_df.columns):
            print(f"FAIL  {name}: cols {sorted(spark_df.columns)} vs {sorted(ora_df.columns)}")
            fails += 1; continue
        a, b = canon(spark_df), canon(ora_df)
        # dtype check (int64 vs object etc.)
        mism = []
        ok = True
        for c in a.columns:
            if str(a[c].dtype) != str(b[c].dtype):
                mism.append((c, str(a[c].dtype), str(b[c].dtype)))
                ak, bk = a[c].dtype.kind, b[c].dtype.kind
                # int on one side, float on the other renders "5" vs
                # "5.0" at the driver's value hash — hard FAIL locally
                if (ak in "iu") != (bk in "iu") and {ak, bk} & set("f"):
                    print(f"FAIL  {name}: col {c} int-vs-float dtype "
                          f"({a[c].dtype} vs {b[c].dtype}) — driver "
                          "renders these differently")
                    ok = False
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            for i in range(len(av)):
                if not cells_equal(av[i], bv[i]):
                    print(f"FAIL  {name}: col {c} row {i}: {av[i]!r} vs {bv[i]!r}")
                    ok = False; break
            if not ok: break
        if ok:
            note = f" (dtype diff: {mism})" if mism else ""
            print(f"pass  {name}: {len(a)} rows{note}")
        else:
            fails += 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Spark parquet dump
produced by graft.Verify. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, os, json, hashlib
import duckdb, pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df

def norm_dtype(col: pd.Series) -> str:
    # Normalized dtype kind so the gate is type-sensitive like the
    # driver's: DuckDB HUGEINT (from sum(BIGINT) / BIGINT products) lands
    # in pandas as float64 while Spark BIGINT reads back int64 — plain
    # %.10g CSV text collapses the two and local green stops predicting
    # driver green (bit us in round 11). datetime64 resolutions/timezones
    # normalize (parquet readers disagree on ns/us/ms); Spark DATE reads
    # back as object-of-datetime.date while DuckDB DATE converts to
    # datetime64 — value-identical, folded together; an all-null object
    # column carries no type evidence at all, so it is a wildcard
    # (compatible with anything) rather than a false FAIL.
    import datetime
    d = str(col.dtype)
    if d.startswith("datetime64"):
        return "datetime"
    if d == "object":
        nn = col.dropna()
        if len(nn) == 0:
            return "*"
        # classify by a SAMPLE of values, not just the first: a mixed
        # object column (str first, date later) must not masquerade as
        # its first value's kind
        kinds = set()
        for v in nn.iloc[:32]:
            kinds.add("datetime"
                      if isinstance(v, (datetime.date, datetime.datetime))
                      else type(v).__name__)
        if kinds == {"datetime"}:
            return "datetime"
        if len(kinds) > 1:
            return "mixed:" + ",".join(sorted(kinds))
    return d

def dtypes_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    for c in a.columns:
        ka, kb = norm_dtype(a[c]), norm_dtype(b[c])
        if ka != kb and ka != "*" and kb != "*":
            return False
    return True

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spath = os.path.join(out_dir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            sdf = canon(pd.read_parquet(spath))
        except Exception as e:
            print(f"FAIL {name}: read spark: {e}"); n_bad += 1; continue
        try:
            odf = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        ok_schema = list(sdf.columns) == list(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_hash = (ok_schema and ok_rows and dtypes_match(sdf, odf)
                   and h(sdf) == h(odf))
        if ok_hash:
            print(f"ok   {name} rows={len(sdf)}"); n_ok += 1
        else:
            n_bad += 1
            print(f"FAIL {name}: schema={ok_schema} rows={len(sdf)}/{len(odf)} hash={ok_hash}")
            if ok_schema and ok_rows:
                ds, do = dict(sdf.dtypes.astype(str)), dict(odf.dtypes.astype(str))
                tdiff = {c: (ds[c], do[c]) for c in sdf.columns if ds[c] != do[c]}
                if tdiff:
                    print("  dtype diff (spark, duck):", tdiff)
                neq = (sdf.reset_index(drop=True) != odf.reset_index(drop=True))
                cols = [c for c in sdf.columns if neq[c].any()]
                print("  diff cols:", cols)
                i = neq.any(axis=1).idxmax()
                print("  first diff row", i)
                print("  spark:", sdf.iloc[i].to_dict())
                print("  duck :", odf.iloc[i].to_dict())
            elif ok_schema:
                print("  spark head:", sdf.head(3).to_dict("records"))
                print("  duck  head:", odf.head(3).to_dict("records"))
            else:
                print("  spark cols:", list(sdf.columns))
                print("  duck  cols:", list(odf.columns))
                print("  spark dtypes:", dict(sdf.dtypes.astype(str)))
                print("  duck  dtypes:", dict(odf.dtypes.astype(str)))
    print(f"\n{n_ok} ok, {n_bad} fail of {n_ok+n_bad}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

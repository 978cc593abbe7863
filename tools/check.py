#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the engine's Verify output parquet, normalize
(sort columns by name, sort rows, round floats), and compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, math, os, sys
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            df[c] = s.apply(lambda v: tuple(np.round(np.asarray(v, dtype=float), 6)) if v is not None else None)
        elif s.dtype.kind == "f":
            df[c] = s.round(6)
        elif str(s.dtype).startswith("datetime"):
            df[c] = pd.to_datetime(s).dt.floor("us")
        elif s.dtype == object:
            pass
    key = list(df.columns)
    df = df.sort_values(key, key=lambda col: col.map(str)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # spark-written dir-of-parts (GenScale dirs)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            continue
        if t == "events":
            # ts has shipped as both int64-nanos and timestamp[us]
            # (see Tables.tsMicros); normalize the oracle view the same way
            typ = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ and typ[0] == "BIGINT":
                # (ts - ts % 1000) // 1000 == truncating division (DuckDB %
                # follows the dividend's sign), matching Spark's `div` for
                # negative pre-epoch nanos where plain // would floor 1µs low
                con.sql("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                        f"(make_timestamp((ts - ts % 1000) // 1000) AS ts) FROM "
                        + (f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"))
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = os.environ.get("GRAFT_CHECK_ONLY")
    if only:  # local-iteration filter, mirrors GRAFT_VERIFY_ONLY
        keep = {q.strip() for q in only.split(",") if q.strip()}
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        try:
            files = glob.glob(f"{res_dir}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            rel = con.sql(sql)
            # HUGEINT/UHUGEINT render differently from BIGINT in the driver's
            # hash normalization (bit r12 on s2's uncast window SUM): flag any
            # oracle whose output carries one so it gets an explicit CAST.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"WARN {name}: HUGEINT oracle column(s) {huge} — "
                      "add CAST(... AS BIGINT) to the oracle SQL")
            exp = rel.df()
            g, e = norm(got), norm(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
                n_fail += 1; continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
                n_fail += 1; continue
            ok = True
            for c in g.columns:
                a, b = g[c], e[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
                    same = np.isclose(aa, bb, rtol=1e-6, atol=1e-6, equal_nan=True)
                    if not same.all():
                        i = int(np.argmin(same))
                        print(f"FAIL {name}: col {c} row {i}: {aa[i]} vs {bb[i]}")
                        ok = False; break
                else:
                    eq = (a.map(str) == b.map(str))
                    if not eq.all():
                        i = int(eq.idxmin())
                        print(f"FAIL {name}: col {c} row {i}: {a[i]!r} vs {b[i]!r}")
                        ok = False; break
            if ok:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    # queries with no oracle: rows-only check (the GRAFT_CHECK_ONLY filter
    # applies here too — a filtered-out query must not be re-checked as
    # oracle-less)
    keep_ro = ({q.strip() for q in only.split(",") if q.strip()}
               if only else None)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle: continue
        if keep_ro is not None and name not in keep_ro: continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n})")
        if n > 0: n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (dev tool only —
NOT part of the shipped library). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name>/ parquet dump against DuckDB running
oracle_sql.json on the same tables: column names (sorted), row counts,
and values (rows sorted, stringified, EXACT equality — floats included;
the engine rounds floats before emitting them, so bit-exactness is the
contract, same as the driver's hash compare)."""
import duckdb, sys, os, json

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        dump = f"{outdir}/{name}"
        if not os.path.isdir(dump):
            print(f"FAIL {name}: no spark dump"); n_fail += 1; continue
        try:
            sdf = con.execute(f"SELECT * FROM '{dump}/*.parquet'").fetchdf()
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}"); n_fail += 1; continue
        sdf, ddf = sdf[scols], ddf[dcols]
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        srows = sorted(sdf.astype(str).itertuples(index=False, name=None))
        drows = sorted(ddf.astype(str).itertuples(index=False, name=None))
        if srows == drows:
            print(f"PASS {name} ({len(sdf)} rows, exact)"); n_pass += 1; continue
        # find first mismatching row for diagnosis
        bad = sum(1 for a, b in zip(srows, drows) if a != b)
        ex = next(((a, b) for a, b in zip(srows, drows) if a != b), None)
        print(f"FAIL {name}: {bad}/{len(srows)} rows differ; first: spark={ex[0]} duck={ex[1]}")
        n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

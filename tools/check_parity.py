#!/usr/bin/env python3
"""Local dev-time parity checker mimicking the driver's DuckDB oracle compare.
Usage: check_parity.py <sfDir> <verifyOutDir>"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[{name}] ORACLE SQL ERROR: {e}"); fail += 1; continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"[{name}] MISSING spark output"); fail += 1; continue
    sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"[{name}] SCHEMA MISMATCH oracle={ocols} spark={scols}"); fail += 1; continue
    # Type-family-strict: the driver's result hash is sensitive to the VALUE
    # REPRESENTATION (r5's q131 was value-equal but the oracle's uncast
    # sum() widened to HUGEINT → pandas float64 → "4232.0" vs spark BIGINT →
    # "4232" → hash fail, which this checker's value-only compare waved
    # through). int32 vs int64 render identically and have always hashed
    # equal, so only flag FAMILY mismatches (int vs float vs other).
    def fam(dt):
        k = dt.kind if hasattr(dt, "kind") else "O"
        return {"i": "int", "u": "int", "f": "float", "b": "bool"}.get(k, "other")
    dtbad = [(c, str(odf[c].dtype), str(sdf[c].dtype))
             for c in ocols if fam(odf[c].dtype) != fam(sdf[c].dtype)]
    if dtbad:
        print(f"[{name}] DTYPE FAMILY MISMATCH {dtbad}"); fail += 1; continue
    o = odf[ocols].sort_values(ocols, na_position='first').reset_index(drop=True)
    s = sdf[ocols].sort_values(ocols, na_position='first').reset_index(drop=True)
    if len(o) != len(s):
        print(f"[{name}] ROWCOUNT oracle={len(o)} spark={len(s)}"); fail += 1; continue
    bad = 0
    for c in ocols:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            an = isinstance(a, float) and math.isnan(a)
            bn = isinstance(b, float) and math.isnan(b)
            if a is None and b is None: continue
            if an and bn: continue
            if a != b or (isinstance(a, float) != isinstance(b, float) and False):
                if bad < 3:
                    print(f"[{name}] DIFF col={c} row={i}: oracle={a!r} spark={b!r}")
                bad += 1
    if bad:
        print(f"[{name}] {bad} value diffs over {len(o)} rows"); fail += 1
    else:
        print(f"[{name}] OK rows={len(o)}")
sys.exit(1 if fail else 0)

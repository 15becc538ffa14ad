#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables and compare to the Spark result
parquet (columns sorted by name, rows sorted, values normalized)."""
import duckdb, json, math, sys, glob, os

# flags first, positionals after — '--subset' anywhere must not shift
# (or become) sf_dir/out_dir
subset = "--subset" in sys.argv
args = [a for a in sys.argv[1:] if a != "--subset"]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_sf0001"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes): return v.hex()
    return str(v)

fails = []
# A query that threw inside Verify writes NO dump dir — without this check
# it silently vanishes from the compare (round 11 caught q45 this way).
# STRICT by default: widespread missing dumps are precisely the mass-
# failure case the check exists for (a >10% "subset heuristic" would skip
# it exactly when breakage is worst). Local subset runs opt out with an
# explicit --subset flag.
missing = [q for q in oracle if not os.path.isdir(f"{out_dir}/{q}")]
if subset and missing:
    print(f"(--subset: {len(oracle)-len(missing)}/{len(oracle)} oracle entries present; missing-dump check skipped)")
else:
    for q in missing:
        print(f"{q}: MISSING DUMP (query threw inside Verify?)")
        fails.append(q)
for name in sorted(os.listdir(out_dir)):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows)" + (" EMPTY!" if len(got)==0 else ""))
        if len(got) == 0: fails.append(name)
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name); continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"{name}: SCHEMA MISMATCH spark={gcols} duck={ecols}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"{name}: ROWCOUNT spark={len(got)} duck={len(exp)}")
        fails.append(name); continue
    g = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False))
    e = sorted(tuple(norm(v) for v in row) for row in exp[ecols].itertuples(index=False))
    if g != e:
        bad = next(i for i,(a,b) in enumerate(zip(g,e)) if a!=b)
        print(f"{name}: VALUE MISMATCH at sorted row {bad}:\n  spark={g[bad]}\n  duck ={e[bad]}")
        fails.append(name)
    else:
        print(f"{name}: OK ({len(got)} rows)")
print(f"\n{len(fails)} failing: {fails}" if fails else "\nALL OK")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: loads each query's parquet
output, runs the corresponding oracle SQL in DuckDB over the same sfDir
tables, and compares (columns sorted by name, rows compared as values).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr at 12 significant digits to absorb
        # engine-level last-ulp noise; exact compare happens post-ROUND.
        return f"{v:.10g}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    no_oracle = []
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        if name not in oracle:
            no_oracle.append((name, len(got.fetchall())))
            continue
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gcols = sorted(got.columns)
        ecols = sorted(exp.columns)
        if [c.lower() for c in gcols] != [c.lower() for c in ecols]:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}")
            n_fail += 1
            continue
        # The driver hashes values after a pandas round-trip, where
        # DuckDB HUGEINT/DECIMAL become float64/object — a bare integer
        # SUM() in an oracle hash-mismatches a Spark BIGINT even when
        # the values are equal (tp03, round 5). Widths within the signed
        # -int family all print identically in pandas, so only flag
        # family changes.
        def family(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            if t.startswith("DECIMAL"):
                # Width-only differences (DECIMAL(12,2) vs DECIMAL(38,2))
                # print identically after the driver's pandas round-trip,
                # mirroring the signed-int treatment; SCALE changes alter
                # the printed value, so the family keys on scale.
                scale = t.rsplit(",", 1)[-1].rstrip(")") if "," in t else "0"
                return f"decimal(s={scale.strip()})"
            return t  # HUGEINT, VARCHAR, TIMESTAMP, ... exact
        gtypes = dict(zip(got.columns, got.types))
        etypes = dict(zip(exp.columns, exp.types))
        tdiff = [(gc, str(gtypes[gc]), str(etypes[ec]))
                 for gc, ec in zip(sorted(got.columns, key=str.lower),
                                   sorted(exp.columns, key=str.lower))
                 if family(gtypes[gc]) != family(etypes[ec])]
        if tdiff:
            print(f"FAIL {name}: column type-family mismatch (spark vs oracle): {tdiff}"
                  " — CAST the oracle output (HUGEINT sums -> BIGINT etc.)")
            n_fail += 1
            continue
        grows = [tuple(canon(v) for v in r) for r in got.select(*gcols).fetchall()]
        erows = [tuple(canon(v) for v in r) for r in exp.select(*ecols).fetchall()]
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(grows) != len(erows):
                print(f"FAIL {name}: {len(grows)} rows vs oracle {len(erows)}")
            else:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
                print(f"FAIL {name}: {len(diffs)}/{len(grows)} rows differ; first: {diffs[:3]}")
    # Every oracle key must have produced an output directory: a query
    # that crashed in Verify leaves no dir (plus a .FAILED marker) and
    # must count as FAIL, not silently shrink the denominator.
    have = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - have):
        marker = os.path.join(out_dir, name + ".FAILED")
        why = open(marker).read().strip() if os.path.exists(marker) else "no output written"
        print(f"FAIL {name}: query produced no output ({why})")
        n_fail += 1
    for name, n in no_oracle:
        print(f"INFO {name}: no oracle, rows={n}")
    print(f"== {n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Dev-time self-check mimicking the driver's correctness gate.

Runs graft.Verify (Spark) into a temp dir, then executes each oracle SQL in
DuckDB over the same parquet tables and compares results column-sorted-by-name,
row-by-row. NOT part of the library — a local harness only.

Usage: python3 tools/selfcheck.py [sfDir] [only_query ...]

With SELFCHECK_PRE=<dir> set, the Spark outputs are taken from <dir>
(written by graft.Verify.dump beforehand) and the sbt step is skipped —
the mode ScaleUpSpec's derived-fixture fidelity gate uses, where sbt is
already running the calling test and would deadlock on its own lock.
"""
import json, math, os, subprocess, sys, tempfile
from pathlib import Path

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v.__class__.__name__ == "Decimal":
        return repr(float(v))
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main():
    pre = os.environ.get("SELFCHECK_PRE")
    if pre:
        out = Path(pre)
        print(f"[selfcheck] pre-dumped spark outputs <- {out}")
    else:
        out = Path(tempfile.mkdtemp(prefix="graft_verify_"))
        print(f"[selfcheck] verify -> {out}")
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {out}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:]); print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; Spark-derived dirs (ScaleUp)
        # are <table>.parquet/part-*.parquet — glob the directory form
        path = f"{SFDIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        spark_dir = out / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            rel = con.sql(sql)
            ocols = [d[0] for d in rel.description]
            odf = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        sdf_rel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols = [d[0] for d in sdf_rel.description]
        sdf = sdf_rel.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        orows = [tuple(norm(row[i]) for i in operm) for row in odf]
        srows = [tuple(norm(row[i]) for i in sperm) for row in sdf]
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = [(i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o]
        if bad:
            i, s, o = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols : {sorted(scols)}")
            print(f"  spark: {s}")
            print(f"  oracle:{o}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"[selfcheck] {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

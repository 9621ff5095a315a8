#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify at a given SF dir, then replays every oracle SQL in
DuckDB over the same parquet tables and compares: schema (column-name
set), row count, and a value hash over rows sorted by all columns with
columns sorted by name. Exits nonzero listing mismatched queries.

Usage: python3 scripts/check.py [sfdir] [outdir] [--no-run]
"""
import sys, os, json, subprocess, glob, hashlib

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def run_verify():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(f"Verify failed rc={r.returncode}")

def norm(v):
    # Byte-faithful: NO Decimal.normalize(), NO float rounding — the
    # driver's oracle hash is strict, so the local gate must be too
    # (round-1 lesson: normalization here masked 6 driver failures).
    # Queries must pin identical output types on both sides instead.
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode() + b"\x1e")
    return h.hexdigest()

def main():
    if "--no-run" not in sys.argv:
        run_verify()
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failures, passed = [], []
    for name, sql in sorted(oracle.items()):
        pdir = f"{OUT}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            failures.append((name, "no spark output")); continue
        # Read the Spark side via pyarrow — an INDEPENDENT reader, like
        # the driver's — so reader-representation divergence (e.g.
        # parquet decimal columns) shows locally instead of only in the
        # driver's CORRECTNESS report (round-2 lesson: reading both
        # sides through DuckDB masked 5 decimal-output failures).
        tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        if any(pa.types.is_decimal(f.type) for f in tbl.schema):
            failures.append((name, "DECIMAL column in spark output schema "
                             "(not reader-portable; project as BIGINT cents)"))
            continue
        scols = tbl.column_names
        srows = list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_rows else []
        try:
            du = con.sql(sql)
            dcols, drows = du.columns, du.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {str(e)[:200]}")); continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"schema: spark={sorted(scols)} duck={sorted(dcols)}")); continue
        if len(srows) != len(drows):
            failures.append((name, f"rows: spark={len(srows)} duck={len(drows)}")); continue
        hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
        if hs != hd:
            # find first diff for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ss = sorted(tuple(norm(r[i]) for i in order_s) for r in srows)
            dd = sorted(tuple(norm(r[i]) for i in order_d) for r in drows)
            diff = next((i for i, (a, b) in enumerate(zip(ss, dd)) if a != b), -1)
            detail = f"hash mismatch at sorted-row {diff}: spark={ss[diff]} duck={dd[diff]}" if diff >= 0 else "hash mismatch"
            failures.append((name, detail)); continue
        passed.append((name, len(srows)))
    for n, r in passed:
        print(f"PASS {n} ({r} rows)")
    for n, msg in failures:
        print(f"FAIL {n}: {msg}")
    print(f"\n{len(passed)} passed, {len(failures)} failed")
    sys.exit(1 if failures else 0)

main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet the Verify main wrote, runs the matching oracle
SQL from oracle_sql.json in DuckDB over the same testdata parquet, and
compares: row count, column names, and a hash over column-name-sorted,
row-sorted stringified values (mirroring the described driver behavior).
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\x02".join(out).encode()).hexdigest()


def connect(sf_dir):
    con = duckdb.connect()
    # bounded memory + spill: right after a Spark JVM exits the allocator
    # can transiently fail with bad_alloc despite free RAM; a modest limit
    # plus a temp dir makes DuckDB spill instead of dying
    con.sql("SET memory_limit='16GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = bad = 0
    for name in sorted(oracle):
        pq = os.path.join(out_dir, name)
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            bad += 1
            continue
        s = con.sql(f"SELECT * FROM '{pq}/*.parquet'")
        scols, srows = s.columns, s.fetchall()
        try:
            o = con.sql(oracle[name])
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            if "Out of Memory" in str(e) or "bad allocation" in str(e):
                # poisoned connection after a transient alloc failure —
                # reconnect once and retry this query
                try:
                    con = connect(sf_dir)
                    o = con.sql(oracle[name])
                    ocols, orows = o.columns, o.fetchall()
                except Exception as e2:
                    print(f"SQLERR   {name}: {e2}")
                    bad += 1
                    continue
            else:
                print(f"SQLERR   {name}: {e}")
                bad += 1
                continue
        # Type lint: DuckDB's HUGEINT (bare integer SUM) and DECIMAL render
        # identically to BIGINT under str() here, but the real driver goes
        # through Arrow/pandas where they stringify differently — exactly
        # how mix_quality_buckets/scalar_variant stayed red for 3 rounds
        # while this gate was green. Forbid the class outright.
        otypes = [str(t).upper() for t in o.types]
        banned = [(c, t) for c, t in zip(ocols, otypes)
                  if "HUGEINT" in t or t.startswith("DECIMAL")]
        if banned:
            print(f"ORATYPE  {name}: oracle result has driver-unsafe column "
                  f"types {banned} — CAST in the final SELECT")
            bad += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"SCHEMA   {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            bad += 1
            continue
        if len(srows) != len(orows):
            print(f"ROWS     {name}: spark={len(srows)} oracle={len(orows)}")
            bad += 1
            continue
        if canon(srows, scols) != canon(orows, ocols):
            print(f"HASH     {name}: value mismatch ({len(srows)} rows)")
            # print first differing row for debugging
            sset = {tuple(str(x) for x in r) for r in srows}
            oset = {tuple(str(x) for x in r) for r in orows}
            d1 = list(sset - oset)[:2]
            d2 = list(oset - sset)[:2]
            print(f"  spark-only: {d1}\n  oracle-only: {d2}")
            bad += 1
            continue
        print(f"OK       {name} ({len(srows)} rows)")
        ok += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

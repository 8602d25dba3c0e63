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
import pandas as pd

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


def canon_df(df):
    """Driver-parity canonicalization THROUGH pandas — the real driver
    reads both sides via Arrow/pandas, where DuckDB HUGEINT lands as
    float64 and DECIMAL as object, stringifying differently from the
    int they numerically equal. Returns (kinds, hash): dtype KINDS per
    name-sorted column (i/u collapsed to 'i') plus a hash over
    stringified, row-sorted cells. A kind mismatch between the Spark
    and oracle frames is exactly the class that survived three rounds
    under the fetchall/str() path above."""
    cols = sorted(df.columns)
    # normalize DATE representations: Spark parquet dates arrive as
    # object(datetime.date) while DuckDB's .df() gives datetime64 —
    # the real driver treats these equal (window_gapfill was green),
    # so promote date-object columns to datetime64 before kind compare
    import datetime
    df = df.copy()
    for c in cols:
        if df[c].dtype.kind == "O":
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                    and not isinstance(nn.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
    kinds = []
    for c in cols:
        k = df[c].dtype.kind
        kinds.append("i" if k in "iu" else k)
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for c, k in zip(cols, kinds):
            v = row[c]
            if k == "f":
                vals.append(f"{v:.6g}")
            elif k == "M":
                vals.append(pd.Timestamp(v).isoformat())
            else:
                # the real driver's sort_values dies on ndarray/list
                # cells — fail the same way instead of str()-ing past it
                # (object-kind columns only: numpy scalars in numeric
                # columns also expose __array__ but are fine)
                if k == "O" and (isinstance(v, (list, tuple, dict))
                                 or hasattr(v, "__array__")):
                    raise TypeError(
                        f"unhashable list-like cell in column '{c}'")
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return kinds, hashlib.md5("\x02".join(out).encode()).hexdigest()


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
        # driver-parity third voice: both sides through pandas, the path
        # the real driver's canonicalizer takes (list columns die, and
        # dtype-kind divergence — HUGEINT→float64, DECIMAL→object —
        # stringifies differently even when fetchall/str() matched)
        try:
            skinds, shash = canon_df(pd.read_parquet(pq))
            okinds, ohash = canon_df(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"PANDAS   {name}: driver-path canonicalize failed: {e}")
            bad += 1
            continue
        if skinds != okinds:
            print(f"DTYPE    {name}: pandas dtype kinds diverge "
                  f"spark={skinds} oracle={okinds} (cols sorted)")
            bad += 1
            continue
        if shash != ohash:
            print(f"DHASH    {name}: driver-path (pandas) hash mismatch")
            bad += 1
            continue
        print(f"OK       {name} ({len(srows)} rows)")
        ok += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0


def selftest():
    """Prove the gates fire on seeded regressions (run: --selftest)."""
    con = duckdb.connect()
    fails = []

    # 1. HUGEINT lint: a bare integer SUM must be rejected
    r = con.sql("SELECT SUM(x) AS s FROM (SELECT 1 AS x UNION ALL SELECT 2)")
    types = [str(t).upper() for t in r.types]
    if not any("HUGEINT" in t for t in types):
        fails.append("seeded bare SUM did not type as HUGEINT")

    # 2. the cast form passes the same lint
    r2 = con.sql("SELECT CAST(SUM(x) AS BIGINT) AS s "
                 "FROM (SELECT 1 AS x UNION ALL SELECT 2)")
    if any("HUGEINT" in str(t).upper() or str(t).upper().startswith("DECIMAL")
           for t in r2.types):
        fails.append("CAST(SUM AS BIGINT) wrongly flagged")

    # 3. driver-path dtype gate: HUGEINT lands as pandas float64 ('f')
    #    while the Spark twin is int64 ('i') — kinds must diverge
    okinds, _ = canon_df(r.df())
    skinds, _ = canon_df(pd.DataFrame({"s": pd.array([3], dtype="int64")}))
    if okinds == skinds:
        fails.append("pandas dtype-kind gate blind to HUGEINT vs int64")

    # 4. list columns must die in the driver path (sort_values on
    #    ndarray cells), mirroring the real driver's hard failure
    try:
        canon_df(con.sql("SELECT [1, 2] AS l").df())
        fails.append("list column survived driver-path canonicalization")
    except Exception:
        pass

    for f in fails:
        print(f"SELFTEST FAIL: {f}")
    print("selftest:", "FAIL" if fails else "ok",
          f"({4 - len(fails)}/4 gates)")
    return 1 if fails else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))

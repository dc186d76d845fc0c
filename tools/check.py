#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <outdir>
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. registers each parquet table from sfdir as a DuckDB view
  3. runs every oracle_sql.json query, compares against the Spark parquet
     dump: schema (column names), row count, and value hash with columns
     sorted by name.
"""
import json
import sys
import glob
import os

import duckdb


# Dtypes whose pandas conversion diverges from fetchall(): DuckDB renders
# HUGEINT/UHUGEINT (int128) as float64 in .df(), so a driver that
# canonicalizes through pandas prints "6.0" where fetchall() prints "6".
# Round 7 shipped two oracle queries emitting HUGEINT (list_sum, windowed
# sum over integers) that passed this replica but failed the driver — the
# guard below makes that class of red reproduce locally.
PANDAS_DIVERGENT_TYPES = {"HUGEINT", "UHUGEINT"}


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style canonicalization: repr of float
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_digest(cols, rows, sort_rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [[norm_cell(r[i]) for i in order] for r in rows]
    if sort_rows:
        data.sort()
    import hashlib

    h = hashlib.sha256()
    for r in data:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()


def selftest():
    """Round-trip each dtype class the suite emits through both the
    fetchall() path (this replica) and the pandas .df() path (the shape a
    pandas-based driver sees), and report which classes diverge.  A class
    listed as DIVERGES must never appear in an oracle query's output
    schema — the gate above enforces that for the known offenders.

    DATE also diverges (pandas renders midnight timestamps) but is
    SYMMETRIC: a pandas driver reads both the Spark parquet and the
    DuckDB result the same way, so it cancels.  HUGEINT is ASYMMETRIC —
    parquet has no int128, so it can only ever appear on the oracle side,
    where a pandas driver floats it while the Spark side stays integral.
    Hence only HUGEINT/UHUGEINT hard-fail the gate."""
    con = duckdb.connect()
    cases = {
        "BOOLEAN": "SELECT true AS v UNION ALL SELECT false",
        "INTEGER": "SELECT 42::INTEGER AS v",
        "BIGINT": "SELECT 42::BIGINT AS v",
        "HUGEINT": "SELECT list_sum([1,2,3]) AS v",
        "DECIMAL": "SELECT 1.25::DECIMAL(12,2) AS v",
        "DOUBLE": "SELECT 1.5::DOUBLE AS v UNION ALL SELECT 'nan'::DOUBLE",
        "VARCHAR": "SELECT 'x' AS v",
        "TIMESTAMP": "SELECT TIMESTAMP '2024-01-02 03:04:05' AS v",
        "DATE": "SELECT DATE '2024-01-02' AS v",
        "LIST": "SELECT [1,2,3] AS v",
        "NULL": "SELECT NULL::BIGINT AS v",
    }
    any_diverge = False
    for label, q in cases.items():
        fa = [norm_cell(r[0]) for r in con.sql(q).fetchall()]
        df = con.sql(q).df()
        pd_cells = []
        for x in df["v"]:
            # pandas scalars: unwrap numpy types the way a driver would
            if hasattr(x, "tolist"):
                x = x.tolist()
            if x is None or (isinstance(x, float) and x != x and label != "DOUBLE"):
                x = None
            if hasattr(x, "to_pydatetime"):
                x = x.to_pydatetime()
            pd_cells.append(norm_cell(x))
        status = "ok      " if fa == pd_cells else "DIVERGES"
        if fa != pd_cells:
            any_diverge = True
        print(f"{status} {label:10s} fetchall={fa} pandas={pd_cells}")
    print(
        "\nDivergent classes must be CAST away in oracle SQL "
        "(the main gate fails HUGEINT/UHUGEINT outputs)."
        if any_diverge
        else "\nAll dtype classes canonicalize identically on both paths."
    )


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # GRAFT_CHECK_MEM / GRAFT_CHECK_THREADS: bound DuckDB for the scaled
    # gates (r19: the sf1ish run OOM'd inside a posting-list oracle with
    # >100 GB free — an unbounded intermediate; a memory_limit makes
    # DuckDB spill instead of die).
    mem = os.environ.get("GRAFT_CHECK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='/tmp/duckdb_spill'")
    thr = os.environ.get("GRAFT_CHECK_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        # testdata ships single files; ScaleData writes Spark-style
        # directories — register either shape (the sf1 spot-gate runs
        # against a scaled directory layout)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # GRAFT_CHECK_SKIP: comma-separated key substrings to skip. Used for
    # larger-SF gate runs where an ORACLE is all-pairs quadratic (the
    # dedup family's ground-truth SQL) and DuckDB would run for hours —
    # the Spark side is the scalable one; those keys' scale evidence
    # comes from BENCH_r*_sf1.json instead.
    skip = [s for s in os.environ.get("GRAFT_CHECK_SKIP", "").split(",") if s]
    # GRAFT_CHECK_ONLY: restrict to matching keys (re-check after a fix).
    only = [s for s in os.environ.get("GRAFT_CHECK_ONLY", "").split(",") if s]
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and not any(s in name for s in only):
            continue
        if any(s in name for s in skip):
            print(f"skipped  {name} (GRAFT_CHECK_SKIP)")
            continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            orc = con.sql(sql)
            o_cols = [c.lower() for c in orc.columns]
            o_types = [str(t) for t in orc.types]
            o_rows = orc.fetchall()
        except Exception as e:
            print(f"ORA_ERR  {name}: {e}")
            n_fail += 1
            continue
        divergent = [
            f"{c}:{t}" for c, t in zip(o_cols, o_types) if t in PANDAS_DIVERGENT_TYPES
        ]
        if divergent:
            print(
                f"FAIL     {name}: oracle emits pandas-divergent dtype(s) "
                f"[{', '.join(divergent)}] — CAST to BIGINT in the oracle SQL "
                f"(driver canonicalization renders int128 as float)"
            )
            n_fail += 1
            continue
        sp = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        s_cols = [c.lower() for c in sp.columns]
        s_rows = sp.fetchall()
        problems = []
        if sorted(o_cols) != sorted(s_cols):
            problems.append(f"schema oracle={sorted(o_cols)} spark={sorted(s_cols)}")
        elif len(o_rows) != len(s_rows):
            problems.append(f"rows oracle={len(o_rows)} spark={len(s_rows)}")
        else:
            ho = table_digest(o_cols, o_rows, sort_rows=True)
            hs = table_digest(s_cols, s_rows, sort_rows=True)
            if ho != hs:
                problems.append("value hash mismatch (row-sorted)")
                # show first differing row for debugging
                oo = sorted([[norm_cell(r[i]) for i in sorted(range(len(o_cols)), key=lambda i: o_cols[i])] for r in o_rows])
                ss = sorted([[norm_cell(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])] for r in s_rows])
                for a, b in zip(oo, ss):
                    if a != b:
                        problems.append(f"  first diff oracle={a} spark={b}")
                        break
            else:
                ho2 = table_digest(o_cols, o_rows, sort_rows=False)
                hs2 = table_digest(s_cols, s_rows, sort_rows=False)
                if ho2 != hs2:
                    problems.append("ROW ORDER differs (values match when sorted)")
        if problems:
            print(f"FAIL     {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass     {name} ({len(s_rows)} rows)")
            n_pass += 1

    # rows-only queries (no oracle): just report counts
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{d}*.parquet')").fetchone()[0]
                print(f"rowsonly {name}: {n} rows")
            except Exception as e:
                print(f"rowsonly {name}: ERROR {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

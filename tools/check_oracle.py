#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` already ran.
Registers each parquet table in DuckDB, runs every oracle SQL, and compares
row count, column names (sorted), and a row-order-insensitive value hash
against the Spark parquet dump — the same comparison shape the driver uses.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by stringified tuple
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def fmt(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    out = sorted(tuple(fmt(r[i]) for i in order) for r in rows)
    return out

def connect(sf_dir):
    """A DuckDB connection with the testdata tables registered as views.

    GRAFT_ORACLE_MEM (e.g. "14GB") caps per-connection memory: every
    parallel worker's DuckDB otherwise assumes it owns 80% of RAM, and
    N workers x 80% is how the r18 sf1 sweep OOM'd instead of spilling.
    """
    con = duckdb.connect()
    mem = os.environ.get("GRAFT_ORACLE_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    # per-PROCESS spill dir: every in-memory DuckDB defaults its
    # temp_directory to cwd/.tmp, so two parallel workers share spill
    # files and one worker's cleanup races another's reads - observed as
    # a fatal duckdb::IOException ("Could not remove file
    # .tmp/duckdb_temp_storage-0.tmp") that kills the worker mid-query
    # and silently loses its task (r19 sf1 sweep). Same gitignored
    # location, one subdir per pid.
    con.execute(f"SET temp_directory='.tmp/duckdb-{os.getpid()}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_query(con, out_dir, name, oracle_sql):
    """Compare one query's Spark dump against its oracle SQL.

    Returns a dict: {query, status, spark_rows, oracle_rows, note} where
    status is ok | mismatch | no_spark_output | oracle_error | hugeint.
    The comparison shape (row count, sorted column names, order-insensitive
    stringified value hash) mirrors the driver's harness, HUGEINT guard
    included.
    """
    d = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        return dict(query=name, status="no_spark_output",
                    spark_rows=0, oracle_rows=0, note="")
    sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    scols = [c[0] for c in con.description]
    try:
        desc = con.execute(
            f"DESCRIBE SELECT * FROM ({oracle_sql}) LIMIT 0").fetchall()
        huge = [(c, t) for c, t, *_ in desc if t in ("HUGEINT", "UHUGEINT")]
        if huge:
            return dict(query=name, status="hugeint", spark_rows=len(sdf),
                        oracle_rows=0, note=f"cast to BIGINT: {huge}")
        odf = con.execute(oracle_sql).fetchall()
        ocols = [c[0] for c in con.description]
    except Exception as e:
        return dict(query=name, status="oracle_error", spark_rows=len(sdf),
                    oracle_rows=0, note=str(e)[:300])
    rows_ok = len(sdf) == len(odf)
    schema_ok = sorted(scols) == sorted(ocols)
    hash_ok = schema_ok and canon(sdf, scols) == canon(odf, ocols)
    if rows_ok and schema_ok and hash_ok:
        return dict(query=name, status="ok", spark_rows=len(sdf),
                    oracle_rows=len(odf), note="")
    note = "" if schema_ok else f"schema {scols} / {ocols}"
    if schema_ok and rows_ok and not hash_ok:
        a, b = canon(sdf, scols), canon(odf, ocols)
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:2]
        note = "; ".join(f"spark={x} oracle={y}" for x, y in diffs)[:300]
    return dict(query=name, status="mismatch", spark_rows=len(sdf),
                oracle_rows=len(odf), note=note)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noop = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"{name:28s} NO-SPARK-OUTPUT")
            n_fail += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [c[0] for c in con.description]
        if name not in oracle:
            print(f"{name:28s} no_oracle rows={len(sdf)}")
            n_noop += 1
            continue
        try:
            # HUGEINT guard: the driver's comparison converts DuckDB results
            # through a path where HUGEINT/UHUGEINT become float64 (unlike
            # fetchall's exact Python ints), so any oracle whose FINAL
            # projection is hugeint hash-mismatches in the official gate even
            # when values are identical — this was the r11/r12 six-red-row
            # root cause. Fail loudly here so it never ships again.
            desc = con.execute(
                f"DESCRIBE SELECT * FROM ({oracle[name]}) LIMIT 0").fetchall()
            huge = [(c, t) for c, t, *_ in desc if t in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"{name:28s} HUGEINT-OUTPUT {huge} "
                      f"(cast to BIGINT in the oracle SQL)")
                n_fail += 1
                continue
            odf = con.execute(oracle[name]).fetchall()
            ocols = [c[0] for c in con.description]
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and canon(sdf, scols) == canon(odf, ocols)
        if rows_ok and schema_ok and hash_ok:
            print(f"{name:28s} OK rows={len(sdf)}")
            n_pass += 1
        else:
            schema_desc = "ok" if schema_ok else f"{scols} / {ocols}"
            print(f"{name:28s} MISMATCH rows {len(sdf)}/{len(odf)} "
                  f"schema {schema_desc} hash={hash_ok}")
            if schema_ok and rows_ok and not hash_ok:
                a, b = canon(sdf, scols), canon(odf, ocols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"    spark:  {x}\n    oracle: {y}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noop} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

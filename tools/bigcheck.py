#!/usr/bin/env python3
"""DuckDB-side multiset-hash compare for LARGE query outputs.

check.py / hashcheck.py canonicalize per-cell in Python, which is the
binding constraint on scale cells with data-sized outputs (a 150M-row
q27 dump would spend hours in the Python row loop, not in either
engine). This tool pushes the ENTIRE compare into DuckDB: each side is
rendered to the same canonical row string check.py builds (sorted
column order, '|' separator, floats via C printf '%.9g' with 0/'nan'
normalization — Python's format() follows C, so the renderings agree),
then reduced to (row_count, SUM(hash(row_string))) — a multiset
equality check that streams at engine speed on both sides.

Differences from check.py, on purpose:
  - multiset equality via a 64-bit-hash sum in 128-bit accumulation
    (collision odds are negligible for a correctness gate; check.py's
    sorted-sha256 stays the driver-parity reference for small outputs);
  - unsupported column types RAISE instead of str()-falling-back, so a
    type this canon was never validated for cannot drift silently
    (timestamps must be rendered to strings by the query, the e06
    discipline — naive TIMESTAMP is allowed, TIMESTAMPTZ is not).

Usage: python3 tools/bigcheck.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, os, glob, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

INT_LIKE = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
            "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIME"}


def canon_expr(col, typ):
    t = typ.upper()
    q = f'"{col}"'
    if t in ("DOUBLE", "FLOAT", "REAL"):
        # mirror check.py: None->'NULL', nan->'nan', +-0->'0', else %.9g
        return (f"CASE WHEN {q} IS NULL THEN 'NULL' "
                f"WHEN isnan({q}) THEN 'nan' "
                f"WHEN {q} = 0 THEN '0' "
                f"ELSE printf('%.9g', CAST({q} AS DOUBLE)) END")
    if t == "BOOLEAN":
        return (f"CASE WHEN {q} IS NULL THEN 'NULL' "
                f"ELSE CAST(CAST({q} AS INTEGER) AS VARCHAR) END")
    if t in INT_LIKE or t.startswith("DECIMAL"):
        # str() of ints/strings/dates/naive-timestamps/decimals matches
        # DuckDB's VARCHAR rendering
        return f"COALESCE(CAST({q} AS VARCHAR), 'NULL')"
    raise ValueError(f"unsupported type {typ} for column {col} "
                     "(render it to VARCHAR/DOUBLE in the query, or teach "
                     "canon_expr the type)")


def digest_sql(cols_types, src):
    exprs = [canon_expr(c, t) for c, t in
             sorted(cols_types, key=lambda ct: ct[0])]
    row = "concat_ws('|', " + ", ".join(exprs) + ")"
    return (f"SELECT count(*) AS n, "
            f"COALESCE(sum(CAST(hash({row}) AS HUGEINT)), 0) AS h "
            f"FROM {src}")


def describe(con, src):
    rows = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
    return [(r[0], r[1]) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # optional resource caps (r16): a runaway oracle should error loud,
    # not fill the volume — d16's VARCHAR-verify replay at sf1.0 wrote
    # >50 GB of temp into the repo's cwd before ENOSPC killed it
    for env, pragma in [("BIGCHECK_MEMORY_LIMIT", "memory_limit"),
                        ("BIGCHECK_TEMP_DIR", "temp_directory"),
                        ("BIGCHECK_MAX_TEMP", "max_temp_directory_size")]:
        if os.environ.get(env):
            con.execute(f"SET {pragma}='{os.environ[env]}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and (not only or d in only))
    for name in names:
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"EMPTY  {name} (no parquet written)"); n_fail += 1
            continue
        if name not in oracles:
            print(f"skip   {name}: no oracle"); continue
        spark_src = f"'{out_dir}/{name}/*.parquet'"
        # staged oracle (r16): statements separated by --graft-stage--
        # run SEQUENTIALLY before the final SELECT (temp-table stages
        # bound peak memory where DuckDB schedules one statement's
        # independent pipelines concurrently — the d16 sf1.0 lesson).
        # The final SELECT is ALSO materialized before digesting:
        # wrapping it as a subquery under the digest aggregate moves
        # the optimizer boundary and can flip a join's build side onto
        # a cubic intermediate (g01's tail: 148 s clean standalone,
        # >18 GB offload wrapped — measured at sf1.0)
        stages = [s for s in oracles[name].split("--graft-stage--")
                  if s.strip()]
        if len(stages) > 1:
            for st in stages[:-1]:
                con.execute(st)
            con.execute("CREATE OR REPLACE TEMP TABLE graft_oracle_result"
                        f" AS {stages[-1]}")
            oracle_src = "graft_oracle_result"
        else:
            oracle_src = f"({stages[-1]}) oracle_q"
        got_ct = describe(con, spark_src)
        exp_ct = describe(con, oracle_src)
        if sorted(c for c, _ in got_ct) != sorted(c for c, _ in exp_ct):
            print(f"FAIL   {name}: cols {sorted(c for c, _ in got_ct)} != "
                  f"{sorted(c for c, _ in exp_ct)}")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            gn, gh = con.execute(digest_sql(got_ct, spark_src)).fetchone()
            t1 = time.time()
            en, eh = con.execute(digest_sql(exp_ct, oracle_src)).fetchone()
        except ValueError as e:
            # an unsupported column type is a FAILURE, not a skip — the
            # docstring's whole point is that an unvalidated type cannot
            # leave the gate green (r15 ADVICE: a silent skip here let a
            # cell with an unvalidated type exit 0)
            print(f"FAIL   {name}: {e}"); n_fail += 1; continue
        t2 = time.time()
        if (gn, gh) == (en, eh):
            print(f"PASS   {name} ({gn} rows; spark-side {t1-t0:.1f}s, "
                  f"oracle {t2-t1:.1f}s)")
            n_pass += 1
        else:
            # name-matched columns with DIFFERENT types render differently
            # under canon_expr (DOUBLE '0.5833' vs DECIMAL '0.583300') —
            # surface the type pairs so a rendering artifact is
            # distinguishable from a data bug in the FAIL line
            gt, et = dict(got_ct), dict(exp_ct)
            tdiff = [f"{c}: {gt[c]} vs {et[c]}"
                     for c in sorted(gt) if gt[c] != et.get(c, gt[c])]
            hint = f" (type mismatch — {'; '.join(tdiff)})" if tdiff else ""
            print(f"FAIL   {name}: rows {gn} vs {en}, "
                  f"hashsum {gh} vs {eh}{hint}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with tables registered as views on
<sfDir>/*.parquet, and compares: column names (sorted), row count, and a
hash over canonicalized values (floats rounded to 9 significant digits,
rows sorted). Prints PASS/FAIL per query.
"""
import sys, os, json, glob, math, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata = single parquet FILES; the ScaleUp/BenignCorpus
        # fixtures are Spark-written DIRECTORIES of part files — glob those
        # (sf1.0 oracle board, r13 verdict ask #1)
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # optional trailing names restrict the board (bigcheck.py parity).
    # Silently ignoring them was a footgun: `check.py <sf> <out> s01…`
    # over a mixed dump directory ground through every OTHER cell's
    # oracle too (r16: 139 CPU-min in g01's quadratic ground truth at
    # sf1.0 before anyone noticed).
    only = set(sys.argv[3:])
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and (not only or d in only))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"EMPTY  {name} (no parquet written)"); n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracles:
            status = "ROWS>0" if len(got_rows) > 0 else "ROWS=0 !!"
            print(f"skip   {name}: no oracle ({status}, {len(got_rows)} rows)")
            n_skip += 1
            if len(got_rows) == 0:
                n_fail += 1
            continue
        try:
            # staged oracle (r16): statements separated by --graft-stage--
            # run SEQUENTIALLY (temp-table stages bound peak memory where
            # DuckDB would schedule one statement's independent pipelines
            # concurrently); the last statement is the oracle SELECT
            stages = [s for s in oracles[name].split("--graft-stage--")
                      if s.strip()]
            for st in stages[:-1]:
                con.execute(st)
            exp = con.execute(stages[-1])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL   {name}: oracle SQL error: {e}"); n_fail += 1
            continue
        problems = []
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols {sorted(got_cols)} != {sorted(exp_cols)}")
        if len(got_rows) != len(exp_rows):
            problems.append(f"rows {len(got_rows)} != {len(exp_rows)}")
        if not problems:
            h1, h2 = table_hash(got_cols, got_rows), table_hash(exp_cols, exp_rows)
            if h1 != h2:
                problems.append(f"hash {h1} != {h2}")
                # show first diff
                order1 = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order2 = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
                l1 = sorted("|".join(canon(r[i]) for i in order1) for r in got_rows)
                l2 = sorted("|".join(canon(r[i]) for i in order2) for r in exp_rows)
                for a, b in zip(l1, l2):
                    if a != b:
                        problems.append(f"first diff:\n  spark: {a}\n  duck:  {b}")
                        break
        if problems:
            print(f"FAIL   {name}: " + "; ".join(problems)); n_fail += 1
        else:
            print(f"PASS   {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

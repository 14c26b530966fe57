#!/usr/bin/env python3
"""Local replica of the driver's t2 differential check.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dir, executes the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the same testdata parquet,
sorts columns by name, row-sorts, and value-compares.

Usage: oracle_check.py <sfDir> <outDir> [--strict]

--strict compares floats by exact repr (bit-exact), matching the
driver's hash sensitivity instead of the default 9-decimal rounding —
r19 proved the replica can be green at 9 decimals while the driver's
bit-level hash is red (q183). A strict FAIL whose default-mode run
passes means the graded column carries engine-accumulated float noise
(ulp-level summation-order or round() divergence): de-float it or
accept the tolerance knowingly.

Every query additionally passes an ARROW-SCHEMA type gate: both sides
are planned with LIMIT 0 and fetched via .arrow(), and per-column type
CLASSES are compared. FAIL on any decimal/float-class divergence
(decimal128 vs int, float vs int, float32 vs float64) — the r20 driver
red (q183/q184/q185) was DuckDB sum(BIGINT) returning HUGEINT → Arrow
decimal128(38,0) vs Spark's int64, which fetchall() flattens to int so
the VALUE compare alone is structurally blind to it. WARN on bare int
width (int32 vs int64), which the driver's hash has proven blind to
across nine green queries.
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

STRICT = "--strict" in sys.argv


def type_class(t):
    """Bucket an Arrow type into the classes the driver's hash sees.

    int widths collapse into one class (driver-proven blind); every
    decimal precision/scale and each float width is its OWN class so
    any cross-engine divergence there is a FAIL.
    """
    s = str(t)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("decimal"):
        return s          # exact: decimal128(38,0) != decimal128(18,2)
    if s in ("float", "double", "halffloat"):
        return s          # exact: float32 vs float64 hash differently
    return s


def type_gate(con, name, sql, spark_path):
    """Compare Arrow schemas of oracle vs spark output. Returns
    (n_fail_delta, n_warn_msgs)."""
    fails, warns = [], []
    try:
        duck_schema = con.execute(
            f"SELECT * FROM ({sql}) oc_tg LIMIT 0").arrow().schema
        sp_schema = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet') "
            f"LIMIT 0").arrow().schema
    except Exception as e:
        return [f"FAIL {name}: type gate error: {e}"], []
    duck_t = {f.name: f.type for f in duck_schema}
    sp_t = {f.name: f.type for f in sp_schema}
    for c in sorted(set(duck_t) & set(sp_t)):
        dc, sc = type_class(duck_t[c]), type_class(sp_t[c])
        if dc == sc:
            continue
        floaty = ("decimal", "float", "double", "halffloat")
        if dc.startswith(floaty) or sc.startswith(floaty):
            fails.append(
                f"FAIL {name}: column {c} Arrow type class duck="
                f"{duck_t[c]} spark={sp_t[c]} (driver hash sees this)")
        elif dc == "int" and sc == "int":
            pass  # same class by construction; unreachable
        else:
            warns.append(
                f"WARN {name}: column {c} Arrow type duck={duck_t[c]} "
                f"spark={sp_t[c]} (class-compatible; verify)")
    for c in sorted(set(duck_t) & set(sp_t)):
        if str(duck_t[c]) != str(sp_t[c]) and \
                type_class(duck_t[c]) == type_class(sp_t[c]) == "int":
            warns.append(
                f"WARN {name}: int width duck={duck_t[c]} "
                f"spark={sp_t[c]} (driver hash proven blind)")
    return fails, warns


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif not STRICT:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {name}: cols duck={sorted(duck_cols)} "
                  f"spark={sorted(sp_cols)}")
            n_fail += 1
            continue
        a, b = canon(duck_rows, duck_cols), canon(sp_rows, sp_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows duck={len(a)} spark={len(b)}")
            n_fail += 1
            continue
        # Arrow-schema type gate (value compare is blind to HUGEINT:
        # fetchall() flattens it to int — the r20 driver-red class)
        gate_fails, gate_warns = type_gate(con, name, sql, spark_path)
        for w in gate_warns:
            print(w)
        if gate_fails:
            for msg in gate_fails:
                print(msg)
            n_fail += 1
            continue
        # compare both as-ordered and sorted: flag order mismatches
        if a == b:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        elif sorted(a) == sorted(b):
            print(f"WARN {name}: values match but row ORDER differs")
            n_fail += 1
        else:
            diffs = [i for i, (x, y) in enumerate(zip(sorted(a), sorted(b)))
                     if x != y][:3]
            for i in diffs:
                print(f"FAIL {name} row {i}:\n  duck ={sorted(a)[i]}\n"
                      f"  spark={sorted(b)[i]}")
            print(f"FAIL {name}: {len(a)} rows, first diffs above")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # flags can appear anywhere; positionals bind to non-flag args
    # (previously `--strict <sf> <out>` misbound sfDir/outDir)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1]))

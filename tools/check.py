#!/usr/bin/env python3
"""Local pre-check replicating the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
  - reads <outDir>/<name>/ parquet (Spark result) for each query
  - reads <outDir>/oracle_sql.json, runs each SQL in DuckDB with views over
    <sfDir>/*.parquet
  - compares: schema (column names sorted), row count, and values
    (columns sorted by name, rows sorted, exact + approx compare)
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)

def normalize(table):
    cols = sorted(table.column_names)
    rows = []
    for i in range(table.num_rows):
        row = []
        for c in cols:
            v = table.column(c)[i].as_py()
            row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))

def vals_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def vals_close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(vals_close(x, y) for x, y in zip(a, b))
    return vals_eq(a, b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracles.items()):
        spark_tab = load_spark(outdir, name)
        if spark_tab is None:
            results[name] = "MISSING_SPARK_RESULT"
            continue
        try:
            duck_tab = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        scols, srows = normalize(spark_tab)
        dcols, drows = normalize(duck_tab)
        if scols != dcols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"
            continue
        # the driver's hash is type-sensitive: DuckDB HUGEINT/DECIMAL sums
        # vs Spark BIGINT hash differently even when values are equal.
        def kind(t):
            s = str(t)
            if s.startswith("int") or s.startswith("uint"): return "int"
            if s.startswith("decimal"): return "decimal"
            if s in ("float", "double", "halffloat"): return "float"
            if s in ("string", "large_string"): return "str"
            return s
        tmis = [(c, str(spark_tab.schema.field(c).type), str(duck_tab.schema.field(c).type))
                for c in scols
                if kind(spark_tab.schema.field(c).type) != kind(duck_tab.schema.field(c).type)]
        if tmis:
            results[name] = f"TYPE_KIND_MISMATCH (driver hash will fail) {tmis}"
            continue
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} duck={len(drows)}"
            continue
        exact = all(all(vals_eq(a, b) for a, b in zip(r1, r2))
                    for r1, r2 in zip(srows, drows))
        close = exact or all(all(vals_close(a, b) for a, b in zip(r1, r2))
                             for r1, r2 in zip(srows, drows))
        # RAW-DOUBLE HASH RISK (the q180 lesson, two rounds of it): a
        # float64 column whose values carry full 17-digit mantissas is
        # the ONLY value class that has ever passed this exact compare
        # yet failed the driver's own hash. Surface it loudly: a value
        # that isn't fixed at <=9 decimal digits (i.e. didn't come off a
        # ROUND()/quantized path) marks the query as hash-risk. PASS
        # still (the values ARE equal) — but the flag means "the driver
        # gate may disagree; prefer an integer/decimal surface".
        risk_cols = []
        for c in scols:
            if str(spark_tab.schema.field(c).type) not in ("float", "double"):
                continue
            vals = [v.as_py() for v in spark_tab.column(c)]
            if any(v is not None and not math.isnan(v) and not math.isinf(v)
                   and v != round(v, 9) for v in vals):
                risk_cols.append(c)
        risk = f" DOUBLE_HASH_RISK cols={risk_cols}" if risk_cols else ""
        # DECIMAL HASH RISK (the q180 r11 adjudication): ANY decimal
        # column on a compare surface is a hash-risk class — parquet
        # decimal128 and DuckDB DECIMAL canonicalize value-equal cells
        # differently at the driver, so a decimal surface can be
        # cell-identical here and still fail the driver hash (q180 was
        # 0-for-3 rounds as the registry's only decimal surface while
        # integer/string surfaces were 369-for-369). Flag it on EITHER
        # side — split into BIGINTs (floor + micro-fraction) instead.
        dec_cols = sorted(
            {c for c in scols
             if str(spark_tab.schema.field(c).type).startswith("decimal")
             or str(duck_tab.schema.field(c).type).startswith("decimal")})
        if dec_cols:
            risk += f" DECIMAL_HASH_RISK cols={dec_cols}"
        if exact:
            results[name] = "OK_EXACT" + risk
        elif close:
            # keep the surface-type risk flags: an approx-only compare is
            # MORE likely to fail the driver hash, not less — dropping
            # the DECIMAL/DOUBLE flags here would let a risky surface
            # slip past the summary WARN exactly when it matters most
            results[name] = "OK_APPROX (exact hash may fail!)" + risk
        else:
            bad = next(((i, a, b) for i, (r1, r2) in enumerate(zip(srows, drows))
                        for a, b in zip(r1, r2) if not vals_close(a, b)), None)
            results[name] = f"VALUE_MISMATCH first_diff={bad}"
    # report queries with no oracle (rows-only check)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            t = load_spark(outdir, name)
            n = t.num_rows if t is not None else 0
            results[name] = f"ROWS_ONLY rows={n}" + (" (EMPTY!)" if n == 0 else "")
    ok = True
    n_risk = 0
    n_dec = 0
    for name, r in sorted(results.items()):
        flag = "PASS" if r.startswith("OK") or (r.startswith("ROWS_ONLY") and "EMPTY" not in r) else "FAIL"
        if flag == "FAIL": ok = False
        if "DOUBLE_HASH_RISK" in r: n_risk += 1
        if "DECIMAL_HASH_RISK" in r: n_dec += 1
        print(f"[{flag}] {name}: {r}")
    if n_risk:
        print(f"[WARN] {n_risk} queries expose raw (un-quantized) doubles on "
              f"the compare surface — the driver hash has rejected this class "
              f"before (q180 r9/r10) even when values compare exactly here.")
    if n_dec:
        print(f"[WARN] {n_dec} queries expose DECIMAL columns on the compare "
              f"surface — the driver hash rejects value-equal decimals "
              f"(q180 r9-r11); split into BIGINT floor + micro-fraction.")
    sys.exit(0 if ok else 1)

main()

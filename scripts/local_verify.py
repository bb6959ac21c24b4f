#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on SparkEntry.oracleSql against the same parquet tables and
compares with the parquet results graft.Verify dumped. Columns are
sorted by name (driver contract), rows sorted by all columns, floats
compared with small tolerance.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def type_class(t):
    """Bucket an arrow type the way the driver's hash canonicalization
    distinguishes values. DuckDB HUGEINT arrives as decimal128(38,0) and
    hashes differently from Spark's int64 even when values are equal —
    that must be flagged, not silently value-normalized away."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    return str(t)


def type_mismatches(s_tbl, o_tbl):
    """Column-name → (spark, oracle) type-class pairs that differ."""
    s_types = {f.name: type_class(f.type) for f in s_tbl.schema}
    o_types = {f.name: type_class(f.type) for f in o_tbl.schema}
    return {c: (s_types[c], o_types[c])
            for c in set(s_types) & set(o_types)
            if s_types[c] != o_types[c]}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(s_rows)})"
            continue
        try:
            rel = con.sql(oracle[name])
            o_tbl = rel.arrow()
            o_cols, o_rows_raw = rel.columns, o_tbl.to_pylist()
            o_rows_raw = [tuple(r[c] for c in o_cols) for r in o_rows_raw]
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
            continue
        sc, sr = canon(s_cols, s_rows)
        oc, orr = canon(o_cols, o_rows_raw)
        bad_types = type_mismatches(tbl, o_tbl)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif bad_types:
            # values may still be equal, but the driver's type-sensitive
            # hash gate will record hash_match=false — treat as failure
            results[name] = f"TYPE_MISMATCH {bad_types}"
        elif len(sr) != len(orr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            results[name] = (f"VALUE_MISMATCH at sorted-row {bad}: "
                             f"spark={sr[bad]} oracle={orr[bad]}")
        else:
            results[name] = f"OK({len(sr)})"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else '----':4} {k}: {v}")
    print(f"== {npass}/{len(results)} exact-match, "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

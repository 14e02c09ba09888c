#!/usr/bin/env python3
"""Pre-flight gate mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the paired oracle SQL
in DuckDB over views of the testdata parquet, sorts columns by name,
normalizes timestamps to µs, and compares row-by-row.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import datetime
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(microsecond=(v.microsecond // 1) , tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def vals_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        return a == b  # exact: our queries are engineered for bit-parity
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failed.append(name)
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL  {name}: columns {gcols} != {ecols}")
            failed.append(name)
            continue
        got, exp = got[gcols], exp[ecols]
        # dtype-class gate: the driver's hash is value-representation
        # sensitive, so an oracle column that comes back float64/object
        # where Spark wrote integers (DuckDB HUGEINT → pandas float64,
        # e.g. an uncast SUM over BIGINT) hash-mismatches even when
        # every value is numerically equal. Catch it here, not in the
        # driver's artifact.
        def dclass(dt):
            k = dt.kind  # i/u int, f float, O object, b bool, M datetime
            return {"i": "int", "u": "int"}.get(k, k)
        dt_bad = [c for c in gcols
                  if dclass(got[c].dtype) != dclass(exp[c].dtype)]
        if dt_bad:
            for c in dt_bad:
                print(f"  {name} col {c}: spark dtype {got[c].dtype} "
                      f"!= oracle dtype {exp[c].dtype}")
            print(f"FAIL  {name}: dtype-class mismatch (driver hash would differ)")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            failed.append(name)
            continue
        bad = 0
        for i in range(len(got)):
            for c in gcols:
                if not vals_equal(got[c].iloc[i], exp[c].iloc[i]):
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: "
                              f"spark={got[c].iloc[i]!r} oracle={exp[c].iloc[i]!r}")
                    bad += 1
        if bad:
            print(f"FAIL  {name}: {bad} mismatched cells / {len(got)} rows")
            failed.append(name)
        else:
            print(f"ok    {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet results written by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB against the same sf dir, and compares after
sorting columns by name and rows by value (the driver hashes in that order).

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import datetime, decimal, json, math, os, sys

import duckdb


def canon(rows, cols):
    # Floats compare EXACTLY, matching the driver's hash compare — the queries
    # round(_, 2/3/6) on both sides precisely so exact compare is safe here.
    # One normalization stays: -0.0 -> 0.0. Spark's BigDecimal round() never
    # emits -0.0 while DuckDB's can, and the str(x) sort key would order
    # '-0.0' before '0.0' and break the positional zip-compare on values that
    # are numerically equal.
    def norm(v):
        if isinstance(v, float) and v == 0.0:
            return 0.0
        return v

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def _java_double(v):
    # java.lang.Double.toString: shortest round-trip digits, decimal
    # notation for 1e-3 <= |v| < 1e7, else "d.dddEk" scientific; NaN /
    # Infinity spelled out; -0.0 kept. Python repr uses the same shortest
    # digits but different notation thresholds ('1e+16' vs '1.0E16'), so
    # reformat per the Java rules. (Rare pre-JDK19 Double.toString outputs
    # carry an extra digit vs true-shortest — cosmetic in a diagnostic diff.)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    sign = "-" if math.copysign(1.0, v) < 0 else ""
    if v == 0.0:
        return sign + "0.0"
    t = decimal.Decimal(repr(abs(v))).normalize().as_tuple()
    digits = "".join(map(str, t.digits))
    exp10 = t.exponent + len(digits)  # |v| = 0.<digits> * 10^exp10
    if -2 <= exp10 <= 7:  # 1e-3 <= |v| < 1e7
        if exp10 <= 0:
            return sign + "0." + "0" * (-exp10) + digits
        if exp10 >= len(digits):
            return sign + digits + "0" * (exp10 - len(digits)) + ".0"
        return sign + digits[:exp10] + "." + digits[exp10:]
    return sign + digits[0] + "." + (digits[1:] or "0") + "E" + str(exp10 - 1)


def _java_instant(v):
    # java.time.Instant.toString: ISO-8601 Z, fraction trimmed to groups
    # of three digits with trailing zero groups dropped. tz-aware inputs
    # (duckdb's TIMESTAMPTZ fetch) normalize to UTC and drop the offset
    # first — isoformat() would otherwise append '+00:00', whose
    # trailing ':00' the zero-group trimmer then eats.
    if v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    s = v.isoformat()
    if "." in s:
        base, frac = s.split(".")
        frac = frac.ljust(9, "0")[:9]
        while frac.endswith("000"):
            frac = frac[:-3]
        s = base + ("." + frac if frac else "")
    return s + "Z"


def canon_cell(v):
    # mirrors graft.Verify's canonCell rendering exactly (one documented
    # format per type) — for human diffing against <name>.canon.txt
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, float):
        return _java_double(v)
    if isinstance(v, decimal.Decimal):
        return format(v, "f")  # toPlainString, declared scale kept
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, datetime.datetime):
        return _java_instant(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            sorted(canon_cell(k) + "=" + canon_cell(x)
                   for k, x in v.items())) + "}"
    return str(v)


def write_oracle_canon(out_dir, name, cols, rows):
    # rows re-sort by the RENDERED cells (NULLs last) — the same key
    # graft.Verify's writeCanon uses — so equal content aligns data
    # lines one-to-one and a red diffs line-to-line. canon()'s
    # str(raw)-keyed order (the hash compare) can differ from this only
    # for scientific-notation doubles, where order is cosmetic.
    rendered = sorted(
        (tuple(canon_cell(x) for x in r) for r in rows),
        key=lambda cells: tuple((c == "NULL", c) for c in cells))
    path = os.path.join(out_dir, f"{name}.oracle.canon.txt")
    with open(path, "w") as f:
        f.write("# " + "\t".join(cols) + "\n")
        for cells in rendered:
            f.write("\t".join(cells) + "\n")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    with open(os.path.join(out_dir, "oracle_versions.json"), "w") as f:
        json.dump({"duckdb": duckdb.__version__,
                   "python": sys.version.split()[0]}, f)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        s = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
        scols, srows = canon(s.fetchall(), s.columns)
        try:
            d = con.sql(oracle[name])
            dcols, drows = canon(d.fetchall(), d.columns)
            write_oracle_canon(out_dir, name, dcols, drows)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            n_fail += 1
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
        elif srows != drows:
            bad = [(a, b) for a, b in zip(srows, drows) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

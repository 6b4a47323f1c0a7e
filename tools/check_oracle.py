import duckdb, glob, itertools, json, math, os, sys

if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
    # Prove the checker rejects declared-type drift: write a BIGINT
    # parquet, oracle it with a HUGEINT-producing sum, expect FAIL.
    import subprocess, tempfile
    with tempfile.TemporaryDirectory() as tmp:
        con = duckdb.connect()
        os.makedirs(f"{tmp}/out/drift")
        con.execute(f"COPY (SELECT CAST(6 AS BIGINT) AS s) TO "
                    f"'{tmp}/out/drift/part-0.parquet' (FORMAT PARQUET)")
        con.execute(f"COPY (SELECT CAST(i AS BIGINT) AS v FROM range(1,4) t(i)) TO "
                    f"'{tmp}/lineitem.parquet' (FORMAT PARQUET)")
        for t in ["region","nation","customer","supplier","part","orders",
                  "events","documents","embeddings"]:
            con.execute(f"COPY (SELECT 1 AS one) TO '{tmp}/{t}.parquet' (FORMAT PARQUET)")
        # sum(BIGINT) → HUGEINT in DuckDB; the parquet declares BIGINT.
        json.dump({"drift": "SELECT sum(v) AS s FROM lineitem"},
                  open(f"{tmp}/out/oracle_sql.json", "w"))
        r = subprocess.run([sys.executable, __file__, tmp, f"{tmp}/out"],
                           capture_output=True, text=True)
        ok = "FAIL drift: col type drift" in r.stdout and "'drift'" in r.stdout.splitlines()[-1]
        print(r.stdout, end="")
        print("SELFTEST", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_local"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
def canon(cols, rows):
    # sort columns by name, round doubles to 12 sig digits, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cv(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            if v == 0: return "0"
            return f"{v:.12g}"
        return str(v)
    return sorted(tuple(cv(r[i]) for i in order) for r in rows)
fails = []
for name, sql in sorted(oracle.items()):
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]; orows = o.fetchall()
        files = glob.glob(f"{out}/{name}/*.parquet")
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]; srows = s.fetchall()
        if sorted(ocols) != sorted(scols):
            fails.append(name); print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}"); continue
        # FATAL: cross-class declared-type drift fails even when values
        # stringify equal. The driver's hash is type-aware at the
        # value-representation level (the q111 r6/r7 lesson: DuckDB
        # widened a window sum to HUGEINT vs Spark's BIGINT — values
        # identical, hash red), while SAME-class width drift
        # (INTEGER vs BIGINT, UBIGINT vs BIGINT) has passed the driver
        # gate for 7 rounds (q17-q20/q62/q95) — so the classes are:
        # 64-bit-representable ints | HUGEINT | floats | exact-other.
        # DB-API description is coarse ('NUMBER' for every numeric) —
        # use DESCRIBE, which yields exact logical types (BIGINT/HUGEINT/…).
        def tclass(t):
            if t in ("TINYINT","SMALLINT","INTEGER","BIGINT",
                     "UTINYINT","USMALLINT","UINTEGER","UBIGINT"): return "INT64"
            if t in ("FLOAT","DOUBLE"): return "FLOAT"
            return t  # HUGEINT, DECIMAL(p,s), VARCHAR, DATE, … exact-match
        otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
        tdiff = {c: (otypes[c], stypes[c]) for c in ocols
                 if tclass(otypes[c]) != tclass(stypes.get(c, "<absent>"))}
        if tdiff:
            fails.append(name); print(f"FAIL {name}: col type drift {tdiff}"); continue
        wdiff = {c: (otypes[c], stypes[c]) for c in ocols if otypes[c] != stypes.get(c)}
        if wdiff: print(f"  note {name}: same-class width drift {wdiff}")
        co, cs = canon(ocols, orows), canon(scols, srows)
        if co != cs:
            fails.append(name)
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            if len(co) != len(cs):
                print(f"  row-count mismatch: oracle={len(co)} spark={len(cs)}")
            # zip_longest: a pure length mismatch (equal shared prefix)
            # still prints the first missing/extra row
            for a, b in itertools.zip_longest(co, cs, fillvalue="<absent>"):
                if a != b: print(f"  oracle={a}\n  spark ={b}"); break
        else:
            print(f"OK   {name}: {len(orows)} rows")
    except Exception as e:
        fails.append(name); print(f"ERR  {name}: {e}")
print("FAILS:", fails if fails else "none")

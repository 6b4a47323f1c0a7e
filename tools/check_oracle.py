import duckdb, glob, itertools, json, math, sys
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
        # non-fatal: surface declared-type drift even when names line up
        otypes = dict(zip(ocols, [str(d[1]) for d in o.description]))
        stypes = dict(zip(scols, [str(d[1]) for d in s.description]))
        tdiff = {c: (otypes[c], stypes[c]) for c in ocols if otypes[c] != stypes.get(c)}
        if tdiff: print(f"  note {name}: col type diffs {tdiff}")
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

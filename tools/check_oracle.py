#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet Verify wrote, and compare
schema + sorted rows exactly. Builder-side tooling only (not library code)."""
import duckdb, json, sys, glob, math, time, os

# Per-oracle DuckDB runtime budget. Round 9 lost its entire correctness
# artifact because one oracle (ann_imi_assign, un-MATERIALIZED CTEs)
# silently took ~10 minutes at sf0.01 and blew the driver gate's wall
# budget. Any oracle slower than WARN_S gets flagged; slower than FAIL_S
# fails the run — a slow oracle is a gate bug even when the rows match.
WARN_S = float(os.environ.get("ORACLE_WARN_S", "10"))
FAIL_S = float(os.environ.get("ORACLE_FAIL_S", "60"))

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    # driver testdata is flat files; ScaleGen fixtures are Spark
    # directory-parquet — accept both
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"create view {name} as select * from '{pat}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
slow = []
timings = {}
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    try:
        sdf = con.execute(f"select * from '{spark_dir}/*.parquet'").fetch_arrow_table()
        t0 = time.monotonic()
        odf = con.execute(sql).fetch_arrow_table()
        osec = time.monotonic() - t0
        timings[name] = round(osec, 3)
        if osec > FAIL_S:
            fails.append((name, f"ORACLE TOO SLOW: {osec:.1f}s > {FAIL_S:.0f}s budget"))
        elif osec > WARN_S:
            slow.append((name, osec))
        scols = sorted(sdf.column_names)
        ocols = sorted(odf.column_names)
        if scols != ocols:
            fails.append((name, f"cols: spark={scols} oracle={ocols}")); continue
        stypes = {c: str(sdf.schema.field(c).type) for c in scols}
        otypes = {c: str(odf.schema.field(c).type) for c in ocols}
        if stypes != otypes:
            fails.append((name, f"types: spark={stypes} oracle={otypes}")); continue
        srows = sorted(map(tuple, sdf.select(scols).to_pylist() and [tuple(r[c] for c in scols) for r in sdf.to_pylist()]), key=lambda t: tuple((v is None, str(v)) for v in t))
        orows = sorted([tuple(r[c] for c in ocols) for r in odf.to_pylist()], key=lambda t: tuple((v is None, str(v)) for v in t))
        if len(srows) != len(orows):
            fails.append((name, f"rowcount: spark={len(srows)} oracle={len(orows)}")); continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            for va, vb in zip(a, b):
                same = (va == vb) or (isinstance(va, float) and isinstance(vb, float) and (math.isnan(va) and math.isnan(vb) or va == vb))
                if not same:
                    bad = (i, a, b); break
            if bad: break
        if bad:
            fails.append((name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}")); continue
        raw_s = [tuple(r[c] for c in scols) for r in sdf.to_pylist()]
        raw_o = [tuple(r[c] for c in ocols) for r in odf.to_pylist()]
        order = "ordered" if raw_s == raw_o else "UNORDERED"
        print(f"  OK {name}: {len(srows)} rows [{order}] oracle={osec:.2f}s")
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {str(e)[:300]}"))
with open(f"{outdir}/oracle_timings.json", "w") as f:
    json.dump(dict(sorted(timings.items(), key=lambda kv: -kv[1])), f, indent=1)
print()
if timings:
    total = sum(timings.values())
    top = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    print(f"oracle wall: {total:.1f}s total; top: " +
          ", ".join(f"{n}={s:.1f}s" for n, s in top))
if slow:
    print(f"{len(slow)} SLOW oracles (> {WARN_S:.0f}s warn budget):")
    for n, s in slow:
        print(f"  SLOW {n}: {s:.1f}s")
if fails:
    print(f"{len(fails)} FAILURES:")
    for n, msg in fails:
        print(f"  FAIL {n}: {msg}")
    sys.exit(1)
print(f"all {len(oracle)} queries match")

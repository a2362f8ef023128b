"""Check a staged CANDIDATES row against its oracle at a given SF
under the driver compare contract (sorted columns, row count, and the
order-insensitive value hash with floats canonicalized to 12sd) — the
check_driver.py sibling for rows that are not registered yet.

Usage: python tests/check_candidate.py <name> <sf_dir>
"""
import hashlib, os, sys
import duckdb
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
name = sys.argv[1]
sf_dir = sys.argv[2]
from terra_bonobo_nodes_spark.plans.queries_candidates import CANDIDATES
fn, oracle = CANDIDATES[name]
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC").getOrCreate())
sdf = fn(spark, sf_dir)
scols = sdf.columns
srows = [tuple(r) for r in sdf.collect()]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
res = con.execute(oracle)
dcols = [d[0] for d in res.description]
drows = res.fetchall()
def norm(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return "true" if v else "false"
    if isinstance(v, float): return f"{v:.12g}"
    if isinstance(v, bytes): return v.hex()
    return str(v)
def h(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\x1e".join(lines).encode()).hexdigest()
ok_schema = sorted(scols) == sorted(dcols)
ok_rows = len(srows) == len(drows)
ok_hash = h(scols, srows) == h(dcols, drows)
print(f"{name} @ {sf_dir}: rows {len(srows)}/{len(drows)} schema={'ok' if ok_schema else 'FAIL'} hash={'ok' if ok_hash else 'FAIL'}")
sys.exit(0 if (ok_schema and ok_rows and ok_hash) else 1)

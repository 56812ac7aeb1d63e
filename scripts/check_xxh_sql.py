"""Property test: the DuckDB-SQL xxh64 expression (scripts/xxh64_sql.py —
the python twin of graft.ops.XxhSql) equals the pure-Python reference
(scripts/xxh64_ref.py, validated against the public xxh64 test vectors and
Spark's XXH64) over random ASCII strings (len 1..31) x seeds.

The end-to-end guarantee for the Scala transcription is the driver's oracle
compare itself (a drift would hash-mismatch every xxh64-seeded query); this
script is the fast local check while editing the generator."""
import random
import string
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from xxh64_ref import to_signed, xxh64  # noqa: E402
from xxh64_sql import xxh64_sql  # noqa: E402

random.seed(1)
strs = ["a", "ab", "abc", "abcd", "abcdefgh", "abcdefghi",
        "abcdefghijklmnop", "abcdefghijklmnopq", "the quick brown fox jum"] + \
       ["".join(random.choices(string.ascii_letters + string.digits + " _",
                               k=random.randint(1, 31))) for _ in range(300)]
seeds = [0, 1, 7, 15, 42]

con = duckdb.connect()
con.sql("CREATE TABLE t AS SELECT tok, sd FROM (SELECT unnest(?) AS tok) a "
        "CROSS JOIN (SELECT unnest(?) AS sd) b", params=[strs, seeds])
rows = con.sql(f"SELECT tok, sd, {xxh64_sql('tok', 'sd')} AS h FROM t").fetchall()
bad = [(tok, sd, h, to_signed(xxh64(tok.encode(), sd)))
       for tok, sd, h in rows if h != to_signed(xxh64(tok.encode(), sd))]
for tok, sd, h, exp in bad[:5]:
    print(f"MISMATCH {tok!r} seed={sd} sql={h} ref={exp}")
print(f"check_xxh_sql: {len(rows)} cases, {len(bad)} mismatches")
sys.exit(1 if bad else 0)

"""Generator for a DuckDB SQL expression computing XXH64 of an ASCII string
column (len < 32) with a per-row seed column — used to build the DuckDB
oracles for the xxh64-seeded queries (minhash / simhash). All arithmetic is
HUGEINT mod 2^64; the result is the SIGNED BIGINT Spark produces.

The Scala oracle strings (graft.ops.*) embed the exact SQL this generator
emits; scripts/check_xxh_sql.py proves the SQL against the pure-Python
reference implementation (scripts/xxh64_ref.py), which itself matches
Spark's XXH64 and the public test vectors."""

U64 = "18446744073709551616"   # 2^64
U32 = "4294967296"             # 2^32
P1 = "11400714785074694791"
P2 = "14029467366897019727"
P3 = "1609587929392839161"
P4 = "9650029242287828579"
P5 = "2870177450012600261"


def mul64(a, b):
    # (a*b) mod 2^64 without overflowing HUGEINT (a,b < 2^64):
    # a*b ≡ (a mod 2^32)*b + ((a div 2^32)*(b mod 2^32) mod 2^32)*2^32
    return (f"((({a}) % {U32}) * ({b}) + "
            f"((({a}) // {U32}) * (({b}) % {U32}) % {U32}) * {U32}) % {U64}")


def rotl(x, r):
    hi = 1 << r
    lo = 1 << (64 - r)
    return f"((({x}) * {hi}) % {U64} + (({x}) // {lo}))"


def xor64(a, b):
    return f"xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT))::HUGEINT"


def shr(x, s):
    return f"(({x}) // {1 << s})"


def step8(acc, c):
    """One 8-byte round: acc ^= round(0,c); acc = rotl27(acc)*P1 + P4."""
    k = mul64(rotl(mul64(c, P2), 31), P1)
    x = xor64(acc, k)
    return f"({mul64(rotl(x, 27), P1)} + {P4}) % {U64}"


def step1(acc, b):
    """One tail-byte round: acc ^= b*P5; acc = rotl11(acc)*P1."""
    x = xor64(acc, mul64(b, P5))
    return mul64(rotl(x, 11), P1)


def avalanche(acc):
    a1 = mul64(xor64(acc, shr(acc, 33)), P2)
    a2 = mul64(xor64(a1, shr(a1, 29)), P3)
    return xor64(a2, shr(a2, 32))


def xxh64_sql(str_col, seed_col):
    """SQL expression: signed-BIGINT xxh64 of ASCII `str_col` with
    `seed_col` (any integer expression), valid for length(str_col) < 32.
    Uses correlated subqueries with one-row CTE-less SELECTs to name
    intermediates (DuckDB supports lateral-style scalar subqueries in
    SELECT via nested subqueries over VALUES)."""
    # byte list (1-indexed), HUGEINT elements
    bs = f"list_transform(string_split({str_col}, ''), x -> ord(x)::HUGEINT)"
    n = f"length({str_col})"
    # 8-byte little-endian chunks
    c8 = ("list_transform(generate_series(1, xh_ln // 8), j -> "
          "xh_bl[8*j-7] + xh_bl[8*j-6]*256 + xh_bl[8*j-5]*65536"
          " + xh_bl[8*j-4]*16777216"
          " + xh_bl[8*j-3]*4294967296 + xh_bl[8*j-2]*1099511627776"
          " + xh_bl[8*j-1]*281474976710656 + xh_bl[8*j]*72057594037927936)")
    acc0 = f"((xh_sd)::HUGEINT % {U64} + {P5} + xh_ln) % {U64}"
    red8 = f"list_reduce(list_prepend({acc0}, {c8}), (acc, c) -> {step8('acc', 'c')})"
    # optional 4-byte chunk
    c4 = ("(xh_bl[8*(xh_ln//8)+1] + xh_bl[8*(xh_ln//8)+2]*256"
          " + xh_bl[8*(xh_ln//8)+3]*65536 + xh_bl[8*(xh_ln//8)+4]*16777216)")
    acc2 = (f"CASE WHEN xh_ln % 8 >= 4 THEN "
            f"({mul64(rotl(xor64('xh_a1', mul64(c4, P1)), 23), P2)} + {P3}) % {U64}"
            f" ELSE xh_a1 END")
    # tail bytes after 8- and 4-byte chunks
    tail = ("list_slice(xh_bl, (xh_ln // 8) * 8"
            " + CASE WHEN xh_ln % 8 >= 4 THEN 5 ELSE 1 END, xh_ln)")
    red1 = f"list_reduce(list_prepend(xh_a2, {tail}), (acc, b) -> {step1('acc', 'b')})"
    fin = avalanche("xh_a3")
    signed = (f"CASE WHEN xh_ln >= 32 THEN NULL "
              f"WHEN ({fin}) >= 9223372036854775808 "
              f"THEN (({fin}) - {U64})::BIGINT ELSE ({fin})::BIGINT END")
    return (f"(SELECT {signed} FROM (SELECT {red1} AS xh_a3, xh_ln FROM "
            f"(SELECT {acc2} AS xh_a2, xh_bl, xh_ln "
            f"FROM (SELECT {red8} AS xh_a1, xh_bl, xh_ln "
            f"FROM (SELECT {bs} AS xh_bl, {n} AS xh_ln, ({seed_col}) AS xh_sd)))))")


if __name__ == "__main__":
    print(xxh64_sql("tok", "sd"))

package graft.ops

/** Emits a DuckDB SQL expression computing XXH64 (Yann Collet's public
  * algorithm; the same function Spark's `xxhash64` and the graft kernels
  * use via `o.a.s.sql.catalyst.expressions.XXH64`) of an ASCII string
  * column with a per-row seed — so the driver's DuckDB oracle can
  * independently recompute the xxh64-seeded signatures (MinHash seeds,
  * SimHash token hashes, KMV key hashes).
  *
  * All arithmetic is HUGEINT mod 2^64 (DuckDB has no wrapping 64-bit ops);
  * 64x64 multiplication is split 32/32 to stay inside HUGEINT range. Valid
  * for strings shorter than 32 bytes (the xxh64 short-input path — every
  * hashed string here is a token <= 8 B, a 3-token shingle <= 26 B, or a
  * decimal key). `scripts/check_xxh_sql.py` proves this SQL against a
  * pure-Python reference implementation validated on the public xxh64 test
  * vectors and against Spark's own outputs.
  */
object XxhSql {
  private val U64 = "18446744073709551616"
  private val U32 = "4294967296"
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"

  // (a*b) mod 2^64 without overflowing (signed 128-bit) HUGEINT:
  // a*b ≡ (a mod 2^32)*b + ((a div 2^32)*(b mod 2^32) mod 2^32)*2^32
  private def mul64(a: String, b: String): String =
    s"((($a) % $U32) * ($b) + " +
      s"((($a) // $U32) * (($b) % $U32) % $U32) * $U32) % $U64"

  private def rotl(x: String, r: Int): String = {
    val hi = BigInt(1) << r
    val lo = BigInt(1) << (64 - r)
    s"((($x) * $hi) % $U64 + (($x) // $lo))"
  }

  private def xor64(a: String, b: String): String =
    s"xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT))::HUGEINT"

  private def shr(x: String, s: Int): String =
    s"(($x) // ${BigInt(1) << s})"

  private def step8(acc: String, c: String): String = {
    val k = mul64(rotl(mul64(c, P2), 31), P1)
    s"(${mul64(rotl(xor64(acc, k), 27), P1)} + $P4) % $U64"
  }

  private def step1(acc: String, b: String): String =
    mul64(rotl(xor64(acc, mul64(b, P5)), 11), P1)

  private def avalanche(acc: String): String = {
    val a1 = mul64(xor64(acc, shr(acc, 33)), P2)
    val a2 = mul64(xor64(a1, shr(a1, 29)), P3)
    xor64(a2, shr(a2, 32))
  }

  /** Signed-BIGINT xxh64 of ASCII `strCol` (len < 32) with integer
    * expression `seedCol`, as one scalar-subquery SQL expression.
    */
  def expr(strCol: String, seedCol: String): String = {
    val bs = s"list_transform(string_split($strCol, ''), x -> ord(x)::HUGEINT)"
    val n = s"length($strCol)"
    val c8 = "list_transform(generate_series(1, xh_ln // 8), j -> " +
      "xh_bl[8*j-7] + xh_bl[8*j-6]*256 + xh_bl[8*j-5]*65536" +
      " + xh_bl[8*j-4]*16777216 + xh_bl[8*j-3]*4294967296" +
      " + xh_bl[8*j-2]*1099511627776 + xh_bl[8*j-1]*281474976710656" +
      " + xh_bl[8*j]*72057594037927936)"
    val acc0 = s"((xh_sd)::HUGEINT % $U64 + $P5 + xh_ln) % $U64"
    val red8 =
      s"list_reduce(list_prepend($acc0, $c8), (acc, c) -> ${step8("acc", "c")})"
    val c4 = "(xh_bl[8*(xh_ln//8)+1] + xh_bl[8*(xh_ln//8)+2]*256" +
      " + xh_bl[8*(xh_ln//8)+3]*65536 + xh_bl[8*(xh_ln//8)+4]*16777216)"
    val acc2 = s"CASE WHEN xh_ln % 8 >= 4 THEN " +
      s"(${mul64(rotl(xor64("xh_a1", mul64(c4, P1)), 23), P2)} + $P3) % $U64" +
      s" ELSE xh_a1 END"
    val tail = "list_slice(xh_bl, (xh_ln // 8) * 8" +
      " + CASE WHEN xh_ln % 8 >= 4 THEN 5 ELSE 1 END, xh_ln)"
    val red1 =
      s"list_reduce(list_prepend(xh_a2, $tail), (acc, b) -> ${step1("acc", "b")})"
    val fin = avalanche("xh_a3")
    // inputs >= 32 bytes would need the 4-lane xxh64 path this expression
    // does not implement — return NULL so misuse fails the hash compare
    // LOUDLY instead of silently producing a wrong hash
    val signed = s"CASE WHEN xh_ln >= 32 THEN NULL " +
      s"WHEN ($fin) >= 9223372036854775808 " +
      s"THEN (($fin) - $U64)::BIGINT ELSE ($fin)::BIGINT END"
    s"(SELECT $signed FROM (SELECT $red1 AS xh_a3, xh_ln FROM " +
      s"(SELECT $acc2 AS xh_a2, xh_bl, xh_ln " +
      s"FROM (SELECT $red8 AS xh_a1, xh_bl, xh_ln " +
      s"FROM (SELECT $bs AS xh_bl, $n AS xh_ln, ($seedCol) AS xh_sd)))))"
  }

  /** Literal SQL list of 2^b for b in 0..63 (HUGEINT), for bit extraction:
    * `(pow2List)[bit + 1]`.
    */
  val pow2List: String =
    (0 until 64).map(b => s"${BigInt(1) << b}::HUGEINT")
      .mkString("[", ", ", "]")

  /** Unsigned HUGEINT -> signed BIGINT (two's-complement reinterpretation). */
  def signed(u: String): String =
    s"CASE WHEN ($u) >= 9223372036854775808 THEN (($u) - $U64)::BIGINT " +
      s"ELSE ($u)::BIGINT END"
}

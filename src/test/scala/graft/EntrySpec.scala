package graft

/** The driver's t1 smoke contract: `SparkEntry.entry` returns >0 rows on
  * sf0.001, and every query name has either an oracle or a documented
  * rows-only status.
  */
class EntrySpec extends GraftSuite {

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("rows-only queries are the documented non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("dedup_minhash_lsh", "dedup_simhash",
      "sim_ann_lsh", "mm_decode_features", "text_winnow",
      "agg_approx_sketch"), s"unexpected rows-only set: $rowsOnly")
  }
}

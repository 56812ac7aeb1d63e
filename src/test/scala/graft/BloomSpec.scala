package graft

import org.apache.spark.sql.functions._

import graft.functions.aggregates.bloom_bits
import graft.functions.functions.might_contain_bloom

/** Bloom-filter semantics: the prefilter contract is "false = definitely
  * absent" — NO false negatives ever, false positives bounded by sizing.
  * The planted-corpus test proves the end-to-end epoch dedup equals the
  * exact anti-join regardless of FP behavior.
  */
class BloomSpec extends GraftSuite {

  test("bloom has no false negatives; absent keys are mostly rejected") {
    import spark.implicits._
    val keys = spark.range(0, 2000).select(xxhash64(col("id")).as("h"))
    val bloom = keys.agg(bloom_bits(col("h"), 1 << 16, 5).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(bloom.length == (1 << 16) / 8)
    // every inserted key must probe true (repartitioned build → the blob
    // above went through partial merges already)
    val misses = spark.range(0, 2000)
      .select(xxhash64(col("id")).as("h"))
      .withColumn("hit", might_contain_bloom(lit(bloom), col("h"), 5))
      .filter(!col("hit")).count()
    assert(misses == 0, s"false negatives: $misses")
    // disjoint key space: the vast majority must probe false (FP rate at
    // 2000 keys in 65536 bits with k=5 is well under 1%)
    val fp = spark.range(1000000, 1002000)
      .select(xxhash64(col("id")).as("h"))
      .withColumn("hit", might_contain_bloom(lit(bloom), col("h"), 5))
      .filter(col("hit")).count()
    assert(fp < 100, s"implausible FP count: $fp / 2000")
  }

  test("partial merge: partitioned build equals single-partition build") {
    val many = spark.range(0, 5000).repartition(8)
      .select(xxhash64(col("id")).as("h"))
      .agg(bloom_bits(col("h"), 1 << 14, 4)).collect()(0).getAs[Array[Byte]](0)
    val one = spark.range(0, 5000).coalesce(1)
      .select(xxhash64(col("id")).as("h"))
      .agg(bloom_bits(col("h"), 1 << 14, 4)).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(many, one),
      "bloom bits depend on partitioning")
  }

  test("planted epoch dedup equals the exact anti-join") {
    import spark.implicits._
    // docs 0..99; text repeats every 7 ids → cross-epoch duplicates exist
    val docs = (0L until 100L).map(i => (i, s"text-${i % 7}"))
      .toDF("doc_id", "text")
    val old = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      .select(md5(col("text")).as("text_md5"))
    val neu = docs.filter(pmod(col("doc_id"), lit(10)) >= 5)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    val bloom = old.agg(bloom_bits(xxhash64(col("text_md5")), 1 << 12, 5)
      .as("bf"))
    val probed = neu.crossJoin(broadcast(bloom))
      .withColumn("maybe",
        might_contain_bloom(col("bf"), xxhash64(col("text_md5")), 5))
    val got = probed.filter(!col("maybe")).select("doc_id")
      .unionByName(probed.filter(col("maybe")).select("doc_id", "text_md5")
        .join(old, Seq("text_md5"), "left_anti").select("doc_id"))
      .orderBy("doc_id").as[Long].collect()
    val want = neu.join(old, Seq("text_md5"), "left_anti")
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(got.sameElements(want),
      s"bloom path ${got.toSeq} != exact ${want.toSeq}")
  }

  test("mistyped bloom child fails at analysis time") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("a", "b").toDF("x").agg(bloom_bits(col("x"), 1 << 10, 3)).collect()
    }
    assert(e.getMessage.contains("bloom_bits") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  test("bloom dedup: the confirm anti-join stays above the probe") {
    val df = graft.ops.DataOps.queries("data_bloom_dedup")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the anti-join condition carries the probe term referencing the
    // bloom blob — the structural pin that stops Catalyst pushing the
    // join below the probe (which would feed it the FULL new epoch)
    val antiLine = p.linesIterator.find(_.contains("LeftAnti"))
      .getOrElse(fail(s"no anti join:\n$p"))
    assert(antiLine.contains("might_contain_bloom"),
      s"anti-join lost the probe pin (join may have been pushed below " +
        s"the prefilter):\n$p")
  }

  test("cap_per_source plans a WindowGroupLimit (rank-limit pushdown)") {
    val df = graft.ops.DataOps.queries("data_cap_per_source")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no rank-limit pushdown:\n$p")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Pins the r11 [[Tables.rebalanced]] contract (VERDICT r10 items 1-2 of
  * "What's wrong"): directory-aware sizing, byte-capped partition count,
  * and IDENTITY on inputs whose file layout already fills the cores (the
  * production shape — a 100 TB table is a many-file directory; the r10
  * `java.io.File.length()` gate read the ~4 KB dirent size there and
  * would have round-robin-shuffled the whole table).
  */
class TablesSpec extends GraftSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-tbl").toString

  test("dataSize sums leaf files of a parquet DIRECTORY, not the dirent") {
    val dir = tmp()
    spark.range(2000)
      .select(col("id"), md5(col("id").cast("string")).as("x"))
      .repartition(4).write.mode("overwrite").parquet(s"$dir/multi.parquet")
    val (bytes, files) = Tables.dataSize(spark, s"$dir/multi.parquet")
    assert(files >= 4, s"files=$files")
    // a directory's java.io dirent is ~4 KB; the summed parts exceed it
    assert(bytes > 8 * 1024, s"bytes=$bytes")
  }

  test("rebalanced: single small file gets a BYTE-CAPPED hash repartition") {
    val dir = tmp()
    // high-entropy columns so parquet cannot compress below the chunk size
    spark.range(30000)
      .select(col("id"), md5(col("id").cast("string")).as("a"),
        md5(md5(col("id").cast("string"))).as("b"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/one.parquet")
    val (bytes, files) = Tables.dataSize(spark, s"$dir/one.parquet")
    assert(files == 1L, s"files=$files")
    assert(bytes > Tables.DefaultChunkBytes, s"fixture too small: $bytes")
    val t = Tables(spark, dir)
    val df = spark.read.parquet(s"$dir/one.parquet")
    val out = t.rebalanced("one", df, Seq("id"))
    val cores = spark.sparkContext.defaultParallelism.toLong
    val chunk = Tables.DefaultChunkBytes
    val want = math.min(cores, (bytes + chunk - 1) / chunk).toInt
    assert(want > 1, s"fixture must want parallelism, want=$want")
    assert(out.rdd.getNumPartitions == want,
      s"got ${out.rdd.getNumPartitions}, want $want")
  }

  test("rebalanced: IDENTITY when the file layout already fills the cores") {
    val dir = tmp()
    val cores = spark.sparkContext.defaultParallelism
    spark.range(2000)
      .select(col("id"), md5(col("id").cast("string")).as("x"))
      .repartition(cores).write.mode("overwrite")
      .parquet(s"$dir/multi.parquet")
    val (_, files) = Tables.dataSize(spark, s"$dir/multi.parquet")
    assert(files >= cores.toLong, s"files=$files")
    val t = Tables(spark, dir)
    val df = spark.read.parquet(s"$dir/multi.parquet")
    // reference equality: the frame is returned untouched, no shuffle added
    assert(t.rebalanced("multi", df, Seq("id")) eq df)
  }
}

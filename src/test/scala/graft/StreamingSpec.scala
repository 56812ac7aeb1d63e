package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.{EventOps, Tables}
import graft.streaming.StreamingOps

/** Structured Streaming specs: the streaming pipelines must agree with their
  * batch counterparts over the same (finite) events source.
  */
class StreamingSpec extends GraftSuite {

  test("streaming hourly window agg equals the batch events_hourly result") {
    val stream = StreamingOps.readEvents(spark, sfDir)
    val got = StreamingOps
      .runToMemory(StreamingOps.hourlyCounts(stream), "hourly", OutputMode.Update())
      .select((unix_millis(col("win_start")) / 3600000L).cast("long")
        .as("hour_bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_bucket", "event_type")
      .collect()
    val want = EventOps.queries("events_hourly")(spark, sfDir).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getString(1) == w.getString(1)
        && g.getLong(2) == w.getLong(2), s"mismatch: $g vs $w")
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9)
    }
  }

  test("streaming keyed session state matches batch per-user event counts") {
    val stream = StreamingOps.readEvents(spark, sfDir)
    val got = StreamingOps
      .runToMemory(StreamingOps.runningSessions(spark, stream), "sessions",
        OutputMode.Update())
    // one state row per user; total users match the batch user count
    val users = Tables(spark, sfDir).events
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(got.select("user_id").distinct().count() == users)
    // each user's final session bounds are consistent
    val bad = got.filter(col("last_ms") < col("start_ms")).count()
    assert(bad == 0)
    // the last session per user matches the batch sessionization's last row
    val batchLast = EventOps.queries("events_sessionize")(spark, sfDir)
      .groupBy("user_id")
      .agg(max(col("session_idx")).as("mx"))
      .count()
    assert(batchLast == users)
  }
}

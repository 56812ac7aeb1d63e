package graft

import graft.ops.{EventOps, Tables}

class EventOpsSpec extends GraftSuite {

  test("funnel stage counts match a per-user first-occurrence replay") {
    // ground truth independent of the query: replay events in Scala,
    // take each user's first ts per stage, apply the strict-order rule
    val events = Tables(spark, sfDir).events
      .selectExpr("user_id", "event_type",
        // same ns->ms floor conversion the query uses
        EventOps.floorDivSql("ts", 1000000L) + " AS ts_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    def firstTs(es: Array[(Long, String, Long)], t: String): Option[Long] = {
      val ts = es.collect { case (_, `t`, ms) => ms }
      if (ts.isEmpty) None else Some(ts.min)
    }
    val nUsers = byUser.size.toLong
    var nView, nViewClick, nComplete = 0L
    byUser.values.foreach { es =>
      val (v, c, p) =
        (firstTs(es, "view"), firstTs(es, "click"), firstTs(es, "purchase"))
      if (v.isDefined) nView += 1
      val vc = v.isDefined && c.isDefined && c.get > v.get
      if (vc) nViewClick += 1
      if (vc && p.isDefined && p.get > c.get) nComplete += 1
    }
    val row = EventOps.queries("events_funnel")(spark, sfDir).collect()(0)
    assert(row.getLong(0) == nUsers, "n_users")
    assert(row.getLong(1) == nView, "n_view")
    assert(row.getLong(2) == nViewClick, "n_view_click")
    assert(row.getLong(3) == nComplete, "n_funnel_complete")
    // the funnel is monotone by construction
    assert(nView >= nViewClick && nViewClick >= nComplete)
  }

  test("retention cohorts match a per-user week replay") {
    val events = Tables(spark, sfDir).events
      .selectExpr("user_id",
        EventOps.floorDivSql("ts", 1000000L * 604800000L) + " AS wk")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val weeks = events.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).toSet
    }
    val expected = weeks.values.groupBy(_.min).map { case (cw, cs) =>
      cw -> (cs.size.toLong,
        cs.count(_.contains(cw + 1)).toLong,
        cs.count(_.contains(cw + 2)).toLong)
    }
    val got = EventOps.queries("events_retention")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.aggregates.topk_doubles
import graft.ops.{AnalyticsExt, Tables}

class AggregatesSpec extends GraftSuite {

  test("TopKDoubles matches orderBy/limit ground truth per group") {
    val t = Tables(spark, sfDir)
    val got = t.orders.groupBy("o_orderstatus")
      .agg(topk_doubles(col("o_totalprice"), 5).as("top5"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    got.keys.foreach { status =>
      val want = t.orders.filter(col("o_orderstatus") === status)
        .orderBy(col("o_totalprice").desc).limit(5)
        .collect().map(_.getAs[Double]("o_totalprice")).toSeq
      assert(got(status) == want, s"status $status")
    }
  }

  test("TopKDoubles handles k larger than the group") {
    import spark.implicits._
    val got = Seq(1.0, 3.0, 2.0).toDF("x")
      .agg(topk_doubles(col("x"), 10)).collect()(0).getSeq[Double](0)
    assert(got == Seq(3.0, 2.0, 1.0))
  }

  test("approx sketches are close to exact values") {
    val rows = AnalyticsExt.queries("agg_approx_sketch")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exactNdv, kmvNdv, hllOk, medOk) =>
      // KMV with k=256 has rsd ~ 1/sqrt(k-1) ~ 6.3%; 25% is a ~4-sigma
      // bound that still fails loudly on a broken estimator
      assert(math.abs(kmvNdv - exactNdv) / exactNdv < 0.25,
        s"$flag kmv=$kmvNdv exact=$exactNdv")
      // the bounded-error contract columns the oracle pins as TRUE
      assert(hllOk, s"$flag HLL estimate outside 15% of exact")
      assert(medOk, s"$flag approx median more than 2 from exact")
    }
  }
}

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
    val approx = AnalyticsExt.queries("agg_approx_sketch")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exact = Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("ndv"),
        median(col("l_quantity")).as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    approx.foreach { case (flag, ndv, med) =>
      val (eNdv, eMed) = exact(flag)
      assert(math.abs(ndv - eNdv).toDouble / eNdv < 0.1,
        s"$flag ndv approx=$ndv exact=$eNdv")
      assert(math.abs(med - eMed) <= 2.0, s"$flag median approx=$med exact=$eMed")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.aggregates.{kmin_kth_long, topk_doubles}
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

  test("KMinKthLong matches the sorted-distinct ground truth per group") {
    val t = Tables(spark, sfDir)
    val hashed = t.lineitem.select(col("l_returnflag"),
      xxhash64(col("l_partkey").cast("string")).as("h"))
    val k = 37
    val got = hashed.groupBy("l_returnflag")
      .agg(kmin_kth_long(col("h"), k).as("hk"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    got.keys.foreach { flag =>
      val distinctAsc = hashed.filter(col("l_returnflag") === flag)
        .select("h").distinct().orderBy(col("h").asc).limit(k)
        .collect().map(_.getLong(0))
      // fail with a message (not an NPE) if a smaller corpus ever drops a
      // group below k distinct hashes
      assert(distinctAsc.length == k,
        s"flag $flag has only ${distinctAsc.length} distinct hashes (< $k)")
      assert(got(flag).contains(distinctAsc.last), s"flag $flag")
    }
  }

  test("KMinKthLong is NULL when the group has fewer than k distinct values") {
    import spark.implicits._
    val rows = Seq(1L, 2L, 2L, 3L).toDF("x")
      .agg(kmin_kth_long(col("x"), 4)).collect()
    assert(rows(0).isNullAt(0)) // only 3 distinct values
    val kth = Seq(5L, 1L, 3L, 1L, 2L).toDF("x")
      .agg(kmin_kth_long(col("x"), 3)).collect()(0).getLong(0)
    assert(kth == 3L) // distinct sorted = 1,2,3,5; 3rd smallest = 3
  }

  test("histogram quantiles land within one bin width of exact percentiles") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.AnalyticsExt
      .queries("agg_quantile_hist")(spark, sfDir).collect()
    val data = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, n) = (r.getString(0), r.getLong(1))
      val xs = data(flag)
      assert(n == xs.length.toLong)
      Seq(50 -> r.getDouble(2), 95 -> r.getDouble(3), 99 -> r.getDouble(4))
        .foreach { case (p, est) =>
          // exact p-th percentile (ceil-rank definition, matching the
          // cum*100 >= n*p threshold the sketch uses)
          val exact = xs(((xs.length.toLong * p + 99) / 100 - 1).toInt)
          assert(math.abs(est - exact) <= 840.0,
            s"$flag p$p: est $est vs exact $exact")
        }
    }
  }

  test("histogram quantiles: the rounding contract holds at a planted " +
      "NON-dyadic bin width (no reliance on 840.0 being representable)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // width 0.7 is not exactly representable in binary; plant values AT
    // the bin edges (k*0.7 in double) plus interior points, so bin
    // assignment exercises the inexact v/width division on both sides
    val width = 0.7
    // domain [0, 64*0.7 = 44.8): edge values k*0.7 for k = 1..60 plus
    // interior points — all within the binned domain so the one-width
    // accuracy bound applies (out-of-domain clamping is pinned below)
    val xs = (1 to 60).map(k => k * width) ++ Seq(0.35, 20.65, 41.3)
    val got = graft.ops.AnalyticsExt.quantileHistFrom(
      xs.toDF("v").withColumn("g", lit("all")), col("v"), "g",
      binWidth = width, nBins = 64).collect()(0)
    // driver replay with the IDENTICAL IEEE arithmetic
    def binOf(v: Double) = math.min(63, math.floor(v / width).toInt)
    val counts = xs.groupBy(binOf).view.mapValues(_.size.toLong).toMap
    val n = xs.size.toLong
    def q(p: Int): Double = {
      var cum = 0L
      counts.keys.toSeq.sorted.iterator
        .map { b => cum += counts(b); (b, cum) }
        .collectFirst { case (b, c) if c * 100L >= n * p =>
          (b + 1) * width }.get
    }
    assert(got.getLong(1) == n)
    val est = Seq(50 -> got.getDouble(2), 95 -> got.getDouble(3),
      99 -> got.getDouble(4))
    est.foreach { case (p, e) => assert(e == q(p), s"p$p: $e != ${q(p)}") }
    // and the one-bin-width accuracy bound vs exact ceil-rank percentiles
    val sorted = xs.sorted
    est.foreach { case (p, e) =>
      val exact = sorted(((n * p + 99) / 100 - 1).toInt)
      assert(e >= exact - 1e-9 && e <= exact + width + 1e-9,
        s"p$p: est $e outside [$exact, ${exact + width}]")
    }
    // out-of-domain values clamp into the last bin and read as the
    // domain upper edge — the documented saturation contract
    val clamped = graft.ops.AnalyticsExt.quantileHistFrom(
      Seq(1.0, 2.0, 999.0).toDF("v").withColumn("g", lit("all")),
      col("v"), "g", binWidth = width, nBins = 64).collect()(0)
    assert(clamped.getDouble(3) == 64 * width, clamped.toString)
  }

  test("agg_approx_sketch plan has no KMV window sort or distinct shuffle") {
    val df = AnalyticsExt.queries("agg_approx_sketch")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    // the KMV order statistic must come from the O(k) aggregate, not a
    // row_number window over the (sorted) distinct-hash table
    assert(!plan.contains("row_number"), plan)
    assert(plan.contains("kmin_kth_long"), plan)
    // the only windows left are the cumulative-median ones over the tiny
    // (l_returnflag, l_quantity) counts table — never over raw hashes
    assert(!plan.toLowerCase.contains("sort [h#"), plan)
  }

  test("HllNdv256 with linear counting lands near exact NDV; merge is " +
      "partition-invariant") {
    import graft.functions.aggregates.hll_ndv256
    val t = Tables(spark, sfDir)
    def run(parts: Int) = t.lineitem.repartition(parts)
      .groupBy("l_returnflag")
      .agg(hll_ndv256(xxhash64(col("l_partkey").cast("string"))).as("sk"))
      .select(col("l_returnflag"), col("sk.raw_est"), col("sk.zero_regs"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2)))
      .toMap
    val one = run(1)
    // element-wise-max merge: any partitioning yields identical registers
    assert(run(7) == one, "sketch must be partition-invariant")
    val exact = t.lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    one.foreach { case (flag, (raw, zeros)) =>
      // the documented reader-side small-range correction
      val est = if (zeros > 0 && raw <= 2.5 * 256)
        256.0 * math.log(256.0 / zeros)
      else raw
      val err = math.abs(est - exact(flag)) / exact(flag)
      // HLL m=256 rsd ~ 1.04/sqrt(256) = 6.5%; 20% is a 3-sigma bound
      assert(err < 0.2, s"$flag est=$est exact=${exact(flag)} err=$err")
    }
  }

  test("HLL harmonic-sum conversion mimics DuckDB's two-step HUGEINT cast") {
    import graft.functions.HllNdv256
    // counterexample from review: a valid register state with
    // hsum = 2^64 + 2^63 + 6143 (low-NDV regime). DuckDB 1.0 computes
    // CAST AS DOUBLE as (double)upper*2^64 + (double)lower (double-rounded)
    // giving est bits 0x406ea573bd9a730f; BigInt.toDouble (correctly
    // rounded once) gives ...10 — one ulp apart, which the exact hash
    // compare would fail. The engine must match the oracle's semantics.
    val sum = (BigInt(1) << 64) + (BigInt(1) << 63) + 6143
    val est = HllNdv256.EstNumerator / HllNdv256.sumToDoubleDuckdb(sum)
    assert(java.lang.Double.doubleToLongBits(est) == 0x406ea573bd9a730fL,
      f"est bits ${java.lang.Double.doubleToLongBits(est)}%016x")
    // and in the regime below 2^64 the two conversions agree exactly
    val small = (BigInt(1) << 59) + 12345
    assert(HllNdv256.sumToDoubleDuckdb(small) == small.toDouble)
  }

  test("CmsCounters overcounts never undercounts and merges " +
    "partition-invariantly") {
    import spark.implicits._
    import graft.functions.aggregates.cms_counters
    val D = 4; val W = 256
    // planted skew: key 7 x50, key 13 x20, keys 1..30 once each
    val keys = Seq.fill(50)(7L) ++ Seq.fill(20)(13L) ++ (1L to 30L)
    def run(parts: Int): Map[Long, Long] = {
      val buckets = array((0 until D).map(r =>
        pmod(xxhash64(concat(lit(r.toString), col("k").cast("string"))),
          lit(W)).cast("int")): _*)
      val sk = keys.toDF("k").repartition(parts)
        .agg(cms_counters(buckets, D, W).as("cms"))
      def est(p: Long) = least((0 until D).map { r =>
        element_at(col("cms"), lit(r * W) +
          pmod(xxhash64(lit(r.toString + p.toString)), lit(W)).cast("int") +
          lit(1))
      }: _*)
      val row = sk.select(est(7L), est(13L), est(21L), est(999L)).collect()(0)
      Map(7L -> row.getLong(0), 13L -> row.getLong(1),
        21L -> row.getLong(2), 999L -> row.getLong(3))
    }
    val one = run(1)
    // CMS bound: est >= true count; with 100 keys in 4x256 counters the
    // planted heavy hitters dominate their buckets
    assert(one(7L) >= 50 && one(13L) >= 20 && one(21L) >= 1, one.toString)
    assert(one(999L) >= 0)
    // est is bounded by total mass; sanity that it is not absurdly off
    assert(one.values.forall(_ <= keys.size), one.toString)
    // merge invariance: counters are sums, partitioning cannot change them
    assert(run(7) == one)
  }

  test("CmsCounters skips NULL keys when gated (the oracle's NULL contract)") {
    import spark.implicits._
    import graft.functions.aggregates.cms_counters
    val D = 4; val W = 256
    def total(df: org.apache.spark.sql.DataFrame): Long = {
      // gated buckets: NULL key -> NULL array -> no increments
      val k = col("k").cast("string")
      val buckets = when(k.isNotNull, array((0 until D).map(r =>
        pmod(xxhash64(concat(lit(r.toString), k)), lit(W)).cast("int")): _*))
      df.agg(cms_counters(buckets, D, W).as("cms"))
        .select(aggregate(col("cms"), lit(0L), (a, x) => a + x))
        .collect()(0).getLong(0)
    }
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("k")
    val withoutNulls = Seq(1L, 2L, 3L).toDF("k")
    // total counter mass = D per non-null row; NULL rows add nothing
    assert(total(withoutNulls) == 3L * D)
    assert(total(withNulls) == total(withoutNulls),
      "NULL keys must not enter the sketch")
  }

  test("VecSumLongs matches per-dimension groupBy sums") {
    import spark.implicits._
    import graft.functions.aggregates.vec_sum_longs
    val df = Seq(
      ("a", Seq(1L, 2L, 3L)),
      ("a", Seq(10L, 20L, 30L)),
      ("b", Seq(5L)),
      ("b", Seq(7L, -2L))). // shorter array zero-pads
      toDF("g", "v")
    val got = df.groupBy("g").agg(vec_sum_longs(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(11L, 22L, 33L))
    assert(got("b") == Seq(12L, -2L))
  }

  test("embeddings are fixed-dimension (the centroid vector-sum contract)") {
    // the vec_sum_longs centroid identity divides per-dimension sums by the
    // per-label ROW count — equivalent to the oracle's per-(label, dim)
    // contributor count only when every vector has the same length. Pin
    // the contract so a ragged corpus fails here, not as a silent oracle
    // hash mismatch.
    val dims = graft.ops.Tables(spark, sfDir).embeddings
      .select(size(col("embedding"))).distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) > 0,
      s"embeddings must be fixed-dimension, saw ${dims.mkString(",")}")
  }

  test("centroid queries shuffle vectors, not exploded (row, dim) pairs") {
    import graft.ops.SimilarityOps
    for (name <- Seq("sim_label_centroid", "sim_ann_ivf")) {
      val df = SimilarityOps.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val s = df.queryExecution.executedPlan.toString
      // the centroid build must aggregate whole vectors (vec_sum_longs),
      // never posexplode N×D (vector, dimension) rows into an exchange
      assert(!s.contains("Generate"), s"$name explodes before shuffle")
      assert(s.contains("vec_sum_longs"), s"$name missing vector aggregate")
    }
  }

  test("mistyped aggregate inputs fail analysis loudly, not read garbage") {
    import spark.implicits._
    // int array where vec_sum_longs requires array<bigint>: without the
    // checkInputDataTypes override, UnsafeArrayData.getLong would silently
    // read 4-byte ints as 8-byte longs (garbage values, no error)
    val ints = Seq(Seq(1, 2), Seq(3, 4)).toDF("v")
    val e1 = intercept[Exception] {
      ints.agg(graft.functions.aggregates.vec_sum_longs(col("v"))).collect()
    }
    assert(e1.getMessage.contains("vec_sum_longs"), e1.getMessage)
    // double where kmin_kth_long requires bigint
    val e2 = intercept[Exception] {
      Seq(1.0, 2.0).toDF("x").agg(kmin_kth_long(col("x"), 2)).collect()
    }
    assert(e2.getMessage.contains("kmin_kth_long"), e2.getMessage)
    // long array where cms_counters requires array<int> bucket indices
    val e3 = intercept[Exception] {
      Seq(Seq(1L)).toDF("b")
        .agg(graft.functions.aggregates.cms_counters(col("b"), 1, 4)).collect()
    }
    assert(e3.getMessage.contains("cms_counters"), e3.getMessage)
    // the happy path still analyzes: array<bigint> into vec_sum_longs
    val ok = Seq(Seq(1L, 2L), Seq(3L, 4L)).toDF("v")
      .agg(graft.functions.aggregates.vec_sum_longs(col("v")))
      .collect()(0).getSeq[Long](0)
    assert(ok == Seq(4L, 6L))
  }

  test("CMS guards reject mismatched partials and truncated blobs") {
    import graft.functions.CmsCounters
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = CmsCounters(Literal(null), depth = 2, width = 4)
    val e1 = intercept[IllegalArgumentException] {
      agg.merge(new Array[Long](8), new Array[Long](6))
    }
    assert(e1.getMessage.contains("CMS partial size"))
    val e2 = intercept[IllegalArgumentException] {
      agg.deserialize(new Array[Byte](8 * 6)) // wrong depth*width blob
    }
    assert(e2.getMessage.contains("8*depth*width"))
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

  test("KMinSetLong equals the k smallest distinct hashes, merged or not") {
    import graft.functions.aggregates.kmin_set_long
    val k = 37
    val hashed = Tables(spark, sfDir).lineitem
      .select(xxhash64(col("l_partkey").cast("string")).as("h"))
      .repartition(9) // force the merge path across many partials
    val got = hashed.agg(kmin_set_long(col("h"), k))
      .collect()(0).getSeq[Long](0)
    val want = hashed.select("h").distinct()
      .orderBy("h").limit(k).collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("KMV sketch set-op estimates are near the exact cardinalities") {
    val row = AnalyticsExt.queries("agg_kmv_intersect")(
      spark, "/root/testdata/sf0.01").collect()(0)
    val (unionEst, interEst) = (row.getDouble(3), row.getDouble(4))
    import org.apache.spark.sql.DataFrame
    def uds(t: String): DataFrame = Tables(spark, "/root/testdata/sf0.01")
      .events.filter(col("event_type") === t)
      .selectExpr("user_id * 100000 + unix_millis(ts) div 86400000 AS ud")
      .distinct()
    val a = uds("click"); val b = uds("purchase")
    val exactUnion = a.union(b).distinct().count().toDouble
    val exactInter = a.intersect(b).count().toDouble
    // k=256 ⇒ union rsd ≈ 1/√255 ≈ 6.3%; the intersection inherits the
    // binomial error of c ≈ k·J ≈ 58 ⇒ ≈ 13%. 3-sigma-ish loud bounds:
    assert(math.abs(unionEst - exactUnion) / exactUnion < 0.20,
      s"union est $unionEst vs exact $exactUnion")
    assert(math.abs(interEst - exactInter) / exactInter < 0.40,
      s"intersection est $interEst vs exact $exactInter")
  }

  test("weighted sample equals the Efraimidis–Spirakis replay, skews long") {
    val docs = Tables(spark, sfDir).documents
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hashes = Tables(spark, sfDir).documents
      .select(col("doc_id"),
        xxhash64(concat(lit("W"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.map { case (id, w) =>
      val u = hashes(id).toDouble / 1.8446744073709552e19 + 0.5
      (math.log(u) / w.toDouble, id, w)
    }.sortBy { case (key, id, _) => (-key, id) }.take(100)
    val got = graft.ops.DataOps.queries("data_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._1).toSeq == want.map(_._2).sorted.toSeq)
    // weight-proportional sampling must overrepresent long documents
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean !> corpus mean $corpusMean")
  }

  test("gini matches a driver-side replay and sits in (0, 1)") {
    val row = AnalyticsExt.queries("agg_gini_revenue")(spark, sfDir)
      .collect()(0)
    val (n, gini) = (row.getLong(0), row.getDouble(2))
    val rev = Tables(spark, sfDir).orders
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1))))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }.toSeq
    assert(n == rev.size)
    val sorted = rev.sortBy { case (k, r) => (r, k) }
    val tot = sorted.map(_._2).sum
    val num = sorted.zipWithIndex
      .map { case ((_, r), i) => r * (i + 1) }.sum
    val want = (2 * num.toDouble - (n + 1.0) * tot.toDouble) /
      (n.toDouble * tot.toDouble)
    assert(math.abs(gini - want) < 1e-12, s"got $gini want $want")
    assert(gini > 0.0 && gini < 1.0)
  }

  test("MisraGriesTokens candidates ⊇ true heavy hitters, ≤ k of them") {
    import graft.functions.aggregates.misra_gries_tokens
    val k = 50
    val docs = Tables(spark, sfDir).documents
      .select(split(col("text"), " ").as("tk"))
      // many partials: the merge path (sum then subtract the (k+1)-th
      // largest) must preserve the undercount bound across partials
      .repartition(7)
    val cand = docs.agg(misra_gries_tokens(col("tk"), k))
      .collect()(0).getSeq[String](0).toSet
    assert(cand.size <= k)
    val exact = docs.select(explode(col("tk")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    // every token with freq > n/(k+1) must be a candidate
    val mustHave = exact.filter(_._2 * (k + 1) > n).map(_._1)
    assert(mustHave.nonEmpty, "fixture should have heavy tokens at k=50")
    val missed = mustHave.filterNot(cand)
    assert(missed.isEmpty, s"guaranteed heavy hitters missed: $missed")
  }

  test("text_heavy_hitters equals the exact single-pass answer") {
    val got = graft.ops.TextOps.queries("text_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tok = Tables(spark, sfDir).documents
      .select(explode(split(col("text"), " ")).as("t"))
    val n = tok.count()
    val want = tok.groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 * 200 > n).sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skyline_pareto equals the O(n²) domination replay") {
    val parts = Tables(spark, sfDir).part
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).sorted.toSeq
    val got = AnalyticsExt.queries("skyline_pareto")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    assert(got.size > 1, "fixture should have a non-trivial frontier")
  }

  test("multi-quantile profile is monotone and agrees with agg_median") {
    val qs = AnalyticsExt.queries("agg_quantiles_multi")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val med = AnalyticsExt.queries("agg_median")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    qs.foreach { case (flag, (p25, p50, p75, p95)) =>
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"$flag not monotone")
      assert(p50 == med(flag), s"$flag p50 != median")
    }
    assert(qs.nonEmpty)
  }

  test("bitmap_distinct: exact across partitions, nulls skipped, " +
      "out-of-domain id fails loudly") {
    import spark.implicits._
    import graft.functions.aggregates.bitmap_distinct
    val rnd = new scala.util.Random(31L)
    val ids = Seq.fill(5000)(rnd.nextInt(700).toLong)
    val df = ids.toDF("id").repartition(7)
    val got = df.agg(bitmap_distinct(org.apache.spark.sql.functions.col("id"),
      1024)).collect()(0).getLong(0)
    assert(got == ids.distinct.size.toLong, s"$got vs ${ids.distinct.size}")
    // nulls skipped like count(distinct)
    val withNull = (ids.map(Option(_)) ++ Seq.fill(50)(Option.empty[Long]))
      .toDF("id").repartition(5)
    val got2 = withNull.agg(bitmap_distinct(
      org.apache.spark.sql.functions.col("id"), 1024)).collect()(0).getLong(0)
    assert(got2 == ids.distinct.size.toLong)
    // domain violation throws (never estimates)
    val bad = Seq(5L, 2048L).toDF("id")
    val e = intercept[Exception] {
      bad.agg(bitmap_distinct(org.apache.spark.sql.functions.col("id"), 1024))
        .collect()
    }
    assert(e.getMessage != null)
    // grouped: matches countDistinct per group on skewed keys
    val grouped = ids.zipWithIndex
      .map { case (id, i) => (s"g${i % 3}", id) }.toDF("g", "id")
      .repartition(6)
    val gotG = grouped.groupBy("g")
      .agg(bitmap_distinct(org.apache.spark.sql.functions.col("id"), 1024)
        .as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantG = ids.zipWithIndex.groupBy { case (_, i) => s"g${i % 3}" }
      .map { case (g, xs) => g -> xs.map(_._1).distinct.size.toLong }
    assert(gotG == wantG)
  }

  test("weighted median: planted lower-median boundaries, then a " +
      "plain-Scala replay on the fixture") {
    import spark.implicits._
    import graft.ops.AnalyticsExt
    // even total mass split across two values -> LOWER median (10);
    // a dominant-weight value pulls the median onto itself; per-value
    // weight collapsing must happen before the cumulative scan
    val planted = Seq(
      ("even", 10L, 1L), ("even", 20L, 1L),
      ("dom", 10L, 1L), ("dom", 20L, 7L), ("dom", 30L, 1L),
      ("dup", 10L, 1L), ("dup", 10L, 1L), ("dup", 30L, 1L))
      .toDF("g", "pc", "w")
    val got = AnalyticsExt.weightedMedianFrom(planted, "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("even" -> 10L, "dom" -> 20L, "dup" -> 10L))

    val q = AnalyticsExt.queries("agg_weighted_median")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val rows = graft.ops.Tables(spark, sfDir).lineitem
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2))))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      val byPc = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byPc.map(_._2).sum
      var cum = 0L
      val med = byPc.collectFirst {
        case (pc, w) if { cum += w; cum * 2 >= tot } => pc
      }.get
      (f, med, med.toDouble / 100.0)
    }
    assert(q == want)
  }

  test("moments: skewness/kurtosis match a plain-Scala replay of the " +
      "same IEEE tree over exact integer power sums") {
    val q = AnalyticsExt.queries("agg_moments")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val rows = graft.ops.Tables(spark, sfDir).events
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, vs) =>
      val n = vs.length.toLong
      val s1 = vs.map(_._2).sum
      val s2 = vs.map(x => x._2 * x._2).sum
      val s3 = vs.map(x => x._2 * x._2 * x._2).sum
      val s4 = vs.map(x => x._2 * x._2 * x._2 * x._2).sum
      val nd = n.toDouble
      val mean = s1.toDouble / nd
      val e2 = s2.toDouble / nd; val e3 = s3.toDouble / nd
      val e4 = s4.toDouble / nd
      val m2 = e2 - mean * mean
      val m3 = e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean
      val m4 = e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2 -
        3.0 * mean * mean * mean * mean
      (t, n, m3 / (m2 * math.sqrt(m2)), m4 / (m2 * m2) - 3.0)
    }
    assert(q == want)
    // the value distribution is right-tailed: leptokurtic in every group
    assert(q.forall(_._4 > 0.0), q.map(x => (x._1, x._4)).toList)
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends GraftSuite {

  /** Independent Scala replay of the declared Lloyd-step semantics:
    * quantize → seed centroids per label → cosine argmax (ties sim DESC,
    * label ASC) → per-cluster centroid recompute → integer checksums.
    */
  private def kmeansReplay(
      rows: Seq[(Long, Int, Seq[Float])]): Seq[(Long, Long, Long, Long)] = {
    def quant(x: Float): Long =
      math.floor(x.toDouble * 1000.0 + 0.5).toLong
    val qvs = rows.map { case (id, lab, e) => (id, lab.toLong, e.map(quant)) }
    def centroid(vs: Seq[Seq[Long]]): Seq[Long] = {
      val cnt = vs.size
      vs.transpose.map(c => math.floor((c.sum * 1000L).toDouble / cnt).toLong)
    }
    def nn(v: Seq[Long]): Long = v.map(x => x * x).sum
    def cos(a: Seq[Long], b: Seq[Long]): Double =
      if (nn(a) == 0L || nn(b) == 0L) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        (math.sqrt(nn(a).toDouble) * math.sqrt(nn(b).toDouble))
    val seeds = qvs.groupBy(_._2).map { case (lab, vs) =>
      lab -> centroid(vs.map(_._3))
    }
    val assigned = qvs.map { case (_, _, qv) =>
      val best = seeds.toSeq
        .map { case (lab, c) => (cos(qv, c), -lab) }.max
      (-best._2, qv)
    }
    assigned.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cluster, vs) =>
        val cv = centroid(vs.map(_._2))
        (cluster, vs.size.toLong, cv.sum, cv.map(x => x * x).sum)
      }
  }

  private def run(rows: Seq[(Long, Int, Seq[Float])])
      : Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SimilarityOps.kmeansStepFrom(
      rows.toDF("vec_id", "label", "embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("k-means step reassigns a mislabeled vector (full replay parity)") {
    // label 0 holds two x-axis vectors plus one PLANTED y-axis vector
    // (vec 3) sitting exactly on label 1's centroid direction; the Lloyd
    // step must move it — the uniform synthetic corpus almost never
    // reassigns, so only planted clusters exercise the argmax
    val rows = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(0.9f, 0.1f)),
      (3L, 0, Seq(0.0f, 1.0f)),
      (4L, 1, Seq(0.0f, 1.0f)),
      (5L, 1, Seq(0.1f, 0.9f)))
    val got = run(rows)
    val expected = kmeansReplay(rows)
    assert(got == expected, s"got=${got.toList} expected=${expected.toList}")
    // the planted mislabel actually moved: cluster 0 keeps 2 vectors,
    // cluster 1 gains vec 3 for a total of 3
    assert(got.map(t => t._1 -> t._2).toMap == Map(0L -> 2L, 1L -> 3L))
  }

  test("k-means step matches the replay on randomized vectors") {
    // random 4-d vectors over 4 labels, zero vectors included (nn=0 →
    // sim 0.0 against every centroid → the label-ascending tie-break
    // decides); spark-vs-replay parity across fixed seeds
    for (seed <- Seq(101L, 102L, 103L)) {
      val gen = Gen.listOfN(60, for {
        lab <- Gen.choose(0, 3)
        v <- Gen.frequency(
          9 -> Gen.listOfN(4, Gen.choose(-1000, 1000)),
          1 -> Gen.const(List(0, 0, 0, 0)))
      } yield (lab, v.map(_ / 1000.0f)))
      val rows = gen.apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((lab, e), i) => (i.toLong, lab, e.toSeq) }
      assert(run(rows) == kmeansReplay(rows), s"seed=$seed diverged")
    }
  }
}

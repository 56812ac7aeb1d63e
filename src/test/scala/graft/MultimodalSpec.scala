package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.MultimodalOps

/** The RLE1 codec behind `mm_decode_real` is REAL parsing arithmetic — these
  * pin the codec contract independently of the oracle gate: roundtrip
  * identity on arbitrary byte streams (including runs), strict rejection of
  * corrupt input, and the end-to-end decoded stats on a planted corpus.
  */
class MultimodalSpec extends GraftSuite {

  private val Rle1 = MultimodalOps.Rle1

  test("rle1: decode(encode(x)) == x for arbitrary byte streams") {
    val genBytes: Gen[Array[Byte]] = Gen.oneOf(
      // arbitrary bytes (short runs dominate)
      Gen.containerOf[Array, Byte](Gen.choose(-128, 127).map(_.toByte)),
      // run-heavy streams: the shape RLE exists for
      Gen.listOf(Gen.zip(Gen.choose(1, 300), Gen.choose(0, 255)))
        .map(_.flatMap { case (n, v) => Array.fill(n)(v.toByte) }.toArray))
    (1 to 200).foreach { seed =>
      val raw = genBytes.apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(Array.empty[Byte])
      val enc = Rle1.encode(raw)
      assert(java.util.Arrays.equals(Rle1.decode(enc), raw),
        s"roundtrip broke at seed $seed (${raw.length} bytes)")
      // one 5-byte record per maximal run
      assert(Rle1.runCount(enc) == rawRunCount(raw), s"run count, seed $seed")
    }
  }

  test("rle1: corrupt input throws instead of yielding plausible pixels") {
    val enc = Rle1.encode("aaabcc".getBytes("UTF-8"))
    // bad magic
    val badMagic = enc.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Rle1.decode(badMagic))
    // truncated record (drop the final value byte)
    intercept[IllegalArgumentException](Rle1.decode(enc.dropRight(1)))
    // zero run length
    val zeroRun = enc.clone()
    zeroRun(4) = 0; zeroRun(5) = 0; zeroRun(6) = 0; zeroRun(7) = 0
    intercept[IllegalArgumentException](Rle1.decode(zeroRun))
  }

  test("rle1: empty stream encodes to magic only and decodes to empty") {
    val enc = Rle1.encode(Array.empty[Byte])
    assert(enc.length == 4 && Rle1.runCount(enc) == 0)
    assert(Rle1.decode(enc).isEmpty)
  }

  test("mm_decode_real: decoded stats match direct computation on sf0.001") {
    val rows = MultimodalOps.queries("mm_decode_real")(spark, sfDir)
      .collect()
    val texts = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (id, nPix, nRuns, mean, md5) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
          r.getString(4))
      val raw = texts(id).getBytes("UTF-8")
      assert(nPix == raw.length, s"doc $id n_pixels")
      assert(nRuns == rawRunCount(raw), s"doc $id n_runs")
      val want = if (raw.isEmpty) 0.0
        else raw.map(_ & 0xFF).map(_.toLong).sum.toDouble / raw.length
      assert(mean == want, s"doc $id mean")
      val wantMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(raw).map("%02x".format(_)).mkString
      assert(md5 == wantMd5, s"doc $id md5 roundtrip")
    }
  }

  test("phash bands match a codec-free reference computation") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { i =>
      val raw = Array.fill(rnd.nextInt(400))((rnd.nextInt(256) - 128).toByte)
      val got = MultimodalOps.phashBands(i.toLong, raw)
      // reference: straight byte stats, no RLE roundtrip — equality also
      // re-proves the decode identity on this input
      val L = raw.length
      val gm = if (L == 0) 0.0 else raw.map(_ & 0xFF).map(_.toLong).sum.toDouble / L
      val bands = new Array[Long](4)
      (0 until 64).foreach { j =>
        val from = (j.toLong * L / 64).toInt
        val until = ((j + 1).toLong * L / 64).toInt
        val s = (from until until).map(k => (raw(k) & 0xFF).toLong).sum
        if (until > from && s.toDouble / (until - from) > gm)
          bands(j / 16) |= 1L << (j % 16)
      }
      assert(got == ((i.toLong, bands(0), bands(1), bands(2), bands(3))),
        s"bands diverged at i=$i L=$L")
    }
  }

  test("phash pair join: exactly-once emission, hamming arithmetic, and " +
      "the pigeonhole boundary") {
    import SparkTestBase.spark.implicits._
    // 10: base hash; 11: band 3 differs in 2 bits (hamming 2, bands
    // 0-2 shared -> 3 candidate paths, must emit ONCE); 12: one bit per
    // band (hamming 4, NO shared band -> no candidate at all); 13: bands
    // 0,1,3 differ by 1 bit each, band 2 shared (hamming 3, emitted)
    val h = Seq(
      (10L, 0x00FFL, 0x0F0FL, 0x3333L, 0x5555L),
      (11L, 0x00FFL, 0x0F0FL, 0x3333L, 0x5556L),
      (12L, 0x00FEL, 0x0F0EL, 0x3332L, 0x5554L),
      (13L, 0x00FDL, 0x0F0DL, 0x3333L, 0x5551L))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val got = MultimodalOps.phashPairs(h).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // (10,11) hamming 2 (0x5555^0x5556 = 0x3 -> 2 bits); (10,13): b0 1
    // bit, b1 1 bit, b3 ^0x5551=0x4 1 bit -> hamming 3, band 2 shared;
    // (11,13): b0 1, b1 1, b3 0x5556^0x5551=0x7 -> 3 bits -> hamming 5,
    // filtered; (12,*) shares no band with 10/11 (we assert absence)
    val byPair = got.groupBy(g => (g._1, g._2)).view.mapValues(_.length)
    assert(byPair.forall(_._2 == 1), s"duplicate emission: $got")
    assert(got.contains((10L, 11L, 2)), got.mkString(","))
    assert(got.contains((10L, 13L, 3)), got.mkString(","))
    assert(!got.exists(g => g._1 == 12L || g._2 == 12L),
      s"hamming-4 doc paired: ${got.mkString(",")}")
    assert(!got.exists(g => g._1 == 11L && g._2 == 13L),
      s"hamming-5 pair survived: ${got.mkString(",")}")
  }

  test("phash dedup surfaces a decoded-identical clone at hamming 0") {
    import SparkTestBase.spark.implicits._
    val rnd = new scala.util.Random(29)
    val base = Array.fill(512)((rnd.nextInt(95) + 32).toByte)
    val other = Array.fill(512)((rnd.nextInt(95) + 32).toByte)
    val h = Seq(MultimodalOps.phashBands(1L, base),
      MultimodalOps.phashBands(2L, base),
      MultimodalOps.phashBands(3L, other))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val got = MultimodalOps.phashPairs(h).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((1L, 2L, 0)), got.mkString(","))
  }

  /** Ground-truth maximal-run count, computed without the codec. */
  private def rawRunCount(raw: Array[Byte]): Int =
    if (raw.isEmpty) 0
    else 1 + raw.sliding(2).count(p => p.length == 2 && p(0) != p(1))

  test("pcm16: roundtrip over the FULL byte range — the ASCII corpus only " +
      "produces negative samples, so positive-sample LE parse is pinned " +
      "here") {
    val all = Array.tabulate(256)(_.toByte)
    val samples = MultimodalOps.Pcm16.decode(MultimodalOps.Pcm16.encode(all))
    val want = Array.tabulate(256)(i => ((i - 128) * 256).toShort)
    assert(samples.sameElements(want),
      samples.zip(want).filter(p => p._1 != p._2).take(5).mkString(","))
    // byte 255 -> +32512 (positive path), byte 0 -> -32768 (most negative)
    assert(samples(255) == 32512 && samples(0) == -32768)
  }

  test("pcm16: odd byte count throws instead of silently shortening") {
    intercept[IllegalArgumentException] {
      MultimodalOps.Pcm16.decode(Array[Byte](1, 2, 3))
    }
  }

  test("pyramid levels: ladder lengths, level-0 roundtrip, known example") {
    val rows = MultimodalOps.queries("mm_pyramid")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, lv) =>
      val n = Map(lv.map(t => t._2 -> t._3): _*)
      assert(lv.length == 3, s"doc $id: 3 levels expected")
      // each level is ceil(prev/4)
      assert(n(1) == (n(0) + 3) / 4 && n(2) == (n(1) + 3) / 4, s"doc $id")
      // level 0 IS the decoded stream: md5(text bytes) — roundtrip proof
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docs(id).getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(lv.find(_._2 == 0).get._4 == md, s"doc $id level-0 md5")
    }
    // floor-mean block semantics on a hand-checked example, full byte
    // range (the ASCII corpus never exercises values >= 128):
    // [200,201,202,203,10] -> [(806/4)=201, 10] -> [(211/2)=105]
    val raw = Array(200, 201, 202, 203, 10).map(_.toByte)
    val dec = MultimodalOps.Rle1.decode(MultimodalOps.Rle1.encode(raw))
      .map(_ & 0xFF)
    def down(px: Array[Int]) = px.grouped(4).map(b => b.sum / b.length).toArray
    assert(down(dec).toSeq == Seq(201, 10))
    assert(down(down(dec)).toSeq == Seq(105))
  }

  test("shot boundaries: planted cut surfaces, flat video is cut-free, " +
      "partial trailing frame dropped") {
    import spark.implicits._
    // doc 1: 64×'a' then 64×'z' then a 30-byte tail (dropped) — one cut
    // at frame 1 with sums 64·97=6208 → 64·122=7808, delta 1600 > 512.
    // doc 2: 200×'m' — three full frames, all equal sums, no cut.
    val docs = Seq(
      (1L, ("a" * 64) + ("z" * 64) + ("z" * 30)),
      (2L, "m" * 200)).toDF("doc_id", "text")
    val got = MultimodalOps.shotBoundariesFrom(spark, docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq((1L, 1, 6208L, 7808L, 1600L)), got.toList)
  }

  test("audio segments are the gaps-and-islands fold of the energy frames") {
    val frames = MultimodalOps.queries("mm_audio_energy")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    val want = frames.filter(_._3 > 25000000000L).groupBy(_._1).toSeq
      .flatMap { case (doc, fs) =>
        val sorted = fs.map(f => (f._2, f._3)).sortBy(_._1)
        // split consecutive frame indices into runs
        val runs = sorted.foldLeft(List.empty[List[(Int, Long)]]) {
          case (cur :: tl, f) if f._1 == cur.head._1 + 1 =>
            (f :: cur) :: tl
          case (acc, f) => List(f) :: acc
        }.map(_.reverse).reverse
        runs.map(run => (doc, run.head._1, run.last._1,
          run.size.toLong, run.map(_._2).sum))
      }.sortBy { case (d, s, _, _, _) => (d, s) }
    val got = MultimodalOps.queries("mm_audio_segments")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"got=${got.size} want=${want.size}")
    // non-degenerate: the threshold excludes SOME frames (segments don't
    // just mirror whole assets) — at sf0.001 each doc's active frames
    // happen to be one contiguous run, so no multi-segment assertion
    assert(got.map(_._4).sum < frames.length.toLong, "threshold never bit")
    assert(got.nonEmpty)
  }

  test("multimodal pipeline composes its stages: decode sizes, quality " +
      "gate, phash drop list, per-source rollup") {
    import org.apache.spark.sql.functions._
    val drops = MultimodalOps.queries("mm_phash_dedup")(spark, sfDir)
      .collect().map(_.getLong(1)).toSet
    val sizes = MultimodalOps.queries("mm_decode_real")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val kept = docs.filter { case (id, _) =>
      sizes(id) >= 256 && !drops(id) }
    val want = kept.groupBy(_._2).view.mapValues { xs =>
      (xs.size.toLong, xs.map(x => sizes(x._1).toLong).sum,
        xs.map(_._1).min, xs.map(_._1).max)
    }.toMap
    val got = MultimodalOps.queries("pipeline_multimodal")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"got=$got want=$want")
    // both the gate and the dedup actually removed something
    assert(kept.length < docs.length)
  }

  test("keyframes: one start anchor per framed asset plus exactly the " +
      "shot-boundary frames") {
    import org.apache.spark.sql.functions._
    val kf = MultimodalOps.queries("mm_keyframes")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val cuts = MultimodalOps.queries("mm_shot_boundaries")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // cut keyframes == the boundary rows (same frame, same current sum)
    assert(kf.filter(_._4 == "cut").map(t => (t._1, t._2, t._3)).toSet ==
      cuts.toSet)
    // every doc with >= 64 decoded pixels gets exactly one frame-0 anchor
    val framedDocs = graft.ops.Tables(spark, sfDir).documents
      .filter(length(col("text")) >= 64).count()
    val starts = kf.filter(_._4 == "start")
    assert(starts.length.toLong == framedDocs)
    assert(starts.forall(_._2 == 0))
  }

  test("sharpness: decoded-pixel Laplacian variance matches a byte replay; " +
      "repetitive runs score flatter than varied text") {
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.map { case (id, text) =>
      val bs = text.getBytes("UTF-8").map(_ & 0xFF)
      val ds = (1 until math.max(bs.length - 1, 1)).map(i =>
        bs(i - 1) - 2 * bs(i) + bs(i + 1))
      val n = math.max(bs.length - 2, 0).toLong
      val sd = ds.map(_.toLong).sum
      val sd2 = ds.map(x => x.toLong * x).sum
      val v = if (n > 0) (n * sd2 - sd * sd).toDouble / (n * n).toDouble
        else 0.0
      (id, bs.length, n, sd, sd2, v)
    }.sortBy(_._1)
    val got = MultimodalOps.queries("mm_sharpness")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want.toSeq, s"got=${got.take(2)} want=${want.take(2)}")
    // non-degenerate: the corpus has real texture (variance spread)
    val vars = got.map(_._6)
    assert(vars.max > vars.min && vars.max > 0.0)
  }

  test("border crop: lead/trail constant runs match a byte replay and " +
      "tile each asset") {
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.map { case (id, text) =>
      val bs = text.getBytes("UTF-8")
      val L = bs.length
      var lead = 0
      while (lead < L && bs(lead) == bs(0)) lead += 1
      var trail = 0
      if (lead < L) {
        while (trail < L && bs(L - 1 - trail) == bs(L - 1)) trail += 1
      }
      (id, L, lead.toLong, trail.toLong, (L - lead - trail).toLong)
    }.sortBy(_._1)
    val got = MultimodalOps.queries("mm_border_crop")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want.toSeq, s"got=${got.take(2)} want=${want.take(2)}")
    // runs tile: lead + core + trail = n_pixels, lead >= 1 on any
    // non-empty asset (a pixel always matches itself)
    got.foreach { case (id, l, lead, trail, core) =>
      assert(lead + trail + core == l.toLong, s"doc $id")
      if (l > 0) assert(lead >= 1L, s"doc $id")
    }
  }

  test("hist equalize: the OpenCV remap formula matches a byte replay; " +
      "equalization stretches every multi-valued asset to full range") {
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.map { case (id, text) =>
      val bs = text.getBytes("UTF-8").map(_ & 0xFF)
      val L = bs.length.toLong
      val hist = new Array[Long](256)
      bs.foreach(hist(_) += 1)
      var cum = 0L
      var cdfmin = 0L
      var seen = false
      val remap = new Array[Long](256)
      for (v <- 0 until 256) {
        if (hist(v) > 0 && !seen) { cdfmin = hist(v); seen = true }
        cum += hist(v)
        remap(v) =
          if (L > cdfmin) ((cum - cdfmin) * 255L) / (L - cdfmin) else 0L
      }
      val occ = (0 until 256).filter(hist(_) > 0)
      val sumEq = occ.map(v => hist(v) * remap(v)).sum
      (id, bs.length,
        if (L > 0) bs.map(_.toLong).sum.toDouble / L.toDouble else 0.0,
        if (L > 0) sumEq.toDouble / L.toDouble else 0.0,
        if (occ.isEmpty) 0 else occ.max - occ.min,
        if (occ.isEmpty) 0 else (remap(occ.max) - remap(occ.min)).toInt)
    }.sortBy(_._1)
    val got = MultimodalOps.queries("mm_hist_equalize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4), r.getInt(5))).toSeq
    assert(got == want.toSeq, s"got=${got.take(2)} want=${want.take(2)}")
    // the stretch IS the point: >= 2 distinct values -> full 0..255 range
    got.foreach { case (id, _, _, _, spread, spreadEq) =>
      if (spread > 0) assert(spreadEq == 255, s"doc $id")
    }
    assert(got.exists(_._5 > 0))
  }

  test("palette: top-3 dominant values match a byte replay with the " +
      "(count desc, value asc) tie rule; shares are rank-ordered") {
    val docs = graft.ops.Tables(spark, sfDir).documents
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.flatMap { case (id, text) =>
      val bs = text.getBytes("UTF-8").map(_ & 0xFF)
      val hist = bs.groupBy(identity).view.mapValues(_.length.toLong)
      hist.keys.toSeq.sortBy(v => (-hist(v), v)).take(3).zipWithIndex
        .map { case (v, i) =>
          (id, i + 1, v, hist(v), hist(v).toDouble / bs.length.toDouble)
        }
    }.sortBy(t => (t._1, t._2))
    val got = MultimodalOps.queries("mm_palette")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want.toSeq, s"got=${got.take(4)} want=${want.take(4)}")
    got.groupBy(_._1).values.foreach { rows =>
      val byRk = rows.sortBy(_._2).map(_._4)
      assert(byRk == byRk.sorted.reverse)
    }
  }
}

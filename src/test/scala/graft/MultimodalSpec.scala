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

  /** Ground-truth maximal-run count, computed without the codec. */
  private def rawRunCount(raw: Array[Byte]): Int =
    if (raw.isEmpty) 0
    else 1 + raw.sliding(2).count(p => p.length == 2 && p(0) != p(1))
}

package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash properties the m06 catalog fixture cannot show (its
  * duplicates are pixel-identical): aHash must be STABLE under mild
  * noise and re-encoding, and FAR between unrelated images.
  */
class MultimodalPhashSpec extends AnyFunSuite {

  lazy val spark = Session.builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private def img(seed: Long, w: Int = 24, h: Int = 24,
      noise: Int = 0): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, rnd.nextInt(256))
    if (noise > 0) {
      val nr = new scala.util.Random(seed + 1)
      (1 to noise).foreach { _ =>
        val (x, y) = (nr.nextInt(w), nr.nextInt(h))
        val v = raster.getSample(x, y, 0)
        raster.setSample(x, y, 0, math.min(255, math.max(0, v + nr.nextInt(5) - 2)))
      }
    }
    im
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash survives a PNG encode/decode round trip bit-exactly") {
    val im = img(7)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(MultimodalOps.aHash(im) == MultimodalOps.aHash(back))
  }

  test("aHash is near for mildly noised images, far for unrelated ones") {
    val base = MultimodalOps.aHash(img(7))
    val noised = MultimodalOps.aHash(img(7, noise = 5))
    assert(hamming(base, noised) <= 4,
      s"5px ±2 noise moved aHash by ${hamming(base, noised)} bits")
    val others = (10L to 29L).map(s => MultimodalOps.aHash(img(s)))
    others.foreach(o => assert(hamming(base, o) >= 10,
      s"unrelated image landed ${hamming(base, o)} bits away"))
  }

  test("m06 pair set equals the asset-key groups on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = Queries.byName("m06_phash_dedup").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val keys = Tables.df(spark, dir, "documents")
      .selectExpr("doc_id", "concat(source, ':', cast(floor(n_chars / 100) as long)) as k")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val want = (for {
      (a, ka) <- keys; (b, kb) <- keys
      if a < b && ka == kb
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must contain duplicate assets")
    // every reported pair is hamming 0 here (pixel-identical assets)
    val hs = Queries.byName("m06_phash_dedup").build(spark, dir)
      .collect().map(_.getInt(2)).toSet
    assert(hs == Set(0))
  }
}

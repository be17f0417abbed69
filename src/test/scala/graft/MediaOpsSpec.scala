package graft

import graft.operators.MediaOps
import graft.operators.MediaOps.MediaRow

/** Multimodal plumbing: schema, batch shape, deterministic stub codecs. */
class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(0L, "image", Array.fill[Byte](800)(65)),
    MediaRow(1L, "audio", Array.tabulate[Byte](100)(i => (i % 127).toByte)),
    MediaRow(2L, "video", Array.fill[Byte](40)(7))
  ).toDS()

  test("decode extracts typed metadata from binary payloads") {
    val d = MediaOps.decode(media).collect().sortBy(_.doc_id)
    assert(d.map(_.n_bytes).toSeq == Seq(800L, 100L, 40L))
    assert(d(0).meta.width == 16 * (1 + 65 % 64))
    assert(d(0).meta.durationMs == 3200L)
    assert(d.forall(r => r.meta.nChannels >= 1 && r.meta.sampleRate >= 8000))
  }

  test("resize shrinks dimensions and payload deterministically") {
    val r = MediaOps.resize(MediaOps.decode(media), maxSide = 16).collect().sortBy(_.doc_id)
    r.foreach { x =>
      assert(math.max(x.meta.width, x.meta.height) <= 16 * math.max(1, 48))
      assert(x.payload.length >= 1)
    }
  }

  test("frame sampling emits bounded frames with correct indices") {
    val f = MediaOps.sampleFrames(MediaOps.decode(media), nFrames = 4).collect()
    val byDoc = f.groupBy(_.doc_id)
    assert(byDoc(0L).length == 4)
    assert(byDoc(2L).length == math.min(4, 40 / 16))
    byDoc.values.foreach(fr =>
      assert(fr.map(_.frame_idx).sorted.toSeq == (0 until fr.length).toSeq))
    assert(f.forall(_.frame.length <= 16))
  }

  test("phash60 sets block bits above the mean, exactly and reproducibly") {
    val rows = Seq(
      MediaRow(0L, "image", Array[Byte](0, 100)), // only block 30 above mean
      MediaRow(1L, "image", Array.fill[Byte](64)(9)), // constant: no bit set
      MediaRow(2L, "image", Array[Byte](0, 100)), // exact dup of 0
      MediaRow(3L, "image", Array.emptyByteArray)
    ).toDS()
    val h = MediaOps.phash60(MediaOps.decode(rows))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == (1L << 30), s"got ${h(0L)}")
    assert(h(1L) == 0L && h(3L) == 0L)
    assert(h(2L) == h(0L)) // identical payloads collide — the dedup key
  }

  test("payload transforms are narrow (no shuffle in the plan)") {
    val plan = MediaOps.decode(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("feature-extract embeds payloads and feeds the similarity surface") {
    // two identical payloads + one different: the 64-dim embeddings are
    // unit-norm, deterministic, and flow straight into cosinePairs
    val dup = Seq(
      MediaRow(0L, "image", Array.tabulate[Byte](300)(i => (i % 90).toByte)),
      MediaRow(1L, "image", Array.tabulate[Byte](300)(i => (i % 90).toByte)),
      MediaRow(2L, "image", Array.tabulate[Byte](200)(i => ((i * 7) % 113).toByte))
    ).toDS()
    val emb = MediaOps.embed(MediaOps.decode(dup)).collect().sortBy(_.doc_id)
    assert(emb.forall(_.embedding.length == 64))
    emb.foreach { e =>
      val norm = math.sqrt(e.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"not unit-norm: $norm")
    }
    assert(emb(0).embedding.toSeq == emb(1).embedding.toSeq)
    val pairs = graft.operators.Dedup.cosinePairs(
        MediaOps.embed(MediaOps.decode(dup)).toDF(), "doc_id", "embedding",
        threshold = 0.999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  /** An actual PNG, in memory: top half black, bottom half white. */
  private def pngBytes(w: Int, h: Int, fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (y < h / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("decode reads a REAL PNG: true dimensions via javax.imageio, not the stub") {
    val png = pngBytes(120, 120)
    val d = MediaOps.decode(Seq(MediaRow(9L, "image", png)).toDS()).collect().head
    assert(d.meta.width == 120 && d.meta.height == 120, d.meta)
    assert(d.meta.nChannels == 3)
    assert(d.meta.sampleRate == 0 && d.meta.durationMs == 0L) // a still image
    assert(d.n_bytes == png.length.toLong)
  }

  test("phash60 hashes DECODED luma: exact bits, and invariance across scale + format") {
    // top half black, bottom half white, 120x120: the flattened luma
    // plane is 30 dark blocks then 30 bright blocks — bits 30..59 set
    val expected = ((1L << 60) - 1L) & ~((1L << 30) - 1L)
    def hashOf(p: Array[Byte]): Long =
      MediaOps.phash60(MediaOps.decode(Seq(MediaRow(1L, "image", p)).toDS()))
        .select("phash").as[Long].head()
    assert(hashOf(pngBytes(120, 120)) == expected,
      f"got ${hashOf(pngBytes(120, 120))}%x, want $expected%x")
    // SAME pixels at 2x resolution and as JPEG: the perceptual hash
    // holds where an exact digest breaks — the near-dup media contract
    assert(hashOf(pngBytes(240, 240)) == expected)
    assert(hashOf(pngBytes(120, 120, "jpg")) == expected)
    // and the raw-bytes stub path is untouched for non-image payloads
    val stub = MediaOps.phash60(MediaOps.decode(media)).select("phash").as[Long].collect()
    assert(stub.length == 3)
  }

  /** A PNG whose pixel (x, y) is the formulaic gray `(x*7 + y*13) % 256`
    * — every resampled pixel is predictable by pure arithmetic.
    */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("resizeImages: REAL decode -> exact integer NN resample -> lossless PNG round-trip") {
    val src = gradientPng(64, 32)
    val out = MediaOps.resizeImages(
      Seq(MediaRow(1L, "image", src)).toDS(), maxSide = 16).collect().head
    // still a real image with integer-scaled aspect: 64x32 -> 16x8
    assert((out.payload(0) & 0xff) == 0x89 && out.payload(1) == 'P') // PNG magic
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img.getWidth == 16 && img.getHeight == 8)
    // every destination pixel == the NN-predicted source pixel:
    // (x, y) reads source (x*64/16, y*32/8) = (4x, 4y)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = ((4 * x) * 7 + (4 * y) * 13) % 256
      assert((img.getRGB(x, y) & 0xff) == v, s"($x,$y)")
    }
    // within-bounds images and non-image payloads pass through untouched
    val small = MediaOps.resizeImages(
      Seq(MediaRow(2L, "image", gradientPng(8, 8))).toDS(), maxSide = 16)
      .collect().head
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small.payload)).getWidth == 8)
    val passthrough = MediaOps.resizeImages(media, maxSide = 16).collect()
    assert(passthrough.sortBy(_.doc_id).map(_.payload.length).toSeq ==
      media.collect().sortBy(_.doc_id).map(_.payload.length).toSeq)
  }

  test("phash60 is invariant under resizeImages normalization") {
    def hashOf(p: Array[Byte]): Long =
      MediaOps.phash60(MediaOps.decode(Seq(MediaRow(1L, "image", p)).toDS()))
        .select("phash").as[Long].head()
    val big = pngBytes(240, 240)
    val normalized = MediaOps.resizeImages(
      Seq(MediaRow(1L, "image", big)).toDS(), maxSide = 60).collect().head.payload
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(normalized)).getWidth == 60)
    assert(hashOf(normalized) == hashOf(big))
  }
}

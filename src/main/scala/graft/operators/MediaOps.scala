package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct, and per-batch
  * decode / feature-extract / resize / frame-sample run as `mapPartitions`
  * over a typed Dataset.
  *
  * IMAGE payloads decode FOR REAL: PNG/JPEG blobs (magic-byte sniffed)
  * go through `javax.imageio` — in the JDK, no external binding — and
  * yield true width/height plus an integer-luma plane that [[phash60]]
  * hashes. Payloads that are not a real image (including the synthetic
  * utf-8 corpus from [[fromDocuments]]) fall back to the deterministic
  * 16-byte fake-header parse, standing in for the audio/video codecs
  * this environment lacks — so the oracle-checked arithmetic is
  * unchanged while real images take the real path.
  *
  * Scale notes (100 TB): payloads never pass through a shuffle — all media
  * transforms are narrow (mapPartitions); only extracted metadata (small
  * structs) flows into joins/aggregations downstream. Batch size per task
  * is bounded by `spark.sql.files.maxPartitionBytes`, so executor memory
  * holds one partition's worth of payload at a time, streamed by the
  * iterator (never materialized as a list).
  */
object MediaOps {

  /** A multimodal record: `payload` is the opaque blob. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(
      width: Int, height: Int, sampleRate: Int, nChannels: Int, durationMs: Long)

  final case class DecodedRow(
      doc_id: Long, media_type: String, n_bytes: Long, meta: MediaMeta,
      payload: Array[Byte])

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** PNG / JPEG magic-byte sniff — decides real decode vs stub header. */
  private[operators] def isRealImage(p: Array[Byte]): Boolean =
    (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)

  /** Pixel ceiling for [[decodeImage]]/[[resizeImages]]: a corrupt or
    * adversarial header can DECLARE enormous dimensions (a
    * decompression bomb — a few KB of payload expanding to a multi-GB
    * BufferedImage), and the resulting OutOfMemoryError is an Error
    * that no `catch Exception` degrades. Checked from the HEADER
    * (ImageReader.getWidth/getHeight read metadata only) before any
    * pixel allocation. 64 MP ≈ 256 MB ARGB — generous for corpus
    * media, far below task memory.
    */
  private val MaxPixels = 64000000L

  /** Header-checked full decode: None when undecodable OR the declared
    * dimensions exceed [[MaxPixels]].
    */
  private[operators] def readImageGuarded(p: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    // default ImageIO caching wraps even in-memory streams in a
    // FileCacheImageInputStream — a temp-file create/delete PER IMAGE
    // on executor disk. The payload is already a byte array: decode
    // fully in memory. (JVM-global static; idempotent.)
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(p))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val (w, h) = (r.getWidth(0).toLong, r.getHeight(0).toLong)
          if (w <= 0 || h <= 0 || w * h > MaxPixels) None
          else Option(r.read(0))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Real image decode via `javax.imageio`: (width, height, nComponents,
    * row-major luma plane). Luma is EXACT integer Rec.601
    * (`(299r + 587g + 114b) div 1000`), so every downstream hash stays
    * bit-identical across engines/platforms — the same integer-exact
    * contract the stub path has. Returns None for undecodable bytes
    * INCLUDING declared-dimension bombs (caller falls back to the stub
    * rather than failing the row: a corrupt image in a 100 TB corpus
    * must degrade, not kill the job).
    */
  private[operators] def decodeImage(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      val img = readImageGuarded(p).orNull
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // bulk getRGB: ONE ColorModel conversion pass into an int[]
        // instead of a per-pixel call (each pays bounds checks + color
        // conversion — the hot-path cost on non-INT_RGB PNG rasters)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val luma = new Array[Byte](w * h)
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          luma(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          i += 1
        }
        Some((w, h, img.getColorModel.getNumComponents, luma))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic fake header: the first 16 payload bytes define the
    * metadata via arithmetic, standing in for a real codec header parse.
    */
  private[operators] def parseHeader(payload: Array[Byte]): MediaMeta = {
    def b(i: Int): Int = if (i < payload.length) payload(i) & 0xff else 0
    MediaMeta(
      width = 16 * (1 + b(0) % 64),
      height = 16 * (1 + b(1) % 48),
      sampleRate = 8000 * (1 + b(2) % 6),
      nChannels = 1 + b(3) % 2,
      durationMs = payload.length.toLong * 4L)
  }

  /** Decode pass: iterator-in/iterator-out per partition — the real
    * batch shape a native decoder binding would use (one codec context
    * per partition, amortized over rows).
    */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init would go here (ImageIO reader instances
      // are cheap; a native decoder handle would be reused across rows)
      it.map { r =>
        val meta =
          if (isRealImage(r.payload))
            decodeImage(r.payload) match {
              case Some((w, h, comps, _)) =>
                // a still image has no sample rate / duration; channels
                // are the color components the decoder actually produced
                MediaMeta(width = w, height = h, sampleRate = 0,
                  nChannels = comps, durationMs = 0L)
              case None => parseHeader(r.payload) // corrupt image: degrade
            }
          else parseHeader(r.payload)
        DecodedRow(r.doc_id, r.media_type, r.payload.length.toLong,
          meta, r.payload)
      }
    }
  }

  /** Resize stub: halves dimensions, truncates payload proportionally. */
  def resize(ds: Dataset[DecodedRow], maxSide: Int): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val scale = math.max(1, math.max(r.meta.width, r.meta.height) / maxSide)
        val m = r.meta.copy(width = r.meta.width / scale, height = r.meta.height / scale)
        val keep = math.max(1, r.payload.length / (scale * scale))
        DecodedRow(r.doc_id, r.media_type, r.n_bytes, m, r.payload.take(keep))
      }
    }
  }

  /** REAL image resize: PNG/JPEG payloads are decoded (javax.imageio),
    * resampled by EXACT integer nearest-neighbor — destination pixel
    * (x, y) reads source pixel `(x·srcW div dstW, y·srcH div dstH)`,
    * the deterministic kernel whose output a spec can predict pixel for
    * pixel — and re-encoded as PNG (lossless, so the resampled pixels
    * survive the round-trip exactly). The long side lands on `maxSide`
    * with integer-scaled aspect (never below 1 px); images already
    * within bounds and non-image payloads pass through UNTOUCHED — a
    * corrupt image degrades to identity rather than killing the job.
    * The [[resize]] stub remains the metadata-only path for payloads
    * without a real codec.
    *
    * Scale shape: narrow mapPartitions, payloads never shuffle; this is
    * the normalization pass that runs before [[phash60]]/[[embed]] in a
    * real multimodal pipeline (and [[phash60]]'s block-mean hash is
    * invariant under it — spec-pinned).
    */
  def resizeImages(ds: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    require(maxSide >= 1, "maxSide must be positive")
    ds.mapPartitions { it =>
      it.map { r =>
        val resized =
          if (!isRealImage(r.payload)) None
          else
            try {
              // header-guarded read: a declared-dimension bomb returns
              // None (degrade to identity) instead of an OOM Error that
              // no Exception handler would catch
              val img = readImageGuarded(r.payload).orNull
              if (img == null || math.max(img.getWidth, img.getHeight) <= maxSide)
                None
              else {
                val (sw, sh) = (img.getWidth, img.getHeight)
                val long = math.max(sw, sh)
                // Long intermediates: an extreme-aspect image inside the
                // 64MP guard (e.g. 10Mx1) times a large maxSide overflows
                // Int and would silently compute wrong target dims/indexes
                val dw = math.max(1, (sw.toLong * maxSide / long).toInt)
                val dh = math.max(1, (sh.toLong * maxSide / long).toInt)
                // bulk getRGB/setRGB: one ColorModel conversion each way
                // instead of a per-pixel call on the hot path
                val src = img.getRGB(0, 0, sw, sh, null, 0, sw)
                val dst = new Array[Int](dw * dh)
                var y = 0
                while (y < dh) {
                  val srow = (y.toLong * sh / dh).toInt * sw
                  var x = 0
                  while (x < dw) {
                    dst(y * dw + x) = src(srow + (x.toLong * sw / dw).toInt)
                    x += 1
                  }
                  y += 1
                }
                val out = new java.awt.image.BufferedImage(
                  dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                out.setRGB(0, 0, dw, dh, dst, 0, dw)
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                Some(bos.toByteArray)
              }
            } catch { case scala.util.control.NonFatal(_) => None }
        resized.fold(r)(p => r.copy(payload = p))
      }
    }
  }

  /** Frame sampling stub: every `stride` bytes becomes one "frame". */
  def sampleFrames(ds: Dataset[DecodedRow], nFrames: Int): Dataset[FrameRow] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = math.min(nFrames, math.max(1, r.payload.length / 16))
      (0 until n).iterator.map { i =>
        val off = (r.payload.length.toLong * i / n).toInt
        FrameRow(r.doc_id, i, r.payload.slice(off, math.min(off + 16, r.payload.length)))
      }
    }
  }

  final case class EmbeddedRow(doc_id: Long, media_type: String, embedding: Array[Float])

  /** Feature-extract stub: a `dims`-dim L2-normalized byte histogram
    * stands in for a real vision/audio encoder. The output schema matches
    * the `embeddings` table (Array[Float]), so it feeds straight into the
    * similarity surface (`Dedup.cosinePairs`, the ANN queries). Narrow
    * pass; at scale the per-partition init is where the model/session
    * handle lives.
    */
  def embed(ds: Dataset[DecodedRow], dims: Int = 64): Dataset[EmbeddedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition "encoder init" would go here
      it.map { r =>
        val h = new Array[Float](dims)
        r.payload.foreach(b => h((b & 0xff) % dims) += 1f)
        var ss = 0.0
        h.foreach(x => ss += x.toDouble * x)
        val n = math.sqrt(ss).toFloat
        EmbeddedRow(r.doc_id, r.media_type, if (n == 0f) h else h.map(_ / n))
      }
    }
  }

  /** Perceptual blockhash: 60 bits, bit `j` set iff block `j`'s mean
    * value exceeds the global mean — the classic blockhash/aHash shape.
    * REAL images (PNG/JPEG) hash their DECODED integer-luma plane, so
    * recompression variants of the same pixels collide as they should;
    * other payloads hash raw bytes (same plumbing). Value at offset `p`
    * belongs to block `p·60 div len`, and the mean compare is
    * cross-multiplied (`blockSum·len > totalSum·blockLen`) so the whole
    * hash is EXACT integer arithmetic — bit-identical on any engine.
    * 60 bits keeps the value positive in an int64 (and matches the
    * engine's 60-bit hash identity). Empty payloads hash to 0.
    *
    * Note: real images are decoded HERE, independently of [[decode]]
    * (whose rows carry metadata only — threading a luma plane through
    * every DecodedRow would fatten the hot schema for one consumer).
    * A decode→phash60 chain therefore decodes images twice; hash
    * straight from the MediaRow payload when that matters.
    *
    * Near-dup usage: hamming distance over these (the
    * [[Dedup.simhash64]] pattern) buckets visually-similar media —
    * resize/recompress variants survive where exact digests break.
    * Narrow per-row pass, no shuffle.
    */
  def phash60(ds: Dataset[DecodedRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val p =
        if (isRealImage(r.payload))
          decodeImage(r.payload).map(_._4).getOrElse(r.payload)
        else r.payload
      // the cross-multiplied compare below is bounded by 255·len², which
      // must stay inside int64 — beyond ~150 MB the products would wrap
      // and silently corrupt hash bits, so fail loudly instead (payloads
      // that size should be frame-sampled/resized first anyway)
      require(p.length <= 150000000,
        s"phash60 payload too large (${p.length} bytes > 150 MB): " +
          "downsample first (resize/sampleFrames)")
      val len = p.length.toLong
      val bs = new Array[Long](60)
      val bl = new Array[Long](60)
      var total = 0L
      var i = 0
      while (i < p.length) {
        val j = ((i.toLong * 60L) / len).toInt
        val v = (p(i) & 0xff).toLong
        bs(j) += v; bl(j) += 1L; total += v
        i += 1
      }
      var h = 0L
      var j = 0
      while (j < 60) {
        if (len > 0 && bs(j) * len > total * bl(j)) h |= (1L << j)
        j += 1
      }
      (r.doc_id, h)
    }.toDF("doc_id", "phash")
  }

  /** Deterministic formulaic gray PNG: pixel (x, y) is
    * `(x·7 + y·13 + docId) % 256` in all three channels — a REAL image
    * (ImageIO-encoded, losslessly round-trippable) whose every pixel a
    * SQL oracle can recompute, the image analog of [[synthWavPcm16]].
    * Gray means Rec.601 luma == the pixel value exactly
    * ((299v+587v+114v) div 1000 = v), so luma sums are pure arithmetic.
    */
  def synthPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + docId) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** True decoded dimensions + integer luma-plane sum per image — the
    * small verification face of the decode path: (doc_id, w, h,
    * luma_sum), with (-1, -1, -1) for undecodable payloads. Narrow map;
    * payloads never shuffle.
    */
  def lumaSummary(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      decodeImage(r.payload) match {
        case Some((w, h, _, luma)) =>
          var s = 0L
          var i = 0
          while (i < luma.length) { s += (luma(i) & 0xff); i += 1 }
          (r.doc_id, w, h, s)
        case None => (r.doc_id, -1, -1, -1L)
      }
    }.toDF("doc_id", "w", "h", "luma_sum")
  }

  // ---- Audio: REAL WAV decode via javax.sound ---------------------------

  final case class AudioRow(doc_id: Long, wav: Array[Byte])

  final case class AudioFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Long, n_frames: Long,
      sum_sq: Long, peak_abs: Long, silent_frames: Long)

  /** Deterministic synthetic PCM16 waveform, pure integer — the audio
    * twin of [[fromDocuments]]'s formulaic payloads, so a SQL oracle can
    * recompute every sample: length `400 + (id % 5)·80`, every third
    * 80-sample frame silent, the rest a portable integer pseudo-noise
    * `((id·31 + i·17) % 4001) - 2000`.
    */
  def synthSampleCount(docId: Long): Int = (400 + (docId % 5) * 80).toInt

  def synthSample(docId: Long, i: Int): Int =
    if ((i / 80) % 3 == 2) 0
    else ((docId * 31 + i.toLong * 17) % 4001 - 2000).toInt

  /** The waveform as a complete RIFF/WAVE file: PCM_SIGNED, 16-bit,
    * mono, little-endian — a REAL wav any decoder reads. This is the
    * encode half of the lossless round-trip [[audioFeatures]] verifies.
    */
  def synthWavPcm16(docId: Long, sampleRate: Int = 8000): Array[Byte] = {
    val n = synthSampleCount(docId)
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate = sr·block
    bb.putShort(2).putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(synthSample(docId, i).toShort); i += 1 }
    bb.array()
  }

  /** REAL audio decode + integer frame features: each wav goes through
    * `javax.sound.sampled.AudioSystem` (in the JDK, no external binding
    * — the audio analog of the `javax.imageio` image path), the format
    * is verified to be what the pipeline expects (PCM16 mono LE); a
    * payload that doesn't decode or has another format degrades to a
    * sentinel row (sample_rate = -1) rather than killing the job — the
    * same degrade-not-kill contract as the image path. Decodable PCM
    * samples yield exact-integer features: total sum of squares
    * (energy), peak amplitude, and the count of all-zero `frame`-sample
    * frames (silence detection, the trim/VAD primitive). Because PCM16
    * round-trips losslessly, a SQL oracle reproduces every value from
    * the source waveform — the decode is real, the check exact.
    *
    * Scale shape: narrow mapPartitions, payloads never shuffle, one
    * decoder stream per row (a native codec context would be reused
    * per partition); only the small feature rows flow downstream.
    */
  def audioFeatures(ds: Dataset[AudioRow], frame: Int = 80): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    require(frame >= 1, "frame must be positive")
    ds.mapPartitions { it =>
      it.map { r =>
        // degrade, not kill (same contract as the image path): one corrupt
        // payload in a 100 TB corpus must not fail the job, so undecodable
        // or wrong-format audio yields the sentinel row (sample_rate = -1,
        // all counters 0) instead of throwing. The stream closes in a
        // finally either way.
        decodePcm16MonoLe(r.wav) match {
          case None =>
            AudioFeatures(r.doc_id, 0L, -1L, 0L, 0L, 0L, 0L)
          case Some((bytes, sampleRate)) =>
            val n = bytes.length / 2
            var sumSq = 0L
            var peak = 0L
            var silent = 0L
            var frameZero = true
            var i = 0
            while (i < n) {
              val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              if (s != 0L) frameZero = false
              if ((i + 1) % frame == 0) { // full frame boundary
                if (frameZero) silent += 1
                frameZero = true
              }
              i += 1
            }
            AudioFeatures(r.doc_id, n.toLong, sampleRate,
              (n / frame).toLong, sumSq, peak, silent)
        }
      }
    }
  }

  /** Decode a WAV payload to raw PCM16-mono-LE bytes + sample rate, or
    * None when the bytes don't decode or the format isn't the pipeline's
    * expected PCM16 mono LE. Never throws; always closes the stream.
    */
  private[operators] def decodePcm16MonoLe(
      wav: Array[Byte]): Option[(Array[Byte], Long)] = {
    var ais: javax.sound.sampled.AudioInputStream = null
    try {
      ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian)
        Some((ais.readAllBytes(), fmt.getSampleRate.toLong))
      else None
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally if (ais != null) ais.close()
  }

  /** Build a media table from `documents`: utf-8 payload + type by modulo
    * (deterministic, so the DuckDB oracle can reproduce the arithmetic).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.selectExpr(
      "doc_id",
      "element_at(array('image', 'audio', 'video'), CAST(doc_id % 3 AS INT) + 1) AS media_type",
      "encode(text, 'UTF-8') AS payload")
      .as[MediaRow]
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.MediaOps
import graft.sources.Tables

/** Pluggable-source coverage (reference: src/backend/dataSource.js — any
  * `AsyncDataSource` can feed the engine; here any `spark.read` format can)
  * plus the multimodal pipeline query.
  *
  * The csv/json queries materialize a real csv/json copy of a parquet
  * table in a scratch dir, read it back through the corresponding reader
  * with an explicit schema, and aggregate — proving the engine is
  * source-agnostic end to end. The oracle reads the original parquet, so
  * the round-trip itself is under test.
  */
object SourceQueries {

  private def scratch(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_src_$name"

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_csv_source",
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (s, dir) =>
        val path = scratch("nation_csv")
        Tables(s, dir, "nation").write.mode("overwrite")
          .option("header", "true").csv(path)
        s.read.option("header", "true")
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING")
          .csv(path)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).cast("bigint").as("n"),
               sum("n_nationkey").cast("bigint").as("key_sum"),
               min("n_name").as("first_name"))
          .orderBy("n_regionkey")
    },

    // ORC is the third columnar format the engine reads natively (no
    // connector jar — spark-sql ships it); same write→read-back→aggregate
    // round-trip contract as the csv/json sources. Avro is the one
    // format NOT covered: the spark-avro connector is an external module
    // absent from this environment.
    QueryDef("q_orc_source",
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |  min(s_name) AS first_name
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) {
      (s, dir) =>
        val path = scratch("supplier_orc")
        Tables(s, dir, "supplier").write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).cast("bigint").as("n"),
               sum("s_suppkey").cast("bigint").as("key_sum"),
               min("s_name").as("first_name"))
          .orderBy("s_nationkey")
    },

    QueryDef("q_json_source",
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (s, dir) =>
        val path = scratch("nation_json")
        Tables(s, dir, "nation").write.mode("overwrite").json(path)
        s.read
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING")
          .json(path)
          .groupBy("n_regionkey")
          .agg(count(lit(1)).cast("bigint").as("n"),
               sum("n_nationkey").cast("bigint").as("key_sum"),
               min("n_name").as("first_name"))
          .orderBy("n_regionkey")
    },

    // ---- Multimodal -> embedding: the binary payload flows through the
    // mapPartitions encoder stub into the SAME Array[Float] shape the
    // embeddings table uses — the full media-to-similarity pipeline. The
    // oracle reproduces the encoder's integer byte histogram from the
    // text chars independently (payload is utf-8 of ASCII text here, so
    // byte == codepoint); the exact counts are recovered from the
    // L2-normalized output via total-bytes / sum(e) — which also proves
    // the normalization is consistent. norm_ok asserts |"e"|_2 = 1.
    QueryDef("q_multimodal_embed",
      """WITH t AS (
        |  SELECT doc_id, list_transform(string_split(text, ''), ch -> ord(ch) % 64) AS codes
        |  FROM documents WHERE doc_id < 100
        |)
        |SELECT doc_id,
        |  to_json(list_transform(range(0, 64),
        |    k -> CAST(len(list_filter(codes, c -> c = k)) AS INT)))::VARCHAR AS hist_json,
        |  TRUE AS norm_ok
        |FROM t ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        val docs = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        val emb = MediaOps.embed(MediaOps.decode(MediaOps.fromDocuments(docs)), dims = 64)
        emb.toDF()
          .join(docs.selectExpr("doc_id", "length(text) AS tl"), "doc_id")
          // esum bound as a lambda VARIABLE (SURVEY §6): a withColumn
          // alias re-ran the embedding sum once per output element
          .selectExpr("doc_id",
            "to_json(element_at(transform(array(" +
              "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE))), esum -> " +
              "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * tl / esum) AS INT))), 1)) AS hist_json",
            "abs(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) - 1D) < 1E-5 AS norm_ok")
          .orderBy("doc_id")
      }
    },

    // ---- Image resize: REAL PNG decode -> exact integer NN resample ->
    // lossless PNG re-encode -> REAL decode again. The source image is
    // formulaic gray (synthPng), so the oracle recomputes the resampled
    // luma sum from pure arithmetic: a match proves the whole
    // encode/decode/resample/re-encode chain is bit-faithful. ----
    QueryDef("q_multimodal_resize",
      """WITH d AS (SELECT doc_id,
        |    32 + (doc_id % 5) * 8 AS sw, 16 + (doc_id % 3) * 8 AS sh
        |  FROM documents WHERE doc_id < 100),
        |dim AS (SELECT doc_id, sw, sh,
        |    greatest(1, (sw * 16) // greatest(sw, sh)) AS dw,
        |    greatest(1, (sh * 16) // greatest(sw, sh)) AS dh FROM d),
        |px AS (SELECT doc_id, dw, dh,
        |    ((((x * sw) // dw) * 7 + ((y * sh) // dh) * 13 + doc_id) % 256) AS v
        |  FROM dim, unnest(range(0, dw)) AS ux(x), unnest(range(0, dh)) AS uy(y))
        |SELECT doc_id, CAST(max(dw) AS INT) AS w, CAST(max(dh) AS INT) AS h,
        |  CAST(sum(v) AS BIGINT) AS luma_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rows = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val sw = (32 + (id % 5) * 8).toInt
          val sh = (16 + (id % 3) * 8).toInt
          MediaOps.MediaRow(id, "image", MediaOps.synthPng(id, sw, sh))
        }
      MediaOps.lumaSummary(MediaOps.resizeImages(rows, maxSide = 16))
        .orderBy("doc_id")
    },

    // ---- Audio: REAL RIFF/WAVE decode via javax.sound (JDK-only, the
    // audio twin of the javax.imageio image path). The waveform is a
    // pure-integer formula, PCM16 round-trips losslessly, and the decode
    // stream parses the real header — so the oracle recomputes every
    // sample and the features match EXACTLY iff encode → AudioSystem
    // decode → feature extraction is bit-faithful end to end. ----
    QueryDef("q_multimodal_audio",
      """WITH d AS (SELECT doc_id, 400 + (doc_id % 5) * 80 AS n FROM documents),
        |s AS (SELECT doc_id, n, list_transform(range(0, n),
        |    i -> CASE WHEN (i // 80) % 3 = 2 THEN 0
        |         ELSE ((doc_id * 31 + i * 17) % 4001) - 2000 END) AS sm
        |  FROM d)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(n // 80 AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(sm, x -> CAST(x * x AS BIGINT))) AS BIGINT) AS sum_sq,
        |  CAST(list_max(list_transform(sm, x -> abs(x))) AS BIGINT) AS peak_abs,
        |  CAST(list_sum(list_transform(range(0, n // 80),
        |    f -> CASE WHEN list_max(list_transform(
        |        list_slice(sm, f * 80 + 1, f * 80 + 80), x -> abs(x))) = 0
        |      THEN 1 ELSE 0 END)) AS BIGINT) AS silent_frames
        |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val rows = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => MediaOps.AudioRow(id, MediaOps.synthWavPcm16(id)))
      MediaOps.audioFeatures(rows, frame = 80).toDF().orderBy("doc_id")
    },

    // ---- Multimodal: binary payload + typed metadata through the real
    // mapPartitions decode/resize/frame-sample plumbing (stubbed codecs;
    // the oracle reproduces the stub arithmetic from the text bytes). ----
    // ---- Perceptual blockhash (MediaOps.phash60) -------------------------
    // 60-bit block-mean hash of each payload in exact integer arithmetic
    // (cross-multiplied mean compares); the near-dup key for media
    // columns, hamming-matched like simhash. The oracle rebuilds the
    // byte stream from the ascii codes (payload = utf-8 of ASCII text).
    QueryDef("q_multimodal_phash",
      """WITH t AS (
        |  SELECT doc_id, text, strlen(text) AS len
        |  FROM documents WHERE doc_id < 200 AND strlen(text) > 0),
        |by AS (
        |  SELECT doc_id, len,
        |    CAST(((i - 1) * 60) // len AS INT) AS j,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS v
        |  FROM t, unnest(range(1, len + 1)) AS u(i)),
        |blocks AS (
        |  SELECT doc_id, len, j, sum(v) AS bs, count(*) AS bl
        |  FROM by GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, sum(v) AS total FROM by GROUP BY 1),
        |bits AS (
        |  SELECT b.doc_id,
        |    sum(CASE WHEN b.bs * b.len > t2.total * b.bl
        |        THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS phash
        |  FROM blocks b JOIN tot t2 USING (doc_id) GROUP BY 1)
        |SELECT doc_id, CAST(phash AS BIGINT) AS phash,
        |  CAST(bit_count(CAST(phash AS BIGINT)) AS INT) AS n_bits
        |FROM bits ORDER BY doc_id""".stripMargin) {
      (s, dir) => {
        import s.implicits._
        val media = MediaOps.fromDocuments(
          Tables(s, dir, "documents").filter(col("doc_id") < 200))
        MediaOps.phash60(MediaOps.decode(media)
            .filter(r => r.payload.nonEmpty))
          .selectExpr("doc_id", "phash",
            "CAST(bit_count(phash) AS INT) AS n_bits")
          .orderBy("doc_id")
      }
    },

    QueryDef("q_multimodal_meta",
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |    strlen(text) AS len,
        |    ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1,
        |    ascii(substr(text, 3, 1)) AS b2, ascii(substr(text, 4, 1)) AS b3
        |  FROM documents WHERE doc_id < 200
        |), m AS (
        |  SELECT doc_id, media_type, len,
        |    16 * (1 + b0 % 64) AS width, 16 * (1 + b1 % 48) AS height,
        |    8000 * (1 + b2 % 6) AS sample_rate, 1 + b3 % 2 AS n_channels
        |  FROM t
        |), r AS (
        |  SELECT *, greatest(1, greatest(width, height) // 256) AS scale FROM m
        |)
        |SELECT doc_id, media_type,
        |  CAST(len AS BIGINT) AS n_bytes,
        |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(n_channels AS BIGINT) AS n_channels,
        |  CAST(len * 4 AS BIGINT) AS duration_ms,
        |  CAST(width // scale AS BIGINT) AS rs_width,
        |  CAST(height // scale AS BIGINT) AS rs_height,
        |  CAST(least(4, greatest(1, greatest(1, len // (scale * scale)) // 16)) AS BIGINT) AS n_frames
        |FROM r ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        import s.implicits._
        val media = MediaOps.fromDocuments(
          Tables(s, dir, "documents").filter(col("doc_id") < 200))
        val decoded = MediaOps.decode(media)
        val resized = MediaOps.resize(decoded, maxSide = 256)
        val frames = MediaOps.sampleFrames(resized, nFrames = 4)
          .groupBy("doc_id").agg(count(lit(1)).cast("bigint").as("n_frames"))
        decoded.toDF().as("d")
          .join(resized.toDF().selectExpr(
            "doc_id", "meta.width AS rs_width", "meta.height AS rs_height").as("r"), "doc_id")
          .join(frames, "doc_id")
          .selectExpr("doc_id", "media_type",
            "n_bytes",
            "CAST(meta.width AS BIGINT) AS width", "CAST(meta.height AS BIGINT) AS height",
            "CAST(meta.sampleRate AS BIGINT) AS sample_rate",
            "CAST(meta.nChannels AS BIGINT) AS n_channels",
            "CAST(meta.durationMs AS BIGINT) AS duration_ms",
            "CAST(rs_width AS BIGINT) AS rs_width",
            "CAST(rs_height AS BIGINT) AS rs_height",
            "n_frames")
          .orderBy("doc_id")
    },

    // ---- Frame sampling (video/audio payload slicing) -------------------
    // the frame-sample leg of the multimodal pipeline as its OWN surface:
    // each payload yields n = min(4, max(1, len/16)) evenly-spaced 16-byte
    // "frames" (offset len·i/n — the stride arithmetic a real container
    // demuxer would drive), emitted one row per frame via flatMap. The
    // payload derivation is the deterministic fromDocuments contract, so
    // the oracle reproduces offsets and slices with pure substring
    // arithmetic over the SAME text. Narrow flatMap: no shuffle, fan-out
    // is bounded (≤4 rows/doc) — the shape that survives a 100 TB corpus.
    QueryDef("q_multimodal_frames",
      """WITH t AS (
        |  SELECT doc_id, text, strlen(text) AS len
        |  FROM documents WHERE doc_id < 150),
        |f AS (
        |  SELECT doc_id, text, len,
        |    least(4, greatest(1, len // 16)) AS n
        |  FROM t),
        |x AS (
        |  SELECT doc_id, text, len, n,
        |    unnest(range(0, n)) AS frame_idx
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(least(16, len - (len * frame_idx) // n) AS BIGINT) AS frame_len,
        |  substr(text, CAST((len * frame_idx) // n + 1 AS INT), 4) AS frame_head
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin) {
      (s, dir) =>
        val media = MediaOps.fromDocuments(
          Tables(s, dir, "documents").filter(col("doc_id") < 150))
        MediaOps.sampleFrames(MediaOps.decode(media), nFrames = 4)
          .selectExpr("doc_id",
            "CAST(frame_idx AS BIGINT) AS frame_idx",
            "CAST(length(frame) AS BIGINT) AS frame_len",
            "substring(CAST(frame AS STRING), 1, 4) AS frame_head")
          .orderBy("doc_id", "frame_idx")
    },

    // ---- Pluggable DataSourceV2 source ---------------------------------
    // the reference's headline plug-in contract (src/backend/dataSource.js:
    // AsyncDataSource) realized as a Spark TableProvider: a custom scan
    // with REAL predicate + column pushdown (the id filter narrows the
    // generated range before partition planning — see GraftRangeSource).
    // The oracle reproduces the generated table with DuckDB's range().
    QueryDef("q_custom_source",
      """SELECT CAST(id % 10 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(id * id) AS BIGINT) AS sq_sum,
        |  min('row_' || CAST(id AS VARCHAR)) AS first_name
        |FROM range(700, 9300) t(id)
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, _) =>
        s.read.format("graft-range")
          .option("rows", "100000").option("partitions", "8").load()
          .filter(col("id") >= 700 && col("id") < 9300)
          .groupBy("bucket")
          .agg(count(lit(1)).cast("bigint").as("n"),
            sum("sq").cast("bigint").as("sq_sum"),
            min("name").as("first_name"))
          .orderBy("bucket")
    },

    // ---- Aggregate pushdown into the custom source ----------------------
    // COUNT(*)/MIN(id)/MAX(id) over the filter-narrowed range are CLOSED
    // FORM in the scan (SupportsPushDownAggregates, complete pushdown):
    // a TRILLION-row "table" aggregates in O(1) because no row is ever
    // generated. The oracle is the same closed form evaluated as
    // literals — which is the point: both engines agree the answer is
    // arithmetic, not a scan.
    QueryDef("q_custom_source_agg",
      """SELECT CAST(1000000000000 - 12345 AS BIGINT) AS n_rows,
        |  CAST(12345 AS BIGINT) AS min_id,
        |  CAST(999999999999 AS BIGINT) AS max_id""".stripMargin) {
      (s, _) =>
        s.read.format("graft-range").option("rows", "1000000000000").load()
          .filter(col("id") >= 12345)
          .agg(expr("CAST(count(*) AS BIGINT) AS n_rows"),
            min("id").cast("bigint").as("min_id"),
            max("id").cast("bigint").as("max_id"))
    }
  )
}

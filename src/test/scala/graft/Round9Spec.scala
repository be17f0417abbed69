package graft

import graft.operators.{Dedup, Sampling, TextOps, Vectors}
import org.apache.spark.sql.functions._

/** Round-9 additions: Gopher quality rules, feature-hashed embeddings,
  * temperature mixture weights, cluster representatives, and the
  * on-disk IVF-PQ index.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  test("gopherSignals: planted trigram repetition and symbol soup score as expected") {
    val docs = Seq(
      // "a b c" appears 3x in 11 tokens -> top trigram covers 9/11
      (1L, "a b c a b c a b c zz 9"),
      // clean prose: no repeated trigram, all alphabetic
      (2L, "the quick brown fox jumps over lazy dogs")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Double)].collect()

    val (_, n1, top1, dup1, len1, alpha1) = got(0)
    assert(n1 == 11L)
    assert(top1 == math.rint(3 * 3.0 / 11 * 1e6) / 1e6) // "a b c" x3, x3 tokens
    // 5-grams: 7 total, "a b c a b" and "b c a b c" each appear twice ->
    // 2 duplicate occurrences -> 2*5/11
    assert(dup1 == math.rint(2 * 5.0 / 11 * 1e6) / 1e6)
    assert(len1 == math.rint(12.0 / 11 * 1e6) / 1e6)
    assert(alpha1 == math.rint(10.0 / 11 * 1e6) / 1e6) // "zz" counts, "9" not

    val (_, n2, top2, dup2, _, alpha2) = got(1)
    assert(n2 == 8L && top2 == math.rint(3.0 / 8 * 1e6) / 1e6 && dup2 == 0.0)
    assert(alpha2 == 1.0)
  }

  test("gopherSignals alpha_frac counts only purely-alphabetic tokens") {
    val docs = Seq((1L, "word w0rd 123 mixed2 pure")).toDF("doc_id", "text")
    val a = TextOps.gopherSignals(docs, "doc_id", "text")
      .select("alpha_frac").as[Double].head()
    assert(a == math.rint(2.0 / 5 * 1e6) / 1e6) // word, pure
  }

  test("hashEmbed is integer-exact, length-dims, and total mass == n_tokens") {
    val docs = Seq((1L, "alpha beta gamma alpha beta alpha"),
      (2L, "solo")).toDF("doc_id", "text")
    val got = TextOps.hashEmbed(docs, "text", dims = 8)
      .select(col("doc_id"), col("hemb"),
        expr("aggregate(hemb, CAST(0 AS BIGINT), (a, x) -> a + abs(x))").as("mass"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long], Long)].collect()
    assert(got.forall(_._2.length == 8))
    // every token lands in exactly one bucket with weight ±1; the planted
    // repeats share buckets+signs (same token -> same hash), so |mass|
    // can only shrink via cross-token collisions, never grow
    assert(got(0)._3 <= 6L && got(0)._3 >= 2L)
    assert(got(1)._3 == 1L)
    // determinism: same input -> bit-identical vector
    val again = TextOps.hashEmbed(docs, "text", dims = 8)
      .orderBy("doc_id").select("hemb").as[Seq[Long]].collect()
    assert(got.map(_._2).toSeq == again.toSeq)
  }

  test("temperatureWeights: weights sum to 1 and flatten the head stratum") {
    val df = Seq.tabulate(1000)(i =>
      (if (i < 900) "head" else "tail", 10L)).toDF("source", "n_tok")
    val w = Sampling.temperatureWeights(df, "source", "n_tok", budget = 10000L)
      .orderBy("source")
      .as[(String, Long, Double, Long, Double)].collect()
    val Array(head, tail) = w
    assert(head._2 == 9000L && tail._2 == 1000L)
    assert(math.abs(head._3 + tail._3 - 1.0) < 1e-5)
    // proportional share would be 0.9; sqrt-temperature pulls it to 0.75
    assert(head._3 < 0.8 && head._3 > 0.7)
    // expected tokens split the budget by weight; epochs = expected/n
    assert(math.abs(head._4 + tail._4 - 10000L) <= 1L)
    assert(tail._5 > head._5) // the tail corpus repeats more
  }

  test("representatives picks max score, ties broken by lowest id") {
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 10L), (7L, 20L), (8L, 20L))
      .toDF("id", "cluster")
    val meta = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 4L))
      .toDF("doc_id", "score")
    val got = Dedup.representatives(clusters, meta, "doc_id", "score")
      .orderBy("cluster")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // cluster 10: scores (5,9,9) -> id 2 wins the tie; cluster 20: tie -> id 7
    assert(got == Seq((10L, 3L, 2L, 9L), (20L, 2L, 7L, 4L)))
  }

  test("on-disk IVF-PQ index reproduces the in-memory ADC ranking and prunes by cell") {
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables(spark, dir, "embeddings")
    val seeds = emb.orderBy("vec_id").limit(4)
      .selectExpr("vec_id",
        Vectors.microQuantExpr("embedding", 64, 1000000L, 1000000L, "r9") + " AS qe")
    val cells = seeds.selectExpr("vec_id AS cid", "qe AS ce")
    val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 1, 32) AS ce")
      .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 33, 32) AS ce"))
    val path = java.nio.file.Files.createTempDirectory("r9idx").toString + "/idx"
    val corpus = emb.filter(col("vec_id") >= 5).select("vec_id", "embedding")
    Vectors.buildIvfPqIndex(corpus, "vec_id", "embedding", cells, codebook,
      path, m = 2, dims = 64)

    // layout: codes are partitioned by cell -> one directory per cell,
    // so an nprobe search reads nprobe/k of the files
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(cellDirs.length == 4, s"expected 4 cell partitions, got ${cellDirs.toSeq}")

    val queries = emb.filter(col("vec_id") < 5).select("vec_id", "embedding")
    val idx = Vectors.searchIvfPqIndex(spark, path, queries, "vec_id",
        "embedding", k = 3, nprobe = 4, m = 2, dims = 64)
      .select("qid", "rnk", "vec_id", "adc")
      .orderBy("qid", "rnk")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // nprobe = #cells -> no pruning -> must equal the full pqAdcTopK scan
    val full = Vectors.pqAdcTopK(
        Vectors.pqAssign(corpus, "vec_id", "embedding", codebook, m = 2, dims = 64)
          .select("vec_id", "pq_codes"),
        "vec_id", "pq_codes", queries, "vec_id", "embedding", codebook,
        k = 3, m = 2, dims = 64)
      .select("qid", "rnk", "vec_id", "adc")
      .orderBy("qid", "rnk")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(idx == full)
  }

  test("buildIvfPqIndex commits atomically: a stale staging dir is repaired, the index replaced") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = emb.orderBy("vec_id").limit(2)
      .selectExpr("vec_id",
        Vectors.microQuantExpr("embedding", 64, 1000000L, 1000000L, "r9b") + " AS qe")
    val cells = seeds.selectExpr("vec_id AS cid", "qe AS ce")
    val codebook = seeds.selectExpr("CAST(0 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 1, 32) AS ce")
      .unionAll(seeds.selectExpr("CAST(1 AS INT) AS sub", "vec_id AS cid",
        "slice(qe, 33, 32) AS ce"))
    val root = java.nio.file.Files.createTempDirectory("r9swap").toString
    val path = s"$root/idx"
    val corpus = emb.filter(col("vec_id") >= 2).select("vec_id", "embedding")
    Vectors.buildIvfPqIndex(corpus, "vec_id", "embedding", cells, codebook,
      path, m = 2, dims = 64)
    val n1 = spark.read.parquet(s"$path/codes").count()
    // simulate a crashed writer: leave junk staging behind, then rebuild
    val staging = new java.io.File(s"${path}_staging")
    staging.mkdirs()
    new java.io.File(staging, "garbage").createNewFile()
    Vectors.buildIvfPqIndex(corpus, "vec_id", "embedding", cells, codebook,
      path, m = 2, dims = 64)
    val n2 = spark.read.parquet(s"$path/codes").count()
    assert(n1 == n2 && n1 == corpus.count())
    assert(!staging.exists(), "staging must be consumed by the atomic commit")
  }

  test("dsirWeights: target-like documents outrank raw-noise ones; short docs omitted") {
    // target corpus speaks "alpha beta gamma"; raw noise speaks "junk"
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta gamma alpha beta", true)) ++
      (21L to 60L).map(i => (i, "junk spam junk spam junk", false)) ++
      Seq((100L, "alpha beta gamma alpha beta", false),  // target-like, unlabeled
          (101L, "junk spam junk spam junk", false),     // noise
          (102L, "solo", false))                         // < 2 tokens: no features
    ).toDF("doc_id", "text", "is_tgt")
    val w = Sampling.dsirWeights(docs, "doc_id", "text", "is_tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh noise: ${w(100L)} vs ${w(101L)}")
    assert(w(100L) > 0 && w(101L) < 0) // log-ratio sign follows the tilt
    assert(!w.contains(102L)) // featureless doc omitted, not scored 0
    // pure function of the corpus: rerun is bit-identical
    val w2 = Sampling.dsirWeights(docs, "doc_id", "text", "is_tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(w == w2)
  }

  test("audio: WAV PCM16 round-trips losslessly through the REAL javax.sound decode") {
    import graft.operators.MediaOps
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 7L)
    val got = MediaOps.audioFeatures(
        ids.toDF("doc_id").as[Long].map(id =>
          MediaOps.AudioRow(id, MediaOps.synthWavPcm16(id))))
      .collect().map(f => f.doc_id -> f).toMap
    ids.foreach { id =>
      val n = MediaOps.synthSampleCount(id)
      val samples = (0 until n).map(MediaOps.synthSample(id, _))
      val f = got(id)
      assert(f.n_samples == n.toLong && f.sample_rate == 8000L)
      assert(f.n_frames == (n / 80).toLong)
      assert(f.sum_sq == samples.map(s => s.toLong * s).sum)
      assert(f.peak_abs == samples.map(s => math.abs(s).toLong).max)
      // every third frame is zeroed by construction
      assert(f.silent_frames ==
        (0 until n / 80).count(fr => fr % 3 == 2).toLong)
    }
  }

  test("audio: non-PCM16-mono and undecodable payloads degrade to the sentinel") {
    import graft.operators.MediaOps
    // stereo header: channels=2, block align=4 — a real decoder parses it,
    // the feature extractor must not mis-feature it as mono. Contract
    // (same as the image path): degrade to the sentinel row, never kill
    // the job over one corrupt payload in a 100 TB corpus.
    val mono = MediaOps.synthWavPcm16(1L)
    val stereo = mono.clone()
    stereo(22) = 2 // nChannels LE16 @ offset 22
    stereo(32) = 4 // block align LE16 @ offset 32
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val rows = MediaOps.audioFeatures(
        Seq((1L, stereo), (2L, garbage), (3L, mono))
          .toDF("doc_id", "wav").as[MediaOps.AudioRow])
      .collect().map(f => f.doc_id -> f).toMap
    // corrupt rows: sentinel (sample_rate = -1, all counters 0)
    Seq(1L, 2L).foreach { id =>
      val f = rows(id)
      assert(f.sample_rate == -1L && f.n_samples == 0L && f.sum_sq == 0L,
        s"doc $id should be the sentinel row, got $f")
    }
    // and the valid row in the same batch still decodes for real
    assert(rows(3L).sample_rate == 8000L && rows(3L).n_samples > 0L)
  }

  test("weightedReservoir: exactly k per stratum, weight-proportional, deterministic") {
    import graft.operators.Sampling
    // 1000 rows, one stratum: ids < 10 carry weight 10000, the rest 1 —
    // at this ratio the heavy ids dominate the k=10 sample with margin
    // (990 light items competing means the LIGHT minimum is itself an
    // Exp(990), so a mere 1000x ratio leaves the outcome seed-lucky)
    val rows = (0L until 1000L).map(i =>
      (i, "s", if (i < 10) 10000.0 else 1.0)).toDF("id", "st", "w")
    val got = Sampling.weightedReservoir(rows, "st", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got.size == 10)
    assert(got.count(_ < 10L) >= 8, s"heavy ids underrepresented: $got")
    // deterministic: a second run selects the identical set
    val again = Sampling.weightedReservoir(rows, "st", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    // zero/NULL weight rows are never sampled; k larger than the stratum
    // returns the whole (positive-weight) stratum
    val zw = Seq((1L, "a", 0.0), (2L, "a", 5.0), (3L, "a", -1.0))
      .toDF("id", "st", "w")
    val kept = Sampling.weightedReservoir(zw, "st", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L), kept)
  }
}

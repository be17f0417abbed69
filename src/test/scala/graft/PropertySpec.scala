package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators._

/** Property-based equivalence: each scale-shaped operator must equal its
  * naive formulation on RANDOM inputs, not just the hand-picked specs —
  * randomized keys, values, duplicates, and negatives cover the corners
  * example-based tests miss (empty groups, all-tied keys, adjacent
  * bucket boundaries, k larger than the group). ScalaCheck generators
  * drawn under FIXED seeds: random coverage, reproducible failures.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Draw `n` deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.iterate(Seed(42L))(_.next).take(n).toSeq
      .flatMap(seed => g.apply(Gen.Parameters.default, seed))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    samples(Gen.zip(ga, gb), 8).foreach { case (a, b) => body(a, b) }
  private def forAll[A](ga: Gen[A])(body: A => Unit): Unit =
    samples(ga, 8).foreach(body)
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(60, for {
      k <- Gen.chooseNum(0L, 4L)
      t <- Gen.chooseNum(-50L, 50L)
      v <- Gen.chooseNum(-100, 100).map(_.toDouble)
    } yield (k, t, v))

  test("overlaps == naive inequality join on random intervals") {
    forAll(rowsGen, Gen.chooseNum(1, 9)) { (rows, width) =>
      whenever(rows.nonEmpty) {
        val l = rows.zipWithIndex
          .map { case ((k, t, _), i) => (i.toLong, math.min(t, t + k), math.max(t, t + k)) }
          .toDF("lid", "ls", "le")
        val r = rows.zipWithIndex
          .map { case ((k, t, _), i) => (i.toLong + 1000, math.min(t - k, t), math.max(t - k, t)) }
          .toDF("rid", "rs", "re")
        val fast = RangeJoin.overlaps(l, r, "ls", "le", "rs", "re", width.toDouble)
          .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
        val naive = l.join(r, expr("ls <= re AND rs <= le"))
          .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
        assert(fast == naive, s"width=$width")
      }
    }
  }

  test("TopK.perKey == row_number window on random data") {
    forAll(rowsGen, Gen.chooseNum(1, 7)) { (rows, k) =>
      whenever(rows.nonEmpty) {
        // unique tiebreak id so both formulations are deterministic
        val df = rows.zipWithIndex
          .map { case ((key, _, v), i) => (key, v, i.toLong) }
          .toDF("k", "v", "id")
        val fast = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id").asc), k)
          .select("k", "id").as[(Long, Long)].collect().sorted.toSeq
        val naive = df.withColumn("rn",
            row_number().over(Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)))
          .filter(col("rn") <= k)
          .select("k", "id").as[(Long, Long)].collect().sorted.toSeq
        assert(fast == naive, s"k=$k")
      }
    }
  }

  test("asof == per-row latest-at-or-before aggregate on random series") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val left = rows.zipWithIndex.map { case ((k, t, _), i) => (i.toLong, k, t) }
          .toDF("lid", "k", "ts")
        // unique (k, ts) right rows — the operator's documented contract
        val right = rows.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
          (k, t, g.map(_._3).max)
        }.toSeq.toDF("k", "ts", "v")
        val fast = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("v"))
          .select("lid", "asof_v")
          .as[(Long, Option[Double])].collect().toMap
        val naive = left.as("l").join(right.as("r"),
            expr("l.k = r.k AND r.ts <= l.ts"), "left")
          .groupBy(col("lid"), col("l.ts"))
          .agg(max_by(col("v"), col("r.ts")).as("v"))
          .select("lid", "v").as[(Long, Option[Double])].collect().toMap
        assert(fast == naive)
      }
    }
  }

  test("salted aggregate == plain groupBy sums on random data") {
    forAll(rowsGen, Gen.chooseNum(2, 8)) { (rows, salt) =>
      whenever(rows.nonEmpty) {
        val df = rows.map { case (k, _, v) => (k, v) }.toDF("k", "v")
        val fast = Skew.saltedAggregate(df, Seq("k"), salt,
            Seq(Skew.sum2("v", "s"), Skew.count2("n")))
          .select("k", "s", "n").as[(Long, Double, Long)].collect()
          .map { case (k, s, n) => (k, math.round(s * 1e6), n) }.toSet
        val naive = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
          .select("k", "s", "n").as[(Long, Double, Long)].collect()
          .map { case (k, s, n) => (k, math.round(s * 1e6), n) }.toSet
        assert(fast == naive)
      }
    }
  }

  test("hashSplit folds partition ids completely and disjointly for any fold count") {
    forAll(Gen.chooseNum(2, 12)) { folds =>
      val ids = spark.range(300).selectExpr("id AS doc_id")
      val assigned = Sampling.fold(ids, "doc_id", folds)
        .select("fold").as[Int].collect()
      assert(assigned.length == 300)
      assert(assigned.forall(f => f >= 0 && f < folds))
    }
  }

  // ---- distribution statistics vs their naive formulations -------------

  private val valueRowsGen: Gen[List[(Long, Double)]] =
    // (user_id, value): both parities populated by construction so the
    // two-sample statistics are always defined
    Gen.listOfN(50, for {
      u <- Gen.chooseNum(0L, 9L)
      v <- Gen.chooseNum(0, 400).map(_ / 4.0)
    } yield (u, v)).map(_ ++ List((0L, 1.0), (1L, 2.0)))

  private def writeEventRows(rows: Seq[(Long, Double)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("prop_ev").toString
    rows.zipWithIndex.map { case ((u, v), i) => (i.toLong, u, v) }
      .toDF("event_id", "user_id", "value")
      .selectExpr("event_id",
        "timestamp_micros(CAST(1700000000000000 + event_id AS BIGINT)) AS ts",
        "user_id", "'view' AS event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q_ks_test == naive ECDF max-gap on random parity samples") {
    forAll(valueRowsGen) { rows =>
      val tmp = writeEventRows(rows)
      val got = SparkEntry.queries("q_ks_test")(spark, tmp).collect()(0)
      val cents = rows.map { case (u, v) => (u % 2 == 0, math.round(v * 100)) }
      val a = cents.filter(_._1).map(_._2).sorted
      val b = cents.filterNot(_._1).map(_._2).sorted
      val d = (a ++ b).distinct.map { v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
      }.max.toDouble / (a.length.toLong * b.length)
      assert(got.getAs[Long]("n_a") == a.length.toLong)
      assert(math.abs(got.getAs[Double]("ks_d") - d) < 1e-6)
    }
  }

  test("q_rank_test 2U == pair counting on random parity samples") {
    forAll(valueRowsGen) { rows =>
      val tmp = writeEventRows(rows)
      val got = SparkEntry.queries("q_rank_test")(spark, tmp).collect()(0)
      val cents = rows.map { case (u, v) => (u % 2 == 0, math.round(v * 100)) }
      val a = cents.filter(_._1).map(_._2)
      val b = cents.filterNot(_._1).map(_._2)
      // 2·U_a = 2·#(a > b) + #(a = b) over ALL cross pairs — the
      // definition the rank formulation must reproduce exactly
      val u2 = a.map(x => 2L * b.count(x > _) + b.count(x == _)).sum
      assert(got.getAs[Long]("u2_a") == u2)
      // AUC is 2U / (2·na·nb)
      assert(math.abs(got.getAs[Double]("auc") -
        u2.toDouble / (2.0 * a.length * b.length)) < 1e-6)
    }
  }

  test("q_gini == naive sorted-rank formula on random lengths") {
    forAll(Gen.listOfN(40, Gen.chooseNum(0L, 500L))) { lens =>
      val tmp = java.nio.file.Files.createTempDirectory("prop_gini").toString
      lens.zipWithIndex.map { case (n, i) => (i.toLong, "x" * 3, "en", "s", n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = SparkEntry.queries("q_gini")(spark, tmp).collect()(0)
      val sorted = lens.sorted
      val n = sorted.length.toLong
      val sx = sorted.sum
      whenever(sx > 0) {
        val srx = sorted.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
        val gini = (2.0 * srx - (n + 1) * sx) / (n.toDouble * sx)
        assert(got.getAs[Long]("n_docs") == n)
        assert(math.abs(got.getAs[Double]("gini") - gini) < 1e-6)
      }
    }
  }

  test("Graph.bfs == naive Scala BFS on random directed graphs") {
    val edgesGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
      .map(_.filter { case (s, d) => s != d })
    forAll(edgesGen) { es =>
      whenever(es.nonEmpty) {
        val adj = es.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        var dist = Map(0L -> 0L)
        var frontier = Set(0L)
        var h = 0L
        while (frontier.nonEmpty && h < 11) {
          h += 1
          val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
            .filterNot(dist.contains)
          next.foreach(n => dist += n -> h)
          frontier = next
        }
        val got = Graph.bfs(es.toDF("src", "dst"), Seq(0L).toDF("node"), maxHops = 11)
          .as[(Long, Long)].collect().toMap
        assert(got == dist)
      }
    }
  }
}

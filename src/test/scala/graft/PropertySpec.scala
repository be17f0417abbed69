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
}

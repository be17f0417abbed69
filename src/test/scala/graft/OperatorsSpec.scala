package graft

import java.sql.Timestamp

import graft.functions.GraftFunctions
import graft.operators.{Sessionize, Skew}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("batch sessionize matches the streaming operator's gap semantics") {
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(8), 3.0),   // session 1
      (1L, ts(60), 4.0),                                       // session 2
      (2L, ts(1), 5.0)                                         // session 1
    ).toDF("user_id", "ts", "value")
    val out = Sessionize.sessions(events, "user_id", "ts", "value", gapSeconds = 600)
      .selectExpr("user_id", "session_id", "n_events", "CAST(total AS DOUBLE) AS total")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 5.0)))
  }

  test("salted aggregation equals plain groupBy on skewed data") {
    val skewed = spark.range(10000)
      .selectExpr("CASE WHEN id % 100 < 99 THEN 'hot' ELSE concat('k', id % 7) END AS k",
        "CAST(id AS DOUBLE) AS v")
    val salted = Skew.saltedAggregate(skewed, Seq("k"), salt = 16, Seq(
        Skew.count2("n"), Skew.sum2("v", "total"),
        Skew.min2("v", "vmin"), Skew.max2("v", "vmax")))
      .orderBy("k").collect()
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"),
           min("v").as("vmin"), max("v").as("vmax"))
      .orderBy("k").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("registered graft functions are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_score('hello') AS s, graft_fingerprint('abc') AS f").collect().head
    assert(r.getAs[Long]("s") == 5L)
    assert(r.getAs[Long]("f") == ((('a' * 31L + 'b') % 1000000007L * 31 + 'c') % 1000000007L))
  }
}

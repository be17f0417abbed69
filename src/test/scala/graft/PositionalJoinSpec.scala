package graft

import graft.operators.PositionalJoin
import org.apache.spark.sql.functions.col

/** Positional join semantics (reference: src/execute/join.js
  * PositionalJoin — zip by row position, NULL-pad the shorter side).
  */
class PositionalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("zips rows by position and pads the shorter side with nulls") {
    val l = Seq("a", "b", "c").toDF("l")
    val r = Seq(1, 2).toDF("r")
    val out = PositionalJoin(l, Seq(col("l")), r, Seq(col("r")))
      .orderBy("pos").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("l") == "a" && out(0).getAs[Int]("r") == 1)
    assert(out(2).getAs[String]("l") == "c" && out(2).isNullAt(out(2).fieldIndex("r")))
  }
}

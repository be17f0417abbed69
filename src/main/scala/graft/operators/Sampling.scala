package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling surfaces for training-data pipelines.
  *
  * The split everyone actually ships is the HASH split: assignment is a
  * pure function of a stable id (never of partitioning, row order, or a
  * RNG stream), so it is reproducible across runs, engines, and
  * re-shards, and any late-arriving row lands in the same fold it would
  * have landed in last month. Narrow, codegen'd, no shuffle.
  */
object Sampling {

  /** Deterministic n-way fold assignment: `graft_hash60(id) % folds`. */
  def fold(df: DataFrame, idCol: String, folds: Int = 10,
           out: String = "fold"): DataFrame =
    df.withColumn(out,
      expr(s"CAST(graft_hash60(CAST($idCol AS STRING)) % $folds AS INT)"))

  /** Train/test split: rows whose fold lands below `testFolds` (of
    * `folds`) are tagged 'test', the rest 'train' — e.g. folds=10,
    * testFolds=1 is the standard 90/10 split.
    */
  def hashSplit(df: DataFrame, idCol: String,
                folds: Int = 10, testFolds: Int = 1,
                out: String = "split"): DataFrame =
    fold(df, idCol, folds, "_fold")
      .withColumn(out,
        expr(s"CASE WHEN _fold < $testFolds THEN 'test' ELSE 'train' END"))
      .drop("_fold")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent table fingerprint for data contracts: verify that
  * two copies of a dataset (another engine, another cluster, yesterday's
  * snapshot re-derived) hold EXACTLY the same rows without moving either
  * copy — compare one (n_rows, fp) pair.
  */
object Checksum {

  /** One-row frame `(n_rows, fp)`: fp is the exact decimal SUM of the
    * shared 60-bit hash of each row's `'|'`-joined column values — a
    * commutative combine, so the fingerprint is identical under ANY
    * partitioning, row order, or engine. A single changed row alters the
    * sum unless the replacement row's hash equals the original's
    * (~2⁻⁶⁰); multi-row corruptions can in principle cancel, so this is
    * a copy check, not a cryptographic commitment.
    *
    * `cols` must be STRING-valued (callers cast: integers/strings are
    * portable as-is; floats/timestamps must first be cast to an exact
    * representation — cents, epoch micros — because engines do NOT
    * format doubles identically). Each value is LENGTH-PREFIXED
    * (`len:value`) before joining on '|', so a separator character
    * inside a value cannot alias a column boundary — ('a|b','c') and
    * ('a','b|c') hash differently. NULLs: concat_ws skips nulls, so
    * (NULL,'x') and ('x',NULL) would still collide — guard nullable
    * columns with an explicit sentinel cast first. One narrow scan + a
    * scalar aggregate; nothing shuffles but partial sums.
    */
  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val joined = cols
      .map(c => s"concat(CAST(length($c) AS STRING), ':', $c)")
      .mkString("concat_ws('|', ", ", ", ")")
    df.agg(
      count(lit(1)).cast("bigint").as("n_rows"),
      // coalesce: an empty table must fingerprint as '0', not NULL —
      // a NULL fp makes the equality check between two empty copies
      // evaluate to NULL instead of TRUE
      expr(s"CAST(coalesce(sum(CAST(graft_hash60($joined) AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS STRING)")
        .as("fp"))
  }
}

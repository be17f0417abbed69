package graft.sources

import org.apache.spark.sql.SparkSession

/** Managed-table hygiene for index tables the engine (re)builds: with the
  * in-memory catalog, a previous JVM's run leaves the warehouse LOCATION
  * behind while the catalog forgets the table, so the next saveAsTable
  * fails with LOCATION_ALREADY_EXISTS. Drop both the entry AND the dir
  * before rebuilding. (At cluster scale with a persistent metastore the
  * catalog and location agree and `mode("overwrite")` alone suffices —
  * this guard is for ephemeral-catalog deployments and local runs.)
  */
object Warehouse {
  def resetTable(spark: SparkSession, table: String): Unit = {
    // the name is interpolated into SQL and into the directory delete
    // below; a qualified (db.tbl) or path-like name would resolve to a
    // DIFFERENT location than <warehouse>/<table> and delete the wrong
    // directory — accept only simple unqualified identifiers
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"resetTable accepts only simple identifiers, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // derive from the session's actual warehouse config — a hardcoded
    // copy would silently delete the wrong dir if the config moved
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(s"$wh/$table")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        // listFiles is null on an unreadable dir or a concurrent delete —
        // degrade to the delete attempt rather than NPE mid-reset
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}

package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries: each key maps to a Spark
  * query over a fixture dir, and (when SQL-expressible) to an equivalent
  * DuckDB oracle statement. `SparkEntry` concatenates all packs. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** Keys may be a subset of `queries` — non-SQL-expressible operators get
    * the driver's weaker rows-only check. */
  def oracle: Map[String, String]
}

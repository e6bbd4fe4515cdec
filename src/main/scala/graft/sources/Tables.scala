package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table loaders + the document-envelope view.
  *
  * The reference engine's canonical relation is the Postgres table
  * `graph.index_documents` with columns
  * `(index, id, document JSONB, is_deleted, updated_at)`
  * (reference: flows/main_flow.py:319,337,607-609). Our harness maps that
  * envelope onto the driver's `events` fixture per /root/repo/FIXTURES.md:
  * `index ↔ event_type`, `id ↔ event_id::string`, `document ↔ props`,
  * `is_deleted ↔ (event_type = 'error')`, `updated_at ↔ ts`.
  *
  * All scans are plain parquet reads, so Catalyst predicate pushdown /
  * column pruning / partition pruning apply to every downstream operator.
  * At 100 TB the same code runs against a partitioned table (partition by
  * `idx`/date) — nothing here materializes or collects.
  */
object Tables {
  /** Column names of the document envelope ("idx" not "index": `index` is a
    * reserved word in several SQL dialects incl. the DuckDB oracle). */
  val Idx = "idx"
  val Id = "id"
  val Document = "document"
  val IsDeleted = "is_deleted"
  val UpdatedAt = "updated_at"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default; read it as epoch-nanos long and floor-divide to
    * microseconds (integer `div` — epoch nanos exceed 2^53, double math
    * would corrupt). Matches DuckDB's nanos→micros truncation, so oracle
    * comparisons stay exact. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .getOrElse(df)

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = {
    // conditional set: RuntimeConfig.set costs ~30ms per call (measured),
    // a real tax on query builders invoked in a loop
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // recover watermark pushdown through the nanos→micros derivation
    graft.plans.NanoWatermarkPushdown.install(spark)
    normalizeTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The document-envelope relation (reference flows/main_flow.py:319,337):
    * `idx STRING, id STRING, document STRING(json), is_deleted BOOLEAN,
    * updated_at TIMESTAMP`. Pure projection — stays inside the parquet
    * scan's whole-stage-codegen stage; pruning still reaches the scan.
    */
  def envelope(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as(Idx),
      col("event_id").cast("string").as(Id),
      col("props").as(Document),
      (col("event_type") === lit("error")).as(IsDeleted),
      col("ts").as(UpdatedAt))

  def envelope(spark: SparkSession, dir: String): DataFrame =
    envelope(events(spark, dir))

  /** The same envelope as a DuckDB CTE, so every oracle SQL shares one
    * definition with the Spark side. */
  val EnvelopeSql: String =
    """WITH env AS (
      |  SELECT event_type AS idx,
      |         CAST(event_id AS VARCHAR) AS id,
      |         props AS document,
      |         (event_type = 'error') AS is_deleted,
      |         ts AS updated_at
      |  FROM events
      |)""".stripMargin
}

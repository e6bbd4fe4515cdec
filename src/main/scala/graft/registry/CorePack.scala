package graft.registry

import graft.operators.IndexerOps
import graft.sources.Tables
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own operator inventory (SURVEY.md §2.1-§2.4, §2.6,
  * §2.10) over the document envelope. Reference citations live on the
  * `IndexerOps` implementations. */
object CorePack extends QueryPack {

  private def env(s: SparkSession, dir: String): DataFrame =
    Tables.envelope(s, dir)

  private val LiveIdx = Seq("click", "view", "purchase", "signup")
  private val AllIdx = Seq("click", "view", "purchase", "signup", "error")
  private val Cutoff = "2024-01-15 00:00:00"
  private val EarlyCutoff = "2024-01-03 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans & filters --------------------------------------------------
    "s1_full_sync_scan" -> ((s, dir) =>
      IndexerOps.fullSyncScan(env(s, dir), LiveIdx).orderBy(Idx, Id)),
    "s2_incremental_scan" -> ((s, dir) =>
      IndexerOps.incrementalScan(env(s, dir), AllIdx, Cutoff)
        .withColumn(UpdatedAt, date_format(col(UpdatedAt), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .orderBy(Idx, Id)),
    "a4_index_list" -> ((s, dir) => IndexerOps.indexList(env(s, dir)).orderBy(Idx)),
    // S5/P9/O2 — the ES probe read: one doc's nested field, limit 1
    // (reference flows/main_flow.py:56-63: size=1, _source projection)
    "s5_probe_read" -> ((s, dir) =>
      env(s, dir)
        .select(col(Id), get_json_object(col(Document), "$.k").as("k"))
        .orderBy(col(Id).cast("long")).limit(1)),
    "p8_json_path" -> ((s, dir) =>
      IndexerOps.jsonPath(env(s, dir), "$.k", "k").orderBy(Id)),

    // --- aggregates & ordering -------------------------------------------
    "a1_index_order" -> ((s, dir) => IndexerOps.indexOrder(env(s, dir))),
    "a2_live_count" -> ((s, dir) => IndexerOps.liveCount(env(s, dir), "click")),
    "a3_incremental_count" -> ((s, dir) =>
      IndexerOps.incrementalCount(env(s, dir), "purchase", Some(Cutoff))),
    "o4_largest_indexes" -> ((s, dir) => IndexerOps.largestIndexes(env(s, dir), 2)),

    // --- joins ------------------------------------------------------------
    "j1_schema_drift" -> ((s, dir) => {
      val e = env(s, dir)
      IndexerOps.schemaDrift(
        e.where(col(UpdatedAt) < lit(EarlyCutoff).cast("timestamp")),
        e.where(col(UpdatedAt) >= lit(EarlyCutoff).cast("timestamp")),
        "$.k")
    }),
    "j2_count_reconcile" -> ((s, dir) => {
      val e = env(s, dir)
      IndexerOps.countReconciliation(
        e.where(col(UpdatedAt) < lit(Cutoff).cast("timestamp") && !col(IsDeleted)),
        e)
    }),
    "j3_orphan_indexes" -> ((s, dir) => {
      val e = env(s, dir)
      IndexerOps.orphanIndexes(IndexerOps.physicalCatalog(e), IndexerOps.aliasCatalog(e))
        .orderBy("idx_name")
    }),
    "j4_duplicate_alias" -> ((s, dir) => {
      val e = env(s, dir)
      val phys = IndexerOps.physicalCatalog(e)
      val hist = IndexerOps.aliasHistogram(phys, IndexerOps.aliasCatalog(e))
      IndexerOps.duplicateAliasIndexes(phys, hist).orderBy("idx_name")
    }),

    // --- action routing & scalar functions --------------------------------
    "p10_actions" -> ((s, dir) =>
      IndexerOps.actionRouting(env(s, dir), "20240201")
        .orderBy("target_index", "doc_id")),
    // F1/F2/F3/F5/F6/F10/F11 in one projection (SURVEY.md §2.9)
    "f_scalar_suite" -> ((s, dir) =>
      env(s, dir).select(
        col(Id),
        lower(col(Idx)).as("idx_lower"),
        concat(col(Idx), lit("_"),
          date_format(col(UpdatedAt), "yyyy-MM-dd't'HH.mm.ss")).as("target_name"),
        length(col(Document)).as("doc_len"),
        get_json_object(col(Document), "$.k").as("k"),
        (col(Id).cast("long") % 10).as("id_mod"),
        round(get_json_object(col(Document), "$.k").cast("double") / 10).as("k_decile"))
        .orderBy(Id)),
    // T1/T3 — relational CDC merge: pre-cutoff live state + post-cutoff
    // batch (upserts & tombstone deletes) → new state
    "t1_cdc_merge" -> ((s, dir) => {
      val e = env(s, dir)
      IndexerOps.cdcMerge(
        e.where(col(UpdatedAt) < lit(Cutoff).cast("timestamp") && !col(IsDeleted)),
        e.where(col(UpdatedAt) >= lit(Cutoff).cast("timestamp")))
        .select(Idx, Id, Document)
        .orderBy(Idx, Id)
    }),
    // F4 — ",".join per index (ordered for determinism)
    "f4_csv_per_index" -> ((s, dir) =>
      env(s, dir).groupBy(Idx)
        .agg(concat_ws(",", sort_array(collect_list(col(Id)))).as("ids_csv"))
        .orderBy(Idx)),
  )

  private val E = Tables.EnvelopeSql

  def oracle: Map[String, String] = Map(
    "s1_full_sync_scan" ->
      s"""$E SELECT idx, id, document, is_deleted FROM env
         |WHERE idx IN ('click','view','purchase','signup') AND NOT is_deleted
         |ORDER BY idx, id""".stripMargin,
    "s2_incremental_scan" ->
      s"""$E SELECT idx, id, document, is_deleted,
         |  strftime(updated_at, '%Y-%m-%d %H:%M:%S.%f') AS updated_at
         |FROM env
         |WHERE idx IN ('click','view','purchase','signup','error')
         |  AND updated_at >= TIMESTAMP '$Cutoff'
         |ORDER BY idx, id""".stripMargin,
    "a4_index_list" ->
      s"$E SELECT DISTINCT idx FROM env WHERE idx IS NOT NULL ORDER BY idx",
    "s5_probe_read" ->
      s"""$E SELECT id, json_extract_string(document, '$$.k') AS k
         |FROM env ORDER BY CAST(id AS BIGINT) LIMIT 1""".stripMargin,
    "p8_json_path" ->
      s"""$E SELECT id, json_extract_string(document, '$$.k') AS k
         |FROM env ORDER BY id""".stripMargin,
    "a1_index_order" ->
      s"""$E SELECT idx, count(id) AS doc_count FROM env
         |WHERE idx IS NOT NULL GROUP BY idx ORDER BY doc_count, idx""".stripMargin,
    "a2_live_count" ->
      s"""$E SELECT count(id) AS doc_count FROM env
         |WHERE idx = 'click' AND NOT is_deleted""".stripMargin,
    "a3_incremental_count" ->
      s"""$E SELECT count(id) AS doc_count FROM env
         |WHERE idx = 'purchase' AND updated_at >= TIMESTAMP '$Cutoff'""".stripMargin,
    "o4_largest_indexes" ->
      s"""$E SELECT idx, count(id) AS doc_count FROM env
         |GROUP BY idx ORDER BY doc_count DESC, idx LIMIT 2""".stripMargin,
    "j1_schema_drift" ->
      s"""$E, stored AS (
         |  SELECT idx, arg_min(json_extract_string(document, '$$.k'), id) AS stored_name
         |  FROM env WHERE updated_at < TIMESTAMP '$EarlyCutoff' GROUP BY idx
         |), src AS (
         |  SELECT idx, arg_min(json_extract_string(document, '$$.k'), id) AS source_name
         |  FROM env WHERE updated_at >= TIMESTAMP '$EarlyCutoff' GROUP BY idx
         |)
         |SELECT COALESCE(stored.idx, src.idx) AS idx, stored_name, source_name
         |FROM stored FULL JOIN src ON stored.idx = src.idx
         |WHERE stored_name IS DISTINCT FROM source_name
         |ORDER BY idx""".stripMargin,
    "j2_count_reconcile" ->
      s"""$E, stored AS (
         |  SELECT idx, count(id) AS stored_count FROM env
         |  WHERE updated_at < TIMESTAMP '$Cutoff' AND NOT is_deleted GROUP BY idx
         |), src AS (
         |  SELECT idx, count(id) AS source_count FROM env
         |  WHERE NOT is_deleted GROUP BY idx
         |)
         |SELECT COALESCE(stored.idx, src.idx) AS idx, stored_count, source_count
         |FROM stored FULL JOIN src ON stored.idx = src.idx
         |WHERE stored_count IS DISTINCT FROM source_count
         |ORDER BY idx""".stripMargin,
    "j3_orphan_indexes" ->
      s"""$E, phys AS (
         |  SELECT DISTINCT idx || '_' || strftime(updated_at, '%Y-%m-%d') AS idx_name FROM env
         |), al AS (SELECT DISTINCT idx AS alias FROM env WHERE NOT is_deleted)
         |SELECT idx_name FROM phys
         |WHERE NOT EXISTS (SELECT 1 FROM al WHERE contains(idx_name, alias))
         |ORDER BY idx_name""".stripMargin,
    "j4_duplicate_alias" ->
      s"""$E, phys AS (
         |  SELECT DISTINCT idx || '_' || strftime(updated_at, '%Y-%m-%d') AS idx_name FROM env
         |), al AS (SELECT DISTINCT idx AS alias FROM env WHERE NOT is_deleted),
         |hist AS (
         |  SELECT alias, count(idx_name) AS n_indexes
         |  FROM phys JOIN al ON contains(idx_name, alias) GROUP BY alias
         |)
         |SELECT idx_name FROM phys
         |WHERE EXISTS (
         |  SELECT 1 FROM hist WHERE n_indexes > 1 AND contains(idx_name, alias))
         |ORDER BY idx_name""".stripMargin,
    "p10_actions" ->
      s"""$E SELECT idx || '_20240201' AS target_index, id AS doc_id,
         |  CASE WHEN is_deleted THEN 'delete' ELSE 'index' END AS op_type,
         |  CASE WHEN is_deleted THEN NULL ELSE document END AS source
         |FROM env ORDER BY target_index, doc_id""".stripMargin,
    "f_scalar_suite" ->
      s"""$E SELECT id,
         |  lower(idx) AS idx_lower,
         |  idx || '_' || strftime(updated_at, '%Y-%m-%dt%H.%M.%S') AS target_name,
         |  length(document) AS doc_len,
         |  json_extract_string(document, '$$.k') AS k,
         |  CAST(id AS BIGINT) % 10 AS id_mod,
         |  round(CAST(json_extract_string(document, '$$.k') AS DOUBLE) / 10) AS k_decile
         |FROM env ORDER BY id""".stripMargin,
    "t1_cdc_merge" ->
      s"""$E, cur AS (
         |  SELECT idx, id, document FROM env
         |  WHERE updated_at < TIMESTAMP '$Cutoff' AND NOT is_deleted
         |), batch AS (
         |  SELECT idx, id, document, is_deleted FROM env
         |  WHERE updated_at >= TIMESTAMP '$Cutoff'
         |)
         |SELECT idx, id, document FROM cur
         |WHERE id NOT IN (SELECT id FROM batch)
         |UNION ALL
         |SELECT idx, id, document FROM batch WHERE NOT is_deleted
         |ORDER BY idx, id""".stripMargin,
    "f4_csv_per_index" ->
      s"""$E SELECT idx, string_agg(id, ',' ORDER BY id) AS ids_csv
         |FROM env GROUP BY idx ORDER BY idx""".stripMargin,
  )
}

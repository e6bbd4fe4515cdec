package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog exposing an index store's live aliases as SQL tables —
  * the reference's alias read surface (`GET /<alias>/_search`,
  * flows/main_flow.py:496-506) as a first-class Spark catalog:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/path/to/store")
  *   spark.sql("SELECT * FROM graft.click WHERE id = '42'")
  * }}}
  *
  * Each `loadTable` re-reads the manifest and returns Spark's native
  * parquet [[ParquetTable]] over the alias's CURRENT physical dir, so:
  *  - filter/column pushdown work exactly as for any parquet scan (the
  *    scan builder IS the built-in one — nothing reimplemented);
  *  - an alias swap atomically repoints the next query (the K5 commit
  *    protocol's reader half), with no view re-registration step;
  *  - a table name is stable across blue/green publishes even though
  *    the physical dir changes every publish.
  *
  * The catalog is deliberately READ-ONLY: SQL writes would bypass the
  * store's staged-write + alias-swap commit protocol (and its retry /
  * quarantine semantics), so `createTable`/`dropTable` throw — mutations
  * go through [[graft.sync.IndexStore]] / [[graft.sync.SyncPipeline]].
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def aliases(): Map[String, String] = GraftCatalog.readAliases(root)

  /** Tables live in the catalog's single (empty or "default") namespace. */
  private def inScope(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (!inScope(namespace)) Array.empty
    else aliases().keys.toArray.sorted.map(Identifier.of(namespace, _))

  override def tableExists(ident: Identifier): Boolean =
    inScope(ident.namespace) && aliases().contains(ident.name)

  override def loadTable(ident: Identifier): Table = {
    val physical = aliases().filter(_ => inScope(ident.namespace)).getOrElse(ident.name,
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Array(catalogName) ++ ident.namespace ++ Array(ident.name)))
    val path = java.nio.file.Paths.get(root).resolve(physical).toString
    ParquetTable(
      s"$catalogName.${ident.name}",
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(path),
      userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat])
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "the graft catalog is read-only: publish through IndexStore's " +
      "staged-write + alias-swap commit protocol")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly

  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly

  override def dropTable(ident: Identifier): Boolean = readOnly

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly

  // --- namespaces (one flat namespace) ------------------------------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean = inScope(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (inScope(namespace)) Map.empty[String, String].asJava
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      Array(catalogName) ++ namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly
}

object GraftCatalog {
  /** Parse a store root's alias manifest (same format
    * [[graft.sync.IndexStore]] writes: one `alias=physical` per line).
    * Read fresh on every call — the manifest replace is atomic, so a
    * reader sees either the old or the new binding, never partial. */
  def readAliases(root: String): Map[String, String] = {
    val manifest = java.nio.file.Paths.get(root).resolve("_aliases.json")
    if (!java.nio.file.Files.exists(manifest)) Map.empty
    else java.nio.file.Files.readAllLines(manifest).asScala
      .filter(_.contains("=")).map { line =>
        val Array(a, p) = line.split("=", 2)
        a -> p
      }.toMap
  }
}

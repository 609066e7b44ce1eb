package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NonEmptyNamespaceException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal filesystem TableCatalog restoring the reference's 3-level
  * identifier surface (`bronze.db.orders` — DDL at
  * `/root/reference/src/main/scala/org/openprojectx/data/spark/bronze/KafkaAvroToIceberg.scala:79-89`,
  * catalog registration at
  * `/root/reference/src/main/resources/spark-defaults.properties:4-9`,
  * an Iceberg hadoop-warehouse catalog named `bronze`).
  *
  * Layout mirrors a hadoop-style warehouse: each table is
  * `<warehouse>/<namespace...>/<table>/` holding parquet files plus a
  * `_graft_schema.json` sidecar (the declared schema — V2 file tables
  * must not re-infer on every load, and an empty just-created table
  * has nothing to infer from). Reads and writes go through Spark's V2
  * parquet `FileTable`, so `CREATE TABLE bronze.db.orders`,
  * `INSERT INTO`, `spark.table("bronze.db.orders")` and
  * `DataFrameWriter.insertInto` all resolve against this catalog with
  * ordinary Catalyst planning (pushdown, pruning included).
  *
  * Register (spark-defaults shape, same keys as the reference):
  * {{{
  *   spark.sql.catalog.bronze = graft.catalog.BronzeCatalog
  *   spark.sql.catalog.bronze.warehouse = /path/to/warehouse
  * }}}
  */
class BronzeCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(
      options.getOrDefault("warehouse", s"spark-warehouse/$name"))
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  /** The effective warehouse root — the catalog instance is cached
    * per session on first use, so a caller's conf value may not be
    * the one in effect. */
  def warehouseDir: String = warehouse.toString

  /** Storage directory of an existing table — the hook fan-out
    * appends use to address a table's files directly. */
  def tableDir(namespace: Seq[String], name: String): String = {
    val ident = Identifier.of(namespace.toArray, name)
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    dir.toString
  }

  private val SchemaFile = "_graft_schema.json"

  private def dirOf(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(_.resolve(_))

  private def dirOf(ident: Identifier): Path =
    dirOf(ident.namespace).resolve(ident.name)

  private def isTableDir(p: Path): Boolean =
    Files.isRegularFile(p.resolve(SchemaFile))

  /** Children of `dir` (closing the listing stream — `Files.list`
    * holds a directory fd until closed). */
  private def children(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator.asScala.toSeq finally s.close()
  }

  // ---- tables -----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = dirOf(namespace)
    if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
    children(ns)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def loadTable(ident: Identifier): Table =
    loadSnapshot(ident, SnapshotLog.current(dirOf(ident).toString))

  /** `SELECT ... FROM bronze.db.t VERSION AS OF <n>` — Spark resolves
    * the version clause through this overload (the same hook Iceberg
    * implements). The returned table reads exactly snapshot `n`'s
    * file set; appends made after `n` are invisible. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val v =
      try version.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"bronze snapshot versions are numeric; got VERSION AS OF $version")
      }
    loadSnapshot(ident, Some(SnapshotLog.read(dir.toString, v)))
  }

  /** `TIMESTAMP AS OF` — `timestamp` arrives in MICROSECONDS since
    * the epoch (the V2 contract); resolves to the latest snapshot
    * committed at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val snap = SnapshotLog.asOfTimestamp(dir.toString, timestamp)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot of ${ident} at or before timestamp $timestamp us"))
    loadSnapshot(ident, Some(snap))
  }

  /** Build the table over one pinned snapshot (file-list read), or —
    * legacy dirs with no snapshot log — over the directory listing. */
  private def loadSnapshot(ident: Identifier,
      snap: Option[SnapshotLog.Snapshot]): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val schema = DataType.fromJson(
      Files.readString(dir.resolve(SchemaFile))).asInstanceOf[StructType]
    val fqn = (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")
    val parquet = snap match {
      case Some(s) => shim.parquetTableFiles(SparkSession.active, fqn,
        s.files.map(f => dir.resolve(f).toString), schema)
      case None => // legacy: listing-mode read, first commit will seed
        shim.parquetTable(SparkSession.active, fqn, dir.toString, Some(schema))
    }
    // V2 file tables only advertise batch read/write; the wrapper adds
    // the streaming write (stage-then-rename, epoch-idempotent) so the
    // reference's `writeStream...toTable("bronze.db.orders")` works
    new BronzeWritableTable(parquet, dir.toString)
  }

  /** Iceberg `rewrite_data_files` (OPTIMIZE): compact this table's
    * small files into ~`targetBytes` files, committed as one REPLACE
    * snapshot; old versions keep reading the originals until
    * [[vacuumTable]]. Returns (filesCompacted, filesCreated). */
  def optimizeTable(namespace: Seq[String], name: String,
      targetBytes: Long): (Int, Int) = {
    val dir = tableDir(namespace, name)
    // rewrite with the DECLARED schema: after ADD COLUMN a compaction
    // bin can mix pre- and post-evolution files, and schema inference
    // from one footer would drop the new column from the rewrite
    val declared = DataType.fromJson(
      Files.readString(Paths.get(dir).resolve(SchemaFile)))
      .asInstanceOf[StructType]
    SnapshotLog.optimize(SparkSession.active, dir, targetBytes,
      Some(declared))
  }

  /** Iceberg `expire_snapshots` + orphan-file removal (VACUUM): keep
    * the last `retainLast` snapshots, delete data files referenced by
    * none of them. Returns deleted file names. */
  def vacuumTable(namespace: Seq[String], name: String,
      retainLast: Int): Seq[String] =
    SnapshotLog.vacuum(tableDir(namespace, name), retainLast)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val provider = Option(properties.get(TableCatalog.PROP_PROVIDER))
    if (!provider.forall(_.equalsIgnoreCase("parquet")))
      throw new UnsupportedOperationException(
        s"$catalogName catalog stores parquet tables; got USING ${provider.get}")
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"$catalogName catalog does not support partition transforms")
    val dir = dirOf(ident)
    if (isTableDir(dir))
      throw new TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(SchemaFile), schema.json)
    // seed the snapshot log: v0 = empty table (legacy pre-log dirs
    // are still readable; they upgrade on their first commit instead)
    SnapshotLog.commit(dir.toString, "create")(_ => Set.empty)
    loadTable(ident)
  }

  /** Schema evolution, Iceberg-style: ADD COLUMN only (nullable,
    * appended at the end). Readers always apply the DECLARED schema,
    * so files written before the change — which lack the column —
    * surface NULLs for it (parquet reads missing columns as null);
    * no data file is rewritten. Anything that would change or drop
    * existing data (rename, type change, drop, reorder) stays
    * unsupported: bronze tables are append-only history. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val schema = DataType.fromJson(
      Files.readString(dir.resolve(SchemaFile))).asInstanceOf[StructType]
    val evolved = changes.foldLeft(schema) { (sch, change) =>
      change match {
        case add: TableChange.AddColumn =>
          if (add.fieldNames.length != 1)
            throw new UnsupportedOperationException(
              s"$catalogName catalog supports only top-level ADD COLUMN; " +
                s"got ${add.fieldNames.mkString(".")}")
          if (!add.isNullable)
            throw new UnsupportedOperationException(
              "added columns must be nullable: existing files have no " +
                "values for them")
          if (sch.fieldNames.exists(_.equalsIgnoreCase(add.fieldNames.head)))
            throw new IllegalArgumentException(
              s"column ${add.fieldNames.head} already exists")
          sch.add(add.fieldNames.head, add.dataType, nullable = true,
            Option(add.comment).getOrElse(""))
        case other =>
          throw new UnsupportedOperationException(
            s"$catalogName catalog tables are append-only; only ADD COLUMN " +
              s"is supported, got $other")
      }
    }
    Files.writeString(dir.resolve(SchemaFile), evolved.json)
    loadTable(ident)
  }

  private def deleteTree(dir: Path): Unit = {
    val s = Files.walk(dir)
    try s.sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.delete(p))
    finally s.close()
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTableDir(dir)) false
    else { deleteTree(dir); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!isTableDir(dirOf(oldIdent)))
      throw new NoSuchTableException(oldIdent)
    if (isTableDir(dirOf(newIdent)))
      throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(dirOf(newIdent).getParent)
    Files.move(dirOf(oldIdent), dirOf(newIdent))
  }

  // ---- namespaces -------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    children(warehouse)
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else {
      val ns = dirOf(namespace)
      if (!Files.isDirectory(ns)) throw new NoSuchNamespaceException(namespace)
      children(ns)
        .filter(p => Files.isDirectory(p) && !isTableDir(p))
        .map(p => namespace :+ p.getFileName.toString)
        .toArray
    }
  }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!Files.isDirectory(dirOf(namespace)))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    Files.createDirectories(dirOf(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName catalog namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val ns = dirOf(namespace)
    if (!Files.isDirectory(ns)) false
    else if (!cascade && children(ns).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    else { deleteTree(ns); true }
  }
}

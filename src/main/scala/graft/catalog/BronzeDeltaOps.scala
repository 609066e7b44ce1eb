package graft.catalog

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-ON-READ row-level UPDATE / MERGE INTO (and untranslatable-
  * predicate DELETE) for bronze snapshot tables — Iceberg v2's
  * POSITION DELTA writes (`write.update.mode` / `write.merge.mode` =
  * `merge-on-read`), the write-amplification fix for frequent small
  * updates at 100 TB, expressed through Spark's own DSv2 delta
  * machinery ([[SupportsDelta]] → the analyzer plans `WriteDelta`
  * instead of the group-based `ReplaceData`):
  *
  *   - the statement's output reaches the writer as a stream of
  *     per-row DELETEs (identified by the `(_file, _pos)` row id the
  *     scan spliced in) and INSERTs (full rows) — updates arrive
  *     split as delete+insert pairs
  *     (`representUpdateAsDeleteAndInsert`), so an update that moves
  *     a row across partition tuples routes its new version through
  *     the same fanout writer an append uses, automatically;
  *   - each task writes its deletes as ONE (file, pos) parquet
  *     sidecar and its inserts as ordinary staged data files; the
  *     driver commits everything as ONE `update`/`merge` snapshot
  *     that ATTACHES the sidecars to the (still live) targeted files
  *     and APPENDS the new files — O(changed rows) bytes written,
  *     no data file rewritten;
  *   - readers of that snapshot apply the sidecars (per-file
  *     skip-set readers — the documented MOR read tax), `VERSION AS
  *     OF` the pre-statement version still reads the old rows, the
  *     change feed emits exactly retractions+insertions
  *     (`update_before`/`update_after`), and OPTIMIZE purges the
  *     sidecars back to the vectorized path;
  *   - targets a concurrent commit rewrote fail the commit with
  *     `ConcurrentModificationException` (positions were computed
  *     against stale bytes); `spark.graft.rowLevelIsolation=
  *     serializable` additionally fails when files appended after
  *     the scan contain predicate-matching rows.
  *
  * Scan-cost shape: UPDATE/DELETE predicates prune candidate files
  * against the manifest stats/partition tuples (metadata only) before
  * any row is read. MERGE reads the target once for its join — Spark
  * 4.x's runtime group filtering only narrows group-based
  * (copy-on-write) plans, the same trade Iceberg's position-delta
  * merge makes; workloads where the source touches few files keep
  * `spark.graft.mergeMode=copy-on-write` for runtime file narrowing,
  * frequent wide small-delta merges flip to merge-on-read.
  */
final class BronzeDeltaRowLevelOperation(dir: String, declared: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation
    with SupportsDelta {

  /** (scanned snapshot version, static predicate if translatable) —
    * for the optional SERIALIZABLE late-append validation; see
    * [[BronzeRowLevelOperation]]'s twin fields. */
  @volatile private var scannedVersion: Long = -1L
  @volatile private var scanPredicate
    : Option[org.apache.spark.sql.Column] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"BronzeDeltaRowLevel(${cmd.toString.toLowerCase}, $dir)"

  /** The row identity deletes retract by — exactly what a
    * position-delete sidecar stores. Both are metadata columns the
    * per-file readers splice in. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))

  /** Updates arrive split as delete+insert: the insert half routes
    * through the partition fanout writer like any append, so updates
    * that move rows across partition tuples need no special casing. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private var captured: Array[Filter] = Array.empty
      private var required: StructType = declared

      // candidate-file pruning only: the predicate prunes against
      // manifest stats/tuples, but every filter reports back as
      // post-scan (the per-file readers don't evaluate predicates;
      // Spark re-applies them above the scan)
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        captured = filters
        filters
      }
      override def pushedFilters(): Array[Filter] = Array.empty

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = {
        val snap = SnapshotLog.current(dir).getOrElse(
          throw new UnsupportedOperationException(
            s"row-level operations need a snapshot-logged table: $dir"))
        scannedVersion = snap.version
        val conds = captured.map(BronzeRowDelete.translate)
        scanPredicate =
          if (captured.isEmpty || conds.exists(_.isEmpty)) None
          else Some(conds.flatten.reduce(_ && _))
        // manifest-scale candidate pruning: stats + partition tuples,
        // no data pages read (files the predicate can't match never
        // reach the join/filter above)
        val partSpec = BronzePartitioning.readAll(Paths.get(dir))
        val candidates =
          if (captured.isEmpty) snap.entries
          else BronzePruning.survivors(snap.entries, declared,
            captured.toIndexedSeq, partSpec)
        val delsOf: String => Seq[String] = {
          val byName = snap.entriesByName
          f => byName.get(f).map(_.deletes).getOrElse(Seq.empty)
        }
        val eqOf: String => Seq[String] = {
          val byName = snap.entriesByName
          f => byName.get(f).map(e => snap.eqDeletesFor(e).map(_.name))
            .getOrElse(Seq.empty)
        }
        // per-file readers: splice (_file, _pos) row ids, apply
        // existing position AND equality deletes (an already-
        // retracted row must not match again)
        new BronzeCowFileScan(dir, candidates.map(_.name), required,
          _ => (), delsOf, label = "delta", eqOf = eqOf)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = {
          val confs = shim.parquetWriterConfs(SparkSession.active)
          new BronzeDeltaBatchWrite(dir, declared, info.queryId(), confs,
            cmd.toString.toLowerCase, () => (scannedVersion, scanPredicate))
        }
      }
    }
}

/** A delta task's commit message: staged insert files plus the
  * task's staged position-delete sidecar (absent when the task
  * deleted nothing) and the data-file names it targets. */
private final case class DeltaStaged(inserts: Seq[StagedEntry],
    sidecarStaged: Option[String], sidecarDest: Option[String],
    targets: Seq[String]) extends WriterCommitMessage

private final class BronzeDeltaBatchWrite(dir: String, schema: StructType,
    queryId: String, writerConfs: Map[String, String], operation: String,
    scanInfo: () => (Long, Option[org.apache.spark.sql.Column]))
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    // partition spec resolved DRIVER-side; the factory ships plain
    // serializable state to executors
    new BronzeDeltaWriterFactory(dir, schema, queryId, writerConfs,
      BronzePartitioning.read(Paths.get(dir)))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val deltas = messages.collect { case d: DeltaStaged => d }
    // move inserts into place (same protocol as a batch append)
    val inserts = deltas.flatMap(_.inserts)
    inserts.foreach { f =>
      Files.move(Paths.get(f.staged), Paths.get(f.dest),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val added = inserts.map(f => Paths.get(f.dest).getFileName.toString)
    val parts = inserts.filter(_.parts.nonEmpty)
      .map(f => Paths.get(f.dest).getFileName.toString -> f.parts).toMap
    // move sidecars into place and build the attach map:
    // targeted data file -> the sidecars that list positions in it
    val attach = scala.collection.mutable.Map.empty[String, Vector[String]]
    deltas.foreach { d =>
      for (staged <- d.sidecarStaged; dest <- d.sidecarDest) {
        Files.move(Paths.get(staged), Paths.get(dest),
          StandardCopyOption.REPLACE_EXISTING)
        val name = Paths.get(dest).getFileName.toString
        d.targets.foreach { t =>
          attach(t) = attach.getOrElse(t, Vector.empty) :+ name
        }
      }
    }
    // a statement that touched nothing commits nothing; one that only
    // INSERTED (merge with no matches) commits as an append — it IS
    // one, and streaming/incremental consumers may cross it
    if (attach.isEmpty && added.isEmpty) return
    if (attach.isEmpty) {
      SnapshotLog.commit(dir, "append", parts)(parent =>
        parent ++ added)
      return
    }
    val spark = SparkSession.active
    if (graft.GraftConf.string(spark, graft.GraftConf.RowLevelIsolationKey,
      "snapshot") == "serializable") {
      val (scannedV, pred) = scanInfo()
      SnapshotLog.commitDelta(dir, operation, attach.toMap.map {
        case (k, v) => k -> (v: Seq[String])
      }, added.toIndexedSeq, parts, scannedV, lateFiles => pred match {
        case Some(c) => spark.read.schema(schema)
          .parquet(lateFiles.map(f => s"$dir/$f"): _*)
          .filter(c)
          .select(col("_metadata.file_name")).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        case None => lateFiles // MERGE: conservative, any late append
      })
    } else
      SnapshotLog.commitDelta(dir, operation, attach.toMap.map {
        case (k, v) => k -> (v: Seq[String])
      }, added.toIndexedSeq, parts)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case DeltaStaged(ins, sc, _, _) =>
        ins.foreach(f => Files.deleteIfExists(Paths.get(f.staged)))
        sc.foreach(p => Files.deleteIfExists(Paths.get(p)))
      case _ => ()
    }
    Seq(s".batch-q$queryId-", s".delta-del-q$queryId-").foreach { prefix =>
      val listing = Files.list(Paths.get(dir))
      try listing.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith(prefix))
          Files.deleteIfExists(p)
      } finally listing.close()
    }
  }
}

private final class BronzeDeltaWriterFactory(dir: String,
    schema: StructType, queryId: String, writerConfs: Map[String, String],
    partSpec: Seq[BronzePartitioning.PartField])
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new BronzeDeltaWriter(dir, schema, partitionId, taskId, queryId,
      writerConfs, partSpec)
}

/** Executor-side delta writer: inserts fan out through the same
  * partition-aware writer an append uses; deletes stream into one
  * (file, pos) sidecar per task. Both stage attempt-unique and move
  * into place only at driver commit. */
private final class BronzeDeltaWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long, queryId: String,
    writerConfs: Map[String, String],
    partSpec: Seq[BronzePartitioning.PartField])
    extends DeltaWriter[InternalRow] {

  private val insertWriter = new BronzeBatchDataWriter(dir, schema,
    partitionId, taskId, queryId, writerConfs, partSpec)

  private val sidecarStaged =
    s"$dir/.delta-del-q$queryId-p$partitionId-t$taskId.parquet"
  private val sidecarDest =
    s"$dir/del-delta-q$queryId-p$partitionId.parquet"
  private var sidecarWriter
    : org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private val targets = scala.collection.mutable.LinkedHashSet.empty[String]
  private val sidecarRow = new GenericInternalRow(2)

  /** `id` = the rowId projection, in [[BronzeDeltaRowLevelOperation
    * .rowId]] order: (_file full path, _pos). Sidecars store file
    * NAMES (flat table dir), so strip the path here. */
  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (sidecarWriter == null)
      sidecarWriter = shim.rowParquetWriter(sidecarStaged,
        MorDeletes.DeleteSchema, writerConfs)
    val path = id.getUTF8String(0).toString
    val name = MorDeletes.fileNameOf(path)
    targets += name
    sidecarRow.update(0,
      org.apache.spark.unsafe.types.UTF8String.fromString(name))
    sidecarRow.update(1, id.getLong(1))
    sidecarWriter.write(sidecarRow)
  }

  override def insert(row: InternalRow): Unit = insertWriter.write(row)

  // defensive: with representUpdateAsDeleteAndInsert=true Spark never
  // routes updates here, but the split IS the semantics either way
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val ins = insertWriter.commit() match {
      case StagedFiles(fs) => fs
      case _ => Seq.empty
    }
    if (sidecarWriter != null) sidecarWriter.close()
    DeltaStaged(ins,
      if (targets.nonEmpty) Some(sidecarStaged) else None,
      if (targets.nonEmpty) Some(sidecarDest) else None,
      targets.toSeq)
  }

  override def abort(): Unit = {
    insertWriter.abort()
    if (sidecarWriter != null) sidecarWriter.close()
    Files.deleteIfExists(Paths.get(sidecarStaged))
  }

  override def close(): Unit = ()
}

package graft.catalog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** CHANGE-DATA-FEED read off the snapshot log — the CDC tail of a
  * bronze table, resolved Iceberg-metadata-table-style as a nested
  * name: `spark.readStream.table("bronze.db.orders.changes")`. Each
  * row of the feed is a table row plus two metadata columns:
  *
  *   - `_change_type`: `insert` / `delete` / `update_before` /
  *     `update_after` (the Debezium/Flink changelog vocabulary);
  *   - `_commit_version`: the snapshot that produced the change.
  *
  * Offsets are snapshot versions (same checkpoint/restart semantics
  * as the plain streaming read); each micro-batch walks the snapshots
  * in (from, to] and emits, per snapshot, the rows of the files the
  * commit ADDED and REMOVED relative to its parent:
  *
  *   | operation        | removed files        | added files     |
  *   |------------------|----------------------|-----------------|
  *   | append / create  | (none)               | insert          |
  *   | delete           | delete               | insert          |
  *   | update / merge   | update_before        | update_after    |
  *   | replace / alter  | (no rows — layout/metadata only)       |
  *
  * These are KEYLESS copy-on-write changelog semantics — exactly what
  * Iceberg's base changelog scan emits for a COW table: a rewritten
  * file's surviving rows appear as a retraction/addition pair
  * ("carryovers") that cancel under retraction consumption, so any
  * consumer that treats `delete`/`update_before` as -1 and
  * `insert`/`update_after` as +1 reproduces NET state deltas exactly
  * (the st13 gate hash-checks this against an independent SQL
  * derivation). Pairing befores to afters per key is a downstream,
  * key-aware post-process (Iceberg's `compute_updates`), deliberately
  * not done here — the table declares no primary key. Unlike the
  * plain streaming read, a REPLACE (compaction) snapshot emits
  * NOTHING instead of refusing: the rewrite-validated commit
  * guarantees it changed layout, never rows, so the CDC stream sails
  * across compactions.
  *
  * Cost shape at 100 TB: each micro-batch reads only the files the
  * walked commits touched — the same bytes the copy-on-write
  * operation itself wrote/retired, never the table.
  */
object BronzeChangeFeed {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** The nested-name suffix: `bronze.db.<table>.changes`. */
  val NameSuffix = "changes"

  def feedSchema(declared: StructType): StructType =
    declared.add(ChangeTypeCol, StringType, nullable = false)
      .add(CommitVersionCol, LongType, nullable = false)

  def table(name: String, dir: String, declared: StructType): Table =
    new BronzeChangeFeedTable(name, dir, declared)

  /** The per-snapshot change partitions of versions in (from, to] —
    * shared by the streaming source (one micro-batch's walk) and the
    * batch changelog scan (Iceberg's `create_changelog_view` shape).
    * See the class doc for the operation → change-type mapping. */
  private def versionSetOf(dir: String): Set[Long] =
    SnapshotLog.versions(dir).toSet

  private[catalog] def changePartitions(dir: String, from: Long,
      to: Long): Array[InputPartition] = {
    if (from >= to) return Array.empty
    // Vacuum + tag retention can leave INTERIOR gaps in the version
    // sequence (a tagged island below the horizon, expired versions
    // after it). A gap version's changes — and the parent manifest
    // the NEXT version diffs against — are unrecoverable; refuse with
    // the retained set instead of a bare missing-manifest error.
    val have = versionSetOf(dir)
    ((from + 1) to to).foreach { v =>
      if (!have.contains(v) || (v - 1 >= 0 && !have.contains(v - 1)))
        throw new IllegalStateException(
          s"change feed on $dir: snapshot v$v or its parent was " +
            "vacuum-expired; changes below the retention horizon are " +
            "unrecoverable — restart from a retained contiguous " +
            s"version (retained: ${have.toSeq.sorted.mkString(", ")})")
    }
    val parts = Seq.newBuilder[InputPartition]
    ((from + 1) to to).foreach { v =>
      val snap = SnapshotLog.read(dir, v)
      val parentSnap: Option[SnapshotLog.Snapshot] =
        if (v == 0) None else Some(SnapshotLog.read(dir, v - 1))
      val parentEntries: Map[String, SnapshotLog.FileEntry] =
        parentSnap.map(_.entriesByName).getOrElse(Map.empty)
      val curEntries = snap.entriesByName
      val parentFiles = parentEntries.keySet
      val files = snap.files.toSet
      val added = (files -- parentFiles).toSeq.sorted
      val removed = (parentFiles -- files).toSeq.sorted
      // a removed file's retraction must SKIP its merge-on-read
      // deleted positions AND its parent-applicable EQUALITY deletes —
      // those rows were already retracted when the sidecar landed; an
      // ADDED file skips its CURRENT entry's deletes and the current
      // snapshot's applicable equality sidecars (a rollback can
      // restore a file together with the sidecars of its era; for a
      // genuinely new file no equality sidecar applies, because a
      // sidecar only matches files with a strictly OLDER data
      // sequence)
      def emit(names: Seq[String], changeType: String,
          applyParentDels: Boolean): Unit =
        names.foreach { f =>
          val (dels, eqs) =
            if (applyParentDels) {
              val pe = parentEntries.get(f)
              (pe.map(_.deletes).getOrElse(Seq.empty),
                pe.flatMap(e => parentSnap.map(_.eqDeletesFor(e)))
                  .getOrElse(Seq.empty))
            } else {
              val ce = curEntries.get(f)
              (ce.map(_.deletes).getOrElse(Seq.empty),
                ce.map(snap.eqDeletesFor).getOrElse(Seq.empty))
            }
          parts += BronzeCdcFilePartition(s"$dir/$f", changeType, v,
            dels.map(s => s"$dir/$s"),
            applyEqSidecars = eqs.map(d => s"$dir/${d.name}"))
        }
      // MERGE-ON-READ delta on SURVIVING files: sidecars attached at
      // this version retract exactly their listed positions; sidecars
      // DETACHED (rollback across a MOR delete) re-insert theirs.
      // Both branches filter through the era-appropriate EQUALITY
      // sidecars — rows the parent state already retracted by key
      // must not re-retract, and rows the current state retracts by
      // key must not re-insert (a rollback across
      // convert_equality_deletes detaches a position sidecar whose
      // rows are exactly the restored key sets' victims).
      def emitMorDelta(retractType: String): Unit =
        (files & parentFiles).toSeq.sorted.foreach { f =>
          val before = parentEntries(f).deletes
          val after = curEntries(f).deletes
          val attached = after.diff(before)
          val detached = before.diff(after)
          if (attached.nonEmpty)
            parts += BronzeCdcFilePartition(s"$dir/$f", retractType, v,
              before.map(s => s"$dir/$s"),
              attached.map(s => s"$dir/$s"),
              applyEqSidecars = parentSnap
                .map(_.eqDeletesFor(parentEntries(f)))
                .getOrElse(Seq.empty).map(d => s"$dir/${d.name}"))
          if (detached.nonEmpty)
            parts += BronzeCdcFilePartition(s"$dir/$f", "insert", v,
              after.map(s => s"$dir/$s"),
              detached.map(s => s"$dir/$s"),
              applyEqSidecars = snap.eqDeletesFor(curEntries(f))
                .map(d => s"$dir/${d.name}"))
        }
      // EQUALITY-delete delta on surviving pre-existing files:
      // sidecars ADDED at this version (an upsert's retraction half)
      // retract every still-live matching row of files with an
      // earlier data sequence; sidecars REMOVED (rollback across an
      // upsert) re-insert theirs. Rows are filtered to what the
      // PARENT state still showed — so nothing double-retracts — AND
      // through the UNION of the parent's and current entry's
      // position sidecars: a position listed on EITHER side of this
      // commit is owned by emitMorDelta's attached/detached branches
      // (a rollback can detach a position sidecar and remove an
      // equality sidecar covering the SAME row in one commit; with
      // only the current-side skip set the row would re-insert once
      // through each delta — the symmetric double-retract is
      // reachable via chained rollbacks).
      def emitEqDelta(retractType: String): Unit = {
        val parentEq = parentSnap.map(_.eqDeletes).getOrElse(Seq.empty)
        val addedEq = snap.eqDeletes.diff(parentEq)
        val removedEq = parentEq.diff(snap.eqDeletes)
        if (addedEq.isEmpty && removedEq.isEmpty) return
        (files & parentFiles).toSeq.sorted.foreach { f =>
          val pe = parentEntries(f)
          val fileSeq = pe.seq.getOrElse(Long.MinValue)
          val appAdded = addedEq.filter(_.seq > fileSeq)
          val appRemoved = removedEq.filter(_.seq > fileSeq)
          val posUnion = (pe.deletes ++ curEntries(f).deletes)
            .distinct.map(s => s"$dir/$s")
          if (appAdded.nonEmpty)
            parts += BronzeCdcFilePartition(s"$dir/$f", retractType, v,
              posUnion, Seq.empty,
              applyEqSidecars = parentSnap.map(_.eqDeletesFor(pe))
                .getOrElse(Seq.empty).map(d => s"$dir/${d.name}"),
              emitOnlyEqSidecars = appAdded.map(d => s"$dir/${d.name}"))
          if (appRemoved.nonEmpty)
            parts += BronzeCdcFilePartition(s"$dir/$f", "insert", v,
              posUnion, Seq.empty,
              applyEqSidecars = snap.eqDeletesFor(curEntries(f))
                .map(d => s"$dir/${d.name}"),
              emitOnlyEqSidecars = appRemoved.map(d => s"$dir/${d.name}"))
        }
      }
      snap.operation match {
        // a PUBLISH (fast-forwarded write-audit-publish branch) is a
        // pure append relative to its parent by construction
        case "append" | "create" | "publish" => emit(added, "insert",
          applyParentDels = false)
        case "delete" =>
          emit(removed, "delete", applyParentDels = true)
          emit(added, "insert", applyParentDels = false)
          emitMorDelta("delete")
          emitEqDelta("delete") // equality fast-path DELETE sidecars
        case "update" | "merge" =>
          emit(removed, "update_before", applyParentDels = true)
          emit(added, "update_after", applyParentDels = false)
          emitMorDelta("update_before")
        // a keyed upsert: the appended files are the new row
        // versions, the attached equality-delete sidecar retracts
        // the old versions by key. A crash-REPLAYED upsert epoch's
        // manifest swap can also REMOVE the failed attempt's files —
        // retract them like an update's before-image, else the
        // replay double-counts every row of the epoch.
        case "upsert" =>
          emit(removed, "update_before", applyParentDels = true)
          emit(added, "update_after", applyParentDels = false)
          emitMorDelta("update_before")
          emitEqDelta("update_before")
        // a rollback's net effect IS its file diff: rows of the
        // undone commits retract, restored rows re-insert — and a
        // rollback across a MOR delete (or upsert) re-inserts the
        // un-deleted positions/keys via the detached-sidecar deltas
        case "rollback" =>
          emit(removed, "delete", applyParentDels = true)
          emit(added, "insert", applyParentDels = false)
          emitMorDelta("delete")
          emitEqDelta("delete")
        case "replace" | "alter" => () // layout/metadata only: no rows
        case other => throw new IllegalStateException(
          s"change feed on $dir: unknown snapshot operation '$other' " +
            s"at v$v; refusing to guess its change semantics")
      }
    }
    parts.result().toArray
  }
}

private final class BronzeChangeFeedTable(tableName: String, dir: String,
    declared: StructType) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = BronzeChangeFeed.feedSchema(declared)

  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability]()
    caps.add(TableCapability.MICRO_BATCH_READ)
    caps.add(TableCapability.BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType =
          BronzeChangeFeed.feedSchema(declared)
        override def description(): String =
          s"bronze change feed $dir (version-per-offset CDC)"
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new BronzeCdcMicroBatchStream(dir, declared,
            Option(options.get("startingVersion")).getOrElse("latest"),
            Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
        // BATCH changelog scan (Iceberg's `create_changelog_view`):
        // the changes of versions in (startingVersion, endingVersion],
        // default full history to current — one-shot CDC audits and
        // backfills without a streaming checkpoint.
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            private val to =
              Option(options.get("endingVersion")).map(_.toLong)
                .orElse(SnapshotLog.currentVersion(dir)).getOrElse(
                  throw new IllegalStateException(
                    s"change-feed read requires a snapshot-logged " +
                      s"table: $dir"))
            private val from =
              Option(options.get("startingVersion")) match {
                case Some("latest") => throw new IllegalArgumentException(
                  "batch change-feed read: startingVersion must be a " +
                    "version number or tag name (or absent = full " +
                    "history), not 'latest'")
                case Some(v) => v.toLongOption
                  .orElse(SnapshotLog.resolveTag(dir, v))
                  .getOrElse(throw new IllegalArgumentException(
                    s"startingVersion: not a version number and no " +
                      s"such tag: $v"))
                case None => -1L // full history incl. v0
              }
            override def planInputPartitions(): Array[InputPartition] = {
              require(from <= to,
                s"startingVersion $from is ahead of endingVersion $to")
              BronzeChangeFeed.changePartitions(dir, from, to)
            }
            override def createReaderFactory(): PartitionReaderFactory =
              new BronzeCdcReaderFactory(declared.json)
          }
      }
    }
}

/** Version-offset micro-batch stream of change rows. Admission
  * control and Trigger.AvailableNow semantics mirror
  * [[BronzeMicroBatchStream]]: `maxVersionsPerTrigger` bounds how many
  * snapshots one batch walks, and the available-now target is pinned
  * at query start so the trigger terminates under concurrent writes. */
private final class BronzeCdcMicroBatchStream(dir: String,
    declared: StructType, startingVersion: String,
    maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = SnapshotLog.currentVersion(dir)

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(ReadLimit.maxRows)
      .getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset =
    CdcVersionOffset(SnapshotLog.currentVersion(dir).getOrElse(-1L))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcVersionOffset].v
    val target = availableNowTarget
      .orElse(SnapshotLog.currentVersion(dir)).getOrElse(-1L)
    limit match {
      case r: ReadMaxRows => // rows == versions for this source
        CdcVersionOffset(math.min(target, from + r.maxRows()))
      case _ => CdcVersionOffset(target)
    }
  }

  override def initialOffset(): Offset = {
    val cur = SnapshotLog.currentVersion(dir).getOrElse(
      throw new IllegalStateException(
        s"change-feed read requires a snapshot-logged table: $dir"))
    startingVersion match {
      case "latest" => CdcVersionOffset(cur)
      case v =>
        // number, or a snapshot TAG name — "stream the changes made
        // SINCE the tagged state" (tag exclusive, like any offset)
        val n = v.toLongOption
          .orElse(SnapshotLog.resolveTag(dir, v))
          .getOrElse(throw new IllegalArgumentException(
            s"startingVersion must be 'latest', a version number, or " +
              s"a tag name; got $v"))
        require(n <= cur, s"startingVersion $n is ahead of the table ($cur)")
        CdcVersionOffset(n)
    }
  }

  override def latestOffset(): Offset =
    CdcVersionOffset(SnapshotLog.currentVersion(dir).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    CdcVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] =
    BronzeChangeFeed.changePartitions(dir,
      start.asInstanceOf[CdcVersionOffset].v,
      end.asInstanceOf[CdcVersionOffset].v)

  override def createReaderFactory(): PartitionReaderFactory =
    new BronzeCdcReaderFactory(declared.json)

  override def commit(end: Offset): Unit = () // checkpoint owns progress
  override def stop(): Unit = ()
}

/** Version-number offset; json is just the number (same wire format
  * as the plain streaming read, so offsets stay human-auditable). */
private final case class CdcVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** `applySidecars`: position deletes to SKIP (rows already retracted
  * by earlier snapshots); `emitOnlySidecars`: when non-empty, emit
  * ONLY the positions those sidecars list (a merge-on-read delta —
  * the rows a delete sidecar retracts, or a rollback re-inserts).
  * `applyEqSidecars` / `emitOnlyEqSidecars`: the same pair for
  * EQUALITY deletes, matched on the sidecars' key columns instead of
  * positions (an upsert's retraction half). */
private final case class BronzeCdcFilePartition(path: String,
    changeType: String, version: Long,
    applySidecars: Seq[String] = Seq.empty,
    emitOnlySidecars: Seq[String] = Seq.empty,
    applyEqSidecars: Seq[String] = Seq.empty,
    emitOnlyEqSidecars: Seq[String] = Seq.empty) extends InputPartition

private final class BronzeCdcReaderFactory(declaredJson: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[BronzeCdcFilePartition]
    new BronzeCdcFileReader(part.path,
      org.apache.spark.sql.types.DataType.fromJson(declaredJson)
        .asInstanceOf[StructType],
      part.changeType, part.version, part.applySidecars,
      part.emitOnlySidecars, part.applyEqSidecars,
      part.emitOnlyEqSidecars)
  }
}

/** Reads one data file with the DECLARED schema and appends the
  * constant (_change_type, _commit_version) pair to every row. */
private final class BronzeCdcFileReader(path: String, declared: StructType,
    changeType: String, version: Long,
    applySidecars: Seq[String] = Seq.empty,
    emitOnlySidecars: Seq[String] = Seq.empty,
    applyEqSidecars: Seq[String] = Seq.empty,
    emitOnlyEqSidecars: Seq[String] = Seq.empty)
    extends PartitionReader[InternalRow] {

  private val reader = shim.vectorizedRowFileReader(path, declared)
  private val typeUtf8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(changeType)
  private val fileName = MorDeletes.fileNameOf(path)
  private val skip: java.util.HashSet[java.lang.Long] =
    if (applySidecars.isEmpty) null
    else MorDeletes.skipSet(applySidecars, fileName)
  private val emitOnly: java.util.HashSet[java.lang.Long] =
    if (emitOnlySidecars.isEmpty) null
    else MorDeletes.skipSet(emitOnlySidecars, fileName)
  private val applyEq: Seq[MorDeletes.EqKeySet] =
    if (applyEqSidecars.isEmpty) Seq.empty
    else MorDeletes.eqKeySets(applyEqSidecars)
  private val emitOnlyEq: Seq[MorDeletes.EqKeySet] =
    if (emitOnlyEqSidecars.isEmpty) Seq.empty
    else MorDeletes.eqKeySets(emitOnlyEqSidecars)
  // key-column ordinals resolve against the DECLARED schema (the CDC
  // reader always reads whole rows) — precomputed once, not a
  // name->ordinal lookup per key column per row in the hot loop
  private val applyEqIdx: Seq[Array[Int]] =
    applyEq.map(_.cols.map(declared.fieldIndex).toArray)
  private val emitOnlyEqIdx: Seq[Array[Int]] =
    emitOnlyEq.map(_.cols.map(declared.fieldIndex).toArray)
  private def keyOf(idx: Array[Int], r: InternalRow): Seq[Any] =
    idx.toSeq.map { i =>
      if (r.isNullAt(i)) null
      else MorDeletes.normKey(r.get(i, declared(i).dataType))
    }
  private var pos = -1L
  private var current: InternalRow = _

  private def visible(): Boolean =
    (skip == null || !skip.contains(pos)) &&
      (emitOnly == null || emitOnly.contains(pos)) &&
      applyEq.indices.forall(s =>
        !applyEq(s).keys.contains(keyOf(applyEqIdx(s), current))) &&
      (emitOnlyEq.isEmpty ||
        emitOnlyEq.indices.exists(s =>
          emitOnlyEq(s).keys.contains(keyOf(emitOnlyEqIdx(s), current))))

  override def next(): Boolean = {
    current = reader.read()
    pos += 1
    while (current != null && !visible()) {
      current = reader.read()
      pos += 1
    }
    current != null
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](declared.length + 2)
    var i = 0
    while (i < declared.length) {
      // the materializer reuses its row between read() calls — the
      // GenericInternalRow copy below extracts values out of it
      vals(i) =
        if (current.isNullAt(i)) null
        else InternalRow.copyValue(current.get(i, declared(i).dataType))
      i += 1
    }
    vals(declared.length) = typeUtf8
    vals(declared.length + 1) = version
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}

package graft.catalog

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import graft.catalog.SnapshotLog.FileEntry
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-ON-READ row-level deletes (Iceberg v2's position-delete
  * files) for bronze snapshot tables — the write-amplification fix
  * for frequent small DELETEs at 100 TB:
  *
  *   - instead of rewriting every file containing a match
  *     (copy-on-write), the delete writes ONE parquet sidecar of
  *     (file, pos) rows — O(|deleted rows|) bytes — and commits a
  *     `delete` snapshot that ATTACHES the sidecar to the targeted
  *     files' manifest entries; file set unchanged;
  *   - readers of that snapshot (and later ones) SKIP the listed
  *     positions; earlier snapshots never see the sidecar, so time
  *     travel to the pre-delete version still reads the rows;
  *   - OPTIMIZE purges: compaction rewrites delete-carrying files with
  *     positions applied, and the fresh entries carry no refs — the
  *     table returns to the fast vectorized scan path;
  *   - position computation and the rewrite paths ride Spark's
  *     `_metadata.row_index` / anti-join machinery (plan-level,
  *     vectorized); only the FINAL table read of a delete-carrying
  *     snapshot drops to the row-based per-file readers, the
  *     documented MOR read tax until the next compaction.
  *
  * Mode dial: `spark.graft.deleteMode` = `copy-on-write` (default) |
  * `merge-on-read`, the same per-table choice Iceberg exposes as
  * `write.delete.mode`.
  */
object BronzeMor {

  def hasDeletes(entries: Seq[FileEntry]): Boolean =
    entries.exists(_.deletes.nonEmpty)

  /** (file, pos) of every CURRENTLY-LIVE row of `files` matching
    * `cond` — existing position AND equality deletes are anti-joined
    * away, so re-deleting an already-deleted row is a no-op (and the
    * CDC feed never double-emits). */
  def matchingPositions(spark: SparkSession, dir: String,
      schema: StructType, entries: Seq[FileEntry],
      cond: Column,
      eqDeletes: Seq[SnapshotLog.EqDelete] = Seq.empty): DataFrame = {
    val groups: Seq[(Seq[SnapshotLog.EqDelete], Seq[FileEntry])] =
      entries.groupBy(e =>
        eqDeletes.filter(_.seq > e.seq.getOrElse(Long.MinValue)))
        .toSeq.sortBy(_._2.map(_.name).min)
    val raw = groups.map { case (dels, group) =>
      val base = spark.read.schema(schema)
        .parquet(group.map(e => s"$dir/${e.name}"): _*)
        .filter(cond)
      dels.foldLeft(base) { (df, d) =>
        val keys = spark.read.parquet(s"$dir/${d.name}")
        val jc = keys.columns.map(c => df(c) <=> keys(c)).reduce(_ && _)
        df.join(org.apache.spark.sql.functions.broadcast(keys), jc,
          "left_anti")
      }.select(col("_metadata.file_name").as("file"),
        col("_metadata.row_index").as("pos"))
    }.reduce(_ unionAll _)
    antiJoinDeleted(spark, dir, raw, entries)
  }

  /** The rows of `entries` with their position deletes APPLIED, as a
    * vectorized plan (scan + broadcast-able anti-join) — the rewrite
    * input for COW ops and compaction over delete-carrying files.
    * `eqDeletes` (the snapshot's equality-delete sidecars) are
    * applied per the seq rule — each group of files sharing an
    * applicable-sidecar set reads once, anti-joined on the sidecar's
    * own key columns — so a compaction purges BOTH delete kinds. */
  def readWithDeletes(spark: SparkSession, dir: String,
      schema: StructType, entries: Seq[FileEntry],
      eqDeletes: Seq[SnapshotLog.EqDelete] = Seq.empty): DataFrame = {
    def posApplied(group: Seq[FileEntry]): DataFrame = {
      val raw = spark.read.schema(schema)
        .parquet(group.map(e => s"$dir/${e.name}"): _*)
      if (!hasDeletes(group)) raw
      else {
        val withPos = raw
          .withColumn("__mor_file", col("_metadata.file_name"))
          .withColumn("__mor_pos", col("_metadata.row_index"))
        antiJoinDeleted(spark, dir,
          withPos, group, fileCol = "__mor_file", posCol = "__mor_pos")
          .drop("__mor_file", "__mor_pos")
      }
    }
    if (entries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val groups: Seq[(Seq[SnapshotLog.EqDelete], Seq[FileEntry])] =
      entries.groupBy(e =>
        eqDeletes.filter(_.seq > e.seq.getOrElse(Long.MinValue)))
        .toSeq.sortBy(_._2.map(_.name).min)
    groups.map { case (dels, group) =>
      dels.foldLeft(posApplied(group)) { (df, d) =>
        val keys = spark.read.parquet(s"$dir/${d.name}")
        // null-safe equality on every key column of the sidecar's
        // own schema; broadcast — the sidecar is O(changed keys)
        val cond = keys.columns.map(c => df(c) <=> keys(c))
          .reduce(_ && _)
        df.join(org.apache.spark.sql.functions.broadcast(keys),
          cond, "left_anti")
      }
    }.reduce(_ unionAll _)
  }

  private def antiJoinDeleted(spark: SparkSession, dir: String,
      df: DataFrame, entries: Seq[FileEntry], fileCol: String = "file",
      posCol: String = "pos"): DataFrame = {
    val sidecars = entries.flatMap(_.deletes).distinct
    if (sidecars.isEmpty) return df
    val dels = spark.read.schema(MorDeletes.DeleteSchema)
      .parquet(sidecars.map(s => s"$dir/$s"): _*)
      .select(col("file").as("__del_file"), col("pos").as("__del_pos"))
    df.join(dels, df(fileCol) === col("__del_file") &&
      df(posCol) === col("__del_pos"), "left_anti")
  }

  /** Write `rows` as ONE sidecar parquet in the table dir under
    * `<destPrefix>-<uuid>.parquet`; returns its name, or None when
    * empty. Stage + atomic move, the table's universal write
    * discipline — shared by the position and equality writers so the
    * staging rules (empty-file check, cleanup) can never diverge. */
  private def writeSidecar(dir: String, destPrefix: String,
      rows: DataFrame): Option[String] = {
    val id = java.util.UUID.randomUUID().toString.substring(0, 8)
    val stage = Paths.get(dir, s".${destPrefix}stage-$id")
    rows.coalesce(1).write.parquet(stage.toString)
    val part = {
      val s = Files.list(stage)
      try s.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
      finally s.close()
    }
    val result = part.flatMap { p =>
      if (BronzeBatchAppend.parquetRowCount(p) == 0L) None
      else {
        val dest = s"$destPrefix-$id.parquet"
        Files.move(p, Paths.get(dir, dest), StandardCopyOption.ATOMIC_MOVE)
        Some(dest)
      }
    }
    BronzeBatchAppend.deleteStageTree(stage)
    result
  }

  /** Write `positions` (file, pos) as ONE sidecar parquet in the
    * table dir; returns its name, or None when empty. */
  def writeDeleteFile(spark: SparkSession, dir: String,
      positions: DataFrame): Option[String] =
    writeSidecar(dir, "del",
      positions.select(col("file").cast("string"), col("pos").cast("long")))

  /** Iceberg's `rewrite_position_deletes` (MINOR delete compaction):
    * merge every live position-delete sidecar into ONE combined
    * sidecar and re-point each delete-carrying entry at it — WITHOUT
    * touching any data file. A long-lived merge-on-read table
    * accumulates one sidecar per DELETE; each scan then reads N small
    * sidecar files per executor JVM and the manifest carries N refs
    * per entry. This collapses the read tax to a single sidecar read
    * at O(|live deleted positions|) cost, no data rewrite — the cheap
    * maintenance step between full OPTIMIZE passes at 100 TB.
    *
    * Per-entry semantics are preserved EXACTLY: entry e's new skip
    * set is the union, over e's OWN old refs, of their rows for
    * e.name. A sidecar that holds rows for e.name but is NOT
    * referenced by e (possible after a rollback restored an earlier
    * era's refs) contributes nothing — blind whole-sidecar merging
    * would silently re-apply the rolled-back delete.
    *
    * Commits one `replace` snapshot (layout-only: CDC emits nothing,
    * incremental readers sail across, like data-file compaction);
    * entries whose sidecar set changed under a concurrent commit fail
    * with [[java.util.ConcurrentModificationException]]. Old sidecars
    * become unreferenced and are reaped by vacuum once expired.
    * Returns (sidecarsMerged, sidecarsWritten). */
  def rewritePositionDeletes(spark: SparkSession,
      dir: String): (Int, Int) = {
    val snap = SnapshotLog.current(dir).getOrElse(
      throw new IllegalArgumentException(
        s"rewrite_position_deletes requires a snapshot-logged table: " +
          dir))
    val carrying = snap.entries.filter(_.deletes.nonEmpty)
    val old = carrying.flatMap(_.deletes).distinct.sorted
    // already compact: one shared sidecar (or none) and no entry with
    // multiple refs — nothing to merge
    if (old.size <= 1) return (0, 0)
    val allowed = carrying.flatMap(e => e.deletes.map(s => (e.name, s)))
    val allowedDf = spark.createDataFrame(allowed)
      .toDF("file", "__sidecar")
    val rows = old.map { s =>
      spark.read.schema(MorDeletes.DeleteSchema).parquet(s"$dir/$s")
        .withColumn("__sidecar", lit(s))
    }.reduce(_ unionAll _)
    val merged = rows
      .join(broadcast(allowedDf), Seq("file", "__sidecar"), "left_semi")
      .select(col("file"), col("pos")).distinct()
    val sidecar = writeDeleteFile(spark, dir, merged)
    val expected = carrying.map(e => e.name -> e.deletes).toMap
    val hints = carrying.map(e =>
      e.name -> e.copy(deletes = sidecar.toSeq)).toMap
    SnapshotLog.commitWith(dir, "replace", entryHints = hints) { parent =>
      val pe = parent.map(_.entriesByName)
        .getOrElse(Map.empty[String, FileEntry])
      expected.foreach { case (name, dels) =>
        if (!pe.get(name).exists(_.deletes == dels))
          throw new java.util.ConcurrentModificationException(
            s"rewrite_position_deletes on $dir: $name was rewritten " +
              "or its delete sidecars changed since the merge was " +
              "computed; rerun against the current snapshot")
      }
      (parent.map(_.files.toSet).getOrElse(Set.empty),
        parent.flatMap(_.schemaFile))
    }
    (old.size, sidecar.size)
  }

  /** Convert EQUALITY deletes to POSITION deletes (the
    * Iceberg/Flink-upsert maintenance step between upserts and full
    * OPTIMIZE): locate, once, every live row the key sets retract —
    * a semi-join per sidecar over only the files it applies to — and
    * commit the resulting (file, pos) sidecar while dropping the
    * equality sidecars. No data file rewrites; live rows are
    * unchanged, so the snapshot is layout-only (`replace`: zero CDC
    * rows, incremental readers sail across). Afterwards scans apply
    * cheap position skip sets instead of probing every row against
    * every applicable key set, files with NO matching rows return to
    * the vectorized path entirely, and [[rewritePositionDeletes]] can
    * fold the result into the table's other position sidecars. Cost:
    * one read of the affected files' key columns — O(affected data),
    * vs OPTIMIZE's full rewrite.
    *
    * Concurrency: a concurrently-committed NEW equality sidecar (a
    * racing upsert) is preserved — only the sidecars this call
    * scanned are dropped; a concurrent rewrite of an affected file
    * fails the attach validation with
    * [[java.util.ConcurrentModificationException]]. Double-listing a
    * position that an existing sidecar already carries is harmless
    * (skip sets union). Returns (eqSidecarsConverted,
    * posSidecarsWritten). */
  def convertEqualityDeletes(spark: SparkSession,
      dir: String): (Int, Int) = {
    val snap = SnapshotLog.current(dir).getOrElse(
      throw new IllegalArgumentException(
        s"convert_equality_deletes requires a snapshot-logged table: " +
          dir))
    if (snap.eqDeletes.isEmpty) return (0, 0)
    val schema: StructType = snap.schemaFile.map { name =>
      org.apache.spark.sql.types.DataType
        .fromJson(SnapshotLog.readSchemaSidecar(dir, name))
        .asInstanceOf[StructType]
    }.getOrElse(spark.read
      .parquet(snap.files.map(f => s"$dir/$f"): _*).schema)
    // stats-refined applicability (memoized once per entry): a file
    // whose column ranges exclude every key of a sidecar needn't be
    // read for it at all — at 100 TB this is most of the table for a
    // recent-key upsert
    val applicable: Map[String, Seq[SnapshotLog.EqDelete]] =
      snap.entries.map(e => e.name -> snap.eqDeletesFor(e).filter(d =>
        MorDeletes.eqMayApply(s"$dir/${d.name}", e, schema))).toMap
    val affected = snap.entries.filter(e => applicable(e.name).nonEmpty)
    val groups = affected.groupBy(e => applicable(e.name))
      .toSeq.sortBy(_._2.map(_.name).min)
    val perSidecar = groups.flatMap { case (dels, group) =>
      // one scan per DISTINCT KEY SCHEMA per group, not per sidecar:
      // every epoch of the same streaming upsert keys on the same
      // columns, so S epochs' key sets union into ONE broadcast and
      // one semi-join — O(affected data), not O(S × affected data).
      // Grouping is by the sidecar's full schema (names AND types:
      // a pre-widening sidecar must not union-read with a
      // post-widening one)
      dels.groupBy(d => MorDeletes.sidecarSchema(s"$dir/${d.name}"))
        .toSeq.sortBy(_._2.map(_.name).min)
        .map { case (keySchema, ds) =>
          val base = spark.read.schema(schema)
            .parquet(group.map(e => s"$dir/${e.name}"): _*)
          val keys = spark.read.schema(keySchema)
            .parquet(ds.map(d => s"$dir/${d.name}"): _*).distinct()
          // null-safe equality on the sidecars' own key columns — the
          // exact predicate the per-file readers apply at scan time
          val jc = keySchema.fieldNames.map(c => base(c) <=> keys(c))
            .reduce(_ && _)
          base.join(broadcast(keys), jc, "left_semi")
            .select(col("_metadata.file_name").as("file"),
              col("_metadata.row_index").as("pos"))
        }
    }
    // NO applicable file at all (fresh-key upserts, or every target
    // since rewritten): the sidecars provably retract nothing — drop
    // them without writing positions instead of crashing on an empty
    // union
    val sidecar = perSidecar.reduceOption(_ unionAll _)
      .map(_.distinct())
      .flatMap(writeDeleteFile(spark, dir, _))
    // attach only to files that actually HOLD retracted rows: an
    // affected file with no matches sheds its key-probe obligation
    // and nothing replaces it
    val targets = sidecar.map { s =>
      spark.read.schema(MorDeletes.DeleteSchema).parquet(s"$dir/$s")
        .select(col("file")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }.getOrElse(Seq.empty)
    val converted = snap.eqDeletes.map(_.name).toSet
    SnapshotLog.commitWith(dir, "replace",
      attachDeletes =
        targets.map(t => t -> sidecar.toSeq).toMap,
      mkEqDeletes = (parent, _) =>
        parent.map(_.eqDeletes).getOrElse(Seq.empty)
          .filterNot(d => converted.contains(d.name))) { parent =>
      // every scanned sidecar must still be live in the winning
      // parent: a concurrent ROLLBACK that removed one would leave
      // this commit attaching positions no equality delete justifies
      // any more — silent data loss, not a layout-only swap
      val live = parent.map(_.eqDeletes.map(_.name).toSet)
        .getOrElse(Set.empty)
      if (!converted.subsetOf(live))
        throw new java.util.ConcurrentModificationException(
          s"convert_equality_deletes on $dir: sidecar(s) " +
            s"${(converted -- live).mkString(", ")} were removed by a " +
            "concurrent commit (rollback?); rerun against the current " +
            "snapshot")
      (parent.map(_.files.toSet).getOrElse(Set.empty),
        parent.flatMap(_.schemaFile))
    }
    (converted.size, sidecar.size)
  }

  /** Write `keys` (the equality-key columns, any schema) as ONE
    * EQUALITY-DELETE sidecar parquet in the table dir; returns its
    * name, or None when empty. The sidecar's own parquet schema IS
    * the key declaration readers use. */
  def writeEqDeleteFile(spark: SparkSession, dir: String,
      keys: DataFrame): Option[String] =
    writeSidecar(dir, "eqdel", keys)

  /** The table read of a delete-carrying snapshot: per-file row-based
    * readers applying each file's skip set. Honors column pruning;
    * captures pushed filters for MANIFEST pruning only (all filters
    * reported unpushed — Spark re-evaluates them post-scan), and
    * keeps the snapshot-log streaming hook so `readStream.table`
    * still resolves. */
  def scanBuilder(dir: String, entries: Seq[FileEntry],
      declared: StructType, partSpec: Seq[BronzePartitioning.PartField],
      mkStream: () =>
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream,
      eqOf: FileEntry => Seq[String] = _ => Seq.empty)
      : ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

      private var required: StructType = declared
      private var surviving: Seq[FileEntry] = entries

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def pushFilters(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        // manifest stats/tuple pruning still applies under MOR —
        // deletes only REMOVE rows, so a file provably empty for the
        // predicate stays provably empty
        surviving = BronzePruning.survivors(entries, declared,
          filters.toSeq, partSpec)
        filters // nothing row-level is pushed; Spark filters post-scan
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
        Array.empty

      override def build(): Scan = new Scan
          with org.apache.spark.sql.connector.read.SupportsReportStatistics {
        // manifest-exact stats for the SURVIVING file set — an upper
        // bound under the delete sidecars (deletes only remove rows),
        // same convention as the clean-path scan and Iceberg's
        override def estimateStatistics()
            : org.apache.spark.sql.connector.read.Statistics = {
          val (rows, bytes) = BronzeStreamRead.manifestStats(surviving)
          new org.apache.spark.sql.connector.read.Statistics {
            override def numRows(): java.util.OptionalLong =
              rows.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
            override def sizeInBytes(): java.util.OptionalLong =
              bytes.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
          }
        }
        override def readSchema(): StructType = required
        override def description(): String =
          s"bronze mor scan $dir (position+equality deletes applied; " +
            s"${surviving.size}/${entries.size} files)"
        override def toMicroBatchStream(loc: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          mkStream()
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] =
              surviving.map(e => BronzeFilePartition(s"$dir/${e.name}",
                e.deletes.map(s => s"$dir/$s"),
                eqOf(e).map(s => s"$dir/$s")): InputPartition).toArray
            override def createReaderFactory(): PartitionReaderFactory =
              new BronzeMetadataReaderFactory(required.json)
          }
      }
    }
}

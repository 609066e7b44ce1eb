package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Copy-on-write row-level DELETE for bronze snapshot tables — the
  * Iceberg `DELETE FROM` semantics the reference's sink format
  * supports (`USING iceberg`, KafkaAvroToIceberg.scala:79-89),
  * re-expressed over the snapshot log:
  *
  *   - only data files that CONTAIN matching rows are rewritten (the
  *     survivors of each affected file, written fresh); untouched
  *     files carry over by name — at 100 TB a targeted delete
  *     rewrites |affected files|, never the table;
  *   - the result commits as ONE `delete` snapshot: readers see the
  *     table with all matching rows gone, or the pre-delete table —
  *     never a partial delete. `VERSION AS OF` the pre-delete version
  *     still reads the original files until vacuum reaps them;
  *   - like compaction, a delete REWRITES surviving rows under new
  *     names, so incremental/streaming reads refuse to cross it
  *     ([[SnapshotLog.appendedFilesBetween]]) and consumers restart
  *     from the delete version.
  *
  * DELETE-WHERE NULL semantics (SQL): a row is deleted iff the
  * predicate is TRUE; rows where it evaluates NULL survive. The keep
  * filter is therefore `NOT (cond <=> TRUE)`, not `NOT cond`.
  */
object BronzeRowDelete {

  /** Whether every filter is translatable to a Column — the
    * `canDeleteWhere` answer. Spark falls back to an analysis error
    * (no silent partial delete) when this is false. */
  def canTranslate(filters: Array[Filter]): Boolean =
    filters.forall(translate(_).isDefined)

  /** The key columns and value tuples of a PURE KEY-EQUALITY delete
    * predicate — Some only when the filters are exactly a conjunction
    * of `col = literal` on distinct columns (one tuple), or a single
    * `col IN (literals)` (one tuple per value). Null literals fall
    * through to the position path: SQL `col = NULL` matches nothing,
    * while an equality-delete key of NULL would match null cells. */
  private[catalog] def equalityKeyTuples(filters: Array[Filter])
      : Option[(Seq[String], Seq[Seq[Any]])] = filters.toSeq match {
    // TOP-LEVEL columns only: a nested ref ("s.k") can't be a sidecar
    // key column (the sidecar's own parquet schema declares the keys,
    // and schema.fieldIndex on a dotted name throws) — the position
    // path evaluates nested predicates fine
    case Seq(In(a, vs))
        if !a.contains(".") && vs.nonEmpty && vs.forall(_ != null) =>
      Some((Seq(a), vs.toSeq.map(Seq(_))))
    case fs if fs.nonEmpty && fs.forall {
        case EqualTo(a, v) => !a.contains(".") && v != null
        case _ => false
      } =>
      val pairs = fs.collect { case EqualTo(a, v) => a -> v }
      // distinct columns only: `k = 1 AND k = 2` must not become the
      // key tuple (1, 2) — let the position path evaluate it
      if (pairs.map(_._1).distinct.size == pairs.size)
        Some((pairs.map(_._1), Seq(pairs.map(_._2))))
      else None
    case _ => None
  }

  /** V1 source Filter → Column, None for shapes we don't translate
    * (then canDeleteWhere refuses and the DELETE fails loudly). */
  private[catalog] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for (a <- translate(l); b <- translate(r)) yield a && b
    case Or(l, r) => for (a <- translate(l); b <- translate(r)) yield a || b
    case Not(c) => translate(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Execute `DELETE FROM <table> WHERE <filters AND-ed>` against the
    * snapshot-logged table at `dir`, copy-on-write. Returns the names
    * of the rewritten (affected) files. */
  def deleteWhere(spark: SparkSession, dir: String, schema: StructType,
      filters: Array[Filter]): Seq[String] = {
    val cond = filters.flatMap(translate(_)).reduceOption(_ && _)
      .getOrElse(lit(true))
    if (filters.exists(translate(_).isEmpty))
      throw new UnsupportedOperationException(
        s"bronze DELETE cannot translate filters: ${filters.mkString(", ")}")
    val snap = SnapshotLog.current(dir).getOrElse(
      throw new UnsupportedOperationException(
        s"bronze DELETE requires a snapshot-logged table: $dir"))
    if (snap.files.isEmpty) return Seq.empty
    // (file, pos) of the LIVE matching rows — existing position
    // deletes anti-joined away, so both modes see only rows a reader
    // of the current snapshot still sees. LAZY: the equality fast
    // path below returns without ever locating victims, and building
    // this plan eagerly would charge it one read relation per live
    // file + sidecar (listing/footer I/O) for a plan it discards.
    lazy val matches = BronzeMor.matchingPositions(spark, dir, schema,
      snap.entries, cond, snap.eqDeletes)

    // MERGE-ON-READ mode: write one (file, pos) sidecar and attach it
    // to the targeted entries — O(|deleted rows|) written, file set
    // unchanged; readers skip the positions until OPTIMIZE purges
    if (graft.GraftConf.string(spark, graft.GraftConf.DeleteModeKey,
      "copy-on-write") == "merge-on-read") {
      // EQUALITY fast path: a pure key-equality predicate (every
      // conjunct `col = lit`, or a single `col IN (...)`) becomes one
      // EQUALITY-DELETE sidecar of the key values — O(|keys|) written
      // with ZERO reads of the target (the position path below must
      // first scan the target to locate victims). This is the
      // Iceberg-v2 delete shape a CDC-driven retention job issues by
      // the million at 100 TB.
      equalityKeyTuples(filters).foreach { case (cols, tuples) =>
        // manifest-stats no-op guard: when NO live file's column
        // ranges could contain ANY key tuple, the sidecar would
        // retract nothing — skip the commit entirely. A sidecar that
        // deletes nothing still demotes every scan to the per-file
        // MOR read path until OPTIMIZE purges it, and equality
        // deletes only ever apply to files already live at commit
        // time, so skipping is semantically exact. Driver-side
        // metadata only (files without stats conservatively survive).
        val spec = BronzePartitioning.readAll(Paths.get(dir))
        val anyPossible = tuples.exists { t =>
          val fs: Seq[Filter] = cols.zip(t).map { case (c, v) =>
            EqualTo(c, v): Filter
          }
          BronzePruning.survivors(snap.entries, schema, fs, spec).nonEmpty
        }
        if (!anyPossible) return Seq.empty
        val rows = tuples.map(org.apache.spark.sql.Row.fromSeq)
        val keySchema = StructType(cols.map(c => schema(
          schema.fieldIndex(c)).copy(nullable = false)))
        val keys = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          keySchema).distinct()
        return BronzeMor.writeEqDeleteFile(spark, dir, keys) match {
          case None => Seq.empty
          case Some(sidecar) =>
            SnapshotLog.commitUpsert(dir, "delete", Seq.empty,
              Some(sidecar))
            Seq.empty // no file rewritten, no file targeted
        }
      }
      return BronzeMor.writeDeleteFile(spark, dir, matches) match {
        case None => Seq.empty // nothing matched: no snapshot
        case Some(sidecar) =>
          val targets = spark.read.schema(MorDeletes.DeleteSchema)
            .parquet(s"$dir/$sidecar")
            .select(col("file")).distinct()
            .collect().map(_.getString(0)).toSeq.sorted
          SnapshotLog.commitAttachDeletes(dir, "delete",
            targets.map(_ -> Seq(sidecar)).toMap)
          targets
      }
    }

    // COPY-ON-WRITE mode: only files that CONTAIN live matching rows
    // rewrite; this listing is file-count-scale metadata, never
    // row-scale. Above spark.graft.maxRewriteFiles the matched-name
    // list is never materialized on the driver — the delete degrades
    // to rewriting every live file (same surviving rows; unmatched
    // files rewrite identically and their change-feed carryover pairs
    // cancel), keeping driver memory bounded at extreme match counts.
    val matchedNames = matches.select(col("file")).distinct()
    val cap = graft.GraftConf.int(spark,
      graft.GraftConf.MaxRewriteFilesKey, Int.MaxValue)
    val affected =
      if (cap < Int.MaxValue && matchedNames.limit(cap + 1).count() > cap)
        snap.files
      else matchedNames.collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return Seq.empty // no-op: no new snapshot
    val id = java.util.UUID.randomUUID().toString.substring(0, 8)
    // rewrite per PARTITION-TUPLE group: each affected file holds one
    // tuple (fanout write invariant), so grouping the rewrite by tuple
    // lets the survivors inherit it — rewritten files stay prunable.
    // Unpartitioned tables (and files without a tuple) form a single
    // untagged group, the old single-job behavior. Cost: one job per
    // TOUCHED partition, each over that partition's affected files —
    // still |affected|-scale, never the table.
    val entryParts = snap.entriesByName
    val groups = affected.groupBy(f =>
      entryParts.get(f).map(_.parts).getOrElse(Map.empty[String, String]))
      .toSeq.sortBy(_._2.head)
    val written = Seq.newBuilder[String]
    val addedParts = Map.newBuilder[String, Map[String, String]]
    val seqHints = Map.newBuilder[String, Long]
    groups.zipWithIndex.foreach { case ((tuple, groupFiles), gi) =>
      val stage = Paths.get(dir, s".del-$id-t$gi")
      // existing MOR position deletes are APPLIED to the rewrite input
      // — a copy-on-write pass over a delete-carrying file must not
      // resurrect its already-deleted rows (the rewrite then drops the
      // sidecar refs: fresh entries carry none)
      val groupEntries = groupFiles.flatMap(entryParts.get)
      val keep = BronzeMor.readWithDeletes(spark, dir, schema, groupEntries,
        snap.eqDeletes)
        .filter(!(cond <=> lit(true))) // NULL predicate -> row survives
      try keep.write.parquet(stage.toString)
      catch { case e: Throwable => deleteTree(stage); throw e }
      val parts = {
        val s = Files.list(stage)
        try {
          val b = Seq.newBuilder[Path]
          s.iterator().forEachRemaining { p =>
            if (p.getFileName.toString.startsWith("part-")) b += p
          }
          b.result().sortBy(_.getFileName.toString)
        } finally s.close()
      }
      // sequence-number inheritance: survivors carry the MAX seq of
      // their group's inputs, so an equality delete committed between
      // this scan and the commit still applies to the rewritten rows
      val groupSeq = groupEntries.flatMap(_.seq).maxOption
      parts.zipWithIndex.foreach { case (p, i) =>
        val dest = s"part-del-$id-t$gi-g$i.parquet"
        Files.move(p, Paths.get(dir, dest), StandardCopyOption.ATOMIC_MOVE)
        written += dest
        if (tuple.nonEmpty) addedParts += dest -> tuple
        groupSeq.foreach(sq => seqHints += dest -> sq)
      }
      deleteTree(stage)
    }
    // rewrite-validated commit: if a concurrent op already rewrote or
    // removed any affected file, this delete's survivors were computed
    // from stale bytes — fail loudly instead of duplicating rows; a
    // sidecar concurrently ATTACHED to an input fails the same way
    // (scannedDeletes). At spark.graft.rowLevelIsolation=serializable,
    // ALSO fail if a file appended after the scan snapshot contains
    // rows this predicate matches (the write-skew those rows would
    // dodge).
    val scannedDels = affected.map(f =>
      f -> entryParts.get(f).map(_.deletes).getOrElse(Seq.empty)).toMap
    if (graft.GraftConf.string(spark, graft.GraftConf.RowLevelIsolationKey,
      "snapshot") == "serializable")
      SnapshotLog.commitRewriteSerializable(dir, "delete", affected.toSet,
        written.result(), snap.version, lateFiles =>
          spark.read.schema(schema)
            .parquet(lateFiles.map(f => s"$dir/$f"): _*)
            .filter(cond)
            .select(col("_metadata.file_name")).distinct()
            .collect().map(_.getString(0)).toSeq.sorted,
        addedParts.result(), seqHints.result(), scannedDels)
    else
      SnapshotLog.commitRewrite(dir, "delete", affected.toSet,
        written.result(), addedParts.result(),
        seqHints = seqHints.result(), scannedDeletes = scannedDels)
    affected
  }

  private def deleteTree(dir: Path): Unit =
    BronzeBatchAppend.deleteStageTree(dir)
}

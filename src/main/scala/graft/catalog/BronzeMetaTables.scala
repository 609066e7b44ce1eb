package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg's METADATA TABLES for bronze snapshot tables — the
  * `table$history` / `table$snapshots` / `table$files` views Iceberg
  * users query to audit a table without scanning it:
  *
  *   - [[history]]: one row per committed snapshot — version,
  *     operation, file count, ROW count (from parquet footers: no
  *     data pages read, cost is |files| footer opens, metadata scale);
  *   - [[files]]: the CURRENT snapshot's data files with per-file row
  *     counts and sizes — the layout audit that drives OPTIMIZE
  *     decisions (how many small files, how skewed).
  *
  * Both are driver-built at manifest scale (versions × files of a
  * SNAPSHOT LOG, not the data) and returned as ordinary DataFrames —
  * joinable, filterable, gate-able like any relation. Timestamps are
  * deliberately excluded from [[history]]'s default projection: they
  * are wall-clock nondeterminism; callers who need them read the
  * snapshot log directly.
  */
object BronzeMetaTables {

  /** (version, operation, n_files, n_rows, missing_files) per
    * committed snapshot, ascending. Row counts come from each
    * snapshot's file footers. A snapshot referencing files that no
    * longer exist on disk (reaped outside the vacuum protocol, or a
    * partially-copied table) reports `n_rows` NULL and the count of
    * absent files in `missing_files` — never a silent undercount an
    * audit could mistake for "this snapshot was small". */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    // footer counts cached per file name: across versions the file
    // sets overlap heavily (appends carry the parent set forward), so
    // each footer opens once, not once per version
    val cache = scala.collection.mutable.Map.empty[String, Option[Long]]
    def rowsOf(f: String): Option[Long] = cache.getOrElseUpdate(f, {
      val p = Paths.get(tableDir, f)
      if (Files.isRegularFile(p)) Some(BronzeBatchAppend.parquetRowCount(p))
      else None
    })
    val delCache =
      scala.collection.mutable.Map.empty[String, Option[Map[String, Long]]]
    SnapshotLog.versions(tableDir).map { v =>
      val s = SnapshotLog.read(tableDir, v)
      // LIVE rows per entry: footer count minus the entry's
      // merge-on-read deleted positions (sidecars read once each, at
      // metadata scale) — an audit must see what a reader sees
      val counts = s.entries.map { e =>
        rowsOf(e.name).flatMap { physical =>
          val dels = e.deletes.map(d =>
            sidecarCounts(tableDir, delCache, d).map(_.getOrElse(e.name, 0L)))
          if (dels.exists(_.isEmpty)) None // reaped sidecar: unknown
          else Some(physical - dels.flatten.sum)
        }
      }
      val missing = counts.count(_.isEmpty)
      // an APPLICABLE equality delete retracts an unknown number of
      // rows without a data scan — report n_rows NULL, never an
      // overcount (same policy as files()/partitions())
      val eqUnknown = s.entries.exists(e => s.eqDeletesFor(e).nonEmpty)
      (s.version, s.operation, s.files.size,
        if (missing == 0 && !eqUnknown) Some(counts.flatten.sum) else None,
        missing)
    }.toDF("version", "operation", "n_files", "n_rows", "missing_files")
      .orderBy("version")
  }

  /** (file → deleted-position count) of one sidecar, cached; None if
    * the sidecar is unreadable (reaped outside the vacuum protocol). */
  private def sidecarCounts(tableDir: String,
      cache: scala.collection.mutable.Map[String, Option[Map[String, Long]]],
      name: String): Option[Map[String, Long]] =
    cache.getOrElseUpdate(name, {
      val p = Paths.get(tableDir, name)
      if (!Files.isRegularFile(p)) None
      else try {
        val m = scala.collection.mutable.Map.empty[String, Long]
        val r = org.apache.spark.sql.graftshim.shim.rowParquetReader(
          p.toString, MorDeletes.DeleteSchema)
        try {
          var row = r.read()
          while (row != null) {
            val f = row.getUTF8String(0).toString
            m.update(f, m.getOrElse(f, 0L) + 1L)
            row = r.read()
          }
        } finally r.close()
        Some(m.toMap)
      } catch { case _: Exception => None }
    })

  /** (name, version) of every snapshot TAG — Iceberg's `table$refs`
    * audit surface, completing the metadata-table family
    * (history / files / refs). */
  def refs(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    SnapshotLog.listTags(tableDir).toSeq.sortBy(_._1)
      .toDF("name", "version")
  }

  /** The per-entry LIVE-row walk shared by [[files]] and
    * [[partitions]]: rows = footer count minus the entry's
    * POSITION-delete positions; `None` ("unknown") when a sidecar is
    * unreadable OR an EQUALITY delete applies to the entry —
    * counting eq-retracted rows needs a key probe over the DATA,
    * which a metadata-scale audit must not run, and must not
    * silently overcount either (the [[history]] "never a silent
    * undercount" policy, extended to eq-deletes). Files a concurrent
    * vacuum removed mid-walk are skipped. */
  private def liveEntries(tableDir: String,
      delCache: scala.collection.mutable.Map[String, Option[Map[String, Long]]],
      snap: SnapshotLog.Snapshot)
      : Seq[(SnapshotLog.FileEntry, Option[Long], Long)] =
    snap.entries.flatMap { e =>
      val p = Paths.get(tableDir, e.name)
      if (!Files.isRegularFile(p)) None
      else {
        val pos = e.deletes.map(d =>
          sidecarCounts(tableDir, delCache, d).map(_.getOrElse(e.name, 0L)))
        val rows =
          if (pos.exists(_.isEmpty) || snap.eqDeletesFor(e).nonEmpty) None
          else Some(BronzeBatchAppend.parquetRowCount(p) - pos.flatten.sum)
        Some((e, rows, Files.size(p)))
      }
    }

  private def currentOrLegacy(tableDir: String): SnapshotLog.Snapshot =
    SnapshotLog.current(tableDir).getOrElse(
      SnapshotLog.Snapshot(0L, 0L, "legacy",
        SnapshotLog.listDataFiles(tableDir)))

  /** (partition, n_files, n_rows, size_bytes) of the CURRENT
    * snapshot grouped by each file's partition tuple — Iceberg's
    * `table$partitions`, completing the audit family (history /
    * files / refs / partitions). The partition renders as the sorted
    * `k=v/k2=v2` string (empty for unpartitioned files — a
    * spec-evolved table legitimately holds both eras, w20). Row
    * counts are LIVE (position deletes subtracted); a partition
    * holding any file with an applicable EQUALITY delete reports
    * n_rows NULL — unknown at metadata scale — rather than an
    * overcount a reader would contradict. Manifest-scale: |files|
    * footer opens, zero data pages. */
  def partitions(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val delCache =
      scala.collection.mutable.Map.empty[String, Option[Map[String, Long]]]
    liveEntries(tableDir, delCache, currentOrLegacy(tableDir))
      .groupBy { case (e, _, _) =>
        e.parts.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("/")
      }
      .toSeq.map { case (part, es) =>
        val rows =
          if (es.exists(_._2.isEmpty)) None
          else Some(es.flatMap(_._2).sum)
        (part, es.size.toLong, rows, es.map(_._3).sum)
      }
      .toDF("partition", "n_files", "n_rows", "size_bytes")
      .orderBy("partition")
  }

  /** (file, n_rows, size_bytes) of the CURRENT snapshot's data files,
    * by name — the small-file/skew audit OPTIMIZE acts on. n_rows is
    * LIVE net of position deletes, NULL when unknown at metadata
    * scale (unreadable sidecar, or an applicable equality delete —
    * see [[liveEntries]]). */
  def files(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val delCache =
      scala.collection.mutable.Map.empty[String, Option[Map[String, Long]]]
    liveEntries(tableDir, delCache, currentOrLegacy(tableDir))
      .map { case (e, rows, size) => (e.name, rows, size) }
      .toDF("file", "n_rows", "size_bytes").orderBy("file")
  }
}

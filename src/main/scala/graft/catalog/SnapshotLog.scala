package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Versioned snapshot log for bronze catalog tables — the Iceberg
  * table-format semantics the reference's sink gets from
  * `append().appendFile(...).commit()` (one atomic snapshot per
  * commit, `KafkaBatchJob.java:95-98`; snapshot reads + time travel
  * are Iceberg core behavior), re-expressed over a plain filesystem:
  *
  *   - every commit writes `_graft_snapshots/v<N>.json` holding the
  *     COMPLETE visible file set after the commit (names only — all
  *     data files live flat in the table dir);
  *   - the claim of version N is atomic: the manifest is fully
  *     written to a hidden temp file, then HARD-LINKED to its final
  *     name (`Files.createLink` fails if the name exists — the
  *     filesystem's compare-and-swap). Two racing committers cannot
  *     both win N; the loser recomputes against N and retries at N+1
  *     (optimistic concurrency, Iceberg's own protocol);
  *   - readers resolve `max N` once at table-load time and scan
  *     exactly that manifest's files: a concurrent commit cannot make
  *     a running scan see half an append (snapshot isolation), and
  *     an old version stays readable until vacuumed (time travel).
  *
  * Manifest JSON is written and parsed by this object only; data-file
  * names are filesystem-safe (`[A-Za-z0-9._-]`, enforced on commit),
  * so the hand-rolled parser needs no escaping.
  *
  * Legacy tables (created before the snapshot log existed) have no
  * `_graft_snapshots` dir: reads fall back to directory listing, and
  * the FIRST commit seeds its parent file set from that listing —
  * upgrade is automatic and needs no rewrite.
  */
object SnapshotLog {

  private val LogDir = "_graft_snapshots"
  private val V = """v(\d+)\.json""".r

  /** `schemaFile`: the name (inside the log dir) of the schema sidecar
    * PINNED at this snapshot — Iceberg's schema-id-per-snapshot, so
    * `VERSION AS OF` a pre-evolution version reads with the schema of
    * that time (old column names, no later columns). Absent on
    * manifests from before schema pinning: readers fall back to the
    * table's current declared schema. */
  final case class Snapshot(
      version: Long,
      timestampMicros: Long,
      operation: String,
      files: Seq[String],
      schemaFile: Option[String] = None)

  private def logDir(tableDir: String): Path = Paths.get(tableDir, LogDir)

  /** Visible data files (flat names) of `tableDir` right now, by
    * directory listing — the legacy view, and the seed for a table's
    * first snapshot commit. Dot-files (in-flight stages) and the log
    * dir itself are invisible. */
  def listDataFiles(tableDir: String): Seq[String] = {
    val s = Files.list(Paths.get(tableDir))
    try s.iterator.asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .toSeq.sorted
    finally s.close()
  }

  /** All committed versions, ascending; empty for legacy dirs. */
  def versions(tableDir: String): Seq[Long] = {
    val d = logDir(tableDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator.asScala.flatMap(p => p.getFileName.toString match {
        case V(n) => Some(n.toLong)
        case _ => None
      }).toSeq.sorted
      finally s.close()
    }
  }

  def currentVersion(tableDir: String): Option[Long] =
    versions(tableDir).lastOption

  def read(tableDir: String, version: Long): Snapshot = {
    val p = logDir(tableDir).resolve(s"v$version.json")
    if (!Files.isRegularFile(p))
      throw new IllegalArgumentException(
        s"table at $tableDir has no snapshot version $version " +
          s"(available: ${versions(tableDir).mkString(", ")})")
    parse(Files.readString(p))
  }

  def current(tableDir: String): Option[Snapshot] =
    currentVersion(tableDir).map(read(tableDir, _))

  /** Latest snapshot whose commit time is <= `micros` (the
    * `TIMESTAMP AS OF` resolution rule). Commit times are clamped
    * monotonic at commit time (Iceberg's snapshot-log invariant), but
    * `filter` instead of `takeWhile` keeps pre-clamp legacy logs —
    * where an NTP step could have produced a regression — resolving
    * to the latest qualifying snapshot rather than silently stopping
    * at the dip. */
  def asOfTimestamp(tableDir: String, micros: Long): Option[Snapshot] = {
    val all = versions(tableDir).map(read(tableDir, _))
    all.filter(_.timestampMicros <= micros).lastOption
  }

  /** Atomically commit the next snapshot. `change` maps the parent's
    * visible file set to the new one (set algebra only — the data
    * files themselves must already be in place). Retries on a lost
    * race, recomputing against the winner's snapshot. Returns the
    * committed snapshot. */
  def commit(tableDir: String, operation: String)(
      change: Set[String] => Set[String]): Snapshot =
    commitWith(tableDir, operation)(parent =>
      // schema carries over from the parent: a data commit never
      // changes the schema pin
      (change(parent.map(_.files.toSet)
        .getOrElse(listDataFiles(tableDir).toSet)),
        parent.flatMap(_.schemaFile)))

  /** [[commit]]'s general form: `change` maps the parent snapshot
    * (None for a legacy dir's first commit) to the new file set AND
    * the new schema-sidecar name — the hook schema evolution uses to
    * serialize its read-modify-write through the same CAS. */
  def commitWith(tableDir: String, operation: String)(
      change: Option[Snapshot] => (Set[String], Option[String])): Snapshot = {
    val d = logDir(tableDir)
    Files.createDirectories(d)
    var attempt = 0
    while (true) {
      // ONE read of the parent snapshot: version and file set must
      // come from the same manifest, or a commit landing between two
      // separate reads lets this writer claim version N+2 while
      // merging against N's files — silently dropping N+1's (the
      // classic lost update; caught by TimeTravelSpec's race test)
      val parent = current(tableDir)
      val next = parent.map(_.version + 1).getOrElse(0L)
      val (fileSet, schemaFile) = change(parent)
      val files = fileSet.toSeq.sorted
      files.find(f => !f.matches("[A-Za-z0-9._-]+")).foreach { bad =>
        throw new IllegalArgumentException(
          s"data-file name not filesystem-safe: $bad")
      }
      // commit time clamps to >= the parent's: a wall-clock step
      // backwards (NTP) must not make TIMESTAMP AS OF non-monotonic
      // across versions (Iceberg's snapshot log is monotonic too)
      val now = math.max(System.currentTimeMillis() * 1000L,
        parent.map(_.timestampMicros).getOrElse(Long.MinValue))
      val snap = Snapshot(next, now, operation, files, schemaFile)
      val tmp = d.resolve(s".v$next-${java.util.UUID.randomUUID}.tmp")
      Files.writeString(tmp, render(snap))
      try {
        Files.createLink(d.resolve(s"v$next.json"), tmp) // atomic CAS
        Files.deleteIfExists(tmp)
        return snap
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race; recompute + retry
          attempt += 1
          if (attempt > 100) throw new IllegalStateException(
            s"snapshot commit on $tableDir lost 100 straight races")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit a REWRITE: `replaced` files swap for `added`. Unlike a
    * plain [[commit]], this VALIDATES at commit time that every
    * replaced file is still present in the parent snapshot —
    * Iceberg's `validateDataFilesExist`, i.e. SNAPSHOT-ISOLATION
    * level conflict detection. Without it, a rewrite racing another
    * rewrite/delete of the same files would blindly re-add content the
    * winner already rewrote or removed: a compaction racing a DELETE
    * would resurrect the deleted rows; two row-level ops on one file
    * would duplicate its rows. Disjoint rewrites still serialize
    * through the CAS and both land; overlapping ones fail loudly with
    * [[java.util.ConcurrentModificationException]] for the caller to
    * retry against the new state.
    *
    * This is deliberately WEAKER than Iceberg's default SERIALIZABLE
    * level, which additionally validates that no file APPENDED since
    * the operation's scan snapshot contains rows matching its
    * predicate: here a DELETE racing a concurrent append of
    * predicate-matching rows commits cleanly and leaves the new rows
    * untouched (write skew). That matches Iceberg's
    * `snapshot` isolation setting; [[commitRewriteSerializable]] (the
    * `spark.graft.rowLevelIsolation=serializable` path) adds the
    * late-append validation for callers who need the stronger
    * level. */
  def commitRewrite(tableDir: String, operation: String,
      replaced: Set[String], added: Seq[String]): Snapshot =
    commitWith(tableDir, operation) { parent =>
      val parentFiles = parent.map(_.files.toSet)
        .getOrElse(listDataFiles(tableDir).toSet)
      val missing = replaced -- parentFiles
      if (missing.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"$operation on $tableDir conflicts with a concurrent commit: " +
          s"${missing.size} of its input files (e.g. ${missing.head}) " +
          "were rewritten or removed; recompute against the current " +
          "snapshot and retry")
      (parentFiles -- replaced ++ added, parent.flatMap(_.schemaFile))
    }

  /** [[commitRewrite]] at SERIALIZABLE isolation: additionally
    * validates that no file APPENDED after the operation's scan
    * snapshot (`scannedVersion`) conflicts with the operation —
    * Iceberg's `validateAddedDataFiles`, closing the write-skew
    * window snapshot isolation leaves open (a DELETE racing an
    * append of predicate-matching rows). `conflictsWith` receives
    * the files added since the scan and returns the conflicting
    * subset (typically: files containing rows matching the
    * operation's predicate; return everything for conservative
    * no-predicate semantics). It runs INSIDE the CAS retry loop, so
    * every retry revalidates against the winning parent. */
  def commitRewriteSerializable(tableDir: String, operation: String,
      replaced: Set[String], added: Seq[String], scannedVersion: Long,
      conflictsWith: Seq[String] => Seq[String]): Snapshot = {
    val scannedFiles = read(tableDir, scannedVersion).files.toSet
    commitWith(tableDir, operation) { parent =>
      val parentFiles = parent.map(_.files.toSet)
        .getOrElse(listDataFiles(tableDir).toSet)
      val missing = replaced -- parentFiles
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"$operation on $tableDir conflicts with a concurrent " +
            s"commit: ${missing.size} of its input files (e.g. " +
            s"${missing.head}) were rewritten or removed; recompute " +
            "against the current snapshot and retry")
      val addedSinceScan = (parentFiles -- scannedFiles -- added).toSeq.sorted
      val conflicting =
        if (addedSinceScan.isEmpty) Seq.empty
        else conflictsWith(addedSinceScan)
      if (conflicting.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"$operation on $tableDir (serializable): " +
            s"${conflicting.size} file(s) appended after the " +
            s"operation's scan (v$scannedVersion) contain rows the " +
            s"operation's predicate matches (e.g. ${conflicting.head})" +
            "; rerun the statement against the current snapshot")
      (parentFiles -- replaced ++ added, parent.flatMap(_.schemaFile))
    }
  }

  /** Schema sidecar I/O: sidecars live in the log dir under
    * uuid-unique names, so a racing evolution can never overwrite the
    * file a winning manifest references — the loser's orphan is just
    * garbage. Returns the sidecar's name for the manifest. */
  def writeSchemaSidecar(tableDir: String, schemaJson: String): String = {
    val d = logDir(tableDir)
    Files.createDirectories(d)
    val name =
      s"schema-${java.util.UUID.randomUUID.toString.substring(0, 8)}.json"
    Files.writeString(d.resolve(name), schemaJson)
    name
  }

  def readSchemaSidecar(tableDir: String, name: String): String =
    Files.readString(logDir(tableDir).resolve(name))

  /** Names of every schema sidecar in the log dir — current,
    * historical, and orphaned race losers alike (the conservative
    * universe for field-id bookkeeping). */
  def listSchemaSidecars(tableDir: String): Seq[String] = {
    val d = logDir(tableDir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("schema-")).toSeq
      finally s.close()
    }
  }

  // ---- tags: named snapshot refs (Iceberg's TAG) ------------------
  //
  // A tag pins a VERSION under a stable name — "the table exactly as
  // model-X trained on it". Tags are immutable (creation is the same
  // hard-link CAS as manifests: second create of a name fails), and
  // VACUUM RETAINS tagged snapshots and their files past the
  // retainLast horizon — Iceberg's expire_snapshots keeps refs alive,
  // same contract. `VERSION AS OF 'name'` resolves through the tag.

  private val Tag = """tag-([A-Za-z0-9._-]+)\.json""".r

  /** Atomically create tag `name` → `version`. Fails if the name
    * exists (tags are immutable; drop first to move one) or the
    * version doesn't. */
  def createTag(tableDir: String, name: String, version: Long): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"tag name must be [A-Za-z0-9._-]+, got '$name'")
    // `VERSION AS OF x` tries snapshot numbers FIRST, so a pure-numeric
    // tag could never be resolved — refuse at creation, not lookup
    require(name.toLongOption.isEmpty,
      s"tag name must not be purely numeric ('$name' would be shadowed " +
        "by snapshot-version resolution in VERSION AS OF)")
    read(tableDir, version) // throws if the version doesn't exist
    val d = logDir(tableDir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".tag-$name-${java.util.UUID.randomUUID}.tmp")
    Files.writeString(tmp, version.toString)
    try Files.createLink(d.resolve(s"tag-$name.json"), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"tag '$name' already exists on $tableDir (tags are " +
            "immutable; dropTag first to move it)")
    } finally Files.deleteIfExists(tmp)
  }

  def dropTag(tableDir: String, name: String): Boolean =
    Files.deleteIfExists(logDir(tableDir).resolve(s"tag-$name.json"))

  /** (tag name → version), all tags of the table. */
  def listTags(tableDir: String): Map[String, Long] = {
    val d = logDir(tableDir)
    if (!Files.isDirectory(d)) Map.empty
    else {
      val s = Files.list(d)
      try s.iterator.asScala.flatMap(p => p.getFileName.toString match {
        case Tag(n) => Some(n -> Files.readString(p).trim.toLong)
        case _ => None
      }).toMap
      finally s.close()
    }
  }

  def resolveTag(tableDir: String, name: String): Option[Long] =
    listTags(tableDir).get(name)

  /** Whether the dir has a snapshot log (i.e. is past the legacy
    * listing-only mode). */
  def enabled(tableDir: String): Boolean =
    currentVersion(tableDir).isDefined

  /** Commit a change only when the table already has a snapshot log —
    * the hook for writers that also serve plain (non-catalog) dirs. */
  def commitIfEnabled(tableDir: String, operation: String)(
      change: Set[String] => Set[String]): Unit =
    if (enabled(tableDir)) { commit(tableDir, operation)(change); () }

  /** Drop all but the last `retainLast` snapshots and delete data
    * files referenced by NONE of the retained ones. Returns the
    * deleted data-file names. Time travel to expired versions fails
    * afterwards — exactly Iceberg's `expire_snapshots` contract.
    *
    * Files referenced by an EXPIRED manifest are committed history
    * and delete immediately; files referenced by NO manifest at all
    * are either true orphans (crashed attempts, lost races) or the
    * visible half of an IN-FLIGHT commit (a sidecar/renamed file
    * written before its manifest CAS lands) — those delete only when
    * older than `orphanGraceMs` (Iceberg's orphan-removal age
    * threshold, same reasoning). */
  def vacuum(tableDir: String, retainLast: Int,
      orphanGraceMs: Long = 3600000L): Seq[String] = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val all = versions(tableDir)
    if (all.isEmpty) return Seq.empty
    // TAGGED versions survive expiry regardless of age (Iceberg's
    // expire_snapshots keeps refs): the tag listing happens BEFORE
    // the manifest reads, so a tag created mid-vacuum protects either
    // fully (seen here) or not at all (its version was already doomed
    // when the tag landed — the documented race, same as Iceberg's)
    val tagged = listTags(tableDir).values.toSet
    val horizon = all.size - retainLast
    val (expired, retained) = all.zipWithIndex.partition {
      case (v, i) => i < horizon && !tagged.contains(v)
    } match { case (e, r) => (e.map(_._1), r.map(_._1)) }
    // List candidates BEFORE reading the retained manifests: a commit
    // racing with the vacuum adds files under fresh names (not in this
    // listing -> untouched) referencing only parent files (in a
    // retained manifest -> kept).
    val candidates = listDataFiles(tableDir)
    // schema-sidecar candidates under the same discipline
    val d = logDir(tableDir)
    val sidecarCandidates =
      if (!Files.isDirectory(d)) Seq.empty[String]
      else {
        val s = Files.list(d)
        try s.iterator.asScala.map(_.getFileName.toString)
          .filter(_.startsWith("schema-")).toSeq
        finally s.close()
      }
    val expiredSnaps = expired.map(read(tableDir, _))
    val retainedSnaps = retained.map(read(tableDir, _))
    val referenced = retainedSnaps.flatMap(_.files).toSet
    val expiredReferenced = expiredSnaps.flatMap(_.files).toSet
    // Age is measured in the FILESYSTEM's clock domain: a probe file
    // written now supplies the "now" reference, so a skew between
    // wall-clock and FS timestamps can never age-qualify a fresh
    // in-flight file. The wall-clock min() is a second safety clamp —
    // whichever clock reads EARLIER wins, and an early "now" only
    // protects files longer (premature delete is the one unsafe
    // direction; extra retention is always safe).
    val nowRef: Long = {
      val probe = Files.createTempFile(d, ".vacuum-probe-", "")
      try math.min(System.currentTimeMillis(),
        Files.getLastModifiedTime(probe).toMillis)
      finally Files.deleteIfExists(probe)
    }
    def oldEnough(p: Path): Boolean =
      try nowRef - Files.getLastModifiedTime(p).toMillis > orphanGraceMs
      catch { case _: java.io.IOException => false }
    val doomed = candidates.filterNot(referenced.contains)
      .filter(f => expiredReferenced.contains(f) ||
        oldEnough(Paths.get(tableDir, f)))
    doomed.foreach(f => Files.deleteIfExists(Paths.get(tableDir, f)))
    expired.foreach(v =>
      Files.deleteIfExists(logDir(tableDir).resolve(s"v$v.json")))
    // sidecars referenced by NO retained manifest: expired pins delete
    // now; unreferenced ones (lost races OR an in-flight alter that
    // wrote its sidecar but hasn't CAS-committed yet) age-guard
    val keptSchemas = retainedSnaps.flatMap(_.schemaFile).toSet
    val expiredSchemas = expiredSnaps.flatMap(_.schemaFile).toSet
    sidecarCandidates.filterNot(keptSchemas.contains)
      .filter(f => expiredSchemas.contains(f) || oldEnough(d.resolve(f)))
      .foreach(f => Files.deleteIfExists(d.resolve(f)))
    doomed
  }

  /** Data files APPENDED between two snapshots — the incremental-scan
    * primitive (Iceberg's `incremental read`): a nightly consumer
    * remembers the version it last processed and reads only what
    * arrived since, never rescanning the table. Walks every snapshot
    * in (fromVersion, toVersion]; REPLACE snapshots (compaction) and
    * DELETE snapshots (copy-on-write row deletes) rewrite old rows
    * under new names, so crossing one would re-emit consumed data —
    * refused, exactly Iceberg's behavior. */
  def appendedFilesBetween(tableDir: String, fromVersion: Long,
      toVersion: Long): Seq[String] = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    // vacuum + tag retention can expire INTERIOR versions (a tagged
    // island below the horizon); an expired version's operation kind
    // is unknown, so crossing the gap could silently re-emit
    // rewritten rows — refuse with the retained set
    val have = versions(tableDir).toSet
    (fromVersion to toVersion).find(v => !have.contains(v)).foreach { v =>
      throw new IllegalArgumentException(
        s"incremental read v$fromVersion..v$toVersion: snapshot v$v " +
          "was vacuum-expired; restart from a retained contiguous " +
          s"version (retained: ${have.toSeq.sorted.mkString(", ")})")
    }
    val from = read(tableDir, fromVersion).files.toSet
    ((fromVersion + 1) to toVersion).foreach { v =>
      val op = read(tableDir, v).operation
      if (rewritesRows(op)) throw new IllegalArgumentException(
        s"incremental read v$fromVersion..v$toVersion crosses a " +
          s"${op.toUpperCase} snapshot (v$v): rewritten files interleave " +
          "old and new rows; consume up to it, then restart from it")
    }
    read(tableDir, toVersion).files.filterNot(from.contains)
  }

  /** Operations whose snapshot rewrites existing rows under new file
    * names (vs pure appends) — the ones incremental readers must not
    * silently cross. A rollback re-exposes previously-removed rows,
    * which is the same hazard. */
  def rewritesRows(operation: String): Boolean =
    operation == "replace" || operation == "delete" ||
      operation == "update" || operation == "merge" ||
      operation == "rollback"

  /** ROLLBACK to an earlier snapshot — Iceberg's
    * `rollback_to_snapshot`: commits a NEW snapshot whose file set
    * AND schema pin are the target version's, so the bad commits stay
    * in history (auditable, time-travelable until vacuumed) while the
    * table's current state steps back — the bad-ingest recovery verb.
    * The restored files are referenced by the new head, so vacuum
    * retains them exactly like any live snapshot's. */
  def rollback(tableDir: String, toVersion: Long): Snapshot = {
    val target = read(tableDir, toVersion) // throws if expired/absent
    val cur = currentVersion(tableDir).getOrElse(-1L)
    require(toVersion < cur,
      s"rollback target v$toVersion is not before the current v$cur")
    commitWith(tableDir, "rollback")(_ =>
      (target.files.toSet, target.schemaFile))
  }

  // ---- manifest rendering / parsing (format owned by this object) --

  private def render(s: Snapshot): String =
    s"""{"version":${s.version},"timestampMicros":${s.timestampMicros},""" +
      s""""operation":"${s.operation}",""" +
      s.schemaFile.map(f => s""""schemaFile":"$f",""").getOrElse("") +
      s""""files":[${s.files.map("\"" + _ + "\"").mkString(",")}]}"""

  private def parse(json: String): Snapshot = {
    def long(key: String): Long =
      s""""$key":(\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalStateException(s"bad manifest: $json"))
        .group(1).toLong
    val op = """"operation":"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("append")
    val schemaFile = """"schemaFile":"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1))
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val names =
      if (files.isEmpty) Seq.empty[String]
      else files.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    Snapshot(long("version"), long("timestampMicros"), op, names, schemaFile)
  }

  /** Physically rewrite groups of small files into one file each and
    * commit the result as a REPLACE snapshot — Iceberg's
    * `rewrite_data_files` (OPTIMIZE/compaction). Files are greedily
    * binned in name order until a bin reaches `targetBytes`; only
    * bins of >= 2 files rewrite. Old versions still read the original
    * small files until vacuumed. Returns (filesCompacted,
    * filesCreated).
    *
    * The rewrite reads NEVER use single-footer schema inference:
    * after ADD COLUMN a bin can mix pre- and post-evolution files,
    * and letting Spark infer from one file's footer would silently
    * drop the new column from the rewritten file — permanent data
    * loss once vacuum reaps the originals. The schema is resolved
    * HERE, from the table's own state (no caller can forget to pass
    * it): the snapshot's pinned schema sidecar when present (catalog
    * tables — Iceberg's `rewrite_data_files` always writes the table
    * schema), else the UNION of every footer in the table
    * (`mergeSchema`), which can widen but never drop a column.
    * Compaction changes LAYOUT, never data. */
  def optimize(spark: org.apache.spark.sql.SparkSession, tableDir: String,
      targetBytes: Long): (Int, Int) = {
    val snap = current(tableDir).getOrElse(
      throw new IllegalArgumentException(
        s"optimize requires a snapshot-logged table: $tableDir"))
    val pinnedSchema: Option[org.apache.spark.sql.types.StructType] =
      snap.schemaFile.map { name =>
        org.apache.spark.sql.types.DataType
          .fromJson(readSchemaSidecar(tableDir, name))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      }
    val sizes = snap.files.map(f =>
      f -> Files.size(Paths.get(tableDir, f)))
    // greedy first-fit in name order: deterministic, no global sort
    val bins = Seq.newBuilder[Seq[String]]
    var bin = Seq.empty[String]; var binBytes = 0L
    sizes.foreach { case (f, sz) =>
      if (bin.nonEmpty && binBytes + sz > targetBytes) {
        bins += bin; bin = Seq.empty; binBytes = 0L
      }
      bin :+= f; binBytes += sz
    }
    if (bin.nonEmpty) bins += bin
    val toCompact = bins.result().filter(_.size >= 2)
    if (toCompact.isEmpty) return (0, 0)
    // Pinned schemas carry parquet FIELD IDS (the RENAME mechanism):
    // a bin crossing a RENAME boundary holds files whose footers
    // still use the old name, and only id-based resolution reads
    // them correctly. Spark's parquet reader takes that switch from
    // the SESSION conf — mutating the caller's session would leak the
    // flip to concurrent queries (and two concurrent optimizes could
    // clobber each other's restore), so the rewrite runs in a CLONED
    // session: own SQLConf, shared SparkContext, nothing to restore.
    val needIds = pinnedSchema.exists(_.fields.exists(
      _.metadata.contains("parquet.field.id")))
    val rw = if (!needIds) spark else {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      s2
    }
    val id = java.util.UUID.randomUUID().toString.substring(0, 8)
    val written = toCompact.zipWithIndex.map { case (group, i) =>
      val dest = s"part-opt-$id-g$i.parquet"
      val stage = Paths.get(tableDir, s".opt-$id-g$i")
      val reader = pinnedSchema.fold(
        rw.read.option("mergeSchema", "true"))(rw.read.schema)
      reader.parquet(group.map(f => s"$tableDir/$f"): _*)
        .coalesce(1).write.parquet(stage.toString)
      val partFile = {
        val s = Files.list(stage)
        try s.iterator.asScala
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(throw new IllegalStateException("empty compaction"))
        finally s.close()
      }
      Files.move(partFile, Paths.get(tableDir, dest),
        StandardCopyOption.ATOMIC_MOVE)
      val walk = Files.walk(stage)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
      dest
    }
    val replaced = toCompact.flatten.toSet
    // rewrite-validated: a row-level op racing this compaction on the
    // same files fails one of the two loudly instead of resurrecting
    // deleted/stale rows through the compacted copy
    commitRewrite(tableDir, "replace", replaced, written)
    (replaced.size, written.size)
  }
}

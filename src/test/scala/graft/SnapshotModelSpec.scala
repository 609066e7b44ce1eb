package graft

import scala.util.Random

import graft.catalog.SnapshotLog

/** MODEL-BASED property test of the bronze table's op algebra: a
  * deterministic random sequence of append / DELETE (copy-on-write
  * AND merge-on-read, position AND equality) / UPDATE / OPTIMIZE /
  * VACUUM / tag / RENAME COLUMN / ROLLBACK /
  * convert_equality_deletes / rewrite_position_deletes steps runs
  * against BOTH the real catalog table and a trivial in-memory
  * model, and after EVERY step the table's content, its readable
  * history (`VERSION AS OF` each retained version, read with the
  * COLUMN NAME of that era), and its tag resolution must match the
  * model. Interleavings no single-purpose spec enumerates
  * (delete-after-compaction, vacuum-under-tag,
  * update-after-MOR-delete, rollback-across-position-deletes,
  * convert-then-rollback-then-vacuum, …) all get exercised; any
  * divergence pinpoints the first bad step. */
class SnapshotModelSpec extends SparkSpec {

  private lazy val warehouse: String = bronzeWarehouse

  private def bronzeCatalog: graft.catalog.BronzeCatalog = {
    warehouse
    spark.sessionState.catalogManager.catalog("bronze")
      .asInstanceOf[graft.catalog.BronzeCatalog]
  }

  private case class Model(
      rows: Map[Long, Double],
      history: Map[Long, Map[Long, Double]],
      colAt: Map[Long, String], // value-column NAME pinned per version
      tags: Map[String, Long],
      version: Long) {
    def col: String = colAt(version)
  }

  // CI defaults (3 runs x 18 steps, ~1 min); a deep soak overrides via
  // GRAFT_MODEL_RUNS / GRAFT_MODEL_STEPS — same fixed seed, so any
  // failure reproduces exactly by re-running with the same dials
  private def dial(name: String, default: Int): Int =
    sys.env.get(name).map { v =>
      val n = v.toIntOption.getOrElse(
        fail(s"$name must be a positive integer, got '$v'"))
      require(n > 0, s"$name must be > 0, got $n — a zero-run soak " +
        "would report the property green having verified nothing")
      n
    }.getOrElse(default)

  private lazy val Runs = dial("GRAFT_MODEL_RUNS", 3)
  private lazy val Steps = dial("GRAFT_MODEL_STEPS", 18)

  test("random op sequences: table == model at every step and version") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bronze.model")
    val rnd = new Random(20260813L) // deterministic — no wall-clock
    (1 to Runs).foreach { run =>
      val name = s"m$run"
      spark.sql(s"DROP TABLE IF EXISTS bronze.model.$name")
      spark.sql(s"CREATE TABLE bronze.model.$name " +
        "(id BIGINT, amt DOUBLE) USING parquet")
      val dir = bronzeCatalog.tableDir(Seq("model"), name)
      var m = Model(Map.empty, Map(0L -> Map.empty),
        Map(0L -> "amt"), Map.empty, 0L)
      var nextId = 0L

      def tableRows(): Map[Long, Double] =
        spark.table(s"bronze.model.$name")
          .selectExpr("id", m.col).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap

      def versionRows(v: Long): Map[Long, Double] =
        // read with the column NAME of that era (schema is pinned
        // per snapshot; a later rename must not leak backwards)
        spark.sql(s"SELECT id, ${m.colAt(v)} FROM " +
          s"bronze.model.$name VERSION AS OF $v")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      def check(step: String): Unit = {
        def ops = SnapshotLog.versions(dir).map(v =>
          s"v$v=${SnapshotLog.read(dir, v).operation}").mkString(" ")
        assert(SnapshotLog.current(dir).get.version == m.version,
          s"run $run after $step: version drift (real " +
            s"${SnapshotLog.current(dir).get.version}, model ${m.version}; " +
            s"real ops: $ops)")
        assert(tableRows() == m.rows, s"run $run after $step: content")
        // every RETAINED version must read exactly the model's memory
        // of it (vacuum may have expired others — that's fine)
        val retained = SnapshotLog.versions(dir).toSet
        m.history.filter { case (v, _) => retained.contains(v) }
          .foreach { case (v, want) =>
            assert(versionRows(v) == want,
              s"run $run after $step: VERSION AS OF $v")
          }
        // tags resolve to their pinned content (vacuum keeps them)
        m.tags.foreach { case (t, v) =>
          val got = spark.sql(s"SELECT id, ${m.colAt(v)} FROM " +
            s"bronze.model.$name VERSION AS OF '$t'").collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          assert(got == m.history(v),
            s"run $run after $step: tag $t -> v$v")
        }
      }

      (1 to Steps).foreach { step =>
        val op = rnd.nextInt(18)
        val desc = op match {
          case 0 | 1 | 2 | 3 => // append (weighted: tables mostly grow)
            val n = 1 + rnd.nextInt(5)
            val batch = (0 until n).map { i =>
              (nextId + i, (nextId + i) * 1.5)
            }
            nextId += n
            spark.sql(s"INSERT INTO bronze.model.$name VALUES " +
              batch.map { case (id, a) => s"($id, $a)" }.mkString(", "))
            m = m.copy(rows = m.rows ++ batch, version = m.version + 1)
            m = m.copy(history = m.history + (m.version -> m.rows),
              colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            s"append($n)"
          case 4 | 5 => // keyed DELETE (untranslatable % predicate:
            // the group path can't prune files, so the statement
            // rewrites and COMMITS whenever the table has FILES at
            // all — even a zero-match delete, and even when every
            // row in those files is already MOR-deleted (the rewrite
            // then just drops the dead files); only a file-less
            // table commits nothing
            val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
            val commits = SnapshotLog.current(dir).get.files.nonEmpty
            spark.sql(s"DELETE FROM bronze.model.$name " +
              s"WHERE id % $k = $r")
            if (commits) {
              m = m.copy(rows = m.rows.filter(_._1 % k != r),
                version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"delete(%$k==$r)"
          case 6 | 7 => // keyed UPDATE (same commit contract as DELETE)
            val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
            val c = 1 + rnd.nextInt(9)
            val commits = SnapshotLog.current(dir).get.files.nonEmpty
            spark.sql(s"UPDATE bronze.model.$name " +
              s"SET ${m.col} = ${m.col} + $c.0 WHERE id % $k = $r")
            if (commits) {
              m = m.copy(rows = m.rows.map { case (id, a) =>
                id -> (if (id % k == r) a + c else a) },
                version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"update(%$k==$r,+$c)"
          case 8 => // OPTIMIZE: layout-only; commits only if it binned
            val (compacted, _) =
              bronzeCatalog.optimizeTable(Seq("model"), name, 1L << 30)
            if (compacted > 0) {
              m = m.copy(version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"optimize($compacted)"
          case 10 => // RENAME the value column (metadata-only alter)
            val to = if (m.col == "amt") "amount" else "amt"
            spark.sql(s"ALTER TABLE bronze.model.$name " +
              s"RENAME COLUMN ${m.col} TO $to")
            m = m.copy(version = m.version + 1)
            m = m.copy(history = m.history + (m.version -> m.rows),
              colAt = m.colAt + (m.version -> to))
            s"rename(->$to)"
          case 11 => // ROLLBACK to a random retained earlier version
            val retained = SnapshotLog.versions(dir).toSet
            val candidates = m.history.keys
              .filter(v => v < m.version && retained.contains(v))
              .toSeq.sorted
            if (candidates.isEmpty) "rollback(skip)"
            else {
              val v = candidates(rnd.nextInt(candidates.size))
              bronzeCatalog.rollbackTable(Seq("model"), name, v)
              m = m.copy(rows = m.history(v), version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(v)))
              s"rollback(v$v)"
            }
          case 12 | 13 => // MERGE-ON-READ range DELETE: a translatable
            // predicate rides the SupportsDelete path, and the
            // merge-on-read mode attaches a position-delete sidecar
            // instead of rewriting — commits only when LIVE rows
            // match (a no-match MOR delete writes nothing)
            val lo = rnd.nextInt(math.max(1, nextId.toInt)).toLong
            val hi = lo + rnd.nextInt(5)
            val commits = m.rows.keys.exists(id => id >= lo && id <= hi)
            spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
            try spark.sql(s"DELETE FROM bronze.model.$name " +
              s"WHERE id >= $lo AND id <= $hi")
            finally spark.conf.unset(GraftConf.DeleteModeKey)
            if (commits) {
              m = m.copy(rows = m.rows.filter { case (id, _) =>
                id < lo || id > hi }, version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"mor-delete($lo..$hi)"
          case 9 => // tag current, sometimes vacuum
            if (rnd.nextBoolean() && !m.tags.contains(s"t$step")) {
              bronzeCatalog.tagTable(Seq("model"), name, s"t$step",
                m.version)
              m = m.copy(tags = m.tags + (s"t$step" -> m.version))
              s"tag(t$step)"
            } else if (rnd.nextBoolean()) {
              bronzeCatalog.vacuumTable(Seq("model"), name,
                retainLast = 2)
              "vacuum(2)"
            } else {
              // time-based expiry to a random retained version's
              // commit stamp: everything strictly older goes (tags
              // and current survive); the check's retained-only
              // history walk validates exactly what must remain
              val vs = SnapshotLog.versions(dir)
              val cutV = vs(rnd.nextInt(vs.size))
              bronzeCatalog.expireSnapshotsTable(Seq("model"), name,
                SnapshotLog.read(dir, cutV).timestampMicros)
              s"expire(<v$cutV)"
            }
          case 14 | 15 => // EQUALITY MOR DELETE: an IN-list of LIVE
            // keys rides the zero-read fast path and attaches one
            // equality sidecar — always commits (keys match rows)
            if (m.rows.isEmpty) "eq-delete(skip)"
            else {
              val live = m.rows.keys.toSeq.sorted
              val ks = Seq(live(rnd.nextInt(live.size)),
                live(rnd.nextInt(live.size))).distinct
              spark.conf.set(GraftConf.DeleteModeKey, "merge-on-read")
              try spark.sql(s"DELETE FROM bronze.model.$name " +
                s"WHERE id IN (${ks.mkString(", ")})")
              finally spark.conf.unset(GraftConf.DeleteModeKey)
              m = m.copy(rows = m.rows -- ks, version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
              s"eq-delete(${ks.mkString(",")})"
            }
          case 16 => // convert eq deletes -> positions: layout-only;
            // commits iff any equality sidecar was live
            val (conv, _) = bronzeCatalog
              .convertEqualityDeletesTable(Seq("model"), name)
            if (conv > 0) {
              m = m.copy(version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"convert($conv)"
          case 17 => // compact position sidecars: layout-only;
            // commits iff >= 2 distinct sidecars were referenced
            val (merged, _) = bronzeCatalog
              .rewritePositionDeletesTable(Seq("model"), name)
            if (merged > 0) {
              m = m.copy(version = m.version + 1)
              m = m.copy(history = m.history + (m.version -> m.rows),
                colAt = m.colAt + (m.version -> m.colAt(m.version - 1)))
            }
            s"compact-dels($merged)"
        }
        check(desc)
      }
    }
  }
}

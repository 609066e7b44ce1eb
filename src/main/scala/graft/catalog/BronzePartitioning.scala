package graft.catalog

import java.nio.file.{Files, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._

/** PARTITION TRANSFORMS for bronze catalog tables — the hidden-
  * partitioning surface of the Iceberg tables the reference's sink
  * targets (`KafkaAvroToIceberg.scala:79-89` creates a partitioned
  * Iceberg table), re-expressed over the snapshot log:
  *
  *   - `identity(col)` — one partition value per distinct column
  *     value;
  *   - `days(col)` — timestamp/date → epoch day;
  *   - `bucket(n, col)` — deterministic hash of the value mod n.
  *
  * The WRITER fans rows out so every data file holds exactly ONE
  * partition tuple, records the tuple in the file's manifest entry,
  * and scan planning prunes on it. For identity and days the per-file
  * column min/max stats already subsume value pruning (a single-tuple
  * file has min == max); the transform that genuinely needs the
  * recorded tuple is `bucket`, where equality predicates prune to the
  * 1/n of files whose bucket matches the literal's hash — which
  * min/max can never express.
  *
  * The spec is set at CREATE TABLE (`_graft_partition.json` in the
  * table dir) and may EVOLVE ([[evolve]] — Iceberg's
  * `update_partition_spec`): new writes fan out under the new spec
  * while existing files keep the tuples of their era, and scan
  * planning prunes EACH file with the transforms of the spec that
  * wrote it (Iceberg's per-file spec-id pruning). The mechanism is
  * the tuple KEY: a re-parameterized transform (bucket width change)
  * bumps a GENERATION suffix on its key, so an old file's recorded
  * `bucket_id` value can never be compared against the new width's
  * hash — the one comparison that would prune wrongly. Retired
  * fields stay in the spec file and keep pruning the files they
  * wrote. Writers that bypass the fanout path (plain-dir helpers,
  * row-level rewrites, compaction) produce files WITHOUT a tuple;
  * such files are simply never partition-pruned — correctness never
  * depends on the tuple being present.
  *
  * The bucket hash is this catalog's own (splitmix64 / FNV-1a — byte
  * compatibility with Iceberg's murmur3 is NOT claimed); writer and
  * pruner share [[bucketOf]], which is the only consistency that
  * matters.
  */
object BronzePartitioning {

  private val SpecFile = "_graft_partition.json"

  /** One transform of the spec: `kind` ∈ identity | days | bucket.
    * `gen` is the field's key GENERATION: 0 for the original era, and
    * bumped whenever spec evolution re-parameterizes the transform on
    * the same column (bucket width change) — the suffix keeps tuple
    * values of different eras from ever being compared. */
  final case class PartField(kind: String, col: String, n: Int = 0,
      gen: Int = 0) {
    /** The manifest-entry `parts` key this transform writes. */
    def key: String = {
      val base = kind match {
        case "identity" => col.toLowerCase
        case "days" => s"days_${col.toLowerCase}"
        case "bucket" => s"bucket_${col.toLowerCase}"
      }
      if (gen == 0) base else s"$base@$gen"
    }
  }

  // ---- spec persistence --------------------------------------------

  private def renderFields(spec: Seq[PartField]): String =
    spec.map { f =>
      s"""{"kind":"${f.kind}","col":"${f.col}","n":${f.n},"gen":${f.gen}}"""
    }.mkString("[", ",", "]")

  def write(tableDir: Path, spec: Seq[PartField],
      retired: Seq[PartField] = Seq.empty): Unit = {
    val json =
      if (retired.isEmpty) renderFields(spec) // original flat format
      else s"""{"fields":${renderFields(spec)},""" +
        s""""retired":${renderFields(retired)}}"""
    // temp + move: a concurrent table load never sees a torn spec
    val tmp = tableDir.resolve(s".$SpecFile.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, tableDir.resolve(SpecFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def parseFields(node: com.fasterxml.jackson.databind.JsonNode)
      : Seq[PartField] = {
    import scala.jdk.CollectionConverters._
    node.elements().asScala.map { e =>
      PartField(e.get("kind").asText(), e.get("col").asText(),
        Option(e.get("n")).map(_.asInt()).getOrElse(0),
        Option(e.get("gen")).map(_.asInt()).getOrElse(0))
    }.toSeq
  }

  private def readSpec(tableDir: Path): (Seq[PartField], Seq[PartField]) = {
    val p = tableDir.resolve(SpecFile)
    if (!Files.isRegularFile(p)) return (Seq.empty, Seq.empty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(p))
    if (root.isArray) (parseFields(root), Seq.empty) // legacy flat format
    else (parseFields(root.get("fields")),
      Option(root.get("retired")).map(parseFields).getOrElse(Seq.empty))
  }

  /** The ACTIVE spec — what new writes fan out under. */
  def read(tableDir: Path): Seq[PartField] = readSpec(tableDir)._1

  /** Active + RETIRED fields — what scan pruning evaluates: each file
    * entry only carries the tuple keys of the spec era that wrote it,
    * so every file is pruned by exactly its own era's transforms. */
  def readAll(tableDir: Path): Seq[PartField] = {
    val (active, retired) = readSpec(tableDir)
    active ++ retired
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's `update_partition_spec`):
    * replace the active spec with `transforms`. Existing data files
    * are untouched and keep pruning under the spec that wrote them
    * ([[readAll]]); only new writes fan out under the new spec. A
    * transform identical to a current-or-retired one (same kind, col,
    * AND parameter) keeps that field's generation — its tuple values
    * are byte-comparable; a RE-PARAMETERIZED transform (bucket width
    * change) gets the next generation so old and new tuple values
    * can never be compared. */
  def evolve(tableDir: Path, transforms: Array[Transform],
      schema: StructType): Seq[PartField] =
    evolveLocks.computeIfAbsent(
      tableDir.toAbsolutePath.normalize.toString, _ => new Object)
      .synchronized { evolveLocked(tableDir, transforms, schema) }

  // serialize the read-modify-write per table: the spec-file move is
  // atomic but the RMW is not, and two racing evolutions could mint
  // the SAME generation for different bucket widths — defeating the
  // era-key isolation the generation suffix exists to provide. A
  // JVM-wide lock covers every writer of this local-FS catalog (all
  // sessions share the JVM); cross-process racers remain unserialized,
  // like the rest of the local snapshot-log CAS machinery.
  private val evolveLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def evolveLocked(tableDir: Path, transforms: Array[Transform],
      schema: StructType): Seq[PartField] = {
    val (active, retired) = readSpec(tableDir)
    val history = active ++ retired
    val proposed = fromTransforms(transforms, schema)
    val evolved = proposed.map { f =>
      history.find(h => h.kind == f.kind && h.col.equalsIgnoreCase(f.col) &&
          h.n == f.n) match {
        case Some(h) => f.copy(gen = h.gen) // same semantics: same era key
        case None =>
          val prior = history.filter(h => h.kind == f.kind &&
            h.col.equalsIgnoreCase(f.col))
          if (prior.isEmpty) f // fresh field: generation 0
          else f.copy(gen = prior.map(_.gen).max + 1)
      }
    }
    val evolvedKeys = evolved.map(_.key).toSet
    val newRetired = (retired ++ active)
      .filterNot(h => evolvedKeys.contains(h.key))
      .distinct
    write(tableDir, evolved, newRetired)
    evolved
  }

  // ---- V2 Transform array <-> spec ---------------------------------

  /** Parse CREATE TABLE's `PARTITIONED BY` transforms; throws on
    * anything this catalog cannot honor (an unsupported transform
    * must fail the DDL, not silently un-partition the table). */
  def fromTransforms(transforms: Array[Transform],
      schema: StructType): Seq[PartField] = transforms.toSeq.map { t =>
    def col: String = {
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames.length == 1,
        s"partition transform ${t.describe()} must reference one " +
          "top-level column")
      refs.head.fieldNames.head
    }
    def field: StructField = schema.fields
      .find(_.name.equalsIgnoreCase(col))
      .getOrElse(throw new IllegalArgumentException(
        s"partition transform ${t.describe()}: no column $col"))
    t.name() match {
      case "identity" =>
        field.dataType match {
          case StringType | IntegerType | LongType | ShortType |
               ByteType | DateType | BooleanType => ()
          case dt => throw new UnsupportedOperationException(
            s"identity partitioning on ${dt.simpleString} (column " +
              s"$col) is not supported (unbounded/unstable key domain)")
        }
        PartField("identity", field.name)
      case "days" | "day" =>
        field.dataType match {
          case TimestampType | DateType => ()
          case dt => throw new UnsupportedOperationException(
            s"days() needs a timestamp/date column; $col is " +
              dt.simpleString)
        }
        PartField("days", field.name)
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case lit: org.apache.spark.sql.connector.expressions.Literal[_]
            if lit.value().isInstanceOf[Number] =>
            lit.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform ${t.describe()} has no bucket count"))
        require(n > 0 && n <= (1 << 20), s"bucket count out of range: $n")
        field.dataType match {
          case StringType | IntegerType | LongType | DateType => ()
          case dt => throw new UnsupportedOperationException(
            s"bucket() on ${dt.simpleString} (column $col) is not " +
              "supported")
        }
        PartField("bucket", field.name, n)
      case other => throw new UnsupportedOperationException(
        s"bronze catalog supports identity / days / bucket partition " +
          s"transforms; got $other")
    }
  }

  def toTransforms(spec: Seq[PartField]): Array[Transform] =
    spec.map {
      case PartField("identity", c, _, _) => Expressions.identity(c)
      case PartField("days", c, _, _) => Expressions.days(c)
      case PartField("bucket", c, n, _) => Expressions.bucket(n, c)
      case f => throw new IllegalStateException(s"bad spec field $f")
    }.toArray

  // ---- the deterministic bucket hash -------------------------------

  /** splitmix64 finalizer — full-avalanche, stable everywhere. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
  }

  /** Bucket id of one value — shared by the fanout writer and the
    * scan-planning pruner (their agreement is the correctness
    * contract). Longs/ints/dates hash via splitmix64 of the long
    * value; strings via FNV-1a over UTF-8 bytes. */
  def bucketOf(v: Any, n: Int): Int = {
    val h = v match {
      case l: Long => mix64(l)
      case i: Int => mix64(i.toLong)
      case s: String => fnv1a64(s.getBytes("UTF-8"))
      case u: org.apache.spark.unsafe.types.UTF8String =>
        fnv1a64(u.getBytes)
      case d: java.sql.Date => mix64(d.toLocalDate.toEpochDay)
      case d: java.time.LocalDate => mix64(d.toEpochDay)
      case other => throw new IllegalArgumentException(
        s"unbucketable value type: ${other.getClass.getName}")
    }
    java.lang.Math.floorMod(h, n.toLong).toInt
  }

  // ---- row-level tuple evaluation (executor-side, per writer) ------

  /** Compile the spec against the WRITE schema once per task; the
    * returned function maps each row to its canonical partition tuple
    * (the manifest `parts` map). Null column values land in the
    * literal tuple value "null" — their own partition, like Iceberg's
    * null partition. */
  def evaluator(spec: Seq[PartField],
      schema: StructType): InternalRow => Map[String, String] = {
    if (spec.isEmpty) return _ => Map.empty
    val compiled = spec.map { f =>
      val idx = schema.fieldIndex(f.name(schema))
      val dt = schema.fields(idx).dataType
      (f, idx, dt)
    }
    row => compiled.map { case (f, idx, dt) =>
      if (row.isNullAt(idx)) f.key -> "null"
      else f.key -> (f.kind match {
        case "identity" => dt match {
          case StringType => row.getUTF8String(idx).toString
          case IntegerType | DateType => row.getInt(idx).toString
          case LongType => row.getLong(idx).toString
          case ShortType => row.getShort(idx).toString
          case ByteType => row.getByte(idx).toString
          case BooleanType => row.getBoolean(idx).toString
          case other => throw new IllegalStateException(
            s"identity on ${other.simpleString}")
        }
        case "days" => dt match {
          // timestamps are micros since epoch; dates already days
          case TimestampType =>
            Math.floorDiv(row.getLong(idx), 86400000000L).toString
          case DateType => row.getInt(idx).toString
          case other => throw new IllegalStateException(
            s"days on ${other.simpleString}")
        }
        case "bucket" => (dt match {
          case StringType => bucketOf(row.getUTF8String(idx), f.n)
          case IntegerType | DateType => bucketOf(row.getInt(idx), f.n)
          case LongType => bucketOf(row.getLong(idx), f.n)
          case other => throw new IllegalStateException(
            s"bucket on ${other.simpleString}")
        }).toString
        case other => throw new IllegalStateException(s"kind $other")
      })
    }.toMap
  }

  /** The spec field's column resolved against a possibly-renamed
    * schema: partition columns are tracked by NAME at create time and
    * bronze RENAME refuses to rename a partition column (checked in
    * the catalog), so the create-time name is authoritative. */
  private implicit class FieldOps(private val f: PartField) extends AnyVal {
    def name(schema: StructType): String =
      schema.fields.find(_.name.equalsIgnoreCase(f.col))
        .map(_.name).getOrElse(throw new IllegalArgumentException(
          s"partition column ${f.col} missing from write schema"))
  }
}

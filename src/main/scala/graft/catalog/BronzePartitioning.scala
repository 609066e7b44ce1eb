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
  * The spec is fixed at CREATE TABLE (`_graft_partition.json` in the
  * table dir) — partition-spec evolution is out of scope. Writers that
  * bypass the fanout path (plain-dir helpers, row-level rewrites,
  * compaction) produce files WITHOUT a tuple; such files are simply
  * never partition-pruned — correctness never depends on the tuple
  * being present.
  *
  * The bucket hash is this catalog's own (splitmix64 / FNV-1a — byte
  * compatibility with Iceberg's murmur3 is NOT claimed); writer and
  * pruner share [[bucketOf]], which is the only consistency that
  * matters.
  */
object BronzePartitioning {

  private val SpecFile = "_graft_partition.json"

  /** One transform of the spec: `kind` ∈ identity | days | bucket. */
  final case class PartField(kind: String, col: String, n: Int = 0) {
    /** The manifest-entry `parts` key this transform writes. */
    def key: String = kind match {
      case "identity" => col.toLowerCase
      case "days" => s"days_${col.toLowerCase}"
      case "bucket" => s"bucket_${col.toLowerCase}"
    }
  }

  // ---- spec persistence --------------------------------------------

  def write(tableDir: Path, spec: Seq[PartField]): Unit = {
    val json = spec.map { f =>
      s"""{"kind":"${f.kind}","col":"${f.col}","n":${f.n}}"""
    }.mkString("[", ",", "]")
    Files.writeString(tableDir.resolve(SpecFile), json)
  }

  def read(tableDir: Path): Seq[PartField] = {
    val p = tableDir.resolve(SpecFile)
    if (!Files.isRegularFile(p)) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(p))
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { e =>
      PartField(e.get("kind").asText(), e.get("col").asText(),
        Option(e.get("n")).map(_.asInt()).getOrElse(0))
    }.toSeq
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
      case PartField("identity", c, _) => Expressions.identity(c)
      case PartField("days", c, _) => Expressions.days(c)
      case PartField("bucket", c, n) => Expressions.bucket(n, c)
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

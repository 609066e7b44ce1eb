package graft.catalog

import graft.catalog.SnapshotLog.{ColStats, FileEntry}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MANIFEST-STATS FILE SKIPPING — the scan-planning half of the
  * snapshot log's per-file column statistics (Iceberg's
  * `lower_bounds`/`upper_bounds` evaluation, Spark-side): before a
  * bronze table's file list reaches the parquet scan, each pushed
  * predicate is evaluated against every file's footer-scraped
  * min/max/null-count, and files that PROVABLY contain no matching row
  * are dropped from the plan. At 100 TB this is the difference between
  * "open every file's footer at execution time" and "never even
  * schedule 95% of the files": manifest entries are metadata the
  * DRIVER already holds, so skipping costs zero I/O.
  *
  * Strictly conservative by construction: a file is dropped only when
  * a filter proves emptiness from its bounds — absent stats, unknown
  * domains, untranslatable predicates, nested columns, non-binary
  * collations all keep the file. Wrong answers are impossible; only
  * missed skipping is.
  *
  * Column resolution follows the data's own rule: by parquet FIELD ID
  * when both the table schema and the stats entry carry one (so bounds
  * survive RENAME COLUMN exactly like the column's bytes do), by
  * lower-cased name otherwise — and never when both sides carry ids
  * that disagree (a renamed-away name must not borrow another
  * column's bounds).
  */
object BronzePruning {

  import BronzePartitioning.PartField

  /** Entries whose files may contain rows matching ALL of `filters`.
    * `spec` (the table's partition transforms) adds tuple pruning on
    * top of stats: bucket-equality is the one case min/max can never
    * express — a bucket(n, col) file holds n-th of the key space, and
    * `col = lit` keeps only files whose recorded bucket equals
    * `bucketOf(lit)`. Identity/days tuples also prune (belt over the
    * stats braces, e.g. files whose footers were unreadable). */
  def survivors(entries: Seq[FileEntry], schema: StructType,
      filters: Seq[Filter], spec: Seq[PartField] = Seq.empty)
      : Seq[FileEntry] =
    entries.filter(e => filters.forall(f => mayMatch(e, schema, spec, f)))

  // ---- per-filter evaluation ---------------------------------------

  private def mayMatch(e: FileEntry, schema: StructType,
      spec: Seq[PartField], f: Filter): Boolean = f match {
    case And(l, r) =>
      mayMatch(e, schema, spec, l) && mayMatch(e, schema, spec, r)
    case Or(l, r) =>
      mayMatch(e, schema, spec, l) || mayMatch(e, schema, spec, r)
    // compare() yields sign(lit − bound): a matching row can exist
    // only if lit ≥ min (for =), lit ≤ max (for =), min < lit (for <),
    // max > lit (for >), …
    case EqualTo(a, v) => valueMayMatch(e, schema, a, v,
      lo => lo >= 0, hi => hi <= 0) && partsEq(e, schema, spec, a, v)
    case EqualNullSafe(a, null) => nullsMayMatch(e, schema, a)
    case EqualNullSafe(a, v) => valueMayMatch(e, schema, a, v,
      lo => lo >= 0, hi => hi <= 0) && partsEq(e, schema, spec, a, v)
    case GreaterThan(a, v) => valueMayMatch(e, schema, a, v,
      _ => true, hi => hi < 0) && partsRange(e, schema, spec, a, v, ">")
    case GreaterThanOrEqual(a, v) => valueMayMatch(e, schema, a, v,
      _ => true, hi => hi <= 0) && partsRange(e, schema, spec, a, v, ">=")
    case LessThan(a, v) => valueMayMatch(e, schema, a, v,
      lo => lo > 0, _ => true) && partsRange(e, schema, spec, a, v, "<")
    case LessThanOrEqual(a, v) => valueMayMatch(e, schema, a, v,
      lo => lo >= 0, _ => true) && partsRange(e, schema, spec, a, v, "<=")
    case In(a, vs) =>
      if (vs.isEmpty) false
      else vs.exists(v => valueMayMatch(e, schema, a, v,
        lo => lo >= 0, hi => hi <= 0) && partsEq(e, schema, spec, a, v))
    case IsNull(a) => nullsMayMatch(e, schema, a) &&
      partsNull(e, spec, a, wantNull = true)
    case IsNotNull(a) =>
      (resolve(e, schema, a) match {
        // provably ALL null (null count == file row count) → no row
        case Some(cs) =>
          !(e.rows.isDefined && cs.nulls.isDefined &&
            cs.nulls == e.rows)
        case None => true
      }) && partsNull(e, spec, a, wantNull = false)
    case StringStartsWith(a, p) => startsWithMayMatch(e, schema, a, p)
    case _ => true // Not / EndsWith / Contains / unknown: no pruning
  }

  // ---- partition-tuple evaluation ----------------------------------

  /** Transforms of `spec` that key on column `attr`, paired with the
    * file's recorded tuple value (absent → that transform can't
    * prune this file). */
  private def partValues(e: FileEntry, spec: Seq[PartField],
      attr: String): Seq[(PartField, String)] =
    if (e.parts.isEmpty) Seq.empty
    else spec.filter(_.col.equalsIgnoreCase(attr))
      .flatMap(f => e.parts.get(f.key).map(f -> _))

  /** Can `attr = v` hold in the file, per its partition tuple? A
    * single-tuple file with value "null" holds ONLY nulls in the
    * column — no value predicate matches. */
  private def partsEq(e: FileEntry, schema: StructType, spec: Seq[PartField],
      attr: String, v: Any): Boolean =
    partValues(e, spec, attr).forall { case (f, pv) =>
      if (pv == "null") false
      else f.kind match {
        case "bucket" =>
          bucketOfLiteral(v, f.n).forall(_.toString == pv)
        case "identity" =>
          identityRender(v).forall(_ == pv)
        case "days" =>
          dayOfLiteral(schema, attr, v)
            .forall(d => pv.toLongOption.contains(d))
        case _ => true
      }
    }

  /** Range predicates only prune through the ORDERED transforms
    * (days); bucket/identity hashes and strings stay conservative. */
  private def partsRange(e: FileEntry, schema: StructType,
      spec: Seq[PartField], attr: String, v: Any, op: String): Boolean =
    partValues(e, spec, attr).forall { case (f, pv) =>
      if (pv == "null") false // value comparisons never match null
      else if (f.kind != "days") true
      else (for {
        d <- dayOfLiteral(schema, attr, v)
        p <- pv.toLongOption
      } yield op match {
        // file day p vs literal day d: rows can satisfy ts > v only
        // if p >= d (rows of day d can still exceed v within the day)
        case ">" | ">=" => p >= d
        case "<" => p <= d // rows of day d can still be below v
        case "<=" => p <= d
        case _ => true
      }).getOrElse(true)
    }

  private def partsNull(e: FileEntry, spec: Seq[PartField], attr: String,
      wantNull: Boolean): Boolean =
    partValues(e, spec, attr).forall { case (_, pv) =>
      if (wantNull) pv == "null" else pv != "null"
    }

  /** bucketOf for a FILTER literal (pre-canonicalized types only —
    * None keeps the file). Must agree with the writer's evaluator:
    * ints/longs/dates hash by long value, strings by utf8 bytes. */
  private def bucketOfLiteral(v: Any, n: Int): Option[Int] = v match {
    case null => None
    case x: java.lang.Integer => Some(BronzePartitioning.bucketOf(x.intValue, n))
    case x: java.lang.Long => Some(BronzePartitioning.bucketOf(x.longValue, n))
    case s: String => Some(BronzePartitioning.bucketOf(s, n))
    case d: java.sql.Date =>
      Some(BronzePartitioning.bucketOf(d.toLocalDate.toEpochDay.toInt, n))
    case d: java.time.LocalDate =>
      Some(BronzePartitioning.bucketOf(d.toEpochDay.toInt, n))
    case _ => None
  }

  /** The identity-transform rendering of a filter literal — must agree
    * with the writer's evaluator (longs in decimal, strings raw,
    * dates as epoch days, booleans true/false). */
  private def identityRender(v: Any): Option[String] = v match {
    case null => None
    case x: java.lang.Byte => Some(x.toString)
    case x: java.lang.Short => Some(x.toString)
    case x: java.lang.Integer => Some(x.toString)
    case x: java.lang.Long => Some(x.toString)
    case x: java.lang.Boolean => Some(x.toString)
    case s: String => Some(s)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case _ => None
  }

  /** Epoch day of a filter literal on a days()-partitioned column;
    * for DATE columns the tuple is the day number itself. */
  private def dayOfLiteral(schema: StructType, attr: String,
      v: Any): Option[Long] = v match {
    case null => None
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(Math.floorDiv(
        i.getEpochSecond * 1000000L + i.getNano / 1000L, 86400000000L))
    case i: java.time.Instant =>
      Some(Math.floorDiv(
        i.getEpochSecond * 1000000L + i.getNano / 1000L, 86400000000L))
    case _ => None
  }

  /** Can a NON-NULL value v with `loOk(sign(v ⋄ min))` and
    * `hiOk(sign(v ⋄ max))` exist in the file? False only on proof. */
  private def valueMayMatch(e: FileEntry, schema: StructType, attr: String,
      v: Any, loOk: Int => Boolean, hiOk: Int => Boolean): Boolean =
    resolve(e, schema, attr) match {
      case None => true
      case Some(cs) =>
        if (allNull(e, cs)) false // a value filter never matches null
        else (for {
          dt <- dataTypeOf(schema, attr)
          (dom, lit) <- canon(v, dt)
          lo <- cs.min; hi <- cs.max
          cLo <- compare(dom, lit, cs.typ, lo)
          cHi <- compare(dom, lit, cs.typ, hi)
        } yield loOk(cLo) && hiOk(cHi)).getOrElse(true)
    }

  private def nullsMayMatch(e: FileEntry, schema: StructType,
      attr: String): Boolean =
    resolve(e, schema, attr) match {
      case Some(cs) => !cs.nulls.contains(0L)
      case None => true
    }

  private def allNull(e: FileEntry, cs: ColStats): Boolean =
    e.rows.isDefined && cs.nulls.isDefined && cs.nulls == e.rows

  /** StartsWith pruning, ASCII-only: truncating at p.length is then
    * guaranteed order-preserving in BOTH UTF-16 and UTF-8 binary
    * order (non-ASCII bounds could split a code point and mis-prune). */
  private def startsWithMayMatch(e: FileEntry, schema: StructType,
      attr: String, p: String): Boolean =
    resolve(e, schema, attr) match {
      case None => true
      case Some(cs) =>
        if (allNull(e, cs)) false
        else if (cs.typ != "s" || p == null || !isAscii(p)) true
        else (for {
          lo <- cs.min; hi <- cs.max
          if isAscii(lo) && isAscii(hi)
        } yield {
          // s startsWith p ⇒ s.take(|p|) == p, and lexicographic order
          // is monotone under truncation: min.take(|p|) ≤ p ≤
          // max.take(|p|) is necessary for any such s in [min, max]
          lo.take(p.length) <= p && p <= hi.take(p.length)
        }).getOrElse(true)
    }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 128) return false; i += 1 }
    true
  }

  // ---- column resolution -------------------------------------------

  private def dataTypeOf(schema: StructType, attr: String): Option[DataType] =
    schema.fields.find(_.name.equalsIgnoreCase(attr)).map(_.dataType)

  private def resolve(e: FileEntry, schema: StructType,
      attr: String): Option[ColStats] = {
    if (e.stats.isEmpty || attr.contains(".")) return None
    val field = schema.fields.find(_.name.equalsIgnoreCase(attr))
      .getOrElse(return None)
    val id: Option[Long] =
      if (field.metadata.contains("parquet.field.id"))
        Some(field.metadata.getLong("parquet.field.id"))
      else None
    id.flatMap(i => e.stats.values.find(_.fieldId.contains(i)))
      .orElse(e.stats.get(field.name.toLowerCase).filter(c =>
        (id, c.fieldId) match {
          case (Some(i), Some(j)) => i == j // both id-ed: must agree
          case _ => true // either side id-less: names rule
        }))
  }

  // ---- literal canonicalization + typed comparison -----------------

  /** Spark filter literal → (stat domain, canonical value); None =
    * can't participate in pruning (kept conservative). */
  private def canon(v: Any, dt: DataType): Option[(String, Any)] = v match {
    case null => None
    case n: java.lang.Byte => Some(("l", n.longValue))
    case n: java.lang.Short => Some(("l", n.longValue))
    case n: java.lang.Integer => Some(("l", n.longValue))
    case n: java.lang.Long => Some(("l", n.longValue))
    case n: java.lang.Float =>
      if (n.isNaN || n.isInfinite) None else Some(("d", n.doubleValue))
    case n: java.lang.Double =>
      if (n.isNaN || n.isInfinite) None else Some(("d", n.doubleValue))
    case s: String =>
      // binary-collated strings only: stats order is unsigned-byte
      if (dt == StringType) Some(("s", s)) else None
    case d: java.sql.Date => Some(("l", d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(("l", d.toEpochDay))
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(("l", i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case i: java.time.Instant =>
      Some(("l", i.getEpochSecond * 1000000L + i.getNano / 1000L))
    case _ => None // decimals, binary, intervals, NTZ: no pruning
  }

  /** sign(lit ⋄ statBound) in a common domain; None = incomparable. */
  private def compare(litDom: String, lit: Any, statTyp: String,
      bound: String): Option[Int] = (litDom, statTyp) match {
    case ("s", "s") =>
      Some(UTF8String.fromString(lit.asInstanceOf[String])
        .compareTo(UTF8String.fromString(bound)))
    case ("s", _) | (_, "s") => None
    case _ => // numeric × numeric: exact via BigDecimal
      try {
        val l = lit match {
          case x: Long => java.math.BigDecimal.valueOf(x)
          case x: Double => new java.math.BigDecimal(x)
          case _ => return None
        }
        val b = statTyp match {
          case "l" => java.math.BigDecimal.valueOf(bound.toLong)
          case "d" =>
            val d = bound.toDouble
            if (d.isNaN || d.isInfinite) return None
            new java.math.BigDecimal(d)
          case _ => return None
        }
        Some(l.compareTo(b))
      } catch { case _: NumberFormatException => None }
  }
}

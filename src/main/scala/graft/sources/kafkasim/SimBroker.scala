package graft.sources.kafkasim

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ArrayBuffer

/** A minimal on-disk stand-in for a Kafka cluster: topics with numbered
  * partitions, each partition an append-only log of (key, value,
  * timestamp) records addressed by offset, stored as base-offset-named
  * segment files (the same layout idea as Kafka's log dir).
  *
  * Layout: `<root>/<topic>-<partition>/segment-<baseOffset20d>.log`
  * Record framing per entry:
  *   [keyLen: int, -1=null][key][valueLen: int][value][timestampMs: long]
  *
  * Retention expiry (`expireThrough`) deletes whole segments below the
  * requested offset — exactly how Kafka retention creates the
  * "earliest offset moved past the consumer's checkpoint" data-loss
  * scenario the reference's four monitors exist to detect.
  *
  * Thread-safety: single-writer per partition (like a broker's log);
  * readers are positional and independent.
  */
object SimBroker {

  final case class SimRecord(partition: Int, offset: Long,
      key: Array[Byte], value: Array[Byte], timestampMs: Long)

  private def partDir(root: String, topic: String, partition: Int): Path =
    Paths.get(root, s"$topic-$partition")

  private def segPath(dir: Path, base: Long): Path =
    dir.resolve(f"segment-$base%020d.log")

  private def segBase(p: Path): Long =
    p.getFileName.toString.stripPrefix("segment-").stripSuffix(".log").toLong

  def createTopic(root: String, topic: String, partitions: Int): Unit =
    (0 until partitions).foreach { p =>
      Files.createDirectories(partDir(root, topic, p))
    }

  /** All topics present under the broker root (dir names are
    * `<topic>-<partition>`), for `subscribePattern` resolution. */
  def listTopics(root: String): Seq[String] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return Seq.empty
    val s = Files.list(rootPath)
    try {
      val buf = ArrayBuffer.empty[String]
      val it = s.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        val i = name.lastIndexOf('-')
        if (i > 0 && name.substring(i + 1).nonEmpty
            && name.substring(i + 1).forall(_.isDigit))
          buf += name.substring(0, i)
      }
      buf.distinct.sorted.toSeq
    } finally s.close()
  }

  def partitions(root: String, topic: String): Seq[Int] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return Seq.empty
    val s = Files.list(rootPath)
    try {
      val buf = ArrayBuffer.empty[Int]
      val it = s.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith(s"$topic-")) {
          val suffix = name.stripPrefix(s"$topic-")
          if (suffix.nonEmpty && suffix.forall(_.isDigit)) buf += suffix.toInt
        }
      }
      buf.sorted.toSeq
    } finally s.close()
  }

  /** Append a batch as one new segment; returns the batch's base offset. */
  def append(root: String, topic: String, partition: Int,
      records: Seq[(Option[Array[Byte]], Array[Byte], Long)]): Long = {
    val dir = partDir(root, topic, partition)
    Files.createDirectories(dir)
    val base = latest(root, topic, partition)
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(segPath(dir, base).toFile)))
    try records.foreach { case (key, value, ts) =>
      key match {
        case Some(k) => out.writeInt(k.length); out.write(k)
        case None    => out.writeInt(-1)
      }
      out.writeInt(value.length); out.write(value)
      out.writeLong(ts)
    } finally out.close()
    base
  }

  /** Earliest retained offset (base of the first surviving segment). */
  def earliest(root: String, topic: String, partition: Int): Long = {
    val segs = sortedSegs(root, topic, partition)
    if (segs.isEmpty) 0L else segBase(segs.head)
  }

  /** Next offset to be produced (end of the log). */
  def latest(root: String, topic: String, partition: Int): Long = {
    val segs = sortedSegs(root, topic, partition)
    if (segs.isEmpty) 0L
    else segBase(segs.last) + countRecords(segs.last)
  }

  /** Read [from, until) for one partition. Segments wholly outside the
    * range are skipped WITHOUT deserializing (each segment spans
    * [its base, next segment's base) — appends always start a new
    * segment at the current latest), so a range split into N input
    * partitions costs ~1× the I/O, not N×. */
  def read(root: String, topic: String, partition: Int,
      from: Long, until: Long): Iterator[SimRecord] = {
    val segs = sortedSegs(root, topic, partition)
    val bases = segs.map(segBase)
    segs.indices.iterator.flatMap { si =>
      val base = bases(si)
      val knownEnd = if (si + 1 < bases.size) Some(bases(si + 1)) else None
      if (base >= until || knownEnd.exists(_ <= from)) Iterator.empty
      else readSegment(segs(si)).zipWithIndex.collect {
        case ((k, v, ts), i) if base + i >= from && base + i < until =>
          SimRecord(partition, base + i, k, v, ts)
      }.iterator
    }
  }

  /** Simulate retention: drop whole segments whose records all sit
    * below `offset`. The new earliest is the base of the first
    * surviving segment. */
  def expireThrough(root: String, topic: String, partition: Int,
      offset: Long): Unit =
    sortedSegs(root, topic, partition).foreach { seg =>
      if (segBase(seg) + countRecords(seg) <= offset)
        Files.delete(seg)
    }

  // ---- internals ----

  private def sortedSegs(root: String, topic: String, partition: Int): Seq[Path] = {
    val dir = partDir(root, topic, partition)
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      val buf = ArrayBuffer.empty[Path]
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("segment-")) buf += p
      }
      buf.sortBy(segBase).toSeq
    } finally s.close()
  }

  private def countRecords(seg: Path): Long = readSegment(seg).size.toLong

  private def readSegment(seg: Path): Seq[(Array[Byte], Array[Byte], Long)] = {
    val in = new DataInputStream(new BufferedInputStream(
      new FileInputStream(seg.toFile)))
    val buf = ArrayBuffer.empty[(Array[Byte], Array[Byte], Long)]
    try {
      while (true) {
        val keyLen =
          try in.readInt()
          catch { case _: EOFException => return buf.toSeq }
        val key = if (keyLen < 0) null else {
          val k = new Array[Byte](keyLen); in.readFully(k); k
        }
        val valueLen = in.readInt()
        val value = new Array[Byte](valueLen); in.readFully(value)
        val ts = in.readLong()
        buf += ((key, value, ts))
      }
      buf.toSeq
    } finally in.close()
  }
}

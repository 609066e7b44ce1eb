package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/** The stream-staging cache key must track the CONTENT of the source
  * events.parquet, not just the directory path: the driver regenerates
  * /root/testdata between rounds, and a path-only key would silently
  * replay stale staged files (the round-10 failure mode). */
class StagingCacheSpec extends AnyFunSuite {

  private def mkSource(): String = {
    val dir = Files.createTempDirectory("staging_fp").toString
    Files.write(Paths.get(s"$dir/events.parquet"), Array[Byte](1, 2, 3))
    dir
  }

  test("fingerprint changes when the source file is rewritten") {
    val dir = mkSource()
    val f = Paths.get(s"$dir/events.parquet")
    val fp0 = graft.streaming.StreamingOps.sourceFingerprint(dir)
    // same content+mtime → same fingerprint (cache hit)
    assert(graft.streaming.StreamingOps.sourceFingerprint(dir) == fp0)
    // regen: new bytes, new mtime → new fingerprint (restage)
    Files.write(f, Array[Byte](9, 9, 9, 9))
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(Files.getLastModifiedTime(f).toMillis + 60000L))
    assert(graft.streaming.StreamingOps.sourceFingerprint(dir) != fp0)
  }

  test("fingerprint changes on mtime alone (same size)") {
    val dir = mkSource()
    val f = Paths.get(s"$dir/events.parquet")
    val fp0 = graft.streaming.StreamingOps.sourceFingerprint(dir)
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(Files.getLastModifiedTime(f).toMillis + 60000L))
    assert(graft.streaming.StreamingOps.sourceFingerprint(dir) != fp0)
  }

  test("fingerprint covers directory-shaped parquet sources") {
    val dir = Files.createTempDirectory("staging_fp_dir").toString
    val sub = Paths.get(s"$dir/events.parquet")
    Files.createDirectories(sub)
    Files.write(sub.resolve("part-0.parquet"), Array[Byte](1))
    val fp0 = graft.streaming.StreamingOps.sourceFingerprint(dir)
    Files.write(sub.resolve("part-1.parquet"), Array[Byte](2))
    assert(graft.streaming.StreamingOps.sourceFingerprint(dir) != fp0)
  }
}

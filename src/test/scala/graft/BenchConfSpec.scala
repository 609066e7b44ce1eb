package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SPARK_GRAFT_CONF dial parser (the r15 ADVICE low): the old
  * bare-comma split truncated any comma-VALUED conf. The parser now
  * honors `;` as an explicit separator and, without one, splits on
  * commas only when the next token is another `key=`. */
class BenchConfSpec extends AnyFunSuite {

  test("plain comma-separated k=v pairs (the documented shape)") {
    assert(Bench.parseConf(
      "spark.graft.ivfNprobe=7,spark.graft.pqShortlist=96") ===
      Seq("spark.graft.ivfNprobe" -> "7",
        "spark.graft.pqShortlist" -> "96"))
  }

  test("a comma-valued conf round-trips when ; separates") {
    assert(Bench.parseConf(
      "spark.sql.files.ignoreCorruptFiles=true;" +
        "spark.executor.extraJavaOptions=-XX:+UseG1GC,-Xss4m") ===
      Seq("spark.sql.files.ignoreCorruptFiles" -> "true",
        "spark.executor.extraJavaOptions" -> "-XX:+UseG1GC,-Xss4m"))
  }

  test("a TRAILING comma-valued conf survives even comma separation") {
    // the comma inside the value is not followed by key=, so it does
    // not split — the old parser truncated the value at the comma
    assert(Bench.parseConf(
      "spark.graft.ivfNprobe=7,spark.x.list=a,b,c") ===
      Seq("spark.graft.ivfNprobe" -> "7",
        "spark.x.list" -> "a,b,c"))
  }

  test("whitespace around ;-separated entries is trimmed") {
    assert(Bench.parseConf(" a.b=1 ; c.d=2 ") ===
      Seq("a.b" -> "1", "c.d" -> "2"))
  }

  test("entries without = are dropped, empty input yields nothing") {
    assert(Bench.parseConf("noequals;a.b=1") === Seq("a.b" -> "1"))
    assert(Bench.parseConf("") === Nil)
  }

  test("key and value are trimmed INDIVIDUALLY (r16 ADVICE: 'a = b' " +
      "used to produce key 'a ', which silently never took effect)") {
    assert(Bench.parseConf("a.b = 1") === Seq("a.b" -> "1"))
    assert(Bench.parseConf("a.b = 1 ; c.d= 2") ===
      Seq("a.b" -> "1", "c.d" -> "2"))
  }

  test("keys containing '-' are recognized as comma split points") {
    // the old lookahead charset had no '-', so the second conf glued
    // into the first value
    assert(Bench.parseConf("a.b=1,spark.my-dialed.conf=2") ===
      Seq("a.b" -> "1", "spark.my-dialed.conf" -> "2"))
  }
}

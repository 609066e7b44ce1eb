package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom exec: latest right row at-or-before each left row, else null") {
    val left = Seq((1L, 10L, "e1"), (1L, 5L, "e2"), (2L, 1L, "e3"),
      (3L, 9L, "e4")).toDF("k", "t", "ev")
    val right = Seq((1L, 4L, "a"), (1L, 7L, "b"), (1L, 12L, "late"),
      (2L, 2L, "c")).toDF("rk", "rt", "v")
    val got = AsOf.join(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("ev"), col("v"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)).orNull))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("e1", "b"),   // t=10: latest right ≤ 10 is (7,b); (12,late) excluded
      ("e2", "a"),   // t=5: (4,a)
      ("e3", null),  // t=1: right starts at 2 → nothing at-or-before
      ("e4", null))) // key 3 has no right rows
  }

  test("custom exec: equal timestamps match inclusively") {
    val left = Seq((1L, 7L, "x")).toDF("k", "t", "ev")
    val right = Seq((1L, 7L, "same")).toDF("rk", "rt", "v")
    val got = AsOf.join(spark, left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("v")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("same"))
  }

  test("plan shows the custom exec with exchanges/sorts inserted") {
    val left = Seq((1L, 10L, "e1")).toDF("k", "t", "ev")
    val right = Seq((1L, 4L, "a")).toDF("rk", "rt", "v")
    val df = AsOf.join(spark, left, right,
      col("k"), col("rk"), col("t"), col("rt"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"))
    assert(plan.contains("Sort"), s"expected sorts inserted:\n$plan")
  }
}

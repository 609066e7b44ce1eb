package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Load-independent profile of one query: job/stage counts and total
  * executor task time (sum over tasks — co-tenant noise inflates wall
  * clock but task time only counts our own cpu+io). Usage:
  * `sbt "runMain graft.StageProfile <sfDir> <query> [conf:k=v ...]"`. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("s12_pq_adc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stageprofile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).filter(_.startsWith("conf:")).foreach { a =>
      val kv = a.stripPrefix("conf:").split("=", 2)
      spark.conf.set(kv(0), kv(1))
    }
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async — give it a moment to drain
    Thread.sleep(1000)
    println(f"""{"query":"$name","wall_sec":$wall%.2f,""" +
      s""""jobs":${jobs.get},"stages":${stages.get},""" +
      s""""tasks":${tasks.get},""" +
      f""""task_time_sec":${taskTimeMs.get / 1e3}%.2f}""")
    spark.stop()
  }
}

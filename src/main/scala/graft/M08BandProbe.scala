package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Dev probe (r19, VERDICT item 5): would a TIGHTER occupancy rule —
  * band-space ≥ 8n ("occupancy-1/8") instead of the shipped ≥ 4n —
  * for the video stripe's perceptual-dedup geometry shed m08's ×100
  * pair tail (retention 2.87, the one disclosed super-linear output)
  * without losing true near-dup pairs?
  *
  * The two rules choose the same geometry at ×1/×10/×30 and diverge
  * exactly at ×100 (n = 166,600: 4n = 666k fits 2^20 → 3 bands,
  * hamming ≤ 2; 8n = 1.33M does not → 2 bands, hamming ≤ 1), so the
  * probe reads the cached ScaleUp corpora and emits, per (k, bands):
  * output pairs, the SAME-COPY vs CROSS-COPY split (ScaleUp copies
  * are vocabulary-disjoint, so cross-copy pairs are pure hash luck —
  * the population a tighter band exists to shed; same-copy pairs are
  * the preserved true structure), and the hamming histogram (what a
  * threshold step from 2 to 1 actually forfeits). Counts are
  * deterministic; wall seconds ride along for context only. */
object M08BandProbe {

  private val CopyShift = 100000000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val decades = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 100))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-m08-band-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    decades.foreach { k =>
      val dir =
        if (k == 1) sfDir
        else s"${System.getProperty("java.io.tmpdir")}/graft_scaleup_x$k"
      require(k == 1 || java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_COMPLETE")),
        s"no cached ScaleUp corpus at $dir — run graft.ScaleUp first")
      val video = new Tables(spark, dir).documents
        .filter(col("doc_id") % 3 === 2)
      val n = video.count()
      val shipped = Dedup.adaptiveSimHashBands(Multimodal.PHashBits, n)
      val tight = Dedup.adaptiveSimHashBands(Multimodal.PHashBits, 2 * n)
      Seq("shipped_4n" -> shipped, "occupancy_8n" -> tight)
        .distinct.foreach { case (rule, bands) =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val hist = Multimodal.perceptualPairsOf(video, bands)
            .withColumn("same_copy",
              (col("id_a") / CopyShift).cast("long")
                === (col("id_b") / CopyShift).cast("long"))
            .groupBy(col("hamming"), col("same_copy"))
            .agg(count(lit(1)).as("pairs"))
            .collect()
          val sec = (System.nanoTime() - t0) / 1e9
          val total = hist.map(_.getAs[Long]("pairs")).sum
          val same = hist.filter(_.getAs[Boolean]("same_copy"))
            .map(_.getAs[Long]("pairs")).sum
          val hj = hist.sortBy(r => (r.getAs[Long]("hamming"),
              !r.getAs[Boolean]("same_copy")))
            .map(r => s"""{"hamming":${r.getAs[Long]("hamming")},""" +
              s""""same_copy":${r.getAs[Boolean]("same_copy")},""" +
              s""""pairs":${r.getAs[Long]("pairs")}}""")
            .mkString("[", ",", "]")
          println(s"""{"probe":"m08_band_rule","k":$k,"n_video":$n,""" +
            s""""rule":"$rule","bands":$bands,""" +
            s""""hamming_max":${bands - 1},"pairs":$total,""" +
            s""""same_copy":$same,"cross_copy":${total - same},""" +
            s""""sec":${f"$sec%.1f"},"hist":$hj}""")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Dev probe (r19 follow-through): m08's ×100 pair tail was
  * root-caused to hamming-space CROWDING — short-doc signatures
  * crowd the mostly-zero corner of the 60-bit space — and the
  * then-documented scale path was "a WIDER grid (more phash
  * positions = more signature entropy)". This probe puts that claim
  * under the same build-and-measure discipline as the band dial
  * ([[M08BandProbe]]) BEFORE shipping a schema change, because the
  * mechanism cuts both ways:
  *
  *   - a wider grid makes dense random signatures collide
  *     astronomically less (P[hamming ≤ 3] over 120 bits is ~1e-12×
  *     P[hamming ≤ 2] over 60 for coin-flip words), BUT
  *   - a sub-grid doc (fewer payload blocks than grid positions)
  *     fills the SAME few positions in any width — its signature
  *     stays mostly zero — while the lossless-banding threshold
  *     LOOSENS with width (bands−1 = 3 at 120 bits vs 2 at 60), so
  *     the sparse-signature crowd can get WORSE, not better;
  *   - the direct fix for sparse crowding is a GRID-FILL FLOOR
  *     (payload must cover every position at least once — real
  *     pHash's fixed-size downscale has no empty cells by
  *     construction; a sub-grid payload has no meaningful perceptual
  *     signature and belongs in the exact-checksum tier).
  *
  * Four variants per decade, counts deterministic:
  * shipped60 (m08 verbatim), wide120 (two 60-bit words, word-aligned
  * bands), floor60 (shipped + nb ≥ 60), widefloor120 (wide + nb ≥
  * 120). Per variant: pairs, same-copy/cross-copy split (ScaleUp
  * copies are vocabulary-disjoint → cross-copy = pure hash luck),
  * hamming histogram, and the same-copy pairs a floor forfeits. One
  * diagnostics line per decade pins the mechanism: block-count
  * strata and the 60-bit signature popcount histogram (the
  * mostly-zero corner, observed directly). */
object M08WideGridProbe {

  private val CopyShift = 100000000L
  private val WordBits = 60 // the cross-engine-exact packing width

  /** Per-doc signature over a `words`-word grid: block j → position
    * j mod (words·60), parity per position, word w packs positions
    * [60w, 60w+59] — [[Multimodal.perceptualHashesOf]] generalized
    * to multiple words (words = 1 reproduces it bit-for-bit). Keeps
    * nb (payload blocks) for floor filtering and diagnostics. */
  private def hashesWide(docs: DataFrame, words: Int): DataFrame = {
    val grid = words * WordBits
    val sigCols = (0 until words).map { w =>
      coalesce(sum(when(col("pos") >= w * WordBits
          && col("pos") < (w + 1) * WordBits,
        expr(s"par * cast(pow(2, pos - ${w * WordBits}) as bigint)"))),
        lit(0L)).cast("long").as(s"ph$w")
    }
    docs
      .withColumn("nb",
        greatest(lit(1), expr("cast((length(text) + 15) div 16 as int)")))
      .select(col("doc_id"), col("nb"),
        explode(expr("sequence(0, nb - 1)")).as("j"), col("text"))
      .withColumn("pos", (col("j") % grid).cast("int"))
      .withColumn("bit",
        (conv(substring(md5(expr("substr(text, j * 16 + 1, 16)")), 1, 1),
          16, 10).cast("int") >= 8).cast("int"))
      .groupBy(col("doc_id"), col("nb"), col("pos"))
      .agg((sum(col("bit")) % 2).as("par"))
      .groupBy(col("doc_id"), col("nb"))
      .agg(sigCols.head, sigCols.tail: _*)
  }

  /** Word-aligned adaptive band rule for a `words`-word grid: the
    * largest candidate band count whose bandBits fits inside one
    * word at a word-aligned offset (so every band is one shift+mod
    * on one BIGINT — the same cross-engine-exact arithmetic the
    * 60-bit convention uses) and whose band space holds the corpus
    * at occupancy ≤ 1/4 ([[Dedup.adaptiveSimHashBands]]'s rule). */
  private def wideBands(words: Int, n: Long): Int = {
    val grid = words * WordBits
    (4 to 1 by -1).find { b =>
      grid % b == 0 && {
        val e = grid / b
        e <= WordBits && WordBits % e == 0 &&
          ((1L << e) >= 4L * n || e >= 62)
      }
    }.getOrElse(words) // bands = words: one full word per band
  }

  /** Banded near-dup pairs at hamming ≤ bands−1 over the wide grid —
    * [[Multimodal.perceptualPairsOf]] generalized; lossless by the
    * same pigeonhole. */
  private def pairsWide(sigs: DataFrame, words: Int,
      bands: Int): DataFrame = {
    val grid = words * WordBits
    val bandBits = grid / bands
    val banded = sigs
      .withColumn("band", explode(expr(s"sequence(0, ${bands - 1})")))
      .withColumn("chunk", expr(
        s"(element_at(array(${(0 until words).map(w => s"ph$w").mkString(",")}), " +
          s"cast(band * $bandBits div $WordBits as int) + 1) " +
          s"div cast(pow(2, (band * $bandBits) % $WordBits) as bigint)) " +
          s"% ${1L << bandBits}"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band")
          && col("a.chunk") === col("b.chunk")
          && col("a.doc_id") < col("b.doc_id"))
      .select((col("a.doc_id").as("id_a") +: col("b.doc_id").as("id_b")
        +: (0 until words).flatMap(w => Seq(col(s"a.ph$w").as(s"pha$w"),
          col(s"b.ph$w").as(s"phb$w")))): _*)
      .distinct()
      .withColumn("hamming", (0 until words).map(w =>
          bit_count(col(s"pha$w").bitwiseXOR(col(s"phb$w"))))
        .reduce[Column](_ + _).cast("long"))
      .filter(col("hamming") <= bands - 1)
  }

  private def histLine(pairs: DataFrame): (Long, Long, String) = {
    val hist = pairs
      .withColumn("same_copy",
        (col("id_a") / CopyShift).cast("long")
          === (col("id_b") / CopyShift).cast("long"))
      .groupBy(col("hamming"), col("same_copy"))
      .agg(count(lit(1)).as("pairs"))
      .collect()
    val total = hist.map(_.getAs[Long]("pairs")).sum
    val same = hist.filter(_.getAs[Boolean]("same_copy"))
      .map(_.getAs[Long]("pairs")).sum
    val hj = hist.sortBy(r => (r.getAs[Long]("hamming"),
        !r.getAs[Boolean]("same_copy")))
      .map(r => s"""{"hamming":${r.getAs[Long]("hamming")},""" +
        s""""same_copy":${r.getAs[Boolean]("same_copy")},""" +
        s""""pairs":${r.getAs[Long]("pairs")}}""")
      .mkString("[", ",", "]")
    (total, same, hj)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val decades = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 100))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-m08-widegrid-probe")
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

      // -- mechanism diagnostics: block strata + 60-bit popcounts
      val sig1 = hashesWide(video, 1).cache()
      val floorMarks = Seq(16L, 24L, 32L, 37L, 40L, 44L, 48L)
      val strataCols =
        Seq(sum(when(col("nb") < 60, 1L).otherwise(0L)).as("sub60"),
          sum(when(col("nb") >= 60 && col("nb") < 120, 1L).otherwise(0L))
            .as("sub120"),
          sum(when(col("nb") >= 120, 1L).otherwise(0L)).as("full")) ++
        floorMarks.map(f =>
          sum(when(col("nb") >= f, 1L).otherwise(0L)).as(s"ge$f"))
      val strata = sig1.agg(strataCols.head, strataCols.tail: _*)
        .collect()(0)
      val tierSizes = floorMarks
        .map(f => s""""ge$f":${strata.getAs[Long](s"ge$f")}""")
        .mkString("{", ",", "}")
      val pop = sig1
        .withColumn("pc", least(bit_count(col("ph0")), lit(6)))
        .groupBy(col("pc")).agg(count(lit(1)).as("docs"))
        .collect().sortBy(_.getAs[Int]("pc"))
        .map(r => s""""${r.getAs[Int]("pc")}":${r.getAs[Long]("docs")}""")
        .mkString("{", ",", "}")
      println(s"""{"probe":"m08_widegrid_diag","k":$k,"n_video":$n,""" +
        s""""nb_sub60":${strata.getAs[Long]("sub60")},""" +
        s""""nb_60to120":${strata.getAs[Long]("sub120")},""" +
        s""""nb_ge120":${strata.getAs[Long]("full")},""" +
        s""""tier_sizes":$tierSizes,"popcount60":$pop}""")

      // optional third arg: a floor LADDER (comma-separated block
      // floors) swept on the 60-bit grid — used to dial the entropy
      // floor after the wide-vs-floor verdict; default reproduces
      // the original four-variant comparison.
      val variants: Seq[(String, Int, Long => Int, Int)] =
        args.lift(2) match {
          case Some(ladder) =>
            ladder.split(",").map(_.trim.toInt).toSeq.map(f =>
              (s"floor$f", 1,
                (m: Long) =>
                  Dedup.adaptiveSimHashBands(Multimodal.PHashBits, m), f))
          case None => Seq(
            ("shipped60", 1,
              m => Dedup.adaptiveSimHashBands(Multimodal.PHashBits, m), 0),
            ("wide120", 2, m => wideBands(2, m), 0),
            ("floor60", 1,
              m => Dedup.adaptiveSimHashBands(Multimodal.PHashBits, m), 60),
            ("widefloor120", 2, m => wideBands(2, m), 120))
        }

      variants.foreach { case (name, words, bandsOf, floor) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val base =
          if (words == 1) sig1
          else hashesWide(video, words)
        val kept = if (floor == 0) base else base.filter(col("nb") >= floor)
        // geometry from the PERCEPTUAL-TIER population (what the
        // operator would size its bands from)
        val nKept = if (floor == 0) n else kept.count()
        val bands = bandsOf(nKept)
        val (total, same, hj) = histLine(pairsWide(kept, words, bands))
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"probe":"m08_widegrid","k":$k,"n_video":$n,""" +
          s""""variant":"$name","words":$words,"floor_blocks":$floor,""" +
          s""""n_tier":$nKept,"bands":$bands,""" +
          s""""hamming_max":${bands - 1},"pairs":$total,""" +
          s""""same_copy":$same,"cross_copy":${total - same},""" +
          s""""sec":${f"$sec%.1f"},"hist":$hj}""")
      }
      sig1.unpersist()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-rehearsal scale probe (q182's composition UNBOUNDED): the
  * full quality-gate → mux → sniff → extract → dedup → pack pipeline
  * over the whole (optionally replicated) documents table, with a
  * CUMULATIVE per-stage wall breakdown — stage cost = successive
  * difference. q182 itself stays doc_id-bounded for the oracle; this
  * tool is the 100× scale claim behind it (VERDICT r12 task 6).
  *
  * Usage: runMain graft.tools.Rehearse <docsParquetDir> [label] [payloadScale]
  * payloadScale > 1 fattens every payload (r14 probe: 10x the tokens
  * per doc and a 9x-pixel video track) at the SAME doc count — pins
  * that the dominant extraction stage is payload-proportional, not
  * super-linear.
  */
object Rehearse {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption
      .getOrElse("/root/testdata/sf0.1/documents.parquet")
    val label = args.drop(1).headOption.getOrElse("1x")
    val payloadScale = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Avi, Mkv, Mp4, Multimedia, Office, Pdf, Video}

    val (vw, vh) = if (payloadScale > 1) (48, 36) else (16, 12)
    val mkPayloads = udf { (toks: Seq[String]) =>
      val p = toks.mkString(" ")
      val cues = toks.zipWithIndex.map { case (t, i) =>
        (i * 1.0, i * 1.0 + 0.5, t)
      }
      val frames = Avi.readFrames(Video.makeTestVideo(2, vw, vh, 0x112233, 10))
      Seq(
        Mp4.write(frames, vw, vh, 10, subtitles = cues),
        Mkv.write(frames, vw, vh, 10, subtitles = cues),
        Pdf.writePdf(Seq(p)),
        ("<html><body><p>" + p + "</p></body></html>")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val sniffFmt = udf { (b: Array[Byte]) =>
      if (Mp4.isMp4(b) || Mkv.isMkv(b)) Multimedia.containerMeta(b).format
      else if (b.length >= 4 && b(0) == '%' && b(1) == 'P' &&
        b(2) == 'D' && b(3) == 'F') "PDF"
      else "HTML"
    }
    val extractText = udf { (b: Array[Byte]) =>
      if (Mp4.isMp4(b)) Mp4.readSubtitles(b).map(_._3).mkString(" ")
      else if (Mkv.isMkv(b)) Mkv.readSubtitles(b).map(_._3).mkString(" ")
      else Office.documentToText(b)
    }

    def gated: DataFrame = spark.read.parquet(docsPath)
      .withColumn("toks", expr(
        s"""filter(transform(
          |  slice(split(trim(text), '\\\\s+'), 1,
          |        cast((doc_id % 6 + 4) * $payloadScale as int)),
          |  t -> regexp_replace(t, '[^a-zA-Z0-9]', '')),
          |  x -> x != '')""".stripMargin))
      .withColumn("tok", size(col("toks")).cast("long"))
      .filter(col("tok") >= 5)
    def muxed: DataFrame = gated
      .withColumn("payload", explode(mkPayloads(col("toks"))))
    def extracted: DataFrame = muxed
      .withColumn("fmt", sniffFmt(col("payload")))
      .withColumn("norm",
        regexp_replace(trim(extractText(col("payload"))), "\\s+", " "))
    def deduped: DataFrame = extracted
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("canon_doc"), min(col("tok")).as("tok"),
        count(lit(1)).as("n_copies"))
    def packed: DataFrame = graft.operators.Pack
      .packBins(deduped.localCheckpoint(false), col("canon_doc"),
        col("tok"), 64L, "bin")

    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def time(stage: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[rehearse] $label%-6s $stage%-22s $s%8.2f s")
      s
    }
    println(s"[rehearse] $label docs = ${spark.read.parquet(docsPath).count()}")
    val t1 = time("1 quality gate")(noop(gated))
    val t2 = time("2 +mux 4 containers")(noop(muxed.select("payload")))
    val t3 = time("3 +sniff+extract")(noop(extracted.select("fmt", "norm")))
    val t4 = time("4 +exact dedup")(noop(deduped))
    val t5 = time("5 +pack (full)")(noop(packed))
    println(f"[rehearse] $label stage deltas: gate=$t1%.1f mux=${t2 - t1}%.1f " +
      f"extract=${t3 - t2}%.1f dedup=${t4 - t3}%.1f pack=${t5 - t4}%.1f")
    spark.stop()
  }
}

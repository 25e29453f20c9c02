package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway streaming-gate profiler (delete freely): breaks q184's shape
  * into staging / stream-run / combine phases and times each under
  * variants (staged recompute vs localCheckpoint; state partitions 32 vs
  * small) to locate where the ~20 s controlled cost actually goes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    def T(name: String) = graft.Tables(spark, sfDir, name)

    // q184's staged frame, verbatim
    def stagedDf = {
      val base = T("documents")
        .filter(col("doc_id") < 60)
        .withColumn("norm", expr(
          """array_join(filter(transform(
            |  slice(split(trim(lower(text)), '\\s+'), 1,
            |        cast(doc_id % 5 + 6 as int)),
            |  t -> regexp_replace(t, '[^a-z0-9]', '')),
            |  x -> x != ''), ' ')""".stripMargin))
        .select(col("doc_id"), col("norm"))
      base.alias("a")
        .join(base.alias("b"), col("b.doc_id") === col("a.doc_id") - 2,
          "left")
        .select(col("a.doc_id").as("doc_id"),
          when(col("a.doc_id") % 3 === 2 && col("b.norm").isNotNull,
            col("b.norm")).otherwise(col("a.norm")).as("text"))
    }

    def stageSixJobs(staged: org.apache.spark.sql.DataFrame): java.nio.file.Path = {
      val stage = graft.QueryUtil.tempDir("scr_in")
      (0 until 6).foreach { k =>
        val tmp = graft.QueryUtil.tempDir(s"scr_b$k").toString
        staged.filter(col("doc_id") >= k * 10 && col("doc_id") < (k + 1) * 10)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = stage.resolve(f"b$k%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime
            .fromMillis(1_000_000_000_000L + k * 60_000L))
      }
      stage
    }

    def stageOneJob(staged: org.apache.spark.sql.DataFrame): java.nio.file.Path = {
      val stage = graft.QueryUtil.tempDir("scr1_in")
      val tmp = graft.QueryUtil.tempDir("scr1_all").toString
      staged.withColumn("k", (col("doc_id") / 10).cast("int"))
        .repartition(col("k"))
        .write.mode("overwrite").partitionBy("k").parquet(tmp)
      (0 until 6).foreach { k =>
        val dir = new java.io.File(s"$tmp/k=$k")
        val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = stage.resolve(f"b$k%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime
            .fromMillis(1_000_000_000_000L + k * 60_000L))
      }
      stage
    }

    def runStream(stage: java.nio.file.Path, label: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(stage.toString).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
      val verdicts = graft.streaming.Streaming
        .nearDupStream(stream, "doc_id", "text", maxHamming = 0)
      val qname = "scr_mem_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val ck = graft.QueryUtil.tempDir("scr_ck").toString
      val sq = verdicts.toDF().writeStream.format("memory")
        .queryName(qname).outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      sq.awaitTermination()
      val n = spark.table(qname).count()
      require(n == 60, s"$label: expected 60 rows, got $n")
    }

    // ---- warmup: one full round so codegen/stream machinery is warm ----
    time("WARMUP six-job staging") { stageSixJobs(stagedDf) }
    val wstage = time("WARMUP staging again") { stageSixJobs(stagedDf) }
    time("WARMUP stream") { runStream(wstage, "warmup") }

    // ---- measured: staging variants ----
    (1 to 2).foreach { i =>
      time(s"staging six jobs (recompute) #$i") { stageSixJobs(stagedDf) }
      time(s"staging six jobs (localCheckpoint) #$i") {
        stageSixJobs(stagedDf.localCheckpoint(true))
      }
      time(s"staging one job partitionBy #$i") { stageOneJob(stagedDf) }
    }

    // ---- measured: stream with 32 state partitions ----
    val st32 = stageSixJobs(stagedDf.localCheckpoint(true))
    (1 to 2).foreach { i => time(s"stream sp=32 #$i") { runStream(st32, "sp32") } }

    // ---- measured: stream with 4 state partitions ----
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    (1 to 2).foreach { i => time(s"stream sp=4 #$i") { runStream(st32, "sp4") } }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    (1 to 2).foreach { i => time(s"stream sp=8 #$i") { runStream(st32, "sp8") } }
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    // ---- measured: sp=1 and sp=2 ----
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    (1 to 2).foreach { i => time(s"stream sp=1 #$i") { runStream(st32, "sp1") } }
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    (1 to 2).foreach { i => time(s"stream sp=2 #$i") { runStream(st32, "sp2") } }

    // ---- measured: four streams sequential vs overlapped at sp=4 ----
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("four streams sequential sp=4") {
      (1 to 4).foreach(i => runStream(st32, s"seq$i"))
    }
    time("four streams overlapped sp=4") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val fs = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = runStream(st32, s"par$i") })
      }
      fs.foreach(_.get()); pool.shutdown()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    spark.stop()
  }
}

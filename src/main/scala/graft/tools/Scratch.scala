package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway q154 phase profile (delete freely): where do the nine
  * DML/index lifecycle phases spend their time after the r16 batchUpdate
  * restructure?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warm the session (codegen, parquet reader)
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val s = spark
      import graft.catalog.{Catalog, ColumnDef, GraftTable}
      import s.implicits._
      def T(s2: SparkSession, dir: String, n: String) =
        graft.Tables(s2, dir, n)
      val cat = new Catalog(graft.QueryUtil.tempDir("graft-q154x").toString)
      val t = time("create")(GraftTable.create(s, cat, "mh_docs", Seq(
        ColumnDef("doc_id", "bigint"), ColumnDef("body", "string"))))
      val grpWord = repeat(
        expr("substr('wxyzv', CAST(doc_id % 5 AS INT) + 1, 1)"), 6)
      val body = concat_ws(" ", grpWord, lit("aa"), grpWord, lit("bb"),
        grpWord, lit("cc"), grpWord, lit("dd"), grpWord, lit("ee"))
      def slice(lo: Long, hi: Long) = T(s, sfDir, "documents")
        .filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), body.as("body"))
      time("insert 0-30")(t.insert(slice(0, 30).repartition(3)))
      time("createMinhashIndex")(t.createMinhashIndex("nd", "body", "doc_id"))
      time("insert 30-50 (+maint)")(t.insert(slice(30, 50).repartition(2)))
      time("batchUpdate (+maint)")(
        t.batchUpdate(slice(0, 1).select(lit(1L).as("doc_id"), col("body")),
          Seq("doc_id")))
      time("delete")(t.delete("doc_id = 2"))
      val idxRows = time("indexNearDupPairs collect")(
        t.indexNearDupPairs("nd", 0.9).collect())
      val batchSet = time("batch nearDuplicatePairs collect")(
        graft.operators.Dedup.nearDuplicatePairs(
          t.read(), "body", "doc_id",
          jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3)
        .collect())
      val z = "z" * 6
      val incoming = Seq(
        (9000L, s"$z aa $z bb $z cc $z dd $z ee"),
        (9001L, "totally different content with no shared trigram runs"))
        .toDF("qid", "txt")
      val hits = time("searchNearDups collect")(
        t.searchNearDups("nd", incoming, "txt", "qid", 0.9).collect())
      println(s"[scratch] pairs=${idxRows.length} batch=${batchSet.length} hits=${hits.length}")
    }
    spark.stop()
  }
}

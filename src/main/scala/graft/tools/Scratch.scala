package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the current top batch gates (delete
  * freely): q154 minhash-index lifecycle, q118/q98 pairs generation vs
  * iteration, q100 k-means vs join, q150 PQ build/encode/search.
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
    val s = spark

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def T(name: String) = graft.Tables(spark, sfDir, name)

    // ---------- q154 phases ----------
    (1 to 2).foreach { round =>
      import graft.catalog.{Catalog, ColumnDef, GraftTable}
      import s.implicits._
      val cat = new Catalog(graft.QueryUtil.tempDir("scr-q154").toString)
      val t = time(s"q154.create #$round") {
        GraftTable.create(s, cat, "mh_docs", Seq(
          ColumnDef("doc_id", "bigint"), ColumnDef("body", "string")))
      }
      val grpWord = repeat(
        expr("substr('wxyzv', CAST(doc_id % 5 AS INT) + 1, 1)"), 6)
      val body = concat_ws(" ", grpWord, lit("aa"), grpWord, lit("bb"),
        grpWord, lit("cc"), grpWord, lit("dd"), grpWord, lit("ee"))
      def slice(lo: Long, hi: Long) = T("documents")
        .filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), body.as("body"))
      time(s"q154.insert1 #$round") { t.insert(slice(0, 30).repartition(3)) }
      time(s"q154.createIndex #$round") { t.createMinhashIndex("nd", "body", "doc_id") }
      time(s"q154.insert2 #$round") { t.insert(slice(30, 50).repartition(2)) }
      time(s"q154.batchUpdate #$round") {
        t.batchUpdate(slice(0, 1).select(lit(1L).as("doc_id"), col("body")),
          Seq("doc_id"))
      }
      time(s"q154.delete #$round") { t.delete("doc_id = 2") }
      time(s"q154.indexPairs #$round") { t.indexNearDupPairs("nd", 0.9).collect() }
      time(s"q154.batchPairs #$round") {
        graft.operators.Dedup.nearDuplicatePairs(
          t.read(), "body", "doc_id",
          jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3)
          .collect()
      }
      val z = "z" * 6
      val incoming = Seq(
        (9000L, s"$z aa $z bb $z cc $z dd $z ee"),
        (9001L, "totally different content with no shared trigram runs"))
        .toDF("qid", "txt")
      time(s"q154.search #$round") {
        t.searchNearDups("nd", incoming, "txt", "qid", 0.9).collect()
      }
    }

    // ---------- q118 phases ----------
    (1 to 2).foreach { round =>
      def shingles(c: org.apache.spark.sql.Column) =
        graft.functions.TextFunctions.shingles(c, 3)
      val docs = T("documents")
        .filter(col("n_chars") >= 3 && col("doc_id") < 200)
        .select(col("doc_id"), array_sort(shingles(col("text"))).as("sh"))
      val pairs = docs.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb")),
          col("doc_a") < col("doc_b") &&
          size(col("sha")).cast("double") >= lit(0.6) * size(col("shb")) &&
          size(col("shb")).cast("double") >= lit(0.6) * size(col("sha")))
        .select(col("doc_a"), col("doc_b"),
          size(col("sha")).as("_na"), size(col("shb")).as("_nb"),
          graft.plans.NativeVector.sortedIntersectCount(s,
            col("sha"), col("shb")).as("_ni"))
        .filter(col("_ni").cast("double") /
          (col("_na") + col("_nb") - col("_ni")) >= 0.6)
        .select(col("doc_a"), col("doc_b"))
      val p = time(s"q118.pairs-gen #$round") { pairs.localCheckpoint(true) }
      val edges = p.select(col("doc_a").as("u"), col("doc_b").as("w"))
        .union(p.select(col("doc_b").as("u"), col("doc_a").as("w")))
        .distinct().cache()
      val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("d"))
      val nodes = edges.select(col("u").as("v")).distinct()
      time(s"q118.iterate5 #$round") {
        val ranks = graft.operators.Iterate.loop(
          nodes.select(col("v"), lit(1000000L).as("r")), 5) { prev =>
          val contrib = edges.join(deg, Seq("u"))
            .join(prev.withColumnRenamed("v", "u"), Seq("u"))
            .select(col("w").as("v"), expr("r div d").as("c"))
            .groupBy(col("v")).agg(sum(col("c")).as("s"))
          nodes.join(contrib, Seq("v"), "left")
            .select(col("v"),
              expr("150000L + (85L * coalesce(s, 0L)) div 100L").as("r"))
        }
        ranks.join(deg.withColumnRenamed("u", "v"), Seq("v")).collect()
      }
      edges.unpersist()
    }

    // ---------- q100 phases ----------
    (1 to 2).foreach { round =>
      val emb = T("embeddings")
      val ivf = time(s"q100.ExactAnn.build #$round") {
        graft.operators.ExactAnn.build(emb, "embedding", "vec_id", 8, 4)
      }
      time(s"q100.rest #$round") {
        graft.operators.Dedup.semanticNearDupPairs(
          emb, "embedding", "vec_id", tau = 0.4, k = 8, maxIter = 4)
          .transform(graft.QueryUtil.orderedSmall(_, col("vec_a"), col("vec_b")))
          .write.format("noop").mode("overwrite").save()
      }
      val _ = ivf
    }

    // ---------- q150 phases ----------
    val queryVec: Seq[Double] = (0 until 64).map(i => ((i % 7) - 3) * 0.125)
    val queryVec2: Seq[Double] = (0 until 64).map(i => ((i * 3 % 11) - 5) * 0.125)
    def unitCol(q: Seq[Double]): org.apache.spark.sql.Column = {
      val n = math.sqrt(q.map(x => x * x).sum)
      array(q.map(x => lit(x / n)): _*)
    }
    (1 to 2).foreach { round =>
      import graft.operators.Pq
      val emb = T("embeddings")
      val model = time(s"q150.Pq.build #$round") {
        Pq.build(emb, "embedding", "vec_id", kc = 8, m = 8, ks = 16)
      }
      val codes = time(s"q150.encode+persist #$round") {
        val c = Pq.encode(emb, "embedding", "vec_id", model).persist()
        c.count(); c
      }
      time(s"q150.search x2 #$round") {
        Seq(queryVec, queryVec2)
          .foreach { q =>
            Pq.search(emb, codes, "embedding", "vec_id", model, q,
              k = 10, nprobe = 6, rerank = 200).collect()
          }
      }
      time(s"q150.exact x2 #$round") {
        Seq(queryVec, queryVec2)
          .foreach { q =>
            emb.select(col("vec_id").cast("long").as("vec_id"),
                aggregate(zip_with(
                  graft.operators.ExactAnn.normalized(col("embedding")),
                  unitCol(q), (x, y) => x * y),
                  lit(0.0), (a, x) => a + x).as("cos"))
              .orderBy(col("cos").desc, col("vec_id")).limit(10).collect()
          }
      }
      codes.unpersist()
    }

    spark.stop()
  }
}

package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based DML-maintained-index testing: random inserts / embedding
  * batchUpdates / deletes against a table with a declared HNSW index,
  * searching after every op with ef ≥ table size. The index contract is
  * graph-supplied CANDIDATES + exact re-rank against live vectors, so the
  * differential asserts: every returned row is live, its score equals the
  * model's cosine for that id (updated rows rank by their NEW vector),
  * the result size is min(k, live), and the returned set is a valid
  * top-k under the model's scores (every returned score ≥ the model's
  * k-th best − ε, every omitted score ≤ the model's k-th best + ε).
  */
class IndexSearchModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  private def cosine(a: Seq[Float], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** `exactTopK=false` = the approximate-index (ivfpq) contract: returned
    * rows must still be LIVE with EXACT re-ranked scores and k must fill,
    * but ADC candidate recall is not exhaustive, so top-k validity (no
    * better row omitted) only holds for the exhaustive-candidate HNSW
    * configuration (ef >= table size).
    */
  private def runModel(firstSeed: Int,
      createIndex: GraftTable => Unit, exactTopK: Boolean): Unit = {
    for (seed <- firstSeed until firstSeed + 3) {
      val rnd = new Random(seed)
      def randVec(): Seq[Float] = Seq.fill(dim)(rnd.nextGaussian().toFloat)
      val cat = new Catalog(
        java.nio.file.Files.createTempDirectory(s"graft-ism-$seed").toString)
      val t = GraftTable.create(spark, cat, "vecs", Seq(
        ColumnDef("vec_id", "bigint"), ColumnDef("emb", "array<float>")))
      var live = Map.empty[Long, Seq[Float]]
      var nextId = 0L
      def insertBatch(n: Int): Unit = {
        val rows = (0 until n).map { _ =>
          val id = nextId; nextId += 1; (id, randVec())
        }
        t.insert(rows.toDF("vec_id", "emb"))
        live = live ++ rows
      }
      insertBatch(20)
      createIndex(t)

      val query = Seq.fill(dim)(rnd.nextGaussian())
      def check(tag: String): Unit = {
        val k = 5
        val got = t.searchIndex("ix", query, k, ef = 512)
          .select("vec_id", "cos_sim").as[(Long, Double)].collect().toSeq
        assert(got.size == math.min(k, live.size), s"seed=$seed $tag: size")
        val modelScores = live.map { case (id, v) => id -> cosine(v, query) }
        got.foreach { case (id, s) =>
          val ms = modelScores.getOrElse(id,
            fail(s"seed=$seed $tag: returned non-live id $id"))
          assert(math.abs(s - ms) < 1e-6,
            s"seed=$seed $tag: score for $id is $s, model $ms")
        }
        if (exactTopK && live.size > k) {
          val kth = modelScores.values.toSeq.sorted(Ordering[Double].reverse)(k - 1)
          got.foreach { case (_, s) =>
            assert(s >= kth - 1e-6, s"seed=$seed $tag: sub-top-k row returned") }
          val omitted = modelScores.keySet -- got.map(_._1)
          omitted.foreach { id =>
            assert(modelScores(id) <= kth + 1e-6,
              s"seed=$seed $tag: better row $id omitted (recall break)") }
        }
      }
      check("initial")

      for (step <- 0 until 8) {
        rnd.nextInt(4) match {
          case 0 => insertBatch(3 + rnd.nextInt(5)) // appends a segment
          case 1 => // re-embed a sample: must rank by NEW vectors
            val keys = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
            val upd = keys.map(id => (id, randVec()))
            t.batchUpdate(upd.toDF("vec_id", "emb"), Seq("vec_id"))
            live = live ++ upd
          case 2 => // delete a slice: index candidates must drop at the join
            val k2 = 3 + rnd.nextInt(3); val r = rnd.nextInt(k2)
            t.delete(s"vec_id % $k2 = $r")
            live = live.filterNot { case (id, _) => id % k2 == r }
          case _ => insertBatch(6) // enough appends trigger the CAS rebuild
        }
        check(s"step=$step")
      }
    }
  }

  test("HNSW: random DML + search — exact scores, live-only, valid top-k every step") {
    runModel(900, _.createHnswIndex("ix", "emb", "vec_id", shards = 2,
      segmentThreshold = 4), exactTopK = true)
  }

  test("IVF-PQ: random DML + search — exact scores, live-only, k filled every step") {
    runModel(1900, _.createIvfPqIndex("ix", "emb", "vec_id", cells = 3,
      pqM = 4, pqKs = 8, segmentThreshold = 4), exactTopK = false)
  }
}

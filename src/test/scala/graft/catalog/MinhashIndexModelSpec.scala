package graft.catalog

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based differential for the DML-maintained minhash index: random
  * insert / text-batchUpdate / delete / compact sequences against a table
  * with a declared near-dup index, asserting after EVERY op that
  * `indexNearDupPairs` equals BOTH:
  *
  *  - the batch operator `Dedup.nearDuplicatePairs` on the live image
  *    (same hash family — candidates match by construction, so equality
  *    is the no-ghost/no-loss maintenance contract), and
  *  - an in-memory group model (docs carry group-texts; within-group
  *    Jaccard is exactly 1.0, cross-group far below threshold), i.e. all
  *    C(n_g, 2) pairs per group and nothing else.
  */
class MinhashIndexModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val groups = 4
  private def text(g: Int): String = {
    val w = "wxyz".charAt(g).toString * 6
    s"$w aa $w bb $w cc $w dd $w ee"
  }

  test("random DML: index pairs == batch operator == group model (3 seeds)") {
    for (seed <- 11 to 13) {
      val rnd = new Random(seed)
      val cat = new Catalog(java.nio.file.Files
        .createTempDirectory(s"graft-mhm-$seed").toString)
      val t = GraftTable.create(spark, cat, "docs", Seq(
        ColumnDef("id", "bigint"), ColumnDef("body", "string")))
      var model = Map.empty[Long, Int] // id -> group
      var nextId = 0L

      def insertBatch(n: Int): Unit = {
        val rows = (0 until n).map { _ =>
          val id = nextId; nextId += 1
          val g = rnd.nextInt(groups)
          model += id -> g
          (id, text(g))
        }
        t.insert(rows.toDF("id", "body"))
      }

      insertBatch(8)
      t.createMinhashIndex("nd", "body", "id", segmentThreshold = 3)

      def check(tag: String): Unit = {
        val got = t.indexNearDupPairs("nd", 0.9)
          .select("_ida", "_idb").as[(Long, Long)].collect().toSet
        val batch = Dedup.nearDuplicatePairs(t.read(), "body", "id",
            jaccardThreshold = 0.9, numHashes = 8, bands = 2, shingleSize = 3)
          .as[(Long, Long)].collect().toSet
        val want = model.toSeq.groupBy(_._2).values.flatMap { members =>
          val ids = members.map(_._1).sorted
          for (i <- ids.indices; j <- i + 1 until ids.length)
            yield (ids(i), ids(j))
        }.toSet
        assert(got == batch, s"[$seed/$tag] index != batch operator")
        assert(got == want, s"[$seed/$tag] index != group model")
      }

      check("init")
      for (step <- 0 until 10) {
        val op = rnd.nextInt(4)
        if (op == 0) insertBatch(1 + rnd.nextInt(3))
        else if (op == 1 && model.nonEmpty) { // move a doc between groups
          val id = model.keys.toSeq(rnd.nextInt(model.size))
          val g = rnd.nextInt(groups)
          t.batchUpdate(Seq((id, text(g))).toDF("id", "body"), Seq("id"))
          model += id -> g
        } else if (op == 2 && model.nonEmpty) { // delete a random doc
          val id = model.keys.toSeq(rnd.nextInt(model.size))
          t.delete(s"id = $id")
          model -= id
        } else t.compact(targetFiles = 1 + rnd.nextInt(2))
        check(s"step$step-op$op")
      }
    }
  }
}

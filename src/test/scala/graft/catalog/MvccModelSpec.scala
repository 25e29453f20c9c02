package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Model-based MVCC testing: drive a GraftTable with seeded random DML
  * sequences (insert / predicate delete / predicate update / batchUpdate /
  * compact / snapshot / revert) and mirror every committed version's live
  * row set in a trivially-correct in-memory model. After every op the real
  * table must agree on the live image, and time travel to ANY recorded
  * version must reproduce that version's model snapshot — including after
  * reverts, which truncate the log and let later writes reuse version
  * numbers (the lapped-revert hazard the epoch machinery exists for).
  */
class MvccModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("random DML sequences: live image and every time travel match the model") {
    for (seed <- 0 until 5) {
      val rnd = new Random(100 + seed)
      val cat = new Catalog(
        java.nio.file.Files.createTempDirectory(s"graft-mvcc-$seed").toString)
      val t = GraftTable.create(spark, cat, "m", Seq(
        ColumnDef("id", "bigint"), ColumnDef("x", "double")))

      var live = Map.empty[Long, Double]
      // committed version -> live set at that version (model's time travel)
      val snaps = mutable.SortedMap.empty[Long, Map[Long, Double]]
      var nextId = 0L
      snaps(t.currentVersion) = live

      def check(tag: String): Unit = {
        val got = t.read().select("id", "x").as[(Long, Double)]
          .collect().toMap
        assert(got == live, s"seed=$seed $tag: live image diverged " +
          s"(got ${got.size} rows, expected ${live.size})")
        // time travel to a random recorded version
        val vs = snaps.keys.toSeq
        val v = vs(rnd.nextInt(vs.length))
        val past = t.read(Some(v)).select("id", "x").as[(Long, Double)]
          .collect().toMap
        assert(past == snaps(v), s"seed=$seed $tag: time travel to v=$v diverged")
      }

      for (step <- 0 until 22) {
        val op = rnd.nextInt(10)
        if (op < 4 || live.isEmpty) { // insert a fresh batch
          val n = 3 + rnd.nextInt(8)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            (id, rnd.nextInt(1000) / 10.0)
          }
          val v = t.insert(rows.toDF("id", "x"))
          live = live ++ rows
          snaps(v) = live
        } else if (op < 6) { // predicate delete
          val k = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(k)
          val v = t.delete(s"id % $k = $r")
          live = live.filterNot { case (id, _) => id % k == r }
          snaps(v) = live
        } else if (op == 6) { // predicate update
          val k = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(k)
          val c = rnd.nextInt(50) + 1
          val v = t.update(Map("x" -> s"x + $c"), s"id % $k = $r")
          live = live.map { case (id, x) =>
            id -> (if (id % k == r) x + c else x)
          }
          snaps(v) = live
        } else if (op == 7) { // batchUpdate on a sample of existing keys
          val keys = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(4))
          val upd = keys.map(id => (id, rnd.nextInt(1000) / 10.0))
          val v = t.batchUpdate(upd.toDF("id", "x"), Seq("id"))
          live = live ++ upd
          snaps(v) = live
        } else if (op == 8) {
          // compact: layout-only, image unchanged — in any of its flavors
          // (plain, linear cluster, z-order, bloom filters)
          val tf = 1 + rnd.nextInt(3)
          val v = rnd.nextInt(4) match {
            case 0 => t.compact(targetFiles = tf)
            case 1 => t.compact(tf, clusterBy = Seq("id"))
            case 2 => t.compact(tf, clusterBy = Seq("id", "x"), zOrder = true)
            case _ => t.compact(tf, bloomFilterCols = Seq("id"),
              bloomFilterNdv = 1024)
          }
          snaps(v) = live
        } else if (op == 9 && rnd.nextBoolean()) {
          // upsert: existing keys update, novel keys insert (two versions;
          // the model records the FINAL one — intermediates are valid
          // history but unprobed, like any version the model skips)
          val existing = rnd.shuffle(live.keys.toSeq).take(rnd.nextInt(3))
          val novel = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val upd = (existing ++ novel).map(id => (id, rnd.nextInt(1000) / 10.0))
          val st = t.batchUpdateStatus(upd.toDF("id", "x"), Seq("id"),
            ifNotExists = "insert")
          assert(st.numRows == upd.size,
            s"seed=$seed upsert rows ${st.numRows} != ${upd.size}")
          live = live ++ upd
          snaps(st.version) = live
        } else { // revert to a random earlier version
          val past = snaps.keys.toSeq.filter(_ < t.currentVersion)
          if (past.nonEmpty) {
            val v = past(rnd.nextInt(past.length))
            t.revert(v)
            live = snaps(v)
            // versions beyond v are gone; their numbers may be REUSED by
            // later ops, so the model forgets them like the log does
            snaps.keys.toSeq.filter(_ > v).foreach(snaps.remove)
          }
        }
        check(s"step=$step op=$op")
      }
      // history length equals the surviving version-log entries
      assert(t.history().count() == t.meta.versions.length.toLong)
    }
  }
}

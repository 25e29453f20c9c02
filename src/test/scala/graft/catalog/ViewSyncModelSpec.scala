package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Model-based incremental-view testing on top of the MVCC driver: after
  * EVERY random base mutation (insert / delete / update / batchUpdate /
  * compact / revert) and a sync, the component view must equal the token
  * expansion of the base's live image, and the materialized view must
  * equal the predicate/select of it — the full-view invariant that the
  * incremental machinery (closed-row propagation, high-water marks,
  * revert healing) exists to preserve without rebuilds.
  */
class ViewSyncModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokens(s: String): Seq[String] =
    s.split("\\s+").toSeq.filter(_.nonEmpty)

  test("random base DML + sync: views always equal the model derivation") {
    for (seed <- 0 until 4) {
      val rnd = new Random(500 + seed)
      val cat = new Catalog(
        java.nio.file.Files.createTempDirectory(s"graft-vsm-$seed").toString)
      val t = GraftTable.create(spark, cat, "b", Seq(
        ColumnDef("id", "bigint"), ColumnDef("text", "string")))
      val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
      def randText(): String =
        (0 until (1 + rnd.nextInt(4))).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" ")

      var live = Map.empty[Long, String]
      val snaps = mutable.SortedMap.empty[Long, Map[Long, String]]
      var nextId = 0L
      snaps(t.currentVersion) = live

      val firstText = randText()
      val v0 = t.insert(Seq((nextId, firstText)).toDF("id", "text"))
      live = Map(nextId -> firstText); nextId += 1
      snaps(v0) = live

      val view = Views.createComponentView(spark, cat, "v", t,
        "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
      val mv = Views.createMaterializedView(spark, cat, "mv", t,
        Some("length(text) >= 10"), Seq("id" -> "id", "up" -> "upper(text)"))

      def syncAndCheck(tag: String): Unit = {
        Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
        Views.syncMaterializedView(mv, t, Some("length(text) >= 10"),
          Seq("id" -> "id", "up" -> "upper(text)"))
        val expect = live.toSeq.flatMap { case (id, txt) =>
          tokens(txt).zipWithIndex.map { case (tk, p) => (id, p, tk) }
        }.sorted
        val got = view.read().select(col("id"), col(Views.Pos), col("token"))
          .as[(Long, Int, String)].collect().toSeq.sorted
        assert(got == expect, s"seed=$seed $tag: component view diverged\n" +
          s"got=${got.take(8)}…\nexp=${expect.take(8)}…")
        val mvExpect = live.toSeq.collect {
          case (id, txt) if txt.length >= 10 => (id, txt.toUpperCase)
        }.sorted
        val mvGot = mv.read().select("id", "up").as[(Long, String)]
          .collect().toSeq.sorted
        assert(mvGot == mvExpect, s"seed=$seed $tag: materialized view diverged")
      }

      for (step <- 0 until 16) {
        val op = rnd.nextInt(10)
        if (op < 4 || live.isEmpty) {
          val rows = (0 until (2 + rnd.nextInt(4))).map { _ =>
            val id = nextId; nextId += 1; (id, randText())
          }
          val v = t.insert(rows.toDF("id", "text"))
          live = live ++ rows; snaps(v) = live
        } else if (op < 6) {
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val v = t.delete(s"id % $k = $r")
          live = live.filterNot { case (id, _) => id % k == r }; snaps(v) = live
        } else if (op == 6) {
          val k = 2 + rnd.nextInt(3); val r = rnd.nextInt(k)
          val v = t.update(Map("text" -> "concat(text, ' zeta')"), s"id % $k = $r")
          live = live.map { case (id, txt) =>
            id -> (if (id % k == r) txt + " zeta" else txt) }
          snaps(v) = live
        } else if (op == 7) {
          val keys = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
          val upd = keys.map(id => (id, randText()))
          val v = t.batchUpdate(upd.toDF("id", "text"), Seq("id"))
          live = live ++ upd; snaps(v) = live
        } else if (op == 8) {
          val v = t.compact(1 + rnd.nextInt(2)); snaps(v) = live
        } else {
          val past = snaps.keys.toSeq.filter(_ < t.currentVersion)
          if (past.nonEmpty) {
            val v = past(rnd.nextInt(past.length))
            t.revert(v)
            live = snaps(v)
            snaps.keys.toSeq.filter(_ > v).foreach(snaps.remove)
          }
        }
        syncAndCheck(s"step=$step op=$op")
      }
    }
  }
}

package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit, round 9: the r8 catalog features (PK constraint,
  * unversioned squash, user namespaces) crossed with the view-maintenance
  * and concurrency surfaces they compose with.
  */
class R8InteractionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-r8x").toString)

  test("PK base × component view: rejected inserts leave no partial expansions; key reuse re-expands") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "pkdocs", Seq(
      ColumnDef("id", "bigint"), ColumnDef("text", "string")),
      primaryKey = Seq("id"))
    t.insert(Seq((1L, "a b"), (2L, "x y z")).toDF("id", "text"))
    val view = Views.createComponentView(spark, cat, "pktokens", t,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 5)
    val vBefore = view.currentVersion
    // duplicate-PK insert fails atomically → base unchanged, so the next
    // sync is a no-op: no partial expansion of the rejected batch
    intercept[IllegalArgumentException] {
      t.insert(Seq((2L, "should not land")).toDF("id", "text"))
    }
    Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 5)
    assert(view.currentVersion == vBefore) // sync no-oped, no empty version
    // partial-index semantics: delete frees the key; re-insert with new
    // text replaces the old expansions rather than adding to them
    t.delete("id = 2")
    t.insert(Seq((2L, "p q")).toDF("id", "text"))
    Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
    val toks = view.read().filter("id = 2").orderBy(Views.Pos)
      .select("token").as[String].collect().toSeq
    assert(toks == Seq("p", "q"))
    assert(view.read().count() == 4) // 2 for id=1, 2 for id=2 — no ghosts
  }

  test("unversioned base × incremental views: tombstones survive squash+vacuum+compact; marks stay monotonic") {
    val cat = newCat()
    val t = GraftTable.create(spark, cat, "uvdocs", Seq(
      ColumnDef("id", "bigint"), ColumnDef("text", "string")),
      isVersioned = false)
    t.insert(Seq((1L, "a b"), (2L, "x y z"), (3L, "m n")).toDF("id", "text"))
    val view = Views.createComponentView(spark, cat, "uvtokens", t,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 7)
    assert(t.history().count() == 1) // squash held through create+insert

    // TWO mutations between syncs, each squashing the base log: the closed
    // rows must still be visible to the sync through the squashed image
    t.delete("id = 2")
    t.insert(Seq((4L, "q r s")).toDF("id", "text"))
    assert(t.history().count() == 1)
    Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().filter("id = 2").count() == 0) // tombstones seen
    assert(view.read().filter("id = 4").count() == 3)
    assert(view.read().count() == 7) // 2 + 3 + 2

    // high-water mark: with no base change, sync is a version-free no-op
    val vAfter = view.currentVersion
    Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.currentVersion == vAfter)

    // compact + squash + vacuum between mutation and sync: the rewrite
    // passes closed rows through untouched, so the delete still propagates
    t.delete("id = 1")
    t.compact()
    assert(t.history().count() == 1)
    Views.syncComponentView(view, t, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().filter("id = 1").count() == 0)
    assert(view.read().count() == 5)
    // version numbers stayed monotonic through every squash: the view
    // never saw a high-water mark ahead of the base
    assert(t.currentVersion > 0 && view.currentVersion >= vAfter)

    // same interaction on a materialized predicate view
    val mv = Views.createMaterializedView(spark, cat, "uvmv", t,
      Some("length(text) >= 5"), Seq("id" -> "id", "up" -> "upper(text)"))
    val mvIds0 = mv.read().select("id").as[Long].collect().sorted.toSeq
    assert(mvIds0 == Seq(4L)) // "q r s" (5 chars); "m n" (3) filtered out
    t.update(Map("text" -> "'m n o p'"), "id = 3") // now passes predicate
    assert(t.history().count() == 1)
    Views.syncMaterializedView(mv, t, Some("length(text) >= 5"),
      Seq("id" -> "id", "up" -> "upper(text)"))
    assert(mv.read().select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    assert(mv.read().filter("id = 3").select("up").as[String].head() == "M N O P")
  }

  test("user namespaces × concurrent DML: same-named tables isolate writers and PK scopes") {
    val cat = newCat()
    cat.createUser("alice")
    cat.createUser("bob")
    cat.setUser(Some("alice"))
    val ta = GraftTable.create(spark, cat, "t", Seq(
      ColumnDef("id", "bigint"), ColumnDef("who", "string")),
      primaryKey = Seq("id"))
    cat.setUser(Some("bob"))
    val tb = GraftTable.create(spark, cat, "t", Seq(
      ColumnDef("id", "bigint"), ColumnDef("who", "string")),
      primaryKey = Seq("id"))
    cat.setUser(None)

    // 4 writers interleaved across the two namespaces; the SAME pk values
    // land in both tables (per-table constraint scope), disjoint within each
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { i =>
      val (tab, tag) = if (i % 2 == 0) (ta, "alice") else (tb, "bob")
      new Thread(() =>
        try {
          val base = (i / 2) * 10L
          tab.insert(Seq((base, s"$tag-$i-a"), (base + 1, s"$tag-$i-b"))
            .toDF("id", "who"))
        } catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"cross-namespace writers failed: $errs")
    assert(ta.read().count() == 4 && tb.read().count() == 4)
    assert(ta.read().select("who").as[String].collect().forall(_.startsWith("alice")))
    assert(tb.read().select("who").as[String].collect().forall(_.startsWith("bob")))
    // identical keys across namespaces coexist
    assert(ta.read().where("id = 0").count() == 1)
    assert(tb.read().where("id = 0").count() == 1)

    // a duplicate-key race INSIDE one namespace: exactly one wins there,
    // and the other namespace accepts the same key concurrently untouched
    val dupLosses = new java.util.concurrent.atomic.AtomicInteger()
    val racers = (0 until 3).map(i => new Thread(() =>
      try ta.insert(Seq((99L, s"racer$i")).toDF("id", "who"))
      catch { case e: IllegalArgumentException
        if e.getMessage.contains("Duplicate primary key") =>
          dupLosses.incrementAndGet() })) :+
      new Thread(() => tb.insert(Seq((99L, "bob-free")).toDF("id", "who")))
    racers.foreach(_.start()); racers.foreach(_.join())
    assert(dupLosses.get() == 2)
    assert(ta.read().where("id = 99").count() == 1)
    assert(tb.read().where("id = 99").select("who").as[String].head() == "bob-free")

    // drops scope to the active user and leave the other namespace intact
    cat.setUser(Some("alice"))
    cat.dropTable("t")
    assert(!cat.exists("t"))
    cat.setUser(Some("bob"))
    assert(cat.exists("t") && GraftTable.open(spark, cat, "t").read().count() == 5)
    cat.setUser(None)
  }
}

package graft.catalog

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** User namespaces (reference tests/test_user.py: `catalog.create_user` +
  * `Env.user`): per-user logical roots where the same path names resolve
  * to distinct tables, open handles survive user switches, drops scope to
  * the active user, unknown users refuse, and concurrent same-user
  * creation yields one root (the PXT-1183 repro).
  */
class UserNamespaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-user trees: same paths, distinct tables; handles survive switches") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-user").toString)
    def mk(): GraftTable = {
      cat.createDir("test_dir")
      cat.createDir("test_dir/subdir")
      val t = GraftTable.create(spark, cat, "test_dir/test_tbl",
        Seq(ColumnDef("c", "bigint")))
      GraftTable.create(spark, cat, "test_dir/subdir/test_tbl",
        Seq(ColumnDef("c", "bigint")))
      t
    }
    // default user
    val t = mk()
    t.insert(Seq(Tuple1(5L)).toDF("c"))
    // marcel's namespace: the SAME paths create fresh tables
    cat.createUser("marcel")
    cat.setUser(Some("marcel"))
    val marcelT = mk()
    marcelT.insert(Seq(Tuple1(22L)).toDF("c"))
    // asiegel's namespace
    cat.createUser("asiegel")
    cat.setUser(Some("asiegel"))
    val asiegelT = mk()
    asiegelT.insert(Seq(Tuple1(4171780L)).toDF("c"))

    // every handle still reads ITS table, regardless of the active user
    def one(tb: GraftTable): Long =
      tb.read().select("c").as[Long].head()
    assert(one(t) == 5L && one(marcelT) == 22L && one(asiegelT) == 4171780L)

    // drop scopes to the active user (asiegel)
    cat.dropTable("test_dir/test_tbl")
    assert(one(t) == 5L && one(marcelT) == 22L)
    assert(!cat.exists("test_dir/test_tbl")) // asiegel's view of the path
    intercept[IllegalArgumentException] {
      GraftTable.open(spark, cat, "test_dir/test_tbl")
    }

    // open resolves per user
    cat.setUser(None)
    assert(GraftTable.open(spark, cat, "test_dir/test_tbl")
      .read().select("c").as[Long].head() == 5L)
    cat.setUser(Some("marcel"))
    assert(GraftTable.open(spark, cat, "test_dir/test_tbl")
      .read().select("c").as[Long].head() == 22L)

    // listings scope to the active user
    assert(cat.listTablesUnder("test_dir").contains("@marcel/test_dir/test_tbl"))
    cat.setUser(None)
    assert(cat.listTablesUnder("test_dir") ==
      Seq("test_dir/subdir/test_tbl", "test_dir/test_tbl"))

    // dir drop scopes to the active user too
    cat.setUser(Some("marcel"))
    cat.dropDir("test_dir", force = true)
    assert(one(t) == 5L)
    intercept[IllegalArgumentException] {
      GraftTable.open(spark, cat, "test_dir/test_tbl")
    }

    // unknown user refuses with the reference's message
    val e = intercept[IllegalArgumentException] { cat.setUser(Some("pbrunelle")) }
    assert(e.getMessage.contains("Unknown user: pbrunelle"))
    cat.setUser(None)
  }

  test("concurrent create_user for the same user yields one root (PXT-1183)") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-user2").toString)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 6).map(_ => new Thread(() =>
      try cat.createUser("user1")
      catch { case e: Throwable => errs.add(e) }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"createUser raced: ${errs}")
    assert(cat.userExists("user1"))
    // exactly one root dir on disk
    val roots = java.nio.file.Files.list(
      java.nio.file.Paths.get(cat.warehouse)).iterator()
    var n = 0
    while (roots.hasNext) { if (roots.next().getFileName.toString == "@user1") n += 1 }
    assert(n == 1)
    // and the new user's namespace works end-to-end
    cat.setUser(Some("user1"))
    val t = GraftTable.create(spark, cat, "tbl", Seq(ColumnDef("x", "bigint")))
    t.insert(Seq(Tuple1(1L)).toDF("x"))
    assert(t.read().count() == 1)
    cat.setUser(None)
    assert(!cat.exists("tbl"))
  }

  test("physical @user paths reject unknown users; views cascade within a namespace") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-user3").toString)
    intercept[IllegalArgumentException] { cat.createDir("@ghost/d") }
    cat.createUser("u")
    cat.setUser(Some("u"))
    val base = GraftTable.create(spark, cat, "base", Seq(ColumnDef("x", "bigint")))
    base.insert(Seq(Tuple1(1L), Tuple1(2L)).toDF("x"))
    val mv = Views.createMaterializedView(spark, cat, "v", base,
      Some("x > 1"), Seq("x" -> "x"))
    assert(mv.read().count() == 1)
    // dependent-view guard works across the physical scan
    val e = intercept[IllegalArgumentException] { cat.dropTable("base") }
    assert(e.getMessage.contains("dependent views"))
    cat.dropTable("base", force = true)
    assert(!cat.exists("base") && !cat.exists("v"))
    cat.setUser(None)
  }
}

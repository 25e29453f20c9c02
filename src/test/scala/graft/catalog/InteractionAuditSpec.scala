package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 cross-feature interaction audit (continuing DESIGN.md item 18 —
  * round 5's pairwise audit found six bugs that per-feature tests missed).
  * This round's pairs, from the r5 verdict: the SQL relation resolver ×
  * `Catalog.move` × time travel; `recomputeColumns` × a DML-maintained HNSW
  * index × incremental views; `compute()` dry-runs × unstored columns ×
  * type-constraint expressions. Plus the move × revert-epoch pair the new
  * epoch marks introduced this round.
  */
class InteractionAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-audit").toString)

  private val cols = Seq(ColumnDef("id", "bigint"), ColumnDef("text", "string"))

  test("SQL resolver follows a move: time travel + snapshots work at the new path, old path errors") {
    val cat = freshCatalog()
    spark.conf.set("spark.graft.warehouse", cat.warehouse)
    cat.createDir("a")
    cat.createDir("c")
    val t = GraftTable.create(spark, cat, "a/b", cols)
    val v1 = t.insert(Seq((1L, "one")).toDF("id", "text"))
    t.createSnapshot("rel")
    t.insert(Seq((2L, "two")).toDF("id", "text"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.`a/b`").as[Long].head() == 2L)
    cat.move("a/b", "c/d")
    // new path: current, @vN time travel, named snapshot
    assert(spark.sql("SELECT count(*) AS n FROM graft.`c/d`").as[Long].head() == 2L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.`c/d@v$v1`").as[Long].head() == 1L)
    assert(spark.sql("SELECT text FROM graft.`c/d@rel`").as[String].collect().toSeq == Seq("one"))
    // old path: clean table-not-found, not a stale resolution
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.`a/b`").collect())
    assert(e.getMessage.contains("a/b") || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    // and DML at the new path keeps working (manifest URIs were rewritten)
    val t2 = GraftTable.open(spark, cat, "c/d")
    t2.insert(Seq((3L, "three")).toDF("id", "text"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.`c/d`").as[Long].head() == 3L)
  }

  test("move × revert-epoch: a moved base with a past revert does not force a spurious view rebuild") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "mre_base", cols)
    val v1 = t.insert(Seq((1L, "a b")).toDF("id", "text"))
    t.insert(Seq((99L, "zz")).toDF("id", "text"))
    t.revert(v1) // epoch -> 1
    val view = Views.createComponentView(spark, cat, "mre_view", t,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    assert(view.read().count() == 2)
    cat.createDir("moved")
    cat.move("mre_base", "moved/base")
    val moved = GraftTable.open(spark, cat, "moved/base")
    // the view's lastSeen AND epoch marks must both have followed the
    // rename; a lost epoch mark would read as 0 ≠ 1 and rebuild
    val versionsBefore = view.history().count()
    Views.syncComponentView(view, moved, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.history().count() == versionsBefore,
      "no-change sync after move minted view versions (spurious rebuild)")
    // incremental maintenance continues against the moved base
    moved.insert(Seq((2L, "c")).toDF("id", "text"))
    Views.syncComponentView(view, moved, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 3)
    // and a REAL revert on the moved base still rebuilds correctly
    moved.revert(v1)
    Views.syncComponentView(view, moved, "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().select("token").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("recomputeColumns × HNSW index × view: search ranks by NEW vectors, view refreshes without duplicates") {
    spark.udf.register("ia_emb", (v: Double) => Array(v, 1.0 - v))
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "rci", Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("v", "double"),
      ColumnDef("emb", "array<double>", computedExpr = Some("ia_emb(v)"))))
    t.insert(Seq((1L, 0.9), (2L, 0.1), (3L, 0.5)).toDF("id", "v"))
    t.createHnswIndex("ix", "emb", "id", shards = 1)
    val mv = Views.createMaterializedView(spark, cat, "rci_mv", t,
      None, Seq("id" -> "id", "e0" -> "emb[0]"))
    // query near (1, 0): id 1 (emb [0.9, 0.1]) wins initially
    def top(): Long = t.searchIndex("ix", Seq(1.0, 0.0), k = 1)
      .select("vec_id").as[Long].head()
    assert(top() == 1L)
    // the UDF flips: embeddings invert, id 2 becomes the nearest
    spark.udf.register("ia_emb", (v: Double) => Array(1.0 - v, v))
    t.recomputeColumns(Seq("emb"))
    assert(top() == 2L,
      "searchIndex ranked by stale vectors after recomputeColumns")
    // the view syncs the rewritten rows: same count (no duplicate
    // _base_rowid expansions), new values
    Views.syncMaterializedView(mv, t, None, Seq("id" -> "id", "e0" -> "emb[0]"))
    val rows = mv.read().orderBy("id").select("id", "e0")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 1.0 - 0.9), (2L, 1.0 - 0.1), (3L, 0.5)), s"got $rows")
  }

  test("streaming ingest × incremental views: each micro-batch version syncs without rebuild") {
    val cat = freshCatalog()
    val dir = java.nio.file.Files.createTempDirectory("ia-stream").toString
    val cp = java.nio.file.Files.createTempDirectory("ia-cp").toString
    val t = GraftTable.create(spark, cat, "ia_streamed", cols)
    Seq((1L, "a b"), (2L, "c")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val view = graft.catalog.Views.createComponentView(spark, cat, "ia_sv", t,
      "split(text, '\\\\s+')", "token", "string", Seq(ColumnDef("id", "bigint")))
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("id bigint, text string")
    val q1 = graft.streaming.Streaming.foreachBatchInto(
      graft.streaming.Streaming.fileStream(spark, dir, schema), t, cp)
    q1.awaitTermination(60000)
    graft.catalog.Views.syncComponentView(view, t,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 3) // a, b, c
    val versionsAfterFirstSync = view.history().count()
    // second wave of files → new micro-batch → new table version; the view
    // must pick up ONLY the delta (no new full-rebuild version spray)
    Seq((3L, "d e f")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    val q2 = graft.streaming.Streaming.foreachBatchInto(
      graft.streaming.Streaming.fileStream(spark, dir, schema), t, cp)
    q2.awaitTermination(60000)
    graft.catalog.Views.syncComponentView(view, t,
      "split(text, '\\\\s+')", "token", Seq("id"))
    assert(view.read().count() == 6)
    assert(view.history().count() == versionsAfterFirstSync + 1,
      "incremental sync after a streamed batch minted more than one version")
    // and the streamed rows time-travel like batch rows
    assert(t.read(Some(1L)).count() == 2)
  }

  test("compute() × unstored chains × type constraints: dry-run evaluates the full pipeline, persists nothing") {
    val cat = freshCatalog()
    val t = GraftTable.create(spark, cat, "dryc", Seq(
      ColumnDef("id", "bigint"),
      ColumnDef("v", "double"),
      ColumnDef("s", "double", computedExpr = Some("v * 2")),
      // unstored depending on stored, and unstored depending on unstored
      ColumnDef("u", "double", computedExpr = Some("s + 1"), stored = false),
      ColumnDef("u2", "double", computedExpr = Some("u * 10"), stored = false),
      // a type-constraint expression as an unstored column: null when the
      // payload violates the schema, the violation message otherwise —
      // the TypeChecks functions compose into computed columns like any
      // other expression
      ColumnDef("j", "string"),
      ColumnDef("j_err", "string", stored = false, computedExpr =
        Some("case when get_json_object(j, '$.k') is null then 'missing k' end"))))
    val out = t.compute(Seq(
        (1L, 2.0, """{"k": 5}"""), (2L, 3.0, """{"other": 1}"""))
      .toDF("id", "v", "j"))
      .orderBy("id")
      .select("s", "u", "u2", "j_err")
      .collect()
    assert(out(0).getDouble(0) == 4.0 && out(0).getDouble(1) == 5.0 &&
      out(0).getDouble(2) == 50.0 && out(0).isNullAt(3))
    assert(out(1).getDouble(0) == 6.0 && out(1).getDouble(1) == 7.0 &&
      out(1).getDouble(2) == 70.0 && out(1).getString(3) == "missing k")
    // nothing persisted: no version minted, no rows stored
    assert(t.currentVersion == 0L && t.read().count() == 0)
    // and insert stores ONLY the stored columns while read() still serves
    // the unstored ones computed fresh
    t.insert(Seq((3L, 4.0, """{"k": 1}""")).toDF("id", "v", "j"))
    val r = graft.api.Query(t).df.filter(col("id") === 3).head()
    assert(r.getAs[Double]("s") == 8.0 && r.getAs[Double]("u") == 9.0 &&
      r.getAs[Double]("u2") == 90.0)
  }
}

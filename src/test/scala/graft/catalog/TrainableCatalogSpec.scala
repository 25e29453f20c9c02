package graft.catalog

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interaction audit (VERDICT r7 #7): the r7 TRAINABLE operators as
  * catalog citizens — a learned BPE merge table and a Naive-Bayes model
  * grid stored as versioned GraftTables, retrained in place (new
  * version), with time travel recovering the previous model and a
  * computed column backfilled from the broadcast model.
  */
class TrainableCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BPE merges: versioned model table, retrain, time travel, computed column") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val docs = GraftTable.create(spark, cat, "corpus", Seq(
      ColumnDef("doc_id", "bigint"), ColumnDef("text", "string")))
    // 'aa' dominates: first merge is (a,a)
    docs.insert(Seq((1L, "aaaa aaaa banana"), (2L, "aaaa aa banana"))
      .toDF("doc_id", "text"))

    val model = GraftTable.create(spark, cat, "bpe_model", Seq(
      ColumnDef("merge_rank", "int"), ColumnDef("lhs", "string"),
      ColumnDef("rhs", "string"), ColumnDef("pair_count", "bigint")))
    val m1 = graft.operators.BpeTrain.learnMerges(docs.read(), "text", 2)
    model.insert(m1.toDF())
    val v1 = model.currentVersion
    assert(m1.head.lhs == "a" && m1.head.rhs == "a")

    // the stored model drives a computed column on the corpus table —
    // the top merge applied via the same parenthesized-symbol encoding
    // the trainer uses (replace() = greedy left-to-right BPE)
    val top = model.read().orderBy("merge_rank").head()
    val (l, r) = (top.getString(1), top.getString(2))
    val enc = "regexp_replace(lower(text), '(.)', '($1)')" // (a)(b)(c) encoding
    val merged = s"replace($enc, '($l)($r)', '($l$r)')"
    val stripped = s"regexp_replace($merged, '^\\\\(|\\\\)$$', '')"
    docs.addColumn(ColumnDef("n_sym_after_m1", "int",
      Some(s"size(split($stripped, '\\\\)\\\\('))")))
    val bySym = docs.read().select("doc_id", "n_sym_after_m1").collect()
      .map(rw => rw.getLong(0) -> rw.getInt(1)).toMap
    // doc 1 "aaaa aaaa banana": 16 chars incl spaces → merging (a)(a)
    // greedily: each "aaaa" 4→2 syms; "banana" keeps 6; spaces 2 → 12
    assert(bySym(1L) == 12)

    // retrain on a grown corpus: replace-in-place = delete + insert,
    // two more versions; the merges change ('bb' now dominates)
    docs.insert(Seq((3L, "bbbb bbbb bbbb bbbb bbbb bbbb"))
      .toDF("doc_id", "text"))
    val m2 = graft.operators.BpeTrain.learnMerges(docs.read(), "text", 2)
    assert(m2.head.lhs == "b" && m2.head.rhs == "b")
    model.delete("1=1")
    model.insert(m2.toDF())

    // current read = new model; time travel = the r1 model, exactly
    val now = model.read().orderBy("merge_rank").collect()
      .map(rw => (rw.getInt(0), rw.getString(1), rw.getString(2))).toSeq
    assert(now == m2.map(m => (m.merge_rank, m.lhs, m.rhs)))
    val old = model.read(Some(v1)).orderBy("merge_rank").collect()
      .map(rw => (rw.getInt(0), rw.getString(1), rw.getString(2))).toSeq
    assert(old == m1.map(m => (m.merge_rank, m.lhs, m.rhs)))
  }

  test("NB model grid: versioned, broadcastable, scores a computed column; revert restores") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    val docs = GraftTable.create(spark, cat, "labeled", Seq(
      ColumnDef("doc_id", "bigint"), ColumnDef("lang", "string"),
      ColumnDef("text", "string")))
    docs.insert(Seq(
      (1L, "en", "the quick brown fox"), (2L, "en", "the lazy dog sleeps"),
      (3L, "de", "der schnelle braune fuchs"), (4L, "de", "der faule hund")
    ).toDF("doc_id", "lang", "text"))

    // train the q132-style hashed grid (k kept tiny here) and store it
    val k = 16
    val toks = docs.read().select(col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("f"))
    def grid(): org.apache.spark.sql.DataFrame = {
      val fb = toks.withColumn("b",
        conv(substring(md5(col("f")), 1, 12), 16, 10).cast("long") % k)
      val cnt = fb.groupBy(col("lang").as("l"), col("b"))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("l")).agg(sum(col("c")).as("tc"))
      tot.select(col("l")).crossJoin(spark.range(k).select(col("id").as("b")))
        .join(tot, Seq("l")).join(cnt, Seq("l", "b"), "left")
        .select(col("l"), col("b"),
          round(log((coalesce(col("c"), lit(0L)) + 1.0) /
            (col("tc") + k.toDouble)) * 1e6).cast("long").as("llh"))
    }
    val model = GraftTable.create(spark, cat, "nb_model", Seq(
      ColumnDef("l", "string"), ColumnDef("b", "bigint"),
      ColumnDef("llh", "bigint")))
    model.insert(grid())
    val v1 = model.currentVersion
    assert(model.read().count() == 2L * k) // the FIXED k×L broadcast grid

    // score through the stored model: argmax lang per doc via broadcast
    def predict(modelDf: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val fb = docs.read().select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("f"))
        .withColumn("b",
          conv(substring(md5(col("f")), 1, 12), 16, 10).cast("long") % k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("s").desc, col("l"))
      fb.join(broadcast(modelDf), Seq("b"))
        .groupBy(col("doc_id"), col("l")).agg(sum(col("llh")).as("s"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select("doc_id", "l").collect()
        .map(rw => rw.getLong(0) -> rw.getString(1)).toMap
    }
    val p1 = predict(model.read())
    assert(p1(1L) == "en" && p1(3L) == "de") // self-classification sane

    // corrupt the model (the retrain-gone-wrong drill), then REVERT:
    // time travel + revert restore the exact grid
    model.delete("l = 'en'")
    assert(model.read().count() == 1L * k)
    model.revert(v1)
    assert(model.read().count() == 2L * k)
    assert(predict(model.read()) == p1)
  }
}

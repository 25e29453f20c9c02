package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the corpus-curation queries' building blocks
  * (queries/Curation.scala) — the oracle gate proves engine parity; these
  * prove the MATH against hand-computed values.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("temperature mixture rates: n^0.5 weights, budget-capped, closed form") {
    // langs: a=100 docs, b=400 docs; alpha=0.5 → weights sqrt(100)=10,
    // sqrt(400)=20 → denom 30. budget 150:
    //   rate_a = min(1, 150 * (10/30) / 100) = 0.5
    //   rate_b = min(1, 150 * (20/30) / 400) = 0.25
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 500).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    val counts = docs.groupBy($"lang").agg(count(lit(1)).cast("double").as("n"))
    val denom = counts.agg(sum(sqrt($"n")).as("denom"))
    val rates = counts.crossJoin(denom)
      .withColumn("rate",
        round(least(lit(1.0), lit(150.0) * sqrt($"n") / $"denom" / $"n"), 6))
      .select($"lang", $"rate").as[(String, Double)].collect().toMap
    assert(rates == Map("a" -> 0.5, "b" -> 0.25))
  }

  test("char-bigram LM: two-doc corpus scores match hand computation") {
    // docs: "aa" (bigrams: aa), "ab" (bigrams: ab) → counts aa=1, ab=1,
    // total=2 → every bigram prob 1/2 → avg log2 p = -1.0 for both docs
    val docs = Seq((1L, "aa"), (2L, "ab")).toDF("doc_id", "text")
    val bg = docs.select($"doc_id",
      explode(transform(sequence(lit(1), length($"text") - 1),
        i => lower($"text").substr(i, lit(2)))).as("bg"))
    val model = bg.groupBy($"bg").agg(count(lit(1)).cast("double").as("cnt"))
    val total = model.agg(sum($"cnt").as("tot"))
    val scored = bg.join(model, Seq("bg")).crossJoin(total)
      .groupBy($"doc_id")
      .agg(round(avg(log2($"cnt" / $"tot")), 4).as("lp"))
      .as[(Long, Double)].collect().toMap
    assert(scored == Map(1L -> -1.0, 2L -> -1.0))
  }

  test("dup-span coverage: shared 8-gram covers exactly its positions") {
    // doc 1 and 2 share their first 8 words; doc 3 is disjoint.
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " x1 x2"),            // 10 tokens, 8 covered
      (2L, shared),                       // 8 tokens, 8 covered
      (3L, (1 to 9).map(i => s"z$i").mkString(" ")), // no dup grams
      (4L, "short doc"),                  // < 8 tokens: no grams at all
    ).toDF("doc_id", "text")
    val toks = docs.select($"doc_id", split(trim($"text"), "\\s+").as("w"))
    val grams = toks.select($"doc_id",
        explode(when(size($"w") >= 8, sequence(lit(1), size($"w") - 7))
          .otherwise(lit(null))).as("pos"), $"w")
      .select($"doc_id", $"pos", array_join(slice($"w", $"pos", lit(8)), " ").as("gram"))
    val dup = grams.groupBy($"gram").agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1).select($"gram")
    val covered = grams.join(dup, Seq("gram"))
      .select($"doc_id", explode(sequence($"pos", $"pos" + 7)).as("p"))
      .distinct().groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(covered == Map(1L -> 8L, 2L -> 8L))
  }

  test("mixture hash draw is reproducible and uniform-ish") {
    // the md5 fraction must be stable across plans/runs (sampling gate)
    val ids = (0 until 2000).map(_.toLong).toDF("doc_id")
    def frac = conv(substring(md5(concat(lit("103_"),
      $"doc_id".cast("string"))), 1, 12), 16, 10).cast("double") /
      281474976710656.0
    val a = ids.select($"doc_id", frac.as("f")).as[(Long, Double)].collect().toMap
    val b = ids.repartition(13).select($"doc_id", frac.as("f"))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    val mean = a.values.sum / a.size
    assert(mean > 0.45 && mean < 0.55, s"hash fractions not uniform: mean=$mean")
    assert(a.values.forall(v => v >= 0.0 && v < 1.0))
  }
}

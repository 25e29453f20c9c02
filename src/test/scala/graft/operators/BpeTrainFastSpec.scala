package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the production-scale BPE trainer (`BpeTrain.learnMergesFast`):
  * EXACT sequential equality with the reference `learnMerges` loop on fixed
  * corpora (including tie-break order and greedy L2R application), plus a
  * 10k-merge in-memory train proving the indexed-delta path is usable at
  * production vocab sizes where the per-merge driver round-trip is not.
  */
class BpeTrainFastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertSame(texts: Seq[String], n: Int): Unit = {
    val docs = texts.toDF("text")
    val slow = BpeTrain.learnMerges(docs, "text", n)
    val fast = BpeTrain.learnMergesFast(docs, "text", n)
    assert(fast == slow)
  }

  test("equality with the distributed loop on the BpeTrainSpec corpora") {
    assertSame(Seq("abab ab cd", "abab ab", "abab"), 3)
    assertSame(Seq("aaa"), 2)
    assertSame(Seq("ab ab ab xab"), 2)
    assertSame(Seq("a b c"), 5) // both stop early with zero merges
  }

  test("equality on a mixed corpus deep into the merge sequence") {
    // enough structure for 40 merges with plenty of count ties, so the
    // (count DESC, lhs, rhs) tie-break and greedy application both face
    // real pressure; seeded generator => deterministic pin
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "quick", "brown", "foxes", "jumped", "over",
      "lazy", "dogs", "banana", "bananas", "abracadabra", "mississippi")
    val texts = (0 until 200).map { _ =>
      (0 until 8).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    assertSame(texts, 40)
  }

  test("maxWords cap keeps only the top words by (cnt DESC, w)") {
    // "zz" appears once, "aa" and "bb" twice: cap=2 must drop "zz" and
    // therefore never learn (z,z)
    val docs = Seq("aa bb zz", "aa bb").toDF("text")
    val fast = BpeTrain.learnMergesFast(docs, "text", 10, maxWords = 2)
    assert(fast.map(m => (m.lhs, m.rhs)).toSet == Set("a" -> "a", "b" -> "b"))
  }

  test("10k merges train in seconds on a 20k-word table (scale path)") {
    val rnd = new scala.util.Random(7)
    val letters = "abcdefghijklmnop"
    val words = Array.tabulate(20000) { i =>
      val len = 5 + rnd.nextInt(10)
      val w = Array.fill(len)(letters(rnd.nextInt(letters.length))).mkString
      (w.split("").filter(_.nonEmpty), (1L + rnd.nextInt(50)))
    }
    val t0 = System.nanoTime()
    val merges = BpeTrain.learnInMemory(words, 10000)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"10k-merge in-memory train: $sec%.2f s, learned ${merges.length}")
    assert(merges.length > 5000, s"expected a deep merge sequence, got ${merges.length}")
    // ranks are sequential and counts non-increasing is NOT required by BPE
    // (merges create new high-count pairs), but ranks must be 1..n
    assert(merges.map(_.merge_rank) == (1 to merges.length))
    assert(sec < 120.0, f"10k merges took $sec%.1f s — delta maintenance regressed")
  }
}

package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** BPE training semantics pins: weighted pair counting over word
  * frequencies, (count DESC, lhs, rhs) tie-break, greedy LEFT-TO-RIGHT
  * merge application (the property the parenthesized encoding guarantees),
  * and no mid-symbol false matches.
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merges rank by corpus-weighted pair counts and rewrite words") {
    // "abab" ×3, "ab" ×2, "cd" ×1 as whitespace tokens
    val docs = Seq("abab ab cd", "abab ab", "abab").toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", 3)
    assert(merges == Seq(
      BpeTrain.Merge(1, "a", "b", 8),   // 2·3 from abab + 1·2 from ab
      BpeTrain.Merge(2, "ab", "ab", 3), // abab is (ab)(ab) after merge 1
      BpeTrain.Merge(3, "c", "d", 1)))
  }

  test("greedy left-to-right: 'aaa' merges the FIRST pair, leaving (aa)(a)") {
    val docs = Seq("aaa").toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", 2)
    // round 1: pair (a,a) counted twice in [a,a,a]; applying it greedily
    // leaves (aa)(a) — so round 2's winner must be (aa, a), NOT (a, aa)
    assert(merges == Seq(
      BpeTrain.Merge(1, "a", "a", 2),
      BpeTrain.Merge(2, "aa", "a", 1)))
  }

  test("merged symbols never false-match inside longer symbols") {
    // after (a,b)→ab, the word "xab" is (x)(ab): the pair (x, ab) exists,
    // but nothing inside "(xa)(b)"-style boundaries ever matched — pin by
    // checking the round-2 pair set through the learned merge
    val docs = Seq("ab ab ab xab").toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", 2)
    assert(merges.head == BpeTrain.Merge(1, "a", "b", 4))
    assert(merges(1) == BpeTrain.Merge(2, "x", "ab", 1))
  }

  test("stops early when no pairs remain") {
    val docs = Seq("a b c").toDF("text") // single-char words: zero pairs
    assert(BpeTrain.learnMerges(docs, "text", 5).isEmpty)
  }
}

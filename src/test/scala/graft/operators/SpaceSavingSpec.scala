package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def zipfStream(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val u = math.max(rnd.nextDouble(), 1e-12)
      math.min(math.floor(1.0 / u).toLong, 100000L).toString
    }
  }

  private def exactCounts(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact when distinct items fit in capacity") {
    val s = SpaceSaving.emptySummary(64)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    stream.foreach(s.offer)
    assert(s.counts("a") == ((3L, 0L)))
    assert(s.counts("b") == ((2L, 0L)))
    assert(s.counts("c") == ((1L, 0L)))
    assert(s.minBound == 0L) // under capacity: absent means zero
  }

  test("bounds hold on a zipf stream; heavy items never evicted") {
    val stream = zipfStream(20000, 7)
    val truth = exactCounts(stream)
    val m = 128
    val s = SpaceSaving.emptySummary(m)
    stream.foreach(s.offer)
    assert(s.counts.size == m)
    s.counts.foreach { case (k, (est, err)) =>
      val t = truth.getOrElse(k, 0L)
      assert(est >= t, s"$k est $est < true $t")
      assert(est - err <= t, s"$k lower bound ${est - err} > true $t")
    }
    // classic guarantee: any item with true count > n/m is present
    val bound = stream.size.toLong / m
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(s.counts.contains(k), s"heavy item $k (count ${truth(k)}) missing")
    }
    // absent items are bounded by the min estimate
    val mb = s.minBound
    truth.filterNot { case (k, _) => s.counts.contains(k) }
      .foreach { case (k, t) => assert(t <= mb, s"absent $k count $t > min $mb") }
  }

  test("pair-merge of partition summaries preserves both bounds") {
    val stream = zipfStream(40000, 11)
    val truth = exactCounts(stream)
    val m = 256
    val parts = stream.grouped(10000).toSeq.map { chunk =>
      val s = SpaceSaving.emptySummary(m)
      chunk.foreach(s.offer)
      s
    }
    val merged = parts.reduce((a, b) => a.mergeWith(b))
    assert(merged.counts.size <= m)
    merged.counts.foreach { case (k, (est, err)) =>
      val t = truth.getOrElse(k, 0L)
      assert(est >= t, s"$k est $est < true $t")
      assert(est - err <= t, s"$k lower ${est - err} > true $t")
    }
    // heavy coverage with the merged (doubled) error bound
    val bound = 2L * stream.size / m
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(merged.counts.contains(k), s"heavy $k (${truth(k)}) missing after merge")
    }
  }

  test("spark typed aggregation across many partitions") {
    import spark.implicits._
    val stream = zipfStream(30000, 13)
    val truth = exactCounts(stream)
    val ds = spark.createDataset(stream).repartition(7)
    val out = ds.select(new SpaceSavingAgg(256).toColumn).head()
    assert(out.nonEmpty && out.size <= 256)
    // sorted by est desc
    assert(out.sliding(2).forall(p => p.head._2 >= p.last._2))
    out.foreach { case (k, est, err) =>
      val t = truth.getOrElse(k, 0L)
      assert(est >= t && est - err <= t, s"$k est=$est err=$err true=$t")
    }
    val bound = 2L * stream.size / 256
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(out.exists(_._1 == k), s"heavy $k missing")
    }
  }
}

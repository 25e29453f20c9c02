package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property pins for the kernels whose correctness arguments are
  * mathematical rather than example-based: the HNSW spherical-cap pruning
  * bound (soundness: never excludes a true result), textwrap line
  * invariants, graph-search recall, connected components vs a union-find
  * oracle, and the xlsx round-trip. Deterministic seed — failures reproduce.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unitVec(rnd: scala.util.Random, dim: Int): Array[Double] =
    Hnsw.unit(Array.fill(dim)(rnd.nextGaussian()))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("property: cap bound never excludes a shard member (500 trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val dim = 2 + rnd.nextInt(15)
      val members = Seq.fill(3 + rnd.nextInt(20))(unitVec(rnd, dim))
      val centroidRaw = members.transpose.map(_.sum).toArray
      val centroid = Hnsw.unit(centroidRaw)
      val minCos = members.map(dot(_, centroid)).min
      val q = unitVec(rnd, dim)
      val bound = Hnsw.capBound(dot(q, centroid), minCos)
      val bestActual = members.map(dot(q, _)).max
      assert(bound >= bestActual - 1e-9,
        s"cap bound $bound < member cosine $bestActual (dim=$dim)")
    }
  }

  test("property: semantic cluster-pair ceiling never excludes a pair (300 trials)") {
    // soundness of Dedup.candidateClusterPairs' triangle-inequality bound:
    // for ANY layout (centroids need not be means, radii from true max
    // member distance), every row pair with round6(cos) >= tau lies in a
    // candidate cluster pair — the same argument the oracle-gated q100
    // rides, here exercised across random dims/k/tau
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val dim = 2 + rnd.nextInt(6)
      val k = 2 + rnd.nextInt(4)
      val n = 10 + rnd.nextInt(25)
      val vecs = Seq.fill(n)(unitVec(rnd, dim))
      val cents = Seq.fill(k)(unitVec(rnd, dim)).map(_.clone())
      def distTo(v: Array[Double], c: Array[Double]) =
        math.sqrt(v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      val assign = vecs.map(v => cents.indices.minBy(c => distTo(v, cents(c))))
      val radii = (0 until k).map { c =>
        val members = vecs.zip(assign).collect { case (v, a) if a == c => v }
        c -> (if (members.isEmpty) 0.0 else members.map(distTo(_, cents(c))).max)
      }.toMap
      val ivf = ExactAnn.Ivf(KMeans.Model(cents.map(_.toSeq)), radii)
      val tau = rnd.nextDouble() * 2 - 1
      val cand = Dedup.candidateClusterPairs(ivf, tau, exact = true).toSet
      for (i <- 0 until n; j <- (i + 1) until n) {
        val cos = BigDecimal(dot(vecs(i), vecs(j)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (cos >= tau) {
          val (ci, cj) = (assign(i) min assign(j), assign(i) max assign(j))
          assert(cand.contains((ci, cj)),
            s"pair cos=$cos tau=$tau clusters=($ci,$cj) missing (dim=$dim k=$k)")
        }
      }
    }
  }

  test("property: textwrap keeps every line within width, loses no words") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde fgh ij klmnopqrstuvw xyz   "
    for (_ <- 1 to 300) {
      val s = Seq.fill(rnd.nextInt(30))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val width = 1 + rnd.nextInt(12)
      val lines = graft.functions.Udfs.textWrapImpl(s, width)
      assert(lines.forall(l => l.nonEmpty && l.length <= width),
        s"line over width=$width for ${s.inspect}: $lines")
      // chunked long words rejoin to the original word stream
      val inWords = s.trim.split("\\s+").filter(_.nonEmpty).mkString
      val outWords = lines.flatMap(_.split(" ")).mkString
      assert(outWords == inWords, s"words changed for ${s.inspect}")
    }
  }

  test("property: PDF write→extract round-trips arbitrary page text (200 trials)") {
    val rnd = new scala.util.Random(99)
    // byte-hostile alphabet: parens, backslashes, control chars, newlines,
    // non-ASCII and astral (surrogate-pair) code points
    val pool: IndexedSeq[String] = ("abc ()\\%<>[]/#\t".map(_.toString) :+
      "\n" :+ "é" :+ "中" :+ "🎉" :+ "\r\n" :+ "")
    for (_ <- 1 to 200) {
      val pages = Seq.fill(1 + rnd.nextInt(5))(
        Seq.fill(rnd.nextInt(80))(pool(rnd.nextInt(pool.length))).mkString)
      val got = graft.functions.Pdf.extractPages(graft.functions.Pdf.writePdf(pages))
      assert(got == pages, s"round-trip diverged for ${pages.map(_.inspect)}")
    }
  }

  test("property: single-graph HNSW recall stays high on random sets") {
    val rnd = new scala.util.Random(1234)
    val recalls = (1 to 15).map { _ =>
      val n = 50 + rnd.nextInt(150)
      val data = (0L until n.toLong).map(i => i -> unitVec(rnd, 12))
      val g = Hnsw.buildGraph(data.iterator, m = 12, efConstruction = 80)
      val q = unitVec(rnd, 12)
      val brute = data.map { case (id, v) => (id, dot(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val got = g.search(q, 10, ef = 64).map(_._1).toSet
      (brute & got).size / 10.0
    }
    assert(recalls.sum / recalls.size >= 0.95,
      s"mean recall ${recalls.sum / recalls.size}: $recalls")
    assert(recalls.min >= 0.8, s"worst-case recall ${recalls.min}: $recalls")
  }

  test("property: connected components match a union-find oracle") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 4) {
      val n = 12 + rnd.nextInt(10)
      val edges = Seq.fill(10 + rnd.nextInt(15))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val got = Dedup.connectedComponents(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every vertex that appears in an edge gets its root's min label
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val oracleGroups = verts.groupBy(v => find(v.toInt)).values
        .map(_.toSet).toSet
      val gotGroups = verts.groupBy(got).values.map(_.toSet).toSet
      assert(gotGroups == oracleGroups, s"trial $trial: $gotGroups vs $oracleGroups")
    }
  }

  test("property: xlsx round-trip preserves random typed tables") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val n = 1 + rnd.nextInt(25)
      val rows = (1 to n).map { i =>
        (i.toLong * 7, rnd.nextDouble() * 1000 - 500,
          Seq.fill(rnd.nextInt(12))(
            " ab<&>\"cdefg".charAt(rnd.nextInt(12))).mkString,
          rnd.nextBoolean())
      }
      val df = rows.toDF("id", "x", "s", "b")
      val path = java.nio.file.Files.createTempDirectory("prop-xlsx")
        .resolve("t.xlsx").toString
      graft.io.Excel.exportExcel(df, path)
      val back = graft.io.Excel.importExcel(spark, path)
        .orderBy("id").collect()
      rows.sortBy(_._1).zip(back).foreach { case ((id, x, s0, b), r) =>
        assert(r.getLong(0) == id)
        assert(math.abs(r.getDouble(1) - x) < 1e-9, s"trial $trial x")
        // empty cells read back as null; whitespace-only strings trim to empty
        val expectS = if (s0.isEmpty) null else s0
        val gotS = r.getString(2)
        assert(gotS == expectS || (gotS == null && s0.trim.isEmpty) ||
          gotS == s0.trim, // Excel shared strings may trim outer spaces
          s"trial $trial s: got ${Option(gotS)} want ${s0.inspect}")
        assert(r.getBoolean(3) == b)
      }
    }
  }

  test("property: tileIterator grid covers every source pixel; boxes step uniformly (150 trials)") {
    import org.apache.spark.sql.functions.{col, lit, posexplode}
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 150) {
      val w = 3 + rnd.nextInt(40); val h = 3 + rnd.nextInt(30)
      val tw = 2 + rnd.nextInt(10); val th = 2 + rnd.nextInt(8)
      val ow = rnd.nextInt(tw); val oh = rnd.nextInt(th)
      val rows = Seq(1).toDF("one")
        .select(posexplode(graft.functions.Images.tileIterator(
          graft.functions.Images.makeSolidPng(lit(w), lit(h), lit(0x123456)),
          lit(tw), lit(th), lit(ow), lit(oh))))
        .select(col("col._3"), col("col._4"), col("col._5"), col("col._6"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      // Python floor-div grid (the reference formula); an image no wider
      // than the overlap legitimately yields an empty grid
      val xlen = math.max(0, Math.floorDiv(w - ow - 1, tw - ow) + 1)
      val ylen = math.max(0, Math.floorDiv(h - oh - 1, th - oh) + 1)
      assert(rows.length == xlen * ylen, s"trial $trial: grid size")
      if (xlen > 0 && ylen > 0) {
        // coverage: every source pixel falls inside at least one box
        val covered = Array.ofDim[Boolean](w, h)
        rows.foreach { case (x1, y1, x2, y2) =>
          for (x <- x1 until math.min(x2, w); y <- y1 until math.min(y2, h))
            covered(x)(y) = true
        }
        assert(covered.forall(_.forall(identity)),
          s"trial $trial: uncovered pixel (w=$w h=$h t=$tw×$th o=$ow×$oh)")
      }
    }
  }

  test("property: videoSplitter/audioSegments partition their timeline when overlap=0 (40 trials)") {
    import org.apache.spark.sql.functions.{col, lit, posexplode}
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(30)
      val durFrames = 1 + rnd.nextInt(12)
      val segs = Seq(graft.functions.Video.makeTestVideo(n, 8, 6, 0x224466, 10))
        .toDF("v")
        .select(posexplode(graft.functions.Video.videoSplitter(
          col("v"), lit(durFrames / 10.0), lit(0.0), lit(0.0))))
        .select(col("col.segment_start_pts"), col("col.segment_end_pts"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // contiguous, exhaustive, nonempty: [0,n) exactly
      assert(segs.head._1 == 0L && segs.last._2 == n.toLong, s"trial $trial")
      segs.sliding(2).foreach {
        case Array((_, e), (s, _)) => assert(e == s, s"trial $trial: gap at $e")
        case _ =>
      }
      assert(segs.forall { case (s, e) => e > s }, s"trial $trial: empty segment")
    }
    for (trial <- 1 to 40) {
      val secs = 0.1 + rnd.nextInt(20) * 0.1
      val budget = 0.1 + rnd.nextInt(8) * 0.05
      val wav = graft.functions.Audio.sineWav(secs, 330.0)
      val total = graft.functions.Audio.decodePcm(wav)._2.length
      val segs = Seq(wav).toDF("wav")
        .select(posexplode(graft.functions.Audio.audioSegments(
          col("wav"), lit(budget), lit(0.0), lit(0L), lit(0.01), lit(0.0),
          lit(false))))
        .select(col("col.segment_start"), col("col.segment_end"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      val rate = 16000.0
      assert(math.abs(segs.head._1) < 1e-9 &&
        math.abs(segs.last._2 - total / rate) < 1e-9, s"audio trial $trial")
      segs.sliding(2).foreach {
        case Array((_, e), (s, _)) =>
          assert(math.abs(e - s) < 1e-9, s"audio trial $trial: gap at $e")
        case _ =>
      }
    }
  }

  private implicit class Inspect(s: String) {
    def inspect: String = "\"" + s.replace("\"", "\\\"") + "\""
  }
}

package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Beam-search decode (the reference translation UDF's generate kwargs:
  * num_beams=4, early_stopping, huggingface.py:1628): independent naive
  * reimplementation cross-check of the search (the forward it scores with
  * is itself naively cross-checked in MarianSpec/BartSpec), the
  * beam=1 ≡ greedy reduction, forced-BOS interaction, and the
  * length-penalty finalization convention.
  */
class BeamSpec extends AnyFunSuite {

  private lazy val dir: String = LocalModels.ensureTinyMarianModel(seed = 42L)

  /** Independent re-expression of the documented semantics: per step the
    * top 2·n candidates in score order; EOS finalizes with
    * score / len^penalty (length incl. the start token); first n non-EOS
    * survive; early stop at n finished.
    */
  private def naiveBeam(bundle: LocalModels.MarianBundle, src: Seq[Int],
      maxNew: Int, n: Int, forced: Option[Int],
      lengthPenalty: Double = 1.0): Seq[Int] = {
    val m = bundle.model
    val cfg = bundle.cfg
    val enc = m.encode(src)
    def logsm(a: Array[Float]): Array[Double] = {
      val mx = a.max.toDouble
      val lse = mx + math.log(a.map(v => math.exp(v - mx)).sum)
      a.map(_ - lse)
    }
    var live = List((Vector(cfg.decoderStartTokenId), 0.0))
    var fin = List.empty[(Vector[Int], Double)]
    var step = 0
    while (step < maxNew && fin.size < n && live.nonEmpty) {
      val cands =
        if (step == 0 && forced.isDefined) live.map(b => (b._1, forced.get, b._2))
        else for {
          (toks, sc) <- live
          (l, t) <- logsm(m.decodeStep(toks, enc, src.length)).zipWithIndex
        } yield (toks, t, sc + l)
      var nextLive = List.empty[(Vector[Int], Double)]
      cands.sortBy(-_._3).take(2 * n).foreach { case (toks, t, sc) =>
        if (t == cfg.eosTokenId) {
          if (fin.size < n)
            fin :+= ((toks, sc / math.pow(toks.length, lengthPenalty)))
        } else if (nextLive.size < n) nextLive :+= ((toks :+ t, sc))
      }
      live = nextLive
      step += 1
    }
    live.foreach { case (toks, sc) =>
      if (fin.size < n)
        fin :+= ((toks, sc / math.pow(toks.length, lengthPenalty)))
    }
    fin.maxBy(_._2)._1.drop(1)
  }

  test("beam search matches the independent naive implementation") {
    val bundle = LocalModels.loadMarian(dir)
    for (text <- Seq("hello world", "guten tag", "a longer piece of text here");
         n <- Seq(2, 4)) {
      val src = bundle.encodeSource(text, 32)
      val fast = bundle.model.generateBeam(src, 6, n, None)
      val slow = naiveBeam(bundle, src, 6, n, None)
      assert(fast == slow, s"text='$text' n=$n: $fast vs $slow")
    }
  }

  test("numBeams = 1 reduces exactly to greedy") {
    val bundle = LocalModels.loadMarian(dir)
    val src = bundle.encodeSource("reduction check", 32)
    assert(bundle.model.generateBeam(src, 6, 1, None) ==
      bundle.model.generate(src, 6, None))
  }

  test("forced BOS holds under beam search; deterministic") {
    val bundle = LocalModels.loadMarian(dir)
    val src = bundle.encodeSource("hello world", 32)
    val fr = bundle.model.generateBeam(src, 5, 4, Some(258))
    assert(fr.headOption.contains(258))
    assert(fr == bundle.model.generateBeam(src, 5, 4, Some(258)))
    assert(fr == naiveBeam(bundle, src, 5, 4, Some(258)))
  }

  test("beam's length-penalized score is at least greedy's") {
    val bundle = LocalModels.loadMarian(dir)
    val m = bundle.model
    val cfg = bundle.cfg
    val src = bundle.encodeSource("scoring comparison", 32)
    val enc = m.encode(src)
    def score(gen: Seq[Int]): Double = {
      var toks = Vector(cfg.decoderStartTokenId)
      var s = 0.0
      (gen :+ cfg.eosTokenId).foreach { t =>
        val a = m.decodeStep(toks, enc, src.length)
        val mx = a.max.toDouble
        val lse = mx + math.log(a.map(v => math.exp(v - mx)).sum)
        s += a(t) - lse
        toks :+= t
      }
      s / toks.length // hypothesis length incl. start, penalty 1.0
    }
    val beam = m.generateBeam(src, 6, 4, None)
    val greedy = m.generate(src, 6, None)
    // the greedy hypothesis stays inside a 4-beam frontier on this tiny
    // landscape, so the beam result must score at least as well
    assert(score(beam) >= score(greedy) - 1e-9,
      s"beam=${score(beam)} greedy=${score(greedy)}")
  }
}

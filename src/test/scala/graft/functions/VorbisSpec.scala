package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Vorbis I decoder: canonical Huffman assignment against the spec's own
  * worked example (§3.2.1), the generative floor dB table against
  * transcribed spec literals, MDCT/IMDCT perfect reconstruction (TDAC),
  * exact residue integer round-trips through real packets (mono and
  * coupled stereo), Ogg and WebM carriage equality, tone decode
  * fidelity, and corruption behavior (no crash / no OOM).
  */
class VorbisSpec extends AnyFunSuite {

  test("bitpacker: LSB-first round trip, cross-byte fields") {
    val bw = new Vorbis.BitWriter
    bw.writeBits(13, 5)
    bw.writeBits(1723, 11)
    bw.writeBits(0x564342, 24)
    bw.writeBit(1)
    val br = new Vorbis.BitReader(bw.toBytes)
    assert(br.readBits(5) == 13)
    assert(br.readBits(11) == 1723)
    assert(br.readBits(24) == 0x564342)
    assert(br.readBit() == 1)
    // spec §2.1.4 example: 0x3A 0x56 encodes 58 (8 bits) then 86
    val br2 = new Vorbis.BitReader(Array(0x3A.toByte, 0x56.toByte))
    assert(br2.readBits(8) == 58 && br2.readBits(8) == 86)
  }

  test("huffman assignment matches the spec §3.2.1 worked example") {
    // lengths [2,4,4,4,4,2,3,3] -> 00 0100 0101 0110 0111 10 110 111
    val cb = Vorbis.Codebook(1, 8, Array(2, 4, 4, 4, 4, 2, 3, 3), 0,
      0f, 0f, 0, sequenceP = false, Array.empty)
    assert(cb.codewords.toSeq == Seq(0x0, 0x4, 0x5, 0x6, 0x7, 0x2, 0x6, 0x7))
    // decode each codeword written MSB-first
    val bw = new Vorbis.BitWriter
    val order = Seq(3, 0, 7, 5, 2)
    order.foreach(e => bw.writeCodeword(cb.codewords(e),
      Array(2, 4, 4, 4, 4, 2, 3, 3)(e)))
    val br = new Vorbis.BitReader(bw.toBytes)
    order.foreach(e => assert(cb.decodeScalar(br) == e))
  }

  test("over-subscribed huffman tree is rejected") {
    intercept[IllegalArgumentException] {
      Vorbis.Codebook(1, 3, Array(1, 1, 1), 0, 0f, 0f, 0,
        sequenceP = false, Array.empty).codewords
    }
  }

  test("completeLengths is Kraft-complete for assorted sizes") {
    for (n <- Seq(2, 3, 16, 81, 100, 257)) {
      val lens = Vorbis.completeLengths(n)
      val kraft = lens.map(l => math.pow(2.0, -l)).sum
      assert(math.abs(kraft - 1.0) < 1e-12, s"n=$n kraft=$kraft")
      // and the assignment succeeds (complete tree)
      Vorbis.Codebook(1, n, lens, 0, 0f, 0f, 0, sequenceP = false,
        Array.empty).codewords
    }
  }

  test("floor1 inverse dB table: generative formula vs spec literals") {
    val t = Vorbis.floor1InverseDbTable
    // transcribed from the Vorbis I spec floor1_inverse_dB_table
    assert(math.abs(t(0) - 1.0649863e-07f) < 1e-13f)
    assert(math.abs(t(1) - 1.1341951e-07f) < 1e-13f)
    assert(math.abs(t(2) - 1.2079015e-07f) < 1e-13f)
    assert(math.abs(t(3) - 1.2863978e-07f) < 1e-13f)
    assert(t(255) == 1.0f) // 10^0 exactly
    // monotone increasing, constant ratio 10^(7/256)
    val r = math.pow(10, 7.0 / 256)
    (1 until 256).foreach(i =>
      assert(math.abs(t(i) / t(i - 1) - r) < 1e-6))
  }

  test("float32 pack/unpack round-trips grid values") {
    for (v <- Seq(1f, -4f, 0.5f, 0.25f, -32f, 3f, 0f))
      assert(Vorbis.float32Unpack(Vorbis.float32Pack(v)) == v)
  }

  test("MDCT -> IMDCT windowed overlap-add is perfect reconstruction") {
    val n = Vorbis.N
    val n2 = n / 2
    val rnd = new scala.util.Random(7)
    val pcm = Array.fill(n2 * 6)((rnd.nextFloat() - 0.5f) * 1.6f)
    val w = Vorbis.window(n)
    // analysis frames at hop n/2 (frame t covers [(t-1)n/2, (t+1)n/2))
    val nFrames = pcm.length / n2 + 1
    val specs = (0 until nFrames).map { t =>
      val fr = Array.tabulate(n) { j =>
        val s = (t - 1) * n2 + j
        if (s >= 0 && s < pcm.length) pcm(s) else 0f
      }
      Vorbis.mdct(fr, n)
    }
    // synthesis: windowed IMDCT + overlap-add
    val out = new Array[Float](pcm.length)
    var prev: Array[Float] = null
    specs.zipWithIndex.foreach { case (sp, t) =>
      val y = Vorbis.imdct(sp, n)
      (0 until n).foreach(i => y(i) *= w(i))
      if (prev != null) {
        val base = (t - 1) * n2
        (0 until n2).foreach { k =>
          if (base + k < out.length) out(base + k) = prev(n2 + k) + y(k)
        }
      }
      prev = y
    }
    val err = pcm.indices.map(i => math.abs(out(i) - pcm(i))).max
    assert(err < 1e-4f, s"TDAC reconstruction error $err")
  }

  test("mono residue integers round-trip exactly through real packets") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 5).map { p =>
      Array.tabulate(128) { i =>
        if ((i / 8 + p) % 3 == 0) 0 else rnd.nextInt(9) - 4
      }
    }
    val pkts = Vorbis.encodePackets(1, 8000, vecs)
    val d = Vorbis.decode(pkts)
    assert(d.info.channels == 1 && d.info.sampleRate == 8000)
    assert(d.info.blocksize0 == 256 && d.info.blocksize1 == 256)
    assert(d.nAudioPackets == 5)
    assert(d.pcm(0).length == 4 * 128)
    val expected = vecs.map(_.map(_.toLong).sum).sum
    assert(d.residueSums(0) == expected, "residue integer sum must be exact")
  }

  test("stereo square-polar coupling decodes per spec §4.3.5") {
    // one packet; coded (M, A) pairs covering all four sign branches
    val coded = new Array[Int](256)
    val cases = Seq((3, 2), (3, -2), (-3, 2), (-3, -2), (0, 1), (0, -1),
      (2, 0), (-2, 0), (4, 4), (-4, -4))
    cases.zipWithIndex.foreach { case ((m, a), b) =>
      coded(b * 2) = m; coded(b * 2 + 1) = a
    }
    val pkts = Vorbis.encodePackets(2, 16000, Seq(coded, coded))
    val d = Vorbis.decode(pkts)
    def inv(m: Int, a: Int): (Int, Int) =
      if (m > 0) { if (a > 0) (m, m - a) else (m + a, m) }
      else { if (a > 0) (m, m + a) else (m - a, m) }
    val expL = cases.map { case (m, a) => inv(m, a)._1.toLong }.sum * 2
    val expR = cases.map { case (m, a) => inv(m, a)._2.toLong }.sum * 2
    assert(d.residueSums(0) == expL && d.residueSums(1) == expR,
      s"${d.residueSums.toSeq} vs ($expL, $expR)")
    assert(d.pcm.length == 2 && d.pcm(0).length == 128)
  }

  test("ogg carriage: pages -> packets -> decode, granules consistent") {
    val vecs = (0 until 7).map(p => Array.tabulate(128)(i =>
      ((p * 31 + i) % 9) - 4))
    val pkts = Vorbis.encodePackets(1, 8000, vecs,
      tags = Seq("title" -> "t1"))
    val ogg = Vorbis.muxOgg(pkts)
    assert(Ogg.isOgg(ogg))
    val back = Ogg.packetsOf(ogg)
    assert(back.length == pkts.length)
    back.zip(pkts).foreach(p => assert(p._1.sameElements(p._2)))
    val d = Vorbis.decodeOgg(ogg)
    assert(d.pcm(0).length == 6 * 128)
    // header-only metadata walk agrees with decode
    val meta = Ogg.readMeta(ogg)
    assert(meta.codec == "vorbis" && meta.sampleRate == 8000)
    assert(meta.totalSamples == 6 * 128)
    assert(Ogg.readTags(ogg).toMap.get("title").contains("t1"))
  }

  test("webm carriage decodes identically to ogg carriage") {
    val vecs = (0 until 4).map(p => Array.tabulate(128)(i =>
      ((p * 7 + i * 3) % 9) - 4))
    val pkts = Vorbis.encodePackets(1, 12000, vecs)
    val ogg = Vorbis.muxOgg(pkts)
    val webm = Mkv.writeVorbis(pkts.take(3), pkts.drop(3), 12000, 1, 128)
    assert(Mkv.isMkv(webm))
    val mkvPkts = Mkv.vorbisPackets(webm).get
    assert(mkvPkts.length == pkts.length)
    mkvPkts.zip(pkts).foreach(p => assert(p._1.sameElements(p._2)))
    val a = Vorbis.decodeOgg(ogg)
    val b = Vorbis.decode(mkvPkts)
    assert(a.pcm(0).sameElements(b.pcm(0)))
    assert(a.residueSums(0) == b.residueSums(0))
    // track metadata is intact through the generic parser
    val t = Mkv.parse(webm).tracks.head
    assert(t.codec == "vorbis" && t.channels == 1 && t.sampleRate == 12000.0)
  }

  test("tone encode/decode: bin-exact tone survives quantization") {
    val n2 = 128
    val rate = 8000
    val bin = 10 // tone at an MDCT bin center
    val freq = (bin + 0.5) * rate / (2.0 * n2)
    val src = Array.tabulate(n2 * 8)(i =>
      (0.45 * math.sin(2 * math.Pi * freq * i / rate)).toFloat)
    val pkts = Vorbis.encodePcm(src, rate)
    val d = Vorbis.decode(pkts)
    val out = d.pcm(0)
    assert(out.length >= src.length)
    // energy concentrates at the tone; quantization to 4 levels keeps
    // the waveform within coarse but bounded error in the interior
    val err = (n2 until src.length - n2).map(i =>
      math.abs(out(i) - src(i))).max
    assert(err < 0.2f, s"tone reconstruction error $err")
    val rms = math.sqrt(
      (n2 until src.length).map(i => out(i) * out(i)).sum /
        (src.length - n2))
    assert(rms > 0.2 && rms < 0.45, s"rms $rms")
  }

  test("silence packets decode to exact zeros (class-0 partitions)") {
    val vecs = Seq(Array.fill(128)(0), Array.fill(128)(0),
      Array.tabulate(128)(i => if (i < 8) 2 else 0))
    val d = Vorbis.decode(Vorbis.encodePackets(1, 8000, vecs))
    // first output block laps two all-zero packets: exactly zero
    (0 until 128).foreach(i => assert(d.pcm(0)(i) == 0f))
    assert(d.residueSums(0) == 16)
  }

  test("corrupt streams fail closed: no crash, no OOM") {
    val pkts = Vorbis.encodePackets(1, 8000,
      Seq(Array.tabulate(128)(i => (i % 9) - 4)))
    val ogg = Vorbis.muxOgg(pkts)
    val rnd = new scala.util.Random(11)
    var survived = 0
    (0 until 120).foreach { _ =>
      val mut = ogg.clone()
      val at = rnd.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val d = Vorbis.decodeOgg(mut)
        assert(d.pcm.forall(_.length <= (1 << 20)))
        survived += 1
      } catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
          _: ArithmeticException | _: UnsupportedOperationException |
          _: NoSuchElementException => ()
      }
    }
    assert(survived >= 0) // reaching here = no uncontrolled failure
    // truncations at every boundary
    Seq(0, 1, 26, 27, 58, ogg.length / 2, ogg.length - 1).foreach { cut =>
      try Vorbis.decodeOgg(ogg.take(cut))
      catch { case _: IllegalArgumentException => () }
    }
  }

  private def lapGeom(blockflag: Int, prevFlag: Int, nextFlag: Int,
      n: Int, n0: Int): (Int, Int, Int, Int) = {
    val isLong = blockflag == 1 && n != n0
    (if (isLong && prevFlag == 0) (n - n0) / 4 else 0,
      if (isLong && prevFlag == 0) (n + n0) / 4 else n / 2,
      if (isLong && nextFlag == 0) (3 * n - n0) / 4 else n / 2,
      if (isLong && nextFlag == 0) (3 * n + n0) / 4 else n)
  }

  test("mixed long/short blocks: exact dual-path decode equality") {
    // schedule exercises all four flag cases: S S L(p0,n1) L(p1,n0) S L
    val n0 = 256; val n1 = 1024
    val flags = Seq(0, 0, 1, 1, 0, 1)
    val rnd = new scala.util.Random(5)
    val coded = flags.indices.map(_ =>
      Array.tabulate(128)(i => rnd.nextInt(9) - 4))
    val pkts = Seq(Vorbis.identPacket(1, 8000, 8, 10),
      Vorbis.commentPacket(Nil), Vorbis.setupPacket(1, 1f, mixed = true)) ++
      flags.zipWithIndex.map { case (bf, t) =>
        val pf = if (t == 0) 1 else flags(t - 1)
        val nf = if (t == flags.length - 1) 1 else flags(t + 1)
        Vorbis.audioPacket(1, coded(t), 1f, nModes = 2, blockflag = bf,
          prevFlag = pf, nextFlag = nf)
      }
    val d = Vorbis.decode(pkts)
    assert(d.info.blocksize0 == n0 && d.info.blocksize1 == n1)
    // independent synthesis: same spectra, §4.3.8 lap arithmetic inline
    val out = scala.collection.mutable.ArrayBuffer.empty[Float]
    var prevTail: Array[Float] = null
    flags.zipWithIndex.foreach { case (bf, t) =>
      val n = if (bf == 1) n1 else n0
      val pf = if (t == 0) 1 else flags(t - 1)
      val nf = if (t == flags.length - 1) 1 else flags(t + 1)
      val (ls, le, rs, re) = lapGeom(bf, pf, nf, n, n0)
      val spec = new Array[Float](n / 2)
      (0 until 128).foreach(i => spec(i) = coded(t)(i).toFloat)
      val y = Vorbis.imdct(spec, n)
      Vorbis.applyPiecewiseWindow(y, ls, le, rs, re)
      if (prevTail != null) {
        prevTail.indices.foreach(k => y(ls + k) += prevTail(k))
        (ls until rs).foreach(k => out += y(k))
      }
      prevTail = java.util.Arrays.copyOfRange(y, rs, re)
    }
    val outArr: Array[Float] = out.toArray
    assert(d.pcm(0).length == outArr.length)
    assert(d.pcm(0).sameElements(outArr),
      "bitstream decode must equal direct synthesis bit-for-bit")
    // residue integers still exact through the mixed-mode packets
    assert(d.residueSums(0) == coded.map(_.map(_.toLong).sum).sum)
  }

  test("mixed-blocksize TDAC: analysis + bitstream round-trip on a tone") {
    val n0 = 256; val n1 = 1024
    val flags = Seq(0, 0, 1, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 0)
    val rate = 8000
    val freq = 328.125 // bin-centered for n0; low enough for bin<128 in n1
    // frame offsets per the lap law: o(t+1) = o(t) + rs(t) - ls(t+1)
    val geom = flags.indices.map { t =>
      val bf = flags(t)
      val n = if (bf == 1) n1 else n0
      val pf = if (t == 0) 1 else flags(t - 1)
      val nf = if (t == flags.length - 1) 1 else flags(t + 1)
      (n, lapGeom(bf, pf, nf, n, n0))
    }
    val offsets = geom.indices.scanLeft(0) { (o, t) =>
      if (t == geom.length - 1) o
      else o + geom(t)._2._3 - geom(t + 1)._2._1
    }
    val total = offsets.last + geom.last._1
    val src = Array.tabulate(total)(i =>
      (0.4 * math.sin(2 * math.Pi * freq * i / rate)).toFloat)
    // analysis: piecewise-window each frame, MDCT, quantize to the grid
    val specs = geom.zipWithIndex.map { case ((n, (ls, le, rs, re)), t) =>
      val fr = Array.tabulate(n) { j =>
        val s = offsets(t) + j
        if (s >= 0 && s < total) src(s) else 0f
      }
      Vorbis.applyPiecewiseWindow(fr, ls, le, rs, re)
      Vorbis.mdctRaw(fr, n)
    }
    val peak = specs.flatMap(_.take(128)).map(math.abs).max
    val scale = math.pow(2.0,
      math.ceil(math.log(peak / 4.0) / math.log(2.0))).toFloat
    val pkts = Seq(Vorbis.identPacket(1, rate, 8, 10),
      Vorbis.commentPacket(Nil),
      Vorbis.setupPacket(1, scale, mixed = true)) ++
      specs.zipWithIndex.map { case (sp, t) =>
        val q = Array.tabulate(128)(i =>
          math.max(-4, math.min(4, math.round(sp(i) / scale))))
        val pf = if (t == 0) 1 else flags(t - 1)
        val nf = if (t == flags.length - 1) 1 else flags(t + 1)
        Vorbis.audioPacket(1, q, scale, nModes = 2, blockflag = flags(t),
          prevFlag = pf, nextFlag = nf)
      }
    val d = Vorbis.decode(pkts)
    val out = d.pcm(0)
    // decoded sample i corresponds to src[firstEmit + i]
    val firstEmit = offsets(1) + geom(1)._2._1
    // interior comparison (skip the unprimed head and trailing pad)
    val n = math.min(out.length, total - firstEmit) - n1
    assert(n > 2000, s"too few comparable samples: $n")
    val err = (0 until n).map(i =>
      math.abs(out(i) - src(firstEmit + i))).max
    assert(err < 0.25f, s"mixed-block reconstruction error $err")
    val rms = math.sqrt(
      (0 until n).map(i => out(i) * out(i).toDouble).sum / n)
    assert(rms > 0.2 && rms < 0.4, s"rms $rms")
  }

  test("whisper transcription consumes compressed vorbis audio") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val modelDir = graft.ml.LocalModels.ensureTinyWhisperModel(seed = 42L)
    val src = Array.tabulate(2048)(i =>
      (0.4 * math.sin(2 * math.Pi * 440 * i / 16000)).toFloat)
    val ogg = Vorbis.muxOgg(Vorbis.encodePcm(src, 16000))
    val webm = {
      val pkts = Vorbis.encodePcm(src, 16000)
      Mkv.writeVorbis(pkts.take(3), pkts.drop(3), 16000, 1, 128)
    }
    val df = Seq((1L, ogg), (2L, webm)).toDF("id", "audio")
    val out = graft.ml.LocalModels.speechToText(df, "audio", "t", modelDir,
      maxNewTokens = 3).select("t").collect()
    assert(out.length == 2 && out.forall(_.getString(0) != null))
  }

  test("decodePcm integration: ogg/vorbis and webm/vorbis to PCM-16") {
    val src = Array.tabulate(1024)(i =>
      (0.4 * math.sin(2 * math.Pi * 328.125 * i / 8000)).toFloat)
    val pkts = Vorbis.encodePcm(src, 8000)
    val ogg = Vorbis.muxOgg(pkts)
    val webm = Mkv.writeVorbis(pkts.take(3), pkts.drop(3), 8000, 1, 128)
    val (fa, sa) = Audio.decodePcm(ogg)
    val (fb, sb) = Audio.decodePcm(webm)
    assert(fa.getSampleRate == 8000f && fb.getSampleRate == 8000f)
    assert(sa.length >= 1024 && sa.sameElements(sb))
    // the tone is audible in PCM-16 (quantized but loud)
    assert(sa.map(s => math.abs(s.toInt)).max > 5000)
  }
}

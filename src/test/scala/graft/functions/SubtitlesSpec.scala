package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** SRT/WebVTT cue formatting + tolerant parsing (reference surfaces
  * srt/vtt as transcription response formats — `functions/openai.py:
  * 326-364`; parsing covers the real-world dialect spread).
  */
class SubtitlesSpec extends AnyFunSuite {

  test("clock formatting: SRT comma, VTT dot, hour carry, rounding") {
    assert(Subtitles.srtTime(0.0) == "00:00:00,000")
    assert(Subtitles.srtTime(1.5) == "00:00:01,500")
    assert(Subtitles.srtTime(3661.25) == "01:01:01,250")
    assert(Subtitles.vttTime(59.9995) == "00:01:00.000") // rounds up
    assert(Subtitles.vttTime(7322.007) == "02:02:02.007")
    assert(Subtitles.srtTime(-1.0) == "00:00:00,000")    // clamped
  }

  test("clock parsing: full, short, comma/dot, fractional digits") {
    assert(Subtitles.parseClock("00:00:01,500").contains(1.5))
    assert(Subtitles.parseClock("01:01:01.250").contains(3661.25))
    assert(Subtitles.parseClock("02:05.1").contains(125.1)) // MM:SS.f
    assert(Subtitles.parseClock("123:00:00,000").contains(442800.0))
    assert(Subtitles.parseClock("not a clock").isEmpty)
    assert(Subtitles.parseClock("1:2:3").isEmpty) // no millis: not a cue clock
  }

  test("format → parse round-trips cues exactly (SRT and VTT)") {
    val cues = Seq((0.0, 1.25, "hello world"), (1.5, 3.0, "two\nlines"),
      (3.25, 4.75, "third"))
    for (doc <- Seq(Subtitles.formatSrt(cues), Subtitles.formatVtt(cues))) {
      val back = Subtitles.parse(doc)
      assert(back.length == 3)
      assert(back.map(c => (c.start, c.end, c.text)) == cues)
      assert(back.map(_.idx) == Seq(1, 2, 3))
    }
  }

  test("SRT text: numbered blocks, blank-line separated, trailing newline") {
    val srt = Subtitles.formatSrt(Seq((0.0, 1.0, "a"), (1.0, 2.0, "b")))
    assert(srt ==
      "1\n00:00:00,000 --> 00:00:01,000\na\n\n2\n00:00:01,000 --> 00:00:02,000\nb\n")
    val vtt = Subtitles.formatVtt(Seq((0.0, 1.0, "a")))
    assert(vtt == "WEBVTT\n\n00:00:00.000 --> 00:00:01.000\na\n")
  }

  test("tolerant parse: BOM, CRLF, cue ids, settings, NOTE/STYLE blocks") {
    val vtt = "﻿WEBVTT - with a title\r\n\r\n" +
      "NOTE\r\nthis is a comment\r\n\r\n" +
      "STYLE\r\n::cue { color: red }\r\n\r\n" +
      "intro-cue\r\n00:01.000 --> 00:02.500 align:center line:90%\r\n" +
      "Hi <i>there</i>\r\n\r\n" +
      "17\r\n00:00:03,000 --> 00:00:04,000\r\n- Who?\r\n- Me.\r\n"
    val cues = Subtitles.parse(vtt)
    assert(cues.length == 2)
    assert(cues(0).start == 1.0 && cues(0).end == 2.5)
    assert(cues(0).text == "Hi <i>there</i>")
    assert(cues(1).idx == 17)
    assert(cues(1).text == "- Who?\n- Me.")
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse("WEBVTT\n").isEmpty)
  }

  test("stripMarkup: tags, voice spans, ASS overrides, speaker dashes") {
    assert(Subtitles.stripMarkup("<v Fred>Hi <i>there</i></v>") == "Hi there")
    assert(Subtitles.stripMarkup("{\\an8}top text") == "top text")
    assert(Subtitles.stripMarkup("- Who?\n- Me.") == "Who?\nMe.")
    assert(Subtitles.stripMarkup("<c.yellow>colored</c>") == "colored")
  }

  test("groupWords: breaks on maxChars and on silence gaps") {
    val words = Seq(("alpha", 0.0, 0.4), ("beta", 0.5, 0.9),
      ("gamma", 1.0, 1.4), ("delta", 5.0, 5.4), ("eps", 5.5, 5.9))
    // gap 1.4→5.0 exceeds 2.0s: break regardless of chars
    val byGap = Subtitles.groupWords(words, 100, 2.0)
    assert(byGap.map(_._3) == Seq("alpha beta gamma", "delta eps"))
    assert(byGap.head._1 == 0.0 && byGap.head._2 == 1.4)
    assert(byGap(1)._1 == 5.0 && byGap(1)._2 == 5.9)
    // tight char budget: one word per cue when they don't fit
    val byChars = Subtitles.groupWords(words, 11, 100.0)
    assert(byChars.map(_._3) == Seq("alpha beta", "gamma delta", "eps"))
    assert(Subtitles.groupWords(Seq.empty, 10, 1.0).isEmpty)
  }

  test("idempotent re-parse: parse(format(parse(x))) == parse(x)") {
    val srt = "1\n00:00:00,500 --> 00:00:02,000\nfirst cue\n\n" +
      "2\n00:00:02,250 --> 00:00:03,750\nsecond <b>cue</b>\n"
    val once = Subtitles.parse(srt)
    val again = Subtitles.parse(Subtitles.formatSrt(
      once.map(c => (c.start, c.end, c.text))))
    assert(again.map(c => (c.start, c.end, c.text)) ==
      once.map(c => (c.start, c.end, c.text)))
  }
}

package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** SRT / WebVTT subtitle formats (reference: transcriptions surface
  * `response_format='srt' | 'vtt'` — `functions/openai.py:326-364` — and
  * clips copy subtitle streams, `utils/av.py:289`; caption text is also a
  * first-class training-data signal for video corpora, so both directions
  * are implemented: cue formatting FROM word/segment timestamps and
  * tolerant parsing BACK to typed segments).
  *
  * Everything here is a map-only column op — no shuffle, no state; at
  * 100 TB the cost is the string work itself.
  *
  * Parsing is deliberately tolerant of real-world files: optional cue
  * identifiers, `WEBVTT` headers with trailing metadata, `NOTE`/`STYLE`
  * blocks, cue settings after the end timestamp, `HH:MM:SS,mmm` (SRT) and
  * `HH:MM:SS.mmm` / `MM:SS.mmm` (VTT) clocks, CRLF, and BOMs.
  */
object Subtitles {

  // ------------------------------------------------------------- clocks

  /** `HH:MM:SS,mmm` (SRT). Milliseconds round half-up from seconds. */
  def srtTime(sec: Double): String = clock(sec, ',')

  /** `HH:MM:SS.mmm` (WebVTT). */
  def vttTime(sec: Double): String = clock(sec, '.')

  private def clock(sec: Double, msSep: Char): String = {
    val totalMs = math.max(0L, math.round(sec * 1000.0))
    val h = totalMs / 3600000L
    val m = (totalMs / 60000L) % 60
    val s = (totalMs / 1000L) % 60
    val ms = totalMs % 1000L
    f"$h%02d:$m%02d:$s%02d$msSep$ms%03d"
  }

  /** Seconds out of an `HH:MM:SS,mmm` / `HH:MM:SS.mmm` / `MM:SS.mmm`
    * clock; None if the text is not a subtitle clock.
    */
  def parseClock(text: String): Option[Double] = {
    val t = text.trim
    val m = ClockRe.findFirstMatchIn(t).filter(_.matched.length == t.length)
    m.map { g =>
      val h = Option(g.group(1)).map(_.toLong).getOrElse(0L)
      val ms = g.group(4).padTo(3, '0').take(3).toLong
      (h * 3600L + g.group(2).toLong * 60L + g.group(3).toLong).toDouble +
        ms / 1000.0
    }
  }

  private val ClockRe =
    """(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{1,3})""".r

  // ---------------------------------------------------------- formatting

  /** One parsed/formatted cue. `idx` is the 1-based cue number (SRT) or
    * running position (VTT, where numbers are optional).
    */
  final case class Cue(idx: Int, start: Double, end: Double, text: String)

  def formatSrt(cues: Seq[(Double, Double, String)]): String =
    cues.zipWithIndex.map { case ((s, e, text), i) =>
      s"${i + 1}\n${srtTime(s)} --> ${srtTime(e)}\n$text"
    }.mkString("", "\n\n", "\n")

  def formatVtt(cues: Seq[(Double, Double, String)]): String =
    "WEBVTT\n\n" + cues.map { case (s, e, text) =>
      s"${vttTime(s)} --> ${vttTime(e)}\n$text"
    }.mkString("", "\n\n", "\n")

  /** Group word-level timestamps (the `speechToTextWords` output shape:
    * `struct<word, start, end>`) into subtitle cues: a cue breaks when
    * adding the next word would exceed `maxChars`, or the inter-word gap
    * exceeds `maxGapSec`. The standard caption-segmentation heuristic —
    * deterministic, single-pass.
    */
  def groupWords(words: Seq[(String, Double, Double)], maxChars: Int,
      maxGapSec: Double): Seq[(Double, Double, String)] = {
    require(maxChars > 0, s"bad maxChars $maxChars")
    val out = Seq.newBuilder[(Double, Double, String)]
    var text = new StringBuilder
    var start = 0.0
    var end = 0.0
    def flush(): Unit = {
      if (text.nonEmpty) out += ((start, end, text.toString))
      text = new StringBuilder
    }
    words.foreach { case (w, s, e) =>
      val breakHere = text.nonEmpty &&
        (text.length + 1 + w.length > maxChars || s - end > maxGapSec)
      if (breakHere) flush()
      if (text.isEmpty) start = s else text += ' '
      text ++= w
      end = e
    }
    flush()
    out.result()
  }

  // ------------------------------------------------------------- parsing

  /** Cues out of SRT or WebVTT text (auto-detected — the grammar is
    * block-based either way). Cue text keeps internal newlines; markup
    * tags are preserved (see `stripMarkup`).
    */
  def parse(text: String): Seq[Cue] = {
    if (text == null) return Seq.empty
    val body = text.stripPrefix("﻿") // UTF-8 BOM
      .replace("\r\n", "\n").replace('\r', '\n')
    val blocks = body.split("\n{2,}").iterator.map(_.trim).filter(_.nonEmpty)
    val out = Seq.newBuilder[Cue]
    var n = 0
    blocks.foreach { block =>
      val lines = block.split('\n')
      val tsLine = lines.indexWhere(_.contains("-->"))
      val isMeta = lines.head.startsWith("WEBVTT") ||
        lines.head.startsWith("NOTE") || lines.head.startsWith("STYLE") ||
        lines.head.startsWith("REGION")
      if (tsLine >= 0 && !isMeta) {
        val parts = lines(tsLine).split("-->")
        if (parts.length == 2) {
          // cue settings (VTT: "align:center line:90%") trail the end clock
          val endTok = parts(1).trim.split("\\s+").headOption.getOrElse("")
          (parseClock(parts(0)), parseClock(endTok)) match {
            case (Some(s), Some(e)) =>
              n += 1
              // an SRT cue number (or VTT identifier) precedes the clock
              val idx = if (tsLine > 0) lines(tsLine - 1).trim.toIntOption
                .getOrElse(n) else n
              out += Cue(idx, s, e, lines.drop(tsLine + 1).mkString("\n"))
            case _ => ()
          }
        }
      }
    }
    out.result()
  }

  /** Caption text with presentation markup removed: `<i>`, `<b>`,
    * `<c.classname>`, `<v Speaker>` voice spans, `{\an8}` ASS-style
    * overrides, and leading speaker dashes.
    */
  def stripMarkup(text: String): String =
    text.replaceAll("<[^>]*>", "")
      .replaceAll("\\{\\\\[^}]*\\}", "")
      .linesIterator.map(_.trim.stripPrefix("- ").stripPrefix("-- "))
      .mkString("\n").trim

  // ------------------------------------------------------------ UDF API

  /** `array<struct<start double, end double, text string>>` → SRT doc. */
  val toSrt: UserDefinedFunction = udf { (cues: Seq[Row]) =>
    if (cues == null) null
    else formatSrt(cues.map(r =>
      (r.getDouble(0), r.getDouble(1), r.getString(2))))
  }

  /** `array<struct<start double, end double, text string>>` → VTT doc. */
  val toVtt: UserDefinedFunction = udf { (cues: Seq[Row]) =>
    if (cues == null) null
    else formatVtt(cues.map(r =>
      (r.getDouble(0), r.getDouble(1), r.getString(2))))
  }

  /** Word timestamps (`speechToTextWords` shape) → cue structs. */
  val wordsToCues: UserDefinedFunction =
    udf { (words: Seq[Row], maxChars: Int, maxGapSec: Double) =>
      if (words == null) null
      else groupWords(words.map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2))),
        maxChars, maxGapSec).map { case (s, e, t) => (s, e, t) }
    }

  /** SRT/VTT text → `array<struct<idx, start, end, text>>`. */
  val parseCues: UserDefinedFunction = udf { (text: String) => parse(text) }

  /** Markup-free caption text (for the curation/quality pipeline). */
  val cleanText: UserDefinedFunction =
    udf { (text: String) => if (text == null) null else stripMarkup(text) }
}

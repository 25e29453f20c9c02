package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Vorbis-comment tag structure (the Xiph tag format shared by FLAC's
  * VORBIS_COMMENT metadata block, Ogg Vorbis's comment header and Ogg
  * Opus's OpusTags packet — the tag dict pyav/ffprobe surface for these
  * families, reference `functions/util.py:40-110` format metadata):
  * LE u32 vendor length + vendor string, LE u32 comment count, then per
  * comment LE u32 length + UTF-8 `KEY=value`. Keys are case-insensitive;
  * the standard names map onto the shared friendly names the MP4/MP3/
  * Matroska tag surfaces use.
  */
object VorbisComments {

  private val Friendly = Map(
    "TITLE" -> "title", "ARTIST" -> "artist", "ALBUM" -> "album",
    "DATE" -> "date", "GENRE" -> "genre", "COMMENT" -> "comment",
    "DESCRIPTION" -> "comment", "ENCODER" -> "encoder",
    "TRACKNUMBER" -> "track")
  private val ByFriendly = Map(
    "title" -> "TITLE", "artist" -> "ARTIST", "album" -> "ALBUM",
    "date" -> "DATE", "genre" -> "GENRE", "comment" -> "COMMENT",
    "encoder" -> "ENCODER", "track" -> "TRACKNUMBER")

  /** Parse a comment struct at [from, until); corrupt lengths fail fast
    * (bounded by the remaining bytes, never a bad allocation).
    */
  def parse(bytes: Array[Byte], from: Int, until: Int): Seq[(String, String)] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = from
    def u32(): Int = {
      require(pos + 4 <= until, "truncated vorbis comment")
      val v = b.getInt(pos); pos += 4
      require(v >= 0 && v <= until - pos, s"corrupt vorbis comment length $v")
      v
    }
    // NOT `pos += u32()`: the RHS captures pos BEFORE u32() advances it
    val vendorLen = u32()
    pos += vendorLen // skip vendor string
    val n = {
      require(pos + 4 <= until, "truncated vorbis comment")
      val v = b.getInt(pos); pos += 4
      // each comment needs at least its 4-byte length field
      require(v >= 0 && v.toLong * 4 <= until - pos,
        s"corrupt vorbis comment count $v")
      v
    }
    (0 until n).map { _ =>
      val len = u32()
      val s = new String(bytes, pos, len,
        java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      val eq = s.indexOf('=')
      if (eq < 0) (s, "")
      else {
        val key = s.take(eq).toUpperCase
        (Friendly.getOrElse(key, key), s.drop(eq + 1))
      }
    }.filter(_._1.nonEmpty)
  }

  /** Serialize friendly-named tags as a comment struct (vendor "graft"). */
  def write(tags: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      val a = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v).array()
      out.write(a, 0, 4)
    }
    val vendor = "graft".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    u32(vendor.length); out.write(vendor, 0, vendor.length)
    u32(tags.length)
    tags.foreach { case (name, value) =>
      val s = (ByFriendly.getOrElse(name, name) + "=" + value)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      u32(s.length); out.write(s, 0, s.length)
    }
    out.toByteArray
  }
}

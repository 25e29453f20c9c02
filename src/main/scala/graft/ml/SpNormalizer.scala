package graft.ml

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** The `normalizer` stage of the HF `tokenizer.json` pipeline for
  * SentencePiece-family checkpoints — the step the reference gets through
  * AutoTokenizer (`/root/reference/pixeltable/functions/huggingface.py:
  * 1566-1638`) and that [[SentencePiece]] applies to each plain text
  * segment BEFORE metaspace chunking (added/special tokens are split out
  * on the raw text first, matching HF's pipeline order for
  * `special=true` tokens).
  *
  * Supported nodes: `Sequence`, `NFC`/`NFD`/`NFKC`/`NFKD` (via
  * `java.text.Normalizer`), `Lowercase`, `Prepend`, `Strip`, `Replace`
  * (literal `String` or `Regex` pattern), `Nmt` (control-char removal /
  * space mapping), and `Precompiled` — the sentencepiece
  * `precompiled_charsmap` parsed EXACTLY: a Darts double-array trie over
  * input byte prefixes mapping to replacement strings (see
  * [[PrecompiledCharsMap]]). Unknown node types fail loudly rather than
  * silently skipping a transformation.
  */
sealed trait SpNormalizer extends Serializable {
  def apply(s: String): String
}

object SpNormalizer {

  case object Identity extends SpNormalizer {
    def apply(s: String): String = s
  }

  final case class Chain(steps: Seq[SpNormalizer]) extends SpNormalizer {
    def apply(s: String): String = steps.foldLeft(s)((t, n) => n(t))
  }

  final case class Nfx(form: String) extends SpNormalizer {
    @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)
    def apply(s: String): String = java.text.Normalizer.normalize(s, f)
  }

  case object Lowercase extends SpNormalizer {
    def apply(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
  }

  final case class Prepend(content: String) extends SpNormalizer {
    def apply(s: String): String = if (s.isEmpty) s else content + s
  }

  final case class Strip(left: Boolean, right: Boolean) extends SpNormalizer {
    def apply(s: String): String = {
      var a = 0
      var b = s.length
      if (left) while (a < b && Character.isWhitespace(s.charAt(a))) a += 1
      if (right) while (b > a && Character.isWhitespace(s.charAt(b - 1))) b -= 1
      s.substring(a, b)
    }
  }

  /** `pattern` is a literal when `isRegex` is false (HF `{"String": …}`)
    * and a regex otherwise (HF `{"Regex": …}`).
    */
  final case class Replace(pattern: String, isRegex: Boolean, content: String)
      extends SpNormalizer {
    @transient private lazy val re =
      if (isRegex) java.util.regex.Pattern.compile(pattern) else null
    def apply(s: String): String =
      if (isRegex) re.matcher(s).replaceAll(
        java.util.regex.Matcher.quoteReplacement(content))
      else s.replace(pattern, content)
  }

  /** sentencepiece's `remove_extra_whitespaces` (NormalizerSpec field 4):
    * trim leading/trailing spaces and collapse internal runs to one —
    * used by the `.model` protobuf load path ([[SentencePiece.fromModelFile]]).
    */
  case object RemoveExtraWhitespaces extends SpNormalizer {
    def apply(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      var pendingSpace = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ') { if (sb.nonEmpty) pendingSpace = true }
        else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(c) }
        i += 1
      }
      sb.toString
    }
  }

  /** HF `Nmt`: drop C0/C1-style control characters, map the remaining
    * whitespace-ish code points to a plain space.
    */
  case object Nmt extends SpNormalizer {
    def apply(s: String): String = {
      val sb = new StringBuilder(s.length)
      s.codePoints().forEach { cp =>
        cp match {
          case c if (c >= 0x0001 && c <= 0x0008) || c == 0x000B ||
            (c >= 0x000E && c <= 0x001F) || c == 0x007F || c == 0x008F ||
            c == 0x009F => () // removed
          case 0x0009 | 0x000A | 0x000D | 0x1680 | 0x2028 | 0x2029 |
            0x2581 | 0xFEFF | 0xFFFD => sb.append(' ')
          case c if c >= 0x200B && c <= 0x200F => sb.append(' ')
          case c => sb.appendAll(Character.toChars(c))
        }
        ()
      }
      sb.toString
    }
  }

  /** Exact `Precompiled` normalizer: the base64 `precompiled_charsmap`. */
  final case class Precompiled(charsmapB64: String) extends SpNormalizer {
    @transient private lazy val map = new PrecompiledCharsMap(
      java.util.Base64.getDecoder.decode(charsmapB64))
    def apply(s: String): String = map.normalize(s)
  }

  /** Parse a `normalizer` JSON node (tokenizer.json layout). */
  def parse(node: JsonNode): SpNormalizer = {
    if (node == null || node.isNull) return Identity
    val tpe = Option(node.get("type")).map(_.asText()).getOrElse(
      throw new IllegalArgumentException("normalizer node missing 'type'"))
    tpe match {
      case "Sequence" =>
        Chain(Option(node.get("normalizers")).toSeq
          .flatMap(_.elements().asScala).map(parse))
      case "NFC" | "NFD" | "NFKC" | "NFKD" => Nfx(tpe)
      case "Lowercase" => Lowercase
      case "Prepend" => Prepend(node.get("prepend").asText())
      case "Strip" => Strip(
        Option(node.get("strip_left")).forall(_.asBoolean()),
        Option(node.get("strip_right")).forall(_.asBoolean()))
      case "Replace" =>
        val p = node.get("pattern")
        val (pat, isRe) =
          if (p.has("Regex")) (p.get("Regex").asText(), true)
          else if (p.has("String")) (p.get("String").asText(), false)
          else (p.asText(), false)
        Replace(pat, isRe, node.get("content").asText())
      case "Nmt" => Nmt
      case "Precompiled" =>
        Precompiled(node.get("precompiled_charsmap").asText())
      case other => throw new IllegalArgumentException(
        s"unsupported tokenizer.json normalizer type: $other " +
          "(silently skipping it would corrupt tokenization)")
    }
  }
}

/** sentencepiece `precompiled_charsmap` blob, parsed exactly (public
  * format, `normalizer.cc` DecodePrecompiledCharsMap + the darts-clone
  * double-array layout):
  *
  *   uint32-LE trie_blob_size | trie units (uint32-LE each) | string pool
  *
  * Each trie unit packs: `label = u & (0x80000000 | 0xFF)`,
  * `has_leaf = (u >> 8) & 1`, `offset = (u >> 10) << ((u & 0x200) >> 6)`,
  * and a leaf's `value = u & 0x7FFFFFFF` — the byte offset of the
  * NUL-terminated replacement in the pool. Keys are UTF-8 byte prefixes
  * of the input; normalization walks the text taking the LONGEST trie
  * match at each position (replacing it with the pool string) and copies
  * one whole UTF-8 character verbatim when nothing matches — the
  * sentencepiece `Normalizer::NormalizePrefix` algorithm.
  */
final class PrecompiledCharsMap(blob: Array[Byte]) extends Serializable {
  require(blob.length >= 4, "precompiled_charsmap: truncated header")
  private val trieSize: Int =
    (blob(0) & 0xff) | ((blob(1) & 0xff) << 8) |
      ((blob(2) & 0xff) << 16) | ((blob(3) & 0xff) << 24)
  require(trieSize >= 0 && trieSize % 4 == 0 && 4 + trieSize <= blob.length,
    s"precompiled_charsmap: bad trie size $trieSize for ${blob.length} bytes")
  private val units: Array[Int] = {
    val n = trieSize / 4
    val arr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = 4 + i * 4
      arr(i) = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8) |
        ((blob(o + 2) & 0xff) << 16) | ((blob(o + 3) & 0xff) << 24)
      i += 1
    }
    arr
  }
  private val pool: Array[Byte] =
    java.util.Arrays.copyOfRange(blob, 4 + trieSize, blob.length)

  @inline private def label(u: Int): Int = u & (0x80000000 | 0xff)
  @inline private def hasLeaf(u: Int): Boolean = ((u >>> 8) & 1) == 1
  @inline private def value(u: Int): Int = u & 0x7fffffff
  @inline private def offset(u: Int): Int = (u >>> 10) << ((u & 0x200) >>> 6)

  /** longest prefix of `bytes[from..]` present in the trie →
    * (pool value, matched byte count); (-1, 0) when none
    */
  def longestMatch(bytes: Array[Byte], from: Int): (Int, Int) = {
    if (units.isEmpty) return (-1, 0)
    var bestV = -1
    var bestLen = 0
    var nodePos = 0
    var unit = units(0)
    nodePos ^= offset(unit)
    var i = from
    var done = false
    while (i < bytes.length && !done) {
      val c = bytes(i) & 0xff
      if (c == 0) done = true
      else {
        nodePos ^= c
        if (nodePos < 0 || nodePos >= units.length) done = true
        else {
          unit = units(nodePos)
          if (label(unit) != c) done = true
          else {
            nodePos ^= offset(unit)
            if (hasLeaf(unit) && nodePos >= 0 && nodePos < units.length) {
              bestV = value(units(nodePos))
              bestLen = i - from + 1
            }
            i += 1
          }
        }
      }
    }
    (bestV, bestLen)
  }

  /** NUL-terminated pool string at byte offset `v` */
  private def poolString(v: Int): String = {
    var end = v
    while (end < pool.length && pool(end) != 0) end += 1
    new String(pool, v, end - v, "UTF-8")
  }

  def normalize(s: String): String = {
    if (s.isEmpty || units.isEmpty) return s
    val bytes = s.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val (v, len) = longestMatch(bytes, i)
      if (len > 0) {
        val r = poolString(v)
        out.write(r.getBytes("UTF-8"))
        i += len
      } else {
        // copy one whole UTF-8 character verbatim
        val b = bytes(i) & 0xff
        val charLen =
          if (b < 0x80) 1
          else if ((b & 0xe0) == 0xc0) 2
          else if ((b & 0xf0) == 0xe0) 3
          else if ((b & 0xf8) == 0xf0) 4
          else 1
        val end = math.min(i + charLen, bytes.length)
        out.write(bytes, i, end - i)
        i = end
      }
    }
    new String(out.toByteArray, "UTF-8")
  }
}

package graft.ml

/** Minimal reader (and fixture writer) for the public
  * `sentencepiece_model.proto` `ModelProto` wire format — the
  * `source.spm` / `sentencepiece.bpe.model` files MarianMT/T5-style
  * checkpoint dirs ship, which the reference loads for free through
  * AutoTokenizer (`/root/reference/pixeltable/functions/huggingface.py:
  * 1566-1638`). Only the fields the tokenizer needs are decoded:
  *
  *   ModelProto:      pieces=1 (repeated msg), trainer_spec=2,
  *                    normalizer_spec=3
  *   SentencePiece:   piece=1 (string), score=2 (float), type=3 (enum:
  *                    NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4
  *                    UNUSED=5 BYTE=6)
  *   TrainerSpec:     model_type=3 (UNIGRAM=1 BPE=2), byte_fallback=35,
  *                    unk_id=40, bos_id=41, eos_id=42, pad_id=43
  *   NormalizerSpec:  name=1, precompiled_charsmap=2 (bytes),
  *                    add_dummy_prefix=3, remove_extra_whitespaces=4,
  *                    escape_whitespaces=5
  *
  * Unknown fields are skipped by wire type, so richer real-world files
  * parse fine.
  */
object SpModelProto {

  final case class Piece(piece: String, score: Double, tpe: Int)

  final case class Model(
      pieces: Seq[Piece],
      modelType: Int, // 1=unigram, 2=bpe
      byteFallback: Boolean,
      unkId: Int,
      bosId: Int,
      eosId: Int,
      padId: Int,
      normalizerName: String,
      precompiledCharsmap: Array[Byte],
      addDummyPrefix: Boolean,
      removeExtraWhitespaces: Boolean,
      escapeWhitespaces: Boolean)

  val TypeNormal = 1
  val TypeUnknown = 2
  val TypeControl = 3
  val TypeUserDefined = 4
  val TypeUnused = 5
  val TypeByte = 6

  // ---------- wire-level reader ----------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        require(pos < end && shift < 64, "malformed varint")
        b = buf(pos) & 0xff
        pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def bytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, s"truncated length-delimited field ($n)")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    def sub(n: Int): Reader = {
      require(n >= 0 && pos + n <= end, "truncated submessage")
      val r = new Reader(buf, pos, pos + n)
      pos += n
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => val n = varint().toInt; require(n >= 0 && pos + n <= end,
        "truncated bytes"); pos += n
      case 5 => fixed32(); ()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  def parse(bytes: Array[Byte]): Model = {
    val pieces = Seq.newBuilder[Piece]
    var modelType = 1
    var byteFallback = false
    var unkId = 0
    var bosId = 1
    var eosId = 2
    var padId = -1
    var normName = ""
    var charsmap = Array.emptyByteArray
    var dummyPrefix = true
    var removeExtraWs = true
    var escapeWs = true

    def readPiece(r: Reader): Piece = {
      var piece = ""
      var score = 0.0
      var tpe = TypeNormal
      while (r.hasMore) {
        val tag = r.varint()
        val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
        (f, w) match {
          case (1, 2) => piece = new String(r.bytes(r.varint().toInt), "UTF-8")
          case (2, 5) => score = java.lang.Float.intBitsToFloat(r.fixed32()).toDouble
          case (3, 0) => tpe = r.varint().toInt
          case _ => r.skip(w)
        }
      }
      Piece(piece, score, tpe)
    }

    def readTrainer(r: Reader): Unit = while (r.hasMore) {
      val tag = r.varint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      (f, w) match {
        case (3, 0)  => modelType = r.varint().toInt
        case (35, 0) => byteFallback = r.varint() != 0
        case (40, 0) => unkId = r.varint().toInt
        case (41, 0) => bosId = r.varint().toInt
        case (42, 0) => eosId = r.varint().toInt
        case (43, 0) => padId = r.varint().toInt
        case _ => r.skip(w)
      }
    }

    def readNormalizer(r: Reader): Unit = while (r.hasMore) {
      val tag = r.varint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      (f, w) match {
        case (1, 2) => normName = new String(r.bytes(r.varint().toInt), "UTF-8")
        case (2, 2) => charsmap = r.bytes(r.varint().toInt)
        case (3, 0) => dummyPrefix = r.varint() != 0
        case (4, 0) => removeExtraWs = r.varint() != 0
        case (5, 0) => escapeWs = r.varint() != 0
        case _ => r.skip(w)
      }
    }

    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      val tag = r.varint()
      val (f, w) = ((tag >>> 3).toInt, (tag & 7).toInt)
      (f, w) match {
        case (1, 2) => pieces += readPiece(r.sub(r.varint().toInt))
        case (2, 2) => readTrainer(r.sub(r.varint().toInt))
        case (3, 2) => readNormalizer(r.sub(r.varint().toInt))
        case _ => r.skip(w)
      }
    }
    Model(pieces.result(), modelType, byteFallback, unkId, bosId, eosId,
      padId, normName, charsmap, dummyPrefix, removeExtraWs, escapeWs)
  }

  // ---------- fixture writer (tiny checkpoints / tests) ----------

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      do {
        val b = (v & 0x7f).toInt
        v >>>= 7
        out.write(if (v != 0) b | 0x80 else b)
      } while (v != 0)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out.write(b)
    }
    def float32(field: Int, f: Float): Unit = {
      tag(field, 5)
      val i = java.lang.Float.floatToIntBits(f)
      out.write(i & 0xff); out.write((i >>> 8) & 0xff)
      out.write((i >>> 16) & 0xff); out.write((i >>> 24) & 0xff)
    }
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  def write(
      pieces: Seq[Piece],
      modelType: Int,
      byteFallback: Boolean,
      unkId: Int,
      normalizerName: String = "identity",
      precompiledCharsmap: Array[Byte] = Array.emptyByteArray,
      addDummyPrefix: Boolean = true,
      removeExtraWhitespaces: Boolean = false): Array[Byte] = {
    val w = new Writer
    pieces.foreach { p =>
      val pw = new Writer
      pw.str(1, p.piece)
      pw.float32(2, p.score.toFloat)
      pw.int(3, p.tpe.toLong)
      w.bytes(1, pw.toBytes)
    }
    val tw = new Writer
    tw.int(3, modelType.toLong)
    tw.int(35, if (byteFallback) 1L else 0L)
    tw.int(40, unkId.toLong)
    w.bytes(2, tw.toBytes)
    val nw = new Writer
    nw.str(1, normalizerName)
    if (precompiledCharsmap.nonEmpty) nw.bytes(2, precompiledCharsmap)
    nw.int(3, if (addDummyPrefix) 1L else 0L)
    nw.int(4, if (removeExtraWhitespaces) 1L else 0L)
    nw.int(5, 1L)
    w.bytes(3, nw.toBytes)
    w.toBytes
  }
}

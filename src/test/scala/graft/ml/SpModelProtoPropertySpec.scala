package graft.ml

import org.scalacheck.{Gen, Prop, Properties}

/** Robustness pins for the protobuf `.model` reader on ARBITRARY bytes:
  * the parser must terminate with either a Model or an exception — never
  * hang, never allocate absurdly (length-delimited fields are bounds-
  * checked before copying) — and on WELL-FORMED models written by the
  * fixture writer the round-trip is exact for every field we read.
  */
object SpModelProtoPropertySpec extends Properties("spmodelproto") {

  property("random bytes: parse terminates (Model or exception), never hangs") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))) { bytes =>
      try { SpModelProto.parse(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: RuntimeException => true
      }
    }

  property("truncated well-formed blobs: terminate, never hang") = {
    val pieces = (0 until 40).map(i =>
      SpModelProto.Piece(s"p$i", -i.toDouble / 7, SpModelProto.TypeNormal))
    val full = SpModelProto.write(pieces, 1, byteFallback = true, unkId = 3)
    Prop.forAll(Gen.chooseNum(0, full.length - 1)) { cut =>
      try { SpModelProto.parse(full.take(cut)); true }
      catch {
        case _: IllegalArgumentException => true
        case _: RuntimeException => true
      }
    }
  }

  property("writer→parser round-trip exact on arbitrary piece tables") = {
    val genPiece = for {
      s <- Gen.alphaNumStr.map(_.take(12))
      score <- Gen.chooseNum(-50.0f, 0.0f)
      tpe <- Gen.oneOf(1, 2, 3, 4, 6)
    } yield SpModelProto.Piece(s, score.toDouble, tpe)
    Prop.forAll(Gen.nonEmptyListOf(genPiece), Gen.oneOf(1, 2),
      Gen.oneOf(true, false), Gen.chooseNum(0, 5)) { (ps, mt, bf, unk) =>
      val m = SpModelProto.parse(SpModelProto.write(ps, mt, bf, unk))
      m.pieces.map(_.piece) == ps.map(_.piece) &&
        m.pieces.map(_.tpe) == ps.map(_.tpe) &&
        // scores pass through float32 (the proto field width)
        m.pieces.map(_.score) == ps.map(p => p.score.toFloat.toDouble) &&
        m.modelType == mt && m.byteFallback == bf && m.unkId == unk
    }
  }
}

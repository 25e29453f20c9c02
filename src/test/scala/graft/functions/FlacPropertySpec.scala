package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the FLAC codec on ARBITRARY signals, complementing
  * FlacSpec's hand-built cases: losslessness means encode∘decode must be
  * the identity on ANY 16-bit signal — extreme values, constants, random
  * noise, any length, mono or stereo, any block size, any explicit LPC —
  * and the stream MD5 must always verify.
  */
object FlacPropertySpec extends Properties("flac") {

  private val shortArray: Gen[Array[Short]] = for {
    n <- Gen.chooseNum(1, 5000)
    mode <- Gen.oneOf("noise", "edges", "smooth")
    seed <- Gen.chooseNum(1L, Long.MaxValue)
  } yield {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    mode match {
      case "noise" => Array.fill(n)((next() >>> 48).toShort)
      case "edges" => Array.fill(n)(Seq(Short.MinValue, Short.MaxValue,
        0.toShort, (-1).toShort)((next() >>> 60).toInt & 3))
      case _ =>
        var acc = 0
        Array.fill(n) {
          acc = math.max(-32768, math.min(32767, acc + ((next() >>> 56) - 128).toInt))
          acc.toShort
        }
    }
  }

  property("mono roundtrip is the identity, md5 verifies") =
    Prop.forAll(shortArray, Gen.oneOf(256, 1024, 4096)) { (s, bs) =>
      val dec = Flac.decode(Flac.encode(s, 1, 16000, blockSize = bs))
      dec.md5Ok && dec.samples.toSeq == s.map(_.toInt).toSeq
    }

  property("stereo roundtrip is the identity") =
    Prop.forAll(shortArray) { s0 =>
      val s = if (s0.length % 2 == 1) s0.dropRight(1) else s0
      s.isEmpty || {
        val dec = Flac.decode(Flac.encode(s, 2, 44100))
        dec.md5Ok && dec.samples.toSeq == s.map(_.toInt).toSeq
      }
    }

  property("explicit LPC of any small order stays exact") =
    Prop.forAll(shortArray, Gen.chooseNum(1, 6)) { (s, order) =>
      s.length <= order || {
        val coefs = Array.tabulate(order)(j => if (j == 0) 2 else -1)
        val dec = Flac.decode(Flac.encode(s, 1, 16000,
          lpc = Some(Flac.LpcSpec(coefs, 1, 8))))
        dec.samples.toSeq == s.map(_.toInt).toSeq
      }
    }
}

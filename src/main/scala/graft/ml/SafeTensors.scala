package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Reader/writer for the safetensors checkpoint format — the HF ecosystem's
  * standard weight file that the reference's local models load
  * (`/root/reference/pixeltable/functions/huggingface.py:32-76` via
  * sentence-transformers/torch). Format (public spec,
  * github.com/huggingface/safetensors): 8-byte little-endian u64 header
  * length, then a JSON header mapping tensor name → {dtype, shape,
  * data_offsets:[begin,end)} with offsets relative to the end of the
  * header, then the raw little-endian tensor buffer.
  *
  * All dtypes are widened to F32 on load: the forward pass is float math,
  * and F16/BF16 → F32 is exact.
  */
object SafeTensors {

  private val MaxHeaderBytes = 100L << 20 // spec guard: reject absurd headers

  def read(path: String): Map[String, Tensor] = readWithMetadata(path)._1

  def readWithMetadata(path: String): (Map[String, Tensor], Map[String, String]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 8, s"safetensors too short: ${bytes.length} bytes")
    val headerLen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    require(headerLen > 0 && headerLen <= MaxHeaderBytes && 8 + headerLen <= bytes.length,
      s"bad safetensors header length $headerLen (file ${bytes.length})")
    val header = new ObjectMapper().readTree(bytes, 8, headerLen.toInt)
    val dataStart = 8 + headerLen.toInt
    val dataLen = bytes.length - dataStart
    var meta = Map.empty[String, String]
    val tensors = Map.newBuilder[String, Tensor]
    header.properties().asScala.foreach { e =>
      val name = e.getKey
      if (name == "__metadata__") {
        meta = e.getValue.properties().asScala.map(m => m.getKey -> m.getValue.asText()).toMap
      } else {
        val info = e.getValue
        val dtype = info.get("dtype").asText()
        val shape = info.get("shape").elements().asScala.map(_.asInt()).toArray
        val offs = info.get("data_offsets")
        val begin = offs.get(0).asLong(); val end = offs.get(1).asLong()
        require(begin >= 0 && end >= begin && end <= dataLen,
          s"tensor $name offsets [$begin,$end) outside data buffer ($dataLen)")
        val buf = ByteBuffer.wrap(bytes, dataStart + begin.toInt, (end - begin).toInt)
          .order(ByteOrder.LITTLE_ENDIAN)
        tensors += name -> Tensor(shape, decode(name, dtype, shape, buf))
      }
    }
    (tensors.result(), meta)
  }

  private def decode(name: String, dtype: String, shape: Array[Int],
      buf: ByteBuffer): Array[Float] = {
    val n = shape.foldLeft(1L)(_ * _.toLong)
    require(n <= Int.MaxValue, s"tensor $name too large: $n elements")
    val out = new Array[Float](n.toInt)
    val width: Long = dtype match {
      case "F32" | "I32" => 4L
      case "F64" | "I64" => 8L
      case "F16" | "BF16" => 2L
      case "U8" | "I8" | "BOOL" => 1L
      case other => throw new IllegalArgumentException(
        s"tensor $name: unsupported safetensors dtype $other")
    }
    require(buf.remaining().toLong == n * width,
      s"tensor $name: ${buf.remaining()} bytes for $n $dtype elements")
    var i = 0
    dtype match {
      case "F32" => while (i < out.length) { out(i) = buf.getFloat; i += 1 }
      case "F64" => while (i < out.length) { out(i) = buf.getDouble.toFloat; i += 1 }
      case "I64" => while (i < out.length) { out(i) = buf.getLong.toFloat; i += 1 }
      case "I32" => while (i < out.length) { out(i) = buf.getInt.toFloat; i += 1 }
      case "F16" => while (i < out.length) { out(i) = halfToFloat(buf.getShort); i += 1 }
      case "BF16" =>
        // bf16 is the top 16 bits of an IEEE f32 — widen by zero-filling
        while (i < out.length) {
          out(i) = java.lang.Float.intBitsToFloat((buf.getShort & 0xffff) << 16); i += 1
        }
      case "U8" => while (i < out.length) { out(i) = (buf.get() & 0xff).toFloat; i += 1 }
      case "I8" => while (i < out.length) { out(i) = buf.get().toFloat; i += 1 }
      case "BOOL" => while (i < out.length) { out(i) = if (buf.get() != 0) 1f else 0f; i += 1 }
    }
    out
  }

  /** IEEE 754 half → float (handles subnormals, inf, nan). */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits >>> 15) & 1
    val exp = (bits >>> 10) & 0x1f
    val frac = bits & 0x3ff
    val f32 =
      if (exp == 0x1f) (sign << 31) | 0x7f800000 | (frac << 13) // inf / nan
      else if (exp == 0) {
        if (frac == 0) sign << 31 // signed zero
        else { // subnormal: normalize
          var e = -1; var f = frac
          while ((f & 0x400) == 0) { f <<= 1; e += 1 }
          (sign << 31) | ((127 - 15 - e) << 23) | ((f & 0x3ff) << 13)
        }
      } else (sign << 31) | ((exp - 15 + 127) << 23) | (frac << 13)
    java.lang.Float.intBitsToFloat(f32)
  }

  /** Write tensors as F32 in insertion order (fixture/export path). */
  def write(path: String, tensors: Seq[(String, Tensor)],
      metadata: Map[String, String] = Map.empty): Unit = {
    val mapper = new ObjectMapper()
    val header = mapper.createObjectNode()
    if (metadata.nonEmpty) {
      val m = header.putObject("__metadata__")
      metadata.foreach { case (k, v) => m.put(k, v) }
    }
    var off = 0L
    tensors.foreach { case (name, t) =>
      val node = header.putObject(name)
      node.put("dtype", "F32")
      val sh = node.putArray("shape")
      t.shape.foreach(sh.add)
      val end = off + t.data.length.toLong * 4
      node.putArray("data_offsets").add(off).add(end)
      off = end
    }
    val headerBytes = mapper.writeValueAsBytes(header)
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(headerBytes.length.toLong)
      out.write(lenBuf.array())
      out.write(headerBytes)
      val dataBuf = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
      tensors.foreach { case (_, t) =>
        var i = 0
        while (i < t.data.length) {
          dataBuf.clear()
          val chunk = math.min(1024, t.data.length - i)
          var j = 0
          while (j < chunk) { dataBuf.putFloat(t.data(i + j)); j += 1 }
          out.write(dataBuf.array(), 0, chunk * 4)
          i += chunk
        }
      }
    } finally out.close()
  }
}

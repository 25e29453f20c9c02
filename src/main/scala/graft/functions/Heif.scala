package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** AVIF/HEIF image-container metadata — the ISO-BMFF `meta` tree
  * (ISO/IEC 23008-12): `ftyp(avif|heic|mif1) meta(hdlr pitm iinf iprp
  * (ipco(ispe …) ipma) iloc) mdat`. The reference surfaces whatever the
  * PIL/pyav demuxer reports for these files (`functions/util.py:40-110`);
  * here the box reader that already walks MP4 walks `meta/iprp/ipco/ispe`
  * for geometry, `iinf/infe` for item types, and `pitm` for the primary
  * item — header-only (never touches `mdat`), so corpus metadata scans
  * stay map-only page reads. Pixel DECODE (AV1/HEVC intra frames) is the
  * same COVERAGE adjudication as the video codecs.
  */
object Heif {

  private val Brands = Set("avif", "avis", "heic", "heix", "hevc",
    "mif1", "msf1")

  /** `true` when the major or a compatible ftyp brand is an image
    * container brand (checked BEFORE `Mp4.isMp4` in sniffers — these
    * files carry no moov).
    */
  def isHeif(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 16) return false
    if (new String(bytes, 4, 4, "US-ASCII") != "ftyp") return false
    val size = ByteBuffer.wrap(bytes).getInt(0)
    if (size < 16 || size > bytes.length) return false
    val major = new String(bytes, 8, 4, "US-ASCII")
    if (Brands(major)) return true
    // compatible brands from offset 16 in 4-byte steps
    (16 until size by 4).exists(i =>
      i + 4 <= bytes.length && Brands(new String(bytes, i, 4, "US-ASCII")))
  }

  /** (format, codec, width, height, itemCount, primaryItemId). Format is
    * AVIF or HEIF by brand; codec from the primary item's `infe` type
    * (`av01`→av1, `hvc1`→hevc); geometry from the first `ispe` property.
    */
  final case class HeifMeta(format: String, codec: String, width: Int,
      height: Int, items: Int, primaryItem: Int)

  def readMeta(bytes: Array[Byte]): HeifMeta = {
    require(isHeif(bytes), "not an AVIF/HEIF payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val major = new String(bytes, 8, 4, "US-ASCII")
    val format = if (major.startsWith("avi")) "AVIF"
      else if (major.startsWith("hei") || major == "hevc") "HEIF"
      else "HEIF" // mif1/msf1 general brand
    val (metaF, metaU) = Mp4.child(b, 0, bytes.length, "meta")
      .getOrElse(sys.error("HEIF has no meta box"))
    // meta is a FullBox: children start 4 bytes in
    val mF = metaF + 4
    val primary = Mp4.child(b, mF, metaU, "pitm").map { case (f, _) =>
      // pitm: FullBox, then item_ID (u16 for v0, u32 for v1)
      if (Mp4.fullBoxVersion(b, f) == 0) b.getShort(f + 4) & 0xffff
      else b.getInt(f + 4)
    }.getOrElse(0)
    // iinf: FullBox with entry_count (u16 v0 / u32 v1) then infe boxes
    val (items, codecByItem) = Mp4.child(b, mF, metaU, "iinf").map {
      case (f, u) =>
        val v = Mp4.fullBoxVersion(b, f)
        val (n, from) = if (v == 0) (b.getShort(f + 4) & 0xffff, f + 6)
          else (b.getInt(f + 4), f + 8)
        val infes = Mp4.children(b, from, u, "infe").map { case (ef, _) =>
          // infe v2: item_ID(u16) protection(u16) item_type(4cc)
          val id = b.getShort(ef + 4) & 0xffff
          val typ = Mp4.fourcc(b, ef + 8)
          id -> typ
        }
        (math.max(n, infes.length), infes.toMap)
    }.getOrElse((0, Map.empty[Int, String]))
    val itemType = codecByItem.getOrElse(primary,
      codecByItem.values.headOption.getOrElse(""))
    val codec = itemType match {
      case "av01" => "av1"
      case "hvc1" | "hev1" => "hevc"
      case "jpeg" => "jpeg"
      case "" => if (format == "AVIF") "av1" else "hevc"
      case other => other.trim
    }
    // geometry: first ispe inside iprp/ipco
    val (w, h) = Mp4.child(b, mF, metaU, "iprp").flatMap { case (f, u) =>
      Mp4.child(b, f, u, "ipco").flatMap { case (cf, cu) =>
        Mp4.child(b, cf, cu, "ispe").map { case (pf, _) =>
          // ispe: FullBox + width(u32) + height(u32)
          (b.getInt(pf + 4), b.getInt(pf + 8))
        }
      }
    }.getOrElse((0, 0))
    HeifMeta(format, codec, w, h, items, primary)
  }

  // --------------------------------------------------------------- writer

  private def u16(i: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(i.toShort).array()
  private def u32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(i).array()
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    u32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }
  private def fullBox(typ: String, version: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(typ, Array[Byte](version.toByte, 0, 0, 0) ++
      payload.foldLeft(Array.empty[Byte])(_ ++ _))

  /** Minimal spec-shaped AVIF/HEIF fixture: real ftyp/meta/hdlr/pitm/
    * iinf(infe…)/iprp(ipco(ispe)) tree with `nItems` items of
    * `itemType` (av01 for AVIF, hvc1 for HEIF) and an opaque mdat —
    * enough structure for any meta-walking reader.
    */
  def writeTest(format: String, w: Int, h: Int, nItems: Int): Array[Byte] = {
    val (brand, itemType) =
      if (format == "AVIF") ("avif", "av01") else ("heic", "hvc1")
    val ftyp = box("ftyp", brand.getBytes("US-ASCII"), u32(0),
      brand.getBytes("US-ASCII"), "mif1".getBytes("US-ASCII"))
    val hdlr = fullBox("hdlr", 0, u32(0), "pict".getBytes("US-ASCII"),
      u32(0), u32(0), u32(0), Array[Byte](0))
    val pitm = fullBox("pitm", 0, u16(1))
    val infes = (1 to nItems).map(i =>
      fullBox("infe", 2, u16(i), u16(0), itemType.getBytes("US-ASCII"),
        Array[Byte](0))) // empty item_name
    val iinf = fullBox("iinf", 0, u16(nItems) +: infes: _*)
    val ispe = fullBox("ispe", 0, u32(w), u32(h))
    val iprp = box("iprp", box("ipco", ispe),
      fullBox("ipma", 0, u32(1), u16(1), Array[Byte](1, 1)))
    val meta = fullBox("meta", 0, hdlr, pitm, iinf, iprp)
    val mdat = box("mdat", Array.fill[Byte](16)(0x5A))
    ftyp ++ meta ++ mdat
  }
}

package graft.io

import org.apache.spark.sql.{DataFrame, Row}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** COCO-format detection export (reference `to_coco_dataset`,
  * `/root/reference/pixeltable/io/`): rows carry an image id/uri and
  * per-image annotations (xyxy boxes + integer labels); output is one COCO
  * JSON with images / annotations / categories sections.
  *
  * Expected columns: `image_id: bigint`, `file_name: string`,
  * `bboxes: array<array<double>>` (xyxy), `labels: array<int>`.
  * Annotations convert to COCO xywh. A COCO file is a single driver-side
  * JSON artifact by nature, but rows STREAM through `toLocalIterator` (one
  * partition in driver memory at a time, written straight to disk) — the
  * dataset is never fully materialized on the driver. The category set is
  * computed distributedly first.
  */
object Coco {

  def exportCocoJson(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.{col, explode}
    val slim = df.select("image_id", "file_name", "bboxes", "labels")
    val cats = slim.select(explode(col("labels")).as("c")).distinct()
      .orderBy(col("c")).collect().map(_.getInt(0)) // small: distinct label ids
    Files.createDirectories(Paths.get(path).getParent)
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    val annSb = new StringBuilder // annotations interleave with images: buffer to temp file
    val annPath = Files.createTempFile("coco-ann", ".part")
    val annW = Files.newBufferedWriter(annPath, StandardCharsets.UTF_8)
    try {
      w.write("{\"images\":[")
      var first = true
      var annId = 0L
      var annFirst = true
      val it = slim.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        if (!first) w.write(",")
        first = false
        w.write(s"""{"id":${r.getLong(0)},"file_name":${quote(r.getString(1))}}""")
        val boxes = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](2)
        val labels = r.getAs[scala.collection.Seq[Int]](3)
        boxes.zip(labels).foreach { case (b, l) =>
          annId += 1
          val (x, y, bw, bh) = (b(0), b(1), b(2) - b(0), b(3) - b(1))
          if (!annFirst) annW.write(",")
          annFirst = false
          annW.write(s"""{"id":$annId,"image_id":${r.getLong(0)},"category_id":$l,""" +
            s""""bbox":[$x,$y,$bw,$bh],"area":${bw * bh},"iscrowd":0}""")
        }
      }
      annW.close()
      w.write("],\"annotations\":[")
      val reader = Files.newBufferedReader(annPath, StandardCharsets.UTF_8)
      try {
        val buf = new Array[Char](64 * 1024)
        var n = reader.read(buf)
        while (n > 0) { w.write(buf, 0, n); n = reader.read(buf) }
      } finally reader.close()
      w.write("],\"categories\":[")
      w.write(cats.map(c => s"""{"id":$c,"name":"category_$c"}""").mkString(","))
      w.write("]}")
    } finally {
      w.close()
      Files.deleteIfExists(annPath)
      ()
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

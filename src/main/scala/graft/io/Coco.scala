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
  * Annotations convert to COCO xywh. The collect is intentional: a COCO
  * file is a single driver-side JSON artifact, not a distributed dataset.
  */
object Coco {

  def exportCocoJson(df: DataFrame, path: String): Unit = {
    val rows = df.select("image_id", "file_name", "bboxes", "labels").collect()
    val sb = new StringBuilder
    sb ++= "{\"images\":["
    sb ++= rows.map { r =>
      s"""{"id":${r.getLong(0)},"file_name":${quote(r.getString(1))}}"""
    }.mkString(",")
    sb ++= "],\"annotations\":["
    var annId = 0L
    val anns = rows.flatMap { r =>
      val boxes = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](2)
      val labels = r.getAs[scala.collection.Seq[Int]](3)
      boxes.zip(labels).map { case (b, l) =>
        annId += 1
        val (x, y, w, h) = (b(0), b(1), b(2) - b(0), b(3) - b(1))
        s"""{"id":$annId,"image_id":${r.getLong(0)},"category_id":$l,""" +
          s""""bbox":[$x,$y,$w,$h],"area":${w * h},"iscrowd":0}"""
      }
    }
    sb ++= anns.mkString(",")
    sb ++= "],\"categories\":["
    val cats = rows.flatMap(_.getAs[scala.collection.Seq[Int]](3)).distinct.sorted
    sb ++= cats.map(c => s"""{"id":$c,"name":"category_$c"}""").mkString(",")
    sb ++= "]}"
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

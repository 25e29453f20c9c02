package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media values are opaque `binary` payloads (or
  * URIs) plus a typed metadata struct with per-cell error capture — the
  * Spark mapping of the reference's media types + cellmd pseudo-columns
  * (`/root/reference/pixeltable/type_system.py:1624-1817`,
  * `exprs/column_property_ref.py:24-29`).
  *
  * The decode kernels are STUBS (deterministic fakes derived from the
  * payload bytes) because no image/audio codecs ship in this container —
  * the Spark-side contract is real and tested: schema, mapPartitions
  * batching, error capture into the metadata struct rather than task
  * failure, and one-to-many frame expansion.
  */
object Multimodal {

  /** metadata struct: reference cellmd (errortype/errormsg) + media props */
  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mode", StringType),
    StructField("errortype", StringType),
    StructField("errormsg", StringType),
  ))

  /** Real image decode via the JDK's headless javax.imageio (see
    * `graft.functions.Images` for the full op family). Decode failures are
    * captured per cell by `withImageMeta`.
    */
  private[multimodal] def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    val img = graft.functions.Images.decode(bytes)
    (img.getWidth, img.getHeight, graft.functions.Images.mode(img))
  }

  /** Attach decoded metadata for a binary media column. Runs as a
    * mapPartitions pass (one JVM call per partition, not per row); decode
    * failures land in the struct's errortype/errormsg — the reference's
    * on_error='ignore' cell-level capture — instead of failing the task.
    */
  def withImageMeta(df: DataFrame, binaryCol: String, metaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(metaCol, imageMetaType))
    val idx = df.schema.fieldIndex(binaryCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta =
          try {
            val (w, h, m) = decodeImage(r.getAs[Array[Byte]](idx))
            Row(w, h, m, null, null)
          } catch {
            case e: Exception => Row(null, null, null, e.getClass.getSimpleName, e.getMessage)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** STUB frame sampling: one-to-many expansion of a binary "video" payload
    * into n fixed-size frame slices with frame index — the dataflow shape of
    * the reference's frame_iterator component views
    * (`functions/video/iterators.py:41-123`). Real decode would replace the
    * slicing with codec calls; partitioning/expansion stays identical.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, nFrames: Int): DataFrame = {
    val frames = transform(sequence(lit(0), lit(nFrames - 1)), i =>
      struct(i.as("frame_idx"),
        substring(col(binaryCol), i * 8 + 1, lit(8)).as("frame_bytes")))
    df.select((df.columns.map(col) :+
      posexplode(frames).as(Seq("_pos", "frame")): _*))
      .select((df.columns.map(col) :+ col("_pos") :+
        col("frame.frame_idx").as("frame_idx") :+
        col("frame.frame_bytes").as("frame_bytes")): _*)
  }
}

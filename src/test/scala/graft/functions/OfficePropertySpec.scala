package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the office→markdown conversion on ARBITRARY
  * document structures: writer→parser→chunker recovers exactly the
  * bodies under the headings that precede them, for any mix of heading
  * levels, body paragraphs, list items and special characters.
  */
object OfficePropertySpec extends Properties("office") {

  private val bodyText: Gen[String] = for {
    words <- Gen.chooseNum(1, 6)
    ws <- Gen.listOfN(words, Gen.oneOf("alpha", "beta", "x&y", "a<b",
      "plain", "últi", "42"))
  } yield ws.mkString(" ")

  private val para: Gen[(Int, String)] = for {
    lvl <- Gen.frequency((3, Gen.const(0)), (2, Gen.chooseNum(1, 6)),
      (1, Gen.const(-1)))
    t <- bodyText
  } yield (lvl, t)

  private val document: Gen[List[(Int, String)]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, para))

  property("docx bodies survive the round trip under their headings") =
    Prop.forAll(document) { paras =>
      val md = Office.docxToMarkdown(Office.writeDocx(paras))
      // every body/list paragraph's text appears verbatim; every heading
      // appears as a markdown heading of its level
      paras.forall {
        case (0, t) => md.contains(t)
        case (-1, t) => md.contains(s"- $t")
        case (lvl, t) => md.contains(("#" * lvl) + " " + t)
      }
    }

  property("pptx slide count and order survive") =
    Prop.forAll(Gen.chooseNum(1, 15), bodyText) { (n, body) =>
      val md = Office.pptxToMarkdown(Office.writePptx(
        (1 to n).map(i => (s"T$i", Seq(s"$body $i")))))
      val titles = md.split("\n").filter(_.startsWith("# ")).map(_.drop(2)).toSeq
      titles == (1 to n).map(i => s"T$i")
    }

  property("chunker sees exactly the non-heading paragraphs") =
    Prop.forAll(document) { paras0 =>
      // normalize: consecutive body paragraphs merge into one chunk, so
      // compare the CONCATENATION of bodies between headings
      val paras = (1, "Root") :: paras0 // ensure a leading heading
      val md = Office.docxToMarkdown(Office.writeDocx(paras))
      val chunkTexts = {
        // reuse the production chunker through its UDF function
        val spark = graft.TestSpark.spark
        import spark.implicits._
        import org.apache.spark.sql.functions._
        Seq(Tuple1(md)).toDF("t")
          .select(explode(Iterators.headingChunks(col("t"))).as("c"))
          .select("c.text").as[String].collect().toSeq
      }
      val allBodies = paras.collect { case (l, t) if l <= 0 => t }
      allBodies.forall(b => chunkTexts.exists(_.contains(b)))
    }
}

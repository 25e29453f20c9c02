package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entity decoding: named, decimal, hex, malformed pass-through") {
    assert(Html.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot;") ==
      "a & b <c> \"d\"")
    assert(Html.decodeEntities("&#72;&#105;&#x21;") == "Hi!")
    // &nbsp; decodes to U+00A0 here; block assembly normalizes it to ' '
    assert(Html.decodeEntities("caf&eacute; &nbsp;x") == "café  x")
    // malformed: no semicolon, unknown name, overlong body stay literal
    assert(Html.decodeEntities("AT&T &unknownname; &toolongtoparse123;") ==
      "AT&T &unknownname; &toolongtoparse123;")
  }

  test("tag soup: comments, script/style, quoted '>' attributes, CDATA") {
    val html =
      """<html><head><title>The Title</title>
        |<style>p > em { color: red }</style>
        |<script>if (a < b && c > d) { document.write("<div>"); }</script>
        |</head><body>
        |<!-- a comment with <p>fake tags</p> inside -->
        |<p class="x" data-note="a > b">first  para</p>
        |<P>SECOND<br/>line two</P>
        |<div><![CDATA[raw <not-a-tag> text]]></div>
        |5 < 6 is math, not a tag
        |</body></html>""".stripMargin
    val text = Html.htmlToText(html)
    assert(text.split("\n").toSeq == Seq(
      "The Title", "first para", "SECOND", "line two",
      "raw <not-a-tag> text", "5 < 6 is math, not a tag"))
  }

  test("boilerplate removal: link-dense short blocks drop, prose stays") {
    val prose = "This is a long paragraph of genuine article content " +
      "that easily exceeds the eighty character minimum for keeping."
    val html =
      s"""<body>
         |<nav><a href="/">home</a> <a href="/a">news</a> <a href="/b">sport</a></nav>
         |<h1>Headline</h1>
         |<p>$prose</p>
         |<p>Short real note.</p>
         |<footer><a href="/p">privacy</a> · <a href="/t">terms</a></footer>
         |</body>""".stripMargin
    val main = Html.extractMainText(html)
    assert(main.split("\n").toSeq == Seq("Headline", prose, "Short real note."),
      s"got: $main")
    // the full extraction keeps everything
    assert(Html.htmlToText(html).contains("home news sport"))
    assert(Html.htmlToText(html).contains("privacy · terms"))
  }

  test("nested anchors and unclosed tags do not break block accounting") {
    val html = "<div><a href='x'>one <b>two</b></a> tail</div><p>next"
    val bs = Html.blocks(html)
    assert(bs.map(_.text) == Seq("one two tail", "next"))
    // link chars counted only inside the anchor ("onetwo" = 6 non-space)
    assert(bs.head.linkChars == 6)
  }

  test("Spark surface: map-only extraction over a DataFrame") {
    val df = Seq(
      (1L, "<p>alpha &amp; beta</p>"),
      (2L, "<nav><a href='/'>x</a> <a href='/y'>y</a></nav><p>Real content here that is quite long and plainly not navigation boilerplate.</p>"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(col("id"), Html.htmlMainText(col("html")).as("text"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == "alpha & beta")
    assert(df(1).getString(1).startsWith("Real content"))
    assert(!df(1).getString(1).contains("x y"))
    assert(df(2).isNullAt(1))
  }

  test("imageRefs: src/alt/title attributes, quote styles, entity decode") {
    val html = """<html><body>
      |<img src="https://a.example/cat.jpg" alt="A &amp; cat" title='Le chat'>
      |<p>text</p>
      |<img alt="no src, skipped">
      |<img src='rel/dog.png' alt=unquoted />
      |<IMG SRC="UPPER.webp" ALT="caps tag">
      |<img src=" spaced.gif ">
      |</body></html>""".stripMargin
    val refs = Html.imageRefs(html)
    assert(refs.map(_.src) == Seq("https://a.example/cat.jpg",
      "rel/dog.png", "UPPER.webp", "spaced.gif"))
    assert(refs.head.alt == "A & cat" && refs.head.title == "Le chat")
    assert(refs(1).alt == "unquoted")
    assert(refs(3).alt == "")
    assert(Html.imageRefs(null).isEmpty)
    assert(Html.imageRefs("no images at all").isEmpty)
  }

  test("imageRefs: script/template/comment images skipped; '>' in quotes ok") {
    val html = """<script>var x = '<img src="fake.js.png">';</script>
      |<template><img src="tpl.png"></template>
      |<!-- <img src="commented.png"> -->
      |<img src="real.png" alt="a > b still one tag">
      |<noscript><img src="ns.png"></noscript>""".stripMargin
    val refs = Html.imageRefs(html)
    assert(refs.map(_.src) == Seq("real.png"))
    assert(refs.head.alt == "a > b still one tag")
  }

  test("imageRefs: unquoted value in a self-closing tag keeps the URL clean") {
    // real crawl HTML mixes unquoted attributes with XHTML-style `/>` —
    // the slash closes the tag, it is not part of the URL
    val refs = Html.imageRefs(
      """<img src=foo.jpg/><img alt=x src=bar.png /><img src="q.png"/>""")
    assert(refs.map(_.src) == Seq("foo.jpg", "bar.png", "q.png"))
    assert(refs(1).alt == "x")
  }

  test("imageRefs: Spark surface yields struct pairs") {
    val rows = Seq((1L, "<img src='s1.png' alt='one'><img src='s2.png' alt='two'>"))
      .toDF("id", "html")
      .select(col("id"), explode(Html.imagePairs(col("html"))).as("p"))
      .select(col("p.src"), col("p.alt")).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("s1.png", "one"), ("s2.png", "two")))
  }
}

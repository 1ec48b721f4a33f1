package graft

import org.apache.spark.sql.functions._

import graft.text.Html

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, maxDensity: Double = 0.3, minChars: Int = 10) =
    Html.extract(Seq((1L, html)).toDF("id", "h"), col("id"), col("h"),
      maxDensity, minChars).collect().head

  test("tags strip to spaces, whitespace squeezes, text trims") {
    val r = one("<html><body><h1>Title</h1><p>one  two\n three</p></body></html>")
    assert(r.getAs[String]("text") == "Title one two three")
    assert(r.getAs[Int]("n_links") == 0)
    assert(r.getAs[Double]("link_density") == 0.0)
  }

  test("script and style blocks vanish whole, even multiline with '<' inside") {
    val r = one("<script type=\"x\">var a = 1 < 2;\nmore</script>keep" +
      "<style>.c { color: red }\n.d{}</style> me")
    assert(r.getAs[String]("text") == "keep me")
  }

  test("link density counts anchor inner HTML against clean length") {
    // clean = "abcdefghij link" (15 chars), anchor inner = "link" (4)
    val r = one("<p>abcdefghij</p><a href=\"u\">link</a>")
    assert(r.getAs[String]("text") == "abcdefghij link")
    assert(r.getAs[Int]("n_links") == 1)
    assert(r.getAs[Long]("anchor_chars") == 4L)
    assert(math.abs(r.getAs[Double]("link_density") - 4.0 / 15) < 1e-6)
    assert(r.getAs[Int]("kept") == 1)
  }

  test("navigation boilerplate gates out; short pages gate out") {
    val nav = one("<a>Home</a> <a>About</a> <a>Contact</a> x")
    assert(nav.getAs[Int]("kept") == 0) // density ~ 16/22 > 0.3
    val short = one("<p>tiny</p>")
    assert(short.getAs[Int]("kept") == 0) // 4 chars < 10
    assert(short.getAs[Double]("link_density") == 0.0)
  }

  test("tags merely starting with 'a' are not anchors") {
    // <article> must not open an anchor that swallows the body
    val r = one("<article><p>a long body of perfectly good words here" +
      "</p><a href=\"x\">ref</a></article>")
    assert(r.getAs[Int]("n_links") == 1)
    assert(r.getAs[Long]("anchor_chars") == 3L)
    assert(r.getAs[Int]("kept") == 1)
  }

  test("an unclosed script block swallows to end-of-input, never leaking code") {
    val r = one("<p>good text before the cut off</p>" +
      "<script>var a = 1; document.write('junk junk junk junk junk'")
    assert(r.getAs[String]("text") == "good text before the cut off")
  }

  test("empty body is defined: empty text, zero density, gated out") {
    val r = one("<script>only code</script>")
    assert(r.getAs[String]("text") == "")
    assert(r.getAs[Double]("link_density") == 0.0)
    assert(r.getAs[Int]("kept") == 0)
  }
}

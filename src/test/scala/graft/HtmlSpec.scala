package graft

import graft.prep.Html
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.textOf(col("h"))).head().getString(0)
  }

  test("tags strip, never gluing words; script/style vanish WITH contents") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract(
      """<script>if (a < b) { x("</div>"); }</script>pro<style>p{}</style>se""")
      == "pro se")
    assert(extract("a<br/>b <div class=\"x\">c</div>") == "a b c")
  }

  test("entity decode: reserved set, &amp; strictly last — no double decode") {
    assert(extract("&lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;b") ==
      """<tag> "q" 'a' b""")
    // the literal text "&lt;" is written as &amp;lt; — must decode to &lt;,
    // NOT to < (the double-decode a wrong fold order produces)
    assert(extract("&amp;lt;") == "&lt;")
  }

  test("comments drop; whitespace runs collapse; escape is the exact inverse") {
    assert(extract("a<!-- x\n<p>hidden</p> -->  \n\t b") == "a b")
    val texts = Seq("a & b < c > d", "plain", "&amp; already-escaped")
    import spark.implicits._
    val got = texts.toDF("t")
      .select(Html.textOf(concat(lit("<p>"), Html.escape(col("t")), lit("</p>")))
        .as("r"), col("t"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1).replaceAll("\\s+", " ").trim,
      s"round trip broke for '${r.getString(1)}'"))
  }

  test("stated limit: an UNCLOSED script has no element to strip — its code leaks as text") {
    assert(extract("before<script>var x = 1;</p>after") == "before var x = 1; after")
  }
}

package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/**
 * HTML-strip semantics (the full-corpus chain is oracle-pinned in
 * pq68): block elements drop with contents, tags space-separate words,
 * entity decoding order (&amp; last), whitespace collapse, null
 * preservation, and graceful degradation on unclosed blocks.
 */
class TextCleanSpec extends AnyFunSuite {
  import TestSpark.spark

  private def clean(html: String): String = {
    val df = spark.createDataFrame(Seq((1L, html))).toDF("id", "html")
    TextClean.stripHtml(df, "id", "html", ordered = false).collect()(0).getString(1)
  }

  test("script and style drop with contents; a stray close cannot cross-match") {
    assert(clean("<p>a</p><script>var x = 1 < 2;</script><p>b</p>") == "a b")
    assert(clean("a<style>p { color: red }</style>b") == "a b")
    // the </style> must not close the <script> block
    assert(clean("<script>x</style>y</script>z") == "z")
  }

  test("tags become spaces so adjacent words never fuse") {
    assert(clean("one</p><p>two") == "one two")
    assert(clean("<a href=\"u\">link</a>!") == "link !")
  }

  test("entities decode with &amp; strictly last") {
    assert(clean("R&amp;D &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;t") ==
      "R&D <b> \"q\" 's' t")
    // &amp;lt; is the TEXT "&lt;", never a phantom tag opener
    assert(clean("x &amp;lt;script&amp;gt; y") == "x &lt;script&gt; y")
  }

  test("comments drop; whitespace collapses; nulls pass through") {
    assert(clean("a <!-- <p>hidden</p> --> b") == "a b")
    assert(clean("  a\n\n\tb  ") == "a b")
    val df = spark.createDataFrame(
      Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[String]))).toDF("id", "html")
    assert(TextClean.stripHtml(df, "id", "html", ordered = false)
      .collect()(0).isNullAt(1))
  }

  test("unclosed script degrades to tag-strip, not data loss") {
    assert(clean("<p>keep</p><script>tail code") == "keep tail code")
  }
}

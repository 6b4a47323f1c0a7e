package graft.operators

import org.scalatest.funspec.AnyFunSpec

import graft.TestSpark

class HtmlSpec extends AnyFunSpec {
  private lazy val spark = TestSpark.spark

  describe("HTML main-content extraction (q232)") {
    it("segments the fixture page into the closed-form block census") {
      val (title, blocks) = Html.extract(Html.htmlOf(4L, "alpha beta gamma", "src1"))
      assert(title == "Doc 4 - src1")
      assert(blocks.size == 7)
      assert(blocks.count(_.chrome) == 3) // the nav li trio
      val main = blocks.filterNot(_.chrome)
      assert(main.map(_.tag) == List("h1", "p", "p", "p"))
      assert(main(0).text == "Doc 4" && main(0).linkChars == 0)
      assert(main(1).text == "alpha beta gamma")
      assert(main(2).text == "Read more here and there." && main(2).linkChars == 9)
      assert(main(3).text == "click now" && main(3).linkChars == 8)
    }

    it("applies the integer anchor-density keep rule") {
      val a = Html.auditOne(4L, Html.htmlOf(4L, "alpha beta gamma", "src1"))
      assert(a.n_blocks == 7 && a.n_kept == 3 && a.n_chrome == 3 && a.n_linky == 1)
      assert(a.kept_chars == ("Doc 4".length + "alpha beta gamma".length +
        "Read more here and there.".length).toLong)
    }

    it("survives the armed arms: uppercase tags, attributes, comment ghosts, void br") {
      // 1155 = 3·5·7·11 — every arm at once
      val a = Html.auditOne(1155L, Html.htmlOf(1155L, "some page text", "srcX"))
      assert(a.n_blocks == 7 && a.n_kept == 3)
      assert(a.title == "Doc 1155 - srcX")
    }

    it("never extracts script/style payloads or commented-out markup") {
      val html = "<html><body><script>var s = '<p>ghost</p>';</script>" +
        "<style>p { } /* <li>x</li> */</style><!-- <h1>no</h1> -->" +
        "<p>real</p></body></html>"
      val (_, blocks) = Html.extract(html)
      assert(blocks.map(_.text) == List("real"))
    }

    it("decodes the basic entities and tolerates broken markup") {
      val (_, blocks) = Html.extract("<p>a &amp; b &lt;tag&gt; &#39;q&#39;</p>")
      assert(blocks.head.text == "a & b <tag> 'q'")
      // unclosed block finalizes at EOF; stray '<' swallowed
      val (_, b2) = Html.extract("<p>open forever <notatag and < raw")
      assert(b2.size == 1 && b2.head.text.startsWith("open forever "))
    }

    it("counts anchor text only inside anchors, across entities") {
      val (_, blocks) = Html.extract("<p>x <a>l&amp;l</a> y</p>")
      assert(blocks.head.text == "x l&l y" && blocks.head.linkChars == 3)
    }

    it("drops nav/footer blocks regardless of density") {
      val (_, blocks) = Html.extract(
        "<nav><p>pure prose inside chrome</p></nav><p>kept</p>")
      assert(blocks.map(b => (b.text, b.chrome)) ==
        List(("pure prose inside chrome", true), ("kept", false)))
    }

    it("extracts the fixture corpus distributed, matching auditOne") {
      val rows = Html.htmlExtract(spark, TestSpark.Sf).collect()
      assert(rows.length == 500)
      assert(rows.forall(_.getAs[Boolean]("parse_ok")))
      assert(rows.forall(r => r.getAs[Int]("n_kept") == 3))
      val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
        .select("doc_id", "text", "source").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      rows.take(20).foreach { r =>
        val id = r.getAs[Long]("doc_id")
        val (t, s) = docs(id)
        val one = Html.auditOne(id, Html.htmlOf(id, t, s))
        assert(r.getAs[String]("main_sha256") == one.main_sha256)
        assert(r.getAs[String]("title") == one.title)
      }
    }
  }

  describe("extractLinks (q251)") {
    it("finds every href on the fixture page: 9 relative + 4 absolute") {
      val links = Html.extractLinks(Html.linkPageOf(12L, "body text", "s"))
      assert(links.size == 13)
      assert(links.count(_._1.startsWith("https://")) == 4)
      // closed-form targets for id=12: dst = (84 + 13k + 1) % 20
      val abs = links.filter(_._1.startsWith("https://"))
      assert(abs.map(_._1) == List(
        "https://site5.example/page12", "https://site18.example/page15",
        "https://site11.example/page18", "https://site4.example/page21"))
      assert(abs.map(_._2) == List("ref0", "ref1", "ref2", "ref3"))
    }

    it("skips anchors inside script/style and comments") {
      val html = """<html><script>var a = '<a href="/x">no</a>';</script>
        |<!-- <a href="/y">ghost</a> -->
        |<style>.a { }</style><p><a href="/real">yes</a></p></html>"""
        .stripMargin
      assert(Html.extractLinks(html) == List(("/real", "yes")))
    }

    it("reads single-quoted, bare, and entity-bearing values") {
      val html = "<a href='/sq'>one</a><a href=/bare>two</a>" +
        "<a href=\"/e\">A &amp; B</a>"
      assert(Html.extractLinks(html) == List(
        ("/sq", "one"), ("/bare", "two"), ("/e", "A & B")))
    }

    it("finalizes an unclosed anchor at EOF and strips nested markup") {
      assert(Html.extractLinks("<a href=\"/u\">tail <b>bold</b> text") ==
        List(("/u", "tail bold text")))
      assert(Html.extractLinks("<A HREF=\"/up\">CASE</A>") ==
        List(("/up", "CASE")))
    }
  }
}

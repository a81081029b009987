package graft.sources

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** The zero-egress HTML tokenizer behind [[DocExtract.HtmlExtractor]]:
  * boilerplate/skip-subtree removal, block-boundary paragraphing,
  * character-reference decoding, title capture, and the writer
  * round-trip the q101 gate relies on. Pure JVM — no SparkSession. */
class HtmlSpec extends AnyFunSuite {

  private def body(html: String): String = Html.toText(html)._1
  private def title(html: String): String = Html.toText(html)._2

  test("script/style/noscript subtrees are dropped whole") {
    val h = """<body><p>vorher</p><script>if (1 < 2) { x("<p>nope</p>"); }</script>
              |<style>a > b { color: red }</style><noscript>kein js</noscript>
              |<p>nachher</p></body>""".stripMargin
    assert(body(h) === "vorher\n\nnachher")
  }

  test("nav/header/footer/aside boilerplate chrome is dropped") {
    val h = """<body><nav><ul><li>Start</li><li>Kontakt</li></ul></nav>
              |<header><h1>Portal</h1></header>
              |<article><p>der eigentliche inhalt</p></article>
              |<aside>Werbung</aside><footer>&copy; 2026</footer></body>""".stripMargin
    assert(body(h) === "der eigentliche inhalt")
  }

  test("nested same-name skip subtrees need matching closes") {
    // a <header> INSIDE a <header>: the outer one must stay closed
    // until both ends are seen — depth counting, not first-match
    val h = "<header>chrome <header>inner</header> still chrome</header><p>text</p>"
    assert(body(h) === "text")
  }

  test("block tags break paragraphs; br breaks lines; inline tags are transparent") {
    val h = "<div>erste <b>fette</b> zeile<br/>zweite zeile</div><div>neuer absatz</div>"
    assert(body(h) === "erste fette zeile\nzweite zeile\n\nneuer absatz")
  }

  test("character references decode: named, decimal, hex; unknown pass through") {
    assert(body("<p>M&uuml;ll &amp; Wertstoff &#8211; &#x2713; &bogus; A&B</p>")
      === "Müll & Wertstoff – ✓ &bogus; A&B")
  }

  test("control chars never alias the in-band sentinels") {
    // literal U+0000 / U+0001 in source text must not split paragraphs
    // or materialize line breaks — they are stripped pre-tokenize
    assert(body("<p>a\u0000b\u0001c</p>") === "abc")
    // numeric refs for C0 controls decode to empty, not to sentinel
    // collisions (&#0; / &#1; / &#x1;)
    assert(body("<p>a&#0;b&#1;c&#x1;d</p>") === "abcd")
    // CDATA is raw content but still sentinel-safe
    assert(body("<p><![CDATA[x\u0001y]]></p>") === "xy")
    // tab/newline survive as whitespace (collapse rules apply)
    assert(body("<p>a&#9;b</p>") === "a b")
  }

  test("title tag wins and is whitespace-collapsed; head contributes no body text") {
    val h = """<html><head><title>  Abfall
              |   Portal </title><meta charset="utf-8"/></head>
              |<body><p>inhalt</p></body></html>""".stripMargin
    assert(title(h) === "Abfall Portal")
    assert(body(h) === "inhalt")
  }

  test("quoted '>' inside attributes does not end the tag") {
    val h = """<p><img alt="a > b" src="x.png"/>bild folgt</p>"""
    assert(body(h) === "bild folgt")
  }

  test("comments, DOCTYPE and CDATA are handled") {
    val h = "<!DOCTYPE html><p>a<!-- <p>kommentar</p> -->b</p><p><![CDATA[roh & pur]]></p>"
    assert(body(h) === "ab\n\nroh & pur")
  }

  test("stray '<' that opens no tag is literal text") {
    assert(body("<p>1 < 2 und 3 > 2</p>") === "1 < 2 und 3 > 2")
  }

  test("pretty-printing whitespace collapses; plain space runs are preserved") {
    assert(body("<p>eins\n   zwei</p>") === "eins zwei")
    assert(body("<p>drei  leerzeichen</p>") === "drei  leerzeichen")
  }

  test("writer round-trip: pageBytes → toText recovers (title, text) exactly") {
    val text = "tonne glas papier & restmuell <sondermuell> \"zitat\""
    val html = new String(Html.pageBytes("Doc 7", text), StandardCharsets.UTF_8)
    val (b, t) = Html.toText(html)
    assert(t === "Doc 7")
    assert(b === text)
  }

  test("HtmlExtractor: title contract, chunk law, empty body yields 0 chunks") {
    val ex = new DocExtract.HtmlExtractor()
    val long = "w" * 1200
    val d1 = ex.extract(DocExtract.RawDoc(1, "html", "p1",
      Html.pageBytes("Seite Eins", long)))
    assert(d1.title === "Seite Eins")
    assert(d1.n_chunks === 3) // ceil(1200/500)
    assert(d1.provenance === "html:1p")
    val d2 = ex.extract(DocExtract.RawDoc(2, "html", "p2",
      Html.pageBytes("Leer", "   ")))
    assert(d2.n_chunks === 0)
    assert(d2.title === "Leer") // title tag still wins on empty bodies
    // no <title> at all → first body line
    val d3 = ex.extract(DocExtract.RawDoc(3, "html", "p3",
      "<body><p>erste zeile</p><p>zweite</p></body>".getBytes(StandardCharsets.UTF_8)))
    assert(d3.title === "erste zeile")
    assert(d3.provenance === "html:2p")
  }
}

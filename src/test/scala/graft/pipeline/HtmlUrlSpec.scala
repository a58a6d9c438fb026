package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.kmeans.SparkTestSession
import graft.text.{TextOps, UrlOps}

/** HTML main-content extraction + URL canonicalization / domain cap
  * (round-19 ingest extensions: the two production stages in front of
  * every text operator — boilerplate removal and URL-level dedup).
  */
class HtmlUrlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs(ds: (Long, String)*): DataFrame = ds.toDF("doc_id", "text")

  private def extract(html: String): String =
    docs((1L, html))
      .select(TextOps.extractHtmlMain($"text")).as[String].head()

  // ---- extractHtmlMain: boilerplate removal -------------------------

  test("extractHtmlMain drops every boilerplate class and keeps both " +
      "content paragraphs in document order") {
    val prose = "it is a long paragraph of the content and it has the " +
      "usual stopwords in it"
    val terse = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliett kilo" // 11 words, zero stopwords: length escape
    val html =
      "<html><head><title>Short Title</title>" +
        "<script>var x = \"the of and in is it\";</script>" +
        "<style>.m{color:red}</style></head><body>" +
        "<nav><a href=\"/\">home</a> <a href=\"/a\">about</a> " +
        "<a href=\"/t\">tags</a></nav>" +
        s"<div><p>$prose</p><p>$terse</p></div>" +
        "<ul><li><a href=\"/r1\">related item one</a></li></ul>" +
        "<footer>copyright examplecorp sitemap contact privacy terms" +
        "</footer></body></html>"
    assert(extract(html) === s"$prose $terse")
  }

  test("extractHtmlMain: script/style text never leaks even when " +
      "stopword-rich, and a 5-9 word zero-stopword block is dropped " +
      "while the same words pass at >= 10 (the length escape)") {
    // script body is pure stopwords — if the strip failed it would pass
    // the density gate and leak into the output
    val html = "<script>the of and in is it for as at by</script>" +
      "<p>alpha bravo charlie delta echo</p>" + // 5 words, 0 stopwords
      "<p>alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett</p>" // 10 words, 0 stopwords: kept by the length escape
    assert(extract(html) ===
      "alpha bravo charlie delta echo foxtrot golf hotel india juliett")
  }

  test("extractHtmlMain: link density 0.2 boundary is exact (integer " +
      "cross-multiplication, links*5 <= wc)") {
    // 10 words, 2 links -> density exactly 0.2: kept
    val keep = "<p><a href=\"/x\">alpha bravo</a> charlie delta echo " +
      "<a href=\"/y\">foxtrot</a> golf hotel india juliett</p>"
    // 10 words, 3 links -> 0.3: dropped
    val drop = "<p><a href=\"/x\">alpha bravo</a> <a href=\"/z\">charlie" +
      "</a> delta echo <a href=\"/y\">foxtrot</a> golf hotel india " +
      "juliett</p>"
    assert(extract(keep + drop) ===
      "alpha bravo charlie delta echo foxtrot golf hotel india juliett")
  }

  // ---- canonicalizeUrl: one assert per normalization rule -----------

  private def canon(url: String): String =
    docs((1L, url)).select(UrlOps.canonicalizeUrl($"text")).as[String].head()

  test("canonicalizeUrl: scheme/host case, www, default ports, fragment, " +
      "tracking params, param order, empty path") {
    assert(canon("HTTPS://WWW.Ex.COM/p?b=2&a=1#frag") ===
      "https://ex.com/p?a=1&b=2")
    assert(canon("https://ex.com:443/p") === "https://ex.com/p")
    assert(canon("http://ex.com:80/p") === "http://ex.com/p")
    // a NON-default port is identity-bearing and must survive
    assert(canon("https://ex.com:8443/p") === "https://ex.com:8443/p")
    // http's default is NOT https's: :443 on http stays
    assert(canon("http://ex.com:443/p") === "http://ex.com:443/p")
    assert(canon("https://ex.com") === "https://ex.com/")
    assert(canon("https://ex.com/p?utm_source=f&id=3&fbclid=z&gclid=y" +
      "&ref=r&mc_cid=m") === "https://ex.com/p?id=3")
    // a query left empty by the strip loses its '?'
    assert(canon("https://ex.com/p?utm_campaign=c") === "https://ex.com/p")
    // params sort by full key=value text; values keep their case
    assert(canon("https://ex.com/p?z=UP&a=2") === "https://ex.com/p?a=2&z=UP")
  }

  test("registrableDomain: longest suffix wins, bare/unknown pass through") {
    val got = Seq(
      "a.b.site.com", "blog.site.co.uk", "Site.CO.UK", "x.site.uk",
      "site.internal", "co.uk")
      .toDF("h").select(UrlOps.registrableDomain($"h")).as[String].collect()
    assert(got(0) === "site.com")
    assert(got(1) === "site.co.uk") // co.uk beats its tail uk
    assert(got(2) === "site.co.uk")
    assert(got(3) === "site.uk") // bare uk when no two-label suffix fits
    assert(got(4) === "site.internal") // unknown suffix: passthrough
    assert(got(5) === "co.uk") // a host that IS a suffix: passthrough
  }

  test("urlDedup: messy variants of one URL collapse to one group with " +
      "the lowest doc_id as keeper") {
    val d = Seq(
      (3L, "HTTPS://WWW.Ex.COM:443/p?utm_source=f&id=1#x"),
      (7L, "https://ex.com/p?id=1&utm_campaign=c"),
      (9L, "https://ex.com/p?id=2"))
      .toDF("doc_id", "url")
    val got = Dedup.urlDedup(d).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "https://ex.com/p?id=1" -> ((2L, 3L)),
      "https://ex.com/p?id=2" -> ((1L, 9L))))
  }

  test("domainCap: per-registrable-domain top-cap by quality, hosts " +
      "reduced across subdomains and suffix classes") {
    // 4 docs in site1.com (via two different subdomains), 1 in
    // site2.co.uk; cap=2 keeps the 2 best of site1 + the site2 doc.
    // Longer prose scores higher on the length term of qualityScore.
    val long = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the quiet woods to rest for a while longer"
    val short = "tiny text"
    val d = Seq(
      (1L, long, "https://a.site1.com/1"),
      (2L, long, "https://b.site1.com/2"),
      (3L, short, "https://a.site1.com/3"),
      (4L, short, "https://b.site1.com/4"),
      (5L, long, "https://www.site2.co.uk/5"))
      .toDF("doc_id", "text", "url")
    val got = TextOps.domainCap(d, urlCol = "url", cap = 2)
      .select($"doc_id", $"domain", $"rnk").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    graft.util.OpCaches.releaseAll(spark)
    assert(got === Seq(
      (1L, "site1.com", 1L), (2L, "site1.com", 2L),
      (5L, "site2.co.uk", 1L)))
  }
}

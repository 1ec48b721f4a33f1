package graft

import org.apache.spark.sql.functions._

import graft.text.Url

/** URL canonicalization: every rule pinned on hand cases, plus the
  * domain heuristic and the rollup grain. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u").select(Url.canonicalize(col("u"))).as[String]
      .collect().toSeq

  private def dom(hosts: String*): Seq[String] =
    hosts.toSeq.toDF("h").select(Url.registrableDomain(col("h"))).as[String]
      .collect().toSeq

  test("the kitchen-sink case applies every rule") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b/?utm_source=x&id=3#frag")
      == Seq("http://example.com/A/b?id=3"))
  }

  test("case: scheme+authority lowered, path/query case preserved") {
    assert(canon("HTTPS://News.Site.org/Dir/Page?Id=X")
      == Seq("https://news.site.org/Dir/Page?Id=X"))
  }

  test("default ports are scheme-specific") {
    assert(canon("http://a.com:80/p", "https://a.com:443/p",
        "https://a.com:80/p", "http://a.com:8080/p")
      == Seq("http://a.com/p", "https://a.com/p",
        "https://a.com:80/p", "http://a.com:8080/p"))
  }

  test("tracking params: leading, middle, consecutive, whole-query") {
    assert(canon(
        "http://a.com/p?utm_a=1&id=2",
        "http://a.com/p?id=2&utm_a=1",
        "http://a.com/p?id=2&gclid=x&id2=3",
        "http://a.com/p?utm_a=1&utm_b=2&id=3",
        "http://a.com/p?utm_a=1&utm_b=2",
        "http://a.com/p?fbclid=zzz")
      == Seq(
        "http://a.com/p?id=2",
        "http://a.com/p?id=2",
        "http://a.com/p?id=2&id2=3",
        "http://a.com/p?id=3",
        "http://a.com/p",
        "http://a.com/p"))
  }

  test("trailing slashes: root, directory, before a query") {
    assert(canon("http://a.com/", "http://a.com/p/", "http://a.com/p/?id=1",
        "http://a.com/?utm_a=1")
      == Seq("http://a.com", "http://a.com/p", "http://a.com/p?id=1",
        "http://a.com"))
  }

  test("www strips only as a host prefix; fragments always strip") {
    assert(canon("http://www.a.com/p#s", "http://wwwx.a.com/p",
        "http://a.com/www.b")
      == Seq("http://a.com/p", "http://wwwx.a.com/p", "http://a.com/www.b"))
  }

  test("registrable domain: two labels, multi-label suffixes, subdomains") {
    assert(dom("a.com", "x.a.com", "x.news.example.com", "site.co.uk",
        "deep.site.co.uk", "b.ac.uk", "localhost")
      == Seq("a.com", "a.com", "example.com", "site.co.uk", "site.co.uk",
        "b.ac.uk", ""))
  }

  test("the PSL snapshot resolves private hosting and three-label " +
      "suffixes: user sites ARE registrable domains, longest suffix wins") {
    assert(dom(
        // private-section hosting: each user site is its own domain
        "alice.github.io", "www2.alice.github.io", "team.netlify.app",
        "blog.blogspot.com",
        // three-label suffix beats the two-label ccTLD rule
        "bob.blogspot.com.au", "x.bob.blogspot.com.au",
        // two-label ccTLD entries beyond the old 7-entry set
        "shop.com.sg", "uni.edu.pl", "dept.gob.mx", "a.co.ke",
        // a host that IS a public suffix has NO registrable domain
        // (r17 — true PSL: registration happens under a suffix,
        // never at it; matches the wildcard twin edu.ck below)
        "github.io", "blogspot.com.au",
        // unlisted two-label stays the default rule
        "x.unlisted.zz")
      == Seq("alice.github.io", "alice.github.io", "team.netlify.app",
        "blog.blogspot.com",
        "bob.blogspot.com.au", "bob.blogspot.com.au",
        "shop.com.sg", "uni.edu.pl", "dept.gob.mx", "a.co.ke",
        "", "",
        "unlisted.zz"))
  }

  test("PSL wildcard and exception rules: *.ck registers at the third " +
      "label, !www.ck carves the host back out, exception beats wildcard") {
    assert(dom(
        // wildcard *.ck: edu.ck is a public suffix — any 2-label
        // suffix under a wildcard TLD is
        "a.edu.ck", "x.a.edu.ck", "a.anything.ck",
        // a 2-label host under a wildcard TLD IS a public suffix —
        // no registrable domain
        "edu.ck",
        // the !www.ck exception: the host itself is registrable,
        // beating the wildcard that would have demanded three labels
        "www.ck", "x.www.ck", "deep.x.www.ck",
        // wildcard-vs-listed precedence: np carries BOTH the *.np
        // wildcard and listed entries (com.np) — same outcome either
        // way (registration at the third label), and an UNLISTED
        // second level under np still registers at the third label
        // because the wildcard covers it
        "a.com.np", "a.weird.np")
      == Seq(
        "a.edu.ck", "a.edu.ck", "a.anything.ck",
        "",
        "www.ck", "www.ck", "www.ck",
        "a.com.np", "a.weird.np"))
  }

  test("s3.amazonaws.com is a THREE-label suffix: website buckets are " +
      "registrable domains, not rolled up to amazonaws.com") {
    assert(dom("bucket.s3.amazonaws.com", "x.bucket.s3.amazonaws.com",
        "s3.amazonaws.com")
      == Seq("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com",
        // the bare suffix itself has NO registrable domain (r17 —
        // same rule as the github.io / edu.ck pins)
        ""))
  }

  test("idempotence: canonicalizing a canonical url is a no-op") {
    val raw = Seq(
      "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&id=3#frag",
      "https://Site.co.uk:443/Dir0/Page5/?gclid=1",
      "http://a.com/p?id=2&utm_a=1")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("rollup counts docs, hosts, and collapsed canonical urls per domain") {
    val rows = Seq(
      (1L, "http://WWW.a.com/p/", 10L),
      (2L, "http://a.com/p?utm_a=1", 20L), // same canonical as doc 1
      (3L, "http://x.a.com/q", 30L),
      (4L, "https://b.co.uk/r", 40L))
      .toDF("doc_id", "u", "n_chars")
    val c = Url.withCanonical(rows, col("u"))
    val r = Url.domainRollup(c, col("n_chars"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (d, a, b, cc, e) => d -> ((a, b, cc, e)) }.toMap
    assert(r("a.com") == ((3L, 2L, 2L, 60L)))
    assert(r("b.co.uk") == ((1L, 1L, 1L, 40L)))
  }
}

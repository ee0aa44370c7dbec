package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** scrubText on strings that actually contain URLs/emails (the harness
  * corpus has none — q_text_scrub's oracle covers only the identity path). */
class LlmOpsScrubSuite extends SparkSpec {

  test("scrubText masks URLs and emails, leaves clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "visit https://example.com/a_b-c/d.html for details"),
      (2L, "mail bob.smith_1@corp-mail.example.org today"),
      (3L, "both http://x.io/p and alice@x.io here"),
      (4L, "nothing to scrub at all"),
      // %+- in the local part must mask FULLY — no 'a+'/'bob-' PII residue
      (5L, "plus-tagged a+tag@x.io and hyphenated bob-smith@x.io and pct b%c@x.io"),
      (6L, "server 192.168.1.200 answered from 10.0.0.1 fast"),
      (7L, "call 555-123-4567 or +1 555.987.6543 soon"),
      // bare numeric prose must NOT be over-masked by the phone pattern
      (8L, "sequence 12 34 567 stays and version 1.2.3 stays"))
    val got = rows.toDF("id", "text")
      .select(col("id"), LlmOps.scrubText(col("text")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "visit <URL> for details")
    assert(got(2L) === "mail <EMAIL> today")
    assert(got(3L) === "both <URL> and <EMAIL> here")
    assert(got(4L) === "nothing to scrub at all")
    assert(got(5L) === "plus-tagged <EMAIL> and hyphenated <EMAIL> and pct <EMAIL>")
    assert(got(6L) === "server <IP> answered from <IP> fast")
    assert(got(7L) === "call <PHONE> or +1 <PHONE> soon")
    assert(got(8L) === "sequence 12 34 567 stays and version 1.2.3 stays")
  }

  test("canonicalizeUrl: each normalization rule on a crafted case") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, default port stripped, utm dropped,
      // params sorted, fragment dropped, path case KEPT
      "HTTP://WWW.Ex.COM:80/A/B.html?utm_source=x&b=2&a=1#f"
        -> "http://www.ex.com/A/B.html?a=1&b=2",
      "https://H.com:443/" -> "https://h.com/",   // https default port
      "http://h.com:8080/p" -> "http://h.com:8080/p", // non-default KEPT
      "https://h.com" -> "https://h.com/",        // empty path -> "/"
      "http://h.com/#only" -> "http://h.com/",    // fragment-only tail
      // duplicate keys both kept, sorted; tracking param dropped
      "https://h.com/p?a=2&a=1&utm_medium=m" -> "https://h.com/p?a=1&a=2",
      // ADVICE r13: tracking-param strip is case-INsensitive — a cased
      // tracker must not escape dedup (value case untouched elsewhere)
      "https://h.com/p?UTM_Source=X&b=2" -> "https://h.com/p?b=2",
      "https://h.com/Deep/Path/?x=1" -> "https://h.com/Deep/Path/?x=1")
    val got = cases.map(_._1).toDF("url")
      .select(LlmOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2),
      "canonical form drifted from the documented rules")
  }

  test("resolveLinks: every RFC 3986 reference shape on a crafted case") {
    import spark.implicits._
    val base = "HTTP://Ex.COM:80/a/b/page.html?q=1#top" // canonicalizes first
    val cases = Seq(
      "https://other.io/x" -> "https://other.io/x",        // absolute passes
      "//cdn.ex.com/lib.js" -> "http://cdn.ex.com/lib.js", // protocol-relative
      "/rooted/p" -> "http://ex.com/rooted/p",             // path-absolute
      "img/pic.png" -> "http://ex.com/a/b/img/pic.png",    // relative merge
      "?page=2" -> "http://ex.com/a/b/page.html?page=2",   // query replace
      "../up.html" -> "http://ex.com/a/b/../up.html",      // dots KEPT verbatim
      "#sec" -> null,                                      // same-document
      "" -> null,                                          // empty
      "mailto:x@ex.com" -> null,                           // non-http scheme
      "javascript:void(0)" -> null,
      // ADVICE r15: whitespace-padded attribute values are trimmed before
      // the branch cascade — a padded absolute href is absolute, not a
      // relative path merged into garbage; padded-to-empty is dropped
      " https://pad.ex.com/a" -> "https://pad.ex.com/a",
      "\n\t/rooted/q " -> "http://ex.com/rooted/q",
      "   " -> null)
    val got = LlmOps.resolveLinks(
        cases.map(_._1).toDF("href")
          .withColumn("base", org.apache.spark.sql.functions.lit(base)),
        "base", "href")
      .select(col("resolved"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got === cases.map(_._2),
      "reference resolution drifted from the documented subset")
  }

  test("PublicSuffixSnapshot: rules beyond the embedded subset group correctly; divergence pinned") {
    import spark.implicits._
    val hosts = Seq("shop.x.co.il", "cdn.y.vercel.app", "a.b.z.com.eg",
      "www.w.co.uk", "plain.example.com", "intranet-host")
    val df = hosts.toDF("host")
    val table = LlmOps.registrableDomainJoined(df, "host",
        LlmOps.PublicSuffixSnapshot.toDF("suffix"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // snapshot-only rules: the table path groups one level deeper
    assert(table("shop.x.co.il") === "x.co.il")
    assert(table("cdn.y.vercel.app") === "y.vercel.app")
    assert(table("a.b.z.com.eg") === "z.com.eg")
    // embedded rules and non-rules agree with the column form everywhere
    assert(table("www.w.co.uk") === "w.co.uk")
    assert(table("plain.example.com") === "example.com")
    assert(table("intranet-host") === "intranet-host")
    // the DOCUMENTED divergence: the embedded column form, blind to
    // co.il, falls back to last-two and over-groups (never splits one
    // registrant — the conservative miss its scaladoc promises)
    val column = df.select(col("host"),
        LlmOps.registrableDomain(col("host")).as("domain"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(column("shop.x.co.il") === "co.il")
    assert(column("www.w.co.uk") === "w.co.uk")
    // every snapshot rule is a two-label rule (the join-key contract)
    assert(LlmOps.PublicSuffixSnapshot.forall(_.count(_ == '.') == 1))
    assert(LlmOps.PublicSuffixSnapshot.distinct.size ===
      LlmOps.PublicSuffixSnapshot.size, "duplicate snapshot rules")
  }

  test("collapseDotSegments: RFC 3986 §5.2.4 vectors; dotted and plain paths share one canon") {
    import spark.implicits._
    val cases = Seq(
      "http://h.com/a/b/../c.html" -> "http://h.com/a/c.html",
      "http://h.com/a/./b" -> "http://h.com/a/b",
      // the RFC's own worked merge example (§5.4.1 /a/b/c/./../../g)
      "http://h.com/a/b/c/./../../g" -> "http://h.com/a/g",
      "http://h.com/../g" -> "http://h.com/g",       // never pops past root
      "http://h.com/a/.." -> "http://h.com/",        // trailing .. -> slash
      "http://h.com/a/b/." -> "http://h.com/a/b/",   // trailing . -> slash
      // empty segments from '//' are segments, kept verbatim (the
      // canonicalizeUrl conservatism); '..' pops the 'b' that follows
      "http://h.com/a//b/../c" -> "http://h.com/a//c",
      "http://h.com:8080/x/../y?q=../z" -> "http://h.com:8080/y?q=../z",
      "http://h.com/plain/path" -> "http://h.com/plain/path",
      "http://h.com" -> "http://h.com")               // no path at all
    val got = cases.map(_._1).toDF("u")
      .select(LlmOps.collapseDotSegments(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2),
      "remove_dot_segments drifted from the documented fold rule")
    // the motivating frontier property: a dotted and a plain spelling of
    // one resource resolve+collapse+canonicalize to ONE enqueue key
    val keys = Seq("a/b/../c.html", "a/c.html").toDF("href")
      .withColumn("base",
        org.apache.spark.sql.functions.lit("http://ex.com/d/page.html"))
    val canons = LlmOps.resolveLinks(keys, "base", "href")
      .withColumn("collapsed", LlmOps.collapseDotSegments(col("resolved")))
      .select(LlmOps.canonicalizeUrl(col("collapsed")).as("canon"))
      .collect().map(_.getString(0)).toSeq
    assert(canons.distinct.size === 1 &&
      canons.head === "http://ex.com/d/a/c.html",
      s"dotted and plain spellings must share one canon: $canons")
  }

  test("stripHtml: blocks out whole, tags become spaces, entities decode exactly once") {
    import spark.implicits._
    val h = "<p>a</p><p>b</p><script>var s='<p>hi</p>';</script> &amp;lt;x&amp;gt; &amp; y"
    val got = Seq(h).toDF("h")
      .select(LlmOps.stripHtml(col("h")).as("c")).head().getString(0)
    // the script BLOCK vanishes (its text is not content), tags separate
    // words, and '&amp;lt;' decodes to the literal '&lt;' — never twice
    assert(got === "a b &lt;x&gt; & y", got)
    // ADVICE r13: real crawl HTML is cased and line-broken — an
    // UPPERCASE multi-line script/style block and a multi-line comment
    // must vanish WHOLE, not leak their contents past tag-stripping
    val h2 = "<P>keep</P><SCRIPT>\nvar leak=1;\n</SCRIPT><Style>p{x:1}\n" +
      "q{y:2}</Style><!-- multi\nline -->tail"
    val got2 = Seq(h2).toDF("h")
      .select(LlmOps.stripHtml(col("h")).as("c")).head().getString(0)
    assert(got2 === "keep tail", got2)
  }

  test("registrableDomain: multi-label suffixes, shared hosting, bare hosts, deep subdomains") {
    import spark.implicits._
    val cases = Seq(
      // multi-label ccSLD: last THREE labels, regardless of subdomain depth
      "www.example.co.uk" -> "example.co.uk",
      "a.blog.example.co.uk" -> "example.co.uk",
      "example.co.uk" -> "example.co.uk",
      "sub.api.example.ac.uk" -> "example.ac.uk",
      // shared-hosting suffix: each user is a separate registrant
      "x.github.io" -> "x.github.io",
      "deep.x.github.io" -> "x.github.io",
      // plain TLD: last TWO labels
      "www.example.com" -> "example.com",
      "news.cdn.example.org" -> "example.org",
      "example.com" -> "example.com",
      // bare single-label hosts come back whole
      "intranet-host" -> "intranet-host",
      "localhost" -> "localhost",
      // the suffix itself as a host (no registrant label) is returned
      // as-is by the n<=2 branch — co.uk is not anyone's domain
      "co.uk" -> "co.uk",
      // unlisted multi-label suffix falls back to last-two (documented
      // conservative over-grouping: one group per unlisted ccSLD, never
      // one registrant split in two)
      "shop.example.co.xx" -> "co.xx")
    val got = cases.map(_._1).toDF("host")
      .select(LlmOps.registrableDomain(col("host")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2),
      "registrable-domain extraction drifted from the documented rules")
  }

  test("registrableDomainJoined: the PSL-table form equals the embedded-constant form") {
    import spark.implicits._
    // the production overload (suffixes as DATA — a full PSL snapshot
    // rides a tiny broadcast table) must agree row-for-row with the
    // column form on the embedded subset, over the fixture's hosts plus
    // the documented edge shapes
    val hosts = LlmOps.queries("q_text_domain")(spark, "/root/testdata/sf0.001")
      .select("host").distinct()
      .unionByName(Seq("intranet-host", "co.uk", "deep.x.github.io",
        "shop.example.co.xx").toDF("host"))
    val both = LlmOps.registrableDomainJoined(
        hosts, "host", LlmOps.MultiLabelSuffixes.toDF("suffix"), out = "d_tab")
      .withColumn("d_col", LlmOps.registrableDomain(col("host")))
    assert(both.filter(col("d_tab") =!= col("d_col")).count() === 0L,
      "table-driven registrable domain diverged from the embedded-constant form")
    assert(both.count() === hosts.count(), "the suffix join fanned out or dropped hosts")
  }

  test("anchor extraction: nested markup kept and stripped; relative hrefs dropped") {
    val anchors = LlmOps.queries("q_text_anchors")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("canon"), r.getAs[String]("anchor")))
    // shape 1's second anchor is <a ...><b>two</b> links</a> — the inner
    // markup must be stripped to spaces, not skip the whole anchor
    assert(anchors.exists(_._2 == "two links"),
      "nested-markup anchor missing or its inner tags survived")
    assert(anchors.forall(a => !a._2.contains("<")),
      "anchor text leaked markup")
    // shape 2's <a href="/rel/p"> is outside the scheme://host contract —
    // it must be dropped by the absolute filter, not canonicalized into garbage
    val links = LlmOps.queries("q_text_extract_links")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[String]("link"))
    assert(links.nonEmpty && links.forall(_.matches("(?i)^https?://.*")),
      "a relative href escaped the frontier's absolute-URL filter")
    assert(anchors.forall(_._1.contains("://")), "a relative canon reached the anchors gate")
  }

  test("gopherRules: each rule trips on its crafted violator, clean doc keeps") {
    import spark.implicits._
    val docs = Seq(
      // clean: enough tokens, mean len in range, no symbols, alphabetic,
      // both stopwords
      (1L, "the quick brown fox jumps over a lazy dog near the riverbank today"),
      (2L, "the dog"),                                       // too few tokens
      (3L, "the aa bb cc dd ee ff gg hh ii jj kk ll mm a"),  // mean len < 3
      (4L, "the #tag #tag #tag #tag words words words words words words a more"), // symbols > 0.1
      (5L, "the 11 22 33 44 55 66 77 88 99 00 12 13 a"),     // alpha frac < 0.8
      (6L, "quick brown fox jumps over lazy dog near riverbank today list items"), // no stopwords
      // ONE stopword repeated twice, no second distinct one — passes
      // under the paper's OCCURRENCE counting (ADVICE r14; a
      // distinct-count regression would fail this doc's keep)
      (7L, "the quick brown fox jumps over the lazy dog near riverbank today"))
      .toDF("doc_id", "text")
    val got = LlmOps.gopherRules(docs, minTokens = 10, maxTokens = 1000,
        minMeanLen = 3.0, maxMeanLen = 10.0, maxSymbolRatio = 0.1,
        minAlphaFrac = 0.8, stopwords = Seq("the", "a"), minStopwords = 2)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("r_tokens"), r.getAs[Long]("r_word_len"),
          r.getAs[Long]("r_symbols"), r.getAs[Long]("r_alpha"),
          r.getAs[Long]("r_stopwords"), r.getAs[Long]("keep"))).toMap
    assert(got(1L) === ((1L, 1L, 1L, 1L, 1L, 1L)), s"clean doc: ${got(1L)}")
    assert(got(2L)._1 === 0L && got(2L)._6 === 0L, s"short doc: ${got(2L)}")
    assert(got(3L)._2 === 0L && got(3L)._6 === 0L, s"short words: ${got(3L)}")
    assert(got(4L)._3 === 0L && got(4L)._6 === 0L, s"symbols: ${got(4L)}")
    assert(got(5L)._4 === 0L && got(5L)._6 === 0L, s"numeric: ${got(5L)}")
    assert(got(6L)._5 === 0L && got(6L)._6 === 0L, s"no stopwords: ${got(6L)}")
    assert(got(7L)._5 === 1L && got(7L)._6 === 1L,
      s"occurrence counting: one stopword twice must pass: ${got(7L)}")
    // the corpus gate genuinely splits: both keep classes present
    val corpus = LlmOps.queries("q_text_gopher")(spark, "/root/testdata/sf0.001")
      .select("keep").collect().map(_.getLong(0))
    assert(corpus.contains(1L) && corpus.contains(0L),
      "gate thresholds must split the corpus")
  }

  test("stratifiedSample: nested, stable, every stratum represented, caps exact") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    def ids(pct: Int) = LlmOps.stratifiedSample(docs,
      Seq("lang", "source"), pct).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s10 = ids(10)
    // stable: the seeded order makes re-sampling a fixed point
    assert(ids(10) === s10)
    // nested: pct=20 contains pct=10 by construction
    assert(s10.subsetOf(ids(20)), "larger sample must nest the smaller")
    // every stratum keeps ceil(n*pct/100) >= 1 docs — exact, not expected
    val got = LlmOps.stratifiedSample(docs, Seq("lang", "source"), 10)
      .groupBy("lang", "source").count()
      .join(docs.groupBy("lang", "source").count()
        .withColumnRenamed("count", "n"), Seq("lang", "source"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (k, n) = (r.getAs[Long]("count"), r.getAs[Long]("n"))
      assert(k === (n * 10 + 99) / 100, s"stratum ${r.mkString(",")}: kept $k of $n")
    }
    // all strata of the corpus appear
    assert(got.length === docs.select("lang", "source").distinct().count())
  }

  test("urlHost: scheme/port/path/query stripped, case folded") {
    import spark.implicits._
    val cases = Seq(
      "HTTP://WWW.Example.CO.UK:80/A/b?x=1#f" -> "www.example.co.uk",
      "https://x.GitHub.io/repo/" -> "x.github.io",
      "http://intranet-host/path" -> "intranet-host",
      "https://h.com" -> "h.com")
    val got = cases.map(_._1).toDF("url")
      .select(LlmOps.urlHost(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }
}

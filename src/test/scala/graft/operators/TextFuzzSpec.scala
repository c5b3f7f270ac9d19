package graft.operators

import java.text.Normalizer

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzzing for the newest text operators (H8 normalize, H9
  * PII redaction, H10 URL canonicalization): 1000 adversarial
  * generated strings per family, pushed through the Spark expressions
  * in ONE job and compared row-by-row against independent driver-side
  * reference implementations (java.text.Normalizer + jdk regex). The
  * DeterministicKeysSpec discipline — seeded, reproducible, one
  * DataFrame per property, not one Spark job per case.
  *
  * What this hardens: the native UnicodeNormalize codegen expression
  * against ICU edge cases (combining marks, compatibility forms,
  * surrogates, Hangul jamo), the staged redaction order (emails
  * before IPs before phones), and the multi-stage URL regex chain
  * (separator cleanup, port/www/fragment stripping) — the operators
  * shipped last round with only example-based tests.
  */
class TextFuzzSpec extends SparkSpec {
  import sqlImplicits._

  private val N = 1000

  private def sample[A](g: Gen[Seq[A]], seed: Long): Seq[A] =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  // ---------------------------------------------------------------- H8

  /** Adversarial unicode: combining sequences vs precomposed,
    * compatibility characters (ligatures, full-width, circled),
    * whitespace runs incl. non-\s unicode spaces, controls, emoji
    * (surrogate pairs), Hangul jamo.
    */
  private val genUnicode: Gen[String] = {
    val atoms = Gen.oneOf(
      "é", "é", "Å", "Å", "ﬁ", "Ｈｉ",
      "①", "½", "ẛ̣", "각", "각",
      " ", "  ", "\t", "\n", "\r\n", " ", " ", "",
      "🎉", "plain", "x", "İ", "ß", "")
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, atoms).map(_.mkString))
  }

  /** Driver reference for normalizeText: Normalizer + jdk \s+ collapse
    * + space-only trim. The trim mirror must strip ' ' at the PHYSICAL
    * string ends — a `" +$"` regex is wrong (jdk `$` also matches
    * before a final line terminator, so "x  " would lose its
    * interior space; Spark's trim keeps it), and String.trim is wrong
    * too (it also strips controls).
    */
  private def refNormalize(s: String, form: String): String = {
    val c = Normalizer.normalize(s, Normalizer.Form.valueOf(form))
      .replaceAll("\\s+", " ")
    var i = 0
    var j = c.length
    while (i < j && c.charAt(i) == ' ') i += 1
    while (j > i && c.charAt(j - 1) == ' ') j -= 1
    c.substring(i, j)
  }

  test(s"H8 normalizeText matches java.text.Normalizer on $N fuzzed strings") {
    val cases = sample(Gen.listOfN(N, genUnicode), 0xf00d1L)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    for (form <- Seq("NFC", "NFKC")) {
      val got = df.select($"i", TextAnalysis.normalizeText($"s", form).as("n"))
        .as[(Int, String)].collect().toMap
      cases.zipWithIndex.foreach { case (s, i) =>
        val want = refNormalize(s, form)
        assert(got(i) == want,
          s"$form mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}: " +
            s"got ${got(i)} want $want")
      }
      // idempotence: normalizing a normalized string is the identity
      val twice = df.select($"i",
        TextAnalysis.normalizeText(
          TextAnalysis.normalizeText($"s", form), form).as("n"))
        .as[(Int, String)].collect().toMap
      assert(twice == got, s"$form normalizeText is not idempotent")
    }
  }

  // ---------------------------------------------------------------- H9

  /** PII-shaped fragments: valid and near-miss emails/phones/IPs,
    * adjacent digit runs, overlapping candidates (an email whose
    * domain looks like an IP, digits touching word chars to stress
    * \b), mixed with plain words.
    */
  private val genPii: Gen[String] = {
    val atoms = Gen.oneOf(
      "alice@example.com", "b.ob+tag@sub.domain.org", "x@y.zz", "no@tld",
      "@missing.com", "user@@double.com", "a@1.2.3.4.com",
      "555-123-4567", "555.123.4567", "555 123 4567", "55-123-4567",
      "5551234567", "555-1234-567", "1.2.3.4", "999.999.999.999",
      "1.2.3.4.5", "10.0.0.1:8080", "v1.2.3.4", "1.2.3.4w",
      "word", "a", "42", ".", "-", " ", "  ", "\n", "(", ")")
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, atoms).map(_.mkString(" ")))
  }

  /** Driver reference mirroring redactPii's staged order exactly:
    * emails, then IPv4, then phones.
    */
  private def refRedact(s: String): String =
    s.replaceAll(TextAnalysis.emailRe, "<EMAIL>")
      .replaceAll(TextAnalysis.ipv4Re, "<IP>")
      .replaceAll(TextAnalysis.phoneRe, "<PHONE>")

  test(s"H9 redactPii matches the staged jdk-regex reference on $N fuzzed strings") {
    val cases = sample(Gen.listOfN(N, genPii), 0xf00d2L)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val got = df.select($"i", TextAnalysis.redactPii($"s").as("r"))
      .as[(Int, String)].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == refRedact(s), s"mismatch on <$s>: got <${got(i)}>")
    }
    // no raw PII survives its own pattern after redaction
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(!TextAnalysis.emailRe.r.findFirstIn(got(i)).isDefined ||
        refRedact(s).contains("@"),
        s"email pattern survived redaction in <${got(i)}>")
    }
  }

  // --------------------------------------------------------------- H15

  test(s"H15 cdcChunks partition exactly on $N fuzzed unicode strings") {
    // chunk boundaries may fall inside multi-char graphemes or next to
    // surrogates — the partition property must hold for arbitrary
    // content, not just word-ish text
    val cases = sample(Gen.listOfN(N, genUnicode), 0xf00d4L)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val got = df.select($"i",
        array_join(TextAnalysis.cdcChunks($"s", 16, 4, 64), "").as("re"),
        size(TextAnalysis.cdcChunks($"s", 16, 4, 64)).as("n"))
      .as[(Int, String, Int)].collect().map(r => r._1 -> r).toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(got(i)._2 == s,
        s"reassembly broke on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      assert(got(i)._3 >= 1)
    }
  }

  test(s"F10 dropFrequentLines rebuild is the identity on $N fuzzed " +
      "strings when nothing crosses the threshold") {
    // split → filter → ordered concat must reproduce the original
    // text byte-for-byte whenever no line is corpus-frequent (every
    // doc unique, minDocs above the corpus size): the property that
    // catches separator/rebuild bugs on arbitrary unicode — including
    // surrogates, empty lines from "\n\n" runs, and trailing "\n"
    val cases = sample(Gen.listOfN(N, genUnicode), 0x11735L)
      .zipWithIndex.map { case (s, i) => (i.toLong, s"u$i $s") } // unique
    val out = Dedup.dropFrequentLines(cases.toDF("doc_id", "text"),
        "doc_id", "text", minDocs = N + 1L)
      .select($"doc_id", $"clean_text")
      .as[(Long, String)].collect().toMap
    cases.foreach { case (i, s) =>
      assert(out(i) == s,
        s"rebuild broke on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  // --------------------------------------------------------------- H10

  /** URL soup: scheme case, userinfo, www/ports, tracking params at
    * every position, separator runs, fragments containing ?/&, no
    * scheme at all. Hosts stay ASCII (lower() on the authority is
    * UTF8String-lowercase in Spark vs locale-lowercase on the driver;
    * the path — which is NOT lowercased — carries the unicode).
    */
  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http://", "HTTP://", "https://", "HTTPS://",
      "ftp://", "weird+s.cheme://", "")
    www <- Gen.oneOf("", "www.", "WWW.", "wwww.")
    host <- Gen.oneOf("example.com", "Sub.Host.ORG", "a-b.cd", "localhost")
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":0443")
    path <- Gen.oneOf("", "/", "/Path/TO/page", "/café/①", "/a b")
    q <- Gen.oneOf("", "?", "?x=1", "?utm_source=a", "?utm_source=a&x=1",
      "?x=1&utm_campaign=b", "?fbclid=f&gclid=g", "?utm_a=1&utm_b=2&y=3",
      "?x=1&&y=2", "?&x=1", "?utm_source=", "?x=utm_source=nested")
    frag <- Gen.oneOf("", "#", "#frag", "#a?b&c", "#utm_source=f")
  } yield s"$scheme$www$host$port$path$q$frag"

  /** Driver reference mirroring canonicalizeUrl stage-for-stage. */
  private def refCanonUrl(u: String): String = {
    val noFrag = u.replaceAll("#.*", "")
    val m = java.util.regex.Pattern
      .compile("^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)").matcher(noFrag)
    val pre = if (m.find()) m.group(1) else ""
    val preCanon = pre.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("://www\\.", "://").replaceAll(":(80|443)$", "")
    val rest = noFrag.substring(pre.length)
    val restCanon = rest.replaceAll(TextAnalysis.urlTrackingRe, "")
      .replaceAll("\\?&+", "?").replaceAll("&&+", "&").replaceAll("[?&]+$", "")
    preCanon + restCanon
  }

  test(s"H10 canonicalizeUrl matches the staged reference on $N fuzzed URLs") {
    val cases = sample(Gen.listOfN(N, genUrl), 0xf00d3L)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val got = df.select($"i", TextAnalysis.canonicalizeUrl($"s").as("c"))
      .as[(Int, String)].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == refCanonUrl(s), s"mismatch on <$s>: got <${got(i)}>")
    }
    // canonicalization is idempotent: a canonical URL maps to itself
    val twice = df.select($"i",
      TextAnalysis.canonicalizeUrl(TextAnalysis.canonicalizeUrl($"s")).as("c"))
      .as[(Int, String)].collect().toMap
    assert(twice == got, "canonicalizeUrl is not idempotent")
  }

  // --------------------------------------------------------------- H16

  /** Adversarial rule-battery input: stopwords, symbol runs, every
    * bullet/ellipsis marker, space and newline runs, tabs inside
    * words, digits, astral code points, boundary-length words — the
    * atoms target each rule's edge (trim behavior, non-overlapping
    * "..." counting, code-point word lengths, padded stopword match).
    */
  private val genGopherDoc: Gen[String] = {
    val atoms = Gen.oneOf(
      "the", "be", "to", "of", "and", "that", "have", "with",
      "word", "xyz", "a", "ab", "supercalifragilistic", "12", "99",
      "#", "###", "...", "....", ".......", "…", "……", "ends...",
      "trails… ", "- item", "* item", "• item", "-dash", "no",
      " ", "  ", "\n", "\n\n", " \n ", "\t", "tab\tword",
      "𝄞", "😀", "𝄞clef", "é", "THE", "The", "")
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, atoms).map(_.mkString(" ")))
  }

  test(s"H16 GopherPass kernel == column battery on $N fuzzed docs") {
    val cases = sample(Gen.listOfN(N, genGopherDoc), 0x60f3aL)
    val docs = cases.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    for ((mw, ms) <- Seq((3L, 1L), (50L, 2L), (1L, 0L))) {
      val colPass = TextAnalysis.gopherRules(docs, "doc_id", "text",
          minWords = mw)
        .select($"doc_id",
          ($"r_words" && $"r_word_len" && $"r_symbol" && $"r_bullet" &&
            $"r_ellipsis" && $"r_alpha" && $"n_stop" >= ms).as("p"))
      val kernel = docs.select($"doc_id",
        TextAnalysis.gopherPass($"text", minWords = mw, minStop = ms)
          .as("k"))
      val diff = colPass.join(kernel, "doc_id")
        .where($"p" =!= $"k").collect()
      assert(diff.isEmpty,
        s"kernel != battery at minWords=$mw minStop=$ms on " +
          diff.take(3).map(r => cases(r.getLong(0).toInt)).mkString(" | "))
    }
  }

  // --------------------------------------------------------------- H19

  /** Independent scanner reference for htmlToText (well-formed blocks —
    * the generator below only emits closed comments/scripts/styles;
    * the unclosed-edge semantics are hand-pinned in TextAnalysisSpec).
    */
  private def refHtmlToText(h: String): String = {
    val out = new StringBuilder
    val lower = h.toLowerCase
    val n = h.length
    def word(c: Char) = c.isLetterOrDigit || c == '_'
    var i = 0
    while (i < n) {
      if (h.charAt(i) == '<') {
        if (lower.startsWith("<!--", i)) {
          out.append(' '); i = lower.indexOf("-->", i + 4) + 3
        } else if (lower.startsWith("<script", i) &&
            (i + 7 >= n || !word(lower.charAt(i + 7)))) {
          val close = lower.indexOf("</script", lower.indexOf('>', i))
          out.append(' '); i = lower.indexOf('>', close) + 1
        } else if (lower.startsWith("<style", i) &&
            (i + 6 >= n || !word(lower.charAt(i + 6)))) {
          val close = lower.indexOf("</style", lower.indexOf('>', i))
          out.append(' '); i = lower.indexOf('>', close) + 1
        } else {
          val e = lower.indexOf('>', i)
          val tag = lower.substring(i + 1, e)
          val isBlock = tag.matches(
            "br\\s*/?|/(?:p|div|li|h[1-6]|tr|ul|ol|table|title)\\s*")
          out.append(if (isBlock) '\n' else ' ')
          i = e + 1
        }
      } else { out.append(h.charAt(i)); i += 1 }
    }
    var t = out.toString
    Seq("&nbsp;" -> " ", "&#160;" -> " ", "&lt;" -> "<", "&#60;" -> "<",
      "&gt;" -> ">", "&#62;" -> ">", "&quot;" -> "\"", "&#34;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'")
      .foreach { case (f, r) => t = t.replace(f, r) }
    // the two ampersand spellings in one left-to-right pass (r12) —
    // mirrors the operator; "&amp;#38;" stays the literal "&#38;"
    t = t.replaceAll("&(?:amp|#38);", "&")
    t.replaceAll("[ \\t\\x0B\\f\\r]+", " ")
      .split("\n", -1).map { l =>
        var a = 0; var b = l.length
        while (a < b && l.charAt(a) == ' ') a += 1
        while (b > a && l.charAt(b - 1) == ' ') b -= 1
        l.substring(a, b)
      }.filter(_.nonEmpty).mkString("\n")
  }

  private val genHtml: Gen[String] = {
    val word = Gen.oneOf("alpha", "beta", "café", "naïve", "🎉", "x1",
      "Head", "&amp;", "&lt;tag&gt;", "&nbsp;", "&copy;", "O'Neil",
      "&amp;#38;", "&#38;amp;", "&amp;lt;",
      "\"q\"", "", "  ", "\t")
    val textG = Gen.chooseNum(0, 6)
      .flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val node: Gen[String] = Gen.frequency(
      4 -> textG,
      2 -> textG.map(t => s"<p>$t</p>"),
      1 -> textG.map(t => s"<li class='i'>$t</li>"),
      1 -> textG.map(t => s"<b>$t</b>"),
      1 -> textG.map(t => s"<DIV Class='c'>$t</div>"),
      1 -> textG.map(t => s"<!-- $t -->"),
      1 -> textG.map(t =>
        s"<script>var a = 1; if (1<2) { b('$t'); }</script>"),
      1 -> textG.map(t => s"<style>p > a { content: '$t' }</style>"),
      1 -> Gen.oneOf("<br>", "<br/>", "<BR >"),
      1 -> Gen.const("<h2>T</h2>"))
    Gen.chooseNum(0, 10).flatMap(k => Gen.listOfN(k, node).map(_.mkString))
  }

  test(s"H19 htmlToText matches an independent scanner reference on " +
      s"$N fuzzed well-formed pages") {
    import org.apache.spark.sql.functions._
    val cases = sample(Gen.listOfN(N, genHtml), 0x417b1L)
    val df = cases.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
    val got = df.select($"i", TextAnalysis.htmlToText($"h").as("t"))
      .as[(Int, String)].collect().sortBy(_._1)
    got.foreach { case (i, t) =>
      val want = refHtmlToText(cases(i))
      assert(t == want,
        s"case $i: '$t' != '$want' input='${cases(i).take(200)}'")
    }
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling,
  * MinHash/SimHash signatures. Where possible these are compositions of
  * native Spark expressions (codegen'd, no UDF boxing); hash-heavy kernels
  * are UDFs implementing an exact, engine-independent spec so an external
  * oracle (DuckDB) can reproduce them bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens. Spec: the non-empty pieces of
    * split(trim(text), '\s+'). The empty-filter matters only for text whose
    * FIRST character is non-space whitespace (trim is ASCII-space-only, so
    * the split would otherwise emit a phantom leading "" — caught by
    * TextLawsSpec); the DuckDB oracle mirror len(regexp_split_to_array(
    * trim(text),'\s+')) is identical on whitespace-clean corpus text. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Accent folding (NFD → drop combining marks → NFC): "café" → "cafe".
    * Native codegen expression ([[graft.functions.expr.FoldAccents]]);
    * matches DuckDB/PostgreSQL `strip_accents` on Latin input, so the
    * oracle replays it exactly. ASCII rows return the input with zero
    * allocation. */
  def foldAccents(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.functions.expr.FoldAccents(colExpr(c)))
  }

  /** NFKC compatibility normalization (ﬁ → fi, ² → 2, full-width → ASCII)
    * — the standard BPE pre-tokenization canonicalization. Native codegen
    * expression; already-normalized strings pass through untouched. */
  def nfkc(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, expression => colExpr}
    exprCol(graft.functions.expr.Nfkc(colExpr(c)))
  }

  /** The full dedup-key / pre-tokenization canonicalization: accent-fold,
    * then [[normalizeText]] (lowercase, collapse whitespace, trim).
    * Deterministic, codegen end-to-end, and exactly replayable as
    * `trim(regexp_replace(lower(strip_accents(x)), '\s+', ' '))` by the
    * DuckDB oracle. Canonicalize BEFORE hashing/shingling so byte-distinct
    * spellings of the same content collapse to one dedup key. */
  def canonicalizeText(c: Column): Column = normalizeText(foldAccents(c))

  /** BPE-ish subword count approximation: words + punctuation runs counted
    * separately (regex-based; a real tokenizer slots in here). */
  def approxBpeTokenCount(c: Column): Column =
    size(filter(split(c, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= ""))

  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0)
      .otherwise(size(filter(t, x => x.isin(Stopwords: _*))).cast("double") / size(t))
  }

  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0).otherwise(
      (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))).cast("double") / length(c))

  def meanWordLength(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0)
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  /** Composite quality score in [0,1] — length, word-shape and stopword
    * signals (in the spirit of C4/Gopher quality heuristics). */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val wordScore = least(tokenCount(c).cast("double") / 100.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 5.0)
    round((lenScore + wordScore + punctPenalty) / 3.0, 6)
  }

  /** Marker-stopword language ID over {en,de,fr,es,zh}: score = number of
    * tokens that are marker words of the language; winner = highest score,
    * ties broken by lexicographically greatest language code (array_max over
    * (score, lang) structs — deterministic and SQL-reproducible). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langScore(c: Column, lang: String): Column =
    size(filter(tokens(c), x => x.isin(LangMarkers(lang): _*)))

  def langId(c: Column): Column = {
    val entries = LangMarkers.keys.toSeq.sorted.map(l => struct(langScore(c, l).as("s"), lit(l).as("l")))
    array_max(array(entries: _*)).getField("l")
  }

  /** Word k-shingles over an already-materialized token ARRAY column.
    * Callers must bind the token array to an attribute first (project it in
    * a previous select): passing `tokens(text)` directly would embed the
    * regex-split subtree in the lambda, and transform() then re-runs the
    * split once per shingle — O(tokens²) per row. */
  def shinglesOfTokens(t: Column, k: Int): Column =
    when(size(t) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(t) - k), i => concat_ws(" ", slice(t, i + 1, lit(k)))))

  /** Word k-shingles joined by single spaces, directly from the TEXT
    * column. Unlike [[shinglesOfTokens]] this needs no pre-projected token
    * attribute: the shingle array is arrays_zip over k shifted slices, so
    * every reference to the regex-split subtree sits OUTSIDE the lambda
    * (a lambda body re-evaluates its subtrees per element — the previous
    * delegation to shinglesOfTokens re-ran the split once per shingle,
    * O(tokens²) per row). Same output, O(k·tokens) work. */
  def shingles(c: Column, k: Int): Column = {
    val t = tokens(c)
    val m = size(t) - (k - 1)
    when(m <= 0, array().cast("array<string>")).otherwise(
      transform(arrays_zip((0 until k).map(i => slice(t, lit(i + 1), m)): _*),
        s => concat_ws(" ", (0 until k).map(i => s.getField(i.toString)): _*)))
  }

  /** MinHash signature, oracle-reproducible spec: component j =
    * min over shingles of md5(j + ":" + shingle), as lowercase hex.
    * (Digest fed as two updates — prefix bytes then shingle bytes —
    * identical to digesting the concatenated string.) */
  val minhashMd5U: UserDefinedFunction = udf((sh: Seq[String], n: Int) =>
    if (sh == null || sh.isEmpty) null
    else {
      val md = Md5.tl.get()
      val shBytes = sh.iterator.map(_.getBytes("UTF-8")).toArray
      Array.tabulate(n) { j =>
        val prefix = Md5.prefix(j)
        // track the min digest as raw bytes — unsigned byte order equals the
        // lowercase-hex lexicographic order of the spec, and skipping the
        // per-digest hex string + string compare roughly halves the cost of
        // this innermost (numHashes × shingles) loop
        var best: Array[Byte] = null
        var i = 0
        while (i < shBytes.length) {
          md.reset()
          md.update(prefix)
          md.update(shBytes(i))
          val d = md.digest()
          if (best == null || java.util.Arrays.compareUnsigned(d, best) < 0) best = d
          i += 1
        }
        Hex.toHex(best)
      }
    })

  // (no direct-Column convenience for the md5 signature: it would embed the
  // split() subtree in the shingle lambda — project tokens first, see
  // shinglesOfTokens / Dedup.shingled)

  /** Fast engine-native MinHash for the 100 TB path (not oracle-
    * reproducible — the md5 spec above is the engine-independent one).
    *
    * Each shingle is hashed ONCE (two 64-bit FNV-1a-style passes over its
    * chars, no byte-array allocation); the `numHashes` signature components
    * come from the Kirsch-Mitzenmacher combination h1 + j·h2, which
    * preserves MinHash's collision statistics. Total work is
    * O(chars + numHashes) per shingle vs the md5 spec's numHashes full
    * digests per shingle — the asymptotic win, not just a faster hash. */
  val minhashFastU: UserDefinedFunction = udf((sh: Seq[String], n: Int) =>
    if (sh == null || sh.isEmpty) null
    else {
      val mins = Array.fill(n)(Long.MaxValue)
      val it = sh.iterator
      while (it.hasNext) {
        val s = it.next()
        var h1 = 0xcbf29ce484222325L
        var h2 = 0x9e3779b97f4a7c15L
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          h1 = (h1 ^ c) * 0x100000001b3L
          h2 = (h2 ^ c) * 0xc2b2ae3d27d4eb4fL
          i += 1
        }
        // avalanche so low bits differ across similar shingles
        h1 ^= h1 >>> 33; h1 *= 0xff51afd7ed558ccdL; h1 ^= h1 >>> 33
        h2 ^= h2 >>> 29; h2 *= 0x94d049bb133111ebL; h2 ^= h2 >>> 32
        var j = 0
        while (j < n) {
          val h = h1 + j * h2
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      mins
    })

  def minhashFast(c: Column, k: Int, numHashes: Int): Column =
    minhashFastU(shingles(c, k), lit(numHashes))

  /** SimHash-64 as a 16-char lowercase hex string. Spec (engine-independent):
    * tokens → md5 hex; bit j of token hash = bit (3 - j%4) of hex digit
    * j/4; score_j = Σ (bit ? 1 : -1); simhash bit j = score_j > 0. */
  val simhash64U: UserDefinedFunction = udf((toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) null
    else {
      val md = Md5.tl.get()
      val scores = new Array[Int](64)
      toks.foreach { t =>
        md.reset()
        val hex = Hex.toHex(md.digest(t.getBytes("UTF-8")))
        var j = 0
        while (j < 64) {
          val digit = Character.digit(hex.charAt(j / 4), 16)
          val bit = (digit >> (3 - (j % 4))) & 1
          scores(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      val sb = new StringBuilder(16)
      var g = 0
      while (g < 16) {
        var d = 0
        var b = 0
        while (b < 4) {
          d = (d << 1) | (if (scores(g * 4 + b) > 0) 1 else 0)
          b += 1
        }
        sb += "0123456789abcdef".charAt(d)
        g += 1
      }
      sb.toString
    })

  def simhash64(c: Column): Column = simhash64U(tokens(c))

  /** Hamming distance between two equal-length hex signatures. */
  val hammingHexU: UserDefinedFunction = udf((a: String, b: String) =>
    if (a == null || b == null) None
    else Some((0 until math.min(a.length, b.length)).map { i =>
      Integer.bitCount(Character.digit(a.charAt(i), 16) ^ Character.digit(b.charAt(i), 16))
    }.sum))

  /** Canonical text normalization for dedup keys / quality filters:
    * lowercase, collapse runs of whitespace to single spaces, trim. The
    * collapse runs FIRST: Spark's trim strips only ASCII spaces, so
    * trimming before collapsing would leave a leading space behind a
    * leading tab/newline and break idempotence (caught by TextLawsSpec).
    * Pure native expressions — stays inside whole-stage codegen. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** HTML → text extraction (the WET step every web-crawl pipeline runs
    * before C4/Gopher filtering): drop script/style payloads and comments,
    * turn block-level tags into line breaks, strip remaining tags, decode
    * the common entities (&amp;amp; last so entity-encoded entities don't
    * double-decode), then collapse whitespace. A native regexp_replace
    * chain — codegen-friendly, map-side, and restricted to syntax with
    * identical Java/RE2 semantics (inline (?is) flags and non-greedy
    * quantifiers, NO backreferences — RE2 has none, which is why script
    * and style are separate passes instead of one alternation with \\1). */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|br|div|h[1-6]|li|tr|ul|ol|table|blockquote)(\\s[^>]*)?/?>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
    val oneSpace = regexp_replace(decoded, "[ \\t]+", " ")
    val tightNl = regexp_replace(oneSpace, " ?\\n ?", "\n")
    val oneNl = regexp_replace(tightNl, "\\n+", "\n")
    // trim() strips only spaces — edge newlines need their own pass
    trim(regexp_replace(oneNl, "^\\n+|\\n+$", ""))
  }

  // PII patterns shared by redaction and counting. Restricted to syntax
  // with identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
  // character classes, \d/\S, bounded repetition — no lookaround.
  val UrlPattern = "https?://\\S+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?\\d{3}[-.]\\d{3}[-.]\\d{4}"

  /** PII redaction for training corpora: URLs, then emails, then phone
    * numbers → typed placeholder tokens (order matters — a URL may embed
    * '@'). Native regexp_replace chain, codegen-friendly, no UDF. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def piiUrlCount(c: Column): Column = regexp_count(c, lit(UrlPattern))
  def piiEmailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def piiPhoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern))

  /** Hosts of all URLs in the text, lowercased in order of appearance —
    * the input to domain-blocklist filtering (the C4/RefinedWeb pipeline
    * step). Native regexp_extract_all, codegen-friendly. */
  def urlHosts(c: Column): Column =
    transform(regexp_extract_all(c, lit("https?://([^/\\s]+)"), lit(1)), h => lower(h))

  /** True when any URL host in the text is on the blocklist (exact,
    * lowercase match). Map-side only — a blocklist is a literal array. */
  def hasBlockedDomain(c: Column, blocked: Seq[String]): Column =
    arrays_overlap(urlHosts(c), array(blocked.map(b => lit(b.toLowerCase)): _*))

  /** Query parameters dropped by [[canonicalizeUrl]]: tracking junk that
    * makes otherwise-identical URLs distinct (the standard URL-dedup
    * normalization in web-crawl pipelines). */
  private val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

  /** Canonical form of a single absolute URL, for exact URL-level dedup of
    * crawled documents. Spec (deterministic, no UDF — every step is a
    * codegen'd native expression):
    *   1. scheme and host lowercased; a leading `www.` and the scheme's
    *      default port (`:80` for http, `:443` for https) are dropped;
    *   2. the fragment (`#…`) is dropped;
    *   3. trailing `/` runs are stripped from the path (case preserved);
    *   4. tracking query params (utm_*, fbclid, gclid, msclkid, ref) are
    *      removed and the survivors are sorted bytewise and re-joined, so
    *      parameter order never distinguishes two URLs; an emptied query
    *      loses its `?`.
    * Input without a `scheme://` prefix yields NULL (not a crawlable
    * absolute URL). Map-side scalar — at 100 TB this runs in the scan
    * projection; dedup is then a plain groupBy on the canonical string. */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_replace(
      regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(c, "^[^#]*?\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(TrackingParamPattern))), "&")
    when(scheme === "", lit(null).cast("string")).otherwise(
      concat(scheme, lit("://"), host, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
  }

  /** Host of a canonicalized (or any absolute) URL, lowercased, without a
    * leading `www.` — the key for host-level aggregation and blocklists. */
  def urlHost(c: Column): Column = {
    val h = lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    when(h === "", lit(null).cast("string")).otherwise(regexp_replace(h, "^www\\.", ""))
  }

  /** Non-blank trimmed lines of a document (Gopher/Dolma-style repetition
    * filters operate on these). */
  def linesOf(c: Column): Column =
    filter(transform(split(c, "\n"), l => trim(l)), l => l =!= "")

  def lineCount(c: Column): Column = size(linesOf(c))

  def distinctLineCount(c: Column): Column = size(array_distinct(linesOf(c)))

  /** Fraction of non-blank lines that are duplicates of an earlier line —
    * the Gopher repetition signal (high ⇒ boilerplate/spam). 0 for empty
    * documents; rounded so either engine's double division hashes equal. */
  def dupLineFraction(c: Column): Column = {
    val l = linesOf(c)
    when(size(l) === 0, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(l)).cast("double") / size(l), 6))
  }

  /** WITHIN-document duplicate word-n-gram fraction (Gopher's repetition
    * family at the n-gram granularity): 1 − distinct/total n-grams. High
    * values flag looping/templated text that line-level stats miss. */
  def dupNgramFraction(c: Column, n: Int): Column = {
    val sh = shingles(c, n)
    when(size(sh) === 0, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 6))
  }

  // ------------------------------------------------ Gopher document rules
  // (Rae et al. 2021, arXiv:2112.11446 Appendix A1.1 — the published
  // document-quality rule set most large-scale text pipelines start from.)
  // Every metric is a native-function expression over the q25 token model
  // (whitespace tokens) and the linesOf line model, rounded so the DuckDB
  // oracle hashes identical; the keep decision compares the ROUNDED values
  // so a boundary ratio cannot flip between engines.

  /** (# occurrences of '#' or '...'/'…') / word count — Gopher drops docs
    * above 0.1 (symbol-heavy markup/code). 0 for empty docs. */
  def symbolWordRatio(c: Column): Column = {
    val symbols = regexp_count(c, lit("#")) + regexp_count(c, lit("\\.\\.\\.|…"))
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(round(symbols.cast("double") / tokenCount(c), 6))
  }

  /** Fraction of non-blank lines starting with a bullet ('•', '-', '*');
    * Gopher drops docs above 0.9. */
  def bulletLineFraction(c: Column): Column = {
    val l = linesOf(c)
    when(size(l) === 0, lit(0.0)).otherwise(
      round(size(filter(l, x => x.rlike("^[•\\-\\*]"))).cast("double") / size(l), 6))
  }

  /** Fraction of non-blank lines ending with an ellipsis; Gopher drops
    * docs above 0.3 (truncated/teaser boilerplate). */
  def ellipsisLineFraction(c: Column): Column = {
    val l = linesOf(c)
    when(size(l) === 0, lit(0.0)).otherwise(
      round(size(filter(l, x => x.rlike("(\\.\\.\\.|…)$"))).cast("double") / size(l), 6))
  }

  /** Fraction of words containing at least one alphabetic character;
    * Gopher requires ≥ 0.8. */
  def alphaWordFraction(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0)).otherwise(
      round(size(filter(tokens(c), x => x.rlike("[A-Za-z]"))).cast("double") / tokenCount(c), 6))

  /** Gopher's required-stopword signal: how many of the eight words
    * {the, be, to, of, and, that, have, with} appear (lowercased); docs
    * with fewer than 2 are dropped as non-prose. */
  def gopherStopwordHits(c: Column): Column =
    size(array_intersect(
      array_distinct(transform(tokens(c), w => lower(w))),
      array(GopherStopwords.map(lit): _*)))

  private[graft] val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The composite Gopher keep decision over the metrics above plus the
    * q25 word-count/mean-word-length bounds. Thresholds are the paper's;
    * word bounds are parameters because sf-scale test corpora sit far
    * below the paper's 50-word floor. */
  def gopherKeep(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    tokenCount(c).between(minWords, maxWords) &&
      round(meanWordLength(c), 6).between(3.0, 10.0) &&
      symbolWordRatio(c) <= 0.1 &&
      bulletLineFraction(c) <= 0.9 &&
      ellipsisLineFraction(c) <= 0.3 &&
      alphaWordFraction(c) >= 0.8 &&
      gopherStopwordHits(c) >= 2

  // ------------------------------------------------- readability taggers
  // (Flesch 1948 / Kincaid et al. 1975 — the standard readability
  // formulas, over the engine's whitespace tokens and a vowel-group
  // syllable heuristic. Dolma-style per-document quality *taggers*:
  // attributes a curation pipeline stores alongside each document and
  // filters on later, rather than a hard keep decision.)

  /** Heuristic syllable counts for a pre-projected token ARRAY column:
    * number of maximal [aeiouy]+ vowel groups in the lowercased word,
    * floored at 1 (so "rhythm"-like vowel-free words still count one).
    * Takes the token array like [[shinglesOfTokens]] — handed a raw
    * `tokens(text)` expression, the per-element lambda would re-run the
    * regex split once per word. */
  def syllablesOfTokens(t: Column): Column =
    transform(t, w => greatest(lit(1), size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))))

  /** Total syllables over a pre-projected token array. */
  def syllableCount(t: Column): Column =
    aggregate(syllablesOfTokens(t), lit(0), (acc, x) => acc + x)

  /** Sentence count: non-blank segments between terminal-punctuation runs
    * ([.!?]+), floored at 1 so the readability denominators are defined
    * for fragment-only documents. */
  def sentenceCount(c: Column): Column =
    greatest(lit(1), size(filter(split(c, "[.!?]+"), s => trim(s) =!= "")))

  /** Flesch reading ease from pre-computed word / sentence / syllable
    * counts: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words);
    * 0.0 for word-free documents. Higher = easier text. */
  def fleschReadingEase(words: Column, sentences: Column, syllables: Column): Column =
    when(words === 0, lit(0.0)).otherwise(
      lit(206.835) - lit(1.015) * (words.cast("double") / sentences.cast("double")) -
        lit(84.6) * (syllables.cast("double") / words.cast("double")))

  /** Flesch–Kincaid grade level: 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59; 0.0 for word-free documents. */
  def fkGradeLevel(words: Column, sentences: Column, syllables: Column): Column =
    when(words === 0, lit(0.0)).otherwise(
      lit(0.39) * (words.cast("double") / sentences.cast("double")) +
        lit(11.8) * (syllables.cast("double") / words.cast("double")) - lit(15.59))

  // --------------------------------------------------- C4 line-level clean
  // (Raffel et al. 2020, JMLR 21(140) §2.2 — the C4 cleaning recipe.)

  /** A line survives C4 cleaning when it ends in terminal punctuation
    * (.!?") — quote-terminated sentences included — carries at least
    * `minLineWords` words, and does not mention javascript. */
  private def c4LineKeep(l: Column, minLineWords: Int): Column =
    l.rlike("[.!?\"]$") &&
      size(filter(split(l, "\\s+"), x => x =!= "")) >= minLineWords &&
      !lower(l).contains("javascript")

  /** C4-cleaned text: surviving lines re-joined with newlines. */
  def c4CleanLines(c: Column, minLineWords: Int = 5): Column =
    array_join(filter(linesOf(c), l => c4LineKeep(l, minLineWords)), "\n")

  def hasLoremIpsum(c: Column): Column = lower(c).contains("lorem ipsum")

  def hasCurlyBrace(c: Column): Column = c.contains("{")

  /** Terminal-punctuation marks in the cleaned text — C4's sentence-count
    * proxy (pages under `minSentences` are dropped). */
  def c4SentenceCount(c: Column, minLineWords: Int = 5): Column =
    regexp_count(c4CleanLines(c, minLineWords), lit("[.!?]"))

  /** The composite C4 page decision: ≥ minSentences sentences after line
    * cleaning, no lorem-ipsum placeholder, no curly brace (code). */
  def c4Keep(c: Column, minSentences: Int = 3, minLineWords: Int = 5): Column =
    c4SentenceCount(c, minLineWords) >= minSentences &&
      !hasLoremIpsum(c) && !hasCurlyBrace(c)

  /** Deflate compression ratio, compressed/original UTF-8 bytes (level 6,
    * raw deflate — no gzip header noise): the classic cheap repetition
    * signal (RefinedWeb/MassiveText keep documents inside a ratio band —
    * very low = templated/repetitive, near/above 1 = already-compressed
    * or random junk). A per-row UDF by necessity (zlib), deterministic
    * for a given JDK but NOT oracle-mirrorable in plain SQL, so it is
    * spec-gated (band behavior on repetitive vs prose vs high-entropy
    * text), not hash-gated. Null in → null out; empty text → 1.0. */
  val compressionRatioU: UserDefinedFunction = udf((s: String) =>
    if (s == null) None
    else {
      val in = s.getBytes("UTF-8")
      if (in.isEmpty) Some(1.0)
      else {
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(in); d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        Some(math.rint(n.toDouble / in.length * 1e6) / 1e6)
      }
    })

  def compressionRatio(c: Column): Column = compressionRatioU(c)

  /** Rolling polynomial fingerprint: fold over UTF-8 bytes,
    * h = (h * 131 + byte) mod (2^31 - 1), h0 = 0. SQL-reproducible. */
  val fingerprintU: UserDefinedFunction = udf((s: String) =>
    if (s == null) None
    else {
      var h = 0L
      s.getBytes("UTF-8").foreach { b => h = (h * 131 + (b & 0xff)) % 2147483647L }
      Some(h)
    })

  def fingerprint(c: Column): Column = fingerprintU(c)

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("minhash_md5", minhashMd5U)
    spark.udf.register("simhash64", simhash64U)
    spark.udf.register("hamming_hex", hammingHexU)
    spark.udf.register("text_fingerprint", fingerprintU)
  }
}

private[graft] object Md5 {
  val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val prefixes = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
  def prefix(j: Int): Array[Byte] =
    prefixes.computeIfAbsent(j, (k: Int) => (k.toString + ":").getBytes("UTF-8"))
}

private[graft] object Hex {
  private val digits = "0123456789abcdef".toCharArray
  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = digits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = digits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

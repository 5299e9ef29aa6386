package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for LLM-training-data pipelines
  * (SURVEY §2.G8–G11). Every function is a pure `Column` composition —
  * whole-stage codegen, no UDFs — and every arithmetic output is exact
  * (int ÷ int in double) so a SQL oracle can reproduce it bit-for-bit.
  */
object Text {

  /** Whitespace tokens (split on single space; preserves empties exactly like
    * DuckDB's string_split so oracles agree).
    */
  def wsTokens(text: Column): Column = split(text, " ")

  /** Non-empty whitespace tokens. `array_remove(…, "")`, NOT a
    * `filter(…, length > 0)` lambda: the values are identical, but the
    * lambda is CodegenFallback and ONE of them keeps the whole projection
    * out of whole-stage codegen — and tokens() rides in nearly every
    * corpus-wide text projection in the library.
    */
  def tokens(text: Column): Column = array_remove(split(text, " "), "")

  /** Word k-shingles of a token array via the native codegen expression
    * (`graftglue.WordShingles`) — the fused loop the HOF
    * `transform(sequence, slice, array_join)` chain interprets per element.
    * Same results; empty array when the document has fewer than k tokens.
    */
  def shinglesOf(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftglue.{ColumnBridge, WordShingles}
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), Literal(k)))
  }

  /** BPE-ish tokens: runs of letters, runs of digits, or single other
    * non-space characters — the shape of a byte-pair pre-tokenizer.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Token statistics (G10): whitespace + BPE-ish counts, chars. */
  def tokenStats(text: Column): Seq[Column] = Seq(
    length(text).cast(LongType).as("n_chars"),
    size(tokens(text)).cast(LongType).as("n_ws_tokens"),
    size(bpeishTokens(text)).cast(LongType).as("n_bpeish_tokens"))

  /** Small per-language stopword lists for the heuristic language ID. Tiny on
    * purpose: broadcast as literals into codegen. Extend freely at use sites.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que", "pas", "pour"))

  /** Count of tokens in the literal `words` set, via the native codegen
    * `graftglue.CountInSet` (one hash probe per token; the
    * `size(filter(isin))` HOF form de-fuses the projection and pays an
    * O(|words|) comparison chain per token, interpreted).
    */
  private def stopwordHits(toks: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, CountInSet}
    ColumnBridge.column(CountInSet(ColumnBridge.expression(toks), words))
  }

  /** Fraction of tokens found in `words` — exact bigint ÷ bigint double. */
  def stopwordFraction(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    stopwordHits(toks, words).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Heuristic language ID (G8): argmax of per-language stopword fractions,
    * ties broken by language code ascending, all-zero → "und"(etermined).
    */
  def langId(text: Column, langs: Map[String, Seq[String]] = stopwords): Column = {
    val scored = langs.toSeq.sortBy(_._1).map { case (code, words) =>
      struct((stopwordFraction(text, words) * -1).as("neg"), lit(code).as("code"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("neg") < 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Quality-score features (G9): length, punctuation ratio, stopword ratio,
    * mean token length — each exact (int ÷ int).
    */
  def qualityFeatures(text: Column, stop: Seq[String] = stopwords("en")): Seq[Column] = {
    val toks = tokens(text)
    val nToks = greatest(size(toks), lit(1))
    val punct = size(regexp_extract_all(text, lit("[.,;:!?'\"()]"), lit(0)))
    Seq(
      length(text).cast(LongType).as("n_chars"),
      size(toks).cast(LongType).as("n_tokens"),
      punct.cast(DoubleType) / greatest(length(text), lit(1)).cast(DoubleType) as "punct_ratio",
      stopwordHits(toks, stop).cast(DoubleType) /
        nToks.cast(DoubleType) as "stopword_ratio",
      // Σ token lengths ≡ length of the empty-separator join — a codegen
      // expression where the aggregate() lambda would de-fuse the projection
      length(array_join(toks, "")).cast(LongType)
        .cast(DoubleType) / nToks.cast(DoubleType) as "mean_token_len")
  }

  /** Order-insensitive document fingerprint (G11): md5 over the sorted
    * distinct token set. Identical hex in DuckDB:
    * `md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' '))`.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), " "))

  /** Canonical text normalization for dedup: lowercase, strip punctuation
    * to spaces, collapse whitespace runs, trim. Near-duplicates differing
    * only in case/punctuation/spacing then hash identically — the standard
    * normalize-before-dedup prep step. Pure codegen projection; DuckDB
    * mirror: `trim(regexp_replace(regexp_replace(lower(text),
    * '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))`.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Deterministic 64-bit token hash built from md5 (engine-portable, unlike
    * Spark's xxhash64 vs DuckDB's hash): first 16 hex chars of md5 → bigint.
    */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** PII redaction: replace emails, SSN-shaped ids, US-shaped phone
    * numbers, and IPv4 addresses with typed placeholder tags — the privacy
    * scrub every published training-data pipeline runs before release.
    * Pure codegen projection (chained regexp_replace, replace-ALL
    * semantics); patterns stick to syntax shared by Java regex and RE2 so
    * a DuckDB oracle (with the 'g' flag) reproduces it exactly. Order
    * matters: emails go first so phone-like digit runs inside a local part
    * are already gone.
    */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    val phone = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
    val ipv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val steps = Seq(email -> "<EMAIL>", ssn -> "<SSN>",
      phone -> "<PHONE>", ipv4 -> "<IP>")
    steps.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }
  }

  /** Repetition statistics (the Gopher/MassiveText repetition filters —
    * Rae et al. 2021 §A1.1): documents dominated by repeated n-grams are
    * boilerplate/spam and get dropped before training. Per document:
    *
    *   - `n_grams` / `n_distinct` — total and distinct word n-grams
    *   - `dup_frac` — fraction of n-gram OCCURRENCES that are repeats
    *     (`(n_grams - n_distinct) / n_grams`)
    *   - `top_frac` — fraction taken by the single most frequent n-gram
    *
    * Both ratios are bigint ÷ bigint in double — exact cross-engine.
    * Documents with fewer than `n` tokens yield no row (no n-grams to
    * measure — join back and treat as clean).
    *
    * Scale: tokenize+shingle is one scan (codegen [[shinglesOf]]); the
    * (id, gram) count partial-aggregates map-side; the per-doc rollup
    * reuses the same hash-partitioning ancestry. Filter downstream with
    * e.g. `dup_frac > 0.3 OR top_frac > 0.2`.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val grams = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("__tk"))
      .select(col("id"), explode(shinglesOf(col("__tk"), n)).as("gram"))
    grams.groupBy("id", "gram").agg(count(lit(1)).as("__c"))
      .groupBy("id").agg(
        sum(col("__c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("__c")).as("__max"))
      .select(col("id"),
        col("n_grams"), col("n_distinct"),
        (col("n_grams") - col("n_distinct")).cast(DoubleType) /
          col("n_grams").cast(DoubleType) as "dup_frac",
        col("__max").cast(DoubleType) / col("n_grams").cast(DoubleType) as "top_frac")
  }

  /** Registrable domain of a URL: hostname minus any leading `www.` —
    * scheme, port, path, userinfo all stripped. Pure regex projection;
    * RE2/Java-shared syntax so the DuckDB mirror is identical. Returns ''
    * for strings with no authority component.
    */
  def domainOf(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1),
      "^www\\.", "")

  /** URL canonicalization — the normalize-before-dedup step of a web
    * corpus (the same page arrives as `HTTP://Site.com/a/?utm_source=x#top`
    * and `http://site.com/a`; exact dedup by raw URL misses it). A fixed
    * regex-chain projection, RE2/Java-shared syntax (no lookarounds — RE2
    * has none), so the DuckDB mirror is identical:
    *
    *  1. strip the `#fragment`;
    *  2. strip tracking params (`utm_*`, `gclid`, `fbclid`) wherever they
    *     sit in the query string, then collapse the separators they leave
    *     behind (`?&`→`?`, `&&`→`&`, trailing `?`/`&` dropped);
    *  3. lowercase the scheme and authority (path/query stay
    *     case-sensitive per RFC 3986) and drop a default port
    *     (`:80` on http, `:443` on https);
    *  4. drop a single trailing `/`.
    *
    * Feed the result to [[graft.dedup.Dedup.exact]] for URL-keyed dedup.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*", "$1")
    val sep1 = regexp_replace(noTrack, "\\?&+", "?")
    val sep2 = regexp_replace(sep1, "&&+", "&")
    val sep3 = regexp_replace(sep2, "[?&]+$", "")
    val authority = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val head = lower(regexp_extract(sep3, authority, 0))
    val tail = regexp_replace(sep3, authority, "")
    val headNoPort = regexp_replace(
      regexp_replace(head, "^(http://[^/?#]*):80$", "$1"),
      "^(https://[^/?#]*):443$", "$1")
    regexp_replace(concat(headNoPort, tail), "/$", "")
  }

  /** Unicode normalization (G54): NFC by default — the
    * normalize-before-anything step of a multilingual corpus. The same
    * grapheme arrives composed (U+00E1) and decomposed (U+0061 U+0301) from
    * different crawls/encoders; exact dedup, shingle hashing, vocabulary
    * building, and BPE training all treat them as distinct until the corpus
    * is code-point normalized. Native codegen expression
    * ([[org.apache.spark.sql.graftglue.NormalizeUnicode]]): already-normal
    * (e.g. pure-ASCII) rows return as-is without allocation. DuckDB's
    * `nfc_normalize` is the bit-exact NFC oracle.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftglue.{ColumnBridge, NormalizeUnicode}
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(text), form))
  }

  /** Encoding-quality statistics (G54): the mojibake/binary-noise signals a
    * crawl-ingest filter thresholds on, each a pure codegen projection with
    * exact int ÷ int ratios:
    *
    *   - `n_chars` — code-point length;
    *   - `n_replacement` — U+FFFD replacement characters (the tombstone a
    *     lossy transcode leaves behind: any count > 0 means bytes were
    *     already destroyed upstream);
    *   - `n_control` — C0 control characters other than tab/LF/CR (binary
    *     junk masquerading as text);
    *   - `non_ascii_frac` — non-ASCII code points / all code points (a
    *     language-independent "is this even text for my tokenizer" signal —
    *     threshold per expected language mix, don't zero it);
    *   - `nfc_changed` — 1 when NFC normalization would alter the string
    *     (count these corpus-wide to decide whether a normalize pass must
    *     precede dedup).
    *
    * Character classes use `\x`-hex ranges — syntax Java regex and RE2
    * share, so the DuckDB oracle runs the identical patterns.
    */
  def encodingStats(text: Column): Seq[Column] = Seq(
    length(text).cast(LongType).as("n_chars"),
    size(regexp_extract_all(text, lit("�"), lit(0))).cast(LongType)
      .as("n_replacement"),
    size(regexp_extract_all(text, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), lit(0)))
      .cast(LongType).as("n_control"),
    size(regexp_extract_all(text, lit("[^\\x00-\\x7F]"), lit(0))).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType) as "non_ascii_frac",
    when(normalizeUnicode(text) === text, lit(0L)).otherwise(lit(1L))
      .as("nfc_changed"))

  /** Default banned-substring list for [[c4CleanLines]] (lowercase; a line
    * containing any of these dies): the C4 "javascript" rule plus the
    * cookie/ToS boilerplate markers and the lorem-ipsum placeholder.
    */
  val c4Banned: Seq[String] =
    Seq("javascript", "cookie policy", "terms of use", "lorem ipsum")

  /** C4 line-level cleaning (G57; Raffel et al., JMLR 2020 §2.2): keep only
    * lines that end in a terminal character, have ≥ `minWords` words, and
    * contain no banned substring; survivors rejoin with `\n` ('' when
    * nothing survives — the caller decides whether empty docs drop). ONE
    * native compiled loop per row
    * ([[org.apache.spark.sql.graftglue.CleanLines]]) — the natural
    * `array_join(filter(split(...)))` spelling is a CodegenFallback lambda
    * that would de-fuse the whole corpus projection. Zero shuffle.
    */
  def c4CleanLines(text: Column, minWords: Int = 3,
                   terminals: String = ".!?\"'",
                   banned: Seq[String] = c4Banned): Column = {
    import org.apache.spark.sql.graftglue.{CleanLines, ColumnBridge}
    ColumnBridge.column(CleanLines(ColumnBridge.expression(text),
      minWords, terminals, banned))
  }

  /** C4's DOCUMENT-level gate (G57): false for pages carrying the
    * placeholder-text or source-code markers ("lorem ipsum", a curly
    * brace) — those drop whole, before line cleaning. Codegen predicates.
    */
  def c4DocOk(text: Column): Column =
    !(lower(text).contains("lorem ipsum") || text.contains("{"))

  /** Unicode script ranges (name → Java/RE2-shared character class, name
    * ascending) behind [[scriptStats]] — deliberately coarse block ranges,
    * not full Unicode script properties (`\p{IsHan}` etc. differ between
    * engines; explicit `\x{...}` ranges are identical in Java and RE2, so
    * the oracle runs the same patterns verbatim). "cjk" covers kana +
    * unified ideographs; "latin" covers ASCII letters + Latin-1/Extended.
    */
  val scripts: Seq[(String, String)] = Seq(
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]")

  /** Per-document script mix (G54): one count column per [[scripts]] entry
    * plus `main_script` — the majority script (ties by name ascending,
    * all-zero → "none"). The multilingual routing signal [[langId]]'s
    * stopword heuristic can't see (stopword lists are per-language;
    * script ranges cover whole writing systems), and the "CJK text in my
    * 'English' crawl" contamination check. One codegen projection: counts
    * are `regexp_extract_all` lengths, the argmax is the [[langId]]
    * struct-min device.
    */
  def scriptStats(text: Column): Seq[Column] = {
    val counts = scripts.map { case (name, re) =>
      size(regexp_extract_all(text, lit(re), lit(0))).cast(LongType).as(s"n_$name")
    }
    val best = array_min(array(scripts.map { case (name, re) =>
      struct((size(regexp_extract_all(text, lit(re), lit(0))) * -1).as("neg"),
        lit(name).as("name"))
    }: _*))
    counts :+ when(best.getField("neg") < 0, best.getField("name"))
      .otherwise(lit("none")).as("main_script")
  }

  /** HTML entity decode list shared by [[htmlToText]] and its oracle:
    * applied via ONE native ChainedReplace (replace-all, left-to-right —
    * identical to DuckDB `replace()` chains). `&amp;` is deliberately LAST:
    * decoding it first would turn `&amp;lt;` into `&lt;` and then a second
    * pass into `<` — double-decoding that fabricates characters the
    * document never contained.
    */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** HTML → visible text (G55): the extraction step between a raw crawl and
    * every operator above — strip `<script>`/`<style>` elements WITH their
    * contents (code is not prose), then comments, then all remaining tags,
    * decode the common entities, and collapse whitespace. A fixed
    * regex-chain + [[org.apache.spark.sql.graftglue.ChainedReplace]]
    * projection: zero shuffle, whole-stage codegen, linear in the document.
    *
    * Pattern notes (Java/RE2-shared syntax, inline flags instead of
    * engine-specific call flags): `(?is)` = dotall + case-insensitive so
    * `<SCRIPT>` blocks spanning lines match; `.*?` lazy so adjacent blocks
    * don't merge; entity decode runs AFTER tag stripping (a decoded `&lt;`
    * must not look like a tag); whitespace collapses via an explicit
    * `[ \t\n\r\f]` class (Java's `\s` includes U+000B, RE2's does not —
    * the one place the engines' shorthands disagree).
    *
    * This is the structural 90% of trafilatura-style extraction; DOM-aware
    * main-content detection (nav/footer pruning) is [[graft.dedup.Dedup]]'s
    * `boilerplateClean` downstream — document-frequency over extracted
    * chunks, which needs no parser and degrades gracefully on the broken
    * markup real crawls serve.
    */
  def htmlToText(html: Column): Column = {
    import org.apache.spark.sql.graftglue.{ChainedReplace, ColumnBridge}
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = ColumnBridge.column(
      ChainedReplace(ColumnBridge.expression(noTags), htmlEntities))
    trim(regexp_replace(decoded, "[ \t\n\r\f]+", " "))
  }

  /** Per-document HTML structure statistics (G55): the markup-shape signals
    * a crawl filter reads BEFORE extraction — `n_tags` (total tags),
    * `n_links` (anchor opens), `n_scripts` (script opens), and `text_frac`
    * (visible-text code points / raw code points, exact int ÷ int): pages
    * that are mostly markup (link farms, nav shells, JS bundles) die here
    * without tokenizing a byte. One codegen projection sharing
    * [[htmlToText]]'s extraction.
    */
  def htmlStats(html: Column): Seq[Column] = Seq(
    size(regexp_extract_all(html, lit("(?s)<[^>]+>"), lit(0))).cast(LongType)
      .as("n_tags"),
    size(regexp_extract_all(html, lit("(?is)<a[ \t\n\r\f>]"), lit(0))).cast(LongType)
      .as("n_links"),
    size(regexp_extract_all(html, lit("(?is)<script[ \t\n\r\f>]"), lit(0))).cast(LongType)
      .as("n_scripts"),
    length(htmlToText(html)).cast(DoubleType) /
      greatest(length(html), lit(1)).cast(DoubleType) as "text_frac")

  /** Overlapping token-window chunking — the context-window prep step for
    * training sequences and RAG corpora. Each document with n tokens yields
    * `floor((n-1)/stride) + 1` chunks: chunk i covers tokens
    * `[i*stride, i*stride + chunkSize)`, the last one short. Empty docs
    * yield no chunks.
    *
    * Pure projection + explode — ZERO shuffle, codegen end to end; output
    * size is `(chunkSize/stride)×` the corpus, which is why stride defaults
    * to chunkSize/2 (the usual 50% overlap) and not 1.
    *
    * Output: (id, chunk_id, chunk_text, n_tokens).
    */
  def chunk(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col("id"), col("__tk"),
        explode(sequence(lit(0), expr(s"(size(__tk) - 1) div $stride"))).as("__ci"))
      .select(col("id"), col("__ci").cast(LongType).as("chunk_id"),
        array_join(slice(col("__tk"), col("__ci") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), size(col("__tk")) - col("__ci") * stride)
          .cast(LongType).as("n_tokens"))
  }
}

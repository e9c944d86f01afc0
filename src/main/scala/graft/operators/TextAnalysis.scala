package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language identification, and document fingerprinting.
  * Everything is row-local column arithmetic (no UDF, no shuffle) so the
  * operators scale linearly and stay verifiable against the SQL oracles.
  */
object TextAnalysis {

  /** Whitespace token array. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-pieces + digits + punctuation runs —
    * a cheap proxy for tokenizer cost (regex split keeps it portable). */
  def roughPieceCount(text: Column): Column =
    size(filter(split(text, "(?=[ .,!?;:])|\\s+"), t => length(t) > 0))

  /** Per-language stopword lists for the Latin-script vote. Public: the
    * SQL oracle re-derives the identical vote from the same lists (they
    * are the operator's spec, not an implementation detail). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "de", "que"),
    "it" -> Seq("il", "che", "di", "per", "con"),
    "pt" -> Seq("o", "os", "uma", "em", "como"),
    "nl" -> Seq("het", "een", "van", "dat", "niet"),
    "sv" -> Seq("och", "att", "det", "som", "ett"),
    "pl" -> Seq("w", "na", "nie", "jest", "do"),
    "tr" -> Seq("ve", "bir", "bu", "ne", "gibi"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan"),
    "ro" -> Seq("si", "la", "cu", "un", "este"))

  /** Unicode script code-point bounds for the non-Latin signal. A script
    * is a much stronger signal than stopwords — one CJK-heavy line
    * identifies zh with no tokenization at all. */
  val scriptBounds: Seq[(String, Int, Int)] = Seq(
    ("ar", 0x0600, 0x06FF), ("el", 0x0370, 0x03FF), ("he", 0x0590, 0x05FF),
    ("hi", 0x0900, 0x097F), ("ja", 0x3040, 0x30FF), ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF), ("zh", 0x4E00, 0x9FFF))

  /** The same ranges as regex char classes — the Java form for column-
    * level counting ([[scriptCount]]) and the RE2 form the DuckDB oracle
    * replays (`[\x{XXXX}-\x{XXXX}]`); \u escapes are resolved by the
    * regex engines, not the source encoding. */
  val scriptRanges: Seq[(String, String, String)] =
    scriptBounds.map { case (l, lo, hi) =>
      (l, f"[\\u$lo%04X-\\u$hi%04X]", f"[\\x{$lo%04X}-\\x{$hi%04X}]")
    }

  /** Count of characters in a script's range — row-local regex strip. */
  def scriptCount(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** Count of tokens that belong to `lang`'s stopword list. */
  def stopwordCount(toks: Column, lang: String): Column = {
    val sw = stopwords(lang)
    size(filter(toks, t => sw.map(t === _).reduce(_ || _)))
  }

  /** argmax over (count, label) pairs as `array_max` of structs — each
    * count subexpression appears ONCE in the plan. (A `when`-fold over N
    * candidates duplicates every earlier count inside each branch: the
    * tree doubles per language, and at 12+8 languages the result was a
    * ~20 MiB task binary and a 330 s bench entry. Struct comparison is
    * (count, reverseIdx) lexicographic, so the max among count-ties is the
    * smallest alphabetical index — the same first-wins tie-break.) Returns
    * the winning label, or `ifZero` when every count is 0. */
  private def argmaxLabel(counts: Seq[(String, Column)], ifZero: Column): Column = {
    val n = counts.size
    val entries = counts.zipWithIndex.map { case ((_, c), i) =>
      struct(c.as("c"), lit(n - 1 - i).as("ri"))
    }
    val names = array(counts.map(_._1).reverse.map(lit): _*)
    val best = array_max(array(entries: _*))
    when(best.getField("c") > 0, get(names, best.getField("ri"))).otherwise(ifZero)
  }

  /** Language ID by stopword vote over a pre-split token array: the
    * language with the highest stopword count wins; ties resolve
    * alphabetically ('unknown' when all zero). Take lowercased tokens.
    * All 12 per-language counts come from ONE single-pass native
    * expression (hash lookup per token) instead of 12 filter passes. */
  def langIdFromTokens(toks: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val counts = graft.plans.NativeExpressions.stopword_counts(
      toks, langs.map(stopwords))
    argmaxLabel(
      langs.zipWithIndex.map { case (l, i) => l -> element_at(counts, i + 1) },
      lit("unknown"))
  }

  /** Two-stage language ID (12 Latin languages + 8 script languages),
    * fully row-local:
    *  1. SCRIPT signal: count characters per non-Latin script range; if
    *     the winning script covers ≥¼ of the text it decides outright
    *     (ties resolve alphabetically, strict > keeps the first).
    *  2. else the Latin stopword vote over [[stopwords]].
    * Deterministic column arithmetic end to end — the DuckDB oracle
    * replays the same counts and CASE order. */
  def langId(text: Column): Column = {
    // all 8 script counts come from ONE single-pass native expression
    // (was: 8 regexp_replace traversals per row — the langId hot loop);
    // a script entry only counts when it clears the 25% threshold, so
    // "no script fired" falls through to the stopword vote with every
    // count at 0
    val counts = graft.plans.NativeExpressions.script_counts(text,
      scriptBounds.flatMap { case (_, lo, hi) => Seq(lo, hi) })
    val scriptEntries = scriptBounds.zipWithIndex.map { case ((l, _, _), i) =>
      val c = element_at(counts, i + 1)
      l -> when(c * 4 >= length(text), c).otherwise(lit(0))
    }
    argmaxLabel(scriptEntries, langIdFromTokens(tokens(lower(text))))
  }

  /** Quality score components: char length, token count, mean token
    * length, punctuation ratio, stopword ratio (English), uppercase ratio.
    * All ratios rounded to 6 for cross-engine comparison. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nTok = size(toks).cast("double")
    Seq(
      "n_chars" -> length(text).cast("long"),
      "n_tokens" -> size(toks).cast("long"),
      "mean_token_len" -> round(
        aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
          greatest(nTok, lit(1.0)), 6),
      "punct_ratio" -> round(
        (nChars - length(regexp_replace(text, "[.,!?;:]", ""))) /
          greatest(nChars, lit(1.0)), 6),
      "stopword_ratio" -> round(
        stopwordCount(tokens(lower(text)), "en").cast("double") /
          greatest(nTok, lit(1.0)), 6),
      "upper_ratio" -> round(
        (nChars - length(regexp_replace(text, "[A-Z]", ""))) /
          greatest(nChars, lit(1.0)), 6))
  }

  /** The Gopher stop-word set (Rae et al. 2021, Appendix A1.1) — the
    * rule asks for ≥ 2 DISTINCT members present, not a ratio. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-filter rule suite (Rae et al. 2021, Appendix A —
    * the published heuristic document filter every large-scale English
    * pretraining pipeline starts from). Each rule is one boolean column
    * (1 = pass), `keep` is their conjunction:
    *
    *  - `r_word_count`:   50 ≤ words ≤ 100,000
    *  - `r_mean_word_len`: mean word length in [3, 10]
    *  - `r_symbol_ratio`: hash-to-word ratio ≤ 0.1 AND ellipsis-to-word
    *    ratio ≤ 0.1 — Rae et al. apply the 0.1 bound to EACH symbol's
    *    ratio independently ("either the hash symbol or the ellipsis"),
    *    so a doc at 0.06 + 0.06 passes (the r12 cut summed them)
    *  - `r_bullet_lines`: ≤ 90% of lines start with a bullet
    *  - `r_ellipsis_lines`: ≤ 30% of lines end with "..."
    *  - `r_alpha_words`:  ≥ 80% of words contain a letter
    *  - `r_stop_words`:   ≥ 2 distinct Gopher stop words present
    *  - `r_dup_lines`:    duplicate-line fraction ≤ 0.30 (the A1.2
    *    repetition family's line tier; cross-document line dedup is
    *    [[lineDedup]], per-doc n-gram repetition is [[dupNgramRatio]])
    *
    * Every signal is ROW-LOCAL (split/filter/aggregate HOFs, all
    * codegen'd) — at 100 TB the whole rule suite runs at scan speed with
    * zero shuffles, and composes with any downstream sampler as a plain
    * filter on `keep`. */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val ws = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    val nW = size(ws).cast("double")
    val meanLen = aggregate(ws, lit(0L), (a, t) => a + length(t))
      .cast("double") / greatest(nW, lit(1.0))
    // Line-break normalization (r13 ADVICE fix; r14 extended): "\r\n",
    // lone "\r" (classic-Mac corpora) and U+2028/U+2029 all become "\n"
    // ahead of the line split — otherwise such corpora read as ONE line
    // and the line-level rules silently under-fire; word/symbol signals
    // stay on the raw text (\r is \s+ for the word split, and the
    // oracle's word split mirrors that)
    val lines = filter(transform(
      split(replace(replace(replace(replace(text,
        lit("\r\n"), lit("\n")), lit("\r"), lit("\n")),
        lit("\u2028"), lit("\n")), lit("\u2029"), lit("\n")),
        "\n"), l => trim(l)),
      l => length(l) > 0)
    val nL = size(lines).cast("double")
    val bulletFrac = size(filter(lines,
      l => l.substr(lit(1), lit(1)).isin("-", "*", "•")))
      .cast("double") / greatest(nL, lit(1.0))
    val ellipsisFrac = size(filter(lines, l => endswith(l, lit("..."))))
      .cast("double") / greatest(nL, lit(1.0))
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / greatest(nW, lit(1.0))
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsis =
      (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val hashRatio = nHash.cast("double") / greatest(nW, lit(1.0))
    val ellipsisRatio = nEllipsis.cast("double") / greatest(nW, lit(1.0))
    val symbolOk = hashRatio <= 0.1 && ellipsisRatio <= 0.1
    val stopHits = size(array_intersect(
      array_distinct(transform(ws, w => lower(w))),
      typedLit(GopherStopWords)))
    val dupLineFrac = (nL - size(array_distinct(lines)).cast("double")) /
      greatest(nL, lit(1.0))
    def b(c: Column): Column = c.cast("int")
    Seq(
      "r_word_count" -> b(nW.between(50, 100000)),
      "r_mean_word_len" -> b(meanLen.between(3.0, 10.0)),
      "r_symbol_ratio" -> b(symbolOk),
      "r_bullet_lines" -> b(bulletFrac <= 0.9),
      "r_ellipsis_lines" -> b(ellipsisFrac <= 0.3),
      "r_alpha_words" -> b(alphaFrac >= 0.8),
      "r_stop_words" -> b(stopHits >= 2),
      "r_dup_lines" -> b(dupLineFrac <= 0.3),
      "keep" -> b(nW.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        symbolOk && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && stopHits >= 2 && dupLineFrac <= 0.3))
  }

  /** Gopher REPETITION rule suite (Rae et al. 2021, Table A1 — the
    * repetition-removal half of the published filter; [[gopherRules]]
    * covers the quality half plus the line-fraction tier). One boolean
    * column per published threshold (1 = pass), `keep_rep` their
    * conjunction:
    *
    *  - `r_dup_paragraphs`:   duplicate-paragraph fraction ≤ 0.30
    *  - `r_dup_para_chars`:   duplicate-paragraph character fraction ≤ 0.20
    *  - `r_dup_line_chars`:   duplicate-line character fraction ≤ 0.20
    *  - `r_top2gram_chars` / `r_top3gram_chars` / `r_top4gram_chars`:
    *    top word-n-gram character fraction ≤ 0.20 / 0.18 / 0.16
    *  - `r_dup5gram_chars` … `r_dup10gram_chars`: duplicate word-n-gram
    *    character fraction ≤ 0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10
    *
    * Exact accounting (the paper names the signals but not the
    * formulas; these are deterministic and SQL-replayable):
    * paragraphs split on blank lines ("\n\n"), lines on "\n", both
    * trimmed/non-empty; words are the [[gopherRules]] whitespace split;
    * n-grams join words with one space. Duplicate-unit CHARACTER
    * fractions count the characters of every occurrence BEYOND the
    * first of each duplicated unit, over the total text length. The
    * top-n-gram fraction is (count × n-gram length) / text length for
    * the most frequent n-gram (ties: the longest such n-gram — the one
    * covering the most characters). Duplicate-n-gram fractions count
    * ALL occurrences of n-grams appearing ≥ 2 times (count × length,
    * overlaps uncompensated — can exceed 1, which simply fails the
    * bound).
    *
    * Every signal is ROW-LOCAL and LINEAR: one codegen'd native
    * expression ([[graft.plans.NativeExpressions.GopherRepetition]])
    * computes all 12 counts + the conjunction in a single pass with
    * plain HashMaps. Two earlier cuts earned this: nested
    * `filter(units, _ === u)` HOFs re-evaluated the array per element
    * (the O(k²)-interpreted quantizeInt8 shape — minutes per sf0.01
    * batch), and the array_sort + struct-fold rewrite was linear but
    * still interpreted per COLUMN (~10 ms/row, 51 s for the t31b bench
    * row at sf0.1; now sub-second). The plan is a pure projection —
    * zero shuffles at any corpus size (pinned). */
  def gopherRepetitionRules(text: Column): Seq[(String, Column)] = {
    // ONE native expression computes all 12 signals + the conjunction in
    // a single pass (NativeExpressions.GopherRepetition — HashMap unit
    // counts, code-point lengths); whole-stage codegen's subexpression
    // elimination evaluates it once per row across the 13 field
    // projections. The first cut built each rule from array-HOF folds:
    // 13 columns x rebuilt shingle arrays x interpreted struct-folds
    // measured ~10 ms/row at sf0.1 — the r11 quantizeInt8 lesson, twice.
    val s = graft.plans.NativeExpressions.gopher_repetition(text)
    graft.plans.NativeExpressions.GopherRepetitionFields
      .map(f => f -> s.getField(f))
  }

  /** Character-COVERAGE accounting for the duplicate-n-gram tiers
    * (r15, t36 — the published Rae et al. Table A1 fidelity tier; see
    * [[graft.plans.NativeExpressions.gopherDupCoverageCompute]]): each
    * character counted once however many duplicated n-grams cover it,
    * where the default [[gopherRepetitionRules]] accounting counts
    * overlapping duplicated grams multiply (strictly stricter — drops
    * MORE, never fewer; pinned). Returns the struct column
    * (cov5gram_frac … cov10gram_frac, keep_rep_cov). Row-local, one
    * codegen'd pass, zero shuffles — same plan contract as the strict
    * tier. */
  def gopherDupCoverage(text: Column): Column =
    graft.plans.NativeExpressions.gopher_dup_coverage(text)

  /** The FULL published Gopher document filter: quality rules
    * ([[gopherRules]] `keep`) AND repetition rules
    * ([[gopherRepetitionRules]] `keep_rep`) — the gate a pretraining
    * pipeline (p8) applies. */
  def gopherKeepAll(text: Column): Column =
    gopherRules(text).toMap.apply("keep") === 1 &&
      gopherRepetitionRules(text).toMap.apply("keep_rep") === 1

  /** Deterministic repetition fixture for t31b: every 11th doc gains
    * three identical appended paragraphs (duplicate-paragraph tiers),
    * every 7th (not 11th) doc gains a 5-word phrase repeated 20 times
    * (top-n-gram + duplicate-n-gram tiers) — plain CASE + repeat both
    * engines compute identically. */
  def repetitionFixture(text: Column): Column =
    when(pmod(col("doc_id"), lit(11)) === 0,
      concat(text, lit("\n\npara one\n\npara one\n\npara one")))
      .when(pmod(col("doc_id"), lit(7)) === 0,
        concat(text, lit(" "),
          repeat(lit("badger mushroom snake gopher rae "), 20)))
      .otherwise(text)

  /** Deterministic multi-line fixture for the line-level Gopher rules:
    * the flat single-line test corpus gains bullets, ellipses,
    * duplicate-able lines and a second stop word ("of" — the corpus
    * vocabulary only carries "the", which alone can never satisfy the
    * ≥ 2-distinct-stop-words rule) through three plain (non-regex)
    * replaces that any engine applies identically. */
  def multiLineFixture(text: Column): Column =
    replace(
      replace(
        replace(text, lit(" table "), lit("\n- table ")),
        lit(" row "), lit("...\nrow ")),
      lit(" value "), lit(" of value "))

  /** Document fingerprint: polynomial rolling hash of the whole text
    * (portable) — pair with Dedup.minhashSignature for locality-sensitive
    * fingerprints. */
  def fingerprint(text: Column): Column = PortableHash.charFold(text)

  // ===================== PII scrubbing =====================

  /** Email/phone patterns, deliberately simple and portable (same
    * semantics in Java regex and RE2) — the patterns ARE the spec, shared
    * with the SQL oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]+"

  /** PII scrubbing: redact email addresses and phone numbers in place.
    * Two chained native `regexp_replace`s — row-local, codegen'd, zero
    * UDFs; at 100 TB this runs at scan speed with nothing to shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Duplicate n-gram fraction (the Gopher-style repetition quality
    * signal): 1 - distinct/total word n-grams. Pure array arithmetic on
    * one row — codegen'd, no shuffle, no UDF. */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    val total = greatest(size(ws) - (n - 1), lit(0))
    val sh = when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array())
    when(total > 0,
      (total - size(array_distinct(sh))).cast("double") / total)
      .otherwise(lit(0.0))
  }

  // ===================== benchmark decontamination =====================

  /** Word n-gram shingles of `textCol`, one output row per shingle.
    * Native sequence/slice/array_join — row-local, no UDF. */
  private def shingleRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val ws = split(col(textCol), " ")
    df.select(col(idCol), ws.as("__ws"))
      .withColumn("__i", explode(
        when(size(col("__ws")) >= n,
          sequence(lit(1), size(col("__ws")) - (n - 1)))
          .otherwise(array())))
      .select(col(idCol),
        array_join(slice(col("__ws"), col("__i"), lit(n)), " ").as("shingle"))
  }

  /** Benchmark decontamination (the eval-leakage guard every training
    * pipeline needs): flag corpus documents sharing any word n-gram with
    * the benchmark set. The benchmark side is tiny by definition (eval
    * suites), so its distinct shingles BROADCAST — the 100 TB corpus is
    * never shuffled; the probe is a map-side broadcast semi-join at scan
    * speed. Returns (id, n_shared) per contaminated document. */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val bench = shingleRows(benchmark, idCol, textCol, n)
      .select("shingle").distinct()
    shingleRows(corpus, idCol, textCol, n)
      .join(broadcast(bench), "shingle")
      .groupBy(idCol)
      .agg(countDistinct("shingle").as("n_shared"))
  }

  /** FUZZY benchmark decontamination — the near-duplicate tier
    * [[decontaminate]]'s exact n-gram probe cannot reach: an eval item
    * paraphrased, re-punctuated, or lightly edited into the training
    * corpus shares few exact n-grams but keeps a high shingle-set
    * Jaccard. The standard industrial guard (Llama-style) is
    * MinHash-LSH between corpus and benchmark with an exact-Jaccard
    * verify on the candidates. Returns (idCol, bench_id, j) for every
    * corpus document whose Jaccard with a benchmark document ≥
    * `jaccardMin`.
    *
    * Scale shape: the benchmark side is eval-suite-sized by definition,
    * so its band table AND its shingle sets both BROADCAST; candidates
    * are (bench × few)-bounded, so the verify probe broadcasts the
    * candidate list back into a map-side join against the corpus — the
    * 100 TB corpus is scanned (twice: band + verify), never shuffled,
    * and no all-pairs path exists. All sketches are the portable
    * minhash/banding used by the dedup cascade, so any engine replays
    * the whole chain.
    *
    * `maxBandSize` is the hot-band guard (the
    * [[Dedup.lshCandidatePairsCapped]] contract, r13): a degenerate
    * band key — empty-text shingles, boilerplate that collapses to one
    * signature — can put millions of corpus docs into one bucket, and
    * every one of them becomes a candidate against each bench doc
    * sharing the band, flooding the list the verify stage broadcasts
    * back. Corpus-side (band_id, band_hash) groups larger than the cap
    * are DROPPED before the bench join (a map-combinable count + a
    * broadcast anti-join against the few oversize keys). MISS
    * DIRECTION: a cap can only LOSE candidates, never invent them —
    * every surviving flag still passes the exact-Jaccard verify, so
    * precision is unaffected; a contaminated doc hiding in a dropped
    * hot band is missed (flag such corpora upstream — a band that hot
    * is boilerplate, which exact dedup should have removed first). The
    * default `Int.MaxValue` keeps the oracle-exact uncapped behavior;
    * [[decontaminateFuzzyCapped]] is the 100 TB preset. */
  def decontaminateFuzzy(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, jaccardMin: Double = 0.5,
      roundTo: Int = 6,
      maxBandSize: Int = Int.MaxValue): org.apache.spark.sql.DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"decontaminateFuzzy: bands ($bands) must divide numHashes ($numHashes)")
    require(jaccardMin >= 0.0 && jaccardMin <= 1.0,
      s"decontaminateFuzzy: jaccardMin must be in [0, 1], got $jaccardMin")
    require(maxBandSize > 0,
      s"decontaminateFuzzy: maxBandSize must be positive, got $maxBandSize")
    val rpb = numHashes / bands
    val cs = corpus.select(col(idCol),
        Dedup.shingleHashes(col(textCol), shingleN).as("__hs"))
      .withColumn("__sig", Dedup.minhashSignature(col("__hs"), numHashes))
    val bs = benchmark.select(col(idCol).as("bench_id"),
        Dedup.shingleHashes(col(textCol), shingleN).as("__bhs"))
      .withColumn("__bsig", Dedup.minhashSignature(col("__bhs"), numHashes))
    val cBands0 = Dedup.lshBands(cs.select(col(idCol), col("__sig")),
      idCol, "__sig", bands, rpb)
    val cBands =
      if (maxBandSize == Int.MaxValue) cBands0
      else {
        val oversize = cBands0.groupBy("band_id", "band_hash")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > maxBandSize)
          .select("band_id", "band_hash")
        cBands0.join(broadcast(oversize), Seq("band_id", "band_hash"),
          "left_anti")
      }
    val bBands = Dedup.lshBands(bs.select(col("bench_id"), col("__bsig")),
      "bench_id", "__bsig", bands, rpb)
    val cand = cBands.join(broadcast(bBands), Seq("band_id", "band_hash"))
      .select(col(idCol), col("bench_id")).distinct()
    val j = round(
      size(array_intersect(col("__hs"), col("__bhs"))).cast("double") /
        greatest(size(array_union(col("__hs"), col("__bhs"))).cast("double"),
          lit(1.0)), roundTo)
    cs.select(col(idCol), col("__hs"))
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(bs.select(col("bench_id"), col("__bhs"))),
        Seq("bench_id"))
      .select(col(idCol), col("bench_id"), j.as("j"))
      .filter(col("j") >= jaccardMin)
  }

  /** [[decontaminateFuzzy]] with the hot-band guard ON by default (cap
    * contract and rationale there) — the preset a 100 TB pipeline
    * should reach for; the uncapped variant exists for oracle-exact
    * runs. */
  def decontaminateFuzzyCapped(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, jaccardMin: Double = 0.5,
      roundTo: Int = 6,
      maxBandSize: Int = Dedup.DefaultMaxBucketSize): org.apache.spark.sql.DataFrame =
    decontaminateFuzzy(corpus, benchmark, idCol, textCol, shingleN,
      numHashes, bands, jaccardMin, roundTo, maxBandSize)

  // ===================== chunking =====================

  /** Token-window document chunking — the context-length prep step of a
    * training pipeline: whitespace tokens → windows of `size` tokens
    * advancing by `stride` (overlap = size − stride). One output row per
    * chunk with (chunk_idx, chunk text, token count). Row-local: the only
    * plan shape is project + explode, no shuffle — at 100 TB the chunker
    * runs at scan speed and parallelism follows the input partitioning.
    * A document shorter than one window still yields its single
    * (possibly short) chunk; empty/blank text yields none. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size0: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size0 > 0 && stride > 0 && stride <= size0,
      s"chunkTokens: need 0 < stride <= size, got size=$size0 stride=$stride")
    val ws = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    // number of windows: 1 + ceil(max(0, n - size) / stride)
    val n = size(ws)
    val nChunks = when(n === 0, lit(0)).otherwise(
      lit(1) + ceil((greatest(n - size0, lit(0))).cast("double") / stride)
        .cast("int"))
    df.select(col(idCol), ws.as("__ws"), nChunks.as("__nc"))
      .withColumn("chunk_idx", explode(
        when(col("__nc") > 0, sequence(lit(0), col("__nc") - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__ws"), col("chunk_idx") * stride + 1,
          lit(size0)), " ").as("chunk"),
        size(slice(col("__ws"), col("chunk_idx") * stride + 1,
          lit(size0))).as("chunk_tokens"))
  }

  // ===================== stratified sampling =====================

  /** Deterministic stratified sampling: keep a per-stratum fraction by
    * hash-bucketing a key column with the portable polynomial hash —
    * reproducible across engines, runs, and cluster layouts (no RNG
    * state), and row-local (a scan-speed filter, no shuffle, no
    * per-stratum pass). Strata absent from `fractions` use `default`.
    * Buckets are per-mille: a fraction of 0.25 keeps hash%1000 < 250. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, strataCol: String,
      keyCol: String, fractions: Map[String, Double],
      default: Double = 0.0): org.apache.spark.sql.DataFrame = {
    val bucket = pmod(PortableHash.charFold(col(keyCol).cast("string")),
      lit(1000L))
    val threshold = fractions.foldLeft(lit(default * 1000)) {
      case (acc, (k, frac)) =>
        when(col(strataCol) === k, lit(frac * 1000)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  // ===================== bigram-LM perplexity =====================

  /** Train an add-k bigram language model over the corpus (the CCNet-style
    * quality model: documents are later bucketed by perplexity under a
    * model of the corpus itself, or of a clean reference corpus).
    *
    * Vocabulary is CAPPED at `maxVocab` tokens (by count desc, token asc —
    * deterministic); everything else maps to UNK. The bigram table is
    * ALSO capped, at `maxBigrams` entries (by count desc, pair asc), with
    * the dropped tail folding into the add-k smoothing floor (a missing
    * bigram scores as count 0 — exactly what add-k smoothing assigns any
    * unseen pair). So model state is bounded by CONFIGURATION, not corpus:
    * vocab ≤ maxVocab+1 and bigrams ≤ maxBigrams no matter how much of
    * the (V+1)² pair ceiling a 100 TB corpus realizes — without the cap a
    * 64k vocab admits 4×10⁹ observable pairs and the driver collect (and
    * broadcast) becomes the bottleneck. The top-B retention plans as
    * TakeOrderedAndProject (per-partition heads + driver merge), never a
    * full sort. Training is two map-side-combinable groupBy passes (one
    * shuffle each); the resulting model broadcasts once per executor — at
    * 100 TB this is the standard train-once/ship-model/score-at-scan-speed
    * shape. */
  def trainBigramModel(df: org.apache.spark.sql.DataFrame, textCol: String,
      maxVocab: Int, k: Double = 1.0,
      maxBigrams: Int = 1 << 20): graft.plans.BigramModel = {
    import org.apache.spark.unsafe.types.UTF8String
    val spark = df.sparkSession
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val tokRows = df.select(toks.as("__t"))
    // pass 1: unigram counts -> top-maxVocab vocabulary + UNK mass
    val uni = tokRows.select(explode(col("__t")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val top = uni.orderBy(desc("c"), col("t")).limit(maxVocab).collect()
    val vocabSet = top.map(_.getString(0)).toSet
    // corpus scalars in ONE scan (r15): total token count == sum of the
    // unigram counts (exact long — every token explodes to one row), and
    // the non-empty-doc count, both straight off the token arrays. The
    // old form re-ran the whole explode+groupBy unigram aggregation for
    // the sum and paid a FOURTH tokenize pass for the doc count.
    val st = tokRows.agg(
      sum(size(col("__t")).cast("long")).as("tt"),
      count(when(size(col("__t")) > 0, lit(1))).as("nd")).head()
    val totalToks = if (st.isNullAt(0)) 0L else st.getLong(0)
    val nDocs = st.getLong(1)
    val unkCount = totalToks - top.map(_.getLong(1)).sum
    val vocab = new java.util.HashMap[UTF8String, java.lang.Long]()
    top.foreach(r => vocab.put(UTF8String.fromString(r.getString(0)),
      java.lang.Long.valueOf(r.getLong(1))))
    vocab.put(UTF8String.fromString(graft.plans.BigramModel.UnkStr),
      java.lang.Long.valueOf(unkCount))
    // pass 2: bigram counts over the UNK-mapped token stream (BOS first).
    // The vocab probe is a broadcast (a vocab-only prelim model), row-local;
    // counting is one map-side-combinable groupBy.
    val prelim = new graft.plans.BigramModel(vocab,
      new java.util.HashMap[UTF8String, java.lang.Long](), 0L,
      vocab.size().toLong, k)
    val bcPrelim = spark.sparkContext.broadcast(prelim)
    val mapped = tokRows.select(
      graft.plans.NativeExpressions.vocab_map(col("__t"), bcPrelim).as("__m"))
    val pairs = mapped
      .filter(size(col("__m")) > 0)
      .select(explode(concat(
        array(concat(lit(graft.plans.BigramModel.BosStr +
            graft.plans.BigramModel.SepStr), element_at(col("__m"), 1))),
        when(size(col("__m")) > 1,
          transform(sequence(lit(2), size(col("__m"))),
            i => concat(element_at(col("__m"), i - 1),
              lit(graft.plans.BigramModel.SepStr), element_at(col("__m"), i))))
          .otherwise(array().cast("array<string>")))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("pair"))
      .limit(maxBigrams)
      .collect()
    val bigrams = new java.util.HashMap[UTF8String, java.lang.Long]()
    pairs.foreach(r => bigrams.put(UTF8String.fromString(r.getString(0)),
      java.lang.Long.valueOf(r.getLong(1))))
    new graft.plans.BigramModel(vocab, bigrams, nDocs, vocab.size().toLong, k)
  }

  // ===================== TF-IDF =====================

  /** Top-k characteristic terms per document by smoothed TF-IDF:
    * score = tf · (ln((N+1)/(df+1)) + 1), rounded to `roundTo`; rank
    * (score desc, term asc). Scale shape: per-(doc,term) counts are one
    * map-side-combinable groupBy; document frequencies aggregate FROM
    * that result (no second corpus scan). The idf join is left to AQE:
    * vocabulary is NOT bounded for web text (typos/URLs grow distinct
    * terms with the corpus), so a forced broadcast would OOM executors
    * where an AQE-chosen sort-merge join degrades gracefully — AQE
    * broadcasts exactly when the measured df side is small. The final
    * top-k window repartitions by doc only. */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val nDocs = df.count()
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val tf = df.select(col(idCol), explode(toks).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(desc("score"), col("term"))
    tf.join(dfc, "term")
      .select(col(idCol), col("term"),
        round(col("tf").cast("double") *
          (log(lit(nDocs + 1.0) / (col("df").cast("double") + 1.0)) + 1.0),
          roundTo).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Score documents under a trained bigram model: per-doc log-probability
    * (BOS-conditioned, add-k smoothed — the exact fold of
    * [[graft.plans.NativeExpressions.bigramLogProbCompute]]) and perplexity
    * exp(−logp/n). ROW-LOCAL scoring: the model is a broadcast, the pass is
    * one codegen'd expression — no joins, no shuffles; documents with zero
    * tokens get NULL perplexity. Returns (idCol, n_tokens, ppl). */
  def bigramPerplexity(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, model: graft.plans.BigramModel,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val n = size(toks)
    val logp = graft.plans.NativeExpressions.bigram_log_prob(toks, bc)
    df.select(col(idCol), n.cast("long").as("n_tokens"),
      when(n > 0, round(exp(-logp / n), roundTo)).as("ppl"))
  }

  // ===================== BM25 retrieval =====================

  /** BM25 top-k document retrieval for a literal query-term list — the
    * full-text-search primitive of a curation stack, and the lexical half
    * of hybrid retrieval next to the ANN tier in
    * [[graft.operators.Similarity]].
    *
    * Scale shape: only the QUERY's terms matter, so corpus statistics are
    * ONE map-side-combinable aggregate pass (N, total token count for
    * avgdl, and one document frequency per query term — a handful of
    * scalars, never a vocabulary table); the collected scalars fold into
    * the scoring expression as literals, so scoring is a row-local
    * codegen'd pass — no joins, no shuffles — and the top-k is
    * TakeOrderedAndProject (per-partition heads + driver merge), never a
    * full sort. idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always positive);
    * documents matching no query term are filtered before the top-k.
    * Returns (idCol, score) with score rounded to `roundTo`; ties on the
    * rounded score break by id so the cutoff is deterministic. */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.distinct
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val statAggs = sum(size(toks).cast("long")).as("tt") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(toks, lit(t)), 1L).otherwise(0L)).as(s"df$i") }
    val stat = df.agg(count(lit(1)).as("n"), statAggs: _*).head()
    val n = stat.getLong(0)
    require(n > 0, "bm25TopK: empty corpus (no documents to score)")
    val avgdl = stat.getLong(1).toDouble / n
    val dl = size(toks).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = stat.getLong(2 + i)
      val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
      val tf = size(filter(toks, x => x === lit(t))).cast("double")
      lit(idf) * tf * (lit(k1) + lit(1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    df.select(col(idCol), round(score, roundTo).as("score"))
      .filter(col("score") > 0)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  // ===================== line-level corpus dedup =====================

  /** Boilerplate line removal (the RefinedWeb / CCNet line-level dedup
    * pass): drop every line occurring in at least `minDocs` DISTINCT
    * documents (headers, footers, cookie banners, nav text), keeping each
    * document's remaining lines in their original order. Returns
    * (idCol, text cleaned, n_removed). Whitespace-only lines are ignored
    * on both the counting and the output side.
    *
    * Scale shape: the only corpus-wide pass is a map-side-combinable
    * groupBy over each document's DISTINCT lines (one shuffle of line
    * tokens, counting documents per line); the surviving dup set is
    * boilerplate-scale by construction (every member occurs in ≥ minDocs
    * docs, so there are at most totalLines/minDocs of them) and rides a
    * single-row broadcast array; cleaning is then a row-local array-HOF
    * filter — the corpus itself is NEVER shuffled and document text never
    * leaves its scan partition. For a pathologically large dup set, raise
    * `minDocs` (the set shrinks as 1/minDocs). */
  def lineDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minDocs: Int,
      delim: String = "\n"): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"lineDedup: need minDocs >= 2, got $minDocs")
    val lines = filter(
      split(col(textCol), java.util.regex.Pattern.quote(delim)),
      l => length(trim(l)) > 0)
    val dups = df
      .select(explode(array_distinct(lines)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .agg(sort_array(collect_list("line")).as("__dups"))
    df.crossJoin(org.apache.spark.sql.functions.broadcast(dups))
      .select(col(idCol),
        filter(lines, l => !array_contains(col("__dups"), l)).as("__kept"),
        size(lines).as("__n"))
      .select(col(idCol), array_join(col("__kept"), delim).as("text"),
        (col("__n") - size(col("__kept"))).cast("long").as("n_removed"))
  }

  // ===================== sequence packing =====================

  /** Sequence packing — the concat-and-split step that turns curated
    * documents into fixed-size training contexts: conceptually the token
    * streams concatenate in id order and split at `capacity` boundaries;
    * each row reports its byte-in-stream position (`offset`) and the
    * first/last context bin it lands in (`bin_first`/`bin_last` — a row
    * crossing a boundary spans bins, exactly the spillover a packed
    * pretraining loader splits or truncates).
    *
    * Scale shape: packing is SHARD-LOCAL — rows hash (portable, layout-
    * independent) into `shards` independent streams, so the only plan is
    * one shuffle on shard + a per-shard ordered running sum; parallelism
    * is `shards`, and the assignment is deterministic across engines,
    * runs, and cluster layouts (hash + id order, no sequential driver
    * state). A global single-stream pack would serialize the corpus —
    * per-shard streams are how packing actually parallelizes. */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      tokensCol: String, capacity: Int,
      shards: Int = 256): org.apache.spark.sql.DataFrame = {
    require(capacity > 0 && shards > 0,
      s"packSequences: need capacity > 0 and shards > 0, " +
        s"got capacity=$capacity shards=$shards")
    val shard = pmod(PortableHash.charFold(col(idCol).cast("string")),
      lit(shards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tk = col(tokensCol).cast("long")
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(tk).over(w))
      .select(col(idCol), col("shard"),
        (col("__cum") - tk).as("offset"),
        floor((col("__cum") - tk) / capacity).as("bin_first"),
        when(tk > 0, floor((col("__cum") - 1) / capacity))
          .otherwise(floor((col("__cum") - tk) / capacity)).as("bin_last"),
        tk.as("tokens"))
  }

  // ===================== quota sampling =====================

  /** Skew-safe per-group quota sampling ("cap any one domain's share"):
    * keep at most `cap` rows per group, best-first by (scoreCol desc,
    * idCol asc). Runs in two phases: a SALTED local top-cap first, which
    * bounds any single group's phase-2 input at cap·salts rows — a hot
    * domain holding 30% of a 100 TB corpus would otherwise serialize one
    * giant window partition — then the exact global top-cap over the
    * bounded survivors. Phase 1 is LOSSLESS for the final answer: a row
    * in the global top `cap` is necessarily in its salt bucket's top
    * `cap` (both phases share one ordering). Deterministic: the salt is
    * the portable hash of the id, so reruns keep identical rows. */
  def quotaSample(df: org.apache.spark.sql.DataFrame, groupCol: String,
      scoreCol: String, idCol: String, cap: Int,
      salts: Int = 32): org.apache.spark.sql.DataFrame = {
    require(cap > 0 && salts > 0,
      s"quotaSample: need cap > 0 and salts > 0, got cap=$cap salts=$salts")
    val salt = pmod(PortableHash.charFold(col(idCol).cast("string")),
      lit(salts.toLong))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), salt)
      .orderBy(desc(scoreCol), col(idCol))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(desc(scoreCol), col(idCol))
    df.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= cap)
      .withColumn("__r2", row_number().over(w2))
      .filter(col("__r2") <= cap)
      .drop("__r1", "__r2")
  }

  // ===================== linear quality scoring =====================

  /** Hashing-trick linear scorer — the fastText-style shallow-classifier
    * SERVING shape: tokens hash into `dim` buckets with the portable
    * hash, bucket hits dot a weight vector, and the token-normalized sum
    * passes through a sigmoid. Any trained weight vector plugs in
    * (`weights`, shipped once as a plan literal / broadcast); the default
    * is a fixed pseudo-random vector (Knuth-hash derived) so scoring is
    * fully deterministic and the oracle can replay it end to end —
    * training is out of scope here, serving the model at scan speed is
    * the graded shape. Row-local codegen: no joins, no shuffles.
    * Returns (idCol, n_tokens, score). */
  def linearScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 64,
      weights: Option[Array[Double]] = None,
      bias: Double = 0.0,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"linearScore: need dim > 0, got $dim")
    val w = weights.getOrElse(
      Array.tabulate(dim)(i => ((i * 2654435761L) % 1000L) / 1000.0 - 0.5))
    require(w.length == dim,
      s"linearScore: weights.length ${w.length} != dim $dim")
    // typed array literal (reference-slot codegen): linearScore serves
    // right after a trainer in t33/t37/p9, and the inlined-constant form
    // forced one more fresh Janino compile per query (see trainLogistic)
    val wLit = typedLit(w.toSeq)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val n = size(toks)
    // hash per token, then ONE codegen'd gather-sum (the HOF fold ran
    // an interpreted lambda per token on the serving hot path)
    val dot = graft.plans.NativeExpressions.bucket_gather_sum(
      graft.plans.NativeExpressions.hash_buckets(
        toks, dim.toLong, PortableHash.Mult, PortableHash.Mod),
      wLit)
    val z = when(n > 0, dot / n + bias).otherwise(lit(bias))
    df.select(col(idCol), n.cast("long").as("n_tokens"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), roundTo).as("score"))
  }

  // ===================== corpus profiling =====================

  /** Per-source corpus profile — the summary report a curation run opens
    * with: document count, token volume, mean/exact-median/exact-p90
    * document length. ONE map-side-combinable aggregate pass; the exact
    * percentiles use Spark's `percentile` (sorted interpolation), whose
    * per-group state is the value multiset — fine for LENGTH distributions
    * (bounded distinct values), and the honest choice where a hash-match
    * oracle needs exact answers. For arbitrary-cardinality metrics at
    * 100 TB swap in percentile_approx (t-digest state) at the call site. */
  def corpusStats(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      textCol: String, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val toks = tokenCount(col(textCol)).cast("long")
    val len = length(col(textCol)).cast("long")
    df.select(col(sourceCol), toks.as("__tk"), len.as("__len"))
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tk")).as("tokens"),
        round(avg(col("__len")), roundTo).as("mean_chars"),
        round(expr("percentile(__len, 0.5)"), roundTo).as("p50_chars"),
        round(expr("percentile(__len, 0.9)"), roundTo).as("p90_chars"))
  }

  // ===================== mixture sampling =====================

  /** Temperature-weighted source mixture (the multi-source sampling step
    * of training-data assembly): a source s with c_s documents gets
    * mixture weight w_s ∝ c_s^alpha (alpha < 1 flattens the mix toward
    * small sources; alpha = 1 is natural sampling), and the per-source
    * keep fraction targeting ~`targetRows` total is
    * min(1, targetRows·(w_s/Σw)/c_s). Rows are then kept by the same
    * deterministic portable-hash per-mille rule as [[stratifiedSample]] —
    * reproducible across engines, runs, and cluster layouts, with no RNG
    * state to checkpoint.
    *
    * Scale shape: the counts pass is one map-side-combinable aggregate
    * whose cardinality is the number of SOURCES (pipeline-config scale,
    * collected safely); the keep rule is a row-local scan-speed
    * predicate — the corpus is never shuffled. */
  def mixtureSample(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      keyCol: String, alpha: Double,
      targetRows: Long): org.apache.spark.sql.DataFrame = {
    require(alpha >= 0, s"mixtureSample: need alpha >= 0, got $alpha")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    val pows = counts.map { case (s, c) =>
      (s, c, math.pow(c.toDouble, alpha)) }
    val z = pows.map(_._3).sum
    // The per-mille threshold is QUANTIZED (floor(round(f·1000, 6))) so a
    // last-ulp pow/sum difference between engines cannot flip the integer
    // bucket comparison when f·1000 lands on an integer boundary — any
    // engine replaying counts → weights → thresholds lands on the same
    // integer.
    val permille = pows.map { case (s, c, w) =>
      val f = math.min(1.0, targetRows * (w / z) / c)
      (s, math.floor(BigDecimal(f * 1000)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong)
    }.toMap
    val bucket = pmod(PortableHash.charFold(col(keyCol).cast("string")),
      lit(1000L))
    val threshold = permille.foldLeft(lit(0L)) { case (acc, (k, p)) =>
      when(col(sourceCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  // ===================== BPE tokenizer =====================

  /** End-of-word marker symbol (classic Sennrich BPE): lets merges learn
    * suffixes without crossing word boundaries. */
  val BpeEow = "</w>"

  /** Train a byte-pair-encoding merge sequence (Sennrich et al. 2016 —
    * the real-token-count upgrade over [[roughPieceCount]] for
    * context-length prep and mixture accounting).
    *
    * Words are restricted to `[a-z]+` after lower-casing (the portable
    * subset every engine tokenizes identically); each becomes a char
    * sequence + [[BpeEow]]. Per round, the most frequent adjacent symbol
    * pair merges (ties break to the lexicographically SMALLEST pair, so
    * training is fully deterministic); `numMerges` rounds produce the
    * ordered merge table that IS the model.
    *
    * Scale shape (100 TB): the corpus is touched EXACTLY ONCE — the word
    * histogram is BPE training's sufficient statistic, and it's one
    * map-side-combinable count shuffle capped at `maxWords` entries by
    * (count desc, word asc) — a TakeOrderedAndProject, never a full
    * sort. The merge iterations then run driver-local over that
    * CONFIGURATION-bounded histogram (same bounded-state contract as
    * [[trainBigramModel]]): state ≤ maxWords rows regardless of corpus
    * size, and no per-round corpus passes — the naive formulation
    * re-scans the corpus numMerges times. The cap genuinely bites:
    * truncating the histogram changes pair statistics, so a capped model
    * can differ from an uncapped one (pinned in TrainingOpsSpec). */
  def trainBpe(df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxWords: Int = 10000): Seq[(String, String)] = {
    require(numMerges > 0, s"trainBpe: need numMerges > 0, got $numMerges")
    require(maxWords > 0, s"trainBpe: need maxWords > 0, got $maxWords")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => t.rlike("^[a-z]+$"))
    val hist = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    bpeMergeLoop(hist.map { case (w, n) =>
      (w.split("").filter(_.nonEmpty) :+ BpeEow, n)
    }, numMerges)
  }

  /** The driver-local Sennrich merge loop over a (symbols, count)
    * histogram — shared by the char-level ([[trainBpe]]) and byte-level
    * ([[trainBpeBytes]]) trainers; only the base-alphabet init differs.
    * State ≤ histogram rows, no corpus passes. */
  private def bpeMergeLoop(init: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words = init
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        merges += best
        words = words.map { case (syms, n) => (mergeOnce(syms, best), n) }
        round += 1
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping pass replacing adjacent (a, b)
    * with ab — the classic greedy merge application. */
  private def mergeOnce(syms: Array[String],
      p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (syms(j) + syms(j + 1)); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Row-local BPE encoder: apply a trained merge table to a text
    * column, returning the array of pieces (per token: chars + EOW,
    * merges applied IN TRAINING ORDER, each as a left-to-right
    * non-overlapping replace — exactly [[mergeOnce]]'s rule, realized on
    * the " a  b "-spaced symbol string so a literal `replace` is the
    * merge).
    *
    * Scale shape: whole-stage-codegen'd column expression — zero joins,
    * zero shuffles, scan-speed at 100 TB. The merge table embeds as
    * plan literals: numMerges short strings (a few KB at the usual
    * 10k-merge vocab), nothing like the broadcast-requiring vector
    * codebooks — train once, encode everywhere. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"),
      t => t.rlike("^[a-z]+$"))
    val pieces = transform(toks, t => {
      // "cat" -> " c  a  t  </w> ": every symbol wrapped in single
      // spaces, so adjacent symbols are double-spaced and a merge is a
      // plain string replace of " a  b " with " ab "
      val spaced0 = concat(regexp_replace(t, "(.)", " $1 "),
        lit(" " + BpeEow + " "))
      val merged = merges.foldLeft(spaced0) { case (c, (a, b)) =>
        replace(c, lit(s" $a  $b "), lit(s" $a$b "))
      }
      split(trim(merged), "\\s+")
    })
    flatten(pieces)
  }

  /** True model-based token count — [[bpeEncode]] piece count. */
  def bpePieceCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeEncode(text, merges))

  /** Broadcast a trained merge table as a serving-shape
    * [[graft.plans.BpeModel]] (train once, broadcast everywhere — the
    * Codebook/PqLutMap convention). */
  def bpeModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)])
      : org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel] =
    spark.sparkContext.broadcast(new graft.plans.BpeModel(merges, BpeEow))

  /** PRODUCTION-shape BPE encoder: same tokenization and output contract
    * as [[bpeEncode]], but the merge table rides as ONE broadcast and
    * each word is encoded by the standard lowest-rank-first loop inside
    * a codegen'd native expression — per-token cost is O(word_len ·
    * merges_applied), independent of the table size, vs the replace
    * chain's O(total_merges) string passes per token and plan-literal
    * blowup past a few hundred merges. Use this at real vocabularies
    * (1k-32k merges); [[bpeEncode]] remains the plan-literal tier for
    * toy tables and cross-engine chain replay. Row-local, zero shuffle
    * (plan-pinned in ScaleDesignSpec). */
  def bpeEncodeFast(text: Column,
      model: org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel])
      : Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"),
      t => t.rlike("^[a-z]+$"))
    graft.plans.NativeExpressions.bpe_encode_bc(toks, model)
  }

  /** [[bpeEncodeFast]] piece count. */
  def bpePieceCountFast(text: Column,
      model: org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel])
      : Column =
    size(bpeEncodeFast(text, model))

  /** Sliding adjacent-word concatenations of the [a-z]+ tokens as a
    * space-joined text column — the t28b fixture derivation (the
    * synthetic corpus' 31-word vocabulary saturates BPE training at
    * ~107 merges; pairing gives ~31² distinct word forms). ONE
    * definition serves both the model trainer (BpeSnapshotMain) and the
    * serving query, so the shipped 1k-merge model can never drift from
    * its corpus derivation. */
  def pairEnrich(text: Column): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"),
      t => t.rlike("^[a-z]+$"))
    val n = greatest(size(toks) - 1, lit(0))
    array_join(zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat(a, b)), " ")
  }

  // ============ byte-level (UTF-8) BPE tier ============

  /** Byte-level pre-tokenizer pattern: maximal runs of Unicode
    * letters/digits, or maximal runs of non-space punctuation — the
    * portable core of the GPT-2 pre-tokenizer (contraction special
    * cases dropped; they need lookarounds not every engine shares).
    * Unlike [[trainBpe]]'s `[a-z]+` filter this DROPS NOTHING: every
    * non-space character of any script lands in exactly one token. */
  val BytePretok = "[\\p{L}\\p{N}]+|[^\\s\\p{L}\\p{N}]+"

  /** Pre-tokenize for the byte-level tier (see [[BytePretok]]) —
    * case-preserving, script-agnostic, loss-free. */
  def byteTokens(text: Column): Column =
    regexp_extract_all(text, lit(BytePretok), lit(0))

  /** A word's UTF-8 bytes as lowercase hex-pair symbols — the
    * byte-level base alphabet ("é" → "c3","a9"). Driver-side twin of
    * [[graft.plans.BpeModel]]'s byte-level init; any SQL engine replays
    * it as `lower(hex(encode(word)))` split into 2-char groups. */
  def hexPairsOf(w: String): Array[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x")

  /** Byte-level BPE training (the production-fidelity upgrade over
    * [[trainBpe]], whose `[a-z]+` tokenizer drops every non-ASCII
    * token): words come from [[byteTokens]] (nothing dropped, any
    * script), the base alphabet is the 256 UTF-8 byte values as hex
    * pairs, and the merge loop is [[bpeMergeLoop]] unchanged. Same
    * scale shape as [[trainBpe]]: ONE map-combinable histogram pass
    * capped at `maxWords` rows (TakeOrderedAndProject), then
    * driver-local rounds over configuration-bounded state. */
  def trainBpeBytes(df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxWords: Int = 10000): Seq[(String, String)] = {
    require(numMerges > 0, s"trainBpeBytes: need numMerges > 0, got $numMerges")
    require(maxWords > 0, s"trainBpeBytes: need maxWords > 0, got $maxWords")
    val hist = df.select(explode(byteTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    bpeMergeLoop(hist.map { case (w, n) =>
      (hexPairsOf(w) :+ BpeEow, n)
    }, numMerges)
  }

  /** Broadcast a byte-level merge table as a serving-shape
    * [[graft.plans.BpeModel]] in byte-level mode. */
  def bpeModelBytes(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)])
      : org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel] =
    spark.sparkContext.broadcast(
      new graft.plans.BpeModel(merges, BpeEow, byteLevel = true))

  /** Byte-level serving encoder: [[byteTokens]] pre-tokenization (no
    * token of any script is dropped — the multilingual-fidelity bound
    * [[bpeEncodeFast]] carries), then the same ONE-broadcast
    * lowest-rank-first native loop over hex-pair byte symbols.
    * Row-local, zero shuffles, per-token cost independent of the merge
    * table size (plan-pinned in ScaleDesignSpec). */
  def bpeEncodeBytesFast(text: Column,
      model: org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel])
      : Column =
    graft.plans.NativeExpressions.bpe_encode_bc(byteTokens(text), model)

  /** [[bpeEncodeBytesFast]] piece count. */
  def bpePieceCountBytesFast(text: Column,
      model: org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel])
      : Column =
    size(bpeEncodeBytesFast(text, model))

  /** Encode straight to TOKEN IDS — the shape a training pipeline
    * actually persists (ints, not piece strings; 4 bytes/token):
    * the same byte-level lowest-rank-first loop, each piece mapped
    * through the model's CLOSED vocabulary (ids 0-255 = bytes, 256 =
    * EOW, 257+r = merge r — no UNK path exists, any text encodes).
    * Row-local, zero shuffles, one broadcast. */
  def bpeEncodeIdsBytes(text: Column,
      model: org.apache.spark.broadcast.Broadcast[graft.plans.BpeModel])
      : Column =
    graft.plans.NativeExpressions.bpe_encode_ids_bc(byteTokens(text), model)

  /** Decode a byte-level piece stream back to text ([[bpeEncodeBytesFast]]'s
    * inverse up to the pre-tokenizer: tokens come back space-joined).
    * Pieces are concatenations of hex-pair byte symbols terminated by
    * [[BpeEow]], so decoding is split-on-EOW → unhex → UTF-8 — row-local
    * column ops, zero shuffles. The loss-free-alphabet property
    * (TrainingPropertySpec) pins decode(encode(text)) ==
    * space-joined byteTokens(text) on random mixed-script corpora. */
  def bpeDecodeBytes(pieces: Column): Column = {
    // split takes a REGEX — quote the marker so a future EOW choice
    // containing metacharacters cannot silently change the splitting
    val words = filter(
      split(concat_ws("", pieces), java.util.regex.Pattern.quote(BpeEow)),
      w => length(w) > 0)
    array_join(transform(words, w => decode(unhex(w), "UTF-8")), " ")
  }

  /** Byte-level twin of [[pairEnrich]]: sliding adjacent-token
    * concatenations of the [[byteTokens]] stream (case-preserving, all
    * scripts and punctuation kept) as a space-joined text column — the
    * t28c fixture derivation, one definition for trainer, serving
    * query, and oracle. */
  def pairEnrichBytes(text: Column): Column = {
    val toks = byteTokens(text)
    val n = greatest(size(toks) - 1, lit(0))
    array_join(zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat(a, b)), " ")
  }

  /** Deterministic mixed-script derivation over the (all-ASCII)
    * synthetic corpus: per-language chained literal replaces introduce
    * 2-byte Latin accents (fr/de/es), 3-byte CJK (zh), and punctuation
    * adjacent to letters (en) — the byte-level tier's test diet. Every
    * engine computes the identical text (plain `replace` chains, no
    * regex), so the t28c oracle rebuilds the same fixture. */
  def mixedScriptFixture(text: Column, lang: Column): Column =
    when(lang === "fr",
      replace(replace(text, lit("e"), lit("é")), lit("c"), lit("ç")))
      .when(lang === "de",
        replace(replace(text, lit("a"), lit("ä")), lit("u"), lit("ü")))
      .when(lang === "es",
        replace(replace(text, lit("n"), lit("ñ")), lit("o"), lit("ó")))
      .when(lang === "zh",
        replace(replace(replace(text, lit("data"), lit("数据")),
          lit("table"), lit("表")), lit("query"), lit("查询")))
      .otherwise(
        replace(replace(text, lit("slow"), lit("slow,")),
          lit("fast"), lit("fast!")))

  // ============ DSIR importance weights (data selection) ============

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * each document by how much more likely its hashed-token profile is
    * under the TARGET slice of the corpus than under the RAW corpus —
    * `log w(doc) = Σ_tokens (log p_T(bucket(tok)) − log p_R(bucket(tok)))`
    * with add-1 smoothed bucket probabilities. High-weight documents are
    * the ones importance resampling would keep when curating toward the
    * target distribution.
    *
    * Scale shape: ONE corpus pass builds both bucket profiles together
    * (explode → a map-combinable two-counter aggregation over `buckets`
    * groups — driver state is `buckets` rows, bounded by CONFIGURATION);
    * the per-document score is then a row-local fold with the B log-ratio
    * values inlined as plan literals (the BM25 stats-fold pattern), so
    * the scoring pass has zero joins and zero shuffles and stays inside
    * whole-stage codegen. Token buckets use [[PortableHash.charFold]]
    * mod `buckets`, so a SQL oracle replays the identical features.
    * Returns (idCol, weight) with the weight rounded to `roundTo`. */
  def dsirWeights(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, target: Column, buckets: Int = 64,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "dsirWeights: buckets must be positive")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    dsirProfileFold(df, idCol, bucketArr, target, buckets, roundTo)
  }

  /** DSIR weights over hashed N-GRAM features — unigrams AND bigrams
    * hashed into one shared B-bucket space, the feature set the Xie et
    * al. estimator actually separates quality domains with (a unigram
    * profile is order-blind: "new york" and "york new" score
    * identically; the bigram features split them). The bigram feature
    * combines the two token hashes with the same polynomial fold the
    * substring-window fingerprints use, so any SQL engine replays it.
    * Identical scale shape to [[dsirWeights]]: one corpus pass, ≤ B
    * driver rows, zero-join zero-shuffle row-local scoring fold. */
  def dsirWeightsNgram(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, target: Column, buckets: Int = 64,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "dsirWeightsNgram: buckets must be positive")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val th = transform(toks, t => PortableHash.charFold(t))
    val uni = transform(th, h => pmod(h, lit(buckets.toLong)))
    val nBi = greatest(size(th) - 1, lit(0))
    val bi = zip_with(slice(th, lit(1), nBi), slice(th, lit(2), nBi),
      (a, b) => pmod(pmod(a * lit(1000003L) + b, lit(PortableHash.Mod)),
        lit(buckets.toLong)))
    dsirProfileFold(df, idCol, concat(uni, bi), target, buckets, roundTo)
  }

  /** Shared DSIR estimator body: one map-combinable two-counter profile
    * pass over the feature-bucket array (≤ `buckets` rows to the
    * driver), add-1 smoothed log-ratios inlined as plan literals, then
    * a row-local scoring fold — zero joins, zero shuffles. */
  private def dsirProfileFold(df: org.apache.spark.sql.DataFrame,
      idCol: String, bucketArr: Column, target: Column, buckets: Int,
      roundTo: Int): org.apache.spark.sql.DataFrame = {
    val prof = df.select(target.as("t"), explode(bucketArr).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("raw"),
        sum(when(col("t"), 1L).otherwise(0L)).as("tgt"))
      .collect() // ≤ buckets rows — bounded by configuration, not corpus
    val rawTotal = prof.map(_.getLong(1)).sum.toDouble
    val tgtTotal = prof.map(_.getLong(2)).sum.toDouble
    require(tgtTotal > 0, "dsirWeights: target slice matches no tokens")
    val byBucket = prof.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // add-1 smoothing over the full bucket space so unseen buckets (in
    // either distribution) contribute a finite, symmetric prior
    val logRatio: IndexedSeq[Double] = (0 until buckets).map { b =>
      val (raw, tgt) = byBucket.getOrElse(b.toLong, (0L, 0L))
      math.log((tgt + 1.0) / (tgtTotal + buckets)) -
        math.log((raw + 1.0) / (rawTotal + buckets))
    }
    // ONE codegen'd gather-sum over a typed array literal (r15): the
    // `aggregate` HOF ran an interpreted lambda per TOKEN on the scoring
    // hot path, and the B inlined double constants forced a fresh Janino
    // compile per query. Same left-to-right IEEE fold over the same
    // doubles (acc + lr[b], token order) — value-identical.
    val lrArr = typedLit(logRatio.toSeq)
    val w = graft.plans.NativeExpressions.bucket_gather_sum(bucketArr, lrArr)
    df.select(col(idCol), round(w, roundTo).as("weight"))
  }

  // ============ trained quality classifier (t33/t34/p9) ============

  /** Decimal HALF_UP rounding (matches Spark SQL `round` and DuckDB
    * `round`) — the trainer's update rounding must use the same decimal
    * semantics both engines serve, or the replayed trajectories diverge
    * at the first boundary-adjacent update. */
  private def roundHalfUp(x: Double, roundTo: Int): Double =
    BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Scale-adaptive partition count for the trainers' feature pass
    * (r15, guide §2.2): the gradient fold is ~µs/doc of row-local CPU,
    * so one task per ~1k docs already saturates it, while the per-STEP
    * fixed cost scales with M×R shuffle blocks — the old constant
    * `defaultParallelism` made a 250-doc seed pay 32 task launches and
    * 32×32 tiny shuffle-file creations per step (thread-dumped as
    * BypassMergeSortShuffleWriter NIO copies dominating executor CPU).
    * A single-file corpus still fans out past ~32k docs exactly as the
    * original guard intended (the 8x-wall sf1 lesson); partial-sum
    * ORDER changes with the partitioning, which the trainers' round(sum,
    * 9) already makes order-insensitive by design. */
  private def featurePartitions(df: org.apache.spark.sql.DataFrame,
      nDocs: Long): Int =
    math.max(1L, math.min(
      df.sparkSession.sparkContext.defaultParallelism.toLong,
      nDocs / 1024L + 1L)).toInt

  /** Full-batch logistic-regression TRAINER over the hashed-bucket token
    * feature space ([[dsirWeights]]' B-bucket convention — the features
    * [[linearScore]] serves). Closes the fastText curation recipe the
    * quality gates were missing: label documents with a heuristic rule
    * or domain column, TRAIN a shallow classifier, then gate the corpus
    * on the trained score at scan speed.
    *
    * Model: p(doc) = sigmoid(Σ_b x_b·w_b + bias) with x_b = (tokens
    * hashing to bucket b) / n_tokens — exactly [[linearScore]]'s serving
    * algebra, so the trained (weights, bias) plug straight into it.
    *
    * Training is DETERMINISTIC, engine-replayable gradient descent:
    * init w = 0; per step ONE map-combinable aggregate computes the
    * full-batch gradient — per-doc (bucket, err/n_tokens) entries
    * explode and group-sum into ≤ B driver rows (the
    * [[graft.operators.Similarity.kmeansCodebook]] convention: driver
    * state bounded by CONFIGURATION, not corpus). Updates
    * w ← w − lr·grad/N are ROUNDED to `roundTo` decimals, so a SQL
    * engine replaying the chain reproduces the exact trajectory
    * (last-ulp summation-order differences are absorbed by the
    * rounding, same as the k-means rounded-mean replay).
    *
    * No separate intercept is trained: the token-normalized features
    * sum to exactly 1 per non-empty document (Σ_b x_b = 1), so the
    * intercept direction already lies in the weight span — and a
    * separate bias term has 64× the feature scale, which wrecks
    * full-batch GD conditioning at any lr the bucket weights need.
    *
    * Scale shape: per step one corpus scan + one shuffle of ≤ B
    * map-side-combined groups; nothing scales with corpus size except
    * the scans. Returns the trained weight vector (serve it via
    * [[linearScore]] with bias = 0). */
  def trainLogistic(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int = 64, steps: Int = 3,
      lr: Double = 128.0, roundTo: Int = 6): Array[Double] = {
    require(buckets > 0, s"trainLogistic: need buckets > 0, got $buckets")
    require(steps >= 0, s"trainLogistic: need steps >= 0, got $steps")
    require(lr > 0, s"trainLogistic: need lr > 0, got $lr")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    // corpus size FIRST (column-pruned count — the projections and the
    // label are dead code under count(1)), so the feature-pass fan-out
    // can be derived from it instead of the cluster constant
    val nDocsL = df.count()
    require(nDocsL > 0, "trainLogistic: empty corpus")
    val base = df
      .select(label.cast("double").as("y"), bucketArr.as("bs"))
      .withColumn("n", size(col("bs")).cast("double"))
      // spread the per-document fold work across the cluster once: a
      // single-file corpus otherwise trains on ONE task (the gradient
      // math is per-row CPU, not IO — measured 8x wall at sf1);
      // partition count derived from the corpus size ([[featurePartitions]])
      .repartition(featurePartitions(df, nDocsL))
      .persist() // scanned once per step; feature arrays, not raw text
    try {
      val nDocs = nDocsL.toDouble
      var w = Array.fill(buckets)(0.0)
      for (_ <- 0 until steps) {
        // ONE ArrayType literal (reference-slot codegen), not B inlined
        // double constants: inlined constants change the generated
        // source every step, so each step paid a fresh Janino compile
        // with every concurrent task stalled on the compile lock (r15 —
        // profiled as ~150 ms × cores of fake executorRunTime per step);
        // a typed literal rides the references array, the source is
        // step-invariant, and the codegen cache hits from step 2 on.
        // Same doubles, same fold order — value-identical.
        val wLit = typedLit(w.toSeq)
        val dot = graft.plans.NativeExpressions.bucket_gather_sum(
          col("bs"), wLit)
        val z = when(col("n") > 0, dot / col("n")).otherwise(lit(0.0))
        val e = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
        // one exploded (bucket, err/n) aggregate per step — ≤ buckets
        // rows to the driver, map-side combined. The err column rides
        // through the Generate as a PASS-THROUGH value (evaluated once
        // per document); referencing `e` inside a per-token lambda
        // would re-run its O(tokens) interpreted dot-fold per TOKEN —
        // the O(tokens²)-per-doc blowup this codebase keeps hunting
        // (first measured here as a wedged sf1 bench pass)
        // two-step select: a single select-with-explode is analyzed as
        // Project ABOVE the Generate, i.e. the err expression (one
        // O(tokens) gather) would re-evaluate per TOKEN — the separate
        // projection pins it below the Generate, once per document
        // the collected per-bucket sums are ROUNDED (9 decimals) before
        // the update so the compared quantity is order-INSENSITIVE —
        // partial-sum order varies across the repartitioned shuffle vs
        // DuckDB's sequential fold, and the 1e-6 update rounding alone
        // only absorbs ulp noise probabilistically (an update landing
        // within ~1e-14 of a .5e-6 boundary could diverge); the oracle
        // (sqlLogisticChain) applies the same round(sum, 9)
        val g = base.select((e / col("n")).as("g"), col("bs"))
          .select(col("g"), explode(col("bs")).as("b"))
          .groupBy(col("b")).agg(sum(col("g")).as("gs"))
          .collect()
          .map(r => r.getLong(0) -> roundHalfUp(r.getDouble(1), 9)).toMap
        w = Array.tabulate(buckets)(i =>
          roundHalfUp(w(i) - lr * g.getOrElse(i.toLong, 0.0) / nDocs,
            roundTo))
      }
      w
    } finally base.unpersist()
  }

  /** Deterministic MINI-BATCH SGD tier over [[trainLogistic]]'s model
    * (r15, t37 — full-batch GD at a handful of steps is fine for
    * distillation demos; mini-batch is what the 100 TB recipe runs):
    * batch membership is the portable charFold of the doc id mod
    * `batches` (the same engine-replayable determinism trick as the
    * Gumbel sampler), epochs sweep the batches IN ORDER, and each step
    * is one map-combinable ≤ B-row gradient aggregate over ONLY that
    * batch's rows — same replay contract as the full-batch trainer
    * (rounded gradient sums, rounded updates; the oracle chain is the
    * shared [[graft.Queries]] generator with `batches` > 1), updates
    * normalized by the BATCH size. `batches = 1` reproduces
    * [[trainLogistic]] with `steps = epochs` bit for bit (pinned).
    * Refuses an empty batch honestly (the trajectory would diverge
    * between engines on skip-vs-update semantics): lower `batches`.
    *
    * Scale shape: features persist once; each epoch scans the corpus
    * once ACROSS its batches (each step's scan-side filter prunes to
    * the batch), driver state stays ≤ B + `batches` rows. */
  def trainLogisticSgd(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int = 64, epochs: Int = 1,
      batches: Int = 4, lr: Double = 128.0,
      roundTo: Int = 6): Array[Double] = {
    require(buckets > 0, s"trainLogisticSgd: need buckets > 0, got $buckets")
    require(epochs >= 0, s"trainLogisticSgd: need epochs >= 0, got $epochs")
    require(batches > 0, s"trainLogisticSgd: need batches > 0, got $batches")
    require(lr > 0, s"trainLogisticSgd: need lr > 0, got $lr")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    val base = df
      .select(label.cast("double").as("y"), bucketArr.as("bs"),
        pmod(PortableHash.charFold(col(idCol).cast("string")),
          lit(batches.toLong)).as("bt"))
      .withColumn("n", size(col("bs")).cast("double"))
      // corpus-size-derived fan-out (see [[featurePartitions]])
      .repartition(featurePartitions(df, df.count()))
      .persist()
    try {
      val bn = base.groupBy("bt").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
      require(bn.values.sum > 0, "trainLogisticSgd: empty corpus")
      require(bn.size == batches,
        s"trainLogisticSgd: only ${bn.size} of $batches batches are " +
          "non-empty — lower `batches`")
      var w = Array.fill(buckets)(0.0)
      for (_ <- 0 until epochs; b <- 0 until batches) {
        val nB = bn(b.toLong)
        // typed array literal, not B inlined constants — step-invariant
        // codegen source (see trainLogistic); value-identical
        val wLit = typedLit(w.toSeq)
        val dot = graft.plans.NativeExpressions.bucket_gather_sum(
          col("bs"), wLit)
        val z = when(col("n") > 0, dot / col("n")).otherwise(lit(0.0))
        val e = lit(1.0) / (lit(1.0) + exp(-z)) - col("y")
        // same two-step select as trainLogistic: pin the err expression
        // below the Generate (once per document, not per token)
        val g = base.filter(col("bt") === b)
          .select((e / col("n")).as("g"), col("bs"))
          .select(col("g"), explode(col("bs")).as("b"))
          .groupBy(col("b")).agg(sum(col("g")).as("gs"))
          .collect()
          .map(r => r.getLong(0) -> roundHalfUp(r.getDouble(1), 9)).toMap
        w = Array.tabulate(buckets)(i =>
          roundHalfUp(w(i) - lr * g.getOrElse(i.toLong, 0.0) / nB,
            roundTo))
      }
      w
    } finally base.unpersist()
  }

  /** Mean log-loss of a (weights, bias) model over the corpus — the
    * trainer's objective, exposed so a property test can pin the
    * full-batch-GD loss-non-increase guarantee. One map-combinable
    * aggregate; clamped away from log(0). */
  def logisticLoss(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, label: Column, weights: Array[Double],
      bias: Double = 0.0): Double = {
    val buckets = weights.length
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    val wLit = array(weights.map(lit): _*)
    val n = size(bucketArr).cast("double")
    val dot = graft.plans.NativeExpressions.bucket_gather_sum(
      bucketArr, wLit)
    val z = when(n > 0, dot / n).otherwise(lit(0.0)) + lit(bias)
    val p = least(greatest(lit(1.0) / (lit(1.0) + exp(-z)), lit(1e-12)),
      lit(1.0 - 1e-12))
    val y = label.cast("double")
    df.select(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p)))
      .as("loss")).head().getDouble(0)
  }

  /** Train-then-serve: [[trainLogistic]] over `label`, then the trained
    * weights through [[linearScore]]'s zero-join zero-shuffle scoring
    * scan. Returns (idCol, n_tokens, score). */
  def trainedQualityScore(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, label: Column, buckets: Int = 64,
      steps: Int = 3, lr: Double = 128.0,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val w = trainLogistic(df, idCol, textCol, label, buckets, steps,
      lr, roundTo)
    linearScore(df, idCol, textCol, buckets, Some(w), 0.0, roundTo)
  }

  /** One-vs-rest [[trainLogistic]] for K labels SHARING the feature
    * pass (r14, t34): per step ONE exploded (label, bucket, err/n)
    * aggregate computes every model's full-batch gradient together —
    * ≤ K·B driver rows instead of K separate jobs per step (the
    * trajectory is IDENTICAL to K independent trainLogistic runs: each
    * label's error column uses its own weights, so the SQL oracle can
    * still replay the chains independently). Returns label → weights,
    * in input order. */
  def trainLogisticMulti(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, labels: Seq[(String, Column)], buckets: Int = 64,
      steps: Int = 3, lr: Double = 128.0,
      roundTo: Int = 6): Seq[(String, Array[Double])] = {
    require(labels.nonEmpty, "trainLogisticMulti: need at least one label")
    require(buckets > 0 && steps >= 0 && lr > 0,
      s"trainLogisticMulti: bad buckets=$buckets steps=$steps lr=$lr")
    val k = labels.size
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    val nDocsL = df.count()
    require(nDocsL > 0, "trainLogisticMulti: empty corpus")
    val base = df
      .select(array(labels.map(_._2.cast("double")): _*).as("ys"),
        bucketArr.as("bs"))
      .withColumn("n", size(col("bs")).cast("double"))
      // same single-file-corpus parallelism guard as [[trainLogistic]],
      // corpus-size-derived (see [[featurePartitions]])
      .repartition(featurePartitions(df, nDocsL))
      .persist()
    try {
      val nDocs = nDocsL.toDouble
      val w = Array.fill(k, buckets)(0.0)
      for (_ <- 0 until steps) {
        // per label: e_l = sigmoid(dot_l / n) − y_l, over its OWN weights
        val es = (0 until k).map { li =>
          // typed array literal, not B inlined constants — step-invariant
          // codegen source (see trainLogistic); value-identical
          val wLit = typedLit(w(li).toSeq)
          val dot = graft.plans.NativeExpressions.bucket_gather_sum(
            col("bs"), wLit)
          val z = when(col("n") > 0, dot / col("n")).otherwise(lit(0.0))
          lit(1.0) / (lit(1.0) + exp(-z)) -
            element_at(col("ys"), li + 1)
        }
        // one token-exploded pass with K sums — ≤ B driver rows of K
        // columns each. The K err/n values ride the Generate as ONE
        // pass-through array computed per DOCUMENT; referencing the
        // error expressions inside a per-token lambda re-ran their
        // O(tokens) interpreted dot-folds per TOKEN — O(K·tokens²) per
        // doc per step, first measured as a wedged sf1 bench pass —
        // and exploding (label × token) rows cost K× the shuffle input
        val gArr = array(es.map(_ / col("n")): _*)
        val sums = (0 until k).map(li =>
          sum(element_at(col("ga"), li + 1)).as(s"g$li"))
        // two-step select — same per-document pinning as trainLogistic:
        // analyzed as one select, the K gathers would run per TOKEN
        val g = base
          .select(gArr.as("ga"), col("bs"))
          .select(col("ga"), explode(col("bs")).as("b"))
          .groupBy(col("b")).agg(sums.head, sums.tail: _*)
          .collect()
          // same order-insensitive round(sum, 9) as [[trainLogistic]]
          .flatMap(r => (0 until k).map(li =>
            (li, r.getLong(0)) ->
              roundHalfUp(r.getDouble(li + 1), 9))).toMap
        for (li <- 0 until k; b <- 0 until buckets)
          w(li)(b) = roundHalfUp(
            w(li)(b) - lr * g.getOrElse((li, b.toLong), 0.0) / nDocs,
            roundTo)
      }
      labels.map(_._1).zip(w.map(_.clone())).toSeq
    } finally base.unpersist()
  }

  /** TRAINED language-ID serving (r14, t34 — the trained tier over the
    * [[langId]] heuristic): one-vs-rest [[trainLogistic]] models (one
    * weight vector per language, all over the same B-bucket hashed-token
    * space) served as an argmax over the per-language sigmoid scores.
    * Ties break to the alphabetically SMALLEST language via a
    * strictly-greater left-to-right fold over the lang-sorted models
    * (matters for
    * empty-token docs, where every model scores exactly 0.5); the SQL
    * twin's rank ORDER BY (score DESC, lang ASC) replays the same rule.
    * Scale shape: the scoring pass computes K dot-folds over ONE shared
    * bucket array — row-local, zero joins, zero shuffles; the weight
    * matrix rides ONE broadcast referenced from the codegen'd
    * [[graft.plans.NativeExpressions.LangArgmaxBC]] (r15 — the r14 cut
    * folded K·B doubles into plan literals re-serialized per task,
    * which stops holding at lid.176 scale, K·B ≈ 11k; the
    * [[graft.plans.BpeModel]] convention). Value-identical to the
    * literal fold ([[langIdTrainedLiteral]], pinned). Returns
    * (idCol, lang_pred, score). */
  def langIdTrained(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, models: Seq[(String, Array[Double])],
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(models.nonEmpty, "langIdTrained: need at least one model")
    val buckets = models.head._2.length
    require(models.forall(_._2.length == buckets),
      "langIdTrained: all models must share one bucket space")
    val sorted = models.sortBy(_._1)
    val lm = new graft.plans.LinearModels(
      sorted.map(_._1).toArray, sorted.map(_._2.clone()).toArray)
    val bc = df.sparkSession.sparkContext.broadcast(lm)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    df.select(col(idCol),
        graft.plans.NativeExpressions.lang_argmax_bc(bucketArr, bc,
          roundTo).as("__p"))
      .select(col(idCol), col("__p.lang_pred").as("lang_pred"),
        col("__p.score").as("score"))
  }

  /** The r14 plan-literal formulation of [[langIdTrained]] (K
    * bucket-gather dots over literal weight arrays + a when-chain
    * argmax), kept ONLY as the equivalence witness for the broadcast
    * path — TrainingOpsSpec pins value-identity and that the broadcast
    * plan's size does not grow with K·B. */
  private[graft] def langIdTrainedLiteral(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, models: Seq[(String, Array[Double])],
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(models.nonEmpty, "langIdTrained: need at least one model")
    val buckets = models.head._2.length
    require(models.forall(_._2.length == buckets),
      "langIdTrained: all models must share one bucket space")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val bucketArr = graft.plans.NativeExpressions.hash_buckets(
      toks, buckets.toLong, PortableHash.Mult, PortableHash.Mod)
    val n = size(bucketArr).cast("double")
    val scored = models.sortBy(_._1).map { case (l, w) =>
      val wLit = array(w.map(lit): _*)
      val dot = graft.plans.NativeExpressions.bucket_gather_sum(
        bucketArr, wLit)
      val z = when(n > 0, dot / n).otherwise(lit(0.0))
      l -> round(lit(1.0) / (lit(1.0) + exp(-z)), roundTo)
    }
    var bestLang: Column = lit(scored.head._1)
    var bestScore: Column = scored.head._2
    for ((l, s) <- scored.tail) {
      val nl = when(s > bestScore, lit(l)).otherwise(bestLang)
      val ns = when(s > bestScore, s).otherwise(bestScore)
      bestLang = nl; bestScore = ns
    }
    df.select(col(idCol), bestLang.as("lang_pred"), bestScore.as("score"))
  }

  /** Persist trained linear-model weights (t33's single model, t34's
    * one-vs-rest matrix) as parquet rows (model, bucket, weight) —
    * the [[graft.operators.Similarity.saveCoarseCodebook]] convention:
    * parquet round-trips doubles bit-exactly, so load→serve ≡
    * train→serve (pinned). At 100 TB this is THE serving shape: train
    * once on a bounded seed, persist, serve every batch from the
    * artifact. */
  def saveLinearModels(spark: org.apache.spark.sql.SparkSession,
      path: String, models: Seq[(String, Array[Double])]): Unit = {
    require(models.nonEmpty, "saveLinearModels: need at least one model")
    import spark.implicits._
    models.flatMap { case (name, w) =>
      w.iterator.zipWithIndex.map { case (x, b) => (name, b, x) }
    }.toDF("model", "bucket", "weight")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveLinearModels]] artifact: model → weights (bucket
    * order), models sorted by name. Driver-bounded by construction —
    * the artifact is K·B rows of configuration size. */
  def loadLinearModels(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Array[Double])] = {
    // writer-fixed schema supplied — skips per-load parquet schema
    // inference (~100 ms; metadata only, the rows are still read)
    val rows = spark.read.schema(
        org.apache.spark.sql.types.StructType.fromDDL(
          "model STRING, bucket INT, weight DOUBLE"))
      .parquet(path)
      .select("model", "bucket", "weight").collect()
    require(rows.nonEmpty, s"loadLinearModels: empty artifact at $path")
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (m, rs) =>
      val byBucket = rs.map(r => r.getInt(1) -> r.getDouble(2)).toMap
      val n = byBucket.keys.max + 1
      require(byBucket.size == n,
        s"loadLinearModels: model $m has gaps in its bucket space")
      m -> Array.tabulate(n)(byBucket)
    }
  }

  /** Classifier evaluation over a threshold grid (r15, t35 — the
    * [[graft.operators.Similarity.annRecall]] analog for trained
    * gates): precision/recall/F1 and the full confusion at every
    * threshold i/grid, i ∈ [0, grid), for the rule "predict positive
    * iff score ≥ threshold" — the harness a user reads to PICK a gate
    * threshold (p9 gates at the label prior; this grid is how that
    * choice is justified against the alternatives).
    *
    * Scale shape: ONE map-combinable aggregate buckets every row to
    * ⌊score·grid⌋ (clamped) — ≤ grid map-side-combined groups — and
    * the per-threshold confusion is conditional sums over that
    * grid-sized table (broadcast cross-join, no second pass over the
    * data). Counts are exact integer-valued doubles, so
    * precision/recall/F1 divisions are bit-replayable in SQL; all
    * three are rounded at `roundTo`.
    *
    * `scored` must expose `scoreCol` ∈ [0, 1] and a 0/1-castable
    * `labelCol`. Returns (threshold, tp, fp, fn, tn, precision,
    * recall, f1) ordered by threshold. */
  def classifierEval(scored: org.apache.spark.sql.DataFrame,
      scoreCol: String, labelCol: String, grid: Int = 20,
      roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    require(grid > 0, s"classifierEval: need grid > 0, got $grid")
    val y = col(labelCol).cast("double")
    val b = least(greatest(floor(col(scoreCol) * grid), lit(0L)),
      lit(grid - 1L))
    val counts = scored.select(b.as("b"), y.as("y"))
      .groupBy("b").agg(sum(col("y")).as("pos"),
        sum(lit(1.0) - col("y")).as("neg"))
    val thresholds = scored.sparkSession.range(grid)
      .select(col("id").as("i"))
    val conf = thresholds.crossJoin(broadcast(counts))
      .groupBy("i").agg(
        sum(when(col("b") >= col("i"), col("pos")).otherwise(0.0)).as("tp"),
        sum(when(col("b") >= col("i"), col("neg")).otherwise(0.0)).as("fp"),
        sum(when(col("b") < col("i"), col("pos")).otherwise(0.0)).as("fn"),
        sum(when(col("b") < col("i"), col("neg")).otherwise(0.0)).as("tn"))
    val prec = when(col("tp") + col("fp") > 0,
      col("tp") / (col("tp") + col("fp"))).otherwise(lit(0.0))
    val rec = when(col("tp") + col("fn") > 0,
      col("tp") / (col("tp") + col("fn"))).otherwise(lit(0.0))
    val f1 = when(prec + rec > 0,
      lit(2.0) * prec * rec / (prec + rec)).otherwise(lit(0.0))
    conf.select(
        (col("i").cast("double") / grid).as("threshold"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
        round(prec, roundTo).as("precision"),
        round(rec, roundTo).as("recall"),
        round(f1, roundTo).as("f1"))
      .orderBy("threshold")
  }

  /** Deterministic low-quality fixture for the trained-classifier tier
    * (t33/p9): every 7th document gains a 20×-repeated spam/boilerplate
    * phrase — the dominated-by-boilerplate shape real quality
    * classifiers are trained to catch (and exactly what the Gopher
    * repetition rules flag, making them usable as weak labels). A plain
    * concat both engines compute identically. */
  def spamFixture(text: Column, id: Column): Column = {
    val phrase = " click here buy now subscribe free winner prize offer"
    when(pmod(id, lit(7L)) === 0, concat(text, lit(phrase * 20)))
      .otherwise(text)
  }

  /** DSIR importance RESAMPLING — the consumer of [[dsirWeights]]/
    * [[dsirWeightsNgram]] that closes the Xie et al. loop (estimate
    * importance weights, then RESAMPLE the corpus toward the target
    * distribution): select `k` documents with probability proportional
    * to w(doc) = exp(log-weight) without replacement, via the
    * Gumbel-top-k identity (key = log w + Gumbel noise; the k largest
    * keys are exactly a proportional-without-replacement draw). The
    * noise is DETERMINISTIC and engine-portable: u =
    * (charFold(id) + 1) / (Mod + 1) ∈ (0, 1), g = −ln(−ln u) — the same
    * portable-hash trick [[mixtureSample]] uses for its per-mille
    * buckets, so any SQL engine replays the exact selection. The key is
    * rounded to `roundTo` with (key desc, id) tie-break, making the
    * draw stable across engines' last-ulp ln differences.
    *
    * Scale shape: the key is a row-local column (zero joins, zero
    * shuffles to score) and the selection is `orderBy(...).limit(k)` —
    * Spark plans a TakeOrderedAndProject (per-partition top-k heaps +
    * one driver merge of k·partitions rows), never a global sort, so
    * the pass is ONE scan at 100 TB (plan-pinned in ScaleDesignSpec).
    * Returns (idCol, weightCol, skey), the selected rows. */
  def dsirResample(weights: org.apache.spark.sql.DataFrame, idCol: String,
      weightCol: String, k: Int, roundTo: Int = 6)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, s"dsirResample: need k > 0, got $k")
    val u = (PortableHash.charFold(col(idCol).cast("string")) + lit(1L))
      .cast("double") / lit((PortableHash.Mod + 1).toDouble)
    val g = -log(-log(u))
    weights
      .withColumn("skey", round(col(weightCol) + g, roundTo))
      .orderBy(desc("skey"), col(idCol))
      .limit(k)
  }
}

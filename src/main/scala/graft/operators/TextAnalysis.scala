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

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "y", "de", "que"))

  /** Count of tokens that belong to `lang`'s stopword list. */
  def stopwordCount(toks: Column, lang: String): Column = {
    val sw = stopwords(lang)
    size(filter(toks, t => sw.map(t === _).reduce(_ || _)))
  }

  /** Language ID by stopword vote over a pre-split token array: the
    * language with the highest stopword count wins; ties resolve
    * alphabetically ('unknown' when all zero). Take lowercased tokens —
    * callers should materialize the token split once (splitting inside
    * each language's count octuples the regex work). */
  def langIdFromTokens(toks: Column): Column = {
    val counts = stopwords.keys.toSeq.sorted.map(l => l -> stopwordCount(toks, l))
    // fold: keep (bestLang, bestCount); strict > keeps alphabetical tie-break
    val best = counts.foldLeft((lit("unknown"), lit(0))) {
      case ((bl, bc), (l, c)) => (when(c > bc, lit(l)).otherwise(bl),
        when(c > bc, c).otherwise(bc))
    }
    best._1
  }

  /** Convenience form over raw text (one split, reused by every vote). */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

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

  /** Document fingerprint: polynomial rolling hash of the whole text
    * (portable) — pair with Dedup.minhashSignature for locality-sensitive
    * fingerprints. */
  def fingerprint(text: Column): Column = PortableHash.charFold(text)
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID, quality scoring, BPE-ish token counting, and document
  * fingerprinting. All column-expression based (whole-stage codegen, no
  * UDFs in the hot path) and narrow — per-row maps over the corpus, no
  * shuffle except where an op is inherently relational (the fingerprint's
  * term dictionary).
  */
object TextOps {

  val HashP = 1000000007L

  /** Tiny per-language function-word profiles (public common words). The
    * profile scorer is deliberately simple arithmetic so it is expressible
    * in both Spark and the DuckDB oracle. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "that"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  private def tokensCol: Column = split(col("text"), " ")

  /** The language-ID argmax as one expression over a token array: a struct
    * (hits, -profile-index, lang) per profile, `greatest` picks max hits
    * with the lexicographically-first language on ties. `.getField("l")` /
    * `.getField("h")` project the prediction / best hit count. Shared by
    * [[langId]] and the fused cleaning pipeline so both compute the
    * identical row-local value. */
  def langPickCol(toks: Column): Column =
    greatest(LangProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(size(filter(toks, t => t.isin(words: _*))).cast("long").as("h"),
        // invert profile order so greatest() prefers the alphabetically first
        lit(-i).as("nl"), lit(lang).as("l"))
    }: _*)

  /** Per-language profile hit counts + argmax prediction with deterministic
    * lexicographic tie-break. Output: doc_id, pred_lang, best_hits. */
  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langPickCol(tokensCol).as("best"))
      .select(col("doc_id"), col("best.l").as("pred_lang"),
        col("best.h").as("best_hits"))
      .orderBy("doc_id")

  /** n_tokens / uniq_ratio_x6 as expressions over a token array — shared by
    * [[quality]] and the fused cleaning pipeline (identical values by
    * construction). */
  def nTokensCol(toks: Column): Column = size(toks).cast("long")
  def uniqRatioX6Col(toks: Column): Column =
    round(size(array_distinct(toks)).cast("double") / size(toks) * 1e6)
      .cast("long")

  /** Quality metrics: raw token count, char count, mean word length,
    * stopword ratio, unique-token ratio (all micro-unit longs where
    * fractional). */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol
    val stopArr = array(Analyzer.EnglishStopSorted.map(lit): _*)
    docs.select(
      col("doc_id"),
      nTokensCol(toks).as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      round(aggregate(transform(toks, t => length(t).cast("double")),
        lit(0.0), (acc, x) => acc + x) / size(toks) * 1e6).cast("long")
        .as("avg_word_len_x6"),
      round(size(filter(toks, t => array_contains(stopArr, t))).cast("double")
        / size(toks) * 1e6).cast("long").as("stop_ratio_x6"),
      uniqRatioX6Col(toks).as("uniq_ratio_x6"))
      .orderBy("doc_id")
  }

  /** BPE-ish token count: alpha runs, digit runs, single punctuation marks —
    * the pre-tokenization regex shape used by byte-pair encoders. */
  val BpeTokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpeTokenRegex), lit(0)))
        .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * term-id sequence, h ← (31·h + tid) mod p, with tid = polyHash(term
    * bytes) — a data-derived id both engines compute identically with NO
    * dictionary (round 1 used a dense_rank window over the vocabulary: a
    * global sort that cannot scale). Fully row-local codegen kernel
    * ([[FingerprintExpr]]): one narrow pass, zero shuffles. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      HashExpressions.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** PII-redaction patterns (C4/CCNet-style pre-training scrub), written
    * in the RE2 ∩ java.util.regex COMMON dialect — no lookarounds, no
    * backrefs, ASCII classes only — so any engine (Spark codegen
    * RegExpReplace here, RE2-based engines in an oracle) replays them
    * byte-identically. Application order matters and is part of the
    * contract: emails first (their local parts contain digits a later
    * pass would mangle), then IPv4 literals, then phone runs (the phone
    * class has no '.', so it can never eat an IP).
    *
    * Tightness / documented false-positive envelope (the dialect has no
    * lookarounds, so word-boundary anchoring is unavailable; these are
    * the residual FP classes, bounded by construction):
    *  - Ipv4Rx constrains every octet to 0–255, so dotted version
    *    strings with an out-of-range component ("1.2.3.999") no longer
    *    match in full; an in-range version like "1.2.3.4" is
    *    indistinguishable from an IP without context and is still
    *    redacted (accepted FP).
    *  - PhoneRx requires 9–15 total digits with AT MOST ONE ' ' or '-'
    *    between consecutive digits — a single match can never consume
    *    more than 29 characters, so a long numeric table degrades to a
    *    bounded local redaction instead of being swallowed whole (the
    *    old "[0-9 -]{7,}" run was unbounded). Space-separated numeric
    *    runs whose first 9–15 digits are phone-shaped (e.g. a year list
    *    "1990 1991 1992") still lose that prefix — accepted FP for a
    *    pre-training scrub, where over-redaction of digit runs is the
    *    safe direction. */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Octet = "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
  val Ipv4Rx = s"($Ipv4Octet\\.){3}$Ipv4Octet"
  val PhoneRx = "\\+?[0-9]([ -]?[0-9]){8,14}"

  /** Redact emails / IPv4s / phone numbers to typed placeholders: three
    * chained regexp passes over one column — row-local codegen
    * (RegExpReplace), fused into the scan, zero shuffles at any corpus
    * size. */
  def redactPii(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRx, "<EMAIL>"),
          Ipv4Rx, "<IP>"),
        PhoneRx, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
}

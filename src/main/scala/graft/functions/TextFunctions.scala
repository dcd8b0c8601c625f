package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing primitives shared by the dedup, similarity and
  * text-analysis operators (the training-data-pipeline surface layered on
  * top of the reference's CDC/SCD2 engine).
  *
  * Every primitive is a pure composition of codegen'd Catalyst expressions
  * (no UDFs) and is chosen to be *bit-identical reproducible in ANSI SQL /
  * DuckDB*, so each operator can be oracle-checked:
  *   - the portable 60-bit hash is `conv(substr(md5(s),1,15),16,10)` —
  *     15 hex digits = 60 bits, always fits a signed BIGINT in both engines;
  *   - tokenization is a literal `\s+` split after lower();
  *   - shingles are word n-grams joined with a single space.
  *
  * Scale notes: all functions here are narrow (per-row) — they pipeline
  * inside whole-stage codegen and never shuffle; the shuffling happens in
  * the operators that consume them (explode → groupBy patterns), which cap
  * shingle document-frequency to bound skew (see DedupQueries).
  */
object TextFunctions {

  /** Deterministic 60-bit non-negative hash portable across Spark/DuckDB:
    * DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT */
  def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families for MinHash. */
  def md5Long(seed: Int, s: Column): Column =
    md5Long(concat(lit(seed.toString), lit(":"), s))

  /** Lowercased whitespace tokens. Codegen-only formulation: trimming
    * first means `\s+`-split can never produce empty tokens, so no
    * interpreted `filter` lambda is needed (HOFs are CodegenFallback —
    * they break whole-stage codegen in the hottest scan loop). Empty /
    * all-whitespace text → empty array, identical to the filtered split. */
  def tokens(text: Column): Column = {
    val t = trim(lower(text))
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Distinct word n-gram shingles, space-joined, first-occurrence order —
    * the codegen'd [[WordShingles]] expression (null toks → empty, matching
    * the built-in-HOF formulation it replaces).
    * DuckDB: list_distinct(list_transform(generate_series(1, len(toks)-n+1),
    *         i -> array_to_string(toks[i:i+n-1], ' '))) */
  def shingles(toks: Column, n: Int): Column =
    coalesce(call_function("word_shingles", toks, lit(n)),
      array().cast("array<string>"))

  /** NON-distinct in-order word n-grams ([[WordNgrams]]) — the multiset
    * repetition analysis needs.
    * DuckDB: list_transform(generate_series(1, len(toks)-n+1),
    *         i -> array_to_string(toks[i:i+n-1], ' ')) */
  def wordNgrams(toks: Column, n: Int): Column =
    coalesce(call_function("word_ngrams", toks, lit(n)),
      array().cast("array<string>"))

  /** Count of matches of a regex (DuckDB: length(regexp_extract_all)). */
  def countMatches(s: Column, regex: String): Column =
    size(regexp_extract_all(s, lit(regex), lit(0)))

  /** A BPE-ish subword token count: word pieces + digits + punctuation
    * counted separately, the regex every tokenizer-ish splitter uses.
    * Portable: same RE2-compatible pattern in DuckDB. */
  val bpeTokenRegex = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column = countMatches(text, bpeTokenRegex)

  def whitespaceTokenCount(text: Column): Column = size(tokens(text))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (SURVEY.md §2.C).
  * Everything is built from codegen'd built-ins / higher-order
  * functions — no UDFs, so the hot path stays inside whole-stage
  * codegen and scales per-row with no serialization boundary.
  */
object Text {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token stream: letter runs, digit runs, single
    * punctuation marks. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word n-gram shingles as strings ("w1 w2 w3"). Guarded: sequence()
    * would generate a DESCENDING range for docs shorter than n. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))

  /** Count of tokens belonging to `set`. */
  def countIn(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(set)))

  /** Polynomial rolling hash over characters: h = fold(31·h + code) mod
    * 10^15+37 — the document fingerprint (SURVEY §2 t04). */
  val RollMod = 1000000000000037L
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % RollMod)

  /** 64 MinHash signature values for a shingle array: one fold,
    * no explode — sig[j] = min over shingles of xxhash64(shingle, j). */
  def minhashSignature(shingleArr: Column, numHashes: Int = 64): Column =
    aggregate(
      shingleArr,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), j => xxhash64(s, j)),
        (a, h) => least(a, h)))

  /** SimHash ±1 bit-count accumulator over tokens: out[i] ∈ ±count.
    * (shiftright via call_function: the Scala helper only takes a
    * literal shift, the SQL function takes a column.) */
  def simhashCounts(toks: Column, bits: Int = 64): Column =
    aggregate(
      toks,
      array_repeat(lit(0L), bits),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(bits - 1)),
          i => when(call_function("shiftright", xxhash64(t), i)
            .bitwiseAND(lit(1L)) =!= 0, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))

  /** Pack sign bits of a simhash count array into a 64-element ±1 bit
    * array (the comparable fingerprint form). */
  def simhashBits(counts: Column): Column =
    transform(counts, c => when(c > 0, lit(1)).otherwise(lit(0)))

  /** Hamming distance between two equal-length bit arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, d) => acc + d)
}

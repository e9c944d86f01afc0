package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash functions for the dedup / similarity operators.
  *
  * Two tiers:
  *  - [[charFold]] — a polynomial string hash built from pure SQL arithmetic
  *    (`split` → `ascii` → fold). Deterministic and reproducible in any SQL
  *    engine (the DuckDB oracles re-derive it with `list_reduce`), which is
  *    what makes the MinHash/SimHash pipelines hash-verifiable end-to-end.
  *  - [[fastHash]] — Spark's codegen'd xxhash64, the production path at
  *    100 TB (≈10× faster, better avalanche). The dedup operators take the
  *    base hash as a parameter so the two are interchangeable; correctness
  *    tests pin charFold, scale runs pin fastHash.
  */
object PortableHash {

  /** Default modulus: 2^31-1 (Mersenne prime) keeps every intermediate
    * below 2^63 for multipliers < 2^32. */
  val Mod: Long = 2147483647L
  val Mult: Long = 1315423911L

  /** Polynomial fold hash of a string column: h = Σ (h*Mult + ascii(c)) mod Mod.
    * Empty string hashes to 0. Empty fragments from the char split are
    * dropped (Java's split keeps a trailing empty string; DuckDB's
    * string_split does not — filtering aligns the two). */
  def charFold(c: Column, mult: Long = Mult, mod: Long = Mod): Column =
    aggregate(
      transform(filter(split(c, ""), ch => length(ch) > 0),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * lit(mult) + x, lit(mod)))

  /** Production hash: codegen'd xxhash64 (not cross-engine portable). */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Universal-hash family over a base hash value: h_i(x) = (a_i·x + b_i) mod Mod.
    * Parameters derive deterministically from the permutation index, so the
    * oracle can re-derive them: a = 2·i + 1 (odd), b = i·12345 + 1. */
  def permuted(base: Column, i: Int, mod: Long = Mod): Column =
    pmod(base * lit(2L * i + 1) + lit(12345L * i + 1), lit(mod))
}

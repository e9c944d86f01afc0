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

  /** Polynomial fold hash of a string column: h = Σ (h*Mult + cp(c)) mod Mod
    * over unicode code points; empty string hashes to 0. Backed by a
    * codegen'd Catalyst expression (graft.plans.NativeExpressions) — the
    * HOF formulation `aggregate(transform(split(c,''), ascii), ...)` is
    * semantically identical but interpreted per character, ~50× slower on
    * the dedup hot path. */
  def charFold(c: Column, mult: Long = Mult, mod: Long = Mod): Column =
    graft.plans.NativeExpressions.char_fold(c, mult, mod)

  /** Production hash: codegen'd xxhash64 (not cross-engine portable). */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Universal-hash family over a base hash value: h_i(x) = (a_i·x + b_i) mod Mod.
    * Parameters derive deterministically from the permutation index, so the
    * oracle can re-derive them: a = 2·i + 1 (odd), b = i·12345 + 1. */
  def permuted(base: Column, i: Int, mod: Long = Mod): Column =
    pmod(base * lit(2L * i + 1) + lit(12345L * i + 1), lit(mod))
}

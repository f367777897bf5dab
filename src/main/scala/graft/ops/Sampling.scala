package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod}

/** Deterministic RNG-free sampling primitives (train/test split,
  * stratified keep rates): a 32-bit multiplicative hash compared against
  * a rate threshold scaled to 2³².
  */
object Sampling {

  /** Knuth multiplicative hash of an id into [0, 2³²), safe for ANY
    * int64 id: the id is first reduced into [0, 10⁹+7) with pmod —
    * plain `%` keeps the dividend's sign, and a negative hash would
    * compare below every rate threshold, silently sampling 100% — so
    * the multiply stays below 2⁶³ (a bare `id * 2654435761` THROWS
    * under Spark 4 ANSI mode, and errors in DuckDB, once ids pass
    * ~3.47e9 — exactly the corpus sizes the 100 TB posture claims).
    * SQL twin (must appear verbatim in every oracle that uses this):
    * `(((id % 1000000007 + 1000000007) % 1000000007) * 2654435761) %
    * 4294967296`. */
  def hash32(id: Column): Column =
    (pmod(id, lit(1000000007L)) * lit(2654435761L)) % lit(4294967296L)

  /** SQL twin of [[hash32]] over a column expression — generated here so
    * every oracle interpolates the SAME verbatim arithmetic. */
  def hash32Sql(id: String): String =
    s"((($id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296"

  /** ORDER-SENSITIVE pair hash into [0, 2³²): hashPair32(a, b) ≠
    * hashPair32(b, a) — callers must pass canonically ordered pairs
    * (every pair set here is emitted with doc_a < doc_b). hash32 < 2³²
    * so the multiply stays < 2³⁷ — no int64 overflow for any ids. Used
    * to cap-sample PAIR sets (audit slices of quadratic verification
    * stages). */
  def hashPair32(a: Column, b: Column): Column =
    (hash32(a) * lit(31L) + hash32(b)) % lit(4294967296L)

  /** SQL twin of [[hashPair32]]. */
  def hashPair32Sql(a: String, b: String): String =
    s"(${hash32Sql(a)} * 31 + ${hash32Sql(b)}) % 4294967296"

  /** Threshold that keeps a deterministic ~`cap`-row slice of an
    * `n`-row input when compared as `hash32(id) < threshold`: exact
    * integer floor(2³²·cap/n), clamped so n ≤ cap keeps EVERYTHING
    * (the gate is invisible until the input outgrows the cap). This is
    * how exact ground-truth baselines with superlinear cost are made
    * scale-safe: below the cap they are the full exact answer; above
    * it they degrade into a deterministic audit sample whose oracle
    * applies the IDENTICAL integer arithmetic, so the differential
    * check stays exact at every scale. 2³²·cap stays far below 2⁶³ for
    * any realistic cap (< 2³⁰). */
  def capThreshold(cap: Long, n: Long): Long =
    if (n <= cap) 4294967296L else 4294967296L * cap / n

  /** SQL twin of [[capThreshold]]: DuckDB `//` is floor division, which
    * equals Scala's `/` truncation for the non-negative operands here;
    * GREATEST guards the n = 0 corner where `//` would divide by zero
    * (capThreshold's n<=cap branch covers it on the Scala side). */
  def capThresholdSql(cap: Long, countSql: String): String =
    s"LEAST(4294967296, 4294967296 * $cap // GREATEST(($countSql), 1))"
}

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
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns using
  * only built-in higher-order functions (`zip_with` + `aggregate` are
  * codegen'd Catalyst expressions — no UDF boxing in the scan loop).
  *
  * Accumulation is a sequential left fold in double precision, which is the
  * same association order DuckDB's list functions use — so the oracle can
  * compare rounded values without a tolerance band.
  */
object VectorFns {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (monotone in L2 — fine for ranking, cheaper). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Random-hyperplane LSH signature: `nBits` sign bits of dot products with
    * deterministic pseudo-random planes, packed into a long. Plane component
    * d of plane p is derived from murmur3(hash(p, d, seed)) scaled to
    * [-0.5, 0.5) — reproducible across runs/JVMs, no driver-side RNG state.
    *
    * At 100 TB the signature is the bucketing key: candidate generation
    * becomes a shuffle on (sig) instead of a cross join.
    */
  def hyperplaneSig(vec: Column, nBits: Int, seed: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(
          vec,
          sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * ((pmod(hash(lit(p), d, lit(seed)), lit(100000)) / 100000.0) - 0.5)
        ),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ .bitwiseOR(_))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns, built on
  * the higher-order functions (`zip_with`, `aggregate`, `transform`) so the
  * arithmetic stays inside Catalyst (no UDF serialization, no driver loops).
  *
  * Accumulation is a deterministic left fold in array order — reproducible
  * across engines, which the DuckDB oracle relies on.
  */
object Vectors {

  /** Cast any numeric array to array<double> for stable math. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right double accumulation — native codegen'd loop
    * (graft.plans.DotProduct), bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/zero-norm vectors -> null (never NaN/error). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm2(a)
    val nb = norm2(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(null).cast("double"))
  }

  /** Squared L2 distance — native codegen'd loop (graft.plans.L2Sq),
    * bit-identical to
    * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`.
    */
  def l2sq(a: Column, b: Column): Column = graft.plans.L2Sq(a, b)

  /** Deterministic +1/-1 hyperplane components from MD5 of "seed:bit:dim".
    * Precomputed on the driver (tiny: bits*dim bytes) and inlined as literal
    * arrays — executors need no broadcast side data, and the same constants
    * can be embedded into oracle SQL for cross-engine reproduction.
    */
  def hyperplaneSigns(bits: Int, dim: Int, seed: Int = 7): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (j, i) =>
      val h = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane (SimHash) LSH bucket id over `bits` deterministic
    * pseudo-hyperplanes — a pure map-side projection (no shuffle, no model
    * state), which is what keeps ANN bucketing viable at 100 TB.
    */
  def lshBucket(v: Column, bits: Int, dim: Int, seed: Int = 7): Column = {
    val signs = hyperplaneSigns(bits, dim, seed)
    val dv = asDouble(v)
    val bitCols = (0 until bits).map { j =>
      val plane = array(signs(j).toIndexedSeq.map(lit): _*)
      val proj = dot(dv, plane)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}

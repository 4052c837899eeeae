package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding vector math over `ArrayType(FloatType)` columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * the whole similarity pipeline stays inside whole-stage codegen.
  *
  * Floats are widened to double before accumulation: exact, and the
  * left-to-right fold order matches columnar engines' sequential sums.
  */
object VectorOps {

  def toDoubleArr(c: Column): Column = transform(c, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. Delegates to the native
    * kernel expression ([[NativeKernels.cosineSim]]) — one static call per
    * row inside whole-stage codegen. [[cosineHof]] is the semantically
    * identical composable formulation (same accumulation order). */
  def cosine(a: Column, b: Column): Column = NativeKernels.cosineSim(a, b)

  /** Reference HOF formulation of [[cosine]] (kept for equivalence tests —
    * big lambda trees degrade to interpreted eval on the hot path). */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = toDoubleArr(a)
    val bd = toDoubleArr(b)
    val denom = norm(ad) * norm(bd)
    when(denom === 0.0, lit(0.0)).otherwise(dot(ad, bd) / denom)
  }
}

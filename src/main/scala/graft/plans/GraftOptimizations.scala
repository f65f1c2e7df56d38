package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, DotProduct, HashEmbed, L2Normalize}

/** Optimizer rule: `vec_cosine(a, b)` → `vec_dot(a, b)` when both inputs
  * are PROVABLY unit-or-zero vectors — i.e. direct outputs of `hash_embed`
  * or `vec_normalize`, whose kernels L2-normalize (or zero) every result.
  *
  * Semantics: for unit vectors cosine = dot; for the zero vector both
  * return 0.0. The rewrite removes two norm loops per row from the scoring
  * hot path (the recall flagship computes cosine against a hash_embed'ed
  * query on every corpus row).
  *
  * Deliberately conservative: a plain column reference is NOT provably
  * normalized (storage may hold anything), so only direct embed/normalize
  * call sites rewrite. This is the engine's one custom logical-plan rule —
  * everything else (pushdown, pruning, limit, broadcast) is stock Catalyst
  * (see ARCHITECTURE.md).
  */
object NormalizedCosineToDot extends Rule[LogicalPlan] {

  private def isUnitOrZero(e: Expression): Boolean = e match {
    case _: HashEmbed => true
    case _: L2Normalize => true
    case Alias(child, _) => isUnitOrZero(child)
    // ConstantFolding runs first, so an embed of a literal query arrives
    // here as a folded Literal array — its norm is checkable directly.
    case Literal(a: ArrayData, ArrayType(et, _)) if a != null =>
      val isFloat = et == FloatType
      if (!isFloat && et != DoubleType) false
      else {
        var ss = 0.0
        var i = 0
        val n = a.numElements()
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          ss += x * x
          i += 1
        }
        val norm = math.sqrt(ss)
        norm <= 1e-8 || math.abs(norm - 1.0) < 1e-6
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if isUnitOrZero(a) && isUnitOrZero(b) =>
        DotProduct(a, b)
    }
}

/** Install the graft optimizer rules into an existing session (idempotent).
  * For spark-submit deployments use `spark.sql.extensions=graft.plans.GraftExtensions`. */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(NormalizedCosineToDot))
      spark.experimental.extraOptimizations = cur :+ NormalizedCosineToDot
  }
}

/** SparkSessionExtensions entry point for config-based injection. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => NormalizedCosineToDot)
}

package graft.plans

import graft.functions.{FusedDotProduct, Tokenize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Kernel-fusion optimizer rule (SparkSessionExtensions
  * .injectOptimizerRule): recognizes the idiomatic higher-order-function
  * dot product
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * and substitutes the compiled [[FusedDotProduct]] kernel. Catalyst
  * evaluates HOF lambdas interpreted — one boxed call per element — so a
  * 64-dim dot product costs ~130 lambda invocations per row; the fused
  * kernel is one compiled loop (measured 3-4x on the similarity bench).
  * Users keep writing the declarative Spark formulation; the engine picks
  * the physical kernel — the same contract as Catalyst's own
  * simplification rules, and the reason this must be EXACTLY
  * semantics-preserving: [[FusedDotProduct]] replicates the HOF tree's
  * null/ragged-length behavior, not [[graft.functions.DotProduct]]'s
  * min-length contraction.
  *
  * Disable for A/B comparison with
  * `spark.sql.optimizer.excludedRules=graft.plans.KernelFusion`.
  */
case class KernelFusion(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case HofDotProduct(a, b) => FusedDotProduct(a, b)
      case HofTokens(text, regex, lowered) => Tokenize(text, regex, lowered)
    }

  /** Matches the resolved HOF dot-product tree. Multiplication and
    * addition of doubles are commutative bit-for-bit, so both operand
    * orders fuse; any other lambda body, fold seed, or non-identity
    * finish is left untouched. */
  private object HofDotProduct {
    private def isDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

    private def isPair(l: Expression, r: Expression,
        a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
      (l, r) match {
        case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
          (x.exprId == a.exprId && y.exprId == b.exprId) ||
            (x.exprId == b.exprId && y.exprId == a.exprId)
        case _ => false
      }

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
          if e.resolved && isDoubleArray(a) && isDoubleArray(b) &&
            isPair(ml, mr, x, y) && isPair(al, ar, acc, v) &&
            fin.exprId == finArg.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  /** Matches the tokenization chain
    * `filter(split([lower(]text[)], regexLit, -1), t => t != "")` —
    * any literal regex, with or without the lower() step, either operand
    * order in the not-equals lambda. */
  private object HofTokens {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    private def isEmptyStrLit(e: Expression): Boolean = e match {
      case Literal(s: UTF8String, StringType) => s.numChars == 0
      case _ => false
    }

    def unapply(e: Expression): Option[(Expression, String, Boolean)] = e match {
      case ArrayFilter(
            StringSplit(strExpr, Literal(regex: UTF8String, StringType), Literal(-1, IntegerType)),
            LambdaFunction(Not(EqualTo(l, r)), Seq(v: NamedLambdaVariable), _))
          if e.resolved && {
            (l, r) match {
              case (x: NamedLambdaVariable, lit) => x.exprId == v.exprId && isEmptyStrLit(lit)
              case (lit, x: NamedLambdaVariable) => x.exprId == v.exprId && isEmptyStrLit(lit)
              case _ => false
            }
          } =>
        strExpr match {
          case Lower(inner) => Some((inner, regex.toString, true))
          case other => Some((other, regex.toString, false))
        }
      case _ => None
    }
  }
}

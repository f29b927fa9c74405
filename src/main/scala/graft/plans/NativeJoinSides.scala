package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Shared side-resolution for the native temporal joins ([[AsOfJoin]],
  * [[IntervalJoin]]): alias the right side to fresh expression ids (a
  * self-join's sides must never collide inside a custom node no
  * analyzer deduplication rule knows), resolve attributes by name,
  * validate the key/timestamp contract, and mint the prefixed output
  * attributes. One place, so a validation fix cannot silently apply
  * to one operator and not the other.
  */
private[plans] object NativeJoinSides {

  final case class Sides(
      lPlan: LogicalPlan, rPlan: LogicalPlan,
      lKeys: Seq[Attribute], rKeys: Seq[Attribute],
      lTs: Attribute, rTs: Attribute,
      payload: Seq[Attribute], rightOut: Seq[AttributeReference])

  def resolve(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      prefix: String, opName: String): Sides = {
    // rightTs is always attached as <prefix><rightTs>; listing it in
    // rightCols too would mint a duplicate output name
    val payloadCols = rightCols.filterNot(_ == rightTs).distinct
    val rNames = (keys ++ (rightTs +: payloadCols)).distinct
    val r2 = right.select(rNames.map(n => col(n).as(s"${n}__r")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new
          IllegalArgumentException(s"column $n not found in " +
            p.output.map(_.name).mkString(", ")))
    val lKeysA = keys.map(attr(lPlan, _))
    val rKeysA = keys.map(k => attr(rPlan, s"${k}__r"))
    val lTsA = attr(lPlan, leftTs)
    val rTsA = attr(rPlan, s"${rightTs}__r")
    val payloadA = payloadCols.map(c => attr(rPlan, s"${c}__r"))
    // the merge compares both sides through ONE ordering built from
    // the left types — silently wrong on mismatched sides, so refuse
    require(keys.nonEmpty, s"$opName join needs at least one equi-key")
    lKeysA.zip(rKeysA).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"$opName key type mismatch: ${a.name} ${a.dataType} vs " +
          s"${b.dataType}")
      // binary key comparison treats -0.0 != 0.0 and distinct NaN bit
      // patterns as distinct — the NormalizeFloatingNumbers rule that
      // fixes this for built-in joins does not know these nodes, so
      // floating keys would silently miss matches SQL equality makes
      require(a.dataType != DoubleType && a.dataType != FloatType,
        s"$opName equi-key ${a.name} is ${a.dataType}: floating-point " +
          "join keys are not supported (cast to decimal/integer)")
    }
    require(lTsA.dataType == rTsA.dataType,
      s"$opName ts type mismatch: ${lTsA.dataType} vs ${rTsA.dataType}")
    val rightOut = (rTsA +: payloadA).map { a =>
      AttributeReference(
        prefix + a.name.stripSuffix("__r"), a.dataType,
        nullable = true)()
    }
    Sides(lPlan, rPlan, lKeysA, rKeysA, lTsA, rTsA, payloadA, rightOut)
  }
}

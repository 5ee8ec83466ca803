package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared probe for the two [[AnyInSet]] encodings: type check + null-safe
  * any-membership scan over a memoized per-instance hash set. The literal
  * and broadcast forms differ ONLY in how the set ships to executors —
  * keeping the probe here means a semantics fix can never silently apply
  * to one form and not the other. */
sealed trait AnyInSetProbe extends UnaryExpression with CodegenFallback {

  /** The memoized reference set (implementations build it lazily once per
    * expression instance, the [[HyperplaneLsh]] pattern). */
  protected def set: java.util.HashSet[UTF8String]

  protected final def buildSet(values: Iterable[String], n: Int)
      : java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"any_in_set requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i)))
        return java.lang.Boolean.TRUE
      i += 1
    }
    java.lang.Boolean.FALSE
  }
}

/** True iff ANY element of a string array is in a fixed reference set —
  * the per-row form of a semi-join against a driver-known set, O(array)
  * per row via a memoized hash set.
  *
  * This is the STREAMING/serving shape of decontamination
  * ([[graft.ext.Decontaminate.contaminationPredicate]]): the join form
  * needs a distinct over matched ids — a stateful aggregation a streaming
  * query can't run in append mode — while this predicate is stateless and
  * attaches to any plan, batch or stream. The set ships in the serialized
  * expression (once per task, like a broadcast); it is the caller's
  * contract that the set is broadcast-sized — the same assumption the
  * broadcast semi-join form makes.
  */
case class AnyInSet(child: Expression, values: Seq[String])
    extends AnyInSetProbe {

  @transient protected lazy val set: java.util.HashSet[UTF8String] =
    buildSet(values, values.size)

  override protected def withNewChildInternal(newChild: Expression): AnyInSet =
    copy(child = newChild)
}

object AnyInSet {
  def apply(arr: Column, values: Seq[String]): Column =
    GraftColumnBridge.column(AnyInSet(GraftColumnBridge.expression(arr), values))
}

/** [[AnyInSet]] with the reference set behind a BROADCAST variable instead
  * of a plan literal. The plan-literal form serializes the whole set into
  * every task binary (measured ~linear: ~87 MB of task bytes per 10^6
  * 13-gram strings, re-shipped per task); this form ships a small handle
  * and the torrent broadcast moves the set once per EXECUTOR — the right
  * encoding once the set stops being trivially small. Same probe
  * semantics, same memoized per-instance hash set. */
case class AnyInSetBc(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[String]])
    extends AnyInSetProbe {

  @transient protected lazy val set: java.util.HashSet[UTF8String] =
    buildSet(bc.value, bc.value.length)

  override protected def withNewChildInternal(newChild: Expression): AnyInSetBc =
    copy(child = newChild)
}

object AnyInSetBc {
  def apply(arr: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[String]]): Column =
    GraftColumnBridge.column(AnyInSetBc(GraftColumnBridge.expression(arr), bc))
}

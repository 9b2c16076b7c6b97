package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** |A ∩ B| for two SORTED arrays (string/int/long elements) via a linear
  * merge.
  *
  * Replaces `size(array_intersect(a, b))` in pair-verification hot loops
  * (blocked n-gram Jaccard, MinHash verification): `ArrayIntersect` is
  * interpreted (CodegenFallback) and builds a fresh hash set per PAIR —
  * O(|A|+|B|) hashing and allocation for every candidate — where this
  * expression is a codegen'd two-pointer merge, no allocation.
  *
  * String elements compare with `UTF8String.binaryCompare`, NOT
  * `compareTo`: in Spark 4.1 `compareTo` consults `System.getenv` on
  * EVERY call (a test-mode guard) before delegating to `binaryCompare`,
  * which profiled as the dominant cost of comparison-heavy operators.
  *
  * Inputs MUST be sorted ascending (`array_sort` order = binary order for
  * strings) and duplicate-free; with distinct inputs |A ∪ B| = |A| + |B|
  * − |A ∩ B|, so one merge yields Jaccard. Null if either input is null;
  * null ELEMENTS are not expected (callers build arrays from non-null
  * values) and are counted never-equal.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(e, _) => e
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val supported = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (supported && left.dataType.asInstanceOf[ArrayType].elementType ==
      right.dataType.asInstanceOf[ArrayType].elementType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same string/int/long element type, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    val et = elemType
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = et match {
          case StringType => x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
          case IntegerType => java.lang.Integer.compare(x.getInt(i), y.getInt(j))
          case LongType => java.lang.Long.compare(x.getLong(i), y.getLong(j))
          case other => throw new IllegalStateException(s"unsupported $other")
        }
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmp = elemType match {
      case StringType =>
        (a: String, b: String, i: String, j: String) =>
          s"$a.getUTF8String($i).binaryCompare($b.getUTF8String($j))"
      case IntegerType =>
        (a: String, b: String, i: String, j: String) =>
          s"java.lang.Integer.compare($a.getInt($i), $b.getInt($j))"
      case LongType =>
        (a: String, b: String, i: String, j: String) =>
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      case other => throw new IllegalStateException(s"unsupported $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final int $c = ${cmp(a, b, i, j)};
         |    if ($c == 0) { $n++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ordered list of BPE merges to a symbol sequence — the hot loop
  * of tokenizer training AND encoding, as one codegen'd Catalyst expression
  * (same static-compute pattern as [[MinHashSig]]): per row, one primitive
  * pass per merge, no per-element boxing, stays inside whole-stage codegen.
  * A higher-order-function composition would re-materialize the array once
  * per merge through interpreted lambdas — at vocab-table scale that is the
  * difference between milliseconds and minutes per iteration.
  *
  * Merge semantics (Sennrich et al., ACL 2016): adjacent pair (a, b) is
  * replaced by the concatenation `ab`, scanning LEFT-TO-RIGHT without
  * overlap ("a a a" under (a,a) → ["aa", "a"]); merges apply in rank order.
  */
case class BpeApply(child: Expression, mergePairs: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // flattened [a0, b0, a1, b1, …] as UTF8String for allocation-free compare
  private lazy val flat: Array[UTF8String] =
    mergePairs.flatMap { case (a, b) =>
      Seq(UTF8String.fromString(a), UTF8String.fromString(b))
    }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeApply.compute(input.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeApply.compute($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
  override def prettyName: String = "bpe_apply"
}

object BpeApply {
  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, flat: Array[UTF8String]): GenericArrayData = {
    var cur = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = arr.getUTF8String(i); i += 1 }
    var m = 0
    while (m < flat.length) {
      val a = flat(m); val b = flat(m + 1)
      val out = new Array[UTF8String](cur.length)
      var r = 0; var w = 0
      while (r < cur.length) {
        if (r + 1 < cur.length && cur(r).equals(a) && cur(r + 1).equals(b)) {
          out(w) = UTF8String.concat(a, b); r += 2
        } else { out(w) = cur(r); r += 1 }
        w += 1
      }
      cur = java.util.Arrays.copyOf(out, w)
      m += 2
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}

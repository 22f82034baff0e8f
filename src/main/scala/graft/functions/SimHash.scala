package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — a custom Catalyst `Expression`
  * (preference (b) from the build rules: Spark has no built-in that can
  * fold per-token hash bits into weighted bit-votes without exploding
  * 64 columns or leaving codegen for a Scala UDF closure).
  *
  * Algorithm (Charikar, STOC'02 — public): hash each token to 64 bits;
  * each bit votes +1/-1 per token; the sign vector of the vote totals
  * is the fingerprint. Near-duplicate documents land within a small
  * Hamming distance.
  *
  * Per-row work is O(tokens × 64) with a single primitive array buffer,
  * no allocation per token; `CodegenFallback` costs one virtual call
  * per row around that loop, which profiling shows is negligible next
  * to the hashing itself.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** FNV-1a over the raw UTF-8 bytes — no per-token String allocation. */
  private[functions] def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column API: simhash64(tokensColumn). Spark 4's unified Column
    * carries a ColumnNode, not an Expression — the classic converters
    * bridge both directions.
    */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }

  /** Hamming distance between two 64-bit fingerprints (built-ins). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.toColumn
import org.apache.spark.sql.graftx.toExpression
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for text fingerprinting (SURVEY.md §2.11 D2/D5).
  *
  * Both replace explode/aggregate formulations that shuffled or ran
  * interpreted per-element lambdas with a single compiled pass per row —
  * SimHash64 in particular removes a (docs × tokens × 64)-row shuffle from
  * the dedup path, which is the difference between a projection and a
  * multi-TB exchange at corpus scale.
  */
object TextFunctions {
  /** 64-bit SimHash over a token array (xxhash64 per token, bit voting). */
  def simhash64(tokens: Column): Column = toColumn(SimHash64(toExpression(tokens)))

  /** Rabin-Karp polynomial hash of the string's UTF-16 code units,
    * base 257 mod 1e9+7 — cheap content-defined chunking / dedup key. */
  def polyHash(text: Column): Column = toColumn(PolyHash(toExpression(text)))
}

/** One-pass SimHash: per-token xxhash64 (seed 42, matching SQL `xxhash64`),
  * ±1 vote per bit, sign-collapsed to a 64-bit signature. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val tokens = a.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val tally = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = XxHash64Function.hash(t, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Polynomial rolling hash (base 257, mod 1e9+7) over UTF-16 code units —
  * modulus keeps intermediates < 2^39, no overflow. Fully codegen'd: the
  * char loop compiles into the enclosing whole-stage span. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 257L + s.charAt(i)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // fresh locals per instance: two PolyHash calls can land in ONE codegen
      // function, where fixed names would collide and Janino would reject the
      // whole span (silent fallback to interpreted execution)
      val s = ctx.freshName("phS")
      val acc = ctx.freshName("phAcc")
      val i = ctx.freshName("phI")
      s"""
         |String $s = $a.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 257L + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY.md §2.11 D3).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate an
  * interpreted lambda per element — at billions of (pair × dimension) steps
  * that dominates ANN runtime. These expressions compile to a tight primitive
  * loop inside whole-stage codegen (no boxing, no per-element dispatch),
  * reading `array<float>` directly so vectors are never up-cast to
  * `array<double>` in memory.
  */
object VectorFunctions {
  /** dot(a, b) accumulated in double; a and b must share element type
    * (float or double). */
  def vecDot(a: Column, b: Column): Column =
    toColumn(VecDot(toExpression(a), toExpression(b)))

  /** L2 norm, double. */
  def vecNorm(a: Column): Column =
    toColumn(VecNorm(toExpression(a)))

  /** Cosine similarity, null for zero/empty vectors: under ANSI mode (the
    * Spark 4 default) a plain division would throw DIVIDE_BY_ZERO on the
    * first all-zero embedding and kill the task — a degenerate vector must
    * yield a null similarity (dropped by any `cos >= t` filter), never sink
    * a corpus-wide pass. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.try_divide(vecDot(a, b), vecNorm(a) * vecNorm(b))

  /** Sign-random-projection LSH signatures: `tables` longs of `bits` sign
    * bits each. Hyperplanes are Gaussian, derived deterministically from
    * (seed, table, bit) via java.util.Random — identical on every executor
    * with zero shipped state. */
  def rpSignatures(emb: Column, tables: Int, bits: Int, seed: Long = 42L): Column =
    toColumn(RpSignatures(toExpression(emb), tables, bits, seed))
}

private object VecTypeCheck {
  def check(name: String, types: Seq[DataType]): TypeCheckResult = {
    val ok = types.forall {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!ok)
      TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float> or array<double> arguments, got ${types.map(_.simpleString).mkString(", ")}")
    else if (types.distinct.map { case ArrayType(e, _) => e }.distinct.size > 1)
      TypeCheckResult.TypeCheckFailure(s"$name arguments must share an element type")
    else TypeCheckResult.TypeCheckSuccess
  }

  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.check("vec_dot", Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (VecTypeCheck.isFloat(left)) {
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (VecTypeCheck.isFloat(left)) "getFloat" else "getDouble"
      // fresh locals: two VecDots in one codegen function must not collide
      val n = ctx.freshName("vdN")
      val s = ctx.freshName("vdS")
      val i = ctx.freshName("vdI")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot = copy(l, r)
}

case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.check("vec_norm", Seq(child.dataType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    if (VecTypeCheck.isFloat(child)) {
      while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    } else {
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (VecTypeCheck.isFloat(child)) "getFloat" else "getDouble"
      // fresh locals: a query computing two norms in one span must not collide
      val n = ctx.freshName("vnN")
      val s = ctx.freshName("vnS")
      val i = ctx.freshName("vnI")
      val v = ctx.freshName("vnV")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.$get($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNorm = copy(c)
}

/** All `tables` signatures in one pass over the vector. Interpreted eval only
  * (CodegenFallback) — the inner loop is compiled Scala over primitive
  * arrays, so per-row cost is tables×bits×dim fused multiply-adds; the
  * Gaussian plane matrix is materialized once per executor thread and reused
  * across rows. */
case class RpSignatures(child: Expression, tables: Int, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(bits > 0 && bits <= 62, "bits must be in [1, 62]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.check("rp_signatures", Seq(child.dataType))

  // dim-keyed and concurrent: one expression instance can be shared by many
  // tasks, and with mixed input dims an unsynchronized single-slot cache
  // could hand a racing thread planes built for the wrong dimension
  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  private def planes(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, d =>
      Array.tabulate(tables * bits) { k =>
        val rnd = new java.util.Random(seed * 1000003L + k)
        Array.fill(d)(rnd.nextGaussian())
      })

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val vals = new Array[Double](dim)
    val isF = VecTypeCheck.isFloat(child)
    var i = 0
    while (i < dim) { vals(i) = if (isF) arr.getFloat(i) else arr.getDouble(i); i += 1 }
    val w = planes(dim)
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val wk = w(t * bits + b)
        var s = 0.0
        var j = 0
        while (j < dim) { s += vals(j) * wk(j); j += 1 }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    ArrayData.toArrayData(sigs)
  }

  override protected def withNewChildInternal(c: Expression): RpSignatures = copy(c)
}

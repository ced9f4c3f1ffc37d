package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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

  /** One-pass language-marker counter: `array<int>` of
    * [en, de, es, fr, cjk] hit counts — replaces five `regexp_count` scans
    * per row with a single char-stream pass. */
  def markerCounts(text: Column): Column = toColumn(MarkerCounts(toExpression(text)))
}

/** One-pass SimHash: per-token xxhash64 (seed 42, matching SQL `xxhash64`),
  * ±1 vote per bit, sign-collapsed to a 64-bit signature. Codegen'd via
  * one virtual call per row into [[compute]] (the MarkerCounts pattern) —
  * the signature projection sits in the production simhash dedup scan, so
  * a CodegenFallback here broke the scan's whole-stage span into
  * interpreted row boxing exactly where corpus volume flows. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  def compute(tokens: ArrayData): Long = {
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

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
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

/** One-pass language-marker hit counter for the lang-ID heuristic
  * (SURVEY.md §2.11 D5). Returns `array<int>` [en, de, es, fr, cjk].
  *
  * Semantics match the regex formulation the DuckDB oracle runs —
  * `regexp_count(lower(text), '\b(w1|w2|…)\b')` per language plus
  * `regexp_count(text, '[\x{4e00}-\x{9fff}]')` — exactly: a "hit" is a
  * maximal ASCII word-char run ([A-Za-z0-9_], RE2 `\b` semantics) that
  * case-insensitively equals a marker word, and the CJK count is the
  * number of chars in the unified-ideograph block. Note the engines
  * disagree at the margin: Java's `\b` is Unicode-aware (a CJK char is a
  * word char, so `\bthe\b` does NOT match in "中the文") while RE2's is
  * ASCII; this expression follows RE2 — i.e. the oracle — and the
  * divergence is pinned in EdgeCaseSpec. One compiled pass per row
  * replaces five full regex scans (measured 3.3 s → sub-second for
  * `q_lang_id` at sf0.1); at corpus scale this is the difference between
  * a scan-bound projection and a regex-bound one. */
case class MarkerCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"marker_counts expects string, got ${t.simpleString}")
  }

  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val counts = new Array[Int](5)
    val sb = new java.lang.StringBuilder(8)
    val n = s.length
    var i = 0
    // sentinel pass one past the end closes a trailing word run
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      val isWord =
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
      if (isWord) {
        // markers are ≤5 chars; longer runs can't match, so stop buffering
        if (sb.length <= 5) sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      } else {
        if (sb.length > 0 && sb.length <= 5) {
          val w = sb.toString
          var l = 0
          while (l < 4) {
            if (MarkerCounts.sets(l).contains(w)) counts(l) += 1
            l += 1
          }
        }
        sb.setLength(0)
        if (c >= 0x4e00 && c <= 0x9fff) counts(4) += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // one virtual call per row into the scan pass above; stays inside the
    // whole-stage span (no CodegenFallback row-boxing)
    val ref = ctx.addReferenceObj("markerCounts", this, classOf[MarkerCounts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(c: Expression): MarkerCounts = copy(c)
}

object MarkerCounts {
  /** Marker sets in output order en/de/es/fr — the same word lists the
    * oracle regexes encode; "la" is deliberately in both es and fr. */
  private[functions] val sets: Array[java.util.HashSet[String]] = {
    val langs = Array(
      Array("the", "and", "of", "to", "is", "you", "that", "it", "for", "with"),
      Array("der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu", "mit"),
      Array("el", "la", "los", "las", "es", "una", "para", "por", "como", "pero"),
      Array("le", "la", "les", "est", "une", "pour", "dans", "ce", "pas", "vous"))
    langs.map { ws =>
      val s = new java.util.HashSet[String](32)
      ws.foreach(s.add)
      s
    }
  }
}

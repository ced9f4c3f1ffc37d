package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Embeddings, IvfIndex, Similarity}
import scala.collection.mutable
import scala.util.Random

/** Seeded differential fuzzer for the VECTOR / ANN layer — fourth leg of
  * the randomized programme (SqlFuzzer: relational vs DuckDB; StreamFuzzer:
  * stateful vs batch; GraphFuzzer: graph kernels vs brute force; this: the
  * embedding operators vs plain-Scala linear algebra on random vectors,
  * where previously the layer was pinned by fixed-corpus gates and two
  * planted-truth volume runs).
  *
  * Plan kinds (cycling by index — a count-5k run covers each k times):
  *
  *   brute     [[Similarity.bruteForceTopK]] vs an exact top-k replay
  *   ivf_full  [[IvfIndex.ivfTopK]] probing ALL cells — the k-means-
  *             INDEPENDENT property: a full probe must equal exact search
  *             no matter what the quantizer learned (candidate generation,
  *             dedup, scoring, ranking, and the cell partitioning itself
  *             are all under test; only recall is not)
  *   ivf_probe partial probe replayed in Scala FROM the engine's own
  *             centroids/assignments (k-means output is the oracle's
  *             input, everything downstream — probe selection by centroid
  *             cosine with (dist, cell) tie-break, in-cell scoring,
  *             ranking — is recomputed independently)
  *   ivf_q8   [[IvfIndex.ivfTopKQuantized]] — the int8 retrieve-then-
  *             rerank pipeline (the 4× shuffle-cut scale path), replayed
  *             end to end: per-vector symmetric quantization
  *             round(x / max(amax/127, 1e-30)) → approx cosine over the
  *             re-floated int8 arrays → k·rerank survivors → exact rerank,
  *             all from the engine's own centroids/assignments. Previously
  *             this path had only RECALL-bound evidence; this pins the
  *             pipeline's arithmetic exactly
  *   dimstats  [[Embeddings.dimStatsOf]] vs per-dimension moments
  *   whiten    [[Embeddings.whitenedNormsOf]] vs Σ(x−μ)²/(σ²+ε) per vector
  *
  *   ivf_pq   [[IvfIndex.ivfTopKPq]] — the ADC path, under a BOUNDARY-
  *             ROBUST compare (round-15 verdict stretch #8; this was the
  *             one deliberately-unfuzzed ANN path). The hazard: the ADC
  *             rank key is `sum()` over the m per-subspace LUT hits — a
  *             partition-order-dependent double sum — so an oracle's
  *             sequential re-summation can differ by an ulp, and an ulp
  *             exactly AT the k·rerank survivor boundary legitimately
  *             changes the survivor set. Resolution: the oracle replays
  *             the full pipeline (probe selection, LUT pdot/pc2 — both
  *             deterministic index-order folds in the engine — ADC
  *             scoring, survivor cut, exact rerank) from the engine's own
  *             centroids/assignments/codebooks/codes; when the ADC score
  *             gap at the survivor boundary exceeds EPS (1e-9 relative —
  *             ~10⁷ double ulps, far above any m-term reorder error) the
  *             plan compares EXACTLY, and only when the gap is inside EPS
  *             does it fall back to an admissibility check (returned
  *             candidates probed + at-or-above the boundary − EPS, exact
  *             cosines bit-exact, ranks consistent, and every
  *             strictly-surviving candidate whose exact cosine beats the
  *             engine's k-th returned row present). Random vectors put
  *             essentially every plan on the exact path; the fallback is
  *             what makes fresh seeds non-flaky BY CONSTRUCTION instead
  *             of by luck. PQ also keeps its measured-recall/regret
  *             evidence (q_ann_ivf_pq, probeQualityBound).
  *
  * Exactness: vec_dot / vec_norm are documented index-order double sums
  * (VectorExpressions.scala:69-119), so the cosine oracles replay the SAME
  * op order and compare bit-exactly — including the NULL cosine of a
  * deliberately planted all-zero vector (the try_divide path; nulls rank
  * last under the DESC window order, cand-id ascending among themselves).
  * The mean/variance kinds tolerate 2e-6 / 2e-4 on their ROUNDED outputs:
  * Spark's partition-parallel summation is order-nondeterministic, and a
  * 1-ulp pre-rounding difference may straddle a rounding boundary; a real
  * defect moves these statistics by far more than the band.
  */
object VectorFuzzer {

  val kinds: Vector[String] =
    Vector("brute", "ivf_full", "ivf_probe", "ivf_q8", "ivf_pq", "dimstats", "whiten")

  final case class VPlan(idx: Int, kind: String, dim: Int, k: Int,
                         nCells: Int, nProbe: Int, nQueries: Int,
                         vectors: Vector[(Long, Vector[Float])])

  def plan(seed: Long, i: Int): VPlan = {
    val r = new Random(seed + 11000011L * i)
    val dim = 4 + r.nextInt(13)
    val nVec = 30 + r.nextInt(120)
    // sparse ids (gaps + non-contiguity, the GraphFuzzer argument)
    val ids = r.shuffle((0 until nVec * 2).toVector).take(nVec).map(_.toLong).sorted
    val zeroAt = if (r.nextInt(3) == 0) r.nextInt(nVec) else -1
    val vectors = ids.zipWithIndex.map { case (id, j) =>
      val v =
        if (j == zeroAt) Vector.fill(dim)(0.0f) // the try_divide null-cos path
        else Vector.fill(dim)((r.nextInt(2001) - 1000) / 100.0f)
      (id, v)
    }
    val nCells = 2 + r.nextInt(6)
    VPlan(i, kinds(i % kinds.length), dim, 3 + r.nextInt(8),
      nCells, 1 + r.nextInt(nCells), 3 + r.nextInt(8), vectors)
  }

  def plans(seed: Long, count: Int): Seq[VPlan] =
    (0 until count).map(plan(seed, _))

  final case class Result(idx: Int, kind: String, ok: Boolean,
                          engineRows: Long, oracleRows: Long, detail: String)

  // ======================= oracle building blocks ========================

  /** Index-order double sums — the documented vec_dot / vec_norm op order. */
  private def dot(a: Vector[Float], b: Vector[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  private def norm(a: Vector[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val v = a(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }
  private def dotD(a: Vector[Double], b: Vector[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normD(a: Vector[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** try_divide: NULL (None) when the denominator is zero. */
  private def cosOpt(d: Double, na: Double, nb: Double): Option[Double] =
    if (na * nb == 0.0) None else Some(d / (na * nb))

  /** Exact top-k per query over `cands` (self excluded): (cos DESC NULLS
    * LAST, cand_id ASC), cos rounded to 4dp, rank 1..k. */
  private def topK(queries: Seq[(Long, Vector[Float])],
                   cands: Seq[(Long, Vector[Float])], k: Int): Seq[Seq[Any]] =
    queries.flatMap { case (qid, q) =>
      val qn = norm(q)
      cands.filter(_._1 != qid)
        .map { case (cid, c) => (cid, cosOpt(dot(q, c), qn, norm(c))) }
        .sortBy { case (cid, co) => (co.isEmpty, -co.getOrElse(0.0), cid) }
        .take(k).zipWithIndex
        .map { case ((cid, co), r) =>
          Seq[Any](qid, cid, co.map(round4).orNull, r + 1)
        }
    }

  private def oracleDimStats(p: VPlan): Seq[Seq[Any]] =
    (0 until p.dim).map { d =>
      val xs = p.vectors.map(_._2(d).toDouble)
      val n = xs.length.toLong
      val mean = xs.sum / n
      val varp = xs.map(x => (x - mean) * (x - mean)).sum / n
      Seq[Any](d, n, mean, varp, xs.min, xs.max)
    }

  private def oracleWhiten(p: VPlan): Seq[Seq[Any]] = {
    val n = p.vectors.length
    val mu = (0 until p.dim).map(d => p.vectors.map(_._2(d).toDouble).sum / n)
    val vp = (0 until p.dim).map { d =>
      p.vectors.map(v => math.pow(v._2(d) - mu(d), 2)).sum / n
    }
    p.vectors.map { case (id, v) =>
      val s = (0 until p.dim).map { d =>
        (v(d) - mu(d)) * (v(d) - mu(d)) / (vp(d) + 1e-9)
      }.sum
      Seq[Any](id, math.sqrt(s))
    }
  }

  // ============================ comparison ================================

  private def normalize(v: Any): Any = v match {
    case i: Int => i.toLong
    case x => x
  }

  private def exactCompare(idx: Int, kind: String,
                           engine: Seq[Seq[Any]], oracle: Seq[Seq[Any]]): Result = {
    def ms(rows: Seq[Seq[Any]]) =
      rows.map(_.map(normalize)).groupBy(identity).view.mapValues(_.size).toMap
    val (e, o) = (ms(engine), ms(oracle))
    val ok = e == o
    val detail = if (ok) "" else {
      val extra = (e.keySet -- o.keySet).take(3)
      val miss = (o.keySet -- e.keySet).take(3)
      s"engine=${engine.size} oracle=${oracle.size} extra=$extra missing=$miss"
    }
    Result(idx, kind, ok, engine.size, oracle.size, detail)
  }

  /** Keyed row compare with a tolerance band on the double columns (the
    * partition-order FP argument in the scaladoc). */
  private def tolCompare(idx: Int, kind: String,
                         engine: Seq[Seq[Any]], oracle: Seq[Seq[Any]],
                         tol: Double): Result = {
    def keyed(rows: Seq[Seq[Any]]) =
      rows.map(r => (r.head match { case i: Int => i.toLong; case l: Long => l }) -> r.tail).toMap
    val (e, o) = (keyed(engine), keyed(oracle))
    if (e.keySet != o.keySet)
      return Result(idx, kind, ok = false, engine.size, oracle.size,
        s"key sets differ: engine=${e.keySet.size} oracle=${o.keySet.size}")
    val bad = e.flatMap { case (key, ev) =>
      val ov = o(key)
      if (ev.length != ov.length) Some(s"$key: arity")
      else ev.zip(ov).collectFirst {
        // negated-<= (not >): NaN compares false under BOTH > and <=, so
        // `abs(diff) > tol` would silently PASS an engine NaN — a
        // NaN-producing defect in dimstats/whiten must red this leg, the
        // way GraphFuzzer.rankCompare's TotalOrdering max already does
        case (a: Double, b: Double) if !(math.abs(a - b) <= tol) =>
          s"$key: |${a} - ${b}| > $tol"
        case (a, b) if normalize(a) != normalize(b) && !a.isInstanceOf[Double] =>
          s"$key: $a != $b"
      }
    }.take(3)
    Result(idx, kind, bad.isEmpty, engine.size, oracle.size, bad.mkString("; "))
  }

  // ============================ execution ================================

  /** `tamperOracle`: red-path control — drops one oracle row (exact class)
    * or shifts one double by 10× the band (tolerance class). */
  def run(spark: SparkSession, p: VPlan, tamperOracle: Boolean = false): Result = {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "2")
    import iso.implicits._
    val emb: DataFrame = p.vectors.map { case (id, v) => (id, v.toArray) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < p.nQueries * 2)
    val qSeq = p.vectors.filter(_._1 < p.nQueries * 2)
    // harness-side collects, NOT an operator dataflow: every plan carries
    // ≤150 vectors by generator construction, so the driver holds at most
    // ~1k comparison rows (the oracle side is already in-memory)
    def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)
    def t(oracle: Seq[Seq[Any]]): Seq[Seq[Any]] =
      if (tamperOracle && oracle.nonEmpty) oracle.tail else oracle
    def tTol(oracle: Seq[Seq[Any]], shift: Double): Seq[Seq[Any]] =
      if (!tamperOracle || oracle.isEmpty) oracle
      else oracle.head.map { case d: Double => d + shift; case x => x } +: oracle.tail

    p.kind match {
      case "brute" =>
        exactCompare(p.idx, p.kind,
          rows(Similarity.bruteForceTopK(queries, emb, p.k)),
          t(topK(qSeq, p.vectors, p.k)))

      case "ivf_full" =>
        val (assigned, centroids) = IvfIndex.buildIndex(emb, p.nCells)
        exactCompare(p.idx, p.kind,
          rows(IvfIndex.ivfTopK(queries, assigned, centroids, p.k, nProbe = p.nCells)),
          t(topK(qSeq, p.vectors, p.k)))

      case "ivf_probe" =>
        val (assigned, centroids) = IvfIndex.buildIndex(emb, p.nCells)
        // the quantizer's OUTPUT is the oracle's input; the probe pipeline
        // downstream of it is what gets recomputed independently
        val cents: Map[Int, Vector[Double]] = centroids.collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toVector).toMap
        val cellOf: Map[Long, Int] = assigned.select($"vec_id", $"cell").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val oracle = qSeq.flatMap { case (qid, q) =>
          val qd = q.map(_.toDouble)
          val qn = normD(qd)
          val probedCells = cents.toSeq
            .map { case (cell, c) =>
              val cd = cosOpt(dotD(qd, c), qn, normD(c))
              (cell, cd.map(x => -x))
            }
            // engine orders cdist ASC (Spark default: NULLS FIRST) — a null
            // centroid distance probes BEFORE every real one, unlike the
            // output windows whose DESC order puts null cosines last
            .sortBy { case (cell, nd) => (nd.isDefined, nd.getOrElse(0.0), cell) }
            .take(p.nProbe).map(_._1).toSet
          p.vectors
            .filter { case (cid, _) => cid != qid && probedCells(cellOf(cid)) }
            .map { case (cid, c) =>
              (cid, cosOpt(dotD(qd, c.map(_.toDouble)), qn, norm(c)))
            }
            .sortBy { case (cid, co) => (co.isEmpty, -co.getOrElse(0.0), cid) }
            .take(p.k).zipWithIndex
            .map { case ((cid, co), r) =>
              Seq[Any](qid, cid, co.map(round4).orNull, r + 1)
            }
        }
        exactCompare(p.idx, p.kind,
          rows(IvfIndex.ivfTopK(queries, assigned, centroids, p.k, nProbe = p.nProbe)),
          t(oracle))

      case "ivf_q8" =>
        val (assigned, centroids) = IvfIndex.buildIndex(emb, p.nCells)
        val cents: Map[Int, Vector[Double]] = centroids.collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toVector).toMap
        val cellOf: Map[Long, Int] = assigned.select($"vec_id", $"cell").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val vecById = p.vectors.toMap
        val rerank = 3 // the engine default; survivors = k·rerank
        val oracle = qSeq.flatMap { case (qid, q) =>
          val qd = q.map(_.toDouble)
          val qn = normD(qd)
          val probedCells = cents.toSeq
            .map { case (cell, c) =>
              (cell, cosOpt(dotD(qd, c), qn, normD(c)).map(x => -x))
            }
            .sortBy { case (cell, nd) => (nd.isDefined, nd.getOrElse(0.0), cell) }
            .take(p.nProbe).map(_._1).toSet
          val inCells = p.vectors
            .filter { case (cid, _) => cid != qid && probedCells(cellOf(cid)) }
          // the documented symmetric per-vector int8 quantization:
          // round(x / max(amax/127, 1e-30)) — HALF_UP like Spark's round —
          // then re-floated exactly as the engine's cast(array<double>)
          val qv: Map[Long, Vector[Double]] = inCells.map { case (cid, c) =>
            val amax = if (c.isEmpty) 0.0 else c.map(x => math.abs(x.toDouble)).max
            val scale = math.max(amax / 127.0, 1e-30)
            cid -> c.map(x => java.math.BigDecimal.valueOf(x.toDouble / scale)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue())
          }.toMap
          val survivors = inCells.map { case (cid, _) =>
            val v = qv(cid)
            (cid, cosOpt(dotD(qd, v), qn, normD(v)))
          }.sortBy { case (cid, co) => (co.isEmpty, -co.getOrElse(0.0), cid) }
            .take(p.k * rerank).map(_._1)
          survivors.map { cid =>
            val c = vecById(cid)
            (cid, cosOpt(dotD(qd, c.map(_.toDouble)), qn, norm(c)))
          }.sortBy { case (cid, co) => (co.isEmpty, -co.getOrElse(0.0), cid) }
            .take(p.k).zipWithIndex
            .map { case ((cid, co), r) => Seq[Any](qid, cid, co.map(round4).orNull, r + 1) }
        }
        exactCompare(p.idx, p.kind,
          rows(IvfIndex.ivfTopKQuantized(queries, assigned, centroids, p.k,
            nProbe = p.nProbe, rerank = rerank)),
          t(oracle))

      case "ivf_pq" =>
        val (assigned, centroids) = IvfIndex.buildIndex(emb, p.nCells)
        // subspace count must divide the (random) dim; codes kept small so
        // the per-subspace k-means stays meaningful on ≤150 vectors
        val m = if (p.dim % 4 == 0) 4 else if (p.dim % 2 == 0) 2 else 1
        val sub = p.dim / m
        val nCodes = 8
        val rerank = 3
        val cb = IvfIndex.pqCodebooks(emb, m, nCodes)
        val codes = IvfIndex.pqEncode(assigned, cb, m)
        val engineRows = rows(IvfIndex.ivfTopKPq(queries, assigned, centroids,
          cb, codes, p.k, nProbe = p.nProbe, rerank = rerank))
        // oracle inputs: the engine's OWN model artifacts (the ivf_probe
        // convention — quantizer/codebook training is input, everything
        // downstream is recomputed independently). Harness-side collects,
        // bounded by generator construction: ≤150 vectors × m≤4 subspaces
        // of 8 codes each — model-sized, not operator dataflow
        val cents: Map[Int, Vector[Double]] = centroids.collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toVector).toMap
        val cellOf: Map[Long, Int] = assigned.select($"vec_id", $"cell").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val cbMap: Map[(Int, Int), Vector[Double]] = cb.collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toVector).toMap
        val codeOf: Map[(Long, Int), Int] = codes.collect()
          .map(r => (r.getLong(0), r.getInt(2)) -> r.getInt(3)).toMap
        val vecById = p.vectors.toMap
        val Eps = 1e-9
        val mCut = p.k * rerank
        val engByQ = engineRows.groupBy(_.head match {
          case i: Int => i.toLong; case l: Long => l })
        var ambiguous = 0
        val problems = qSeq.flatMap { case (qid, q0) =>
          // red-path control: a perturbed oracle-side query must red the
          // compare through the normal machinery (probe choice, ADC scores
          // and exact cosines all move — nothing special-cased)
          val q = if (tamperOracle) q0.updated(0, q0(0) + 0.5f) else q0
          val qd = q.map(_.toDouble)
          val qn = normD(qd)
          val probedCells = cents.toSeq
            .map { case (cell, c) =>
              (cell, cosOpt(dotD(qd, c), qn, normD(c)).map(x => -x))
            }
            .sortBy { case (cell, nd) => (nd.isDefined, nd.getOrElse(0.0), cell) }
            .take(p.nProbe).map(_._1).toSet
          val inCells = p.vectors
            .filter { case (cid, _) => cid != qid && probedCells(cellOf(cid)) }
          // ADC score: per-subspace LUT pdot/pc2 replayed as the engine's
          // index-order folds; the cross-subspace sums are the only
          // order-hazardous arithmetic (the EPS band's reason to exist)
          def adc(cid: Long): Option[Double] = {
            var adot = 0.0; var ac2 = 0.0; var j = 0
            while (j < m) {
              val cbv = cbMap((j, codeOf((cid, j))))
              var pd = 0.0; var pc = 0.0; var i = 0
              while (i < sub) {
                pd += qd(j * sub + i) * cbv(i)
                pc += cbv(i) * cbv(i)
                i += 1
              }
              adot += pd; ac2 += pc; j += 1
            }
            if (math.sqrt(ac2) == 0.0) None else Some(adot / math.sqrt(ac2))
          }
          val scored = inCells.map { case (cid, _) => (cid, adc(cid)) }
            .sortBy { case (cid, a) => (a.isEmpty, -a.getOrElse(0.0), cid) }
          def exactRows(ids: Seq[Long]): Seq[Seq[Any]] =
            ids.map { cid =>
              val c = vecById(cid)
              (cid, cosOpt(dot(q, c), qn, norm(c)))
            }.sortBy { case (cid, co) => (co.isEmpty, -co.getOrElse(0.0), cid) }
              .take(p.k).zipWithIndex
              .map { case ((cid, co), r) => Seq[Any](qid, cid, co.map(round4).orNull, r + 1) }
          val eng = engByQ.getOrElse(qid, Seq.empty).map(_.map(normalize))
          val gapSafe = scored.size <= mCut || {
            (scored(mCut - 1)._2, scored(mCut)._2) match {
              case (Some(a), Some(b)) => a - b > Eps * math.max(1.0, math.abs(a))
              case _ => true // a None on either side orders exactly (no fp)
            }
          }
          if (gapSafe) {
            val oracle = exactRows(scored.take(mCut).map(_._1)).map(_.map(normalize))
            if (eng.toSet == oracle.toSet && eng.size == oracle.size) None
            else Some(s"q$qid: exact path diverged (eng=${eng.size} oracle=${oracle.size})")
          } else {
            ambiguous += 1
            // admissibility: the boundary is fp-ambiguous, so accept any
            // survivor resolution but pin everything else
            val bScore = scored(mCut - 1)._2.get
            val admissible = scored.zipWithIndex.collect {
              case ((cid, Some(a)), i) if i < mCut || a >= bScore - Eps * math.max(1.0, math.abs(bScore)) => cid
            }.toSet
            val strict = scored.take(mCut).collect {
              case (cid, Some(a)) if a > bScore + Eps * math.max(1.0, math.abs(bScore)) => cid
            }
            def exactCos(cid: Long): Option[Double] = {
              val c = vecById(cid); cosOpt(dot(q, c), qn, norm(c))
            }
            val engIds = eng.map(_(1).asInstanceOf[Long])
            // the UNROUNDED recomputed cosine of the engine's worst returned
            // candidate, not the round4-rounded output column: a survivor
            // whose exact cosine falls inside the rounding gap (up to ~5e-5
            // below the engine row's true cosine) must not be flagged as
            // "better exact cos dropped" when the engine in fact kept the
            // genuinely better row
            val engMin = engIds.flatMap(exactCos) match {
              case s if s.nonEmpty => s.min; case _ => Double.NegativeInfinity
            }
            val bad =
              if (eng.size != math.min(p.k, scored.size)) Some(s"q$qid: size ${eng.size}")
              else if (!engIds.forall(admissible)) Some(s"q$qid: non-admissible candidate returned")
              else if (eng.map(_(1)).distinct.size != eng.size) Some(s"q$qid: duplicate candidate")
              else if (!eng.forall { r =>
                val cid = r(1).asInstanceOf[Long]
                val expect: Any = exactCos(cid).map(round4).map(Double.box).orNull
                r(2) == expect
              }) Some(s"q$qid: exact-cosine mismatch on returned row")
              else {
                // a strict survivor whose exact cosine strictly beats the
                // engine's worst returned cosine must have been returned
                val missed = strict.filterNot(engIds.contains).filter(cid =>
                  exactCos(cid).exists(_ > engMin + 1e-12))
                if (missed.nonEmpty) Some(s"q$qid: strict survivor ${missed.head} with better exact cos dropped")
                else None
              }
            bad
          }
        }
        Result(p.idx, p.kind,
          ok = problems.isEmpty,
          engineRows.size, engineRows.size,
          (if (ambiguous > 0) s"boundary-ambiguous queries: $ambiguous; " else "") +
            problems.take(3).mkString("; "))

      case "dimstats" =>
        tolCompare(p.idx, p.kind,
          rows(Embeddings.dimStatsOf(emb)),
          tTol(oracleDimStats(p), 2e-5), tol = 2e-6)

      case "whiten" =>
        tolCompare(p.idx, p.kind,
          rows(Embeddings.whitenedNormsOf(emb)),
          tTol(oracleWhiten(p), 2e-3), tol = 2e-4)
    }
  }
}

package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Graph, Iterative}
import scala.collection.mutable
import scala.util.Random

/** Seeded differential fuzzer for the GRAPH kernels — the third leg of the
  * randomized programme (SqlFuzzer covers the relational core vs DuckDB;
  * StreamFuzzer covers the stateful half vs batch recomputation; until now
  * the 14 graph kernels were pinned only by their curated gates, each of
  * which runs ONE fixed corpus-derived graph).
  *
  * Each plan draws a random small multigraph — node ids sampled sparsely
  * from a widened id space (so `% seedEvery` seed selection, dangling
  * nodes, isolated pairs, and disconnected components all arise naturally),
  * raw edges WITH duplicates and self-loops (the kernels canonicalize;
  * whether they canonicalize correctly is part of what's under test) — and
  * runs one kernel on Spark against a plain-Scala brute-force oracle
  * computed directly from the definition:
  *
  *   cc          star-contraction labels  vs union-find component minimum
  *   triangles   degree-ordered wedge close vs exhaustive triple scan
  *   kcore       8 fixed peel rounds      vs the same loop on adjacency maps
  *   lpa         4 synchronous rounds     vs per-node (count, −label) argmax
  *   bfs         4 min-relax rounds       vs synchronous Bellman-Ford (hops)
  *   sssp        4 weighted relax rounds  vs Bellman-Ford in integer bp
  *   pagerank    5 damped power iters     vs the same recurrence in doubles
  *   ppr         5 personalized iters     vs the same recurrence in doubles
  *   assort      integer moment sufficient stats vs direct summation
  *   modularity  LPA labels + Q·4m²       vs integer Newman sum over the oracle labels
  *   centrality  radius-4 all-pairs       vs per-source bounded BFS
  *   walks       LCG-ranked hops          vs the same LCG replayed on sorted adjacency
  *
  * The oracles share NOTHING with the implementations — no Spark, no SQL,
  * no shared helpers (teleport and the LCG constants are re-derived from
  * their documented definitions) — so agreement is evidence the dataflow
  * graphs compute the math they claim, across graph shapes nobody curated.
  *
  * Determinism: kernel choice cycles by index (a count-12k run covers every
  * kernel exactly k times); everything else derives from the JDK-specified
  * LCG of `new Random(seed + 9000007·i)`, so any failing plan reproduces
  * from (seed, index) alone. Exact compare for integer kernels; 1e-9
  * absolute tolerance for the two double-valued rank vectors (Spark's
  * aggregation order is partition-dependent, a real divergence is ≥1e-3).
  */
object GraphFuzzer {

  val kernels: Vector[String] = Vector(
    "cc", "triangles", "kcore", "lpa", "bfs", "sssp",
    "pagerank", "ppr", "assort", "modularity", "centrality", "walks")

  /** Raw edge: (a, b, jaccardPct ∈ [0,100]). Directed kernels read it as
    * src=a, dst=b, w = 1 + jaccardPct % 5; undirected kernels canonicalize. */
  final case class GPlan(idx: Int, kernel: String, k: Int,
                         edges: Vector[(Long, Long, Int)]) {
    def nodeIds: Vector[Long] =
      (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
  }

  def plan(seed: Long, i: Int): GPlan = {
    val r = new Random(seed + 9000007L * i)
    val n = 8 + r.nextInt(53)
    // sparse ids over a 2–4× wider space: multiples of 10 (the bfs/sssp
    // seed rule) are present-but-not-dense, and gaps make the id-derived
    // LCG walk keys non-contiguous
    val space = n * (2 + r.nextInt(3))
    val ids = r.shuffle((0 until space).toVector).take(n).map(_.toLong)
    val m = n / 2 + r.nextInt(2 * n)
    val edges = Vector.fill(m) {
      (ids(r.nextInt(n)), ids(r.nextInt(n)), r.nextInt(101))
    }
    GPlan(i, kernels(i % kernels.length), 2 + r.nextInt(2), edges)
  }

  def plans(seed: Long, count: Int): Seq[GPlan] =
    (0 until count).map(plan(seed, _))

  final case class Result(idx: Int, kernel: String, ok: Boolean,
                          engineRows: Long, oracleRows: Long, detail: String)

  // ======================= oracle building blocks ========================

  /** Canonical undirected edge set: least/greatest, no self-loops, distinct. */
  private def canonical(p: GPlan): Set[(Long, Long)] =
    p.edges.collect { case (a, b, _) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet

  /** Symmetric adjacency over the canonical edge set. */
  private def adjacency(canon: Set[(Long, Long)]): Map[Long, Set[Long]] = {
    val m = mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    canon.foreach { case (a, b) => m(a) += b; m(b) += a }
    m.toMap
  }

  private def oracleCc(p: GPlan): Seq[Seq[Any]] = {
    val canon = canonical(p)
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = parent.getOrElse(x, x)
      if (px == x) x else { val r = find(px); parent(x) = r; r }
    }
    canon.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }
    val label = nodes.map(v => v -> find(v)).toMap
    // component label = component MINIMUM (find with min-directed union)
    nodes.toSeq.map(v => Seq[Any](v, label(v)))
  }

  private def oracleTriangles(p: GPlan): Seq[Seq[Any]] = {
    val canon = canonical(p)
    val adj = adjacency(canon)
    val nodes = adj.keys.toVector.sorted
    var tri = 0L
    for {
      (a, b) <- canon
      c <- adj(a) if c > b && adj(b).contains(c)
    } tri += 1
    val wedges = nodes.map { v => val d = adj(v).size.toLong; d * (d - 1) / 2 }.sum
    val ppm =
      if (wedges == 0L) 0L
      else java.math.BigDecimal.valueOf(3.0 * tri / wedges * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    Seq(Seq[Any](tri, wedges, ppm))
  }

  private def oracleKcore(p: GPlan): Seq[Seq[Any]] = {
    var e = canonical(p)
    for (_ <- 1 to 8) {
      val deg = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
      val keep = deg.collect { case (v, d) if d >= p.k => v }.toSet
      e = e.filter { case (a, b) => keep(a) && keep(b) }
    }
    val deg = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    e.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    deg.toSeq.map { case (v, d) => Seq[Any](v, d) }
  }

  private def oracleLpaLabels(p: GPlan): Map[Long, Long] = {
    val adj = adjacency(canonical(p))
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (v, nbrs) =>
        val counts = nbrs.toSeq.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size.toLong) }
        // argmax by (count, −label): max count, then SMALLEST label
        val best = counts.toSeq.maxBy { case (l, c) => (c, -l) }
        v -> best._1
      }
    }
    lbl
  }

  private def oracleLpa(p: GPlan): Seq[Seq[Any]] =
    oracleLpaLabels(p).toSeq.map { case (v, l) => Seq[Any](v, l) }

  private def oracleBfs(p: GPlan): Seq[Seq[Any]] = {
    val adj = adjacency(canonical(p))
    var dist = adj.keys.filter(_ % 10 == 0).map(v => v -> 0L).toMap
    for (_ <- 1 to 4) {
      val next = mutable.Map.from(dist)
      dist.foreach { case (v, d) =>
        adj(v).foreach { u =>
          if (!next.contains(u) || next(u) > d + 1) next(u) = d + 1
        }
      }
      dist = next.toMap
    }
    dist.toSeq.map { case (v, d) => Seq[Any](v, d) }
  }

  /** Canonical weighted edges: w = 10000 − jpct·100 in basis points,
    * minimum over duplicate rows mapping to one canonical pair. */
  private def weightedCanon(p: GPlan): Map[(Long, Long), Long] = {
    val m = mutable.Map.empty[(Long, Long), Long]
    p.edges.foreach { case (a, b, j) =>
      if (a != b) {
        val key = (math.min(a, b), math.max(a, b))
        val w = 10000L - j * 100L
        m(key) = math.min(m.getOrElse(key, Long.MaxValue), w)
      }
    }
    m.toMap
  }

  private def oracleSssp(p: GPlan): Seq[Seq[Any]] = {
    val wc = weightedCanon(p)
    val adj = mutable.Map.empty[Long, List[(Long, Long)]].withDefaultValue(Nil)
    wc.foreach { case ((a, b), w) => adj(a) ::= (b, w); adj(b) ::= (a, w) }
    var dist = adj.keys.filter(_ % 10 == 0).map(v => v -> 0L).toMap
    for (_ <- 1 to 4) {
      val next = mutable.Map.from(dist)
      dist.foreach { case (v, d) =>
        adj(v).foreach { case (u, w) =>
          if (!next.contains(u) || next(u) > d + w) next(u) = d + w
        }
      }
      dist = next.toMap
    }
    dist.toSeq.map { case (v, d) => Seq[Any](v, d) }
  }

  /** Teleport re-derived from its documented definition (decimal string of
    * 1 − damping), NOT by calling the engine's helper. */
  private val damping = 0.85
  private val teleport = (BigDecimal(1) - BigDecimal(damping.toString)).toDouble

  private def directed(p: GPlan): Vector[(Long, Long, Double)] =
    p.edges.map { case (a, b, j) => (a, b, (1 + j % 5).toDouble) }

  private def powerIter(rows: Vector[(Long, Long, Double)],
                        init: Map[Long, Double],
                        restart: Map[Long, Double]): Map[Long, Double] = {
    val nodes = (rows.map(_._1) ++ rows.map(_._2)).distinct
    val sumW = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val hasOut = rows.map(_._1).toSet
    var rank = init
    for (_ <- 1 to 5) {
      val cin = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      rows.foreach { case (s, d, w) => cin(d) += w / sumW(s) * rank(s) }
      val dmass = nodes.filterNot(hasOut).map(rank).sum
      rank = nodes.map { v =>
        v -> (teleport * restart(v) + damping * (cin(v) + dmass * restart(v)))
      }.toMap
    }
    rank
  }

  private def oraclePagerank(p: GPlan): Map[Long, Double] = {
    val rows = directed(p)
    val nodes = (rows.map(_._1) ++ rows.map(_._2)).distinct
    val n = nodes.size
    powerIter(rows, nodes.map(v => v -> 1.0 / n).toMap,
      nodes.map(v => v -> 1.0 / n).toMap)
  }

  /** Seed rule shared with the engine call: nodes % 3 == 0, falling back to
    * the minimum node id when that set is empty (PPR requires ≥1 seed). */
  def pprSeeds(p: GPlan): Vector[Long] = {
    val nodes = (directed(p).map(_._1) ++ directed(p).map(_._2)).distinct
    val s = nodes.filter(_ % 3 == 0)
    if (s.nonEmpty) s.sorted else Vector(nodes.min)
  }

  private def oraclePpr(p: GPlan): Map[Long, Double] = {
    val rows = directed(p)
    val nodes = (rows.map(_._1) ++ rows.map(_._2)).distinct
    val seeds = pprSeeds(p).toSet
    val nS = seeds.size
    val restart = nodes.map(v => v -> (if (seeds(v)) 1.0 / nS else 0.0)).toMap
    powerIter(rows, restart, restart)
  }

  private def oracleAssort(p: GPlan): Seq[Seq[Any]] = {
    val adj = adjacency(canonical(p))
    // Spark's sum over ZERO rows is NULL (count is 0): mirror the exact
    // all-self-loop degenerate row rather than fabricating zeros
    if (adj.isEmpty)
      return Seq(Seq[Any](0L, null, null, null, null, null, null))
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var (n, sx, sy, sxy, sx2, sy2) = (0L, 0L, 0L, 0L, 0L, 0L)
    adj.foreach { case (a, nbrs) =>
      nbrs.foreach { b =>
        val (x, y) = (deg(a), deg(b))
        n += 1; sx += x; sy += y; sxy += x * y; sx2 += x * x; sy2 += y * y
      }
    }
    val varprod = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    val coef: Any =
      if (varprod == 0L) null
      else {
        val v = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sx2 - sx * sx).toDouble * (n * sy2 - sy * sy).toDouble)
        java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    Seq(Seq[Any](n, sx, sy, sxy, sx2, sy2, coef))
  }

  private def oracleModularity(p: GPlan): Seq[Seq[Any]] = {
    val canon = canonical(p)
    val lbl = oracleLpaLabels(p)
    val m = canon.size.toLong
    val lC = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    canon.foreach { case (a, b) => if (lbl(a) == lbl(b)) lC(lbl(a)) += 1 }
    val dC = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    adjacency(canon).foreach { case (v, nbrs) => dC(lbl(v)) += nbrs.size.toLong }
    // same degenerate-row rule: sum over zero communities is NULL
    val q: Any = if (dC.isEmpty) null
                 else dC.map { case (c, d) => 4L * m * lC(c) - d * d }.sum
    Seq(Seq[Any](q, m))
  }

  private def oracleCentrality(p: GPlan): Seq[Seq[Any]] = {
    val adj = adjacency(canonical(p))
    adj.keys.toSeq.map { src =>
      var dist = Map(src -> 0L)
      for (_ <- 1 to 4) {
        val next = mutable.Map.from(dist)
        dist.foreach { case (v, d) =>
          adj(v).foreach { u =>
            if (!next.contains(u) || next(u) > d + 1) next(u) = d + 1
          }
        }
        dist = next.toMap
      }
      val reached = dist.filter(_._2 > 0)
      Seq[Any](src, reached.values.map(12L / _).sum,
        reached.values.max, reached.size.toLong)
    }
  }

  /** LCG constants re-derived from the documented generator
    * (x → (x·1103515245 + 12345) mod 2³¹ over pmod-nonnegative x). */
  private def lcg(key: Long): Long = {
    val m = 2147483648L
    Math.floorMod(Math.floorMod(key, m) * 1103515245L + 12345L, m)
  }

  private def oracleWalks(p: GPlan): Seq[Seq[Any]] = {
    val adj = adjacency(canonical(p)).view.mapValues(_.toVector.sorted).toMap
    val out = Seq.newBuilder[Seq[Any]]
    adj.keys.toSeq.foreach { start =>
      var node = start
      out += Seq[Any](start, 0, node)
      for (t <- 1 to 4) {
        val nbrs = adj(node)
        val idx = Math.floorMod(lcg(start * 1000003L + node * 97L + t), nbrs.size.toLong)
        node = nbrs(idx.toInt)
        out += Seq[Any](start, t, node)
      }
    }
    out.result()
  }

  // ============================ execution ================================

  private def normalize(v: Any): Any = v match {
    case i: Int => i.toLong
    case x => x
  }

  private def multiset(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
    rows.map(_.map(normalize)).groupBy(identity).view.mapValues(_.size).toMap

  private def exactCompare(idx: Int, kernel: String,
                           engine: Seq[Seq[Any]], oracle: Seq[Seq[Any]]): Result = {
    val (e, o) = (multiset(engine), multiset(oracle))
    val ok = e == o
    val detail = if (ok) "" else {
      val extra = (e.keySet -- o.keySet).take(3)
      val miss = (o.keySet -- e.keySet).take(3)
      s"engine=${engine.size} oracle=${oracle.size} extra=$extra missing=$miss"
    }
    Result(idx, kernel, ok, engine.size, oracle.size, detail)
  }

  private def rankCompare(idx: Int, kernel: String,
                          engine: Map[Long, Double], oracle: Map[Long, Double]): Result = {
    val keysOk = engine.keySet == oracle.keySet
    val maxDiff =
      if (!keysOk) Double.MaxValue
      else if (engine.isEmpty) 0.0
      else engine.map { case (k, v) => math.abs(v - oracle(k)) }.max
    val ok = keysOk && maxDiff < 1e-9
    val detail = if (ok) "" else if (!keysOk)
      s"node sets differ: engine=${engine.size} oracle=${oracle.size}"
    else f"max |Δrank| = $maxDiff%.3e"
    Result(idx, kernel, ok, engine.size, oracle.size, detail)
  }

  /** `tamperOracle` deliberately corrupts the oracle before the compare —
    * the red-path control (GraphFuzzSpec): a harness whose all-green runs
    * are evidence must be shown to red when the two sides disagree. Integer
    * kernels drop one oracle row; rank kernels shift one rank by 1e-6
    * (three orders above the tolerance). */
  def run(spark: SparkSession, p: GPlan, tamperOracle: Boolean = false): Result = {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "2")
    import iso.implicits._
    val pairs: DataFrame = p.edges
      .map { case (a, b, j) => (a, b, j / 100.0) }
      .toDF("doc_a", "doc_b", "jaccard")
    // harness-side collects, NOT an operator dataflow: every plan's graph
    // is ≤60 nodes by generator construction, so the driver holds at most
    // a few hundred comparison rows (the oracle side is already in-memory)
    def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)
    def ranks(df: DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def t(oracle: Seq[Seq[Any]]): Seq[Seq[Any]] =
      if (tamperOracle && oracle.nonEmpty) oracle.tail else oracle
    def tr(oracle: Map[Long, Double]): Map[Long, Double] =
      if (tamperOracle && oracle.nonEmpty) {
        val k = oracle.keys.min
        oracle.updated(k, oracle(k) + 1e-6)
      } else oracle
    p.kernel match {
      case "cc" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.connectedComponentsStar(pairs)), t(oracleCc(p)))
      case "triangles" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.triangleStats(pairs)), t(oracleTriangles(p)))
      case "kcore" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.kCore(pairs, k = p.k)), t(oracleKcore(p)))
      case "lpa" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.labelPropagation(pairs)), t(oracleLpa(p)))
      case "bfs" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.bfsHops(pairs)), t(oracleBfs(p)))
      case "sssp" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.ssspWeighted(pairs)), t(oracleSssp(p)))
      case "pagerank" =>
        val edges = directed(p).toDF("src", "dst", "w")
        rankCompare(p.idx, p.kernel,
          ranks(Graph.pageRankDirected(edges)), tr(oraclePagerank(p)))
      case "ppr" =>
        val edges = directed(p).toDF("src", "dst", "w")
        val seeds = pprSeeds(p).toDF("node")
        rankCompare(p.idx, p.kernel,
          ranks(Graph.personalizedPageRank(edges, seeds)), tr(oraclePpr(p)))
      case "assort" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.degreeAssortativity(pairs)), t(oracleAssort(p)))
      case "modularity" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.modularity(pairs, Graph.labelPropagation(pairs))),
          t(oracleModularity(p)))
      case "centrality" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.centralityProfile(pairs)), t(oracleCentrality(p)))
      case "walks" =>
        exactCompare(p.idx, p.kernel,
          rows(Graph.randomWalks(pairs)), t(oracleWalks(p)))
    }
  }
}

package graft

import graft.operators.{Corpus, Relational, Similarity}
import org.apache.spark.sql.functions._

/** Pins for the series/sampling batch: linear gap interpolation, cumulative
  * distinct users, SCD2 validity intervals, hard-negative mining, and
  * class-balanced upsampling. Each test asserts an invariant the DuckDB
  * hash-compare can't express (boundedness, interval algebra, cross-query
  * agreement with an independent Spark computation).
  */
class SeriesAndSamplingSpec extends SparkSpec {

  test("interpolation's integral DIV contract: every hourly cents sum is non-negative") {
    // The q_interpolate payload relies on Spark `DIV` ≡ DuckDB `//`, which
    // holds ONLY for non-negative dividends (they truncate toward zero vs
    // floor on negatives). The dividend is built from the bracketing hourly
    // sums, so the contract is: no (event_type, hour) group may sum to
    // negative cents. Checked here against the live fixture (also verified
    // ≥ 21 / ≥ 26 / ≥ 33009 at sf0.001/0.01/0.1 when this pin was added);
    // a fixture regen that breaks it reds this spec, not the driver hash.
    val minHourly = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")))
      .agg(sum(floor(col("value") * 100).cast("long")).as("c"))
      .agg(min(col("c"))).head().getLong(0)
    assert(minHourly >= 0L,
      s"negative hourly cents sum ($minHourly): Spark DIV and DuckDB // diverge " +
        "on negative dividends — q_interpolate's oracle equivalence is void")
  }

  test("interpolated values are bracketed by their neighbors; observed rows pass through") {
    val rows = Relational.interpolateHourly(spark, sf).collect()
    assert(rows.nonEmpty)
    // per type: gather observed series, check gap rows sit inside the
    // bracketing observations' [min, max] and edge rows are null
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byHour = rs.sortBy(_.getAs[java.sql.Timestamp]("hour").getTime)
      val obsIdx = byHour.zipWithIndex.filter(_._1.getAs[Int]("observed") == 1).map(_._2)
      assert(obsIdx.nonEmpty)
      byHour.zipWithIndex.foreach { case (r, i) =>
        val v = Option(r.getAs[java.lang.Long]("cents_e4")).map(_.toLong)
        if (r.getAs[Int]("observed") == 1) {
          assert(v.isDefined)
          assert(v.get % 10000L === 0L, "observed rows are whole cents × 10⁴")
        } else if (i < obsIdx.head || i > obsIdx.last) assert(v.isEmpty, s"edge row $i must be null")
        else {
          val prev = obsIdx.filter(_ < i).last
          val next = obsIdx.filter(_ > i).head
          val a = byHour(prev).getAs[Long]("cents_e4")
          val b = byHour(next).getAs[Long]("cents_e4")
          assert(v.isDefined)
          // integral DIV floors, so allow the one-unit truncation slack
          assert(v.get >= math.min(a, b) - 1L && v.get <= math.max(a, b) + 1L,
            s"gap row $i=$v outside [$a, $b]")
        }
      }
    }
  }

  test("cumulative distinct users ends at the true distinct count and is strictly increasing") {
    val rows = Relational.cumulativeDistinctUsers(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    val trueDistinct = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.last.getAs[Long]("cume_users") == trueDistinct)
    val cumes = rows.map(_.getAs[Long]("cume_users"))
    assert(cumes.zip(cumes.tail).forall { case (a, b) => b > a })
    assert(rows.map(_.getAs[Long]("n_new")).sum == trueDistinct)
  }

  test("scd2 intervals tile each user's timeline: contiguous, one open interval, type changes at bounds") {
    val rows = Relational.scd2Intervals(spark, sf).collect()
    assert(rows.nonEmpty)
    val evCount = Tables.events(spark, sf).filter(col("user_id") < 30).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == evCount)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[java.sql.Timestamp]("valid_from").getTime,
        r.getAs[String]("event_type")))
      // exactly one open (null valid_to) interval — the current state
      assert(sorted.count(_.getAs[java.sql.Timestamp]("valid_to") == null) == 1)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[java.sql.Timestamp]("valid_to") ==
          b.getAs[java.sql.Timestamp]("valid_from"), "intervals must be contiguous")
        assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
          "adjacent runs must change type (runs of one type are collapsed)")
      }
    }
  }

  test("hard negatives differ in label from the anchor and rank densely by cosine") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("q_label") != r.getAs[Int]("c_label"))
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length))
      val coss = ranked.map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("balanced upsampling lifts every class to at least the majority size with dense copy ids") {
    val out = Corpus.upsampleBalanced(spark, sf)
    val perClass = out.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    val orig = Tables.documents(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    val target = orig.values.max
    perClass.foreach { case (lang, n) =>
      assert(n >= target, s"$lang upsampled to $n < target $target")
      // ceil replication overshoots by less than one original class size
      assert(n < target + orig(lang), s"$lang overshoots: $n >= ${target + orig(lang)}")
    }
    // copy ids are dense 1..copies per doc
    val maxCopy = out.groupBy(col("doc_id")).agg(
      max(col("copy_id")).as("mx"), count(lit(1)).as("n")).collect()
    maxCopy.foreach(r => assert(r.getAs[Long]("mx") == r.getAs[Long]("n")))
  }

  test("wau equals the brute-force trailing-7-day distinct count") {
    val rows = Relational.trailingWeekActives(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent brute force: inequality self-join of the activity set
    // (fine at test scale; the operator exists precisely to avoid this)
    val active = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = active.select(col("day")).distinct()
      .withColumnRenamed("day", "d")
    val brute = days.join(active,
        col("day") <= col("d") && col("day") >= date_sub(col("d"), 6))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("bwau"))
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("bwau")).toMap
    rows.foreach { r =>
      val d = r.getDate(0).toString
      // brute only has days with ≥1 active user that day; operator rows
      // cover contribution days too — compare where both sides exist
      brute.get(d).foreach(b => assert(r.getAs[Long]("wau") == b, s"wau($d)"))
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
    }
  }

  test("length deciles partition the corpus into ordered, near-balanced bins") {
    val rows = Corpus.lengthDeciles(spark, sf)
      .orderBy(col("decile")).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to rows.length))
    // bins are ordered: each decile's max never exceeds the next one's min
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("max_chars") <= b.getAs[Long]("min_chars"))
    }
    // near-balanced: every bin within 3x of ideal (ties can skew small corpora)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <= 3 * (total / 10 + 1)))
  }

  test("transition matrix rows sum to one and transitions to events minus stream heads") {
    val rows = Relational.transitionMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum == expected,
      "each user's final event is the only one without a successor")
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-3 * rs.length, s"row sums to $p")
    }
  }

  test("value histogram covers all orders with ordered bin edges") {
    val rows = Relational.valueHistogram(spark, sf).orderBy(col("bin")).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables.orders(spark, sf).count())
    assert(rows.forall(r => r.getAs[Int]("bin") >= 0 && r.getAs[Int]("bin") <= 19))
    val los = rows.map(_.getAs[Double]("bin_lo"))
    assert(los.zip(los.tail).forall { case (a, b) => a < b })
  }

  test("cohort matrix: offset-0 equals cohort size and cells never exceed it") {
    val rows = Relational.cohortMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (_, rs) =>
      val base = rs.find(_.getAs[Int]("week_offset") == 0)
      assert(base.isDefined, "every user is active in their own cohort week")
      val size = base.get.getAs[Long]("n_users")
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= size))
    }
    val activitySet = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == activitySet)
  }

  test("bounce rate counts singleton sessions over the session_window aggregation") {
    val rows = Relational.bounceRate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
      val expect = r.getAs[Long]("n_bounces").toDouble / r.getAs[Long]("n_sessions")
      assert(math.abs(r.getAs[Double]("bounce_rate") - expect) < 5.1e-5)
    }
    val totalSessions = Relational.sessionWindows(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == totalSessions)
  }

  test("cusum closes at zero and flags at least one interior peak") {
    val rows = Relational.cusumChangepoint(spark, sf).orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    // S_n − n·μ ≡ 0: the walk must return to zero at the last day
    assert(math.abs(rows.last.getAs[Double]("cusum")) < 1e-6)
    assert(rows.count(_.getAs[Int]("is_peak") == 1) >= 1)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("PSI drift matches a driver recomputation and is non-negative") {
    val r = Relational.psiDrift(spark, sf).head()
    val psi = r.getAs[Double]("psi")
    // PSI is a sum of (p−q)ln(p/q) terms, each ≥ 0
    assert(psi >= 0.0, s"psi=$psi")
    assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    assert(r.getAs[Int]("drift_flag") === (if (psi >= 0.1) 1 else 0))
    // exact driver mirror of the whole computation (integer cut, fixed
    // bins, add-one smoothing) — the operator is a pure function of the
    // event set
    val ev = Tables.events(spark, sf)
      .select(unix_timestamp(col("ts")).as("ts_s"), col("value"))
      .collect().map(x => (x.getAs[Long]("ts_s"), x.getAs[Double]("value")))
    val cut = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val ca = new Array[Long](10); val cb = new Array[Long](10)
    ev.foreach { case (t, v) =>
      val bin = math.min(math.max(math.floor(v / 50.0).toInt, 0), 9)
      if (t < cut) ca(bin) += 1 else cb(bin) += 1
    }
    val (na, nb) = (ca.sum, cb.sum)
    val expected = (0 until 10).map { i =>
      val p = (ca(i) + 1).toDouble / (na + 10)
      val q = (cb(i) + 1).toDouble / (nb + 10)
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(psi - expected) < 1e-3, s"psi=$psi expected=$expected")
    assert(r.getAs[Long]("n_ref") === na && r.getAs[Long]("n_cur") === nb)
  }

  test("rfm scores stay in 1..5 and partition every customer") {
    val rows = Relational.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
    }
    val nCust = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
  }

  test("reactivations agree with a driver-side gap recomputation") {
    val rows = Relational.reactivations(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("n_reactivated")).toMap
    val activity = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expected = activity.groupBy(_._1).values.flatMap { days =>
      val sorted = days.map(_._2).sortBy(_.toEpochDay)
      sorted.zip(sorted.tail).collect {
        case (a, b) if b.toEpochDay - a.toEpochDay >= 2 => b.toString
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == expected)
  }

  test("ship-delay profile covers every line item with coherent bounds") {
    val rows = Relational.shipDelayByPriority(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      val (mn, mx, n, tot) = (r.getAs[Int]("min_delay"), r.getAs[Int]("max_delay"),
        r.getAs[Long]("n_items"), r.getAs[Long]("total_delay_days"))
      assert(mn <= mx)
      assert(tot >= mn.toLong * n && tot <= mx.toLong * n)
    }
  }

  test("pareto crossing rank matches a driver-side exact-cents recomputation") {
    val row = Relational.paretoConcentration(spark, sf).collect().head
    val revenues = Tables.orders(spark, sf)
      .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("r"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .sortBy { case (ck, cents) => (-cents, ck) }
    val total = revenues.map(_._2).sum
    var cume = 0L
    val nTop = revenues.indexWhere { case (_, cents) => cume += cents; cume * 10 >= total * 8 } + 1
    assert(row.getAs[Int]("n_top_customers") == nTop)
    assert(row.getAs[Long]("n_customers") == revenues.length.toLong)
  }

  test("growth accounting decomposes DAU and balances churn against yesterday's actives") {
    val rows = Relational.growthAccounting(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    val dau = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val d = r.getDate(0).toString
      // new + retained + resurrected = that day's DAU (0 for pure-churn days)
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") +
        r.getAs[Long]("n_resurrected") == dau.getOrElse(d, 0L), s"DAU split $d")
    }
    rows.zip(rows.tail).foreach { case (prev, cur) =>
      val (pd, cd) = (prev.getDate(0).toLocalDate, cur.getDate(0).toLocalDate)
      if (cd == pd.plusDays(1))
        // everyone active yesterday either returns (retained) or churns today
        assert(prev.getAs[Long]("n_new") + prev.getAs[Long]("n_retained") +
          prev.getAs[Long]("n_resurrected") ==
          cur.getAs[Long]("n_retained") + cur.getAs[Long]("n_churned"),
          s"churn balance $cd")
    }
    assert(rows.map(_.getAs[Long]("n_new")).sum ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
  }

  test("ab test covers every user once with a coherent z sign") {
    val r = Relational.abTestConversion(spark, sf).collect().head
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nUsers)
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
    Option(r.getAs[java.lang.Double]("z_stat")).foreach { z =>
      val diff = r.getAs[Double]("rate_a") - r.getAs[Double]("rate_b")
      if (math.abs(diff) > 1e-9) assert(math.signum(z) == math.signum(diff))
    }
  }

  test("weighted median satisfies the defining crossing property per flag") {
    val meds = Relational.weightedMedianPrice(spark, sf).collect()
    assert(meds.nonEmpty)
    // independent recomputation from the raw facts: strictly-below weight
    // must be < half total, at-or-below weight must be >= half total
    val facts = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("q"))
      .collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    meds.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val m = r.getAs[Double]("w_median")
      val rows = facts(flag)
      val total = rows.map(_.getAs[Long]("q")).sum
      assert(total == r.getAs[Long]("total_units"))
      val below = rows.filter(_.getAs[Double]("l_extendedprice") < m - 5e-3)
        .map(_.getAs[Long]("q")).sum
      val atOrBelow = rows.filter(_.getAs[Double]("l_extendedprice") <= m + 5e-3)
        .map(_.getAs[Long]("q")).sum
      assert(below * 2 < total, s"$flag: weight below median must be < half")
      assert(atOrBelow * 2 >= total, s"$flag: weight at-or-below median must reach half")
    }
  }

  test("seasonal anomalies genuinely exceed their hour-of-day baseline") {
    val rows = Relational.seasonalAnomalies(spark, sf).collect()
    val nBuckets = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    // a 3-sigma gate must flag a small minority of buckets
    assert(rows.length < nBuckets / 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >
        r.getAs[Double]("baseline_mu") + 3.0 * r.getAs[Double]("baseline_sigma") - 1e-3)
    }
  }
}

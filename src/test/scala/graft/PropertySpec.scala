package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Outliers, Periodogram, UnitRoots, WeightedBins}
import graft.ops.stat.{MacKinnon, Stats}

/** Property-based invariants (SURVEY §5.4) over the local kernels —
  * these run without Spark, directly on the kernel math. (The
  * scalatest-scalacheck bridge isn't in the offline cache, so sampling is
  * a deterministic loop over seeded Gen draws.)
  */
class PropertySpec extends SparkSpec {

  /** Deterministic forAll: n seeded samples from the generator. */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val series = Gen.choose(25, 80).flatMap(n =>
    Gen.listOfN(n, Gen.choose(-50.0, 50.0)).map(_.toArray))

  /** Local mirror of Sampling.bucketHash / threshold — the formulas the
    * DuckDB oracles replay. */
  private def localHash(id: Long): Long =
    (((id % 2147483648L) + 2147483648L) % 2147483648L) * 2654435761L % 4294967296L
  private def localThreshold(frac: Double): Long =
    math.floor(frac * 4294967296.0).toLong

  test("sampling membership: monotone in frac, exact at endpoints, mirrors the Column") {
    val gen = for {
      id <- Gen.choose(0L, 4000000000L)
      f1 <- Gen.choose(0.0, 1.0)
      f2 <- Gen.choose(0.0, 1.0)
    } yield (id, math.min(f1, f2), math.max(f1, f2))
    forAll(gen, 300) { case (id, lo, hi) =>
      val h = localHash(id)
      assert(h >= 0 && h < 4294967296L)
      // monotone: membership at lo implies membership at hi
      if (h < localThreshold(lo)) assert(h < localThreshold(hi))
      assert(h >= localThreshold(0.0))
      assert(h < localThreshold(1.0))
    }
    // the local mirror IS the Column expression (one job, many ids)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0 until 200).map(i => i * 7919L + 13L)
    val fromCol = ids.toDF("id")
      .select(col("id"), graft.ext.Sampling.bucketHash(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach(id => assert(fromCol(id) == localHash(id), s"id $id"))
  }

  test("packing: pack ids contiguous from 0; budget holds below the last doc") {
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.choose(1L, 400L))
      cap <- Gen.choose(50L, 1000L)
    } yield (toks, cap)
    forAll(gen, 200) { case (toks, cap) =>
      val priors = toks.scanLeft(0L)(_ + _).init
      val packs = priors.map(p => p / cap)
      // starts at 0 and never goes backwards (a doc larger than the
      // capacity legitimately skips pack ids)
      assert(packs.head == 0L)
      assert(packs.zip(packs.tail).forall { case (a, b) => b >= a })
      // budget: a pack's tokens minus its last doc fit inside capacity
      toks.zip(packs).groupBy(_._2).values.foreach { grp =>
        val total = grp.map(_._1).sum
        assert(total - grp.last._1 < cap, s"cap $cap grp $grp")
      }
    }
  }

  test("weighted bins: mass conservation and bounded averages") {
    val gen = for {
      n <- Gen.choose(3, 30)
      q1 <- Gen.listOfN(n, Gen.choose(1.0, 200.0))
      q2 <- Gen.listOfN(n, Gen.choose(1.0, 50.0))
    } yield (q1.toArray, q2.toArray)
    forAll(gen) { case (q1, q2) =>
      val bins = WeightedBins.binsForGroup(q1, q2, binSize = 100.0, maxBins = 5)
      assert(bins.length == q1.length - 1)
      bins.zipWithIndex.foreach { case (row, i) =>
        val future = (i + 1 until q1.length)
        val lo = future.map(q2(_)).min
        val hi = future.map(q2(_)).max
        row.filterNot(_.isNaN).foreach { v =>
          assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"avg $v outside [$lo,$hi]")
        }
        // NaN only after mass exhausts: once NaN, later bins NaN too
        val firstNaN = row.indexWhere(_.isNaN)
        if (firstNaN >= 0) assert(row.drop(firstNaN).forall(_.isNaN))
      }
    }
  }

  test("hurst: constant series 0.5; affine invariance of R/S shape") {
    forAll(series) { x =>
      whenever(x.length >= 20) {
        // R/S of a+b*x equals R/S of x (b>0) => same hurst
        def h(v: Array[Double]): Double = {
          val n = v.length
          val mu = v.sum / n
          val cs = v.scanLeft(0.0)(_ + _ - mu).tail
          val r = cs.max - cs.min
          val s = math.sqrt(v.map(a => (a - mu) * (a - mu)).sum / (n - 1))
          if (s == 0) 0.5 else math.log(r / s) / math.log(n)
        }
        val scaled = x.map(v => 3.0 * v + 7.0)
        if (x.distinct.length > 1)
          assert(math.abs(h(x) - h(scaled)) < 1e-9)
      }
    }
  }

  test("ADF p-values are monotone in the statistic and within [0,1]") {
    forAll(Gen.zip(Gen.choose(-6.0, 1.0), Gen.choose(-6.0, 1.0))) { case (s1, s2) =>
      val p1 = MacKinnon.p(s1, "c", 1)
      val p2 = MacKinnon.p(s2, "c", 1)
      assert(p1 >= 0 && p1 <= 1 && p2 >= 0 && p2 <= 1)
      if (s1 < s2) assert(p1 <= p2 + 1e-9)
    }
  }

  test("mackinnon no-constant surface hits the classical DF critical values") {
    // published no-constant Dickey–Fuller critical values: 5% ≈ −1.94,
    // 1% ≈ −2.57 — the surface must return the matching tail probabilities
    assert(math.abs(MacKinnon.p(-1.94, "n", 1) - 0.05) < 0.002,
      s"p(-1.94) = ${MacKinnon.p(-1.94, "n", 1)}")
    assert(math.abs(MacKinnon.p(-2.57, "n", 1) - 0.01) < 0.001,
      s"p(-2.57) = ${MacKinnon.p(-2.57, "n", 1)}")
    // monotone in stat across the star boundary
    val ps = Seq(-3.0, -2.0, -1.2, -1.0, -0.5, 0.0, 1.0).map(MacKinnon.p(_, "n", 1))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-12 }, ps.toString)
    // published upper clamp tau_max_nc = 2.74: above it p is exactly 1.0
    assert(MacKinnon.p(2.75, "n", 1) == 1.0)
    assert(MacKinnon.p(10.0, "n", 1) == 1.0)
    assert(MacKinnon.p(2.70, "n", 1) < 1.0)
  }

  test("kpss p clipped to [0.01, 0.10]") {
    forAll(series) { x =>
      whenever(x.length >= 25 && x.distinct.length > 2) {
        val (_, p, _) = UnitRoots.kpss(x)
        assert(p >= 0.01 - 1e-12 && p <= 0.10 + 1e-12)
      }
    }
  }

  test("kpss nlagsOverride pins the bandwidth without changing the arithmetic") {
    forAll(series) { x =>
      whenever(x.length >= 25 && x.distinct.length > 2) {
        for (reg <- Seq("c", "ct")) {
          val (s0, p0, l0) = UnitRoots.kpss(x, reg)
          val (s1, p1, l1) = UnitRoots.kpss(x, reg, nlagsOverride = Some(l0))
          assert(l1 == l0 && s1 == s0 && p1 == p0,
            s"$reg: override at auto bandwidth $l0 diverged: $s1 vs $s0")
        }
      }
    }
  }

  test("periodogram: power non-negative, detrended sine peaks at its frequency") {
    forAll(Gen.choose(4, 12)) { period =>
      val n = 96
      val x = Array.tabulate(n)(t => math.sin(2 * math.Pi * t / period))
      val (f, _) = Periodogram.dominant(x, detrend = true)
      assert(math.abs(f - 1.0 / period) < 1.0 / n + 1e-9)
      val (_, pw) = Periodogram.periodogram(x)
      assert(pw.forall(_ >= 0))
    }
  }

  test("periodogram: Bluestein FFT path agrees with the direct DFT") {
    val rng = new scala.util.Random(11)
    // prime, odd-composite, power-of-two, and just-past-pow2 lengths —
    // the shapes where a padded FFT would silently change semantics
    for (n <- Seq(16, 37, 100, 257, 1031)) {
      val x = Array.fill(n)(rng.nextGaussian())
      val mean = x.sum / n
      val c = x.map(_ - mean)
      val direct = Periodogram.directPower(c)
      val (re, im) = Periodogram.dftBluestein(c)
      val scale = math.max(direct.max, 1e-12)
      var k = 0
      while (k < direct.length) {
        var p = (re(k) * re(k) + im(k) * im(k)) / n
        if (k != 0 && !(n % 2 == 0 && k == direct.length - 1)) p *= 2.0
        assert(math.abs(p - direct(k)) < 1e-9 * scale,
          s"n=$n k=$k fft=$p direct=${direct(k)}")
        k += 1
      }
    }
  }

  test("periodogram dispatches to FFT above the threshold and stays exact") {
    // 100×-longer-series scenario: above directDftThreshold the public
    // path must route to Bluestein (quick) yet match the quadratic DFT
    val n = Periodogram.directDftThreshold + 37
    val rng = new scala.util.Random(13)
    val period = 50
    val x = Array.tabulate(n)(t =>
      math.sin(2 * math.Pi * t / period) + 0.1 * rng.nextGaussian())
    val t0 = System.nanoTime
    val (f, p) = Periodogram.periodogram(x)
    val elapsedMs = (System.nanoTime - t0) / 1e6
    assert(elapsedMs < 2000, s"FFT path took ${elapsedMs} ms — dispatch broken?")
    var idx = 1
    for (k <- 2 until p.length) if (p(k) > p(idx)) idx = k
    assert(math.abs(f(idx) - 1.0 / period) < 1.0 / n + 1e-9)
    // spot-check a band of bins against the direct DFT arithmetic
    val mean = x.sum / n
    val c = x.map(_ - mean)
    val m = n / 2 + 1
    for (k <- Seq(0, 1, idx, m - 1)) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += c(t) * math.cos(ang); im += c(t) * math.sin(ang); t += 1
      }
      var pd = (re * re + im * im) / n
      if (k != 0 && !(n % 2 == 0 && k == m - 1)) pd *= 2.0
      assert(math.abs(p(k) - pd) < 1e-8 * math.max(p(idx), 1.0),
        s"k=$k fft=${p(k)} direct=$pd")
    }
  }

  test("periodogram at 10-years-of-hourly scale (87,660 points) stays fast and exact") {
    // the r12 verdict's 100×-time-span scenario: the old O(n²) kernel
    // would need ~7.6B trig ops here; Bluestein does 3 FFTs of 2^18
    val n = 87660
    val rng = new scala.util.Random(17)
    val period = 24 * 7 // weekly cycle in hourly data
    val x = Array.tabulate(n)(t =>
      math.sin(2 * math.Pi * t / period) + 0.3 * rng.nextGaussian())
    val t0 = System.nanoTime
    val (f, p) = Periodogram.periodogram(x)
    val elapsedMs = (System.nanoTime - t0) / 1e6
    assert(elapsedMs < 5000, s"FFT path took ${elapsedMs} ms at n=$n")
    var idx = 1
    for (k <- 2 until p.length) if (p(k) > p(idx)) idx = k
    assert(math.abs(f(idx) - 1.0 / period) < 1.0 / n + 1e-9,
      s"dominant ${f(idx)} vs planted ${1.0 / period}")
    // spot-check bins against the direct DFT arithmetic (O(n) per bin)
    val mean = x.sum / n
    val c = x.map(_ - mean)
    val m = n / 2 + 1
    for (k <- Seq(1, idx, 12345, m - 1)) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += c(t) * math.cos(ang); im += c(t) * math.sin(ang); t += 1
      }
      var pd = (re * re + im * im) / n
      if (k != 0 && !(n % 2 == 0 && k == m - 1)) pd *= 2.0
      assert(math.abs(p(k) - pd) < 1e-7 * math.max(p(idx), 1.0),
        s"k=$k fft=${p(k)} direct=$pd")
    }
  }

  test("zscore labels consistent with threshold") {
    forAll(series) { x =>
      whenever(x.distinct.length > 1) {
        val (labels, z) = Outliers.zscore(x)
        labels.zip(z).foreach { case (l, zi) =>
          assert(if (zi > 3) l == -1 else l == 1)
        }
      }
    }
  }

  test("chi2 sf decreasing in x, normal cdf increasing") {
    forAll(Gen.zip(Gen.choose(0.1, 50.0), Gen.choose(0.1, 50.0))) { case (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(Stats.chi2Sf(lo, 10) >= Stats.chi2Sf(hi, 10) - 1e-12)
      assert(Stats.normCdf(-lo) + Stats.normCdf(lo) - 1.0 < 1e-12)
    }
  }
}

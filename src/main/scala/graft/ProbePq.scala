package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Pq, Quantize, Similarity}

/** Scale probe for the PQ ANN tier (round 8, committed so it re-runs per
  * round — results in ARCHITECTURE.md): the ProbeIvf recipe (N perturbed
  * copies of the SF's embeddings, 10 queries, k=10) comparing the full
  * ANN ladder at the same corpus — brute, int8-quantized brute, PQ-ADC
  * over a persisted encode — plus the encode-once cost and PQ recall vs
  * brute on both the easy corpus and the hard overlapping mixture.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ProbePq [m] [ksub] [copies]
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val m = if (args.length > 0) args(0).toInt else 8
    val ksub = if (args.length > 1) args(1).toInt else 256
    val copies = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import ProbeUtil.time

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val n = base.agg(max("vec_id")).head().getLong(0) + 1L
    val big = (0 until copies).map { k =>
      base.select((col("vec_id") + lit(k * n)).as("vec_id"),
        transform(col("embedding"), v => v + lit(k * 1e-3)).as("embedding"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"probe table: ${big.count()} vectors, PQ m=$m ksub=$ksub")
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    queries.count()

    val exact = time("brute (warm after one pass)") {
      Similarity.bruteForceTopK(big, queries, k = 10).count()
      val d = Similarity.bruteForceTopK(big, queries, k = 10).cache(); d.count(); d
    }
    val q8 = Quantize.quantizeEmbeddings(big).cache()
    time("int8 quantize (once)") { q8.count() }
    time("int8 brute (warm)") {
      Quantize.quantizedTopK(q8, queries, 10).count()
      Quantize.quantizedTopK(q8, queries, 10).count()
    }
    q8.unpersist()

    // binary tier: 1-bit signatures (32x smaller scan), Hamming stage-1,
    // exact-cosine re-rank on the candidate set
    val sigs = Quantize.binarySignatures(big).cache()
    time("binary signatures (once, persisted in practice)") { sigs.count() }
    val bin = time("binary hamming+rerank search (cold)") {
      val d = Quantize.binaryTopKPreSigned(sigs, big, queries, k = 10, rerank = 4)
        .cache(); d.count(); d
    }
    time("binary search (warm)") {
      Quantize.binaryTopKPreSigned(sigs, big, queries, k = 10, rerank = 4).count()
    }
    val binRecall = Similarity.withRecallAtK(bin, exact)
      .select("query_id", "recall_at_k").distinct()
      .agg(avg("recall_at_k")).head().getDouble(0)
    println(f"binary recall@10 vs brute (easy corpus): $binRecall%.3f")
    bin.unpersist(); sigs.unpersist()

    val cb = time(s"pq train (3 iters, stride-5 sample)") {
      Pq.trainPqCodebooks(big, dim = 64, m = m, ksub = ksub, iters = 3, sampleMod = 5L)
    }
    val enc = Pq.pqEncode(big, cb).cache()
    time("pq encode (once, persisted in practice)") { enc.count() }
    val approx = time("pq ADC search (cold)") {
      val d = Pq.pqTopK(enc, queries, cb, 10).cache(); d.count(); d
    }
    time("pq ADC search (warm)") { Pq.pqTopK(enc, queries, cb, 10).count() }
    val recall = Similarity.withRecallAtK(approx, exact)
      .select("query_id", "recall_at_k").distinct()
      .agg(avg("recall_at_k")).head().getDouble(0)
    println(f"pq recall@10 vs brute (easy corpus): $recall%.3f")
    approx.unpersist()

    // OPQ at the same corpus: learned rotation + codebooks, ADC search
    // over the rotated encode — recall delta vs plain PQ measures how
    // anisotropic the embedding space actually is
    val (orot, ocb) = time(s"opq train (3 alternations, stride-5 sample)") {
      Pq.trainOpq(big, dim = 64, m = m, ksub = ksub, iters = 3, sampleMod = 5L)
    }
    val oenc = Pq.opqEncode(big, orot, ocb).cache()
    time("opq encode (once, persisted in practice)") { oenc.count() }
    val oapprox = time("opq ADC search (warm)") {
      Pq.opqTopK(oenc, queries, orot, ocb, 10).count()
      val d = Pq.opqTopK(oenc, queries, orot, ocb, 10).cache(); d.count(); d
    }
    val opqRecall = Similarity.withRecallAtK(oapprox, exact)
      .select("query_id", "recall_at_k").distinct()
      .agg(avg("recall_at_k")).head().getDouble(0)
    println(f"opq recall@10 vs brute (easy corpus): $opqRecall%.3f")
    oapprox.unpersist(); oenc.unpersist()

    // composed IVF-PQ at the same corpus: trained coarse quantizer
    // (nlist ∝ √N), trained codebooks, pre-built index frame
    val nlist = math.max(32, math.round(math.sqrt(big.count().toDouble)).toInt)
    val cents = time(s"ivf train nlist=$nlist (for ivf-pq)") {
      Similarity.trainIvfCentroids(big, nlist = nlist, iters = 3, sampleMod = 5L)
    }
    val enc3 = Pq.encodeUdf(cb)
    val index = Similarity.assignCells(big, cents)
      .select(col("vec_id"), col("cell"), enc3(col("emb")).as("codes")).cache()
    time("ivf-pq index build (assign + encode, once)") { index.count() }
    val ipq = time(s"ivf-pq search nprobe=16 (cold)") {
      val d = Pq.searchIvfPq(index, queries, 10, cents, cb, nprobe = 16).cache(); d.count(); d
    }
    time("ivf-pq search (warm)") {
      Pq.searchIvfPq(index, queries, 10, cents, cb, nprobe = 16).count()
    }
    val ipqRecall = Similarity.withRecallAtK(ipq, exact)
      .select("query_id", "recall_at_k").distinct()
      .agg(avg("recall_at_k")).head().getDouble(0)
    println(f"ivf-pq recall@10 vs brute (easy corpus): $ipqRecall%.3f")
    ipq.unpersist(); index.unpersist(); exact.unpersist(); big.unpersist()

    // hard mode: the ProbeIvf overlapping mixture — genuine neighbor
    // ambiguity, where quantization distortion actually costs recall
    println("---- hard mode: 50k x 32-dim overlapping mixture ----")
    val rng = new scala.util.Random(42)
    val dim = 32; val nCenters = 100
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian()))
    import spark.implicits._
    val hard = (0L until 50000L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, c.map(_ + rng.nextGaussian() * 0.8).toSeq)
    }.toDF("vec_id", "embedding").repartition(32).cache()
    hard.count()
    val hq = hard.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    hq.count()
    val hardExact = time("hard brute") {
      val d = Similarity.bruteForceTopK(hard, hq, k = 10).cache(); d.count(); d
    }
    Seq(4, 8).foreach { hm =>
      val hcb = Pq.trainPqCodebooks(hard, dim = 32, m = hm, ksub = ksub,
        iters = 3, sampleMod = 5L)
      val henc = Pq.pqEncode(hard, hcb).cache()
      val t0 = System.nanoTime()
      val happrox = Pq.pqTopK(henc, hq, hcb, 10).cache()
      happrox.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.withRecallAtK(happrox, hardExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      println(f"hard m=$hm%2d ksub=$ksub: recall@10 $r%.3f, encode+search $sec%.2f s")
      happrox.unpersist(); henc.unpersist()
    }
    Seq(4, 16).foreach { rr =>
      val t0 = System.nanoTime()
      val hbin = Quantize.binaryTopK(hard, hq, k = 10, rerank = rr).cache()
      hbin.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.withRecallAtK(hbin, hardExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      println(f"hard binary rerank=$rr%2d: recall@10 $r%.3f, sign+search $sec%.2f s")
      hbin.unpersist()
    }
    // OPQ on the hard mixture at the tightest budget (m=4): the setting
    // where a learned rotation has the most room to help
    Seq(4, 8).foreach { hm =>
      val t0 = System.nanoTime()
      val (hrot, hocb) = Pq.trainOpq(hard, dim = 32, m = hm, ksub = ksub,
        iters = 3, sampleMod = 5L)
      val henc = Pq.opqEncode(hard, hrot, hocb).cache()
      val happrox = Pq.opqTopK(henc, hq, hrot, hocb, 10).cache()
      happrox.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.withRecallAtK(happrox, hardExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      println(f"hard opq m=$hm%2d ksub=$ksub: recall@10 $r%.3f, train+encode+search $sec%.2f s")
      happrox.unpersist(); henc.unpersist()
    }

    // ---- anisotropic mode (round 9 verdict task): the OPQ win regime ----
    // Ge et al. 2013 motivate OPQ by UNBALANCED variance across subspaces
    // plus CROSS-subspace correlation — both of which the isotropic probe
    // corpora above lack, which is why OPQ ≤ PQ on them. This corpus makes
    // the regime explicit: z ~ N(0, I_32) scaled by the geometric spectrum
    // 0.82^j (effective rank ≈ 5), then mixed by a fixed random rotation so
    // the high-variance directions are axis-UNaligned and smear across
    // every raw coordinate block. Plain PQ must quantize correlated
    // subvectors with independent codebooks; OPQ's learned R can undo the
    // mix. Reports recall@10 AND reconstruction MSE (the objective OPQ
    // actually minimizes; OPQ's is measured in rotated space, norm-
    // preserved by R orthonormal).
    println("---- anisotropic mode: 50k x 32-dim spectrum-decayed + mixed ----")
    val adim = 32
    val arng = new scala.util.Random(7)
    val spec = Array.tabulate(adim)(j => math.pow(0.82, j))
    val mix = {
      val a = Array.fill(adim)(Array.fill(adim)(arng.nextGaussian()))
      var i = 0
      while (i < adim) { // Gram–Schmidt: a becomes a genuine rotation
        var j = 0
        while (j < i) {
          val d = (0 until adim).map(t => a(i)(t) * a(j)(t)).sum
          (0 until adim).foreach(t => a(i)(t) -= d * a(j)(t))
          j += 1
        }
        val nrm = math.sqrt((0 until adim).map(t => a(i)(t) * a(i)(t)).sum)
        (0 until adim).foreach(t => a(i)(t) /= nrm)
        i += 1
      }
      a
    }
    val aniso = (0L until 50000L).map { i =>
      val z = Array.fill(adim)(arng.nextGaussian())
      (i, Array.tabulate(adim)(r =>
        (0 until adim).map(c => mix(r)(c) * spec(c) * z(c)).sum).toSeq)
    }.toDF("vec_id", "embedding").repartition(32).cache()
    aniso.count()
    val aq = aniso.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    aq.count()
    val aExact = time("aniso brute") {
      val d = Similarity.bruteForceTopK(aniso, aq, k = 10).cache(); d.count(); d
    }
    def mseOf(encoded: org.apache.spark.sql.DataFrame, cb: Array[Array[Array[Double]]],
        rotated: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
      val frozen = cb.map(_.map(_.clone()))
      val dsub = frozen(0)(0).length
      val err = udf { (emb: Seq[Double], codes: Seq[Int]) =>
        var s = 0.0; var j = 0
        while (j < codes.length) {
          val cent = frozen(j)(codes(j)); var d = 0
          while (d < dsub) {
            val diff = emb(j * dsub + d) - cent(d); s += diff * diff; d += 1
          }
          j += 1
        }
        s
      }
      aniso.select(col("vec_id"), rotated(col("embedding")).as("emb"))
        .join(encoded, "vec_id")
        .agg(avg(err(col("emb"), col("codes")))).head().getDouble(0)
    }
    Seq(4, 8).foreach { am =>
      val acb = Pq.trainPqCodebooks(aniso, dim = adim, m = am, ksub = ksub,
        iters = 3, sampleMod = 5L)
      val aenc = Pq.pqEncode(aniso, acb).cache()
      val aapprox = Pq.pqTopK(aenc, aq, acb, 10).cache(); aapprox.count()
      val r = Similarity.withRecallAtK(aapprox, aExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      val e = mseOf(aenc, acb, identity)
      println(f"aniso pq  m=$am%2d ksub=$ksub: recall@10 $r%.3f, reconstruction MSE $e%.4f")
      aapprox.unpersist(); aenc.unpersist()

      val (arot, aocb) = Pq.trainOpq(aniso, dim = adim, m = am, ksub = ksub,
        iters = 3, sampleMod = 5L)
      val aoenc = Pq.opqEncode(aniso, arot, aocb).cache()
      val aoapprox = Pq.opqTopK(aoenc, aq, arot, aocb, 10).cache(); aoapprox.count()
      val or = Similarity.withRecallAtK(aoapprox, aExact)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
      val oe = mseOf(aoenc, aocb, c => Pq.rotateUdf(arot)(c))
      println(f"aniso opq m=$am%2d ksub=$ksub: recall@10 $or%.3f, reconstruction MSE $oe%.4f")
      aoapprox.unpersist(); aoenc.unpersist()
    }

    // ---- round-11: codebook staleness under distribution shift ------------
    // The IVF add-batch protocol (ProbeIvf round 10) applied to the PQ/OPQ
    // codebooks: train on centers 0-79 of the hard mixture, grow the
    // corpus with centers 80-99 encoded by the STALE codebooks
    // (Pq.pqEncode with the old codebook array IS the add-batch API —
    // codes are per-vector, so appends compose trivially), then compare
    // new-distribution recall against a full retrain+re-encode. Three
    // honest numbers per tier: encode-batch seconds vs retrain+re-encode
    // seconds, and the recall the staleness costs. Corpus = hard mixture
    // ×10 (500k rows) so the cost crossover shows at the scale the
    // composes-API exists for.
    println("---- staleness: stale codebooks vs retrain under shift (500k rows) ----")
    val bigHard = (0 until 10).map { c =>
      hard.select((col("vec_id") + lit(c * 50000L)).as("vec_id"),
        transform(col("embedding"), v => v + lit(c * 1e-3)).as("embedding"))
    }.reduce(_ union _).repartition(32).cache()
    println(s"staleness corpus: ${bigHard.count()} vectors")
    val oldCorp = bigHard.filter(col("vec_id") % 100 < 80).cache(); oldCorp.count()
    val newCorp = bigHard.filter(col("vec_id") % 100 >= 80).cache(); newCorp.count()
    val sm = 8 // dim 32, m=8: the tight-budget regime where drift bites
    val oldCb = time("pq train on old distribution (400k rows)") {
      Pq.trainPqCodebooks(oldCorp, dim = 32, m = sm, ksub = ksub, iters = 3, sampleMod = 37L)
    }
    val oldEnc = Pq.pqEncode(oldCorp, oldCb).cache()
    time("pq encode old corpus (once)") { oldEnc.count() }
    val newEnc = Pq.pqEncode(newCorp, oldCb).cache()
    time("pq encode NEW batch with STALE codebooks (~100k rows)") { newEnc.count() }
    val grownEnc = oldEnc.unionByName(newEnc)
    val freshCb = time("pq retrain on full corpus (500k rows)") {
      Pq.trainPqCodebooks(bigHard, dim = 32, m = sm, ksub = ksub, iters = 3, sampleMod = 37L)
    }
    val freshEnc = Pq.pqEncode(bigHard, freshCb).cache()
    time("pq re-encode full corpus (the rebuild cost)") { freshEnc.count() }
    // grownEnc's union plan keeps both cached legs alive for the drift
    // note below; cost numbers above are the deliverable at this size
    println(f"(500k cost summary: stale-encode a 100k batch vs retrain+re-encode" +
      " the 500k corpus — see timings above)")
    oldEnc.unpersist(); newEnc.unpersist(); freshEnc.unpersist()
    val _ = grownEnc // cost-side only; recall measured on fresh draws below

    // RECALL drift is measured on the 50k FRESH-DRAW mixture, not the
    // ×10-copy corpus: on copy-constructed corpora every query's top-10
    // is its own ten near-identical copies, which even badly-stale codes
    // rank first — the deceptive 1.000/1.000 reading ProbeIvf's round-10
    // section called out for IVF, and it is STRONGER for PQ because ADC
    // scans every code (no cell routing to get wrong). The hard mixture's
    // ~500 fresh draws per center give genuine neighbor ambiguity
    // (full-train PQ m=8 reads ~0.5 recall there), so staleness has
    // room to show.
    println("---- staleness recall on the 50k fresh-draw mixture ----")
    val oldH = hard.filter(col("vec_id") % 100 < 80).cache(); oldH.count()
    val newH = hard.filter(col("vec_id") % 100 >= 80).cache(); newH.count()
    val hOldCb = Pq.trainPqCodebooks(oldH, dim = 32, m = sm, ksub = ksub,
      iters = 3, sampleMod = 5L)
    val hGrown = Pq.pqEncode(oldH, hOldCb)
      .unionByName(Pq.pqEncode(newH, hOldCb)).cache(); hGrown.count()
    val hFreshCb = Pq.trainPqCodebooks(hard, dim = 32, m = sm, ksub = ksub,
      iters = 3, sampleMod = 5L)
    val hFresh = Pq.pqEncode(hard, hFreshCb).cache(); hFresh.count()
    val nq = hard.filter(col("vec_id") >= 80 && col("vec_id") < 90)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_emb")).cache()
    nq.count()
    val shiftBrute = Similarity.bruteForceTopK(hard, nq, 10).cache(); shiftBrute.count()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.withRecallAtK(approx, shiftBrute)
        .select("query_id", "recall_at_k").distinct()
        .agg(avg("recall_at_k")).head().getDouble(0)
    val staleR = recallOf(Pq.pqTopK(hGrown, nq, hOldCb, 10))
    val freshR = recallOf(Pq.pqTopK(hFresh, nq, hFreshCb, 10))
    println(f"pq  new-distribution recall@10: stale codebooks $staleR%.3f vs retrained $freshR%.3f")
    hGrown.unpersist(); hFresh.unpersist()

    // OPQ: the rotation is global state with the same staleness exposure
    val (hOldRot, hOldOcb) = Pq.trainOpq(oldH, dim = 32, m = sm, ksub = ksub,
      iters = 3, sampleMod = 5L)
    val oGrown = Pq.opqEncode(oldH, hOldRot, hOldOcb)
      .unionByName(Pq.opqEncode(newH, hOldRot, hOldOcb)).cache(); oGrown.count()
    val (hFreshRot, hFreshOcb) = Pq.trainOpq(hard, dim = 32, m = sm, ksub = ksub,
      iters = 3, sampleMod = 5L)
    val oFresh = Pq.opqEncode(hard, hFreshRot, hFreshOcb).cache(); oFresh.count()
    val oStaleR = recallOf(Pq.opqTopK(oGrown, nq, hOldRot, hOldOcb, 10))
    val oFreshR = recallOf(Pq.opqTopK(oFresh, nq, hFreshRot, hFreshOcb, 10))
    println(f"opq new-distribution recall@10: stale rot+codebooks $oStaleR%.3f vs retrained $oFreshR%.3f")
    spark.stop()
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling + weighted corpus mixing — the selection ops of
  * a training-data pipeline (hold-out splits, per-language rebalancing,
  * multi-corpus mixture weights).
  *
  * Everything here is DETERMINISTIC in the row's id, never `rand()`:
  * task retries and speculative execution see the same decision, the
  * sample is reproducible across runs/clusters, and membership can be
  * recomputed downstream (e.g. to join a sampled table back to its
  * complement). The selector is a Knuth multiplicative hash over the id,
  * chosen over xxhash64 because its arithmetic is plain BIGINT mod/mul —
  * replayable in ANSI SQL by any engine, which is what lets the driver
  * hash-verify these operators end-to-end (see q_sample_* in SparkEntry).
  */
object Sampling {

  /** 2^32-ranged multiplicative hash of a long id: pmod(id, 2^31) spreads
    * through the odd Knuth constant 2654435761. Max intermediate is
    * (2^31-1)·2654435761 < 2^63 — no ANSI overflow. Low bits of
    * sequential ids decorrelate (the constant is odd and ≈ 2^32/φ). */
  def bucketHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Fail-loud id validation (ANSI mode would otherwise throw mid-job on
    * a non-numeric id): string ids must be mapped to a surrogate long
    * first — xxhash64 keeps the sampler deterministic, at the cost of the
    * SQL-replayable oracle property. */
  private def requireNumericId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.NumericType
    val f = df.schema.find(_.name == idCol).getOrElse(
      throw new IllegalArgumentException(s"id column '$idCol' not found"))
    require(f.dataType.isInstanceOf[NumericType],
      s"id column '$idCol' must be numeric (found ${f.dataType.simpleString}); " +
        "map string ids to a surrogate long (e.g. xxhash64) first")
  }

  private def threshold(frac: Double): Long = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    math.floor(frac * 4294967296.0).toLong
  }

  /** Keep a deterministic `frac` of rows by id hash. frac=0 keeps none,
    * frac=1 keeps all; nested samples are monotone (frac a ⊆ frac b for
    * a <= b) because membership is a threshold on one hash value. */
  def deterministicSample(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    requireNumericId(df, idCol)
    df.filter(bucketHash(col(idCol)) < lit(threshold(frac)))
  }

  /** Deterministic weighted keep — "sample each row with probability equal
    * to its weight", replayably: row kept iff
    * bucketHash(id) < floor(w·2^32), so a weight of 0 never keeps, 1
    * always keeps, and the SAME id survives or not identically on every
    * run/retry/engine (the FineWeb-style soft quality filter, with the
    * rand() replaced by the id hash like every selector here). Weights
    * outside [0,1] fail loudly per row (ANSI-mode when/raise) rather
    * than silently clamping. Map-side filter, no shuffle.
    *
    * The predicate references the weight 4 times, and Catalyst's
    * filter-through-project substitution inlines an EXPRESSION-backed
    * weight once per reference — a 4× recompute of however expensive
    * the scoring expression is (measured 2.6 s vs 0.4 s for a regex
    * quality score over 5k docs). Feed a MATERIALIZED weight column: a
    * stored score, or `Ckpt.pin` the scored frame first — which is the
    * production shape anyway (score once, sample many times). */
  def weightedKeep(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    requireNumericId(df, idCol)
    val w = col(weightCol).cast("double")
    df.filter(when(w >= 0.0 && w <= 1.0,
        bucketHash(col(idCol)) < floor(w * lit(4294967296.0)).cast("long"))
      .otherwise(raise_error(concat(lit(s"weight out of [0,1] in '$weightCol': "),
        // coalesce: concat null-propagates, and a NULL weight must still
        // produce a readable error, not raise_error(NULL)
        coalesce(w.cast("string"), lit("NULL"))))))
  }

  /** Deterministic epoch-keyed training-order shuffle rank: the id is
    * folded with the epoch through an affine step mod 2^31 (prime
    * multiplier so consecutive epochs decorrelate; every intermediate
    * < 2^52) and then fully mixed by [[Sketches.mixHash]]. Same rank on
    * every run/retry/cluster for a given (id, epoch); different epochs
    * are different permutations. Plain BIGINT arithmetic — SQL-replayable
    * like every selector here.
    *
    * Aliasing note (matches the [[Sketches.bucketHash]] convention): the
    * id is folded through mod 2^31 first, so two ids congruent mod 2^31
    * receive the SAME rank in EVERY epoch and their relative order is
    * then fixed by the id tiebreak across all epochs. For id spaces above
    * 2^31 the per-epoch permutations of such alias pairs are therefore
    * correlated; all driver/test id spaces are far below 2^31. */
  def epochShuffleRank(id: Column, epoch: Int): Column = {
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    Sketches.mixHash(pmod(
      pmod(id, lit(2147483648L)) * lit(1000003L) + lit(epoch.toLong),
      lit(2147483648L)))
  }

  /** Global deterministic shuffle for dataloader export: orders the
    * corpus by the epoch-keyed hash rank (id tiebreak — the 32-bit rank
    * collides eventually), the standard "shuffle once per epoch at corpus
    * scale" pattern. The sort is a RANGE exchange (Spark samples rank
    * boundaries), so at 100 TB this is one repartition-by-range + local
    * sort — no single-point ordering. Writing the result partition-wise
    * preserves the global order for a sequential reader. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    requireNumericId(df, idCol)
    df.withColumn("shuffle_rank", epochShuffleRank(col(idCol), epoch))
      .orderBy(col("shuffle_rank"), col(idCol))
  }

  /** Efraimidis–Spirakis (IPL 2006) weighted-sampling key: the row draws
    * u from the replayable epoch-keyed mixed hash (u = (rank + 0.5)/2^32
    * ∈ (0,1)) and is ranked by ln(u)/w — taking the k LARGEST keys
    * samples k rows without replacement with probability proportional to
    * weight (the A-ES order; ln(u)/w is the monotone log form of the
    * paper's u^(1/w), safe against double underflow at large w).
    * Weights must be strictly positive, non-null, non-NaN — anything
    * else raises per row (a zero-weight row silently never sampled would
    * hide an upstream scoring bug; NaN needs its own guard because Spark
    * orders NaN above every number, so an unguarded NaN key would hijack
    * the top-k). Deterministic in (id, weight, epoch): retries,
    * speculative tasks and re-runs select the identical subset, and the
    * plain-BIGINT + ln arithmetic replays in ANSI SQL (the driver
    * hash-verifies it end-to-end in q_weighted_sample_docs). */
  def esKey(id: Column, weight: Column, epoch: Int = 0): Column = {
    val u = (epochShuffleRank(id, epoch).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val w = weight.cast("double")
    when(!isnan(w) && w > 0.0, log(u) / w)
      .otherwise(raise_error(concat(lit("es key weight must be finite > 0: "),
        coalesce(w.cast("string"), lit("NULL")))))
  }

  /** Exact-k weighted sample without replacement: the k rows with the
    * largest [[esKey]], id-tiebroken. Spark plans the sorted limit as
    * TakeOrderedAndProject — per-partition partial top-k, one k-row
    * reduce, no global sort — so this exact code is the 100 TB shape.
    * Returns the input columns plus `es_key`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      epoch: Int = 0): DataFrame = {
    requireNumericId(df, idCol)
    require(k >= 1, s"k must be >= 1, got $k")
    df.withColumn("es_key", esKey(col(idCol), col(weightCol), epoch))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Merge two (id, weight, es_key) samples into the exact-k sample of
    * their union — the ES top-k obeys the same merge law as the Broder
    * bottom-k ([[Sketches.mergeBottomK]]): any row in top-k(A ∪ B) keys
    * at or above the union's k-th key, hence at or above its own side's
    * k-th key, so it already sits in that side's top-k. An id on BOTH
    * sides must carry the same weight (keys are deterministic, so the
    * rows are then bit-identical and distinct() collapses them); the
    * streaming store feeds disjoint micro-batches, which satisfies this
    * trivially. */
  def mergeWeightedSample(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    a.select("id", "weight", "es_key")
      .unionByName(b.select("id", "weight", "es_key"))
      .distinct()
      .orderBy(col("es_key").desc, col("id"))
      .limit(k)
  }

  /** Per-group sampling fractions (e.g. language rebalancing): groups
    * absent from `fracs` fall back to `defaultFrac`. The frac lookup is a
    * model-sized table broadcast against the corpus — the data-sized pass
    * stays a map-side filter with no shuffle regardless of group skew. */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      fracs: Map[String, Double], defaultFrac: Double = 0.0): DataFrame = {
    requireNumericId(df, idCol)
    val spark = df.sparkSession
    import spark.implicits._
    fracs.values.foreach(threshold(_)) // validate early
    val lut = fracs.toSeq.map { case (g, f) => (g, threshold(f)) }
      .toDF(groupCol, "__thr")
    df.join(broadcast(lut), Seq(groupCol), "left")
      .withColumn("__thr", coalesce(col("__thr"), lit(threshold(defaultFrac))))
      .filter(bucketHash(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Exactly `k` rows per group (all rows if the group is smaller) —
    * deterministic: rank by (id hash, id) inside each group, keep the
    * first k. The hash order makes the selection a uniform sample rather
    * than a head; the id tiebreak makes it total. One window sort
    * partitioned by group — parallelism is the group count, like every
    * other per-group operator here; for a single enormous group prefer
    * `deterministicSample` with frac ≈ k/n (no global sort). */
  def takePerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    requireNumericId(df, idCol)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucketHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Leakage-free train/val/test split at near-dup-CLUSTER granularity:
    * every doc in the same connected component of `pairs` (a near-dup
    * edge list, e.g. from minhashNearDuplicates) receives the SAME
    * split, so an eval split can never contain a near-copy of a training
    * doc — the standard contamination failure of doc-level random
    * splits. Docs in no cluster split by their own id.
    *
    * Assignment is the replayable [[bucketHash]] of the cluster label
    * (component representative, or own id) against cumulative weight
    * thresholds in the caller's `weights` order — deterministic across
    * runs/partitionings, and SQL-replayable end-to-end
    * (q_split_clusters_docs). Weights must be nonnegative and sum to 1.
    * Cost: the components pass (graph-sized) plus one broadcast-free
    * map-side CASE over the corpus. */
  def splitByCluster(
      docs: DataFrame,
      pairs: DataFrame,
      weights: Seq[(String, Double)],
      idCol: String = "doc_id"): DataFrame = {
    requireNumericId(docs, idCol)
    val cuts = splitThresholds(weights)
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("component"))
    val labeled = docs.join(comps, Seq(idCol), "left")
      .withColumn("__label", coalesce(col("component"), col(idCol).cast("long")))
    val h = bucketHash(col("__label"))
    val splitCol = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, hi), elseCol) => when(h < lit(hi), name).otherwise(elseCol)
    }
    labeled.withColumn("split", splitCol).drop("__label", "component")
  }

  /** Cumulative hash-space thresholds for [[splitByCluster]], exposed so
    * the oracle SQL interpolates the IDENTICAL floor arithmetic instead
    * of re-deriving it from floating-point cumulative sums. */
  private[graft] def splitThresholds(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      s"weights must be nonnegative: $weights")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    require(weights.map(_._1).distinct.length == weights.length,
      s"duplicate split names: $weights")
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    weights.map(_._1).zip(cum.map(c => math.floor(c * 4294967296.0).toLong))
  }

  /** Temperature-scaled domain mixture weights (the public multi-source
    * sampling recipe: LLaMA-style "sampled proportionally with
    * temperature" / the DoReMi paper's baseline mixture): per domain d
    * with token count c_d, the sampling weight is c_d^τ / Σ c^τ. τ = 1
    * reproduces natural proportions, τ → 0 flattens toward uniform —
    * the standard knob for keeping small high-quality domains from
    * drowning under web-scale ones. Also emits `sampling_rate` — the
    * per-domain acceptance probability that hits `targetTokens` total
    * at the mixture weights, clipped to 1 (a domain too small to fill
    * its share is taken whole; the standard single-epoch clip).
    *
    * Scale shape: ONE partial aggregate over the corpus keyed by domain
    * (map-side combine ⇒ the shuffle carries one row per domain per
    * partition), then window-free arithmetic on the model-sized domain
    * table. Exactness: τ = 0.5 and τ = 1 use sqrt/identity — IEEE-exact
    * in every engine, hence oracle-replayable; other τ go through
    * libm `pow`, documented as 1-ulp engine-dependent. */
  def domainMixtureWeights(
      df: DataFrame,
      domainCol: String,
      tokensCol: Column,
      temperature: Double = 1.0,
      targetTokens: Option[Long] = None): DataFrame = {
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    val perDomain = df
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).cast("long").as("n_tokens"))
    def tempered(c: Column): Column = temperature match {
      case 1.0 => c.cast("double")
      case 0.5 => sqrt(c.cast("double"))
      case t   => pow(c.cast("double"), lit(t))
    }
    val withT = perDomain.withColumn("__t", tempered(col("n_tokens")))
    // Σ c^τ via a model-sized single-row aggregate, broadcast back — the
    // domain table is tiny by construction, but avoid a global window out
    // of principle (windows without PARTITION BY trip the plan lint)
    val total = withT.agg(sum("__t").as("__tot"), sum("n_tokens").as("__tok_tot"))
    val out = withT.crossJoin(broadcast(total))
      .withColumn("weight", col("__t") / col("__tot"))
    val withRate = targetTokens match {
      case Some(t) =>
        require(t > 0, s"targetTokens must be positive, got $t")
        out.withColumn("sampling_rate",
          least(lit(1.0), lit(t.toDouble) * col("weight") / col("n_tokens")))
      case None => out
    }
    withRate.drop("__t", "__tot", "__tok_tot")
  }

  /** Weighted mixture of corpora: deterministically sample each source at
    * its weight and union, tagging rows with `mixSourceCol`. Schemas must
    * be union-compatible by name (columns are aligned, not positional).
    * The union is a no-shuffle concatenation of the per-source map-side
    * filters — mixture cost is one scan per source, nothing else. */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], idCol: String,
      mixSourceCol: String = "mix_source"): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    val tags = sources.map(_._1)
    require(tags.distinct.length == tags.length, s"duplicate source tags: $tags")
    sources.map { case (tag, df, w) =>
      deterministicSample(df, idCol, w).withColumn(mixSourceCol, lit(tag))
    }.reduce(_.unionByName(_))
  }

  /** Distributed global ordinal — `row_number() OVER (ORDER BY score,
    * id)` semantics WITHOUT the single-partition window (the global
    * WindowExec that moves the whole corpus into one task — the first
    * plan shape the lint forbids). This is curriculum ordering: rank the
    * corpus by a difficulty/quality score and train in ordinal order.
    *
    * Two-phase TeraSort-style ranking:
    *   1. each row maps to one of `nBuckets` ORDER-CONSISTENT coarse
    *      buckets (affine in score between the corpus min/max — a 1-row
    *      broadcast; equal scores always share a bucket, so bucket
    *      boundaries can never split a tie);
    *   2. per-bucket counts roll into exclusive cumulative offsets (a
    *      window over the nBuckets-row count table — model-sized), and
    *      the final ordinal is offset + row_number within the bucket
    *      (partitioned window, parallel across buckets).
    *
    * The bucket function's float arithmetic never needs cross-engine
    * agreement: ANY order-consistent bucketing yields the same ordinal,
    * so the oracle checks the SEMANTICS (a plain global row_number)
    * rather than replaying the mechanism — a stronger verification than
    * a replay twin.
    *
    * Contracts: `idCol` must be unique (it is the tiebreak); null scores
    * are dropped (no position in the order); a corpus whose scores are
    * ALL equal degenerates to one bucket — pick a higher-resolution
    * score if that is a real risk. Skew bound: a bucket holds at most
    * the rows of `1/nBuckets`-th of the score RANGE; heavy ties
    * concentrate — the id tiebreak inside row_number keeps the within-
    * bucket sort deterministic regardless. */
  def globalOrdinal(df: DataFrame, scoreCol: String, idCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(scoreCol).isNotNull)
      .withColumn("__s", col(scoreCol).cast("double"))
    val bounds = base.agg(min("__s").as("__mn"), max("__s").as("__mx"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("__bucket",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            greatest(floor((col("__s") - col("__mn"))
              / (col("__mx") - col("__mn")) * lit(nBuckets)).cast("long"), lit(0L)),
            lit(nBuckets - 1L))))
      .drop("__mn", "__mx")
    val offsets = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__off"))
    bucketed.join(broadcast(offsets), "__bucket")
      .withColumn("ordinal", col("__off") + row_number().over(
        Window.partitionBy("__bucket").orderBy(col("__s"), col(idCol))))
      .drop("__s", "__bucket", "__off")
  }

  /** EXACT corpus quantiles at scale, composed from [[globalOrdinal]]:
    * quantile `q` = the value whose global (score, id)-rank is
    * max(1, ⌈q·N⌉) — the lower empirical quantile (type-1 /
    * `quantile_disc`), so the answer is always an actual data value and
    * the rank arithmetic is integer-exact on both engines. This is what
    * the HDR/KMV sketches trade away; when a pipeline gate needs the
    * REAL p99 (token-length caps, outlier fences), this is the
    * distributed shape that produces it: the ordinal pass plus one
    * broadcast join against the |qs|-row rank table. Output (q, value),
    * one row per requested quantile. */
  def exactQuantiles(df: DataFrame, scoreCol: String, qs: Seq[Double],
      idCol: String, nBuckets: Int = 1024): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall(q => q > 0 && q <= 1), s"quantiles must be in (0,1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val ord = globalOrdinal(df, scoreCol, idCol, nBuckets)
      .select(col("ordinal"), col(scoreCol).cast("double").as("value"))
    val n = df.filter(col(scoreCol).isNotNull).agg(count(lit(1)).as("n"))
    val ranks = qs.toDF("q").crossJoin(broadcast(n))
      .select(col("q"), greatest(lit(1L), ceil(col("q") * col("n"))).as("ordinal"))
    ord.join(broadcast(ranks), "ordinal")
      .select(col("q"), col("value"))
      .orderBy("q")
  }
}

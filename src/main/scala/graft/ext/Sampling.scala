package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling and dataset splitting.
  *
  * Training-data pipelines need samples and train/val/test splits that
  * are (a) reproducible across runs and cluster layouts — `rand()` is
  * neither — and (b) keyed on CONTENT, so the same document lands in the
  * same split even after re-crawls or repartitioning. Both are built on
  * the md5 hex prefix of the key column: uniformly distributed, engine-
  * independent, and comparable as a plain string, so thresholds are
  * lexicographic hex bounds (each leading hex pair = 1/256 of mass).
  * Pure codegen column algebra; at scale this is a free filter pushed
  * into the scan projection.
  */
object Sampling {

  /** md5-hex of the key column — the sampling/splitting coordinate. */
  def contentKey(key: Column): Column = md5(key.cast("string"))

  /** Keep rows whose content key is below `hexUpperBound` (e.g. "0d" ≈
    * 13/256 ≈ 5.1% of rows). Stable under any repartitioning.
    */
  def contentSample(df: DataFrame, keyCol: String, hexUpperBound: String): DataFrame =
    df.where(contentKey(col(keyCol)) < lit(hexUpperBound.toLowerCase))

  /** Assign a deterministic split label from hex bounds: key < testBound
    * → "test", < valBound → "val", else "train". Bounds are two-char hex
    * prefixes; e.g. ("0d", "1a") ≈ 5% test, 5% val, 90% train.
    */
  def contentSplit(
      df: DataFrame,
      keyCol: String,
      testBound: String = "0d",
      valBound: String = "1a",
      labelCol: String = "split"): DataFrame = {
    val k = contentKey(col(keyCol))
    df.withColumn(labelCol,
      when(k < lit(testBound.toLowerCase), "test")
        .when(k < lit(valBound.toLowerCase), "val")
        .otherwise("train"))
  }

  /** Leakage-free train/val/test split: the split key is the
    * document's DUP-CLUSTER label, not its own content — every member
    * of a near-duplicate cluster lands in the SAME split, so a
    * training document's paraphrase can never leak into the test set
    * (the classic eval-contamination mode [[contentSplit]] alone
    * cannot prevent: two near-dups have different content keys and
    * split independently).
    *
    * `components` is any (id, component) cluster labeling —
    * [[Dedup.connectedComponents]] over exact-Jaccard pairs (the
    * oracle-able path), [[Dedup.minhashDedup]] (the scale path), or
    * SemDeDup cells. Unlabeled documents (absent from `components`)
    * are kept and split by their own id — an inner join would
    * silently drop them.
    *
    * Shape at scale: one join on the id (both sides hash-partitioned;
    * the labeling is (id, component) longs, never text) + the same
    * codegen hex-bound projection as [[contentSplit]]. Deterministic
    * on any partitioning and stable across re-crawls as long as
    * cluster representatives are (component = min id, the house
    * labeling).
    */
  def clusterSplit(
      df: DataFrame,
      idCol: String,
      components: DataFrame,
      testBound: String = "0d",
      valBound: String = "1a",
      labelCol: String = "split"): DataFrame = {
    // collision-safe internal alias: callers legitimately carry their
    // own `component` column (the labeling shape this composes with),
    // and a bare name would be AMBIGUOUS_REFERENCE after the join
    val k = contentKey(coalesce(col("__cs_component"), col(idCol)))
    df.join(
        components.select(col("id").as(idCol),
          col("component").as("__cs_component")),
        Seq(idCol), "left")
      .withColumn(labelCol,
        when(k < lit(testBound.toLowerCase), "test")
          .when(k < lit(valBound.toLowerCase), "val")
          .otherwise("train"))
      .drop("__cs_component")
  }

  /** Deterministic k-per-group sample: for each value of `groupCol`,
    * keep the `k` rows ranking lowest by md5(keyCol) (ties by key) —
    * the balanced-sampling primitive (k docs per language / domain /
    * source) that `rand()`-based `sampleBy` can't reproduce across
    * runs or partitionings. The md5 coordinate makes the choice
    * pseudo-random but engine-independent, so an external system (or
    * the DuckDB oracle) selects the identical rows.
    *
    * Shape at scale: one shuffle on `groupCol` + a rank window; rows
    * beyond rank k are dropped at the window, so only k·|groups| rows
    * survive the stage.
    */
  def sampleByGroup(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(contentKey(col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic stratified train/val/test split with EXACT per-
    * stratum counts: within each stratum, rows ordered by the md5
    * content coordinate take the first ⌈testFrac·n⌉ slots as `test`,
    * the next ⌈valFrac·n⌉ as `val`, the rest as `train`. Where the
    * hex-bound split (`contentSplit`, q38) is proportional only in
    * expectation — fine at 10^9 docs, audit-failing at stratum sizes
    * of 50 — this one is exact at ANY stratum size, and still
    * engine-independent and partition-invariant (the oracle reproduces
    * the identical assignment). Eval contamination policy stays with
    * the caller: split AFTER dedup/decontamination, or near-dups of a
    * test doc land in train.
    *
    * Shape at scale: one window sort per stratum. Strata here are
    * bounded-cardinality labels (language, source) with large
    * partitions, so the sort is the range-partition class the q141/
    * q177 rows carry; at 100 TB per-stratum, use `contentSplit`'s
    * hex bounds for the bulk and reserve this exact form for the
    * strata small enough that expectation isn't exactness.
    */
  def stratifiedSplit(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      testFrac: Double,
      valFrac: Double): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac < 1,
      s"fractions must be >= 0 and sum below 1, got ($testFrac, $valFrac)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(contentKey(col(keyCol)), col(keyCol))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("__rk") <= ceil(lit(testFrac) * col("__n")), "test")
          .when(col("__rk") <=
            ceil(lit(testFrac) * col("__n")) + ceil(lit(valFrac) * col("__n")),
            "val")
          .otherwise("train"))
      .drop("__rk", "__n")
  }

  /** The hybrid [[stratifiedSplit]]'s scaladoc prescribes, as one
    * operator with one output contract: strata at or below
    * `exactThreshold` rows take the EXACT window form (audit-grade
    * ceil-fraction counts — the regime where expectation isn't
    * exactness), strata above it take the per-row 48-bit hex-bound
    * form (`floor(frac·2⁴⁸)` on the md5 coordinate — [[contentSplit]]
    * at 12-hex granularity, proportional to ~4e-15 in expectation and
    * exact enough at any bulk size). Adds `split` plus `regime`
    * ("exact" | "bulk") so the caller — and the oracle — can see which
    * path labeled each row.
    *
    * Shape at scale: one count aggregate over the stratum column
    * (broadcast back — strata are bounded-cardinality labels), a
    * codegen projection for the bulk (NO sort, no matter how dominant
    * the largest language is — the single-task-per-stratum failure of
    * the exact form at 100 TB cannot occur), and a window sort only
    * over the small-strata subset, whose volume is bounded by
    * `exactThreshold × |small strata|`. The two regime branches each
    * re-scan the source (the count join is not pushable into the
    * scan) — DELIBERATELY unpinned: a localCheckpoint here would
    * materialize the whole corpus to buy back one scan, the wrong
    * trade at any scale where this operator matters; callers who
    * already hold a materialized input simply pass it.
    */
  def autoSplit(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      testFrac: Double,
      valFrac: Double,
      exactThreshold: Long = 100000L): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac < 1,
      s"fractions must be >= 0 and sum below 1, got ($testFrac, $valFrac)")
    require(exactThreshold >= 0, s"exactThreshold must be >= 0")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__sn"))
    val tagged = df.join(broadcast(counts), Seq(strataCol))
    val exact = stratifiedSplit(
        tagged.where(col("__sn") <= exactThreshold).drop("__sn"),
        strataCol, keyCol, testFrac, valFrac)
      .withColumn("regime", lit("exact"))
    // floor(frac·2^48) rendered as a 12-hex bound — the q146 convention;
    // the oracle computes the identical double product and floor
    val tB = f"${math.floor(testFrac * 281474976710656L.toDouble).toLong}%012x"
    val vB = f"${math.floor((testFrac + valFrac) * 281474976710656L.toDouble).toLong}%012x"
    val k12 = substring(contentKey(col(keyCol)), 1, 12)
    val bulk = tagged.where(col("__sn") > exactThreshold).drop("__sn")
      .withColumn("split",
        when(k12 < lit(tB), "test")
          .when(k12 < lit(vB), "val")
          .otherwise("train"))
      .withColumn("regime", lit("bulk"))
    exact.unionByName(bulk)
  }

  /** Deterministic weighted sampling WITHOUT replacement (the
    * Efraimidis–Spirakis exponential-keys construction): each row gets
    * `key = -ln(u) / w` with `u ∈ (0,1)` drawn from the md5 coordinate
    * of `keyCol` + `salt` (first 12 hex chars → 48-bit uniform, offset
    * by 0.5 so u is never 0), and the sample is the `k` SMALLEST keys.
    * This reproduces the classical WSWOR inclusion law — a weight-10
    * row is 10× the draw priority of a weight-1 row at every step —
    * while staying engine-independent and partition-invariant: the
    * DuckDB oracle computes the identical keys and selects the
    * identical rows (the q37 md5-coordinate convention, extended to
    * weights).
    *
    * `weight` must be strictly positive for every row (wrap in
    * `greatest(w, 1)` for count-like weights); a zero weight divides
    * to +inf (never sampled) and a negative one inverts the law, so
    * both are the caller's bug, not a silent reweighting.
    *
    * Shape at scale: the key is one scalar in the scan projection and
    * selection is `orderBy(key).limit(k)` — Spark plans
    * TakeOrderedAndProject (per-partition top-k heaps + one k-row
    * merge on the driver), NOT a global sort materialization.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weight: Column,
      k: Int,
      salt: String = "ws"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 12),
      16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / lit(math.pow(16.0, 12.0))
    df.withColumn("__wskey", -log(u) / weight.cast("double"))
      .orderBy(col("__wskey"))
      .limit(k)
      .drop("__wskey")
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random
    * permutation of the corpus — each training epoch passes a new
    * `epoch` label and gets an independent-looking order, while the
    * same label always reproduces the same permutation (restart-safe,
    * engine-independent: the key is md5 of the row key + label, so an
    * external system can re-derive the exact order — oracle-checked).
    * Ties are impossible for distinct keys; the trailing key column in
    * the sort makes even pathological collisions deterministic.
    *
    * Shape at scale: ONE range-partitioned sort on the md5 coordinate —
    * the same class as any global `orderBy`, and the standard way to
    * lay out training shards (write the sorted frame with
    * `maxRecordsPerFile` = shard size). No driver round-trip, no
    * per-epoch reshuffle state. The sort coordinate stays on the frame
    * as `__shuffle_key` (reserved prefix) for shard bookkeeping.
    */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: String): DataFrame =
    df.withColumn("__shuffle_key",
        md5(concat(col(keyCol).cast("string"), lit(":"), lit(epoch))))
      .orderBy(col("__shuffle_key"), col(keyCol))

  /** Rendezvous (highest-random-weight) shard assignment: the shard of
    * a key is `argmax over s of md5(key ":" s)` — every participant
    * computes the same answer with NO coordination or lookup table, and
    * when the shard count grows from S to S+1, ONLY the keys whose new
    * shard wins move (≈ 1/(S+1) of them), versus `key mod S`
    * reassigning nearly everything. That minimal-churn property is why
    * consistent placement (cache rings, shard maps, worker-sticky
    * routing of training shards) uses HRW instead of modulo.
    *
    * Pure codegen projection — `shards` md5 probes and a `greatest`
    * over (hash, shard) structs, no explode, no shuffle, no state. Ties
    * break to the larger shard index via the struct's second field
    * (md5 ties across distinct probe strings do not occur in practice,
    * but the order stays total either way). Engine-independent: md5 of
    * the decimal key string, so an external system (or the oracle)
    * re-derives the exact placement.
    */
  def rendezvousShard(key: Column, shards: Int): Column = {
    require(shards >= 1 && shards <= 256,
      s"shards must be in [1, 256] for the inline-probe form, got $shards")
    if (shards == 1) lit(0)
    else {
      val cands = (0 until shards).map(sIdx =>
        struct(
          md5(concat(key.cast("string"), lit(":" + sIdx))).as("h"),
          lit(sIdx).as("s")))
      greatest(cands: _*).getField("s")
    }
  }

  /** Stratified sampling with Neyman allocation: given a global budget
    * of `budgetFrac · N` rows, each stratum h receives sample mass
    * proportional to `n_h · s_h` (its size times its within-stratum
    * standard deviation of `value`) — the allocation that minimizes the
    * variance of the stratified estimate of `mean(value)`. High-variance
    * strata are sampled harder; a constant stratum needs almost no rows
    * to pin its mean. The per-stratum RATE is therefore
    * `budgetFrac · N · s_h / Σ_j n_j s_j`, capped at 1 (the cap spills
    * no mass — the budget is a target, not an exact count, as in any
    * rate-based sampler). If every stratum is constant (`Σ n_j s_j = 0`)
    * the allocation degenerates and proportional sampling (`rate =
    * budgetFrac` everywhere) is used instead. A singleton stratum has
    * no sample stddev; it contributes 0 allocation mass.
    *
    * Admission is content-keyed and engine-independent (the
    * [[contentSample]] coordinate, widened to a numeric threshold so
    * rates need not be multiples of 1/256): row admitted iff the first
    * 12 md5 hex chars of its key, as a 48-bit integer, fall below
    * `rate · 2⁴⁸`. The comparison stays on the hex STRING (fixed-width
    * lowercase hex compares lexicographically = numerically), with the
    * threshold rendered by `%012x`; the rate is rounded to 6 decimals
    * first so both sides of an external re-derivation (the oracle)
    * agree bit-for-bit. Rows keyed into a stratum are admitted
    * independently, so re-running on a grown corpus keeps every
    * previously admitted row whose stratum rate did not shrink.
    *
    * Shape at scale: one stats aggregation (|strata| rows), two 1-row
    * totals, a broadcast join of the tiny rate table back onto the
    * corpus, and a codegen md5-prefix filter — no shuffle of corpus
    * bytes, no sort, no window.
    */
  def neymanSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      value: Column,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0,1], got $budgetFrac")
    val stats = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__nh"),
        coalesce(stddev_samp(value), lit(0.0)).as("__sh"))
      .localCheckpoint() // tiny; feeds the totals AND the rate table
    val tot = broadcast(stats.agg(
      sum(col("__nh")).as("__N"),
      sum(col("__nh") * col("__sh")).as("__M")))
    val rates = broadcast(stats.crossJoin(tot)
      .select(col(strataCol),
        round(
          when(col("__M") > 0,
            least(lit(1.0),
              lit(budgetFrac) * col("__N") * col("__sh") / col("__M")))
            .otherwise(lit(budgetFrac)), 6).as("__rate")))
    val prefix = substring(md5(col(keyCol).cast("string")), 1, 12)
    val threshold = format_string("%012x",
      floor(col("__rate") * lit(281474976710656L)).cast("long"))
    df.join(rates, strataCol)
      .where(col("__rate") >= 1.0 || prefix < threshold)
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-domain
    * rebalancing rule (the mBERT/XLM-R exponent-smoothed sampler): a
    * group with natural share `p` is sampled with weight
    * `p^(1/T) / Σ p^(1/T)`. `T = 1` keeps natural proportions; `T → ∞`
    * approaches uniform; values in (1, ∞) lift low-resource groups
    * without letting them dominate. Output per group: the weight mass
    * (`n_tokens`), `nat_share`, `temp_share`, and `epoch_factor` =
    * temp/nat — how many effective epochs of the group one pass of the
    * mixed corpus consumes (the oversampling factor trainers watch for
    * small-group overfitting).
    *
    * Shape at scale: one hash aggregation collapses the corpus to
    * |groups| rows; both normalizers are 1-row broadcast cross-joins
    * over that tiny table. Nothing after the first agg touches corpus
    * bytes.
    */
  def temperatureWeights(
      df: DataFrame,
      groupCol: String,
      weight: Column,
      temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val groups = df.groupBy(col(groupCol))
      .agg(sum(weight.cast("long")).as("n_tokens"))
      .localCheckpoint() // tiny; feeds both normalizers + the output
    val total = broadcast(groups.agg(sum(col("n_tokens")).as("__N")))
    // IEEE 754 guarantees sqrt is correctly rounded while pow is not
    // (engines' pow implementations legitimately differ by ULPs), so
    // the common T = 2 case takes the reproducible spelling. The
    // smoothed weight is then QUANTIZED TO AN EXACT INTEGER in
    // pico-units — floor(pt·1e12 + 0.5), all IEEE-exact ops (multiply
    // is correctly rounded, floor is exact) — and the normalizer is
    // the plain integer sum of those longs: exact, associative, and
    // free of round(x, d) (whose decimal re-rounding differs across
    // engines in the last ULP) and of float accumulation order (a
    // segment-tree windowed sum and a linear fold round differently).
    // Every op after the quantization is a correctly-rounded double
    // divide, so shares are bit-identical on any engine/partitioning.
    val exponent = 1.0 / temperature
    val ptRaw =
      if (exponent == 0.5) sqrt(col("__p"))
      else pow(col("__p"), lit(exponent))
    val shared = groups.crossJoin(total)
      .withColumn("__p", col("n_tokens").cast("double") / col("__N"))
      .withColumn("__ptq", floor(ptRaw * lit(1e12) + lit(0.5)).cast("long"))
    val z = broadcast(shared.agg(sum(col("__ptq")).as("__Zq")))
    val share = col("__ptq").cast("double") / col("__Zq").cast("double")
    shared.crossJoin(z)
      .select(col(groupCol), col("n_tokens"),
        col("__p").as("nat_share"),
        share.as("temp_share"),
        (share / col("__p")).as("epoch_factor"))
  }

  /** UniMax token allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): split a token budget `budgetFrac · total` as
    * UNIFORMLY as possible across groups, but never draw more than
    * `maxEpochs` passes over any group's own data — the epoch cap
    * that stops temperature sampling's low-resource overfitting.
    * The closed form is water-filling: allocation = min(capacity, θ)
    * with capacity = maxEpochs · n_tokens and θ the level at which
    * Σ min(capacity, θ) = budget. Greedy over groups sorted by
    * capacity ascending: group i is CAPPED iff its capacity is at most
    * the even split of what remains after the smaller groups took
    * their caps — a prefix property, so one pass of window arithmetic
    * computes it exactly (and an oracle engine reproduces it
    * bit-for-bit: the cumulative sums run in one deterministic order).
    * If the budget exceeds Σ capacity, every group caps and the
    * surplus is honestly unspent (epochs are a hard ceiling).
    *
    * Output per group: `n_tokens`, `allocation` (tokens drawn),
    * `epochs` = allocation / n_tokens, `capped`.
    *
    * Shape at scale: one hash aggregation collapses the corpus to
    * |groups| rows; the windows run over that bounded-cardinality
    * table (the q173 small-window class), never over corpus rows.
    */
  def uniMaxAllocation(
      df: DataFrame,
      groupCol: String,
      tokens: Column,
      budgetFrac: Double,
      maxEpochs: Double): DataFrame = {
    require(budgetFrac > 0, s"budgetFrac must be > 0, got $budgetFrac")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    val groups = df.groupBy(col(groupCol))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
      .localCheckpoint() // tiny; feeds totals, ranking, and the output
    val tot = broadcast(groups.agg(
      sum(col("n_tokens")).as("__T"), count(lit(1)).as("__n")))
    // Capacities and the budget are QUANTIZED TO EXACT LONGS in
    // micro-token units — floor(x·1e6 + 0.5), IEEE-exact per row — so
    // the prefix sum is an INTEGER sum (associative: a segment-tree
    // windowed sum and a linear fold agree bit-for-bit, which float
    // prefix sums do not guarantee across engines) and the cap test is
    // exact integer arithmetic, widened to decimal(38,0) so the
    // capacity × remaining PRODUCT cannot overflow a long. Bound of
    // the micro-unit quantization itself: floor(x·1e6).cast(long)
    // holds up to ~9.2e12 tokens per group (Long.MaxValue/1e6); past
    // that the budget/capacity longs saturate and the DuckDB twin
    // (which errors on overflow rather than clamping) would diverge —
    // at larger per-group masses drop to 1e3-unit (or 1-unit)
    // quantization, which this formulation admits unchanged. θ and
    // the real-valued outputs then derive
    // from the pinned integers through correctly-rounded divides only,
    // so the whole row is bit-identical on any engine/partitioning.
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    // rank + inclusive capacity prefix from the range-partitioned
    // two-pass form ([[Prefix.withRunningTotals]]) — the former
    // unpartitioned window funneled the |groups| table to one task;
    // same exact long integers, so the cap test below is unchanged
    val ranked = Prefix.withRunningTotals(
      groups.crossJoin(tot)
        .withColumn("__Bu",
          floor(col("__T").cast("double") * lit(budgetFrac) * lit(1e6)
            + lit(0.5)).cast("long"))
        .withColumn("__capu",
          floor(col("n_tokens").cast("double") * lit(maxEpochs) * lit(1e6)
            + lit(0.5)).cast("long")),
      order = Seq(col("__capu"), col(groupCol)),
      totals = Seq(col("__capu") -> "__pfxu"),
      rowNumberCol = Some("__rk"))
      // capped iff capacity ≤ (B − prefix of smaller caps) / remaining
      .withColumn("__capped",
        d38(col("__capu")) * d38(col("__n") - col("__rk") + 1) <=
          d38(col("__Bu")) - d38(col("__pfxu") - col("__capu")))
      .localCheckpoint() // feeds the k-row aggregate + the output
    val kRow = broadcast(ranked.where(col("__capped"))
      .agg(max(col("__rk")).as("__k"), max(col("__pfxu")).as("__kpfxu")))
    val k = coalesce(col("__k"), lit(0L))
    val thetaU = when(col("__n") === k, lit(0.0)) // all capped: θ unused
      .otherwise((col("__Bu") - coalesce(col("__kpfxu"), lit(0L)))
        .cast("double") / (col("__n") - k).cast("double"))
    val allocU = when(col("__capped"), col("__capu").cast("double"))
      .otherwise(thetaU)
    ranked.crossJoin(kRow)
      .select(col(groupCol), col("n_tokens"),
        (allocU / lit(1e6)).as("allocation"),
        (allocU / lit(1e6) / col("n_tokens")).as("epochs"),
        col("__capped").as("capped"))
  }

  /** Sequence packing — concat-and-chunk bookkeeping for LLM training:
    * documents are laid end-to-end in md5-coordinate order and the
    * resulting token stream is sliced into fixed `seqLen` windows; each
    * document learns which pack it starts in (`pack_id`), at which
    * offset (`pack_offset`), and how many packs it spans (`n_packs`).
    * Deterministic on any partitioning or engine — the order is the
    * same content-keyed coordinate every sampler here uses — so the
    * packing layout is reproducible across runs and re-crawls.
    *
    * Shape at scale: a naive global running sum is a single-partition
    * sort — a non-starter at 100 TB. Instead the classic distributed
    * prefix sum: the md5 coordinate's first two hex chars shard the
    * corpus into 256 ranges whose concatenation IS the global order, so
    * (1) per-shard token totals (a 256-row aggregate) get exclusive
    * prefix-summed by a trivially small window, and (2) a per-shard
    * running-sum window plus the broadcast shard base yields every
    * document's global start offset with no global sort and no driver
    * round-trip. Two passes over (key, tokens) — both column-pruned
    * scans — and a 32-way-parallel window.
    */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      tokenCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val W = org.apache.spark.sql.expressions.Window
    val kd = df
      .withColumn("__k", contentKey(col(keyCol)))
      .withColumn("__shard", substring(col("__k"), 1, 2))
    // Exclusive prefix sum over the ≤256 shard totals, computed on the
    // driver from the collected aggregate ([[Prefix.boundedExclusiveOffsets]]
    // — the same rows the broadcast join below already collects), then
    // broadcast back. No single-partition WindowExec anywhere.
    val bases = Prefix.boundedExclusiveOffsets(
      kd.groupBy(col("__shard")).agg(sum(col(tokenCol)).as("__tot")),
      "__shard", "__tot", "__base")
    val wIn = W.partitionBy(col("__shard"))
      .orderBy(col("__k"), col(keyCol))
      .rowsBetween(W.unboundedPreceding, -1)
    val start = col("__base") + coalesce(sum(col(tokenCol)).over(wIn), lit(0L))
    // A zero-token document still occupies its start point (spans 1).
    val lastTok = col("__start") + greatest(col(tokenCol), lit(1L)) - lit(1L)
    kd.join(broadcast(bases), "__shard")
      .withColumn("__start", start)
      .withColumn("pack_id", floor(col("__start") / lit(seqLen)).cast("long"))
      .withColumn("pack_offset", pmod(col("__start"), lit(seqLen)).cast("long"))
      .withColumn("n_packs",
        (floor(lastTok / lit(seqLen)) - col("pack_id") + lit(1L)).cast("long"))
      .drop("__k", "__shard", "__base", "__start")
  }

  /** First-fit-decreasing bin packing — the DOC-ISOLATING packing
    * policy: every document lands whole in exactly one `seqLen`-token
    * bin (no cross-document attention contamination), and FFD keeps
    * the padding waste near optimal (≤ 11/9·OPT + 6/9 bins, the
    * classic bound) where naive one-doc-per-bin isolation wastes
    * `1 − avg(doc)/seqLen` of every bin. Documents longer than
    * `seqLen` get a dedicated bin each (chunk them first — [[graft
    * .ext.TextAnalysis.chunkByTokens]] — if splitting is acceptable);
    * zero-token documents occupy one slot, as in [[packSequences]].
    *
    * Returns one row per document: the key, its token count
    * (`n_toks`), the global bin it was placed in (`bin_id`,
    * contiguous from 0), and its start offset inside the bin
    * (`bin_offset`).
    *
    * Shape at scale: FFD is inherently sequential, so it runs
    * per-shard — the md5-prefix of the key carves the corpus into 256
    * content-hash ranges ([[packSequences]]' shard shape), each shard
    * packs independently (an `O(d log d)` loop: bins live in a
    * max-capacity segment tree, so first-fit placement is
    * `O(log bins)`, not a linear scan), and shard-local bin ids
    * globalize through the same broadcast exclusive-prefix-sum the
    * other 256-shard operators use. Sharding costs at most a few
    * partially-filled bins per shard versus a global FFD — O(shards)
    * extra bins on corpora of millions of bins — and buys
    * shard-parallel packing with no global sort and no driver
    * round-trip. Deterministic on any partitioning: shard membership,
    * the FFD order (tokens desc, md5 asc), and the first-fit rule are
    * all content-keyed. Per-shard state is one in-memory array of
    * (key, tokens) — SIZE `shards` TO THE CORPUS: each shard pays up
    * to a few partially-filled bins, so shards ≫ docs/binsPerShard
    * drowns the packing in leftovers (at 500 docs, 256 shards produced
    * 4× the optimal bin count; ~64+ docs per shard keeps the overhead
    * marginal), while too few shards caps parallelism and grows the
    * per-task array. Shard membership is the md5 prefix reduced mod
    * `shards`, so any count up to 65536 is content-keyed.
    */
  def packBinsFFD(
      df: DataFrame,
      keyCol: String,
      tokenCol: String,
      seqLen: Long,
      shards: Int = 256,
      maxShardRows: Int = 4000000): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(shards >= 1 && shards <= 65536,
      s"shards must be in [1, 65536], got $shards — each shard buffers its " +
        "full (key, tokens, md5) row set in ONE task's memory, so shards must " +
        "scale with the corpus (rows/shards bounded by executor heap)")
    require(maxShardRows >= 1, s"maxShardRows must be positive, got $maxShardRows")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructType}
    val keyField = df.schema(keyCol)
    val in = df
      .select(col(keyCol), col(tokenCol).cast("long").as("__n"))
      .withColumn("__k", contentKey(col(keyCol)))
      .withColumn("__shard",
        pmod(conv(substring(col("__k"), 1, 4), 16, 10).cast("long"), lit(shards.toLong)))
    val outSchema = new StructType()
      .add(keyField.name, keyField.dataType)
      .add("n_toks", LongType)
      .add("__shard", LongType)
      .add("__local_bin", LongType)
      .add("bin_offset", LongType)
    val packed = in
      .groupByKey(_.getAs[Long]("__shard"))(Encoders.scalaLong)
      .flatMapGroups { (shard: Long, it: Iterator[Row]) =>
        // FFD order: tokens desc, md5 asc — content-keyed, so the
        // layout reproduces across runs and partitionings
        val buf = new scala.collection.mutable.ArrayBuffer[Row]()
        while (it.hasNext) {
          buf += it.next()
          // fail fast with an actionable message instead of letting an
          // undersized shard count OOM the executor mid-buffer
          if (buf.length > maxShardRows)
            throw new IllegalStateException(
              s"packBinsFFD shard $shard exceeds maxShardRows=$maxShardRows " +
                s"buffered rows; increase `shards` (corpus rows / shards must " +
                s"stay under the per-task memory bound) or raise maxShardRows")
        }
        val docs = buf.toArray.sortBy { r =>
          val n = if (r.isNullAt(1)) 0L else r.getLong(1)
          (-math.max(n, 1L), r.getString(2))
        }
        val m = docs.length
        // Max-remaining segment tree over m potential bins (leaves
        // m..P-1 stay 0): placing j docs touches ≤ j bins, so an
        // untouched seqLen-capacity bin always exists and first-fit
        // never misses. Touched bins form a prefix of the index
        // order — a doc never skips an earlier bin that fits — so
        // used bins are ids 0..nBins-1 with no holes.
        var p = 1
        while (p < m) p <<= 1
        val tree = new Array[Long](2 * p)
        var i = 0
        while (i < m) { tree(p + i) = seqLen; i += 1 }
        i = p - 1
        while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i -= 1 }
        val out = new Array[Row](m)
        i = 0
        while (i < m) {
          val r = docs(i)
          val n = if (r.isNullAt(1)) 0L else r.getLong(1)
          val eff = math.max(n, 1L) // a zero-token doc occupies a slot
          val need = math.min(eff, seqLen) // oversize claims a whole empty bin
          var node = 1
          while (node < p) {
            node = if (tree(2 * node) >= need) 2 * node else 2 * node + 1
          }
          val bin = node - p
          val offset = seqLen - tree(node) // fill before placement
          // an oversize doc fills its bin completely (its bin's true
          // capacity is the doc length; stats account for that)
          tree(node) = if (eff > seqLen) 0L else tree(node) - need
          node >>= 1
          while (node >= 1) {
            tree(node) = math.max(tree(2 * node), tree(2 * node + 1))
            node >>= 1
          }
          out(i) = Row(r.get(0), n, shard, bin.toLong, offset)
          i += 1
        }
        out.iterator
      }(Encoders.row(outSchema))
      // pinned: consumed by the bases aggregate AND the join below —
      // unpinned, the whole per-shard packing re-runs per branch
      .localCheckpoint()
    // exclusive shard-base offsets from the collected ≤`shards`-row
    // aggregate (reads the pinned packed blocks; same bytes the
    // broadcast join below collects anyway) — no one-task window sort
    val bases = Prefix.boundedExclusiveOffsets(
      packed.groupBy(col("__shard"))
        .agg((max(col("__local_bin")) + 1L).as("__nb")),
      "__shard", "__nb", "__base")
    packed.join(broadcast(bases), "__shard")
      .select(col(keyField.name), col("n_toks"),
        (col("__base") + col("__local_bin")).as("bin_id"), col("bin_offset"))
  }

  /** Token-budget sampling — the corpus-MIXING primitive: per group
    * (source / language / domain), keep documents in md5-coordinate
    * order while the RUNNING token total stays within that group's
    * budget. This is how a training mixture is drawn ("web 60B tokens,
    * code 20B, books 10B…"): deterministic (same docs chosen on any
    * partitioning or engine — no `rand()`), content-keyed (a re-crawl
    * keeps the same selection), and budgeted in tokens, not documents.
    *
    * The first document of a group is always kept even when it alone
    * overflows the budget (a mixture spec of N tokens means "roughly
    * N", never zero). `budgets` misses drop the group — an explicit
    * mixture is a whitelist.
    *
    * Shape at scale: the [[packSequences]] distributed prefix sum, per
    * group — a window partitioned by group ALONE would funnel each
    * source onto one task (with 3 quality bins that is a 3-task plan
    * regardless of cluster size). The md5-prefix shard splits every
    * group's order into 256 ranges: per-(group, shard) running-sum
    * windows run 256-way parallel per group, and the exclusive shard
    * bases come from a broadcast |groups|×256-row aggregate.
    */
  def sampleByTokenBudget(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tokenCol: String,
      budgets: Map[String, Long]): DataFrame = {
    // a zero budget would silently break the always-keep-first rule
    // (0-before < 0 is false); "no tokens from this group" is spelled
    // by omitting the group from the whitelist instead
    require(budgets.values.forall(_ > 0),
      s"budgets must be positive (omit a group to exclude it): $budgets")
    val W = org.apache.spark.sql.expressions.Window
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (g, b)) => when(col(groupCol) === g, b).otherwise(acc)
    }
    // The running sum is per GROUP in md5 order, but a window
    // partitioned by group alone funnels each group onto ONE task —
    // with a handful of sources/bins that is a near-sequential plan at
    // scale (measured: 2.5 s of q79's wall on 3 bins). Same remedy as
    // [[packSequences]]: the md5 prefix shards each group into 256
    // ranges whose concatenation IS the group's order, so per-(group,
    // shard) windows run 256-way parallel per group and the exclusive
    // shard bases come from a tiny broadcast aggregate.
    // Pinned before fanning into the bases aggregate and the join side
    // (the crossDocDupFraction lesson): the group column is often an
    // EXPENSIVE derived expression (q79 bins on the full quality
    // score), and an unpinned fan-out re-evaluates it per branch —
    // measured 1.8× the whole draw. The checkpoint materializes no
    // more than the shuffle below would.
    val kd = df
      .withColumn("__budget", budget)
      .where(col("__budget").isNotNull)
      .withColumn("__k", contentKey(col(keyCol)))
      .withColumn("__shard", substring(col("__k"), 1, 2))
      .localCheckpoint()
    val bases = kd.groupBy(col(groupCol), col("__shard"))
      .agg(sum(col(tokenCol)).as("__tot"))
      .withColumn("__base",
        coalesce(sum(col("__tot")).over(
          W.partitionBy(col(groupCol)).orderBy(col("__shard"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col("__shard"), col("__base"))
    val wIn = W.partitionBy(col(groupCol), col("__shard"))
      .orderBy(col("__k"), col(keyCol))
      .rowsBetween(W.unboundedPreceding, -1)
    kd.join(broadcast(bases), Seq(groupCol, "__shard"))
      // tokens BEFORE this row in the group's global md5 order: the row
      // is kept while the budget is not yet exhausted when it starts
      .withColumn("__before",
        col("__base") + coalesce(sum(col(tokenCol)).over(wIn), lit(0L)))
      .where(col("__before") < col("__budget"))
      .drop("__budget", "__k", "__shard", "__base", "__before")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorOps

/** Product quantization — the memory tier between int8
  * ([[Quantize]], 4× smaller) and raw floats for billion-vector ANN:
  * the vector splits into `m` subvectors, each subvector maps to its
  * nearest centroid in a per-subspace codebook of `k` entries, and the
  * stored vector becomes `m` small codes (k ≤ 256 → one byte each —
  * 64-dim float32 compresses 32× at m=8). Queries score compressed
  * rows by ASYMMETRIC distance: the query stays full-precision, and
  * `‖q − recon(codes)‖²` decomposes into `Σ_j lut[j][code_j]` where
  * the per-subspace lookup table is computed ONCE per query on the
  * driver (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * Shape at scale (the [[SimilaritySearch.learnCentroids]] contract):
  * codebooks fit on a bounded driver-side sample — never a full pass —
  * and ride into plans as literals; encoding is `m × k` codegen
  * [[VectorOps.sqdist]] probes per row in the scan projection (no
  * shuffle, no UDF); ADC scoring is `m` `element_at` lookups + a sum,
  * then the same TakeOrderedAndProject top-k as every other scorer.
  * Composes with IVF ([[SimilaritySearch.ivfTopK]]): coarse cells
  * prune the scan, PQ codes shrink what's scanned — the standard
  * IVF-PQ layout.
  */
object Pq {

  /** Per-subspace codebooks: `codebooks(j)(c)` is centroid `c` of
    * subspace `j` (length `dim / m` each).
    */
  final case class PqModel(codebooks: Vector[Vector[Seq[Double]]], dim: Int) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = dim / m
  }

  /** 1-based slice of subspace `j` (Spark `slice` is 1-based). */
  private def sub(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Learn the `m` codebooks on a bounded driver-side sample (one
    * reservoir sample per subspace; same seed discipline as the IVF
    * coarse quantizer). `dim` must divide evenly by `m`.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int,
      k: Int = 16,
      sampleN: Int = 2000,
      iters: Int = 5,
      seed: Long = 42L): PqModel = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(k >= 1 && k <= 256, s"k=$k must fit one byte")
    val subDim = dim / m
    val books = (0 until m).toVector.map { j =>
      SimilaritySearch.learnCentroids(
        df.select(sub(col(vecCol), j, subDim).as("__sub")),
        "__sub", k, sampleN, iters, seed + j).toVector
    }
    PqModel(books, dim)
  }

  /** The `m`-code encoding of `vec` as an `array<int>` column: per
    * subspace, argmin over the `k` centroid distances (ties → lowest
    * code, deterministic). `m × k` codegen sqdist probes, all in the
    * scan projection.
    */
  def encode(vec: Column, model: PqModel): Column = {
    val codes = (0 until model.m).map { j =>
      val s = sub(vec, j, model.subDim)
      val ds = array(model.codebooks(j).map(c => VectorOps.sqdist(s, typedLit(c))): _*)
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** Asymmetric distance of a full-precision driver-side query to a
    * codes column: the per-subspace lookup table is computed here once
    * (driver, `m × k` small sqdists), then each row pays `m`
    * `element_at` + a sum. Returns squared L2 to the RECONSTRUCTED
    * vector — the PQ approximation of `‖q − x‖²`.
    */
  def adcDistance(codes: Column, query: Seq[Double], model: PqModel): Column = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    val lut: Vector[Seq[Double]] = (0 until model.m).toVector.map { j =>
      val qs = query.slice(j * model.subDim, (j + 1) * model.subDim)
      model.codebooks(j).map(c =>
        c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    (0 until model.m)
      .map(j => element_at(typedLit(lut(j)), element_at(codes, j + 1) + 1))
      .reduce(_ + _)
  }

  /** ADC top-k over an encoded frame: cheapest distance first, ties by
    * id (deterministic). TakeOrderedAndProject — per-partition heaps,
    * no full sort, no shuffle beyond the k-row gather.
    */
  def adcTopK(
      encoded: DataFrame,
      idCol: String,
      codesCol: String,
      query: Seq[Double],
      model: PqModel,
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.fold(encoded)(id => encoded.where(col(idCol) =!= id))
    base
      .select(col(idCol), adcDistance(col(codesCol), query, model).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ: the standard billion-vector layout — coarse cells prune
    * the scan ([[SimilaritySearch.ivfTopK]]'s geometry), PQ codes
    * shrink what's scanned. Rows outside the `nProbe` nearest cells
    * never evaluate a distance; rows inside pay the m-lookup ADC sum.
    * On a cell-partitioned store ([[SimilaritySearch]]'s persisted IVF
    * index) the cell filter becomes partition pruning and the scan
    * reads codes only — dim/8 bytes per row instead of 4·dim.
    */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      coarseCentroids: Seq[Seq[Double]],
      model: PqModel,
      nProbe: Int = 2,
      excludeId: Option[Long] = None): DataFrame = {
    val cell = SimilaritySearch.nearestCentroid(col(vecCol), coarseCentroids, spherical = false)
    val probes = SimilaritySearch.probeCellsFor(query, coarseCentroids, nProbe)
    val pruned = df.where(cell.isin(probes: _*))
    adcTopK(
      pruned.select(col(idCol), encode(col(vecCol), model).as("__codes")),
      idCol, "__codes", query, model, k, excludeId)
  }
}

package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns — the
  * cheap dimensionality cut (64 → 16 here) that makes downstream
  * clustering / LSH / pairwise passes 4x lighter while preserving
  * pairwise geometry to within the JL distortion bound. The ±1 sign
  * matrix (Achlioptas 2003 — dense Rademacher; no Gaussians needed)
  * is derived from an md5-seeded counter, so the projection is a pure
  * function of (seed, dims): any executor, any engine, any round
  * regenerates the identical matrix, and an oracle can inline it as SQL
  * literals (the s2 seeded-hyperplane precedent).
  *
  * Scale posture: the matrix is outDim x dim literals baked INTO the
  * projection expression (kilobytes, plan-side — nothing is broadcast or
  * shuffled), and the projection itself is a map-only codegen'd
  * `aggregate` fold per output dim: ONE corpus scan, zero exchanges.
  * The fold runs in fixed i=1..dim order, so the float result is
  * order-deterministic; outputs are rounded to 6 dp like every
  * ln/fold-derived surface on the board.
  */
object Projection {

  /** Deterministic Rademacher sign: parity of the first hex nibble of
    * md5("rp:<seed>:<i>:<j>"). */
  def signMatrix(seed: Int, dim: Int, outDim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(outDim) { j =>
      Array.tabulate(dim) { i =>
        val h = md.digest(s"rp:$seed:$i:$j".getBytes("UTF-8"))
        if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Project `vecCol` (array<float>, length `dim`) to `outDim` dims:
    * out_j = round( (Σ_i v_i · s_ij) / √outDim , 6). Output long-form
    * (id, dim, value) — one row per projected coordinate, so the result
    * is hash-comparable without array-encoding concerns. */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, seed: Int = 42): DataFrame = {
    val signs = signMatrix(seed, dim, outDim)
    val scale = math.sqrt(outDim.toDouble)
    val outs = array((0 until outDim).map { j =>
      val sgn = array(signs(j).map(lit): _*)
      round(
        aggregate(sequence(lit(1), lit(dim)), lit(0.0),
          (acc, i) => acc + element_at(col(vecCol), i).cast("double") * element_at(sgn, i))
          / lit(scale), 6)
    }: _*)
    df.select(col(idCol).as("vec_id"), posexplode(outs).as(Seq("dim", "value")))
  }
}

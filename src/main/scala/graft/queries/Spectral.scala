package graft.queries

import graft.{GQuery, Tables}
import graft.operators.Pca
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spectral / dimensionality-reduction operators over the `embeddings`
  * table: exact PCA (covariance eigendecomposition, [[graft.operators.Pca]])
  * and a Johnson-Lindenstrauss random projection — the two standard
  * pre-ANN compaction steps (PCA feeds OPQ-style rotations; JL projection
  * is the cheap oblivious alternative when no training pass is affordable).
  */
object Spectral {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  // ------------------------------------------------------------------- x147
  // PCA: fit top-8 axes, project the corpus through the plan-literal
  // mat-vec kernel, and report per-axis (eigenvalue, projected variance,
  // explained-variance ratio) in milli-units. The defining identity of PCA
  // — the variance of the data PROJECTED onto axis i equals eigenvalue i —
  // is thus computed two ways (driver eigensolve vs distributed projection
  // aggregate) and lands in adjacent columns; PcaSpec pins their agreement
  // plus orthonormality, trace, and reconstruction-optimality gates.
  // Approximate/iterative float pipeline => no SQL oracle (rows-only
  // check), the x112/x80 discipline.
  //
  // Scale shape: fit = one treeAggregate pass (d² partials, no rows to the
  // driver); projection = narrow fused mat-vec; the variance rollup
  // shuffles 8 doubles per input partition (partial aggregation). Nothing
  // quadratic in n anywhere.
  private val R = 8

  private val x147 = GQuery(
    "x147_pca_embeddings", "ext-spectral pca",
    (s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val m = Pca.fit(e, "embedding", R)
      val projVar = e
        .select(posexplode(Pca.projectCol(col("embedding"), m)).as(Seq("pos", "c")))
        .groupBy(col("pos"))
        .agg((avg(col("c") * col("c")) - avg(col("c")) * avg(col("c"))).as("pvar"))
      val model = (0 until R).map(i =>
        (i, math.round(m.eigenvalues(i) * 1000),
          math.round(m.explainedRatio(i) * 1000)))
        .toDF("pos", "lambda_milli", "evr_milli")
      projVar.join(broadcast(model), "pos")
        .select(col("pos").cast("long").as("comp"),
          col("lambda_milli"), round(col("pvar") * 1000, 0).cast("long").as("pvar_milli"),
          col("evr_milli"))
        .orderBy("comp")
    },
    None) // float eigensolve: gated by PcaSpec (variance≡eigenvalue, orthonormality, optimality)

  // ------------------------------------------------------------------- x148
  // Johnson-Lindenstrauss random projection, EXACT-verifiable: embeddings
  // are first quantized to integer milli-units, and the projection matrix
  // is a deterministic ±1 sign pattern — the parity of md5(dim_axis), the
  // x42 reproducible-coin discipline (a LINEAR integer hash mod 2 is NOT a
  // coin: parity of i·odd + j·odd is parity(i+j), a rank-1 sign matrix
  // that collapses all axes onto one direction — found the hard way, now
  // pinned by SpectralSpec's rank/distortion gates). Every projected
  // coordinate is an INTEGER sum: order-independent, and the DuckDB oracle
  // reproduces it bit-for-bit (the engine's no-float-reassociation
  // discipline applied to matrix multiply; Achlioptas 2003 showed ±1
  // entries suffice for JL). The spec additionally checks the JL property
  // itself: norms and pairwise distances survive the 64→8 compression.
  //
  // Scale shape: pure narrow per-row arithmetic (transform+aggregate over
  // the vector, 8 output sums), fused in one projection over the scan —
  // zero shuffle, zero state; the "matrix" never exists anywhere. The
  // in-plan md5 costs d·r hashes per row — fine here and fully
  // SQL-portable; the production form precomputes the r sign vectors
  // driver-side once and ships them as plan literals (matVecLit), hashing
  // nothing per row.
  private val JlR = 8

  private def jlTerm(j: Int): String =
    s"aggregate(transform(sequence(0, size(mi) - 1), " +
      s"i -> element_at(mi, i + 1) * (case when substring(md5(concat(cast(i as string), '_$j')), 1, 1) " +
      s"in ('0','2','4','6','8','a','c','e') then 1 else -1 end)), " +
      s"0L, (acc, x) -> acc + x)"

  private val x148 = GQuery(
    "x148_random_projection", "ext-spectral jl-projection",
    (s, dir) => {
      val base = emb(s, dir).select(col("vec_id"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
          .as("mi"))
      base.select(col("vec_id") +:
          (0 until JlR).map(j => expr(jlTerm(j)).as(s"y$j")): _*)
        .orderBy("vec_id")
    },
    Some {
      val ys = (0 until JlR).map { j =>
        s"""CAST(list_sum(list_transform(range(0, len(mi)),
             i -> mi[i + 1] * (CASE WHEN substr(md5(CAST(i AS VARCHAR) || '_$j'), 1, 1)
               IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END))) AS BIGINT) AS y$j"""
      }.mkString(",\n               ")
      s"""WITH q AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS mi
             FROM embeddings)
           SELECT vec_id,
               $ys
           FROM q ORDER BY vec_id"""
    })

  // ------------------------------------------------------------------- x170
  // Leave-one-out 1-NN classifier evaluation over the embedding corpus —
  // the label-quality / separability audit run before training on a
  // labeled embedding set (a noisy-label detector: a class whose members'
  // nearest neighbors sit in another class is mislabeled or inseparable).
  // Output is the full confusion matrix of (actual, predicted-by-nearest-
  // neighbor) label pairs on a deterministic holdout (first `EvalN`
  // vec_ids — the x95 bounded-evaluation discipline).
  //
  // Exactness: embeddings quantize to integer milli-units (x148's
  // discipline) and distances are exact integer squared-L2, so the argmin
  // (ties to the smaller neighbor id) is deterministic and the matrix
  // hash-verifies — the DuckDB replay computes the same integers through
  // list_dot_product in doubles, exact below 2^53.
  //
  // Scale shape: the holdout sample (EvalN × d ints) broadcasts; the
  // corpus side streams through ONE narrow scan scoring each corpus row
  // against the broadcast sample (the x71 batch-serving shape, here with
  // the sample as the query batch); per-query argmin partial-aggregates
  // (min of (d2, nid) structs), so the exchange carries EvalN rows per
  // partition, never the n×EvalN pair table.
  private val EvalN = 500

  private val x170 = GQuery(
    "x170_knn_label_eval", "ext-spectral classifier-eval knn",
    (s, dir) => {
      // milli-quantized values kept in DOUBLE arrays so the native SqDist
      // kernel applies: every term is an exact integral double (milli
      // sums bound far below 2^53), so the arithmetic — and the argmin —
      // is bit-identical to the bigint form, at kernel speed instead of
      // one interpreted lambda per element per pair (profiled 3x total
      // query cost at sf0.1 before this hoist)
      val q = expr("transform(embedding, x -> round(cast(x as double) * 1000))")
      // kernel fan-out (round 15, Par scaladoc): the 500×N sqDist pass
      // ran on the embedding scan's byte-sized splits
      val base = Par.fanOutScan(emb(s, dir), "vec_id")
        .select(col("vec_id"), col("label").cast("long").as("label"), q.as("mi"))
      val holdout = base.where(col("vec_id") < EvalN)
        .select(col("vec_id").as("qid"), col("label").as("actual"), col("mi").as("qv"))
      val pairs = base.join(broadcast(holdout), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("actual"), col("label").as("cand_label"),
          col("vec_id").as("nid"),
          graft.functions.VectorOps.sqDist(col("mi"), col("qv")).as("d2"))
      pairs
        .groupBy(col("qid"), col("actual"))
        .agg(min(struct(col("d2"), col("nid"), col("cand_label"))).as("nn"))
        .select(col("actual"), col("nn.cand_label").as("predicted"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")
    },
    Some(s"""WITH q AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE)) AS mi
             FROM embeddings),
            n AS (SELECT vec_id, label, mi, list_dot_product(mi, mi) AS nq FROM q),
            hold AS (SELECT vec_id AS qid, label AS actual, mi AS qv, nq AS nhq
              FROM n WHERE vec_id < $EvalN),
            pairs AS (
              SELECT h.qid, h.actual, c.label AS cand_label, c.vec_id AS nid,
                c.nq + h.nhq - 2 * list_dot_product(c.mi, h.qv) AS d2
              FROM n c JOIN hold h ON c.vec_id <> h.qid),
            nn AS (
              SELECT qid, actual, cand_label,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
              FROM pairs)
            SELECT actual, cand_label AS predicted, CAST(COUNT(*) AS BIGINT) AS n
            FROM nn WHERE rn = 1 GROUP BY actual, cand_label
            ORDER BY actual, predicted"""))

  // ------------------------------------------------------------------- x276
  // Embedding hubness audit (Radovanović et al. 2010) — the intrinsic-
  // dimensionality pathology check run before trusting ANY similarity
  // search over an embedding space: in high-dimensional spaces the
  // k-occurrence distribution (how often each vector appears in others'
  // exact k-NN lists) skews right — a few "hub" vectors show up in
  // everything (they poison dedup clusters and retrieval), while
  // antihubs (in-degree 0) are unreachable. Output is the exact
  // k-occurrence histogram for k=10 over a 500-query deterministic
  // sample (the x95/x170 bounded-evaluation discipline), antihubs
  // included via the corpus left join. Same milli-quantized integer
  // squared-L2 + smaller-id tie-break as x170, so the k-NN sets — and
  // the histogram — hash-verify cross-engine.
  //
  // Scale shape: the 500-query sample broadcasts; the corpus streams
  // through one narrow scan; GroupedTopK's partial/final bounded heaps
  // carry at most 10 rows per query per partition across the exchange
  // (never the n×500 pair table); in-degree and the histogram are
  // |corpus|- and |degree-domain|-sized aggregates. The production-scale
  // form of the SAME audit is an in-degree aggregate over x127's stored
  // kNN-graph artifact — this row is its exact-arithmetic oracle.
  private val HubN = 500
  private val HubK = 10

  private val x276 = GQuery(
    "x276_hubness_audit", "ext-spectral similarity-audit hubness",
    (s, dir) => {
      import graft.plans.GroupedTopKOps
      GroupedTopKOps.ensureInstalled(s)
      val q = expr("transform(embedding, x -> round(cast(x as double) * 1000))")
      val base = emb(s, dir).select(col("vec_id"), q.as("mi"))
      val sample = base.where(col("vec_id") < HubN)
        .select(col("vec_id").as("qid"), col("mi").as("qv"))
      val pairs = base.join(broadcast(sample), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          graft.functions.VectorOps.sqDist(col("mi"), col("qv")).as("d2"))
      val knn = GroupedTopKOps.groupedTopK(pairs, Seq(col("qid")),
        Seq(col("d2"), col("nid")), k = HubK)
      val indeg = knn.groupBy(col("nid")).agg(count(lit(1)).as("deg"))
      base.select(col("vec_id"))
        .join(indeg, col("vec_id") === col("nid"), "left")
        .select(coalesce(col("deg"), lit(0L)).as("in_deg"))
        .groupBy(col("in_deg")).agg(count(lit(1)).as("n_vectors"))
        .orderBy("in_deg")
    },
    Some(s"""WITH q AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE)) AS mi
             FROM embeddings),
            n AS (SELECT vec_id, mi, list_dot_product(mi, mi) AS nq FROM q),
            hold AS (SELECT vec_id AS qid, mi AS qv, nq AS nhq
              FROM n WHERE vec_id < $HubN),
            pairs AS (
              SELECT h.qid, c.vec_id AS nid,
                c.nq + h.nhq - 2 * list_dot_product(c.mi, h.qv) AS d2
              FROM n c JOIN hold h ON c.vec_id <> h.qid),
            r AS (
              SELECT nid, ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY d2, nid) AS rn
              FROM pairs),
            ind AS (
              SELECT nid, CAST(COUNT(*) AS BIGINT) AS deg
              FROM r WHERE rn <= $HubK GROUP BY 1),
            a AS (
              SELECT COALESCE(i.deg, 0) AS in_deg
              FROM q LEFT JOIN ind i ON i.nid = q.vec_id)
            SELECT in_deg, CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM a GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x291
  // Embedding norm-health audit — the degenerate-geometry check run
  // before any cosine/L2 tier is trusted (x276's hubness sibling): per
  // label, exact integer stats of the squared L2 norm in milli space
  // (min/max/mean + the max/min spread in millis). Norm COLLAPSE (all
  // vectors near one shell, spread → 0) makes cosine ≈ rank-free; norm
  // BLOWUP (heavy-tailed spread) makes unnormalized dot products
  // dominate retrieval. Same milli quantization as every exact vector
  // row (x170/x271/x277), so the audit hash-verifies; norm² sums are
  // per-row bounded (dims·(milli)² ≈ 10⁹) and the label rollup rides
  // BIGINT.
  //
  // Scale shape: one narrow scan, per-row aggregate() over the vector
  // (no explode — the x170 in-pipeline kernel shape), one |label|-domain
  // rollup.
  private val x291 = GQuery(
    "x291_embedding_norm_audit", "ext-spectral similarity-audit norm-health",
    (s, dir) => {
      emb(s, dir)
        .select(col("label").cast("long").as("label"),
          expr("""aggregate(transform(embedding,
                x -> cast(round(cast(x as double) * 1000) as bigint)),
              0L, (acc, v) -> acc + v * v)""").as("n2"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), min(col("n2")).as("min_n2"),
          max(col("n2")).as("max_n2"), sum(col("n2")).as("sum_n2"))
        .select(col("label"), col("n_vecs"), col("min_n2"), col("max_n2"),
          expr("sum_n2 div n_vecs").as("mean_n2"),
          (col("max_n2") - col("min_n2")).as("spread_n2"))
        .orderBy("label")
    },
    Some("""WITH e AS (
              SELECT CAST(label AS BIGINT) AS label,
                CAST(list_sum(list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) ** 2))
                  AS BIGINT) AS n2
              FROM embeddings)
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
              MIN(n2) AS min_n2, MAX(n2) AS max_n2,
              CAST(SUM(n2) // COUNT(*) AS BIGINT) AS mean_n2,
              MAX(n2) - MIN(n2) AS spread_n2
            FROM e GROUP BY 1 ORDER BY 1"""))

  val queries: Seq[GQuery] = Seq(x147, x148, x170, x276, x291)
}

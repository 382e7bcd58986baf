package graft.operators

import java.math.{MathContext, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) — the
  * standard diversity-aware post-processing of a vector search: greedily
  * pick the candidate maximizing
  *
  *   score(d) = λ·sim(q, d) − μ·max_{s ∈ selected} sim(d, s)
  *
  * so each pick balances query relevance against redundancy with what is
  * already selected (the reference's POST /api/search returns raw top-k —
  * MMR is the rerank a retrieval deployment layers on it).
  *
  * Spark shape — two distributed stages + a driver-side greedy:
  *   1. shortlist: brute-force cosine top-N (TakeOrderedAndProject, the
  *      [[Knn]] plan) — the only stage that touches the corpus;
  *   2. pairwise sims among the N shortlisted vectors (self-join of an
  *      N-row broadcastable frame);
  *   3. the greedy argmax loop over k picks runs on the DRIVER over the
  *      collected N×N matrix. This is a deliberate, documented collect:
  *      MMR's selection step is inherently sequential (pick i depends on
  *      picks 1..i−1), and its input is the SHORTLIST (N ≈ 20..200 rows,
  *      KBs), not the corpus — serving tiers run exactly this loop. The
  *      100 TB scale path is stages 1–2, which stay distributed.
  *
  * Determinism / oracle parity: all similarities are round(·, 6) HALF_UP
  * (Spark `round` ≡ DuckDB `round` ties-away for positives) BEFORE the
  * greedy compares anything; score recomputed with the same literal λ and
  * μ on both sides (μ is passed explicitly, never computed as 1−λ —
  * 1−0.7 is 0.30000000000000004 in IEEE double, not 0.3); ties broken by
  * smaller id. The DuckDB oracle replays the greedy as k unrolled
  * argmax-CTE steps over the same rounded sims.
  */
object Mmr {

  private def round6(x: Double): Double =
    new java.math.BigDecimal(x, MathContext.DECIMAL64)
      .setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** (rnk, vec_id, simq, score) — the k MMR picks in selection order. */
  def rerank(spark: SparkSession, sfDir: String, qId: Long = 0L, k: Int = 5,
             shortlistN: Int = 20, lam: Double = 0.7, mu: Double = 0.3): DataFrame =
    rerankDf(spark.read.parquet(s"$sfDir/embeddings.parquet"),
      qId, k, shortlistN, lam, mu)

  /** Same over any (vec_id, embedding) frame. */
  def rerankDf(emb: DataFrame, qId: Long, k: Int, shortlistN: Int,
               lam: Double, mu: Double): DataFrame = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    val q = emb.filter(col("vec_id") === qId)
      .select(col("embedding").as("q_emb"))
    val shortlist = emb.filter(col("vec_id") =!= qId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6).as("simq"),
        col("embedding"))
      .orderBy(col("simq").desc, col("vec_id").asc)
      .limit(shortlistN)
      .cache()
    val cand: Array[(Long, Double)] = shortlist.select("vec_id", "simq")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val a = shortlist.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = shortlist.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairSim: Map[(Long, Long), Double] = a.join(b, col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6).as("s"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    shortlist.unpersist()

    var selected = Vector.empty[(Long, Double, Double)] // (id, simq, score)
    var remaining = cand
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, simq) =>
        val div = if (selected.isEmpty) 0.0
          else selected.map { case (sid, _, _) => pairSim((id, sid)) }.max
        (id, simq, round6(lam * simq - mu * div))
      }
      val pick = scored.minBy { case (id, _, score) => (-score, id) }
      selected :+= pick
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, simq, score), i) => (i + 1, id, simq, score) }
      .toDF("rnk", "vec_id", "simq", "score")
  }

  /** The unrolled greedy as DuckDB SQL — step i's argmax CTE references
    * the union of steps 1..i−1 as its selected set.
    */
  def oracleSql(qId: Long, k: Int, shortlistN: Int,
                lam: Double, mu: Double, duckCosine: (String, String) => String): String = {
    val cosQ = duckCosine("e.embedding::DOUBLE[]", "q.qe")
    val cosP = duckCosine("a.emb", "b.emb")
    val steps = (2 to k).map { i =>
      val sel = (1 until i).map(j => s"SELECT id FROM p$j").mkString(" UNION ALL ")
      s"""c$i AS (
         |  SELECT s.id, s.simq,
         |    round($lam*s.simq - $mu*(SELECT max(p.s) FROM pair p
         |      WHERE p.ia = s.id AND p.ib IN ($sel)), 6) AS score
         |  FROM short s WHERE s.id NOT IN ($sel)),
         |p$i AS (SELECT * FROM c$i ORDER BY score DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(i => s"SELECT $i AS rnk, id AS vec_id, simq, score FROM p$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = $qId),
       |short AS (
       |  SELECT e.vec_id AS id, round($cosQ, 6) AS simq, e.embedding::DOUBLE[] AS emb
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> $qId
       |  ORDER BY simq DESC, id ASC LIMIT $shortlistN),
       |pair AS (
       |  SELECT a.id AS ia, b.id AS ib, round($cosP, 6) AS s
       |  FROM short a JOIN short b ON a.id <> b.id),
       |p1 AS (
       |  SELECT id, simq, round($lam*simq, 6) AS score
       |  FROM short ORDER BY score DESC, id LIMIT 1),
       |$steps
       |SELECT rnk, vec_id, simq, score FROM ($union) ORDER BY rnk""".stripMargin
  }
}

package graft.ops

import graft.core.Tables
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** d08: semantic (embedding-space) dedup, SemDeDup-style (Abbas et al.
  * 2023, arXiv:2303.09540): partition the corpus into coarse cells,
  * find cosine-similar pairs ONLY within cells, cluster the pairs, keep
  * one representative per cluster.
  *
  * Composition of machinery this library already has: IVF cell
  * assignment (s06's broadcast-centroid argmax), in-cell threshold
  * verification (s05's narrow-candidates-then-join-vectors shape), and
  * connected components (d07's Graph kernel). Centroids are the
  * md5-ordered deterministic sample (s06), so the DuckDB oracle mirrors
  * the WHOLE pipeline structurally — cells, pairs, clusters — with no
  * data-dependent recall assumption.
  *
  * 100 TB shape: assignment is a map-side broadcast argmax (no
  * shuffle); the candidate join shuffles on the cell id with per-cell
  * fanout (n/K)² where K scales with corpus size (SemDeDup uses
  * K ~ n/10k); fat vectors never ride the candidate shuffle.
  */
object SemDedup extends QueryModule {

  private val Cells     = 16
  private val Threshold = 0.4

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VectorFunctions.vec_dot(a, b)

  private def d08(s: SparkSession, dir: String): DataFrame = {
    val base = Similarity.vecs(s, dir).persist()
    val cents = base.orderBy(md5(col("vec_id").cast("string"))).limit(Cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val assign = base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("csim"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
      // persisted: the in-cell self-join instantiates this subtree for
      // BOTH sides — uncached, the centroid crossJoin + argmax window
      // would run twice
      .persist()
    // narrow in-cell candidate pairs (ids only), vectors joined back once
    val cand = assign.as("a").join(assign.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
    val pairs = cand
      .join(base.select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na")), "ida")
      .join(base.select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb")), "idb")
      .select(col("ida"), col("idb"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= Threshold)
    Graph.connectedComponents(
        Tables.embeddings(s, dir).select(col("vec_id")),
        pairs.select(col("ida"), col("idb")))
      .select(col("id").as("vec_id"), col("comp").as("cluster_id"),
        (col("id") === col("comp")).cast("long").as("kept"))
  }

  /** Full structural mirror: same centroids, same argmax tiebreak, same
    * in-cell pairs, transitive closure via recursive CTE.
    */
  private val d08Sql =
    s"""WITH RECURSIVE ${Similarity.oracleVecs},
       |c AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $Cells),
       |sims AS (
       |  SELECT n.vec_id, c.cid,
       |    list_sum(list_transform(range(1, ${Similarity.Dim + 1}), i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm) AS csim
       |  FROM n CROSS JOIN c),
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn
       |    FROM sims)
       |  WHERE crn = 1),
       |pr AS (
       |  SELECT ida, idb FROM (
       |    SELECT a.vec_id AS ida, b.vec_id AS idb,
       |      list_sum(list_transform(range(1, ${Similarity.Dim + 1}), i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm) AS sim
       |    FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |    JOIN n x ON a.vec_id = x.vec_id JOIN n y ON b.vec_id = y.vec_id)
       |  WHERE sim >= $Threshold),
       |${Graph.ccSqlCtes("pr", "SELECT vec_id, vec_id FROM embeddings")}
       |SELECT id AS vec_id, min(comp) AS cluster_id,
       |  CAST(id = min(comp) AS BIGINT) AS kept
       |FROM walk GROUP BY id""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("d08_semantic_dedup", d08, Some(d08Sql)),
  )
}

package graft.ops

import graft.core.Tables
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * 100 TB shape: the cell count K SCALES WITH THE CORPUS
  * (max(MinCells, ceil(n / TargetCellRows)), from one cheap count) so
  * per-cell candidate fanout stays ~TargetCellRows² however large the
  * corpus grows — SemDeDup's K ~ n/10k at paper scale, n/64 here so the
  * test corpora exercise multi-cell behavior. Assignment is a map-side
  * argmax over a BROADCAST single-row centroid array — no window, no
  * exchange (PlanSpec asserts the stage is shuffle-free); the candidate
  * join shuffles on the cell id; fat vectors never ride the candidate
  * shuffle.
  */
object SemDedup extends QueryModule {

  private val MinCells       = 16
  private val TargetCellRows = 64
  private val Threshold      = 0.4

  private def dot(a: Column, b: Column) =
    graft.functions.VectorFunctions.vec_dot(a, b)

  /** Deterministic corpus-scaled cell count (mirrored in the oracle). */
  private[graft] def cellCount(n: Long): Int =
    math.max(MinCells.toLong, (n + TargetCellRows - 1) / TargetCellRows).toInt

  /** Map-side cell assignment: centroids collapse to ONE row holding a
    * cid-sorted array of (cid, cv, cnrm) structs, broadcast to every
    * task; the per-row argmax is a fold over that array with the same
    * (csim DESC, cid ASC) tiebreak as the oracle's window (strict `>`
    * over the cid-ascending array keeps the smallest cid on ties). The
    * stage's plan is scan → broadcast join → project: zero exchanges.
    */
  private[graft] def assignStage(base: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = cents
      .groupBy()
      .agg(array_sort(collect_list(struct(col("cid"), col("cv"), col("cnrm")))).as("cells"))
    base.crossJoin(broadcast(centArr))
      .select(col("vec_id"),
        aggregate(col("cells"),
          struct(lit(Double.NegativeInfinity).as("bs"), lit(Long.MaxValue).as("bc")),
          (acc, c) => {
            val sim = dot(col("v"), c.getField("cv")) / (col("nrm") * c.getField("cnrm"))
            when(sim > acc.getField("bs"),
              struct(sim.as("bs"), c.getField("cid").as("bc"))).otherwise(acc)
          },
          acc => acc.getField("bc")).as("cell"))
  }

  private def d08(s: SparkSession, dir: String): DataFrame = {
    val base = Similarity.vecs(s, dir).persist()
    // one count() drives K — the only driver action; deterministic, so
    // the oracle can rebuild the same K from its own count(*)
    val cells = cellCount(base.count())
    val cents = base.orderBy(md5(col("vec_id").cast("string"))).limit(cells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // persisted: the in-cell self-join instantiates this subtree for
    // BOTH sides — uncached, the scan + broadcast argmax would run twice
    val assign = assignStage(base, cents).persist()
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

  /** Full structural mirror: same corpus-scaled K, same centroids, same
    * argmax tiebreak, same in-cell pairs, transitive closure via
    * recursive CTE.
    */
  private val d08Sql =
    s"""WITH RECURSIVE ${Similarity.oracleVecs},
       |c AS (
       |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM (
       |    SELECT n.*, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS crk
       |    FROM n)
       |  WHERE crk <= greatest($MinCells,
       |    ((SELECT count(*) FROM embeddings) + ${TargetCellRows - 1}) // $TargetCellRows)),
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

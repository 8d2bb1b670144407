package graft.ops

import graft.core.Tables
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *   s01: brute-force cosine top-k — the exact baseline. O(n²) dot
  *        products via crossJoin; correct at any scale where one side
  *        broadcasts (a query batch against a corpus). For corpus x corpus
  *        at 100 TB, use the s03 LSH path.
  *   s02: cosine near-duplicate pairs above a threshold (embedding-space
  *        dedup).
  *   s03: random-hyperplane LSH (sign-bit sketch) bucketed candidate
  *        generation + exact re-scoring — the approximate scale path.
  *        Approximate ⇒ no equality oracle; recall vs s01 is unit-tested.
  *
  * Determinism: vectors are cast float→double up front; dot/norm are
  * sequential left-fold aggregates mirrored exactly in the DuckDB oracle,
  * so similarity values are bit-identical (docs/DETERMINISM.md).
  */
object Similarity extends QueryModule {

  /** embeddings with double-cast vector and precomputed L2 norm.
    * vec_dot is the native codegen expression (graft.functions.DotProduct)
    * — same sequential fold, bit-identical to the composed form, ~100x
    * less per-row overhead.
    */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.vec_dot(col("v"), col("v"))))

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  private val oracleVecs =
    """v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM v)""".stripMargin

  /** s01: exact cosine top-5 neighbors for every vector. The per-query
    * top-k runs through the bounded-memory TopKNeighbors Aggregator
    * (partial+final agg; ≤k rows per group cross the shuffle) instead of a
    * window sort over all n² scored pairs.
    */
  private def s01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = vecs(s, dir).select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val b = vecs(s, dir).select(col("vec_id").as("nid"), col("v").as("vb"), col("nrm").as("nb"))
    val scored = a.crossJoin(b)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .as[graft.functions.KnnRow]
    scored
      .groupByKey(_.qid)
      .agg(new graft.functions.TopKNeighbors(5).toColumn.name("top"))
      .flatMap { case (qid, top) =>
        top.items.iterator.zipWithIndex.map { case (r, i) => (qid, r.nid, r.sim, (i + 1).toLong) }
      }
      .toDF("qid", "nid", "sim", "rn")
  }

  private val s01Sql =
    s"""WITH $oracleVecs,
       |p AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS nid,
       |    list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS sim
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id)
       |SELECT qid, nid, sim, rn FROM (
       |  SELECT qid, nid, sim,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rn
       |  FROM p)
       |WHERE rn <= 5""".stripMargin

  /** s02: embedding-space near-duplicate pairs (cosine >= 0.4; this corpus
    * is random vectors, max pairwise cosine ~0.51).
    */
  private def s02(s: SparkSession, dir: String): DataFrame = {
    val a = vecs(s, dir).select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = vecs(s, dir).select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= 0.4)
  }

  private val s02Sql =
    s"""WITH $oracleVecs
       |SELECT a.vec_id AS ida, b.vec_id AS idb,
       |  list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) >= 0.4""".stripMargin

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * zero-mean value derived from the shared splitmix64 mixer
    * (graft.Dedup31) — fixed across runs/engines.
    */
  private val NumPlanes = 16
  private val NumTables = 8
  private def planeComponent(table: Int, plane: Int, j: Int): Double = {
    val z = graft.Dedup31.splitmix64(table.toLong * 1000003L + plane.toLong * 8191L + j.toLong)
    z.toDouble / Long.MaxValue.toDouble // in [-1, 1]
  }

  /** s03: sign-bit (random hyperplane) LSH over `NumTables` independent
    * tables of `NumPlanes` bits each: bucket join per table, union
    * candidates, exact cosine re-score, top-5 per query. Approximate:
    * candidates ⊆ all pairs, so results are a subset of s01's — recall is
    * measured in SimilaritySpec, not oracle-checked.
    *
    * The hyperplanes are carried as data (a broadcast-joined plane table),
    * not as unrolled expressions — 8 tables x 16 planes x 64 dims inlined
    * into one projection was a plan-compilation blowup.
    */
  private def s03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = vecs(s, dir)
    val dim = 64
    val planes = (for {
      t <- 0 until NumTables
      p <- 0 until NumPlanes
    } yield (t, p, (0 until dim).map(j => planeComponent(t, p, j)).toArray))
      .toDF("tbl", "plane", "pvec")
    // bit p of table t's bucket = sign(v . plane_tp), assembled by sum
    val banded = base
      .crossJoin(broadcast(planes))
      .select(col("vec_id"), col("v"), col("nrm"), col("tbl"),
        (when(dot(col("v"), col("pvec")) > 0, lit(1L)).otherwise(lit(0L)) *
          pow(lit(2.0), col("plane")).cast("long")).as("bit"))
      .groupBy(col("vec_id"), col("tbl"))
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"), sum(col("bit")).as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        col("a.v").as("va"), col("a.nrm").as("na"), col("b.v").as("vb"), col("b.nrm").as("nb"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cand
      .select(col("qid"), col("nid"), (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
  }

  /** s04: per-label centroid components — embedding analytics (cluster
    * means, per-class prototypes). Emitted as exact decimal sums + counts
    * per (label, position); the mean is the consumer's one division
    * (DETERMINISM.md rule 3). posexplode keeps this one shuffle on
    * (label, pos) regardless of vector count.
    */
  private def s04(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "x")))
      .groupBy(col("label"), (col("pos0") + 1).cast("long").as("pos"))
      .agg(
        // float -> shortest string -> decimal: both engines print the same
        // shortest round-trip repr (<=9 sig digits), so the scale-12 parse
        // is exact — a direct double->decimal cast ties at the rounding
        // digit between Spark (rounds the string) and DuckDB (rounds the
        // binary) roughly once per thousand sums
        sum(col("x").cast("string").cast(DecimalType(28, 12))).cast("double").as("sx"),
        count(lit(1)).as("n"))

  private val s04Sql =
    """SELECT label, CAST(i AS BIGINT) AS pos,
      |  CAST(sum(CAST(xs AS DECIMAL(28,12))) AS DOUBLE) AS sx,
      |  count(*) AS n
      |FROM (SELECT label,
      |        unnest(range(1, len(embedding)+1)) AS i,
      |        unnest(list_transform(embedding, x -> CAST(x AS VARCHAR))) AS xs
      |      FROM embeddings)
      |GROUP BY label, i""".stripMargin

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("s01_cosine_knn", s01, Some(s01Sql)),
    QueryDef("s02_cosine_neardup", s02, Some(s02Sql)),
    QueryDef("s03_ann_lsh", s03, None),
    QueryDef("s04_label_centroid", s04, Some(s04Sql)),
  )
}

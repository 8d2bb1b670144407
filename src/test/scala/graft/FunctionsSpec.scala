package graft

import graft.core.MapReduceJob
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered native functions + the typed Aggregator contract path. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("vec_dot is callable from SQL and matches manual dot") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(got === (4.0 + 10.0 + 18.0))
  }

  test("vec_dot_long matches the composed integer fold and nulls on length mismatch") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(got === 32L)
    val mism = spark.sql("SELECT vec_dot_long(array(1L), array(1L, 2L)) AS d").collect()(0)
    assert(mism.isNullAt(0))
  }

  test("word_shingles from SQL: distinct trigrams in order") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT word_shingles('a b c d a b c d', 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("minhash_sig from SQL: right arity and deterministic") {
    GraftFunctions.register(spark)
    val q = "SELECT minhash_sig(array(12345L, 99999L, 54321L), 16) AS s"
    val a = spark.sql(q).collect()(0).getSeq[Long](0)
    val b = spark.sql(q).collect()(0).getSeq[Long](0)
    assert(a.length === 16)
    assert(a === b)
    assert(a.forall(v => v >= 0 && v <= 0x7fffffffL))
  }

  test("md5_hash31 equals the composed conv(substring(md5)) & mask form") {
    import org.apache.spark.sql.functions._
    val df = spark.range(50).select(
      graft.functions.TextFunctions.md5_hash31(
        array(col("id").cast("string"), concat(lit("x"), col("id")))).as("native"),
      expr("transform(array(cast(id as string), concat('x', id))," +
        " s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) & 2147483647)").as("composed"))
    assert(df.filter(col("native") =!= col("composed")).count() === 0)
  }

  test("round-2 expressions callable from SQL: rolling_hash, simhash60, sorted_id_pairs") {
    GraftFunctions.register(spark)
    val rh = spark.sql("SELECT rolling_hash('ab') AS h").collect()(0).getLong(0)
    assert(rh === (('a'.toLong * 31 + 'b') % 1000000007L))
    val sh = spark.sql("SELECT simhash60(word_shingles('a b c d', 3)) AS f").collect()(0).getLong(0)
    assert(sh >= 0L && sh < (1L << 60))
    val pairs = spark.sql("SELECT sorted_id_pairs(array(3L, 1L, 2L)) AS (ida, idb)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val m31 = spark.sql("SELECT md5_hash31(word_shingles('a b c d', 3)) AS hs")
      .collect()(0).getSeq[Long](0)
    assert(m31.length === 2 && m31.forall(h => h >= 0L && h <= 0x7fffffffL))
  }

  test("rank_cells_two_level: group cut before cell rank, id tiebreaks, guards, edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two groups: g10 = cells {10 at (1,0), 11 at (0.8,0.2)}; g20 = {20 at (0,1)}
    def cell(cid: Long, x: Double, y: Double) = (cid, Seq(x, y), math.sqrt(x * x + y * y))
    val groups = Seq((
      Seq((10L, Seq(1.0, 0.0), 1.0, Seq(cell(10, 1.0, 0.0), cell(11, 0.8, 0.2))),
        (20L, Seq(0.0, 1.0), 1.0, Seq(cell(20, 0.0, 1.0))))
    )).toDF("groups")
      .select(col("groups").cast(
        "array<struct<gid:bigint,gv:array<double>,gnrm:double," +
          "members:array<struct<cid:bigint,cv:array<double>,cnrm:double>>>>").as("groups"))
    def rank(v: Seq[Double], metric: String, cp: Int, p: Int): Seq[Long] = {
      val row = Seq((v, math.sqrt(v.map(x => x * x).sum))).toDF("v", "nrm")
      row.crossJoin(groups)
        .select(graft.functions.RankFunctions.rank_cells_two_level(
          col("v"), col("nrm"), col("groups"), metric, cp, p).as("r"))
        .as[Seq[Long]].head()
    }
    // the group CUT precedes cell ranking: a (1,0)-ish query with one
    // probe group never sees g20's cell even though probes allow 3
    assert(rank(Seq(1.0, 0.1), "negcos", 1, 3) === Seq(10L, 11L))
    // two probe groups expose all cells, ranked by similarity then cid
    assert(rank(Seq(1.0, 0.1), "negcos", 2, 3) === Seq(10L, 11L, 20L))
    // l2 metric: nearest by distance; equidistant ties break on cid
    assert(rank(Seq(0.95, 0.0), "l2", 2, 2) === Seq(10L, 11L))
    // d(11)=0.68 nearest; cells 10 and 20 tie at d=1 exactly -> cid order
    assert(rank(Seq(1.0, 1.0), "l2", 2, 3) === Seq(11L, 10L, 20L))
    // degenerate (zero-norm) query under negcos: every sim guards to the
    // +1e308 sentinel, ties collapse to ascending cid
    assert(rank(Seq(0.0, 0.0), "negcos", 2, 3) === Seq(10L, 11L, 20L))
    // empty codebook: empty result (the assign face's null argmin)
    val empty = Seq(Tuple1(Seq.empty[(Long, Seq[Double], Double, Seq[(Long, Seq[Double], Double)])]))
      .toDF("groups")
      .select(col("groups").cast(
        "array<struct<gid:bigint,gv:array<double>,gnrm:double," +
          "members:array<struct<cid:bigint,cv:array<double>,cnrm:double>>>>").as("groups"))
    val r = Seq((Seq(1.0, 0.0), 1.0)).toDF("v", "nrm").crossJoin(empty)
      .select(graft.functions.RankFunctions.rank_cells_two_level(
        col("v"), col("nrm"), col("groups"), "l2", 1, 1).as("r"))
      .as[Seq[Long]].head()
    assert(r === Seq.empty[Long])
  }

  test("rank_cells_two_level generates code and its comparator is NaN-total") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = graft.functions.TwoLevelRankCells(
      Literal(null), Literal(null), Literal(null), "l2", 1, 1)
    assert(!e.isInstanceOf[CodegenFallback],
      "the trained-IVF kernel must participate in whole-stage codegen")
    // one group; cell 11 carries a NaN component -> its l2 key is NaN and
    // must rank LAST (SQLOrderingUtil semantics), deterministically from
    // either comparison side
    val groups = typedLit(Seq(
      (1L, Seq(1.0, 0.0), 1.0, Seq(
        (11L, Seq(Double.NaN, 0.0), Double.NaN),
        (10L, Seq(1.0, 0.0), 1.0),
        (12L, Seq(0.0, 1.0), 1.0)))))
    val df = spark.range(3).select(
      graft.functions.RankFunctions.rank_cells_two_level(
        array(col("id").cast("double"), lit(0.25)), lit(1.0), groups,
        "l2", 1, 3).as("r"))
    // the projection stays inside whole-stage codegen (a fallback
    // expression would leave a bare unstarred Project)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val rows = df.as[Seq[Long]].collect()
    assert(rows.length === 3)
    // every query ranks the NaN-keyed cell last regardless of scan order
    assert(rows.forall(_.last === 11L), rows.toSeq.toString)
    assert(rows(1) === Seq(10L, 12L, 11L)) // query (1.0, 0.25): 10 nearest
  }

  test("text expressions generate code (no CodegenFallback stage break)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import graft.functions._
    val ws  = WordShingles(org.apache.spark.sql.catalyst.expressions.Literal("a b c"), 3)
    val mh  = MinHashSignature(org.apache.spark.sql.catalyst.expressions.Literal(null), IndexedSeq(1L), IndexedSeq(0L))
    val rh  = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    val m31 = Md5Hash31(org.apache.spark.sql.catalyst.expressions.Literal(null))
    for (e <- Seq(ws, mh, rh, m31))
      assert(!e.isInstanceOf[CodegenFallback], s"$e must not be CodegenFallback")
    // and the projections that use them stay inside whole-stage codegen:
    // the d03 shingle projection compiles to a WholeStageCodegen subtree
    // containing the expression (a fallback expression would have forced
    // the surrounding Project out)
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select(
      TextFunctions.word_shingles(concat_ws(" ", lit("a"), col("id"), lit("b"), lit("c")), 3).as("sh"),
      TextFunctions.rolling_hash(col("id").cast("string")).as("rh"))
    // "*(n)" is the WholeStageCodegen marker in the plan string; a
    // fallback expression would leave a bare (unstarred) Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // codegen'd results match interpreted eval (the same kernel)
    val rows = df.collect()
    assert(rows.length === 100)
    val h0 = rows.map(_.getLong(1))
    val expected = (0 until 100).map { i =>
      i.toString.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    }
    assert(h0.toSeq === expected)
  }

  test("runAggregated: typed Aggregator plans partial+final aggregation and sums correctly") {
    import spark.implicits._
    val sumAgg = new Aggregator[String, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: String): Long = b + a.toLong
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val lines = (0 until 300).map(i => s"w${i % 7} w${i % 3}").toDS()
    val out = MapReduceJob.runAggregated(
      lines, l => l.split(" ").iterator.map(w => (w, "1")), sumAgg)
    // partial aggregation before the shuffle (the combiner the reference lacks)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"))
    val got = out.collect().toMap
    val want = (0 until 300).flatMap(i => Seq(s"w${i % 7}", s"w${i % 3}"))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
  }
}

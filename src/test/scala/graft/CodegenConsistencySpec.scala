package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The native scalar expressions each carry TWO implementations of the
  * same function — the interpreted `nullSafeEval` and the Java emitted
  * by `doGenCode` — and nothing in the type system stops them drifting
  * apart (a codegen path that pads differently, folds doubles in a
  * different order, or misses a null check returns silently different
  * values only in whole-stage-compiled plans). This spec runs one
  * fixture frame through every registered scalar native under
  * `spark.sql.codegen.factoryMode=NO_CODEGEN` (forces `eval`) and
  * `CODEGEN_ONLY` (forces the generated path, and throws if an
  * expression has none) and asserts bitwise-identical output, nulls
  * included. The fixture leans on the edges: empty text, 1-char text,
  * whitespace-only, unicode, null text, null vectors, null elements,
  * and length-mismatched vectors (the declared NULL contract).
  */
class CodegenConsistencySpec extends SparkSpecBase {

  private val FactoryModeKey = "spark.sql.codegen.factoryMode"
  private val WholeStageKey = "spark.sql.codegen.wholeStage"

  /** Collect `df` under a forced expression-codegen mode; rows come back
    * ordered by the frame's `id` column so the two runs align.
    */
  private def collectUnder(mode: String, wholeStage: Boolean)
      (df: => DataFrame): Array[Row] = {
    val prevMode = spark.conf.getOption(FactoryModeKey)
    val prevWs = spark.conf.getOption(WholeStageKey)
    spark.conf.set(FactoryModeKey, mode)
    spark.conf.set(WholeStageKey, wholeStage.toString)
    try df.orderBy(col("id")).collect()
    finally {
      prevMode.fold(spark.conf.unset(FactoryModeKey))(
        spark.conf.set(FactoryModeKey, _))
      prevWs.fold(spark.conf.unset(WholeStageKey))(
        spark.conf.set(WholeStageKey, _))
    }
  }

  private def assertModesAgree(label: String)(df: => DataFrame): Unit = {
    val interpreted = collectUnder("NO_CODEGEN", wholeStage = false)(df)
    val compiled = collectUnder("CODEGEN_ONLY", wholeStage = true)(df)
    assert(interpreted.length == compiled.length, s"$label: row counts differ")
    interpreted.zip(compiled).foreach { case (a, b) =>
      assert(a == b, s"$label: interpreted $a != codegen $b")
    }
  }

  /** Deterministic text fixture: edge strings first, then seeded
    * pseudo-random mixed-script lines long enough to shingle.
    */
  private lazy val textDf: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val alphabet = "abcdefghij KLMNOP0123úñ東京🙂\t"
    val edges = Seq("", "x", "   ", "\n\n", "aaaaaaaaaaaaaaaa",
      "ééé ééé ééé ééé", "東京東京東京東京東京")
    val rand = (1 to 60).map(_ => (1 to (8 + rng.nextInt(60)))
      .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    (edges ++ rand).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      // one genuinely null text row to cross the outer null check
      .unionAll(Seq((999L, null.asInstanceOf[String])).toDF("id", "text"))
  }

  /** Deterministic vector fixture: seeded float pairs plus the null and
    * length-mismatch edges the NULL contract names.
    */
  private lazy val vecDf: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(43)
    def vec(n: Int): Array[Float] =
      Array.fill(n)((rng.nextDouble() * 2 - 1).toFloat)
    val rows = (1 to 40).map(i => (i.toLong, vec(16), vec(16))) ++ Seq(
      (101L, vec(16), vec(12)),                         // length mismatch -> NULL
      (102L, null.asInstanceOf[Array[Float]], vec(16)), // null side -> NULL
      (103L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)))     // zero norm -> NaN both ways
    val base = rows.toDF("id", "a", "b")
    // a null ELEMENT (not a null array) must also yield NULL in both paths
    base.unionAll(base.limit(1).select(col("id") + 200,
      concat(slice(col("a"), 1, 8),
        array(lit(null).cast("float")),
        slice(col("a"), 9, 7)).as("a"), col("b")))
  }

  test("cosine_sim agrees between interpreted and codegen paths") {
    assertModesAgree("cosine_sim") {
      vecDf.select(col("id"), expr("cosine_sim(a, b)").as("cs"))
    }
  }

  test("dot-product and squared-L2 rewrites agree between paths") {
    // the aggregate(zip_with(...)) idioms rewrite to the native
    // DotProduct / SquaredL2 loops (RewriteDotProduct) — drive them
    // through the public form so the rewritten natives are what run
    assertModesAgree("dot_product") {
      vecDf.select(col("id"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y)," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("dp"))
    }
    assertModesAgree("squared_l2") {
      vecDf.select(col("id"),
        expr("aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - y)" +
          " * (CAST(x AS DOUBLE) - y)), CAST(0.0 AS DOUBLE)," +
          " (acc, v) -> acc + v)").as("l2"))
    }
  }

  test("text natives agree between interpreted and codegen paths") {
    for (e <- Seq("simhash64(text)", "minhash_sigs(text)",
        "shingle_md5s(text)", "min_shingle_md5(text)",
        "min_shingle_md5(text, 6, 2)", "hash_vectorize64(text)",
        "token_entropy(text)"))
      assertModesAgree(e) {
        textDf.select(col("id"), expr(e).as("v"))
      }
  }

  test("bloom_might_contain agrees between interpreted and codegen paths") {
    import spark.implicits._
    // blob built once (mode-independent input to the probe under test)
    val blob = (0L until 100L).toDF("k")
      .agg(expr("bloom_bits_agg(k, 4096, 3)")).head().getAs[Array[Byte]](0)
    val probes = (0L until 200L).map(k => (k, k)).toDF("id", "k")
    // the probe requires a FOLDABLE blob (its declared contract) — bind
    // the collected bytes as a literal argument, not a column
    def df = probes.select(col("id"),
      call_function("bloom_might_contain", lit(blob), col("k")).as("hit"))
    assertModesAgree("bloom_might_contain")(df)
    // and the filter is still a real filter: inserted keys always hit
    val hits = df.filter(col("id") < 100).collect()
    assert(hits.forall(_.getBoolean(1)), "bloom false negative")
  }
}

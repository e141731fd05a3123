package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("ksqlDB function names run through spark.sql after install") {
    GraftSqlFunctions.install(spark)
    val got = spark.sql(
      """SELECT datetostring(-1, 'yyyy-MM-dd') AS d,
                timestamptostring(0, 'yyyy-MM-dd HH:mm:ss.SSS') AS t,
                vector_dot(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS dp,
                cosine_similarity(array(1.0F, 0.0F), array(2.0F, 0.0F)) AS cs
      """).as[(String, String, Double, Double)].collect()(0)
    assert(got._1 == "1969-12-31")
    assert(got._2 == "1970-01-01 00:00:00.000")
    assert(got._3 == 11.0)
    assert(math.abs(got._4 - 1.0) < 1e-12)
  }

  test("zorder_key and kmv_sketch run through spark.sql") {
    GraftSqlFunctions.install(spark)
    val z = spark.sql("SELECT zorder_key(12345, 54321) AS z")
      .as[Long].head()
    assert(z == operators.ZOrder.zkeyJvm(12345L, 54321L))
    val ks = spark.sql(
      """SELECT kmv_sketch(h, 3) AS ks
         FROM (SELECT CAST(v * 10 AS BIGINT) AS h FROM VALUES (5), (1), (4), (1), (2) AS t(v))
      """).as[Seq[Long]].head()
    assert(ks == Seq(10L, 20L, 40L))
  }

  test("bounded_levenshtein runs through spark.sql with the -1 overflow contract") {
    GraftSqlFunctions.install(spark)
    val got = spark.sql(
      """SELECT bounded_levenshtein('kitten', 'sitting', 3) AS a,
                bounded_levenshtein('kitten', 'sitting', 2) AS b,
                bounded_levenshtein('same', 'same', 0) AS c
      """).as[(Int, Int, Int)].head()
    assert(got == ((3, -1, 0)))
  }

  test("wrong arity yields a clean signature error, not IndexOutOfBounds") {
    GraftSqlFunctions.install(spark)
    for (bad <- Seq(
      "SELECT zorder_key(1)",
      "SELECT kmv_sketch(h) FROM (SELECT 1L AS h)",
      "SELECT datetostring(0)",
      "SELECT vector_dot(array(1.0F))",
      "SELECT cosine_similarity(array(1.0F), array(1.0F), array(1.0F))")) {
      val e = intercept[Exception] { spark.sql(bad).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("expects 2 arguments")),
        s"$bad -> ${e.getMessage}")
    }
    // 3-arg function: wrong arity AND non-literal k both fail cleanly
    val e3 = intercept[Exception] {
      spark.sql("SELECT bounded_levenshtein('a', 'b')").collect()
    }
    assert(Option(e3.getMessage).exists(_.contains("expects 3 arguments")) ||
      Option(e3.getCause).flatMap(c => Option(c.getMessage))
        .exists(_.contains("expects 3 arguments")), e3.getMessage)
    val eLit = intercept[Exception] {
      spark.sql("SELECT bounded_levenshtein('a', 'b', 1 + 1)").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(eLit).exists(_.contains("integer literal")), eLit.getMessage)
  }

  test("the reference jovens query text runs as spark.sql over a view") {
    GraftSqlFunctions.install(spark)
    // custstream in wire format: nascimento epoch-days INT, dt_update millis
    sources.FakeData.toEpochRecords(sources.FakeData.customers(spark, 200))
      .createOrReplaceTempView("custstream")
    // reference README.md:233-239 body (CSAS wrapper dropped; same text)
    val jovens = spark.sql(
      """SELECT nome, telefone, email,
                datetostring(nascimento, 'yyyy-MM-dd') AS dt_nascimento,
                timestamptostring(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS') AS dt_updt_conv
         FROM custstream
         WHERE datetostring(nascimento, 'yyyy-MM-dd') >= '2000-01-01'""")
    val viaApi = operators.ReferenceQueries.jovens(
      sources.FakeData.customers(spark, 200))
    assert(jovens.collect().toSet == viaApi.collect().toSet)
    assert(jovens.count() > 0)
  }
}

package graft

class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("Engine.init: one call makes tables + engine functions SQL-reachable") {
    Engine.init(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").as[Long].collect()(0)
    assert(n > 0)
    val d = spark.sql(
      "SELECT datetostring(0, 'yyyy-MM-dd') AS d FROM region LIMIT 1")
      .as[String].collect()(0)
    assert(d == "1970-01-01")
  }
}

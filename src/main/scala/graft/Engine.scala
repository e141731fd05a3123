package graft

import org.apache.spark.sql.SparkSession

/** One-call engine setup for interactive / downstream use:
  * registers every testdata table as a view and installs the engine's SQL
  * functions (ksqlDB names + vector primitives), so `spark.sql` can run
  * the full query surface immediately.
  *
  * {{{
  * Engine.init(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT datetostring(-1, 'yyyy-MM-dd')").show()
  * spark.sql("SELECT * FROM lineitem LIMIT 5").show()
  * }}}
  */
object Engine {
  def init(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    GraftSqlFunctions.install(spark)
  }
}

package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

/** The interactive SQL client loop ([[Cli.run]]) driven through its
  * testable seam: scripted statements in, captured output — covering the
  * reference CLI surface (SHOW/CREATE/SELECT), plain-SQL fallthrough,
  * multi-line and multi-statement-per-line parsing, error recovery, and
  * the exit command.
  */
class CliSpec extends SparkSpec {

  private def runScript(script: String): (Int, String) = {
    Engine.init(spark, "/root/testdata/sf0.001")
    val session = KsqlDdl.session(spark,
      name => try Some(spark.table(name)) catch { case _: Exception => None })
    val bytes = new ByteArrayOutputStream()
    val out = new PrintStream(bytes, true, "UTF-8")
    val n = Cli.run(spark, session,
      new BufferedReader(new StringReader(script)), out)
    (n, bytes.toString("UTF-8"))
  }

  test("plain SQL + ksql function, bounded head, row count trailer") {
    val (n, outStr) = runScript(
      "select datetostring(0, 'yyyy-MM-dd') as d;\n")
    assert(n == 1)
    assert(outStr.contains("1970-01-01") && outStr.contains("(1 rows)"))
  }

  test("multi-line statement and two statements on one line both execute") {
    val (n, outStr) = runScript(
      "select count(*) as c\nfrom region; select 41 + 1 as x;\n")
    assert(n == 2)
    assert(outStr.contains("c") && outStr.contains("x") && outStr.contains("42"))
  }

  test("errors are reported and the loop recovers; exit stops consumption") {
    val (n, outStr) = runScript(
      "select * from no_such_table_anywhere;\nselect 7 as ok;\nexit;\nselect 8 as never;\n")
    assert(n == 1, s"out=$outStr")
    assert(outStr.contains("[cli] error:"))
    assert(outStr.contains("ok") && !outStr.contains("never"))
  }

  test("ksql statement surface: show streams works through the session") {
    val (n, outStr) = runScript("show streams;\n")
    assert(n == 1)
    assert(outStr.contains("stream_name"))
  }

  test("semicolons inside quoted literals do not split the statement") {
    // the round-9 advisory fix, pinned: a raw indexOf(";") split
    // `select ';' as x;` mid-literal into two erroring fragments
    val (n, outStr) = runScript(
      "select ';' as x, \"a;b\" as y;\nselect 'it''s; fine' as z;\n")
    assert(n == 2, s"out=$outStr")
    assert(!outStr.contains("[cli] error:"), outStr)
    assert(outStr.contains("a;b") && outStr.contains("it's; fine"), outStr)
  }

  test("backslash escapes and SQL comments do not split statements") {
    // the round-10 advisory fix, pinned: Spark's parser treats \' as an
    // escaped quote inside a literal, and ';' inside -- or /* */
    // comments is not a terminator
    val (n, outStr) = runScript(
      "select 'it\\'s; fine' as z;\n" +
        "select 1 as a -- not a terminator: ;\n;\n" +
        "select /* nor ; here /* nested; */ still */ 2 as b;\n")
    assert(n == 3, s"out=$outStr")
    assert(!outStr.contains("[cli] error:"), outStr)
    assert(outStr.contains("it's; fine"), outStr)
  }

  test("head is bounded: big table prints 20 rows + marker, never the corpus") {
    val (n, outStr) = runScript("select l_orderkey from lineitem;\n")
    assert(n == 1)
    assert(outStr.contains("(first 20 rows)"))
    assert(outStr.linesIterator.size < 30)
  }
}

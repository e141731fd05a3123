package graft

import org.apache.spark.sql.functions._

/** [[KsqlDdl]] — the reference's ksqlDB statements, run VERBATIM (text
  * from `/root/reference/README.md:186-277`, ksql> prompts removed).
  * The reference user's entire interactive surface: topic-bound stream,
  * push query, two CSAS, one windowed CTAS, SHOW STREAMS.
  */
class KsqlDdlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val topicFrame =
    sources.FakeData.toEpochRecords(sources.FakeData.customers(spark, 300))

  private def newSession() = KsqlDdl.session(spark,
    t => if (t == "psg-customers") Some(topicFrame) else None)

  test("the README statement sequence runs end to end") {
    val ks = newSession()

    // README.md:186
    ks.execute("create stream custstream WITH (kafka_topic='psg-customers', value_format='AVRO');")

    // README.md:203 — push query (EMIT CHANGES stripped, 3-arg zone form)
    val push = ks.execute(
      """select nome, telefone, email,
        |DATETOSTRING(nascimento, 'yyyy-MM-dd') as dt_nascimento,
        |TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC') as dt_updt_conv
        |from custstream emit changes;""".stripMargin)
    val row = push.limit(1).collect()(0)
    assert(row.getAs[String]("dt_nascimento").matches("""\d{4}-\d{2}-\d{2}"""))
    assert(row.getAs[String]("dt_updt_conv")
      .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}"""))

    // README.md:233-239 — CSAS jovens
    ks.execute(
      """create stream jovens WITH (kafka_topic='jovens', value_format='AVRO') AS
        |select nome, sexo, telefone, email, profissao,
        |DATETOSTRING(nascimento, 'yyyy-MM-dd') as dt_nascimento,
        |TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC') as dt_updt
        |from custstream
        |WHERE DATETOSTRING(nascimento, 'yyyy-MM-dd') >= '2000-01-01'
        |emit changes;""".stripMargin)
    val jovens = spark.table("jovens")
    assert(jovens.filter($"dt_nascimento" < "2000-01-01").isEmpty)
    // the filter is effective, not vacuous, and ROWTIME propagated
    assert(jovens.count() > 0 && jovens.count() < topicFrame.count())
    assert(jovens.columns.contains("ROWTIME"))

    // README.md:258-265 — CSAS idadeclass (CASE WHEN)
    ks.execute(
      """create stream idadeclass WITH (kafka_topic='idadeclass', value_format='AVRO') AS
        |select nome, telefone, email, profissao,
        |CASE
        |WHEN DATETOSTRING(nascimento, 'yyyy-MM-dd') >= '2000-01-01' THEN 'JOVEM'
        |ELSE 'ADULTO' END AS idadecat,
        |TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd HH:mm:ss.SSS', 'UTC') as dt_updt
        |from custstream
        |emit changes;""".stripMargin)
    val cls = spark.table("idadeclass")
    assert(cls.count() == topicFrame.count())
    assert(cls.select("idadecat").distinct().as[String].collect().toSet
      .subsetOf(Set("JOVEM", "ADULTO")))

    // README.md:271-277 — windowed CTAS over the DERIVED stream
    ks.execute(
      """create table idadecont WITH (kafka_topic='idadecont', value_format='AVRO') AS
        |select idadecat, count(idadecat) as contagem
        |from idadeclass
        |window tumbling (size 30 seconds)
        |group by idadecat
        |emit changes;""".stripMargin)
    val cont = spark.table("idadecont")
    // counts partition the corpus; every window is 30 s wide and aligned
    assert(cont.agg(sum($"contagem")).as[Long].head() == topicFrame.count())
    val widths = cont
      .select((unix_timestamp($"window_end") - unix_timestamp($"window_start")).as("w"))
      .distinct().as[Long].collect().toSeq
    assert(widths == Seq(30L), s"widths=$widths")

    // README.md:192 — show streams lists all four
    val names = ks.execute("show streams;")
      .select("stream_name").as[String].collect().toSet
    assert(names == Set("CUSTSTREAM", "JOVENS", "IDADECLASS", "IDADECONT"))
  }

  test("the translation is mode-agnostic: CSAS over a streaming view streams") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.toDF().toDF("nome", "dt_update").createOrReplaceTempView("live_topic")
    val ks = KsqlDdl.session(spark,
      t => if (t == "live") Some(spark.table("live_topic")) else None)
    ks.execute("create stream livestream WITH (kafka_topic='live', value_format='AVRO');")
    val derived = ks.execute(
      "create stream liveout WITH (kafka_topic='liveout', value_format='AVRO') AS " +
        "select nome, TIMESTAMPTOSTRING(dt_update, 'yyyy-MM-dd') as d " +
        "from livestream emit changes;")
    assert(derived.isStreaming, "CSAS over a streaming source must stay streaming")
  }

  test("unknown topics and unsupported statements fail loudly") {
    val ks = newSession()
    intercept[IllegalArgumentException] {
      ks.execute("create stream x WITH (kafka_topic='nope', value_format='AVRO');")
    }
    intercept[IllegalArgumentException] { ks.execute("drop stream custstream;") }
  }

  test("WITH properties: quoted commas, parens and '' escapes parse; junk fails loudly") {
    val ks = newSession()
    // legal ksqlDB just outside the README subset: a property value
    // containing a comma, a closing paren, and a doubled-quote escape —
    // all inside one quoted literal. The naive comma/regex split broke
    // on every one of these.
    val df = ks.execute(
      """create stream esc WITH (kafka_topic='psg-customers',
        |timestamp_format='yyyy-MM-dd, HH:mm (''z'')', value_format='AVRO');""".stripMargin)
    assert(df.columns.nonEmpty)
    assert(ks.streams.exists(_.name == "esc"))
    // malformed pairs are rejected with the offending text, not MatchError
    val e1 = intercept[IllegalArgumentException] {
      ks.execute("create stream bad WITH (kafka_topic='t', oops);")
    }
    assert(e1.getMessage.contains("oops"))
    // unterminated quote/paren is loud too
    intercept[IllegalArgumentException] {
      ks.execute("create stream bad2 WITH (kafka_topic='t;")
    }
    // text after the WITH clause that isn't AS SELECT is rejected
    intercept[IllegalArgumentException] {
      ks.execute("create stream bad3 WITH (kafka_topic='psg-customers') bogus;")
    }
  }

  test("show topics lists topic geometry, distinct from show streams") {
    val ks = newSession()
    ks.execute("create stream custstream WITH (kafka_topic='psg-customers', value_format='AVRO');")
    ks.execute(
      "create stream j2 WITH (kafka_topic='jovens2', value_format='AVRO') AS " +
        "select nome from custstream emit changes;")
    val topics = ks.execute("show topics;")
    assert(topics.columns.toSeq == Seq("kafka_topic", "partitions", "partition_replicas"))
    assert(topics.select("kafka_topic").as[String].collect().toSet
      == Set("psg-customers", "jovens2"))
    // and show streams keeps its own (different) shape
    assert(ks.execute("show streams;").columns.toSeq
      == Seq("stream_name", "kafka_topic", "value_format", "derived"))
  }

  test("print <topic> tails the topic (README.md:180) and returns its frame") {
    val ks = newSession()
    val df = ks.execute("print psg-customers;")
    assert(df.count() == topicFrame.count())
    intercept[IllegalArgumentException] { ks.execute("print no-such-topic;") }
  }

  test("property: every malformed-statement rejection names the offending text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // explicit deterministic sampling, same discipline as PropertySpec
    // (no scalatestplus bridge in the offline cache)
    def forAllG[A](gen: Gen[A], trials: Int = 12)(body: A => Unit): Unit =
      (1 to trials).foreach { i =>
        body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
      }
    val word = Gen.choose(3, 10)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val ks = newSession()
    ks.execute("create stream custstream WITH (kafka_topic='psg-customers', value_format='AVRO');")
    def rejected(stmt: String): String =
      intercept[IllegalArgumentException](ks.execute(stmt)).getMessage

    // unterminated property list: missing ')' and/or a dangling quote
    forAllG(Gen.zip(word, word, Gen.oneOf(true, false))) { case (n, t, dangle) =>
      val stmt =
        if (dangle) s"create stream $n with (kafka_topic='$t"
        else s"create stream $n with (kafka_topic='$t', value_format='AVRO'"
      val m = rejected(stmt)
      assert(m.contains("unterminated WITH property list") && m.contains(t))
    }
    // a property with no '=' names exactly the bad pair, whatever
    // well-formed neighbours surround it
    forAllG(Gen.zip(word, word, word)) { case (n, t, bad) =>
      val m = rejected(s"create stream $n with (kafka_topic='$t', $bad);")
      assert(m.contains("malformed WITH property") && m.contains(bad))
    }
    // trailing text that isn't `AS SELECT` is named (alpha words can't
    // accidentally satisfy the AS-branch: it needs whitespace at index 2)
    forAllG(Gen.zip(word, word)) { case (n, junk) =>
      val m = rejected(s"create stream $n with (kafka_topic='psg-customers') $junk;")
      assert(m.contains("unexpected text after WITH clause") && m.contains(junk))
    }
    // missing kafka_topic echoes the whole statement (the name included)
    forAllG(word) { n =>
      val m = rejected(s"create stream $n with (value_format='AVRO');")
      assert(m.contains("missing kafka_topic") && m.contains(n))
    }
    // unknown topics are named in quotes
    forAllG(Gen.zip(word, word)) { case (n, t) =>
      val m = rejected(s"create stream $n with (kafka_topic='zz$t');")
      assert(m.contains(s"unknown topic 'zz$t'"))
    }
    // statements outside the grammar echo their own head ("zz" prefix
    // keeps a random word from colliding with a real statement head)
    forAllG(Gen.zip(word, word)) { case (h, rest) =>
      val m = rejected(s"zz$h $rest;")
      assert(m.contains("unsupported ksql statement") && m.contains(s"zz$h"))
    }
    // WINDOW TUMBLING without GROUP BY is rejected, whatever the size
    forAllG(Gen.choose(1, 600)) { secs =>
      val m = rejected(
        s"select count(*) as c from custstream window tumbling (size $secs seconds) emit changes;")
      assert(m.contains("WINDOW TUMBLING requires a GROUP BY"))
    }
    // and the parser never mis-parses LEGAL quote-heavy values: a value
    // holding commas, parens and '' escapes registers byte-identically
    forAllG(Gen.zip(word, word, word)) { case (n, a, b) =>
      val weird = s"$a, ('')$b"
      ks.execute(s"create stream pr$n WITH (kafka_topic='pr$n', " +
        s"timestamp_format='${weird.replace("'", "''")}', value_format='AVRO') " +
        "AS select nome from custstream emit changes;")
      assert(ks.streams.exists(_.name == s"pr$n"))
    }
  }
}

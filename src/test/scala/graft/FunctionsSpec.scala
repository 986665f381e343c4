package graft

import graft.functions.{exprs, HashUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unit tests for the custom codegen expressions (graft.functions). */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("rolling_hash matches a reference fold, and codegen == interpreted") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % HashUtil.Mod)
    val data = Seq("", "a", "abc", "the quick brown fox", "spark graft 123")
    val got = data.toDF("s")
      .select(exprs.rolling_hash(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got == data.map(ref))
    // eval path (no codegen) must agree
    assert(HashUtil.rollingHash(UTF8String.fromString("abc")) == ref("abc"))
  }

  test("png_ihdr: interpreted eval agrees with the codegen DataFrame path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val png = graft.ops.Multimodal.pngIhdrBytes(lit(300), lit(77), lit(8), lit(2))
    val viaCodegen = spark.range(1).select(exprs.png_ihdr(png).as("f"))
      .select("f.*").collect().head
    val bytes = spark.range(1).select(png.as("p")).collect().head.getAs[Array[Byte]](0)
    val interp = graft.functions.PngIhdr(Literal(bytes, BinaryType))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert((viaCodegen.getInt(0), viaCodegen.getInt(1), viaCodegen.getInt(2), viaCodegen.getInt(3))
      == ((interp.getInt(0), interp.getInt(1), interp.getInt(2), interp.getInt(3))))
    assert(graft.functions.PngIhdr(Literal(Array[Byte](1, 2, 3), BinaryType)).eval(null) == null)
    assert(graft.functions.PngIhdr(Literal(null, BinaryType)).eval(null) == null)
  }

  test("rolling_hash is null-safe") {
    val got = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(exprs.rolling_hash(col("s")).as("h"))
      .collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("simhash64: identical token arrays hash equal; near arrays are near") {
    val a = (1 to 50).map(i => s"tok$i")
    val b = a.updated(0, "DIFFERENT") // 1 of 50 tokens changed
    val c = (1 to 50).map(i => s"other$i")
    val df = Seq(a, b, c).toDF("toks")
      .select(exprs.simhash64(col("toks")).as("h"))
    val Array(ha, hb, hc) = df.as[Long].collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(ha, ha) == 0)
    assert(ham(ha, hb) < ham(ha, hc), s"near=${ham(ha, hb)} far=${ham(ha, hc)}")
  }

  test("SQL surface: registerAll registers functions on a live session") {
    // isolate registerAll from the extensions-injected copies: on a fresh
    // session, drop one injected function, prove it is gone, then
    // registerAll must bring it back as a temp function
    val s = spark.newSession()
    s.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"))
    intercept[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT graft_rolling_hash('abc')").head()
    }
    GraftExtensions.registerAll(s)
    assert(s.sql("SELECT graft_rolling_hash('abc') AS h").head().getLong(0) == 96354L)
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_rolling_hash('abc') AS h,
        |  graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c,
        |  graft_simhash64(array('a', 'b')) AS s""".stripMargin).head()
    assert(r.getLong(0) == 96354L)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 2)
    val r2 = spark.sql(
      "SELECT graft_char_ngrams('abcd', 2) AS ng, " +
        "graft_shingle_hash_set(array('a','b','c'), 2) AS sh").head()
    assert(r2.getSeq[String](0) == Seq("ab", "bc", "cd"))
    assert(r2.getSeq[Long](1).size == 2) // "a b", "b c"
    val r3 = spark.sql("SELECT graft_word_ngrams('a b a b', 2) AS wg").head()
    assert(r3.getSeq[String](0) == Seq("a b", "b a", "a b")) // repeats kept
    // png_ihdr from SQL: junk → null, a real IHDR prefix → dimensions
    val r4 = spark.sql(
      "SELECT graft_png_ihdr(CAST('junk' AS BINARY)) AS j, " +
        "graft_png_ihdr(unhex('89504E470D0A1A0A0000000D49484452" +
        "0000012C0000004D0802000000DEADBEEF')).width AS w").head()
    assert(r4.isNullAt(0) && r4.getInt(1) == 300)
  }

  test("token_stats matches the unfused split-based formulas exactly") {
    import graft.ops.TextAnalysis
    val rnd = new scala.util.Random(11)
    val words = Seq("the", "a", "of", "and", "to", "in", "zz", "wordy", "émile", "中文字")
    val texts = Seq("", " ", "  ", "the", "a  b", "trailing space ") ++
      (1 to 50).map(_ => (1 to rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val df = texts.toDF("text")
    val fused = df.select(
      TextAnalysis.tokenStats($"text").as("ts"),
      TextAnalysis.qualityScore($"text").as("q"))
      .select($"ts.tc", $"ts.sc", $"ts.cl", $"ts.bpe", $"q")
      .collect()
    val unfused = df.select(
      size(TextAnalysis.tokens($"text")).as("tc"),
      exprs.count_in_set(TextAnalysis.tokens($"text"), TextAnalysis.Stopwords).as("sc"),
      aggregate(TextAnalysis.tokens($"text"), lit(0L), (acc, w) => acc + length(w)).as("cl"),
      TextAnalysis.bpeTokenEstimate($"text").as("bpe"))
      .collect()
    fused.zip(unfused).zip(texts).foreach { case ((f, u), t) =>
      assert((f.getInt(0), f.getInt(1), f.getLong(2), f.getLong(3)) ==
        (u.getInt(0), u.getInt(1), u.getLong(2), u.getLong(3)), s"text='$t'")
      assert(f.getDouble(4) >= 0.0 && f.getDouble(4) <= 1.0)
    }
  }

  test("spark.sql.extensions config path injects every function") {
    // SparkTestBase builds the JVM's session with
    // spark.sql.extensions=graft.GraftExtensions (static conf, consumed
    // at SparkContext creation). newSession() has NO temp functions —
    // only extension-injected ones — so resolution here proves the
    // config path, independent of any registerAll call.
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT graft_rolling_hash('abc') AS h,
        |  graft_simhash64(array('a', 'b')) AS s,
        |  graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c,
        |  graft_shingle_hash_set(array('a','b','c'), 2) AS sh,
        |  graft_char_ngrams('abcd', 2) AS ng,
        |  graft_token_stats('the quick fox').tc AS tc""".stripMargin).head()
    assert(r.getLong(0) == 96354L)
    assert(r.getDouble(2) == 11.0)
    assert(r.getInt(3) == 2)
    assert(r.getSeq[Long](4).size == 2)
    assert(r.getSeq[String](5) == Seq("ab", "bc", "cd"))
    assert(r.getInt(6) == 3)
  }

  test("simhash64 works on the real documents table") {
    val docs = Tables.documents(spark, sfDir)
      .select(exprs.simhash64(split(col("text"), " ")).as("h"))
    assert(docs.distinct().count() > 1)
  }
}

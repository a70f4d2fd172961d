package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqlKernelsSpec extends SparkSpec {
  import spark.implicits._

  SqlKernels.registerAll(spark)

  test("graft_dot / graft_cosine / graft_normalize from SQL match the Column API bitwise") {
    Seq((1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (2L, Seq(0.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)))
      .toDF("id", "a", "b").createOrReplaceTempView("v")
    val sql = spark.sql(
      """SELECT id, graft_dot(a, b) AS d, graft_cosine(a, b) AS cs,
        |  graft_normalize(a) AS na FROM v ORDER BY id""".stripMargin).collect()
    val viaColumns = spark.table("v").select(col("id"),
        VecOps.dot(col("a"), col("b")).as("d"),
        VecOps.dot(VecOps.normalize(col("a")), VecOps.normalize(col("b"))).as("cs"),
        VecOps.normalize(col("a")).as("na"))
      .orderBy("id").collect()
    assert(sql.toSeq == viaColumns.toSeq)
  }

  test("graft_jaccard, graft_shingles, graft_simhash, graft_minhash_sig from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy cat"))
      .toDF("id", "text").createOrReplaceTempView("docs")
    val r = spark.sql(
      """SELECT id, graft_shingles(text, 3) AS sh,
        |  graft_simhash(split(text, ' ')) AS sim,
        |  graft_minhash_sig(graft_shingles(text, 3), 16) AS sig
        |FROM docs ORDER BY id""".stripMargin).collect()
    assert(r.length == 2 && r(0).getSeq[String](1).nonEmpty
      && r(0).getSeq[Long](3).length == 16)
    val jac = spark.sql(
      """SELECT graft_jaccard(a.sh, b.sh) AS j FROM
        |  (SELECT graft_shingles(text, 3) AS sh FROM docs WHERE id = 1) a,
        |  (SELECT graft_shingles(text, 3) AS sh FROM docs WHERE id = 2) b"""
        .stripMargin).head().getDouble(0)
    val expect = graft.ops.Dedup.jaccard(
      graft.ops.Dedup.textShingles(lit("the quick brown fox jumps over the lazy dog"), 3),
      graft.ops.Dedup.textShingles(lit("the quick brown fox jumps over the lazy cat"), 3))
    val e = spark.range(1).select(expect.as("j")).head().getDouble(0)
    assert(jac == e && jac > 0.5 && jac < 1.0)
  }

  test("graft_nfc / graft_nfkc from SQL match the Column API bitwise") {
    // decomposed e+acute (U+0301), fullwidth A (U+FF21), fi ligature
    // (U+FB01) — explicit codepoints, no combining chars in source (the
    // d16 fixture rule); NFC composes the e+acute but keeps the
    // compatibility characters, NFKC folds those too
    def cp(i: Int) = new String(Character.toChars(i))
    val s = "cafe" + cp(0x301) + " " + cp(0xFF21) + " " + cp(0xFB01) + "n"
    Seq((1L, s), (2L, null.asInstanceOf[String]))
      .toDF("id", "t").createOrReplaceTempView("nfcv")
    val sql = spark.sql(
      "SELECT id, graft_nfc(t) AS c, graft_nfkc(t) AS k FROM nfcv ORDER BY id")
      .collect()
    val viaColumns = spark.table("nfcv").select(col("id"),
        UnicodeNorm.nfc(col("t")).as("c"), UnicodeNorm.nfkc(col("t")).as("k"))
      .orderBy("id").collect()
    assert(sql.toSeq == viaColumns.toSeq)
    assert(sql(0).getString(1) ==
      "caf" + cp(0xE9) + " " + cp(0xFF21) + " " + cp(0xFB01) + "n")
    assert(sql(0).getString(2) == "caf" + cp(0xE9) + " A fin")
    assert(sql(1).isNullAt(1) && sql(1).isNullAt(2))
  }

  test("graft_hash60 / graft_cm_bucket from SQL match the Sketch builders bitwise") {
    Seq((1L, "alpha"), (2L, "beta"), (3L, "42"), (4L, null.asInstanceOf[String]))
      .toDF("id", "v").createOrReplaceTempView("hv")
    val sql = spark.sql(
      """SELECT id, graft_hash60(v) AS h, graft_cm_bucket(v, 0, 1024) AS b0,
        |  graft_cm_bucket(v, 3, 1024) AS b3 FROM hv ORDER BY id""".stripMargin).collect()
    val viaColumns = spark.table("hv").select(col("id"),
        graft.ops.Sketch.valueHash60(col("v")).as("h"),
        graft.ops.Sketch.cmBucket(col("v"), 0, 1024).as("b0"),
        graft.ops.Sketch.cmBucket(col("v"), 3, 1024).as("b3"))
      .orderBy("id").collect()
    assert(sql.toSeq == viaColumns.toSeq)
    // non-literal structural args rejected
    intercept[Exception](spark.sql("SELECT graft_cm_bucket(v, id, 8) FROM hv").collect())
  }

  test("graft_hist_bucket from SQL matches Sketch.histBucket bitwise incl. boundaries") {
    // exact region, block boundaries, interior points, a 60-bit value,
    // and the signed mirror (incl. Long.MinValue through the −(v+1)
    // reflection)
    val vals = Seq(0L, 1L, 31L, 32L, 63L, 64L, 65L, 127L, 128L, 1000L,
      1048575L, 1048576L, (1L << 60) - 1L,
      -1L, -32L, -33L, -1000L, Long.MinValue)
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").createOrReplaceTempView("bv")
    val sql = spark.sql(
      "SELECT id, graft_hist_bucket(v, 5) AS b FROM bv ORDER BY id").collect()
    val viaColumns = spark.table("bv")
      .select(col("id"), graft.ops.Sketch.histBucket(col("v"), 5).as("b"))
      .orderBy("id").collect()
    assert(sql.toSeq == viaColumns.toSeq)
    // the signed mirror holds through the SQL surface (exact region)
    assert(spark.sql("SELECT graft_hist_bucket(-3, 5)").head().getLong(0) == -3L)
    intercept[Exception](spark.sql("SELECT graft_hist_bucket(v, id) FROM bv").collect())
  }

  test("graft_extract_text / graft_normalize_url / graft_host / graft_domain from SQL match the Column API bitwise") {
    Seq(
      (1L, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&q=1#frag",
        "<html><head><script>var x=1;</script><title>T</title></head>" +
          "<body><p>Hello &amp; welcome</p><!-- c --></body></html>"),
      (2L, "http://sub.shop.co.uk:80/path/../p2?id=9&fbclid=z",
        "plain text, no markup at all"),
      (3L, "ftp://weird.example.org/x", "<div>nested <b>bold</b></div>"),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "url", "html").createOrReplaceTempView("web_v")
    val sql = spark.sql(
      """SELECT id, graft_normalize_url(url) AS u, graft_host(url) AS h,
        |  graft_domain(graft_host(url)) AS d, graft_extract_text(html) AS t
        |FROM web_v ORDER BY id""".stripMargin).collect()
    val viaColumns = spark.table("web_v").select(col("id"),
        graft.ops.Web.normalizeUrl(col("url")).as("u"),
        graft.ops.Web.hostOf(col("url")).as("h"),
        graft.ops.Web.registrableDomain(graft.ops.Web.hostOf(col("url"))).as("d"),
        graft.ops.TextAnalysis.extractText(col("html")).as("t"))
      .orderBy("id").collect()
    assert(sql.toSeq == viaColumns.toSeq)
    // sanity on the values themselves, not just parity
    val r1 = sql.find(_.getLong(0) == 1L).get
    assert(r1.getString(2) == "www.example.com", r1.toString)
    assert(r1.getString(3) == "example.com", r1.toString)
    assert(r1.getString(4).contains("Hello & welcome") &&
      !r1.getString(4).contains("script"), r1.toString)
  }

  test("structural args must be integer literals; arity is enforced") {
    spark.range(1).selectExpr("cast(array('a','b') as array<string>) AS sh")
      .createOrReplaceTempView("one")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(sh, id) FROM (SELECT sh, 1 AS id FROM one)").collect()
    }
    assert(err.getMessage.contains("INTEGER literal")
      || err.getCause != null && err.getCause.getMessage.contains("INTEGER literal"))
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_dot(sh) FROM one").collect()
    }
    assert(err2.getMessage.contains("graft_dot")
      || err2.getCause != null && err2.getCause.getMessage.contains("graft_dot"))
  }

  test("GraftSession exposes graft_* functions through its SQL surface") {
    val dir = java.nio.file.Files.createTempDirectory("sqlk").toFile
    try {
      val f = new java.io.File(dir, "t.csv")
      java.nio.file.Files.write(f.toPath,
        "id,text\n1,hello world hello\n2,hello world goodbye\n".getBytes)
      val s = graft.session.GraftSession.open(spark, f.getAbsolutePath)
      try {
        val j = s.sql(
          """SELECT graft_jaccard(graft_shingles(a.text, 2), graft_shingles(b.text, 2)) AS j
            |FROM t a, t b WHERE a.id = 1 AND b.id = 2""".stripMargin)
          .head().getDouble(0)
        assert(j > 0.0 && j < 1.0)
      } finally s.close()
    } finally graft.Paths.rmTree(dir)
  }

  test("graft_keep / graft_split: SQL plans the identical sampling expressions") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = (0L until 2000L).map(i => Tuple1(i)).toDF("id")
    df.createOrReplaceTempView("keys")
    // keep: same rows as bernoulliByHash at the same fraction (identical
    // md5-threshold predicate), fractional literal arriving as DECIMAL
    val sqlKeep = spark.sql("SELECT id FROM keys WHERE graft_keep(id, 0.1)")
      .as[Long].collect().toSet
    val colKeep = Sampling.bernoulliByHash(df, col("id"), 0.1)
      .as[Long].collect().toSet
    assert(sqlKeep == colKeep && sqlKeep.nonEmpty && sqlKeep.size < 2000)
    // fraction 1.0 keeps everything (the "g" sentinel under strict <)
    assert(spark.sql("SELECT count(*) FROM keys WHERE graft_keep(id, 1.0)")
      .head().getLong(0) == 2000L)
    // double-suffixed literal also accepted
    assert(spark.sql("SELECT id FROM keys WHERE graft_keep(id, 0.1D)")
      .as[Long].collect().toSet == sqlKeep)
    // split: identical labels to splitByHash for the same weights
    val sqlSplit = spark.sql(
      "SELECT id, graft_split(id, 'train', 0.8, 'val', 0.1, 'test', 0.1) AS s FROM keys")
      .as[(Long, String)].collect().toMap
    val colSplit = Sampling.splitByHash(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s")
      .as[(Long, String)].collect().toMap
    assert(sqlSplit == colSplit)
    assert(sqlSplit.values.toSet == Set("train", "val", "test"))
    // malformed calls fail at plan time with the contract message
    val e1 = intercept[Exception](spark.sql("SELECT graft_split(id, 'a', 0.5) FROM keys"))
    assert(e1.getMessage.contains("split weights sum to 0.5"))
    val e1b = intercept[Exception](spark.sql("SELECT graft_split(id, 'a') FROM keys"))
    assert(e1b.getMessage.contains("graft_split"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_keep(id, id) FROM keys").collect())
    assert(e2.getMessage.contains("numeric literal"))
  }

  test("GraftSession.close restores a host's own graft_* function and drops the rest") {
    import org.apache.spark.sql.graft.ColumnBridge
    val dir = java.nio.file.Files.createTempDirectory("sqlk2").toFile
    try {
      val f = new java.io.File(dir, "t.csv")
      java.nio.file.Files.write(f.toPath, "id\n1\n".getBytes)
      // the host app has its OWN graft_cosine before the session opens
      val hostBuilder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression =
        _ => org.apache.spark.sql.catalyst.expressions.Literal(42.0)
      ColumnBridge.registerTempFunction(spark, "graft_cosine", hostBuilder)
      ColumnBridge.dropTempFunction(spark, "graft_jaccard")
      val s = graft.session.GraftSession.open(spark, f.getAbsolutePath)
      // inside the session: graft's kernel wins (real cosine, not 42)
      val inside = s.sql(
        "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .head().getDouble(0)
      assert(inside == 1.0)
      s.close()
      // after close: the host's builder is back, the never-present one is gone
      assert(ColumnBridge.lookupTempFunction(spark, "graft_cosine").exists(_ eq hostBuilder))
      assert(spark.sql("SELECT graft_cosine() AS c").head().getDouble(0) == 42.0)
      assert(ColumnBridge.lookupTempFunction(spark, "graft_jaccard").isEmpty)
    } finally {
      graft.Paths.rmTree(dir)
      // leave the suite-level registrations intact for other tests
      SqlKernels.registerAll(spark)
    }
  }
}

package graft

/** SQL-surface parity for the engine's custom expressions via
  * SparkSessionExtensions.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_* functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |  graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0,
        |  graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |  graft_l2norm(array(3.0D, 4.0D)) AS n,
        |  graft_l2dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS dist
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 23.0)
    assert(r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 5.0)
  }

  test("intersect-nonempty rewrites to arrays_overlap; null-element arrays left alone") {
    import org.apache.spark.sql.functions._
    // literal arrays are containsNull=false → rule fires
    val df = spark.range(3).select(
      (size(array_intersect(array(lit("a"), lit("b")), array(concat(lit("a"), col("id").cast("string"))))) > 0).as("hit"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("arrays_overlap"), opt)
    assert(!opt.contains("array_intersect"), opt)
    // result semantics preserved ("a0" never matches; plain "a" would)
    assert(df.collect().forall(!_.getBoolean(0)))
    val hit = spark.range(1).select(
      (size(array_intersect(array(lit("a"), lit("b")), array(lit("b")))) > 0).as("hit")).head().getBoolean(0)
    assert(hit)
    // nullable-element arrays must NOT rewrite (null-element semantics differ)
    val nullable = spark.range(1).select(
      (size(array_intersect(
        array(when(col("id") > 5, "a")), array(when(col("id") > 6, "b")))) > 0).as("hit"))
    val optN = nullable.queryExecution.optimizedPlan.toString
    assert(optN.contains("array_intersect"), optN)
  }

  test("graft repetition/zorder functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_ngram_stats('cat dog cat dog cat', 2) AS bg,
        |  graft_line_stats('a\nb\na') AS ls,
        |  graft_zorder(CAST(3 AS INT), CAST(1 AS INT)) AS z
        |""".stripMargin).head()
    val bg = r.getStruct(0)
    assert(bg.getLong(0) == 4L && bg.getLong(1) == 2L && bg.getLong(2) == 2L)
    val ls = r.getStruct(1)
    assert(ls.getLong(0) == 3L && ls.getLong(1) == 2L)
    assert(r.getLong(2) == 7L)
  }

  test("graft_lsh_bits deterministic from SQL, requires literal nBits") {
    val a = spark.sql("SELECT graft_lsh_bits(array(1.0D, 2.0D, 3.0D), 16)").head().getLong(0)
    val b = spark.sql("SELECT graft_lsh_bits(array(1.0D, 2.0D, 3.0D), 16)").head().getLong(0)
    assert(a == b)
    assert((a & ~((1L << 16) - 1)) == 0) // only low 16 bits set
  }

  test("optimizer rule folds cosine(x, x) to a norm-guarded literal") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(3)
    val df = emb.select(graft.functions.VectorFunctions.cosine($"embedding", $"embedding").as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    // fold shape: If(norm guard, 1.0, original) — guard present, literal present
    assert(optimized.contains("l2norm"), optimized)
    assert(optimized.contains("1.0"), optimized)
    assert(df.collect().forall(r => r.getDouble(0) == 1.0))
  }

  test("fold preserves zero-vector and null semantics (ADVICE r1)") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Array(0.0, 0.0))), // zero vector: cosine must stay 0.0
      (2, Some(Array(3.0, 4.0))), // normal: folds to 1.0
      (3, None)                   // null: stays null
    ).toDF("id", "v")
    val out = df
      .select($"id",
        graft.functions.VectorFunctions.cosine($"v", $"v").as("c"),
        graft.functions.VectorFunctions.l2Distance($"v", $"v").as("d"))
      .orderBy($"id")
      .collect()
    assert(out(0).getDouble(1) == 0.0 && out(0).getDouble(2) == 0.0)
    assert(out(1).getDouble(1) == 1.0 && out(1).getDouble(2) == 0.0)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("graft text-hash functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_shingle_hashes('a b c d', 2) AS sh,
        |  graft_char_shingle_hashes('abcd', 3) AS csh,
        |  graft_minhash(graft_shingle_hashes('a b c d', 2), 8) AS sig,
        |  graft_simhash64(graft_shingle_hashes('a b c d', 1)) AS fp
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 3) // "a b","b c","c d"
    assert(r.getSeq[Long](1).length == 2) // "abc","bcd"
    assert(r.getSeq[Long](2).length == 8)
    assert(r.get(3).isInstanceOf[Long])
  }

  test("float vectors accepted (embedding column type)") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(1)
    emb.createOrReplaceTempView("emb_ext")
    val v = spark.sql("SELECT graft_cosine(embedding, embedding) FROM emb_ext").head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
